"""asof_join semantics: latest-at-or-before match, per-key isolation,
tolerance nulling — checked against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from kafka_spark_streaming_pipeline_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:03"), 100.0),
            ("A", _ts("2024-01-01 10:00:00"), 99.0),   # equal-ts quote matches
            ("B", _ts("2024-01-01 10:00:05"), 50.0),   # B has no quote -> null
        ],
        "sym string, trade_ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 98.5),
            ("A", _ts("2024-01-01 10:00:02"), 98.9),
            ("A", _ts("2024-01-01 10:00:04"), 99.3),   # after both trades of A
        ],
        "sym string, quote_ts timestamp, bid double",
    )
    out = {
        (r.sym, r.trade_ts.isoformat()): (r.bid_asof, r.matched_ts_asof)
        for r in asof_join(
            trades, quotes, ["sym"], "trade_ts", "quote_ts"
        ).collect()
    }
    assert out[("A", "2024-01-01T10:00:03")][0] == 98.9
    assert out[("A", "2024-01-01T10:00:00")][0] == 98.5  # at-or-before includes ties
    assert out[("B", "2024-01-01T10:00:05")] == (None, None)


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:10"), 1)],
        "k string, lts timestamp, payload int",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:01"), "old")],
        "k string, rts timestamp, tag string",
    )
    loose = asof_join(left, right, ["k"], "lts", "rts").first()
    tight = asof_join(left, right, ["k"], "lts", "rts", tolerance_ms=5000).first()
    assert loose.tag_asof == "old"
    assert tight.tag_asof is None and tight.matched_ts_asof is None
