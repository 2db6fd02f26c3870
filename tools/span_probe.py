#!/usr/bin/env python3
"""Probe q40's UNEXERCISED scale axis: time span (VERDICT r10 item 3).

The dense per-key hourly grid in `resample_ffill` is
keys x per-key-span-hours.  The three-point scale record's amplifier
grows KEYS at fixed span (measured near-linear, r2 = 7.16); this
probe grows the SPAN at fixed keys and fixed input rows: every
event's timestamp is stretched 10x around the corpus start
(ts' = t_min + (ts - t_min) * 10), so per-key event counts, key
cardinality, and input bytes are IDENTICAL — only the grid grows.

Three measurements (bench.py's `_best_of` noop-write discipline,
best-of-3):
  base     — q40 on sf0.1 as committed
  span10   — q40 on the span-stretched copy (same rows, 10x span)
  span10_capped — the operator's `max_grid_hours` loud cap set to the
             BASE corpus's max per-key span, on the stretched copy:
             the cap must return the cost to ~base-grid magnitude
             while flagging truncated keys (provenance, not silence)

Writes SPAN_PROBE.json at the repo root; the q40 annotation in
tools/bench_scale.py cites it.

Usage: python3 tools/span_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import _best_of  # noqa: E402
from kafka_spark_streaming_pipeline_spark.cache import (  # noqa: E402
    session_gc,
    unpersist_tracked,
)
from kafka_spark_streaming_pipeline_spark.catalog import load_table  # noqa: E402
from kafka_spark_streaming_pipeline_spark.operators.timeseries import (  # noqa: E402
    resample_ffill,
)
from kafka_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402

MID = "/root/testdata/sf0.1"
SPAN_DIR = os.path.join(REPO, ".scaledata", "span10")
STRETCH = 10
REPEATS = 3


def build_span_stretched(spark) -> None:
    events = load_table(spark, MID, "events")
    t_min = events.agg(F.min("ts").alias("t0")).collect()[0]["t0"]
    stretched = events.withColumn(
        "ts",
        F.timestamp_micros(
            F.lit(int(t_min.timestamp() * 1_000_000)).cast("long")
            + (
                F.unix_micros("ts")
                - F.lit(int(t_min.timestamp() * 1_000_000)).cast("long")
            )
            * STRETCH
        ),
    )
    stretched.write.mode("overwrite").parquet(
        os.path.join(SPAN_DIR, "events.parquet")
    )


def time_capped(spark, cap_hours: int) -> float:
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        resample_ffill(
            load_table(spark, SPAN_DIR, "events"), max_grid_hours=cap_hours
        ).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    unpersist_tracked()
    session_gc(spark)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="span_probe")
    spark.range(1).count()
    if not os.path.isdir(SPAN_DIR):
        print(f"# building {SPAN_DIR}", file=sys.stderr)
        build_span_stretched(spark)

    # base corpus max per-key span-hours -> the cap that restores the
    # base grid magnitude on the stretched copy
    base_events = load_table(spark, MID, "events")
    spans = base_events.groupBy("user_id").agg(
        (
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            / 3600.0
        ).alias("h")
    )
    cap_hours = int(spans.agg(F.ceil(F.max("h")) + 1).collect()[0][0])

    grid_rows = {
        "base": resample_ffill(base_events).count(),
        "span10": resample_ffill(
            load_table(spark, SPAN_DIR, "events")
        ).count(),
    }
    unpersist_tracked()

    t_base, _ = _best_of(spark, "q40_resample_ffill", MID, REPEATS)
    t_span, _ = _best_of(spark, "q40_resample_ffill", SPAN_DIR, REPEATS)
    t_capped = time_capped(spark, cap_hours)

    out = {
        "metric": "q40_span_axis_probe",
        "stretch": STRETCH,
        "repeats": REPEATS,
        "input_rows_identical": True,
        "cap_hours": cap_hours,
        "grid_rows": grid_rows,
        "grid_growth": round(grid_rows["span10"] / grid_rows["base"], 2),
        "t_base_sec": round(t_base, 3),
        "t_span10_sec": round(t_span, 3),
        "t_span10_capped_sec": t_capped,
        "time_growth_span_axis": round(t_span / t_base, 2),
        "note": (
            "span-stretched events: identical input rows/keys/bytes, "
            "10x per-key time span -> the grid (= the output) grows "
            "~10x with zero new input; max_grid_hours is the loud cap "
            "for this axis (operators/timeseries.resample_ffill)"
        ),
    }
    path = os.path.join(REPO, "SPAN_PROBE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
