"""Skew-rewrite equivalence tests: each salted/two-phase form must
produce exactly the rows of its naive plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_spark_streaming_pipeline_spark.operators.skew import (
    skew_join,
    two_phase_topk,
    two_stage_distinct_count,
)


def _skewed(spark):
    # one hot key (user 1: 500 rows), many cold keys
    rows = [(1, i, float(i % 97)) for i in range(500)]
    rows += [(u, 1000 + u, float(u)) for u in range(2, 50)]
    return spark.createDataFrame(rows, "user_id long, event_id long, value double")


def test_skew_join_equals_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(u, f"name-{u}") for u in range(0, 50)], "user_id long, name string"
    )
    plain = left.join(right, ["user_id"]).orderBy("event_id").collect()
    salted = skew_join(left, right, ["user_id"], buckets=8).orderBy("event_id").collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_two_phase_topk_equals_window_topk(spark):
    df = _skewed(spark)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    plain = (
        df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5).collect()
    )
    two_phase = two_phase_topk(
        df, ["user_id"], "value", k=5, buckets=8, tiebreak="event_id"
    ).collect()
    assert sorted(map(tuple, two_phase)) == sorted(map(tuple, plain))


def test_two_stage_distinct_count(spark):
    df = _skewed(spark)
    plain = {
        r.user_id: r.n
        for r in df.groupBy("user_id").agg(F.countDistinct("value").alias("n")).collect()
    }
    staged = {
        r.user_id: r.n_distinct_value
        for r in two_stage_distinct_count(df, ["user_id"], "value").collect()
    }
    assert staged == plain
