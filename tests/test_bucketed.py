"""Bucketed co-located join: the plan must contain ZERO shuffle
exchanges when both sides are bucketed on the join key with equal
bucket counts — versus two for the plain parquet join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_pipeline_spark.catalog import load_table
from kafka_spark_streaming_pipeline_spark.sources.bucketed import (
    bucketed_join,
    shuffle_exchange_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["o_orderkey"])
        assert shuffle_exchange_count(joined) == 0

        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        plain = orders.join(lineitem, ["o_orderkey"])
        assert shuffle_exchange_count(plain) >= 2

        # same result either way
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
