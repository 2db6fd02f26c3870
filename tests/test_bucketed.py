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


def test_partitioned_sink_prunes_partitions(spark, sf_dir, tmp_path):
    """S5 sink layout at scale: a stream_id-partitioned table serves
    per-stream reads by pruning to one directory (PartitionFilters in
    the scan, not a post-scan filter)."""
    from kafka_spark_streaming_pipeline_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events").withColumn(
        "bucket_id", (F.col("user_id") % 5).cast("long")
    )
    path = str(tmp_path / "part_events")
    events.write.partitionBy("bucket_id").parquet(path)

    one = spark.read.parquet(path).filter(F.col("bucket_id") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket_id" in plan
    # pruned scan reads exactly the one partition's rows
    expected = events.filter(F.col("user_id") % 5 == 3).count()
    assert one.count() == expected


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: a fact table partitioned on the join key must be pruned at
    RUNTIME by a filter on the joined dimension — at 100 TB this is the
    difference between scanning every date partition and only the ones
    the dim filter selects.  The plan shows a dynamicpruning subquery
    on the partition column."""
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    fact_path = str(tmp_path / "orders_by_nation")
    # partition the fact by customer nation (via a join), small cardinality
    (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "o_totalprice", F.col("c_nationkey").alias("nationkey"))
        .write.partitionBy("nationkey")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = nation.filter(F.col("n_name") == "NATION_3")
    joined = fact.join(dim, fact.nationkey == dim.n_nationkey).agg(
        F.count("*").alias("n"), F.sum("o_totalprice").alias("total")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert joined.collect()[0]["n"] > 0
