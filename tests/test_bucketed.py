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


def test_zorder_layout_prunes_2d_box_and_is_exact(spark, sf_dir, tmp_path):
    """Z-order layout: a 2-D box predicate must (a) return exactly the
    rows a direct filter returns, and (b) prune partition DIRECTORIES
    — the scan lists only the Z-buckets whose cells intersect the box,
    which no 1-D layout can do for a conjunctive 2-D predicate."""
    from kafka_spark_streaming_pipeline_spark.catalog import load_table
    from kafka_spark_streaming_pipeline_spark.sources.zorder import (
        read_zordered_box,
        write_zordered,
        zbuckets_for_box,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    xr, yr = (0.0, 51.0), (0.0, 100000.0)
    path = str(tmp_path / "zorder_li")
    write_zordered(
        li, path, "l_quantity", "l_extendedprice", xr, yr, bits=4, prefix_bits=4
    )

    box = dict(x_lo=5.0, x_hi=15.0, y_lo=1000.0, y_hi=20000.0)
    got = read_zordered_box(
        spark, path, "l_quantity", "l_extendedprice",
        box["x_lo"], box["x_hi"], box["y_lo"], box["y_hi"],
        xr, yr, bits=4, prefix_bits=4,
    )
    expected = li.filter(
        (F.col("l_quantity").between(box["x_lo"], box["x_hi"]))
        & (F.col("l_extendedprice").between(box["y_lo"], box["y_hi"]))
    )
    assert got.count() == expected.count() > 0

    # pruning: candidate buckets are a strict subset of all buckets,
    # and the scan's PartitionFilters carry the IN-list
    buckets = zbuckets_for_box(
        box["x_lo"], box["x_hi"], box["y_lo"], box["y_hi"], xr, yr, 4, 4
    )
    total = spark.read.parquet(path).select("zbucket").distinct().count()
    assert 0 < len(buckets) < total
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zbucket" in plan


def test_zvalue_locality_beats_1d_layout(spark):
    """The point of Z-order: for a square box over a uniform grid, the
    Z-prefix bucket set is (much) smaller than the fraction of a 1-D
    layout's partitions the same box touches on its SECOND dimension
    (a 1-D layout prunes nothing for the other column: all partitions
    contain every y)."""
    from kafka_spark_streaming_pipeline_spark.sources.zorder import (
        zbuckets_for_box,
    )

    xr = yr = (0.0, 256.0)
    # a 1/4 x 1/4 box in the corner
    z = zbuckets_for_box(0.0, 63.0, 0.0, 63.0, xr, yr, bits=4, prefix_bits=4)
    # 16 prefix buckets total; the quarter-box touches only its quadrant
    assert len(z) <= 4


def test_sorted_export_global_order_and_pruned_range_reads(spark, sf_dir, tmp_path):
    """write_sorted: shards are range-DISJOINT and internally sorted
    (concatenation in shard order is the global order), and a range
    probe reads only intersecting shards with exact results."""
    from kafka_spark_streaming_pipeline_spark.catalog import load_table
    from kafka_spark_streaming_pipeline_spark.sources.sorted_export import (
        read_sorted_range,
        write_sorted,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    dest = str(tmp_path / "sorted_li")
    write_sorted(li, dest, "l_extendedprice", n_shards=8)

    manifest = {
        r.shard: (r.key_min, r.key_max, r.n_rows)
        for r in spark.read.parquet(f"{dest}/_manifest").collect()
    }
    # ranges are disjoint and ordered by shard id; counts total correctly
    bounds = [manifest[s] for s in sorted(manifest)]
    for (_, hi_prev, _), (lo_next, _, _) in zip(bounds, bounds[1:]):
        assert hi_prev <= lo_next
    assert sum(b[2] for b in bounds) == li.count()

    # each shard is internally sorted
    data = spark.read.parquet(f"{dest}/data")
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.monotonically_increasing_id())
    disorder = (
        data.withColumn("prev", F.lag("l_extendedprice").over(w))
        .filter(F.col("prev") > F.col("l_extendedprice"))
        .count()
    )
    assert disorder == 0

    # range probe: exact vs direct filter, and fewer shards touched
    lo, hi = 1000.0, 5000.0
    got = read_sorted_range(spark, dest, "l_extendedprice", lo, hi)
    expect = li.filter(F.col("l_extendedprice").between(lo, hi)).count()
    assert got.count() == expect > 0
    touched = {
        s for s, (mn, mx, _) in manifest.items() if mn <= hi and mx >= lo
    }
    assert 0 < len(touched) < len(manifest)


def test_bucketed_fingerprint_corpus_dedups_without_exchange(spark, sf_dir, tmp_path):
    """Physical design for the dedup tier: a corpus persisted BUCKETED
    on its text fingerprint lets the exact-dedup aggregation (groupBy
    fingerprint) and the history join both run with ZERO shuffle
    exchanges — at 100 TB the fingerprint shuffle IS the cost of exact
    dedup, and bucketing pays it once at write time."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_pipeline_spark.catalog import load_table
    from kafka_spark_streaming_pipeline_spark.operators.text import fingerprint
    from kafka_spark_streaming_pipeline_spark.sources.bucketed import (
        shuffle_exchange_count,
        write_bucketed,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fingerprint", fingerprint(F.col("text"))
    )
    write_bucketed(docs, "docs_by_fp", ["fingerprint"], 8)
    try:
        t = spark.table("docs_by_fp")
        groups = t.groupBy("fingerprint").agg(
            F.count("*").alias("n"), F.min("doc_id").alias("canonical_id")
        )
        assert shuffle_exchange_count(groups) == 0  # bucketing feeds the agg
        assert groups.count() == docs.select("fingerprint").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_by_fp")
