"""Batch relational core — oracle-checked queries (SURVEY.md §2, Phase 2).

Covers scans/filters/projections (P1-P7), joins (§2.3: equi/broadcast/
semi/anti/theta), aggregations (A1-A7 + rollup/cube), window functions
(W1-W4 + ranking), sorts/limits/top-k (T1), set ops (§2.7), and the
scalar-function surface (F1-F10) over the driver's TPC-H-ish tables.

Each builder is the idiomatic Catalyst-friendly plan: filters first
(parquet pushdown), dimension joins broadcast, aggregates expressed
with built-ins so whole-stage codegen covers the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


def _r(col, n: int):
    """Boundary-safe rounding for float aggregates: Spark rounds via the
    shortest decimal repr (HALF_UP) while DuckDB rounds the exact binary
    value, so results sitting exactly on a decimal boundary (e.g. 4.475)
    diverge.  A +1e-9 nudge (mirrored in every oracle) moves systematic
    boundary values off the edge; genuine aggregate noise is ~1e-10.
    Per-row deterministic arithmetic is NOT rounded at all — identical
    IEEE ops give bit-identical doubles in both engines."""
    return F.round(col + F.lit(1e-9), n)


# ---------------------------------------------------------------- scans/aggs

@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity) + 1e-9, 2)                                        AS sum_qty,
           round(sum(l_extendedprice) + 1e-9, 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 1e-9, 2)  AS sum_charge,
           round(avg(l_quantity) + 1e-9, 2)                                        AS avg_qty,
           round(avg(l_extendedprice) + 1e-9, 2)                                   AS avg_price,
           round(avg(l_discount) + 1e-9, 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: grouped multi-aggregate scan.

    The reference's running counters (spark_streaming.py:74-100) are the
    degenerate form of this; here it is one shuffle with map-side partial
    aggregation, 8 aggregates in a single pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity"), 2).alias("sum_qty"),
            _r(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            _r(F.sum(disc_price), 2).alias("sum_disc_price"),
            _r(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            _r(F.avg("l_quantity"), 2).alias("avg_qty"),
            _r(F.avg("l_extendedprice"), 2).alias("avg_price"),
            _r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q02_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicates (P1/P2/P4) — all pushed to the
    parquet scan; revenue is a per-row codegen expression (TPC-H Q6 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# --------------------------------------------------------------------- joins

@query(
    "q03_join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           count(*) AS n_orders,
           round(sum(o.o_totalprice) + 1e-9, 2) AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY r.r_name, n.n_name
    """,
)
def q03_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join with broadcast dimensions: orders (fact) joined to
    customer -> nation -> region.  nation/region are tiny — explicitly
    broadcast so the fact table never shuffles for them; at 100 TB the
    orders<->customer join is the only real shuffle (both sides keyed)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_orders"),
            _r(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


@query(
    "q04_join_semi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    )
    GROUP BY c_mktsegment
    """,
)
def q04_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with a 1995+ order, by segment."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "q05_join_anti",
    oracle="""
    SELECT c.c_nationkey AS nationkey, count(*) AS n_customers_no_big_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 250000)
    GROUP BY c.c_nationkey
    """,
)
def q05_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no high-value
    (>250k) order, per nation."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers_no_big_orders"))
    )


@query(
    "q06_join_theta",
    oracle="""
    SELECT s.s_nationkey AS nationkey,
           count(*) AS n_pairs,
           round(avg(s.s_acctbal - c.c_acctbal) + 1e-9, 2) AS avg_gap
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY s.s_nationkey
    """,
)
def q06_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + inequality (theta) join predicate: supplier/customer pairs in
    the same nation where the supplier out-balances the customer.  The
    equi key keeps it a hash join; the inequality is a post-join filter
    Catalyst folds into the join condition."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    joined = supplier.join(
        customer,
        (supplier.s_nationkey == customer.c_nationkey)
        & (supplier.s_acctbal > customer.c_acctbal),
    )
    return joined.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_pairs"),
        _r(F.avg(F.col("s_acctbal") - F.col("c_acctbal")), 2).alias("avg_gap"),
    )


# -------------------------------------------------------------- aggregations

@query(
    "q07_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_quantity) + 1e-9, 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q07_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (absent from the reference — SURVEY §2.4;
    Catalyst expands to a single shuffle with grouping-id)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        _r(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "q08_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice) + 1e-9, 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q08_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status x priority."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        _r(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "q09_distinct_agg",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           count(DISTINCT c_nationkey) AS n_nations,
           round(sum(c_acctbal) + 1e-9, 2) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q09_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (A4's exact form; the streaming
    layer uses approx_count_distinct for the gauge)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        _r(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "q10_histogram",
    oracle="""
    SELECT CASE WHEN l_quantity <= 10 THEN 'le_10'
                WHEN l_quantity <= 20 THEN 'le_20'
                WHEN l_quantity <= 30 THEN 'le_30'
                WHEN l_quantity <= 40 THEN 'le_40'
                ELSE 'gt_40' END AS bucket,
           count(*) AS n,
           round(avg(l_extendedprice) + 1e-9, 2) AS avg_price
    FROM lineitem
    GROUP BY 1
    """,
)
def q10_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bucket histogram aggregation (A3 — the Prometheus latency
    histogram generalized): CASE bucketing + grouped count."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") <= 10, "le_10")
        .when(F.col("l_quantity") <= 20, "le_20")
        .when(F.col("l_quantity") <= 30, "le_30")
        .when(F.col("l_quantity") <= 40, "le_40")
        .otherwise("gt_40")
    )
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        _r(F.avg("l_extendedprice"), 2).alias("avg_price"),
    )


# ------------------------------------------------------------------- windows

@query(
    "q11_seq_gap_detect",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS gap_events,
           CAST(sum(greatest(gap, 0)) AS BIGINT) AS missing_total
    FROM (
      SELECT user_id,
             event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS gap
      FROM events
    )
    GROUP BY user_id
    """,
)
def q11_seq_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-key sequence-gap detection, the reference's core stateful
    computation (spark_streaming.py:379-385) as a lag() window: per user,
    a gap is a jump in event_id; `missing_total` counts missing items
    (the reference's inc(gap_size) semantics), `gap_events` counts jumps."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    gap = (F.col("event_id") - F.lag("event_id").over(w) - 1).alias("gap")
    return (
        events.select("user_id", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("gap") > 0, 1).otherwise(0)).cast("bigint").alias("gap_events"),
            F.sum(F.greatest(F.col("gap"), F.lit(0))).cast("bigint").alias("missing_total"),
        )
    )


@query(
    "q12_latest_per_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q12_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — top-1 per key (the reference's find_one(sort=chunk_index desc),
    api/main.py:321-324): row_number over a desc window, rn = 1."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "q13_tail_window",
    oracle="""
    SELECT user_id, event_id, pos
    FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS pos
      FROM events
    ) WHERE pos <= 10
    """,
)
def q13_tail_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — trailing-N window per key (the DVR last-10 slide,
    spark_streaming.py:430-432): keep the 10 newest rows per user."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 10)
        .select("user_id", "event_id", "pos")
    )


@query(
    "q14_dvr_window_start",
    oracle="""
    SELECT user_id,
           max(seq) AS last_seq,
           greatest(0, max(seq) - 9) AS dvr_window_start
    FROM (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS seq
      FROM events
    )
    GROUP BY user_id
    """,
)
def q14_dvr_window_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — the DVR base-sequence arithmetic greatest(0, idx - N + 1)
    (spark_streaming.py:435), over a synthesized per-key chunk index."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (F.row_number().over(w) - 1).alias("seq")
    return (
        events.select("user_id", seq)
        .groupBy("user_id")
        .agg(
            F.max("seq").alias("last_seq"),
            F.greatest(F.lit(0), F.max("seq") - F.lit(9)).alias("dvr_window_start"),
        )
    )


@query(
    "q15_rank_in_group",
    oracle="""
    SELECT c_nationkey AS nationkey, c_custkey, c_acctbal AS acctbal,
           bal_rank, bal_dense_rank
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
             rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
             dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense_rank
      FROM customer
    ) WHERE rn <= 5
    """,
)
def q15_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions (rank/dense_rank; absent from the reference
    — SURVEY §2.5): top-5 customers by balance per nation."""
    customer = load_table(spark, sf_dir, "customer")
    w_det = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_rank = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        customer.select(
            F.col("c_nationkey").alias("nationkey"),
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.row_number().over(w_det).alias("rn"),
            F.rank().over(w_rank).alias("bal_rank"),
            F.dense_rank().over(w_rank).alias("bal_dense_rank"),
        )
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "q16_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(1e-9 + sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           lead(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders
    """,
)
def q16_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with an explicit ROWS frame + lead() (analytic
    surface beyond the reference): cumulative customer spend."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_spend"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


# ------------------------------------------------------------- sorts / top-k

@query(
    "q17_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q17_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — global ORDER BY + LIMIT (Spark plans TakeOrderedAndProject:
    per-partition top-k then a tiny driver merge — no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("totalprice"))
    )


@query(
    "q18_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice AS totalprice, k
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS k
      FROM orders
    ) WHERE k <= 5
    """,
)
def q18_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window (the scalable top-k idiom —
    partial top-k happens map-side under AQE)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("k", F.row_number().over(w))
        .filter(F.col("k") <= 5)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            "k",
        )
    )


# ------------------------------------------------------------------- set ops

@query(
    "q19_union",
    oracle="""
    SELECT nationkey, count(*) AS n_sources FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def q19_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two keyed projections + re-aggregation (§2.7)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    u = customer.select(F.col("c_nationkey").alias("nationkey")).distinct().unionAll(
        supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    )
    return u.groupBy("nationkey").agg(F.count("*").alias("n_sources"))


@query(
    "q20_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q20_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "q21_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def q21_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no
    high-balance supplier."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


# ----------------------------------------------------------- scalar surface

@query(
    "q22_scalar_checksum_paths",
    oracle="""
    SELECT event_id,
           'live-' || CAST(user_id AS VARCHAR) AS stream_id,
           md5('live-' || CAST(user_id AS VARCHAR) || '-' || CAST(event_id AS VARCHAR)) AS checksum,
           printf('%s/%s/%d.ts', 'live-' || CAST(user_id AS VARCHAR), '1080p', event_id) AS chunk_path,
           substr(md5(CAST(event_id AS VARCHAR)), 1, 12) AS short_id
    FROM events
    WHERE event_id % 50 = 0
    """,
)
def q22_scalar_checksum_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface F1/F2/F3/F10: md5 checksums, printf-style
    object keys, deterministic short ids, and mod-sampling — all
    vectorized built-ins (the reference computes each per-row in Python:
    producer.py:130-136, spark_streaming.py:245, api/main.py:225)."""
    events = load_table(spark, sf_dir, "events")
    stream_id = F.concat(F.lit("live-"), F.col("user_id").cast("string"))
    return events.filter(F.col("event_id") % 50 == 0).select(
        "event_id",
        stream_id.alias("stream_id"),
        F.md5(F.concat(stream_id, F.lit("-"), F.col("event_id").cast("string"))).alias("checksum"),
        F.format_string("%s/%s/%d.ts", stream_id, F.lit("1080p"), F.col("event_id")).alias(
            "chunk_path"
        ),
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 12).alias("short_id"),
    )


@query(
    "q23_time_buckets",
    oracle="""
    SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_bucket,
           count(*) AS n_events,
           round(sum(value) + 1e-9, 2) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def q23_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/A7 — event-time tumbling buckets (the batch form of the
    streaming rate derivation, producer.py:361-375): hourly counts."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.date_trunc("hour", "ts").alias("hour_bucket")).agg(
        F.count("*").alias("n_events"),
        _r(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q24_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def q24_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — JSON decode as a column expression (`from_json`; replaces the
    reference's driver-side json.loads, spark_streaming.py:513)."""
    from ..schemas import EVENT_PROPS_SCHEMA

    events = load_table(spark, sf_dir, "events")
    k = F.from_json("props", EVENT_PROPS_SCHEMA)["k"]
    return (
        events.select("event_id", k.alias("k"))
        .filter(F.col("k") >= 50)
        .withColumn("k_mod", F.col("k") % 10)
    )


@query(
    "q25_conditional_defaults",
    oracle="""
    SELECT event_id,
           coalesce(value, 0.0) AS value_filled,
           CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS value_class,
           CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion' ELSE 'engagement' END AS funnel_stage
    FROM events
    """,
)
def q25_conditional_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/F8 — coalesce defaults + CASE classification (the reference's
    dict.get defaults, spark_streaming.py:209-216, as codegen'd exprs)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
        .alias("value_class"),
        F.when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .otherwise("engagement")
        .alias("funnel_stage"),
    )


@query(
    "q26_union_by_name",
    oracle="""
    SELECT user_id, kind, n FROM (
      SELECT user_id, 'purchase' AS kind, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
      UNION ALL
      SELECT user_id, 'error' AS kind, count(*) AS n
      FROM events WHERE event_type = 'error' GROUP BY user_id
    )
    """,
)
def q26_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — unionByName of two branch aggregations (the reference keeps
    its two topics as separate queries; the engine unifies them)."""
    events = load_table(spark, sf_dir, "events")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("purchase"))
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("error"))
    )
    return purchases.unionByName(errors).select("user_id", "kind", "n")


@query(
    "q27_pivot",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """,
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type -> columns (explicit value list so no extra
    distinct-scan pass; missing combinations coalesced to 0)."""
    events = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    pivoted = events.groupBy("user_id").pivot("event_type", kinds).count()
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


# ------------------------------------------------- grouping sets / subqueries

@query(
    "q28_grouping_sets",
    oracle="""
    SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS hour_bucket,
           count(*) AS n, round(sum(value) + 1e-9, 2) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (event_type, date_trunc('hour', ts)), ())
    """,
)
def q28_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS beyond rollup/cube (q07/q08): per-type totals,
    per-type-per-hour detail, and the grand total in ONE pass — Catalyst
    expands to a single shuffle with a grouping-id column, replacing
    three separate scans.  Runs through spark.sql to exercise the SQL
    entry path (parser -> analyzer -> same optimized plan)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, date_trunc('hour', ts) AS hour_bucket,
               count(*) AS n, round(sum(value) + 1e-9, 2) AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (event_type, date_trunc('hour', ts)), ())
        """
    )


@query(
    "q29_window_analytics",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ntile(4)       OVER w AS price_quartile,
           round(percent_rank() OVER w + 1e-9, 4) AS pct_rank,
           round(cume_dist()    OVER w + 1e-9, 4) AS cume,
           lead(o_orderkey)  OVER w AS next_orderkey,
           lag(o_orderkey)   OVER w AS prev_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) + 1e-9, 2) AS nearby_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q29_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window surface SURVEY §2.5 marks absent from the
    reference: ntile / percent_rank / cume_dist / lead / lag on a fully
    deterministic order (price, orderkey tiebreak) plus a RANGE frame
    (value-based, vs q16's ROWS frame).  One shuffle on o_custkey
    shared by every window."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wr = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-50000, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
        _r(F.percent_rank().over(w), 4).alias("pct_rank"),
        _r(F.cume_dist().over(w), 4).alias("cume"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        _r(F.sum("o_totalprice").over(wr), 2).alias("nearby_sum"),
    )


@query(
    "q30_subqueries",
    oracle="""
    SELECT o_custkey, count(*) AS n_big_orders,
           round(sum(o_totalprice) + 1e-9, 2) AS big_total
    FROM orders o
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      AND EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
      AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 10)
    GROUP BY o_custkey
    """,
)
def q30_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery surface (SURVEY §4.2 decorrelation): scalar subquery
    (global avg), correlated EXISTS (-> left-semi after decorrelation),
    and uncorrelated IN — Catalyst rewrites all three into joins; the
    two semi-joins against customer broadcast."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_custkey, count(*) AS n_big_orders,
               round(sum(o_totalprice) + 1e-9, 2) AS big_total
        FROM orders o
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
          AND EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 10)
        GROUP BY o_custkey
        """
    )


@query(
    "q31_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25) + 1e-9, 4) AS p25,
           round(quantile_cont(value, 0.50) + 1e-9, 4) AS p50,
           round(quantile_cont(value, 0.75) + 1e-9, 4) AS p75,
           round(quantile_cont(value, 0.99) + 1e-9, 4) AS p99,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q31_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (A3's precise form — the reference
    only has fixed histogram buckets, spark_streaming.py:91-96).  Exact
    `percentile` is oracle-comparable (linear interpolation in both
    engines); the streaming layer uses percentile_approx instead where
    a mergeable sketch is required."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        _r(F.percentile("value", 0.25), 4).alias("p25"),
        _r(F.percentile("value", 0.50), 4).alias("p50"),
        _r(F.percentile("value", 0.75), 4).alias("p75"),
        _r(F.percentile("value", 0.99), 4).alias("p99"),
        F.count("*").alias("n"),
    )


@query(
    "q32_skew_topk",
    oracle="""
    SELECT user_id, event_id, value, rank FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rank
      FROM events
    ) WHERE rank <= 3
    """,
)
def q32_skew_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per user via the two-phase salted top-k
    (operators/skew.two_phase_topk): per-(key,salt) partial rank, then
    final rank over <= k*buckets survivors — no single task ever sorts
    a hot key's full row set.  Oracle-checked equal to the plain
    window form."""
    from ..operators.skew import two_phase_topk

    events = load_table(spark, sf_dir, "events")
    return two_phase_topk(
        events.select("user_id", "event_id", "value"),
        keys=["user_id"],
        order_col="value",
        k=3,
        tiebreak="event_id",
    )


@query(
    "q33_star_join_five_tables",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue,
           count(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
    GROUP BY n_name
    """,
)
def q33_star_join_five_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style five-table star join: Catalyst reorders the join
    graph, broadcasts every dimension (region/nation/customer), and
    pushes both filters to the scans — lineitem, the fact, is joined
    last and never shuffles for the dims."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "q34_correlated_avg_subquery",
    oracle="""
    SELECT l.l_partkey,
           round(sum(l.l_extendedprice) + 1e-9, 2) AS small_qty_revenue,
           count(*) AS n
    FROM lineitem l
    JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    GROUP BY l.l_partkey
    """,
)
def q34_correlated_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated aggregate: each lineitem compared to
    its part's average quantity.  Written as the decorrelated form a
    correlated scalar subquery compiles to — one grouped aggregate
    joined back to the fact (the join key is the correlation key)."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            _r(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q35_set_ops_all",
    oracle="""
    SELECT user_id, event_id FROM (
      SELECT user_id, event_id FROM events WHERE value >= 50
      INTERSECT ALL
      SELECT user_id, event_id FROM events WHERE event_type IN ('click', 'view')
    )
    UNION ALL
    SELECT user_id, event_id FROM (
      SELECT user_id, event_id FROM events WHERE value >= 50
      EXCEPT ALL
      SELECT user_id, event_id FROM events WHERE event_type IN ('click', 'view')
    )
    """,
)
def q35_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops (INTERSECT ALL / EXCEPT ALL — §2.7's bag
    semantics variants; q20/q21 cover the distinct forms).  Their union
    reconstructs the left branch, which the oracle verifies row-for-row
    with duplicates preserved."""
    events = load_table(spark, sf_dir, "events")
    high = events.filter(F.col("value") >= 50).select("user_id", "event_id")
    clicky = events.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_id"
    )
    return high.intersectAll(clicky).unionAll(high.exceptAll(clicky))


@query(
    "q36_null_aware_windows",
    oracle="""
    SELECT event_id, user_id, value,
           first_value(value IGNORE NULLS) OVER w AS first_val,
           last_value(value IGNORE NULLS) OVER w2 AS running_last_val,
           nth_value(event_id, 2) OVER w2 AS second_event,
           count(*) FILTER (WHERE value > 100) OVER w2 AS n_big_so_far
    FROM (SELECT event_id, user_id,
                 CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
          FROM events)
    WINDOW w  AS (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           w2 AS (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q36_null_aware_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware window surface: first/last IGNORE NULLS, nth_value,
    and a filtered window count over a running frame (every 7th value
    nulled to exercise the skip paths)."""
    events = load_table(spark, sf_dir, "events")
    nulled = events.select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias("value"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return nulled.select(
        "event_id",
        "user_id",
        "value",
        F.first("value", ignorenulls=True).over(w).alias("first_val"),
        F.last("value", ignorenulls=True).over(w2).alias("running_last_val"),
        F.nth_value("event_id", 2).over(w2).alias("second_event"),
        F.count(F.when(F.col("value") > 100, 1)).over(w2).alias("n_big_so_far"),
    )


@query(
    "q37_array_functions",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_toks,
           list_contains(toks, 'the') AS has_the,
           list_sort(toks)[1] AS first_sorted,
           toks[2] AS second_tok,
           list_position(toks, 'the') AS the_pos,
           array_to_string(list_slice(toks, 1, 3), '_') AS head3,
           len(list_distinct(toks)) AS n_distinct_toks
    FROM t
    """,
)
def q37_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (§2.8 'array/map functions'): size,
    contains, sort, index, position, slice+join, distinct — the token
    array manipulated entirely JVM-side."""
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "the").alias("has_the"),
        F.sort_array(toks)[0].alias("first_sorted"),
        F.element_at(toks, 2).alias("second_tok"),
        F.array_position(toks, "the").alias("the_pos"),
        F.array_join(F.slice(toks, 1, 3), "_").alias("head3"),
        F.size(F.array_distinct(toks)).alias("n_distinct_toks"),
    )


@query(
    "q38_string_functions",
    oracle="""
    SELECT event_id, event_type,
           levenshtein(event_type, 'click') AS dist_click,
           translate(event_type, 'aeiou', 'AEIOU') AS vowels_up,
           lpad(CAST(event_id % 1000 AS VARCHAR), 6, '0') AS padded_id,
           reverse(event_type) AS rev,
           repeat(substr(event_type, 1, 2), 2) AS rep2,
           length(event_type) AS type_len
    FROM events WHERE event_id % 100 = 0
    """,
)
def q38_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface beyond F1-F5: edit distance, translate,
    padding, reverse, repeat — all JVM built-ins with DuckDB twins."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") % 100 == 0).select(
        "event_id",
        "event_type",
        F.levenshtein("event_type", F.lit("click")).alias("dist_click"),
        F.translate("event_type", "aeiou", "AEIOU").alias("vowels_up"),
        F.lpad((F.col("event_id") % 1000).cast("string"), 6, "0").alias("padded_id"),
        F.reverse("event_type").alias("rev"),
        F.repeat(F.substring("event_type", 1, 2), 2).alias("rep2"),
        F.length("event_type").alias("type_len"),
    )


@query(
    "q39_datetime_functions",
    oracle="""
    SELECT event_id,
           year(ts) AS y, month(ts) AS m, day(ts) AS d,
           dayofweek(ts) + 1 AS dow,
           CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end,
           CAST(CAST(ts AS DATE) + INTERVAL 90 DAY AS DATE)::VARCHAR AS plus_90d,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_2024
    FROM events WHERE event_id % 100 = 0
    """,
)
def q39_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime surface beyond F6: field extraction, week-day numbering
    (Spark's 1=Sunday vs DuckDB's 0=Sunday bridged in the oracle),
    month boundaries, date arithmetic.  Dates cast to strings for the
    comparison — identical ISO text in both engines."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") % 100 == 0).select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.dayofweek("ts").alias("dow"),
        F.last_day("ts").cast("string").alias("month_end"),
        F.date_add(F.col("ts").cast("date"), 90).cast("string").alias("plus_90d"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_2024"
        ),
    )


@query(
    "q40_resample_ffill",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR))::TIMESTAMP AS bucket
      FROM bounds
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS bucket,
             count(*) AS n, round(sum(value) + 1e-9, 2) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id, g.bucket,
           coalesce(h.n, 0) AS n_events,
           h.sum_value,
           last_value(h.sum_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_ffill
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def q40_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: a dense per-key hourly grid
    (sequence + explode — no driver loop), left-joined to the actual
    hourly aggregate, missing buckets forward-filled with an
    IGNORE-NULLS running last.  Delegates to
    ``operators.timeseries.resample_ffill`` (uncapped exact form; see
    its SCALE NOTE for the grid's two growth axes — keys x span — and
    the ``max_grid_hours`` loud cap for the span axis)."""
    from ..operators.timeseries import resample_ffill

    events = load_table(spark, sf_dir, "events")
    return resample_ffill(events)


@query(
    "q41_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), stages AS (
      SELECT '1_view' AS stage, count(*) AS n_users FROM v
      UNION ALL SELECT '2_click', count(*) FROM c
      UNION ALL SELECT '3_purchase', count(*) FROM p
    )
    SELECT stage, n_users,
           round(n_users / CAST((SELECT n_users FROM stages WHERE stage = '1_view')
                                AS DOUBLE) + 1e-9, 4) AS pct_of_first
    FROM stages
    """,
)
def q41_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the events stream: first view ->
    first click strictly after it -> first purchase strictly after
    that (strictly ordered, not min-per-type, so out-of-order
    click-before-view doesn't count).  The per-stage aggregates scale
    with user cardinality, so the stage joins carry NO broadcast hint:
    AQE broadcasts them when the runtime size is actually small and
    falls back to a shuffled hash join when it isn't — a forced hint
    here would OOM at 100x the users.  Only the single-row funnel
    total is explicitly broadcast."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stages = (
        v.agg(F.lit("1_view").alias("stage"), F.count("*").alias("n_users"))
        .unionAll(c.agg(F.lit("2_click").alias("stage"), F.count("*").alias("n_users")))
        .unionAll(p.agg(F.lit("3_purchase").alias("stage"), F.count("*").alias("n_users")))
    )
    first = stages.filter(F.col("stage") == "1_view").select(
        F.col("n_users").alias("n_first")
    )
    return stages.crossJoin(F.broadcast(first)).select(
        "stage",
        "n_users",
        _r(F.col("n_users") / F.col("n_first"), 4).alias("pct_of_first"),
    )


@query(
    "q42_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort
      FROM events GROUP BY user_id
    ), sizes AS (
      SELECT cohort, count(*) AS n_cohort FROM first GROUP BY cohort
    ), act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS wk FROM events
    )
    SELECT f.cohort, date_diff('day', f.cohort::DATE, a.wk::DATE) // 7 AS week_offset,
           count(*) AS n_active, s.n_cohort,
           round(count(*) / CAST(s.n_cohort AS DOUBLE) + 1e-9, 4) AS retention
    FROM act a JOIN first f ON a.user_id = f.user_id
    JOIN sizes s ON f.cohort = s.cohort
    GROUP BY f.cohort, week_offset, s.n_cohort
    """,
)
def q42_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    fraction of each cohort active N weeks later.  The per-user
    ``first`` aggregate scales with user cardinality, so its join gets
    NO broadcast hint (AQE decides from the runtime size); only
    ``sizes`` — one row per cohort WEEK, bounded by calendar time, not
    users — is explicitly broadcast.  Week arithmetic stays integral
    (both engines truncate to Monday, so day-diff/7 is exact)."""
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(F.count("*").alias("n_cohort"))
    act = events.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        act.join(first, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date")) / 7).cast("long"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_offset",
            "n_active",
            "n_cohort",
            _r(F.col("n_active") / F.col("n_cohort"), 4).alias("retention"),
        )
    )


@query(
    "q43_map_functions",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, user_id FROM events WHERE event_id % 50 = 0
    )
    SELECT event_id, 3 AS n_keys, 'EVENTS' AS src, k AS key, v AS value FROM (
      SELECT event_id, 'type' AS k, upper(event_type) AS v FROM base
      UNION ALL
      SELECT event_id, 'user', CAST(user_id AS VARCHAR) FROM base
    )
    """,
)
def q43_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface (§2.8 'array/map functions'): create_map,
    map_concat, transform_values, map_filter, map_keys, element_at,
    and map explode — the semi-structured column toolkit the reference
    handles as raw Python dicts.  The oracle states the expected rows
    relationally (DuckDB MAPs render differently), so the whole map
    pipeline is value-checked through its exploded form."""
    events = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("src"), F.lit("events")))
    m3 = F.transform_values(m2, lambda k, v: F.upper(v))
    m4 = F.map_filter(m3, lambda k, v: k != F.lit("src"))
    return (
        events.filter(F.col("event_id") % 50 == 0)
        .select(
            "event_id",
            F.size(F.map_keys(m2)).alias("n_keys"),
            F.element_at(m3, F.lit("src")).alias("src"),
            F.explode(m4).alias("key", "value"),
        )
    )


@query(
    "q44_trailing_24h_frame",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, value, epoch(ts) AS tsec FROM events
    ), w AS (
      SELECT event_id, user_id,
             count(*) OVER win AS n_24h,
             round(sum(value) OVER win + 1e-9, 2) AS value_24h
      FROM t
      WINDOW win AS (PARTITION BY user_id ORDER BY tsec
                     RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, n_24h, value_24h FROM w WHERE event_id % 50 = 0
    """,
)
def q44_trailing_24h_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (SURVEY §2.5 'range frames'): per-user
    trailing-24-hour event count and value sum, ordered by event time in
    epoch seconds (integral in both engines, so frame membership is
    engine-independent).  The window computes over the full stream; the
    output subset filters afterwards — predicate NOT pushed through the
    window, by semantics."""
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-86400, 0)
    )
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_24h"),
            _r(F.sum("value").over(w), 2).alias("value_24h"),
        )
        .filter(F.col("event_id") % 50 == 0)
    )


@query(
    "q45_resample_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR))::TIMESTAMP AS bucket
      FROM bounds
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS bucket,
             count(*) AS n, round(avg(value) + 1e-9, 2) AS avg_value
      FROM events GROUP BY 1, 2
    ), joined AS (
      SELECT g.user_id, g.bucket, coalesce(h.n, 0) AS n_events, h.avg_value
      FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    ), anchored AS (
      SELECT *,
        last_value(avg_value IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
        last_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_bucket,
        first_value(avg_value IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_val,
        first_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_bucket
      FROM joined
    )
    SELECT user_id, bucket, n_events,
      CASE
        WHEN avg_value IS NOT NULL THEN avg_value
        WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
          round(prev_val + (next_val - prev_val)
                * (CAST(epoch(bucket) AS DOUBLE) - CAST(epoch(prev_bucket) AS DOUBLE))
                / (CAST(epoch(next_bucket) AS DOUBLE) - CAST(epoch(prev_bucket) AS DOUBLE))
                + 1e-9, 4)
        ELSE coalesce(prev_val, next_val)
      END AS value_interp,
      CASE
        WHEN avg_value IS NOT NULL THEN 'actual'
        WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN 'interp'
        WHEN prev_val IS NOT NULL THEN 'ffill'
        ELSE 'bfill'
      END AS fill_kind
    FROM anchored
    """,
)
def q45_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with LINEAR INTERPOLATION (q40's sibling:
    ffill -> straight-line gap fill).  Same two-shuffle dense-grid plan
    — per-key bounds agg + grid-to-hourly join — plus one window pass
    computing the surrounding anchors (last/first IGNORE NULLS, never a
    self-join per gap); the interpolation itself is pure row
    arithmetic on the anchor columns.  Known buckets pass through
    unchanged; gaps before the first / after the last known point fall
    back to nearest-value fill."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").alias("n"), _r(F.avg("value"), 2).alias("avg_value"))
    wp = W.partitionBy("user_id").orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    wn = W.partitionBy("user_id").orderBy("bucket").rowsBetween(1, W.unboundedFollowing)
    known_bucket = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    anchored = (
        grid.join(hourly, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            "avg_value",
            F.last("avg_value", ignorenulls=True).over(wp).alias("prev_val"),
            F.last(known_bucket, ignorenulls=True).over(wp).alias("prev_bucket"),
            F.first("avg_value", ignorenulls=True).over(wn).alias("next_val"),
            F.first(known_bucket, ignorenulls=True).over(wn).alias("next_bucket"),
        )
    )
    frac = (
        F.unix_timestamp("bucket").cast("double")
        - F.unix_timestamp("prev_bucket").cast("double")
    ) / (
        F.unix_timestamp("next_bucket").cast("double")
        - F.unix_timestamp("prev_bucket").cast("double")
    )
    return anchored.select(
        "user_id",
        "bucket",
        "n_events",
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
            F.round(
                F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac + F.lit(1e-9),
                4,
            ),
        )
        .otherwise(F.coalesce("prev_val", "next_val"))
        .alias("value_interp"),
        F.when(F.col("avg_value").isNotNull(), F.lit("actual"))
        .when(F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(), F.lit("interp"))
        .when(F.col("prev_val").isNotNull(), F.lit("ffill"))
        .otherwise(F.lit("bfill"))
        .alias("fill_kind"),
    )


@query(
    "q46_scd2_intervals",
    oracle="""
    SELECT user_id, event_type AS status, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
    FROM events
    """,
)
def q46_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC -> slowly-changing-dimension type 2: each change event
    becomes a versioned validity interval ([valid_from, valid_to),
    open-ended for the current row) — the standard materialization of
    an upsert/change stream into a history table.  One window pass per
    key; at scale this is the same single shuffle as any per-key
    window, and the output is the join target for as-of lookups
    (operators/joins.asof_join)."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w).alias("version"),
    )


@query(
    "q47_sole_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), waiting AS (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM li l1
      WHERE late
        AND EXISTS (SELECT 1 FROM li l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM li l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.late)
    ), counted AS (
      SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM waiting w JOIN supplier s ON w.l_suppkey = s.s_suppkey
      GROUP BY 1
    )
    SELECT s_name, numwait, CAST(rn AS INT) AS rank
    FROM (SELECT s_name, numwait,
                 row_number() OVER (ORDER BY numwait DESC, s_name) AS rn
          FROM counted)
    WHERE rn <= 20
    """,
)
def q47_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape on the available columns: suppliers who were
    the SOLE late shipper on a multi-supplier order (late = shipped
    more than 60 days after the order date) — the classic composition
    of a fact self-SEMI-join (another supplier exists on the order)
    with a self-ANTI-join (no OTHER supplier was also late), the
    hardest decorrelation pattern in the TPC-H suite.

    Scale shape: the (orderkey, suppkey, late) projection is computed
    ONCE and persisted — all three roles (probe, semi, anti) read the
    cached narrow frame instead of re-joining lineitem x orders; both
    self-joins are orderkey-equi (well-spread); the final top-20 is a
    TakeOrderedAndProject over the 100-supplier aggregate."""
    from ..cache import tracked_persist

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    base = tracked_persist(
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("late"),
        )
    )
    l1 = base.filter("late").select("l_orderkey", "l_suppkey")
    l2 = base.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = base.filter("late").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .distinct()
    )
    counted = (
        waiting.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            waiting["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
    w = W.orderBy(F.col("numwait").desc(), "s_name")
    return (
        counted.select(
            "s_name", "numwait", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 20)
    )


@query(
    "q48_order_count_distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    """,
)
def q48_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many
    (non-urgent) orders — a FILTERED left outer join (the filter
    rides the join condition so customers with only urgent orders
    still count as zero, the part naive WHERE placement gets wrong)
    into a double aggregation.

    Scale shape: the outer join shuffles both sides on the customer
    key once; both aggregates combine map-side; the second groupBy is
    over the tiny (distinct order-count) domain."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    co = (
        customer.join(
            orders,
            (customer["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return co.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@query(
    "q49_top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q49_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's revenue-per-supplier view, then
    the supplier(s) achieving its MAXIMUM — the classic
    view + scalar-subquery-on-the-same-view pattern (ties all
    surface, unlike a LIMIT 1).  Revenue is rounded identically on
    both sides of the equality, so the max-match is engine-stable.

    Scale shape: the shipdate band is pushed to the scan; the revenue
    view is computed ONCE and persisted for its two consumers (rows +
    max); the supplier join broadcasts the dimension."""
    from ..cache import tracked_persist

    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = tracked_persist(
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        supplier.select("s_suppkey", "s_name")
        .join(rev, F.col("s_suppkey") == rev["l_suppkey"])
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q50_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity) + 1e-9, 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, o.o_orderkey,
           round(o.o_totalprice + 1e-9, 2) AS o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q50_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    the large-volume threshold, joined back to order and customer —
    the aggregate-HAVING-then-enrich pattern (the IN-subquery form
    decorrelates to exactly this plan).

    Scale shape: ONE lineitem aggregate on the order key; the
    survivors (a ~1% tail at the 250 threshold) drive both enrichment
    joins, so order/customer rows are only touched for qualifying
    orders under AQE's runtime join-strategy pick."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("__raw"),
            _r(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .filter(F.col("__raw") > 250)
        .select("l_orderkey", "total_qty")
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            _r(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "q51_dormant_rich_customers",
    oracle="""
    WITH cents AS (
      SELECT c_custkey, c_acctbal,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    ), tot AS (
      SELECT CAST(sum(bal_cents) AS BIGINT) AS total_cents,
             CAST(count(*) AS BIGINT) AS n
      FROM cents WHERE bal_cents > 0
    ), eligible AS (
      SELECT c.c_custkey, c.c_acctbal, c.c_custkey % 7 AS code
      FROM cents c, tot
      WHERE c.bal_cents * tot.n > tot.total_cents
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    )
    SELECT code, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal) + 1e-9, 2) AS totacctbal
    FROM eligible GROUP BY code
    """,
)
def q51_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    order (every synthetic customer has some order, so dormancy since
    2001 stands in for Q22's never-ordered), bucketed by a derived
    code — scalar-average subquery + anti join + grouped rollup.

    The above-average comparison runs in exact integer cents
    (bal_cents * n > total_cents): a float mean's last-ulp wobble
    between engines cannot flip a boundary customer.

    Scale shape: the average is a broadcast one-row aggregate; the
    anti join shuffles on the well-spread customer key; the rollup
    domain is 7 codes."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cents = customer.select(
        "c_custkey",
        "c_acctbal",
        F.round(F.col("c_acctbal") * 100)
        .cast("long")
        .alias("bal_cents"),
    )
    tot = cents.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").cast("long").alias("total_cents"),
        F.count("*").cast("long").alias("n"),
    )
    recent = orders.filter(
        F.col("o_orderdate") >= "2001-01-01"
    ).select("o_custkey")
    eligible = (
        cents.crossJoin(F.broadcast(tot))
        .filter(F.col("bal_cents") * F.col("n") > F.col("total_cents"))
        .join(
            recent, cents["c_custkey"] == recent["o_custkey"], "left_anti"
        )
        .select(
            "c_acctbal", (F.col("c_custkey") % 7).alias("code")
        )
    )
    return eligible.groupBy("code").agg(
        F.count("*").cast("long").alias("numcust"),
        _r(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


@query(
    "q52_region_pair_volume",
    oracle="""
    SELECT supp_region, cust_region, yr,
           round(sum(volume) + 1e-9, 2) AS revenue
    FROM (
      SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
             CAST(year(l.l_shipdate) AS INT) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN region r1 ON r1.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
         OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
    ) shipping
    GROUP BY supp_region, cust_region, yr
    """,
)
def q52_region_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape lifted to REGION pairs (25 nations over the
    small synthetic population make any single nation pair empty —
    regions keep the bilateral-volume semantics with a real result
    set): shipping volume between ASIA and EUROPE by direction and
    year, through the seven-way join chain whose whole point is join
    REORDERING — the region filters must reach the supplier/customer
    dimension scans so the fact table joins pre-filtered sides.

    Scale shape: both dimension stacks (supplier+nation+region,
    customer+nation+region) broadcast after their pushed filters;
    lineitem and orders shuffle once on the order key; year
    extraction is map-only."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    def side(name: str, key_out: str):
        n = nation.select(
            F.col("n_nationkey").alias(f"{name}_nk"),
            F.col("n_regionkey").alias(f"{name}_rk"),
        )
        r = region.select(
            F.col("r_regionkey").alias(f"{name}_rrk"),
            F.col("r_name").alias(key_out),
        )
        return n.join(
            F.broadcast(r), F.col(f"{name}_rk") == F.col(f"{name}_rrk")
        ).filter(F.col(key_out).isin("ASIA", "EUROPE"))

    supp_side = supplier.join(
        F.broadcast(side("s", "supp_region")),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    cust_side = customer.join(
        F.broadcast(side("c", "cust_region")),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    joined = (
        li.join(
            F.broadcast(supp_side), li["l_suppkey"] == F.col("s_suppkey")
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(cust_side),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .filter(
            (
                (F.col("supp_region") == "ASIA")
                & (F.col("cust_region") == "EUROPE")
            )
            | (
                (F.col("supp_region") == "EUROPE")
                & (F.col("cust_region") == "ASIA")
            )
        )
        .select(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").cast("int").alias("yr"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume"),
        )
    )
    return joined.groupBy("supp_region", "cust_region", "yr").agg(
        _r(F.sum("volume"), 2).alias("revenue")
    )


@query(
    "q53_resample_ffill_capped",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS t0,
             date_trunc('hour', max(ts)) AS t1raw
      FROM events GROUP BY user_id
    ), capped AS (
      SELECT user_id, t0,
             least(t1raw, t0 + INTERVAL 167 HOUR) AS t1,
             t1raw > t0 + INTERVAL 167 HOUR AS grid_truncated
      FROM bounds
    ), grid AS (
      SELECT user_id, grid_truncated,
             unnest(generate_series(t0, t1, INTERVAL 1 HOUR))::TIMESTAMP AS bucket
      FROM capped
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS bucket,
             count(*) AS n, round(sum(value) + 1e-9, 2) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id, g.grid_truncated, g.bucket,
           coalesce(h.n, 0) AS n_events,
           h.sum_value,
           last_value(h.sum_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_ffill
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def q53_resample_ffill_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q40's resample with the SPAN-AXIS loud cap engaged (VERDICT r10
    item 3, oracle-verified form): each key's hourly grid is clamped
    to its first 168 hours and flagged ``grid_truncated`` — the
    production setting for corpora whose time span grows with the
    archive (SPAN_PROBE.json measures that axis: 10x span = 10x grid
    at ZERO new input rows; the cap returns cost to the bounded-grid
    magnitude while keeping truncation explicit, never silent).  The
    oracle replays the clamp exactly (least + interval arithmetic is
    engine-portable)."""
    from ..operators.timeseries import resample_ffill

    events = load_table(spark, sf_dir, "events")
    return resample_ffill(events, max_grid_hours=168)


@query(
    "q54_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS order_key,
           CAST(o.o_orderdate AS DATE)::VARCHAR AS order_date,
           o.o_orderpriority AS order_priority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, order_date, order_key
    LIMIT 10
    """,
)
def q54_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped-revenue top-10 for
    one market segment — segment filter pushed into the broadcast
    customer dimension, date filters pushed to both fact scans, ONE
    shuffle on the (orderkey, date, priority) group, and the top-10 is
    TakeOrderedAndProject (per-partition top-k + tiny driver merge —
    never a global sort).  Ties broken deterministically by
    (order_date, order_key) so the LIMIT edge is engine-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cutoff = F.lit("1999-01-01").cast("timestamp")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(building), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            _r(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "order_date", "order_key")
        .limit(10)
    )


@query(
    "q55_returned_item_ranking",
    oracle="""
    SELECT c.c_custkey AS cust_key, c.c_name AS cust_name,
           n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue,
           c.c_acctbal AS acct_bal
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1999-07-01'
      AND o.o_orderdate < TIMESTAMP '2000-01-01'
    GROUP BY 1, 2, 3, 5
    ORDER BY revenue DESC, cust_key
    LIMIT 20
    """,
)
def q55_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item customer ranking): revenue lost
    to returns in one half-year, per customer, top 20.  The returnflag
    and date filters are pushed to the two fact scans; customer and
    nation broadcast (dimension-sized); one shuffle on the customer
    group; TakeOrderedAndProject for the ranking with a custkey
    tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1999-07-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
            ),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").alias("acct_bal"),
        )
        .agg(
            _r(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("cust_key", "cust_name", "nation", "revenue", "acct_bal")
        .orderBy(F.desc("revenue"), "cust_key")
        .limit(20)
    )


@query(
    "q56_order_priority_pipeline",
    oracle="""
    SELECT o.o_orderpriority AS order_priority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '2000-01-01'
      AND o.o_orderdate < TIMESTAMP '2000-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 30
      )
    GROUP BY 1
    ORDER BY 1
    """,
)
def q56_order_priority_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in one
    half-year with at least one LATE lineitem (shipped >30 days after
    the order date), counted per priority class — the classic
    EXISTS-with-correlated-predicate that Catalyst turns into a left
    SEMI join carrying the non-equi date condition.  Both date filters
    push to the orders scan; the semi join's build side is the
    filtered orders slice (AQE broadcasts it when small, shuffles
    both sides on orderkey when not — no forced hint, the sides scale
    with data)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01").cast("timestamp"))
    )
    late = (
        li["l_orderkey"] == o["o_orderkey"]
    ) & (
        F.col("l_shipdate").cast("date")
        > F.date_add(F.col("o_orderdate").cast("date"), 30)
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("order_priority")
    )


@query(
    "q57_promo_revenue_share",
    oracle="""
    SELECT round(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END) + 1e-9, 2) AS promo_revenue,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS total_revenue,
           round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 4)
             AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1999-01-01'
      AND l.l_shipdate < TIMESTAMP '2000-01-01'
    """,
)
def q57_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one year's
    revenue carried by PROMO-typed parts — a conditional aggregate
    over the fact-to-dimension join.  The date filter pushes to the
    lineitem scan, part broadcasts (dimension-sized), and both sums
    come out of ONE pass (the CASE rides the same aggregate) — the
    fact table is never scanned or shuffled twice."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _r(F.sum(promo), 2).alias("promo_revenue"),
            _r(F.sum(rev), 2).alias("total_revenue"),
            _r(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_share_pct"
            ),
        )
    )


@query(
    "q58_disjunctive_brackets",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q58_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive brackets): an
    OR-of-ANDs predicate spanning BOTH sides of the join — the shape
    that defeats naive pushdown.  Catalyst extracts the common
    single-side conjuncts: the brand/size disjunction prunes the
    broadcast part build side and the quantity-band disjunction
    (1-11 OR 10-20 OR 20-30 -> quantity between 1 and 30) prunes the
    lineitem scan, while the full cross-side disjunction evaluates on
    the joined rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            F.count("*").cast("long").alias("n_items"),
            _r(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "q59_market_share",
    oracle="""
    WITH sn AS (
      SELECT s.s_suppkey, n.n_name AS supp_nation
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    ), cr AS (
      SELECT c.c_custkey
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           round(sum(CASE WHEN sn.supp_nation = 'NATION_7'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END) + 1e-9, 2) AS nation_revenue,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2)
             AS market_revenue,
           round(sum(CASE WHEN sn.supp_nation = 'NATION_7'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 4)
             AS market_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN cr ON o.o_custkey = cr.c_custkey
    JOIN sn ON l.l_suppkey = sn.s_suppkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def q59_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's (NATION_7) share of
    the revenue that ASIA-region customers spend, per year — the
    share-of-group ratio over a TWO-SIDED dimension join (supplier
    nation labels the numerator, customer region filters the market).
    Both dimension stacks broadcast after their pushed filters; the
    numerator CASE and the denominator come out of ONE grouped pass
    over the joined fact — never two scans, never two shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    sn = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cr = (
        customer.join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cn_nk"),
                    F.col("n_regionkey").alias("cn_rk"),
                )
            ),
            F.col("c_nationkey") == F.col("cn_nk"),
        )
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == "ASIA").select(
                    F.col("r_regionkey").alias("cr_rk")
                )
            ),
            F.col("cn_rk") == F.col("cr_rk"),
        )
        .select("c_custkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cr), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            _r(F.sum(nat), 2).alias("nation_revenue"),
            _r(F.sum(rev), 2).alias("market_revenue"),
            _r(F.sum(nat) / F.sum(rev), 4).alias("market_share"),
        )
        .orderBy("order_year")
    )


# ------------------------------------------- correlated-subquery shapes
# (VERDICT r11 item 2): q34/q47 carry the Q17/Q21 SEMANTICS in their
# hand-decorrelated production forms; these three hand Catalyst the
# raw CORRELATED SQL instead, so the plan audit exercises the
# optimizer's decorrelation itself — a correlated scalar aggregate
# must compile to aggregate-then-join, nested IN over an aggregated
# subquery to a semi-join chain, and an EXISTS/NOT-EXISTS pair to a
# semi + anti join, never a per-row re-scan of the fact table.


@query(
    "q60_correlated_scalar_avg",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small_orders
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'blue%'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q60_correlated_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) in its RAW correlated
    form: each lineitem of the filtered parts compared against a
    scalar subquery re-aggregating the fact table per outer part.
    Unlike q34 (the same semantics pre-decorrelated by hand), this
    hands Catalyst the correlated SQL — the optimizer must rewrite
    the scalar subquery to ONE per-partkey average aggregate joined
    back on the correlation key.  Executed naively (one fact re-scan
    per probe row) this is O(|lineitem|^2); decorrelated it is two
    scans and one join — the single most important rewrite for
    correlated analytics at 100 TB.  Reference: the reference engine
    has no subqueries at all (SURVEY §2.3); this is contract surface
    beyond it."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT round(sum(l.l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_small_orders
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'blue%'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
        """
    )


@query(
    "q61_nested_semi_aggregate",
    oracle="""
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'blue%')
          AND l.l_shipdate >= TIMESTAMP '1999-01-01'
          AND l.l_shipdate < TIMESTAMP '2000-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 55
    )
    ORDER BY s.s_name
    """,
)
def q61_nested_semi_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential-part-promotion, adapted to the
    available columns — the corpus has no partsupp table): suppliers
    who moved more than a threshold quantity of one part family in
    one year.  The outer IN is a semi-join whose build side is an
    AGGREGATED subquery (per supplier x part HAVING), and that
    subquery itself contains a nested IN (the part-name screen) —
    the two-level semi-join nesting Q20 exists to exercise.  Catalyst
    must push the nested IN into the fact scan side as a semi-join
    BEFORE the aggregate (filter-then-aggregate, part side
    broadcast), then semi-join supplier against the tiny HAVING
    survivor set — the fact table is scanned exactly once."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT s.s_name, n.n_name AS nation
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'blue%')
              AND l.l_shipdate >= TIMESTAMP '1999-01-01'
              AND l.l_shipdate < TIMESTAMP '2000-01-01'
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING sum(l.l_quantity) > 55
        )
        ORDER BY s.s_name
        """
    )


@query(
    "q62_correlated_exists_pair",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q62_correlated_exists_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) in its RAW
    correlated EXISTS + NOT EXISTS form — the hardest decorrelation
    pattern in the suite: one probe with TWO correlated subqueries of
    opposite polarity, each carrying a non-equi conjunct (suppkey <>)
    alongside the equi correlation (orderkey =).  Catalyst must lower
    them to a left-SEMI and a left-ANTI join on the order key.  Unlike
    q47 (same semantics, hand-lowered over ONE persisted (orderkey,
    suppkey, late) frame — the production form at scale, since SQL
    CTE inlining re-derives the frame per reference), this exercises
    the optimizer path; counting is per late LINEITEM (stock Q21),
    where q47 counts distinct (order, supplier) pairs — the two are
    deliberately non-identical."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        WITH li AS (
          SELECT l.l_orderkey, l.l_suppkey,
                 l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM li l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """
    )


@query(
    "q63_scalar_equality_correlation",
    oracle="""
    SELECT DISTINCT p.p_partkey AS part_key, p.p_name AS part_name,
           s.s_name AS supp_name, s.s_acctbal AS acct_bal
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 3
      AND s.s_acctbal = (SELECT max(s2.s_acctbal)
                         FROM lineitem l2
                         JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
                         WHERE l2.l_partkey = p.p_partkey)
    ORDER BY acct_bal DESC, part_key, supp_name
    LIMIT 100
    """,
)
def q63_scalar_equality_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier, adapted — the corpus has
    no partsupp, so best-balance supplier per shipped part): the
    fourth and last classic decorrelation variant the q-series lacked
    — a correlated scalar aggregate used as an EQUALITY predicate
    (q60's is an inequality).  The rewrite is subtly different:
    equality-on-aggregate decorrelates to aggregate-then-join where
    the aggregate value joins back as a SECOND equi-key alongside the
    correlation key, so the probe is a pure hash join on (partkey,
    acctbal) — the plan shape that makes per-group argmax-by-subquery
    free at 100 TB.  Ties (two suppliers at the part's max balance)
    both survive, exactly as stock Q2; the top-100 rides
    TakeOrderedAndProject under a total deterministic order.
    Per-row acctbal values are stored data (bit-identical across
    engines) so the oracle needs no rounding."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT DISTINCT p.p_partkey AS part_key, p.p_name AS part_name,
               s.s_name AS supp_name, s.s_acctbal AS acct_bal
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_size <= 3
          AND s.s_acctbal = (SELECT max(s2.s_acctbal)
                             FROM lineitem l2
                             JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
                             WHERE l2.l_partkey = p.p_partkey)
        ORDER BY acct_bal DESC, part_key, supp_name
        LIMIT 100
        """
    )
