#!/usr/bin/env python3
"""Deterministic ~10x amplification of a testdata SF directory — the
second measured decade for the scale-slope record (VERDICT r8 item 1).

Replication semantics (each replica k = 0..9 is a SELF-CONTAINED copy
of the database, so join fan-outs stay 1:1 and dedup/query semantics
stay honest — no cross-replica artifacts):

- Fact/entity tables (customer, supplier, part, orders, lineitem,
  events, documents, embeddings) are replicated with RE-KEYED ids:
  id' = id + k * stride (stride = max id + 1, per key domain), with
  every foreign key shifted by ITS domain's stride so each replica's
  orders reference exactly that replica's customers, etc.
- region/nation are copied once (dimension tables don't scale with
  data volume — the TPC-H convention; nation/region FKs are left
  unshifted so all replicas share them, keeping dim-keyed group
  cardinalities fixed while fact rows grow 10x: the realistic shape).
- documents.text: replica k > 0 suffixes EVERY token with ``_rk{k}``.
  Token-level bijection => intra-replica shingle/token structure
  (duplicate clusters, n-gram stats, quality signals) is preserved
  exactly, while cross-replica token/shingle overlap is ZERO — so
  dedup workloads grow linearly instead of quadratically colliding on
  10 identical copies.  n_chars is recomputed (the generator invariant
  n_chars = length(text) holds on all rows).
- embeddings.embedding: replica k > 0 applies a k-dependent
  dimension ROTATION + per-dimension SIGN FLIPS (v'_j = s_{k,j} *
  v_{(j + 7k) % d}).  Both are orthogonal maps applied uniformly
  within the replica, so intra-replica dot products and norms are
  preserved up to float summation order (the permutation reorders
  the additions, so values can differ at the ulp level — the
  amplifier test allows 1e-6 relative noise; replicas feed timing
  records, not value-parity checks) and the pair structure for
  ANN/semantic workloads carries over, while cross-replica cosines
  decorrelate.
- Timestamps are left unchanged: 10x rows per time window is exactly
  what 10x traffic looks like; windowed/grid aggregates keep their
  group counts and grow linearly in input, the honest scaling.

No RNG anywhere — byte-identical output on re-run.

Usage: python3 tools/make_scale_data.py [src_sf_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 -> <repo>/.scaledata/sf1.0, factor 10.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kafka_spark_streaming_pipeline_spark.catalog import load_table  # noqa: E402
from kafka_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402

# key domain -> (table, column) members; every column in one domain
# shifts by the SAME stride so references stay aligned per replica
KEY_DOMAINS = {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "order": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id"), ("embeddings", "vec_id")],
}
FACT_TABLES = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
DIM_TABLES = ["region", "nation"]


def _strides(spark, src: str) -> dict[str, int]:
    out = {}
    for domain, members in KEY_DOMAINS.items():
        hi = 0
        for table, col in members:
            v = load_table(spark, src, table).agg(F.max(col)).first()[0]
            hi = max(hi, int(v))
        out[domain] = hi + 1
    return out


def _replica(df: DataFrame, table: str, k: int, strides: dict[str, int]) -> DataFrame:
    for domain, members in KEY_DOMAINS.items():
        for t, col in members:
            if t == table:
                df = df.withColumn(
                    col, (F.col(col) + F.lit(k * strides[domain])).cast("long")
                )
    if table == "documents" and k > 0:
        df = df.withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1_rk{k}")
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings" and k > 0:
        rot = (7 * k) % 64  # dim is 64; pmod(size) below keeps it general
        df = df.withColumn(
            "embedding",
            F.expr(
                f"transform(sequence(0, size(embedding) - 1), j -> "
                f"CAST((CASE WHEN pmod(j * 31 + {k} * 17, 3) = 0 "
                f"THEN -1.0 ELSE 1.0 END) * "
                f"element_at(embedding, pmod(j + {rot}, size(embedding)) + 1) "
                f"AS FLOAT))"
            ),
        )
    return df


def amplify(spark, src: str, dst: str, factor: int = 10) -> None:
    strides = _strides(spark, src)
    os.makedirs(dst, exist_ok=True)
    for table in DIM_TABLES:
        load_table(spark, src, table).write.mode("overwrite").parquet(
            os.path.join(dst, f"{table}.parquet")
        )
    for table in FACT_TABLES:
        base = load_table(spark, src, table)
        out = _replica(base, table, 0, strides)
        for k in range(1, factor):
            out = out.unionByName(_replica(base, table, k, strides))
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: x{factor} written", file=sys.stderr)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".scaledata", "sf1.0")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="make_scale_data")
    amplify(spark, src, dst, factor)
    for t in DIM_TABLES + FACT_TABLES:
        n = spark.read.parquet(os.path.join(dst, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
