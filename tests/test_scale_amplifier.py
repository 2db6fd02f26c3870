"""Invariants of the deterministic scale amplifier
(tools/make_scale_data.py) — the honesty conditions under which the
three-point BENCH_SCALE record actually measures a 10x-data workload
rather than an artifact:

1. every fact table grows exactly by the factor; dims are copied once;
2. each replica is a SELF-CONTAINED copy: FK joins fan out 1:1 per
   replica (join cardinality scales by the factor, never factor^2);
3. documents: intra-replica text structure is token-bijected (exact
   duplicate clusters replicate 1:1) while CROSS-replica overlap is
   zero (no artificial near-dup collisions), and n_chars stays
   consistent with the rewritten text;
4. embeddings: the per-replica transform is orthogonal — intra-replica
   dot products and norms are preserved EXACTLY (same pair structure
   for ANN/semantic workloads);
5. byte-determinism: re-running the amplifier reproduces identical
   row multisets.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_spark_streaming_pipeline_spark.catalog import load_table  # noqa: E402

SRC = "/root/testdata/sf0.001"
FACTOR = 3


@pytest.fixture(scope="module")
def amp_dir(spark, tmp_path_factory):
    from tools.make_scale_data import amplify

    dst = str(tmp_path_factory.mktemp("amp") / "sf_amp")
    amplify(spark, SRC, dst, FACTOR)
    return dst


def test_fact_tables_scale_exactly_dims_copied_once(spark, amp_dir):
    from tools.make_scale_data import DIM_TABLES, FACT_TABLES

    for t in FACT_TABLES:
        n0 = load_table(spark, SRC, t).count()
        assert load_table(spark, amp_dir, t).count() == FACTOR * n0, t
    for t in DIM_TABLES:
        n0 = load_table(spark, SRC, t).count()
        assert load_table(spark, amp_dir, t).count() == n0, t


def test_fk_joins_fan_out_linearly_not_quadratically(spark, amp_dir):
    # orders x customer: each replica's orders reference exactly that
    # replica's customers, so the join grows by FACTOR (a broken
    # re-keying would either drop matches or cross-multiply)
    def join_count(d):
        o = load_table(spark, d, "orders")
        c = load_table(spark, d, "customer")
        return o.join(c, o.o_custkey == c.c_custkey).count()

    assert join_count(amp_dir) == FACTOR * join_count(SRC)

    def li_count(d):
        li = load_table(spark, d, "lineitem")
        o = load_table(spark, d, "orders")
        return li.join(o, li.l_orderkey == o.o_orderkey).count()

    assert li_count(amp_dir) == FACTOR * li_count(SRC)


def test_documents_replicate_dup_structure_without_cross_replica_overlap(
    spark, amp_dir
):
    from pyspark.sql import functions as F

    src = load_table(spark, SRC, "documents")
    amp = load_table(spark, amp_dir, "documents")
    # exact-dup structure: per-fingerprint histogram replicates 1:1
    def dup_hist(df):
        sizes = (
            df.groupBy(F.md5("text").alias("fp"))
            .count()
            .groupBy("count")
            .agg(F.count("*").alias("n_groups"))
        )
        return {r["count"]: r["n_groups"] for r in sizes.collect()}

    h0, h1 = dup_hist(src), dup_hist(amp)
    assert h1 == {k: FACTOR * v for k, v in h0.items()}
    # zero cross-replica token overlap: distinct tokens partition by
    # replica, so the amplified distinct-token count is exactly
    # FACTOR x the original
    def n_tokens(df):
        return (
            df.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
            .select("w")
            .distinct()
            .count()
        )

    assert n_tokens(amp) == FACTOR * n_tokens(src)
    # generator invariant survives the rewrite
    assert amp.filter(F.length("text") != F.col("n_chars")).count() == 0


def test_embeddings_transform_is_orthogonal_per_replica(spark, amp_dir):
    from pyspark.sql import functions as F

    src = load_table(spark, SRC, "embeddings")
    amp = load_table(spark, amp_dir, "embeddings")
    stride = src.agg(F.max("vec_id")).first()[0] + 1
    dot = F.aggregate(
        F.zip_with("a", "b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def pair_dots(df, shift):
        a = df.filter((F.col("vec_id") >= shift) & (F.col("vec_id") < shift + 40)).select(
            (F.col("vec_id") - shift).alias("i"),
            F.col("embedding").cast("array<double>").alias("a"),
        )
        b = df.filter((F.col("vec_id") >= shift) & (F.col("vec_id") < shift + 40)).select(
            (F.col("vec_id") - shift).alias("j"),
            F.col("embedding").cast("array<double>").alias("b"),
        )
        rows = (
            a.join(b, a.i < b.j)
            .select("i", "j", dot.alias("d"))
            .collect()
        )
        return {(r["i"], r["j"]): r["d"] for r in rows}

    base = pair_dots(src, 0)
    for k in range(1, FACTOR):
        rep = pair_dots(amp, k * stride)
        assert rep.keys() == base.keys()
        for key in base:
            # orthogonal map: bit-exact dot preservation up to float
            # summation order (the permuted sum) — allow only ulp noise
            assert abs(rep[key] - base[key]) <= 1e-6 * max(1.0, abs(base[key]))


def test_amplifier_is_deterministic(spark, tmp_path):
    from pyspark.sql import functions as F

    from tools.make_scale_data import amplify

    d1 = str(tmp_path / "a1")
    amplify(spark, SRC, d1, 2)
    # documents checksum vs a second run
    def checksum(d):
        df = load_table(spark, d, "documents")
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", "doc_id", "text")), 1, 15), 16, 10
        ).cast("long")
        # xor fold: order-independent and overflow-free
        return df.select(h.alias("h")).agg(F.expr("bit_xor(h)")).first()[0]

    c1 = checksum(d1)
    d2 = str(tmp_path / "a2")
    amplify(spark, SRC, d2, 2)
    assert checksum(d2) == c1
