"""Mergeable sketch aggregations (Apache DataSketches via Spark 4
built-ins).

`approx_count_distinct` (used in streaming metrics) gives one number;
HLL *sketches* give a mergeable state: pre-aggregate distinct-user
sketches per (day, key) once, then answer any rollup (weekly, monthly,
all keys) by unioning sketches — no rescan of the raw data.  That is
the 100 TB pattern: the expensive pass over raw events happens once,
rollups are cheap sketch merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_by(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch of ``col`` plus its estimate.  The ``sketch``
    binary column is the mergeable state — persist it as the
    pre-aggregate."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_rows"),
    ).withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))


def hll_rollup(pre: DataFrame, keys: list[str]) -> DataFrame:
    """Roll pre-aggregated sketches up to coarser ``keys`` by sketch
    union — never touches the raw table."""
    return (
        pre.groupBy(*keys)
        .agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )


# --------------------------------------------------- count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_slot(term, depth: int, width: int = CMS_WIDTH):
    """Deterministic slot for a term in depth row ``depth`` — the
    md5-based portable hash (operators/text.hash60) so the sketch is
    bit-identical in the SQL oracle."""
    from .text import hash60

    return hash60(term, salt=f"cms{depth}|") % width


def cms_build(
    df: DataFrame, term_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of a term column: (depth, slot, cnt) rows —
    depth*width counters TOTAL regardless of input size, built by one
    explode (term -> depth rows) + one map-side-combinable count.

    Like the HLL pre-aggregates above, the sketch is MERGEABLE: counter
    matrices from per-day / per-shard passes add cell-wise, so the raw
    scan happens once and any frequency question afterwards reads
    depth*width rows.  Estimates are biased up only (collisions add),
    never down."""
    slots = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        cms_slot(F.col(term_col), d, width).alias("slot"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("ds")
    ).select("ds.depth", "ds.slot")
    return slots.groupBy("depth", "slot").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each term's frequency from the sketch: min over
    the depth rows of the term's counter.  The sketch is depth*width
    rows — always broadcast; the term side never shuffles."""
    probes = terms.select(
        term_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        cms_slot(F.col(term_col), d, width).alias("slot"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("ds"),
    ).select(term_col, "ds.depth", "ds.slot")
    return (
        probes.join(F.broadcast(sketch), ["depth", "slot"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_estimate"))
    )
