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
