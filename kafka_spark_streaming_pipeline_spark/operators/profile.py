"""Dataset profiling: per-column stats in ONE pass over the table.

The first thing a training-data pipeline does to a new source is
profile it (null rates, cardinalities, ranges).  This computes every
column's stats in a single aggregate — one scan, one reduce — then
unpivots the one-row result into (col_name, ...) rows with an array
explode, so profiling a 100 TB table costs exactly one pass.

Numeric mins/maxes surface as doubles; timestamps as epoch millis
(cast through the UTC session zone); strings contribute counts only —
cross-engine string formatting of doubles/timestamps is deliberately
avoided so the profile is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per profiled column: n_rows, n_non_null, n_distinct,
    min_num, max_num (doubles; epoch ms for timestamps; null for
    strings/complex)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        if isinstance(dt, NumericType):
            mn = F.min(c).cast("double")
            mx = F.max(c).cast("double")
        elif isinstance(dt, (TimestampType, TimestampNTZType)):
            mn = F.unix_millis(F.min(c).cast("timestamp")).cast("double")
            mx = F.unix_millis(F.max(c).cast("timestamp")).cast("double")
        else:
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
        aggs.append(mn.alias(f"{c}__mn"))
        aggs.append(mx.alias(f"{c}__mx"))
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_non_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_num"),
                F.col(f"{c}__mx").alias("max_num"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE pass:
    all k(k-1)/2 co-moment aggregates run in a single map-side-
    combinable aggregation over one scan (never k² scans or a driver
    loop) and unpivot to (col_a, col_b, corr) rows — the feature-
    redundancy screen of dataset profiling."""
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least 2 columns")
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.corr(a, b).alias(f"{a}|{b}"))
            pairs.append((a, b))
    wide = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(F.col(f"`{a}|{b}`") + F.lit(1e-9), 4).alias("corr"),
                )
                for a, b in pairs
            ]
        )
    ).alias("p")
    return wide.select(stacked).select("p.col_a", "p.col_b", "p.corr")
