"""Join shapes Spark lacks natively (SURVEY.md §2.3).

``asof_join`` — each left row picks the latest right row at-or-before
its timestamp — via the union + last(ignoreNulls) ordered-window idiom:
both sides are unioned into one keyed, time-ordered stream and the
right side's payload forward-fills.  Cost is ONE shuffle on the key
(the window), versus the naive range-join which explodes to
|left| x |right-per-key| intermediate rows before taking max_by.
pandas merge_asof semantics, distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the most recent
    ``right`` row for its key with ``right_ts <= left_ts`` (ties: the
    right row counts as at-or-before).  ``right_cols`` default to all
    non-key, non-ts columns of ``right`` and arrive suffixed.  With
    ``tolerance_ms``, matches older than the tolerance become nulls.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    payload = [f"{c}{suffix}" for c in right_cols]

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in set(on) | {left_ts}],
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(p)
          for c, p in zip(right_cols, payload)],
    ).withColumn("__lts", F.col("__ts"))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in set(on) | {left_ts}],
        F.col(right_ts).cast("timestamp").alias("__rts"),
        *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
    ).withColumn("__lts", F.lit(None).cast(l_tagged.schema["__lts"].dataType))

    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal timestamps (= at-or-before)
    w = (
        W.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("__rts", ignorenulls=True).over(w).alias("__matched_ts"),
        *[F.last(p, ignorenulls=True).over(w).alias(f"__f_{p}") for p in payload],
    ).filter(F.col("__side") == 1)

    in_tolerance = (
        F.lit(True)
        if tolerance_ms is None
        else (
            F.unix_millis(F.col("__lts")) - F.unix_millis(F.col("__matched_ts"))
            <= F.lit(tolerance_ms)
        )
    )
    out = filled
    for p in payload:
        out = out.withColumn(
            p, F.when(in_tolerance, F.col(f"__f_{p}")).otherwise(F.lit(None))
        )
    out = out.withColumn(
        f"matched_ts{suffix}",
        F.when(in_tolerance, F.col("__matched_ts")).otherwise(F.lit(None)),
    )
    keep = [c for c in left.columns if c != left_ts]
    return out.select(
        *keep, F.col("__lts").alias(left_ts), *payload, f"matched_ts{suffix}"
    )
