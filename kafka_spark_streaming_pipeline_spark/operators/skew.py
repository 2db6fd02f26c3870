"""Skew-mitigation rewrites (SURVEY.md §4.3: "salt keys if one stream
dominates"; the reference never shuffles so it has no skew story).

AQE's runtime skew-join splitting handles most cases; these are the
explicit forms for when the skew is known ahead of time or the
operation isn't a join AQE can split:

- ``skew_join``: salt the (large, skewed) left side into ``buckets``
  sub-keys and replicate the right side per bucket, so one hot key
  spreads over ``buckets`` tasks instead of one straggler.
- ``two_phase_topk``: per-(key, salt) partial top-k, then final top-k
  over the k*buckets survivors — the heavy key never materializes its
  full row set in a single task's sort.
- ``two_stage_distinct_count``: exact COUNT(DISTINCT) as two partial-
  aggregate shuffles, avoiding the single-point expand of a hot group.

All three are equivalence-preserving: tests assert equality against
the naive plan, and q32 oracle-checks two_phase_topk end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _salt(buckets: int, *cols: Column) -> Column:
    """Deterministic salt in [0, buckets): hash of the row's
    distinguishing columns (NOT rand() — retries and replays must land
    rows in the same bucket)."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets))


def skew_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    buckets: int = 16,
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``left`` is large with skewed join keys and
    ``right`` is too big to broadcast but small enough to replicate
    ``buckets``×.  Left rows get a deterministic salt from their
    non-key columns; right rows are exploded once per bucket; the join
    key becomes (on + salt), spreading each hot key over ``buckets``
    tasks.  Column set of the result matches ``left.join(right, on)``.
    """
    salt_cols = [F.col(c) for c in (salt_by or left.columns)]
    salted_left = left.withColumn("__salt", _salt(buckets, *salt_cols))
    replicated_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(b) for b in range(buckets)]))
    )
    return salted_left.join(replicated_right, on + ["__salt"]).drop("__salt")


def two_phase_topk(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    buckets: int = 16,
    tiebreak: str | None = None,
) -> DataFrame:
    """Top-k rows per key without sorting any key's full row set in one
    task: phase 1 ranks within (key, salt) and keeps k per bucket;
    phase 2 ranks the ≤ k*buckets survivors per key.  Output adds a
    ``rank`` column (1..k, deterministic when ``tiebreak`` is given).
    """
    order = [F.desc(order_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    salted = df.withColumn("__salt", _salt(buckets, *[F.col(c) for c in df.columns]))
    w1 = W.partitionBy(*keys, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    w2 = W.partitionBy(*keys).orderBy(*order)
    return survivors.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)


def two_stage_distinct_count(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col) as dedup-then-count: the first
    shuffle is on (keys, col) — high cardinality, well spread — and the
    second on keys sees one row per distinct value, so a hot key costs
    O(distinct values), not O(rows)."""
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(col).alias(f"n_distinct_{col}"))
    )
