"""Bucketed tables: co-located joins without a shuffle (SURVEY.md §4.3).

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides.  Writing the tables bucketed (and optionally sorted) on the
join key lets Spark's scan report the required hash partitioning, so
SortMergeJoin consumes both sides in place — zero Exchange operators.
The bucket count is a physical-design decision: pick it once per
table, matched across tables that join (Spark co-locates only equal
bucket counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted-within-bucket) managed
    parquet table.  Sorting by the join/filter key makes the merge side
    of SortMergeJoin a pure streaming pass (no per-task sort)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan — the
    quantity bucketing exists to drive to zero (used by tests and the
    plan audits; AQE's final plan is what users actually pay for)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def bucketed_join(spark: SparkSession, left: str, right: str, on: list[str]) -> DataFrame:
    """Join two bucketed tables on their bucket key.  With matching
    bucket counts the plan contains no Exchange: each task merges
    bucket i of both tables locally."""
    return spark.table(left).join(spark.table(right), on)
