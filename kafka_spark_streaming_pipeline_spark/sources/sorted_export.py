"""Globally-sorted export: range-sharded, sorted-within-shard layout.

Downstream consumers of a 100 TB table often need a global order —
merge-joining against an external system, binary-searchable shards,
time-ordered training replay.  A naive ``orderBy().write`` plans a
global sort whose final assembly is still per-partition, but gives no
queryable artifact of WHERE each range lives.  This writer makes the
range structure explicit and cheap to exploit:

- ``repartitionByRange(n, key)`` samples the key distribution and
  assigns contiguous, DISJOINT key ranges to shards (no single-task
  funnel — the sort is n_shards parallel sorts);
- ``sortWithinPartitions`` makes each shard internally ordered, so
  shard files concatenated in shard order ARE the global order;
- a tiny manifest (shard -> min/max key, row count) is computed from
  the SAME write pass's data and persisted next to the shards, so a
  range probe binary-searches the manifest (driver-side, n_shards
  rows) and reads only the shards whose [min, max] intersect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_sorted(
    df: DataFrame,
    dest: str,
    key_col: str,
    n_shards: int = 32,
) -> None:
    """Write ``df`` as ``n_shards`` range-disjoint shards, each sorted
    on ``key_col``, plus a shard manifest at ``{dest}/_manifest``.

    The manifest is computed by reading BACK the written files (key
    column only — a narrow pruned scan), never by re-executing the
    input plan: repartitionByRange samples the key distribution, so a
    re-execution of a non-deterministic input could assign rows to
    different shards than the files actually written, and the manifest
    would prune wrongly.  Reading what was written is the only source
    of truth (and avoids paying the range shuffle twice)."""
    sharded = (
        df.repartitionByRange(n_shards, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("shard", F.spark_partition_id())
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(f"{dest}/data")
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(f"{dest}/data")
        .groupBy("shard")
        .agg(
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
            F.count("*").alias("n_rows"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{dest}/_manifest")


def read_sorted_range(
    spark: SparkSession,
    dest: str,
    key_col: str,
    lo,
    hi,
) -> DataFrame:
    """Rows with ``lo <= key <= hi`` from a write_sorted() layout,
    touching only the shards whose manifest range intersects [lo, hi]
    — the manifest is n_shards rows, so the probe is a driver-side
    binary search in all but name; the shard IN-list prunes partition
    directories and the residual key filter pushes into those files'
    scans (which are sorted, so row-group min/max skip within the
    shard too)."""
    manifest = spark.read.parquet(f"{dest}/_manifest")
    shards = sorted(
        r["shard"]
        for r in manifest.filter(
            (F.col("key_min") <= hi) & (F.col("key_max") >= lo)
        ).collect()
    )
    return (
        spark.read.parquet(f"{dest}/data")
        .filter(F.col("shard").isin(shards))
        .filter((F.col(key_col) >= lo) & (F.col(key_col) <= hi))
        .drop("shard")
    )
