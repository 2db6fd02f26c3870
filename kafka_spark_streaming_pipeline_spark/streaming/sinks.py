"""Idempotent keyed sinks (SURVEY.md §2.1 S5-S9, §4.1 exactly-once).

The reference achieves effective exactly-once with idempotent MongoDB
upserts keyed on (stream_id, chunk_index) (spark_streaming.py:322-337,
463-486; README:563-569).  The engine keeps that design — deterministic
keys + merge — on parquet tables:

- ``upsert_partitioned``: MERGE-shaped upsert that only rewrites the
  *partitions touched by the batch* (dynamic partition overwrite).  At
  100 TB the per-batch cost is O(touched streams), not O(table) — the
  same access pattern a Delta/Iceberg MERGE would compile to, without
  requiring those jars in this environment.
- ``append_chunk_objects``: the object-store placeholder writes (S5)
  as an append-only file sink partitioned by stream_id.

Both are safe under checkpoint replay: re-running a batch rewrites the
same keys to the same values (last-writer-wins on the compound key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def upsert_partitioned(
    batch_df: DataFrame,
    table_path: str,
    keys: list[str],
    partition_col: str = "stream_id",
    order_col: str | None = None,
) -> None:
    """Upsert ``batch_df`` into the parquet table at ``table_path``.

    Within the batch, the last row per key wins (ordered by
    ``order_col`` if given).  Existing rows for *touched partitions
    only* are read back, anti-joined on the key, and the union is
    written with dynamic partition overwrite — untouched partitions
    are never rewritten.
    """
    spark = batch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # dedup within the batch (replay / duplicate events)
    order = F.col(order_col).desc() if order_col else F.monotonically_increasing_id().desc()
    w = W.partitionBy(*keys).orderBy(order)
    deduped = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
        touched = deduped.select(partition_col).distinct()
        # rows already in the touched partitions that are NOT replaced
        kept = (
            existing.join(F.broadcast(touched), partition_col, "left_semi")
            .join(deduped.select(*keys).distinct(), keys, "left_anti")
        )
        out = kept.unionByName(deduped, allowMissingColumns=True)
    else:
        out = deduped
    (
        out.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(table_path)
    )


def append_chunk_objects(batch_df: DataFrame, path: str, partition_col: str = "stream_id") -> None:
    """S5 — the chunk 'objects' as an append-only partitioned sink; the
    object key is carried as a column (functions/scalars.chunk_object_key)
    so the physical layout mirrors the reference's
    {stream_id}/{quality}/{chunk_index}.ts keyspace."""
    batch_df.write.mode("append").partitionBy(partition_col).parquet(path)


def make_live_sink(metadata_path: str, chunks_path: str):
    """The live-path foreachBatch body (reference process_live_batch,
    spark_streaming.py:519-539, minus the collect()): dedup-upsert the
    per-chunk metadata, append the chunk objects."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        try:
            upsert_partitioned(
                batch_df,
                metadata_path,
                keys=["stream_id", "chunk_index"],
                order_col="sequence_number",
            )
            append_chunk_objects(
                batch_df.select("stream_id", "chunk_index", "chunk_path", "size_bytes"),
                chunks_path,
            )
        finally:
            batch_df.unpersist()

    return sink
