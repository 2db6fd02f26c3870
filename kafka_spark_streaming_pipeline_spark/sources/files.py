"""File-based batch & streaming sources.

The reference reads only from Kafka; the engine adds first-class file
sources (SURVEY.md §2.1 S11): parquet (the default — columnar,
pushdown), json/csv with explicit schemas, and a *streaming* file
source used to replay event batches deterministically in tests
(``maxFilesPerTrigger=1`` -> one file per micro-batch, the stand-in
for Kafka's offset-bounded triggers)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming source over a directory of parquet files; each trigger
    consumes ``max_files_per_trigger`` files — deterministic micro-batch
    replay for tests and backfills."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def json_stream(
    spark: SparkSession, path: str, schema: T.StructType, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Batch JSON-lines reader with a MANDATORY explicit schema:
    schema inference is a full extra pass over the data — never
    acceptable at 100 TB — and silently widens types between runs.
    Malformed rows surface as nulls (PERMISSIVE), mirroring the
    engine-wide from_json posture instead of the reference's per-row
    try/except (spark_streaming.py:511-516)."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Batch CSV reader, explicit schema only (same rationale as
    ``read_json``); header consumed but never trusted for types."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(path)
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Built-in rate source — synthetic (timestamp, value) rows for
    load/latency smoke tests (the analog of the reference's producer
    cadence, producer.py:327-328)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Batch ORC reader (S11 file-format breadth): ORC is built into
    Spark (no extra jar), columnar like parquet, with the same
    predicate-pushdown/column-pruning behavior — an explicit schema
    skips footer inference exactly as with parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def orc_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ORC source — same file-source semantics as
    parquet_stream (exactly-once file tracking in the checkpoint)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.orc(path)


def read_evolved(
    spark: SparkSession,
    path: str,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Read a parquet dataset whose schema evolved across writes
    (columns added over time): ``mergeSchema`` unions the file footers
    so old files surface the new columns as null, and ``defaults``
    coalesces those nulls to the declared backfill value — the
    standard long-lived-dataset pattern (a 100 TB corpus is written
    over months; new enrichment columns must not invalidate old
    files)."""
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, default in (defaults or {}).items():
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return df
