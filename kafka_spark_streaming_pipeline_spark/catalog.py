"""Test-table catalog: parquet loaders + temp-view registration.

The driver provides deterministic TPC-H-ish tables plus ``events``
(the batch stand-in for the reference's Kafka streams),
``documents`` and ``embeddings`` (for the training-data extension
operators).  See /root/repo/TESTDATA.md.

At 100 TB these would be external catalog tables (partitioned /
bucketed parquet or an open table format); the loader keeps the same
interface — a name -> DataFrame mapping — so plans are storage-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Runtime-settable confs so even externally-provided sessions read the
    # test tables identically:
    # - UTC session timezone: the NTZ->LTZ read below (and every
    #   date/time function in the plans) is only value-stable under UTC.
    # - inferTimestampNTZ=false: parquet TIMESTAMP(isAdjustedToUTC=false)
    #   surfaces as TIMESTAMP (ltz) *at the scan itself* — one timestamp
    #   type across the whole query surface with NO post-scan cast
    #   projection, so scan-level column pruning / filter pushdown are
    #   untouched (a per-column withColumn cast here cost q16 3.6x in r2).
    # - nanosAsLong: some driver builds write events.ts as
    #   TIMESTAMP(NANOS), which the reader otherwise rejects.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    # nanosAsLong surfaces TIMESTAMP(NANOS) as bigint nanoseconds —
    # convert to a proper timestamp (integer `div` so the 18-digit nano
    # value never passes through a double).  No-op when the file carries
    # MICROS (ts already a timestamp).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table that exists under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (for spark.sql plans)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
