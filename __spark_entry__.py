"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship per-stream health query on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 + the
  training-data extensions, as (spark, sf_dir) -> DataFrame builders.
- ``oracle_sql()``: DuckDB-equivalent SQL for each; omitted only for
  the handful of approximate/iterative ops (LSH/IVF ANN, k-means,
  HLL rollup) whose semantics have no exact SQL form — those carry
  accuracy/property tests in tests/ instead.

Implementation lives in ``kafka_spark_streaming_pipeline_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_spark_streaming_pipeline_spark.plans import QUERIES  # noqa: E402


def _prepare(spark: SparkSession) -> None:
    """Settings required for oracle-comparable results on any session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prepare(spark)
    return QUERIES["p01_stream_health"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return QUERIES[name].builder(spark, sf_dir)

        run.__name__ = name
        run.__doc__ = QUERIES[name].doc
        return run

    return {name: wrap(name) for name in sorted(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (rows-only checks omitted)."""
    return {name: q.oracle for name, q in sorted(QUERIES.items()) if q.oracle is not None}
