"""Observability (SURVEY.md §2.1 S10, §2.4 A1-A4).

The reference exposes Prometheus counters/histograms/gauges updated
per event in driver Python (spark_job/spark_streaming.py:74-104,548).
The engine's equivalents are push-based and computed ON THE EXECUTORS:

- ``with_pipeline_metrics``: attaches ``df.observe`` accumulators to a
  (batch or streaming) DataFrame — chunk counts, checksum failures,
  distinct-stream estimate, latency max/mean — the A1-A4 aggregations
  as zero-cost plan metrics (no extra pass over the data; they ride
  the existing action).
- ``PipelineMetricsListener``: a ``StreamingQueryListener`` that folds
  each micro-batch's observed metrics plus source/sink throughput into
  an in-memory registry — the scrape surface a Prometheus exporter (or
  any metrics bridge) would read.  Counters are monotonic across
  batches like the reference's Counter objects.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "pipeline_metrics"


def with_pipeline_metrics(df: DataFrame, name: str = OBSERVATION_NAME) -> DataFrame:
    """A1-A4 as observed metrics on the existing plan: processed count,
    failure count (overall — the per-label split is a grouped query,
    q/p02), distinct-stream estimate, latency extremes.  ``observe`` is
    valid on both batch and streaming DataFrames."""
    # NOTE: attach to sinks that run ONE action per batch.  A
    # foreachBatch body running several actions can re-execute source
    # partitions on cache misses, in which case the plan's CollectMetrics
    # node counts those partitions again (exact counters are asserted in
    # tests with a single-action sink).
    cols = set(df.columns)
    metrics = [F.count(F.lit(1)).alias("n_chunks")]
    if "checksum_ok" in cols:
        metrics.append(
            F.sum(F.when(~F.col("checksum_ok"), 1).otherwise(0)).alias("n_checksum_failed")
        )
    if "stream_id" in cols:
        metrics.append(F.approx_count_distinct("stream_id").alias("approx_streams"))
    if "processing_latency_ms" in cols:
        metrics.append(F.max("processing_latency_ms").alias("max_latency_ms"))
        metrics.append(F.avg("processing_latency_ms").alias("avg_latency_ms"))
    return df.observe(name, *metrics)


class PipelineMetricsListener(StreamingQueryListener):
    """Folds observed metrics + progress stats into ``self.counters`` /
    ``self.gauges`` (the scrape surface).  Monotonic counters mirror the
    reference's Prometheus Counters; gauges hold last-batch values."""

    def __init__(self) -> None:
        self.counters: dict[str, float] = defaultdict(float)
        self.gauges: dict[str, float] = {}
        self.batches: int = 0

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        return None

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        progress = event.progress
        self.batches += 1
        self.gauges["input_rows_per_second"] = progress.inputRowsPerSecond or 0.0
        self.gauges["processed_rows_per_second"] = progress.processedRowsPerSecond or 0.0
        self.counters["rows_in_total"] += progress.numInputRows or 0
        observed = (progress.observedMetrics or {}).get(OBSERVATION_NAME)
        if observed is not None:
            row = observed.asDict()
            for key in ("n_chunks", "n_checksum_failed"):
                if row.get(key) is not None:
                    self.counters[key] += row[key]
            for key in ("approx_streams", "max_latency_ms", "avg_latency_ms"):
                if row.get(key) is not None:
                    self.gauges[key] = float(row[key])

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        return None

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        return None
