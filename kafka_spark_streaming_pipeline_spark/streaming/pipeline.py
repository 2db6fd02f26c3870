"""The streaming pipeline: ingest -> validate -> derive -> analyze.

Re-expresses the reference's two foreachBatch bodies
(spark_job/spark_streaming.py:196-341 VOD, :353-489 live) as
declarative column transforms that work identically on a streaming or
batch DataFrame — the batch forms are what the DuckDB oracle verifies
(plans/pipeline_semantics.py), and the same functions compose into
the streaming topology here.

The reference collect()s every micro-batch into the driver and loops
rows in Python; here every step is a column expression planned by
Catalyst, executed on executors, with no executor->driver hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    checksum_ok,
    chunk_object_key,
    dvr_window_start,
    manifest_object_key,
    processing_latency_ms,
)
from ..schemas import LIVE_CHUNK_DEFAULTS, VOD_CHUNK_DEFAULTS, VOD_RENDITIONS


def apply_defaults(chunks: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """P2 — per-field read-time defaults (the reference's dict.get
    pattern, spark_streaming.py:209-216,364-372) as coalesce columns."""
    out = chunks
    for name, default in defaults.items():
        if name in out.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    return out


def validate_chunks(chunks: DataFrame) -> DataFrame:
    """Checksum verification as a predicate column (reference
    verify_checksum, spark_streaming.py:156-167).  Invalid rows are
    FLAGGED, not dropped — the reference counts failures and continues."""
    return chunks.withColumn(
        "checksum_ok",
        checksum_ok(
            F.col("checksum"), F.col("stream_id"), F.col("chunk_index"), F.col("size_bytes")
        ),
    )


def derive_live_columns(chunks: DataFrame) -> DataFrame:
    """The live-path derived columns (spark_streaming.py:353-489):
    event-time parse, processing latency, object keys, DVR base."""
    out = chunks.withColumn("event_ts", F.to_timestamp("timestamp"))
    return (
        out.withColumn(
            "processing_latency_ms",
            processing_latency_ms(F.col("event_ts"), F.current_timestamp()),
        )
        .withColumn(
            "chunk_path",
            chunk_object_key(F.col("stream_id"), F.lit("chunks"), F.col("chunk_index")),
        )
        .withColumn("manifest_path", manifest_object_key(F.col("stream_id")))
        .withColumn("dvr_window_start", dvr_window_start(F.col("chunk_index")))
    )


def derive_vod_columns(chunks: DataFrame) -> DataFrame:
    """The VOD-path derived columns incl. variant fan-out
    (spark_streaming.py:196-341): 4 renditions per chunk as an array
    column (explode downstream when a row-per-variant is needed)."""
    out = chunks.withColumn("event_ts", F.to_timestamp("timestamp"))
    renditions = F.array(*[F.lit(r) for r in VOD_RENDITIONS])
    return (
        out.withColumn(
            "processing_latency_ms",
            processing_latency_ms(F.col("event_ts"), F.current_timestamp()),
        )
        .withColumn("variants_generated", renditions)
        .withColumn(
            "variant_paths",
            F.transform(
                renditions,
                lambda r: chunk_object_key(F.col("stream_id"), r, F.col("chunk_index")),
            ),
        )
        .withColumn("manifest_path", manifest_object_key(F.col("stream_id")))
        .withColumn("status", F.lit("ready"))
    )


def live_transform(decoded: DataFrame) -> DataFrame:
    """Full live-path transform chain (defaults -> validate -> derive)."""
    return derive_live_columns(validate_chunks(apply_defaults(decoded, LIVE_CHUNK_DEFAULTS)))


def vod_transform(decoded: DataFrame) -> DataFrame:
    """Full VOD-path transform chain."""
    return derive_vod_columns(validate_chunks(apply_defaults(decoded, VOD_CHUNK_DEFAULTS)))


def with_watermarked_windows(
    events: DataFrame,
    ts_col: str = "event_ts",
    watermark: str = "30 seconds",
    window_duration: str = "10 seconds",
) -> DataFrame:
    """ST7 — the piece the reference lacks (SURVEY §2.9): event-time
    tumbling windows with a watermark so late data is bounded and
    dropped deterministically; per-window per-stream throughput +
    failure counts (the streaming form of A1/A2/A7)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("stream_id"))
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(~F.col("checksum_ok"), 1).otherwise(0)).alias("n_checksum_failed"),
            F.approx_count_distinct("sequence_number").alias("approx_distinct_seq"),
            F.max("chunk_index").alias("last_chunk_index"),
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "event_ts",
    gap: str = "30 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """ST9's streaming form — per-stream sessions closed by inactivity.

    The reference ends a live stream only by an explicit control-plane
    call (api/main.py:421-462); ``session_window`` adds the timeout
    path: chunks for a stream separated by more than ``gap`` fall into
    distinct sessions, and a session finalizes (append mode) once the
    watermark passes its close — the engine-native analog of
    "stream ended, emit #EXT-X-ENDLIST".  State is per active session
    per key, merged incrementally, RocksDB-backed at scale."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col("stream_id"))
        .agg(
            F.count("*").alias("n_chunks"),
            F.min("chunk_index").alias("first_chunk"),
            F.max("chunk_index").alias("last_chunk"),
            F.sum("duration_ms").alias("total_duration_ms"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "stream_id",
            "n_chunks",
            "first_chunk",
            "last_chunk",
            "total_duration_ms",
        )
    )


def sliding_rates(
    events: DataFrame,
    ts_col: str = "event_ts",
    window_duration: str = "10 seconds",
    slide: str = "5 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """A7's streaming form — per-stream ingest rate over overlapping
    sliding windows (the reference samples counters once per second in
    the producer, producer.py:361-375; here the rate is an event-time
    aggregate, late-data-safe under the watermark)."""
    secs = float(window_duration.split()[0])
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration, slide), F.col("stream_id"))
        .agg(
            F.count("*").alias("n_chunks"),
            F.round(F.count("*") / F.lit(secs) + F.lit(1e-9), 4).alias("chunks_per_sec"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "stream_id",
            "n_chunks",
            "chunks_per_sec",
        )
    )


def deduplicated_stream(
    events: DataFrame, ts_col: str = "event_ts", watermark: str = "30 seconds"
) -> DataFrame:
    """Replay/duplicate suppression inside the stream itself:
    dropDuplicatesWithinWatermark on the idempotency key — the
    streaming twin of the keyed upsert (S7)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["stream_id", "chunk_index"]
    )


def start_foreach_batch(
    df: DataFrame,
    sink_fn,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    query_name: str = "pipeline",
    available_now: bool = False,
):
    """ST1/ST2/ST3 — the micro-batch topology: foreachBatch sink with a
    checkpoint and a processing-time trigger (the reference's dual
    1s/5s cadence, spark_streaming.py:611,621) or availableNow for
    drain-and-stop runs."""
    writer = (
        df.writeStream.foreachBatch(sink_fn)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def enrich_with_stream_start(
    chunks: DataFrame,
    starts: DataFrame,
    watermark: str = "30 seconds",
    max_stream_age: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (SURVEY §2.9 — absent from the
    reference, which correlates via external state): each live chunk
    joins the stream-start control event for its stream_id that
    happened at-or-before the chunk, no more than ``max_stream_age``
    earlier.  Both sides are watermarked so Spark bounds the join state
    buffer; starts outside the interval are dropped from state once the
    watermark passes.

    ``how='left_outer'`` keeps orphan chunks (no start event — e.g. the
    control topic lagged or dropped): they emit with null start
    columns once the watermark passes their interval, which is the
    monitoring-friendly variant (an inner join silently hides broken
    streams)."""
    c = chunks.withWatermark("event_ts", watermark)
    s = (
        starts.select(
            F.col("stream_id").alias("s_stream_id"),
            F.col("event_ts").alias("start_ts"),
            F.col("title"),
        ).withWatermark("start_ts", watermark)
    )
    cond = (
        (F.col("stream_id") == F.col("s_stream_id"))
        & (F.col("start_ts") <= F.col("event_ts"))
        & (F.col("event_ts") <= F.col("start_ts") + F.expr(f"INTERVAL {max_stream_age}"))
    )
    return c.join(s, cond, how).drop("s_stream_id")


def enrich_with_static_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "stream_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension table
    (channel/competition metadata the reference reads per-event from
    Mongo).  Stateless — Spark re-plans the static side per micro-batch,
    so a refreshed dim parquet is picked up without restarting the
    query; the broadcast hint keeps the stream side shuffle-free (the
    dim is the small side by construction)."""
    return stream.join(F.broadcast(dim), key, how)
