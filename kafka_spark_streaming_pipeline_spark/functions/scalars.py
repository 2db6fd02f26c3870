"""Scalar column expressions for the pipeline (SURVEY.md §2.8, F1-F10).

Everything the reference computes per-row in Python is expressed here
as JVM-side built-in column functions so it stays inside whole-stage
codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import DVR_WINDOW_SIZE


def chunk_checksum(stream_id: Column, chunk_index: Column, size_bytes: Column) -> Column:
    """MD5 checksum over the canonical event tuple.

    Mirrors the reference's checksum formula (producer/producer.py:130-136:
    ``md5(f"{stream_id}-{chunk_index}-{size_bytes}")``) as a built-in
    ``md5(concat_ws(...))`` — vectorized, codegen'd.
    """
    return F.md5(F.concat_ws("-", stream_id, chunk_index.cast("string"), size_bytes.cast("string")))


def checksum_ok(expected: Column, stream_id: Column, chunk_index: Column, size_bytes: Column) -> Column:
    """Validation predicate replacing the per-row verify_checksum
    (reference spark_job/spark_streaming.py:156-167)."""
    return expected == chunk_checksum(stream_id, chunk_index, size_bytes)


def chunk_object_key(stream_id: Column, quality: Column, chunk_index: Column) -> Column:
    """Deterministic object-store key ``{stream_id}/{quality}/{chunk_index}.ts``
    (reference spark_job/spark_streaming.py:245,260,393)."""
    return F.format_string("%s/%s/%d.ts", stream_id, quality, chunk_index)


def manifest_object_key(stream_id: Column) -> Column:
    """Manifest key ``{stream_id}/playlist.m3u8``
    (reference spark_job/spark_streaming.py:304,402)."""
    return F.format_string("%s/playlist.m3u8", stream_id)


def processing_latency_ms(event_ts: Column, processed_ts: Column) -> Column:
    """Event-time latency in ms — now minus the embedded event timestamp
    (reference spark_job/spark_streaming.py:142-153)."""
    return (F.unix_millis(processed_ts) - F.unix_millis(event_ts)).cast("double")


def dvr_window_start(chunk_index: Column, window_size: int = DVR_WINDOW_SIZE) -> Column:
    """Monotone DVR base sequence: ``greatest(0, chunk_index - N + 1)``
    (reference spark_job/spark_streaming.py:435)."""
    return F.greatest(F.lit(0), chunk_index - F.lit(window_size - 1)).cast("long")


def latency_bucket(latency_s: Column) -> Column:
    """Fixed histogram buckets matching the reference's Prometheus
    histogram [0.1, 0.5, 1, 2, 4, 8, 16] seconds
    (reference spark_job/spark_streaming.py:91-96)."""
    boundaries = [0.1, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0]
    expr = F.lit("+Inf")
    for b in reversed(boundaries):
        expr = F.when(latency_s <= F.lit(b), F.lit(f"le_{b}")).otherwise(expr)
    return expr


def short_id(prefix: str, seed: Column, length: int = 12) -> Column:
    """Deterministic id generation: ``{prefix}-{hex}`` (the engine-side
    analog of the reference's uuid4-based ids, api/main.py:225)."""
    return F.concat(F.lit(prefix + "-"), F.substring(F.md5(seed.cast("string")), 1, length))
