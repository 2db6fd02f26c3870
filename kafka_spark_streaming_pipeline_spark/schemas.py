"""Explicit StructTypes for the pipeline's event streams.

The reference carries implicit JSON schemas, applying per-field
defaults at read time with ``dict.get`` (reference
spark_job/spark_streaming.py:209-216 for VOD, :364-372 for live).
Here the same shapes are fixed ``StructType``s so ``from_json`` can
decode Kafka values executor-side — malformed rows become nulls in a
corrupt-record column instead of driver-side try/except.
"""

from __future__ import annotations

from pyspark.sql import types as T

# One row per live HLS segment event (reference producer/producer.py:289-307).
LIVE_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("chunk_index", T.LongType(), False),
        T.StructField("sequence_number", T.LongType(), False),
        T.StructField("timestamp", T.StringType(), True),  # ISO-8601; parsed to ts
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("stream_type", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("keyframe_aligned", T.BooleanType(), True),
        T.StructField("audio_track_id", T.StringType(), True),
        T.StructField("video_track_id", T.StringType(), True),
        T.StructField("match_home", T.StringType(), True),
        T.StructField("match_away", T.StringType(), True),
        T.StructField("competition", T.StringType(), True),
    ]
)

# One row per VOD upload event (reference api/main.py:276-291).
VOD_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("chunk_index", T.LongType(), False),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("stream_type", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("resolution", T.StringType(), True),
        T.StructField("keyframe_aligned", T.BooleanType(), True),
        T.StructField("audio_track_id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("raw_path", T.StringType(), True),
    ]
)

# Defaults the reference applies at read time
# (spark_job/spark_streaming.py:209-216,364-372).
LIVE_CHUNK_DEFAULTS: dict[str, object] = {
    "duration_ms": 4000,
    "size_bytes": 0,
    "stream_type": "live",
    "status": "received",
    "keyframe_aligned": False,
}
VOD_CHUNK_DEFAULTS: dict[str, object] = {
    "duration_ms": 4000,
    "size_bytes": 0,
    "stream_type": "vod",
    "status": "uploaded",
    "resolution": "1920x1080",
}

# The driver's `events` table props payload is a JSON object {"k": int}.
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])

# Renditions generated per VOD chunk (reference spark_job/spark_streaming.py:69).
VOD_RENDITIONS: tuple[str, ...] = ("1080p", "720p", "480p", "360p")

# DVR sliding-window size (reference .env.example:75, spark_streaming.py:430-435).
DVR_WINDOW_SIZE = 10
