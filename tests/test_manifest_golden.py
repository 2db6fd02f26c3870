"""Golden-file tests for HLS manifest rendering (SURVEY.md §5).

The exact ``.m3u8`` text is the reference's only non-trivial derived
state (spark_job/spark_streaming.py:286-316 VOD, :438-449 live;
``#EXT-X-ENDLIST`` on end: api/main.py:443-444).  Checks the batch
column renderer and the streaming (Python) renderer produce identical
bytes.
"""

from __future__ import annotations

from kafka_spark_streaming_pipeline_spark.functions.manifest import (
    live_manifests,
    vod_manifests,
)
from kafka_spark_streaming_pipeline_spark.streaming.state import render_live_manifest_py


def _chunks(spark, rows):
    return spark.createDataFrame(
        rows, "stream_id string, chunk_index long, duration_ms long"
    )


GOLDEN_VOD = (
    "#EXTM3U\n"
    "#EXT-X-VERSION:3\n"
    "#EXT-X-TARGETDURATION:5\n"  # reference: int(4.000s) + 1
    "#EXT-X-PLAYLIST-TYPE:VOD\n"
    "#EXTINF:3.211,\n"
    "live-1/1080p/0.ts\n"
    "#EXTINF:4.000,\n"
    "live-1/1080p/1.ts\n"
    "#EXT-X-ENDLIST"
)


def test_vod_manifest_golden(spark):
    df = _chunks(spark, [("live-1", 1, 4000), ("live-1", 0, 3211)])  # out of order
    [row] = vod_manifests(df).collect()
    assert row.manifest == GOLDEN_VOD


def test_live_manifest_under_window(spark):
    df = _chunks(spark, [("s", 0, 2000), ("s", 1, 2500)])
    [row] = live_manifests(df).collect()
    assert row.media_sequence == 0
    assert "#EXT-X-MEDIA-SEQUENCE:0" in row.manifest
    assert "#EXT-X-PLAYLIST-TYPE:EVENT" in row.manifest
    assert row.manifest.count("#EXTINF") == 2
    assert "#EXT-X-ENDLIST" not in row.manifest


def test_live_manifest_slides_to_last_10(spark):
    rows = [("s", i, 2000 + i) for i in range(25)]
    df = _chunks(spark, rows)
    [row] = live_manifests(df).collect()
    # media sequence advances: max_chunk=24 -> start 15 (ref :435)
    assert row.media_sequence == 15
    assert row.manifest.count("#EXTINF") == 10
    assert "s/chunks/15.ts" in row.manifest
    assert "s/chunks/14.ts" not in row.manifest
    assert "s/chunks/24.ts" in row.manifest


def test_live_manifest_ended_flag(spark):
    df = spark.createDataFrame(
        [("s", 0, 2000, True)],
        "stream_id string, chunk_index long, duration_ms long, is_end boolean",
    )
    [row] = live_manifests(df, ended_col="is_end").collect()
    assert row.manifest.endswith("#EXT-X-ENDLIST")


def test_streaming_renderer_matches_batch(spark):
    rows = [("s", i, 3000 + 7 * i) for i in range(12)]
    [batch_row] = live_manifests(_chunks(spark, rows)).collect()
    kept = [(i, 3000 + 7 * i) for i in range(2, 12)]  # last 10
    py = render_live_manifest_py("s", kept, media_sequence=2)
    assert py == batch_row.manifest
