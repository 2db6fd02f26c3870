"""HLS manifest rendering as column expressions (SURVEY.md §2, A6/ST6).

The reference builds ``.m3u8`` text imperatively, re-reading its own
object-store output per event (spark_job/spark_streaming.py:276-316
VOD append; :398-456 live DVR window).  Here a manifest is a *derived
column*: an ordered per-key aggregation of segment structs serialized
by pure string expressions — no read-modify-write, no race, and the
whole thing stays JVM-side (concat/aggregate over a sorted array).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import DVR_WINDOW_SIZE


def _segment_lines(segments: Column, stream_id: Column, quality: str) -> Column:
    """`#EXTINF:d.ddd,\\n{stream_id}/{quality}/{i}.ts` per segment, in order.

    ``segments`` is an array<struct<chunk_index:long, duration_ms:long>>
    already sorted by chunk_index (array_sort on struct sorts by the
    first field). Matches reference spark_streaming.py:304-308.
    """
    # "#EXTINF:d.ddd" rendered with *integer* arithmetic (ms -> "s.mmm"):
    # float printf rounding differs across engines (Java HALF_UP on the
    # exact binary value vs C/fmt decimal rounding), so the golden text
    # must never pass through a double.
    return F.concat_ws(
        "\n",
        F.transform(
            segments,
            lambda s: F.concat(
                F.lit("#EXTINF:"),
                (s["duration_ms"] / F.lit(1000)).cast("long").cast("string"),
                F.lit("."),
                F.lpad((s["duration_ms"] % F.lit(1000)).cast("string"), 3, "0"),
                F.lit(",\n"),
                F.format_string("%s/" + quality + "/%d.ts", stream_id, s["chunk_index"]),
            ),
        ),
    )


def _target_duration(segments: Column) -> Column:
    """Reference-byte parity: the reference emits int(seconds) + 1
    (spark_streaming.py:291,441), i.e. floor(ms/1000) + 1 — NOT ceil
    (4000 ms renders 5, not 4).  Always >= 1 for non-negative
    durations, so no clamp is needed on either renderer."""
    max_ms = F.array_max(F.transform(segments, lambda s: s["duration_ms"]))
    return (F.floor(max_ms / F.lit(1000)) + F.lit(1)).cast("long")


def render_vod_manifest(segments: Column, stream_id: Column, quality: str = "1080p") -> Column:
    """Append-only VOD playlist (reference spark_streaming.py:286-316)."""
    target_duration = _target_duration(segments)
    return F.concat(
        F.lit("#EXTM3U\n#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:"),
        target_duration.cast("string"),
        F.lit("\n#EXT-X-PLAYLIST-TYPE:VOD\n"),
        _segment_lines(segments, stream_id, quality),
        F.lit("\n#EXT-X-ENDLIST"),
    )


def render_live_manifest(
    segments: Column,
    stream_id: Column,
    media_sequence: Column,
    ended: Column | None = None,
) -> Column:
    """Rolling DVR playlist: last-N segments + advancing media sequence
    (reference spark_streaming.py:438-449); ``#EXT-X-ENDLIST`` appended
    when the stream has ended (api/main.py:443-444)."""
    target_duration = _target_duration(segments)
    body = F.concat(
        F.lit("#EXTM3U\n#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:"),
        target_duration.cast("string"),
        F.lit("\n#EXT-X-PLAYLIST-TYPE:EVENT\n#EXT-X-MEDIA-SEQUENCE:"),
        media_sequence.cast("string"),
        F.lit("\n"),
        _segment_lines(segments, stream_id, "chunks"),
    )
    if ended is None:
        return body
    return F.when(ended, F.concat(body, F.lit("\n#EXT-X-ENDLIST"))).otherwise(body)


def vod_manifests(chunks: DataFrame, quality: str = "1080p") -> DataFrame:
    """Batch materialization: one manifest row per stream_id.

    Scales by shuffling once on stream_id (map-side partial collect);
    the per-key array is bounded by episode length, not table size.
    """
    return (
        chunks.groupBy("stream_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_index", "duration_ms"))
            ).alias("segments")
        )
        .select(
            "stream_id",
            render_vod_manifest(F.col("segments"), F.col("stream_id"), quality).alias("manifest"),
        )
    )


def live_manifests(
    chunks: DataFrame, window_size: int = DVR_WINDOW_SIZE, ended_col: str | None = None
) -> DataFrame:
    """Batch materialization of the live DVR playlist per stream_id:
    keep only the trailing ``window_size`` segments; media sequence =
    greatest(0, max(chunk_index) - N + 1) (reference :430-435)."""
    sorted_segs = F.array_sort(F.collect_list(F.struct("chunk_index", "duration_ms")))
    # slice(arr, -N, N) yields NULL when the array is shorter than N —
    # guard so young streams (< window_size chunks) keep all segments
    tail = F.when(F.size(sorted_segs) <= window_size, sorted_segs).otherwise(
        F.slice(sorted_segs, -window_size, window_size)
    )
    agg = [
        tail.alias("segments"),
        F.greatest(F.lit(0), F.max("chunk_index") - F.lit(window_size - 1)).alias("media_sequence"),
    ]
    if ended_col:
        agg.append(F.max(F.col(ended_col).cast("int")).cast("boolean").alias("ended"))
    grouped = chunks.groupBy("stream_id").agg(*agg)
    ended = F.col("ended") if ended_col else None
    return grouped.select(
        "stream_id",
        "media_sequence",
        render_live_manifest(
            F.col("segments"), F.col("stream_id"), F.col("media_sequence"), ended
        ).alias("manifest"),
    )
