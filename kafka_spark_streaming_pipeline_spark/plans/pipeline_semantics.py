"""The reference pipeline's semantics as oracle-checked batch plans.

The driver's ``events`` table stands in for the Kafka streams
(FIXTURES.md §4): ``user_id`` is the stream key, per-key event order is
``(ts, event_id)``.  Each query here is the batch-window equivalent of
a streaming behavior from SURVEY.md §2.9 — the same column expressions
are reused by the streaming layer (streaming/pipeline.py), so checking
them here checks the streaming logic's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..schemas import VOD_RENDITIONS
from .registry import query


def _as_chunks(events: DataFrame) -> DataFrame:
    """Reshape `events` into the pipeline's chunk-stream shape:
    stream_id / chunk_index / duration_ms / size_bytes."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.concat(F.lit("live-"), F.col("user_id").cast("string")).alias("stream_id"),
        (F.row_number().over(w) - 1).cast("long").alias("chunk_index"),
        (F.lit(1000) + F.col("event_id") % 3000).cast("long").alias("duration_ms"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("ts"),
    )

# The oracle-side equivalent of _as_chunks (shared CTE text).
_CHUNKS_CTE = """
    WITH chunks AS (
      SELECT 'live-' || CAST(user_id AS VARCHAR) AS stream_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS chunk_index,
             CAST(1000 + event_id % 3000 AS BIGINT) AS duration_ms,
             event_id, user_id, ts
      FROM events
    )
"""


@query(
    "p01_stream_health",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           count(DISTINCT event_id) AS n_distinct,
           CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS gap_events,
           CAST(sum(greatest(gap, 0)) AS BIGINT) AS missing_total,
           max(event_id) AS last_event_id,
           max(value) AS max_value,
           greatest(0, count(*) - 10) AS dvr_window_start
    FROM (
      SELECT user_id, event_id, value,
             event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS gap
      FROM events
    )
    GROUP BY user_id
    """,
)
def p01_stream_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — per-stream health report: the reference's core per-key
    computation (gap detection spark_streaming.py:379-385, latest-chunk
    tracking, DVR base spark_streaming.py:435) in ONE window+groupBy plan:
    scan -> window(lag) -> hash-agg, a single shuffle on the key."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    gap = F.col("event_id") - F.lag("event_id").over(w) - 1
    return (
        events.select("user_id", "event_id", "value", gap.alias("gap"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_id").alias("n_distinct"),
            F.sum(F.when(F.col("gap") > 0, 1).otherwise(0)).cast("bigint").alias("gap_events"),
            F.sum(F.greatest(F.col("gap"), F.lit(0))).cast("bigint").alias("missing_total"),
            F.max("event_id").alias("last_event_id"),
            F.max("value").alias("max_value"),
            F.greatest(F.lit(0), F.count("*") - F.lit(10)).alias("dvr_window_start"),
        )
    )


@query(
    "p02_checksum_validation",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN substr(md5('live-' || CAST(user_id AS VARCHAR) || '-'
                                       || CAST(event_id AS VARCHAR)), 1, 1) = '0'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
    FROM events
    GROUP BY event_type
    """,
)
def p02_checksum_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum validation + per-label failure counters (A2; reference
    verify_checksum spark_streaming.py:156-167 and the labeled Prometheus
    counter :86-90).  The ~6% deterministic failure predicate mirrors the
    reference's simulated 2% failure rate as a pure column expression."""
    events = load_table(spark, sf_dir, "events")
    digest = F.md5(
        F.concat(
            F.lit("live-"),
            F.col("user_id").cast("string"),
            F.lit("-"),
            F.col("event_id").cast("string"),
        )
    )
    failed = F.substring(digest, 1, 1) == "0"
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(failed, 1).otherwise(0)).cast("bigint").alias("n_failed"),
    )


@query(
    "p03_vod_manifest",
    oracle=_CHUNKS_CTE
    + """
    SELECT stream_id,
           '#EXTM3U' || chr(10) || '#EXT-X-VERSION:3' || chr(10)
           || '#EXT-X-TARGETDURATION:' || CAST(max(duration_ms) // 1000 + 1 AS VARCHAR)
           || chr(10) || '#EXT-X-PLAYLIST-TYPE:VOD' || chr(10)
           || string_agg('#EXTINF:' || CAST(duration_ms // 1000 AS VARCHAR) || '.'
                         || lpad(CAST(duration_ms % 1000 AS VARCHAR), 3, '0') || ','
                         || chr(10) || printf('%s/%s/%d.ts', stream_id, '1080p', chunk_index),
                         chr(10) ORDER BY chunk_index)
           || chr(10) || '#EXT-X-ENDLIST' AS manifest
    FROM chunks
    GROUP BY stream_id
    """,
)
def p03_vod_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/ST6 — the VOD playlist as an ordered per-key aggregation
    (reference builds it by re-reading its own S3 output per event,
    spark_streaming.py:276-316; here it is one groupBy + array_sort +
    string rendering, no read-modify-write)."""
    from ..functions.manifest import vod_manifests

    chunks = _as_chunks(load_table(spark, sf_dir, "events"))
    return vod_manifests(chunks, quality="1080p").select("stream_id", "manifest")


@query(
    "p04_live_dvr_manifest",
    oracle=_CHUNKS_CTE
    + """
    , tail AS (
      SELECT *, row_number() OVER (PARTITION BY stream_id ORDER BY chunk_index DESC) AS rd
      FROM chunks
    )
    SELECT stream_id,
           greatest(0, max(chunk_index) - 9) AS media_sequence,
           '#EXTM3U' || chr(10) || '#EXT-X-VERSION:3' || chr(10)
           || '#EXT-X-TARGETDURATION:' || CAST(max(duration_ms) // 1000 + 1 AS VARCHAR)
           || chr(10) || '#EXT-X-PLAYLIST-TYPE:EVENT' || chr(10)
           || '#EXT-X-MEDIA-SEQUENCE:' || CAST(greatest(0, max(chunk_index) - 9) AS VARCHAR) || chr(10)
           || string_agg('#EXTINF:' || CAST(duration_ms // 1000 AS VARCHAR) || '.'
                         || lpad(CAST(duration_ms % 1000 AS VARCHAR), 3, '0') || ','
                         || chr(10) || printf('%s/%s/%d.ts', stream_id, 'chunks', chunk_index),
                         chr(10) ORDER BY chunk_index) AS manifest
    FROM tail
    WHERE rd <= 10
    GROUP BY stream_id
    """,
)
def p04_live_dvr_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6/W3/W4 — the live DVR playlist: trailing-10 window per key,
    advancing #EXT-X-MEDIA-SEQUENCE (reference spark_streaming.py:398-456).
    Note the target duration is computed over the *window* contents and
    the media sequence from max(chunk_index) — the reference's exact,
    slightly non-obvious semantics (SURVEY.md §7 'hard' item 4)."""
    from ..functions.manifest import live_manifests

    chunks = _as_chunks(load_table(spark, sf_dir, "events"))
    return live_manifests(chunks, window_size=10).select(
        "stream_id", "media_sequence", "manifest"
    )


@query(
    "p05_variant_explode",
    oracle=_CHUNKS_CTE
    + """
    SELECT stream_id, chunk_index, rendition,
           printf('%s/%s/%d.ts', stream_id, rendition, chunk_index) AS variant_path
    FROM chunks
    CROSS JOIN (VALUES ('1080p'), ('720p'), ('480p'), ('360p')) AS r(rendition)
    WHERE event_id % 20 = 0
    """,
)
def p05_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant generation (reference spark_streaming.py:258-268: 4
    renditions per VOD chunk) as explode over a literal array — the
    UDTF/lateral-view surface (§2.10), emitting derived object paths."""
    chunks = _as_chunks(load_table(spark, sf_dir, "events")).filter(F.col("event_id") % 20 == 0)
    return chunks.select(
        "stream_id",
        "chunk_index",
        F.explode(F.array(*[F.lit(r) for r in VOD_RENDITIONS])).alias("rendition"),
    ).select(
        "stream_id",
        "chunk_index",
        "rendition",
        F.format_string("%s/%s/%d.ts", "stream_id", "rendition", "chunk_index").alias(
            "variant_path"
        ),
    )


@query(
    "p06_latency_histogram",
    oracle="""
    SELECT CASE WHEN value / 100.0 <= 0.1 THEN 'le_0.1'
                WHEN value / 100.0 <= 0.5 THEN 'le_0.5'
                WHEN value / 100.0 <= 1.0 THEN 'le_1.0'
                WHEN value / 100.0 <= 2.0 THEN 'le_2.0'
                WHEN value / 100.0 <= 4.0 THEN 'le_4.0'
                WHEN value / 100.0 <= 8.0 THEN 'le_8.0'
                WHEN value / 100.0 <= 16.0 THEN 'le_16.0'
                ELSE '+Inf' END AS bucket,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def p06_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — the reference's Prometheus latency histogram buckets
    (spark_streaming.py:91-96) as CASE bucketing + grouped count,
    using the engine's latency_bucket expression."""
    from ..functions.scalars import latency_bucket

    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        latency_bucket(F.col("value") / 100.0).alias("bucket")
    ).agg(F.count("*").alias("n"))


@query(
    "p07_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id, count(*) AS n FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(max(n) AS BIGINT) AS max_session_events
    FROM per_session
    GROUP BY user_id
    """,
)
def p07_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (the batch analog of session_window in streaming —
    SURVEY §2.9): lag + cumulative-sum-of-boundaries, 30-minute gap."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_ms > 1_800_000, 1).when(F.lag("ts").over(w).isNull(), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    sessions = flagged.select(
        "user_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "session_id"
        ),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(F.count("*").alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n").cast("bigint").alias("max_session_events"),
    )


@query(
    "p08_idempotent_replay",
    oracle="""
    SELECT event_id, user_id FROM (
      SELECT event_id, user_id FROM events
      UNION ALL
      SELECT event_id, user_id FROM events
    )
    GROUP BY event_id, user_id
    """,
)
def p08_idempotent_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/ST3 — idempotent-upsert semantics under replay: a doubled input
    (the checkpoint-replay scenario) deduplicated on the compound key
    yields exactly the original rows (reference keys upserts on
    (stream_id, chunk_index): spark_streaming.py:16-17,322,464)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    replayed = events.unionAll(events)
    return replayed.dropDuplicates(["event_id", "user_id"])


@query(
    "p09_asof_enrich",
    oracle="""
    SELECT user_id, event_id, last_view_ts::TIMESTAMP AS last_view_ts,
           epoch_ms(ts) - epoch_ms(last_view_ts) AS ms_since_view
    FROM (
      SELECT user_id, event_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS last_view_ts
      FROM events
    )
    WHERE event_type = 'purchase'
    """,
)
def p09_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§2.3): enrich each purchase with the most recent
    prior 'view' — the union + running-max-over-ordered-window idiom
    (no shuffle beyond the key partitioning; Spark lacks a native
    as-of join, SURVEY §2.3)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_view = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (
        events.withColumn("last_view_ts", last_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "last_view_ts",
            (F.unix_millis("ts") - F.unix_millis("last_view_ts")).alias("ms_since_view"),
        )
    )


@query(
    "p10_range_join",
    oracle="""
    SELECT o.o_orderkey, count(*) AS n_shipped_90d
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
)
def p10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-predicate join (§2.3): lineitems shipped within 90 days of
    their order date.  The equi key keeps it a hash join; the range is
    evaluated in the join condition (no nested-loop blowup)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= orders.o_orderdate)
            & (li.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_shipped_90d"))
    )
