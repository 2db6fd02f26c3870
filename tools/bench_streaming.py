#!/usr/bin/env python3
"""Streaming throughput benchmark: events/s through the live pipeline.

Pushes N synthetic live-chunk events (default 200k) through the full
topology — decode-equivalent transform (defaults, checksum, latency,
paths), keyed cross-batch gap state, idempotent upsert sink — using
availableNow micro-batches, and prints ONE JSON line with events/s.

The reference's measured live throughput is 1.32 events/s end-to-end
(BASELINE.md: per-event driver Python + per-event S3/Mongo round
trips).  This engine executes the same semantics as columnar plans +
RocksDB state, so the comparable number is 4-5 orders of magnitude
higher on one node.

    python3 tools/bench_streaming.py [n_events] [n_batches]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_spark_streaming_pipeline_spark.schemas import LIVE_CHUNK_SCHEMA  # noqa: E402
from kafka_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402
from kafka_spark_streaming_pipeline_spark.sources.files import parquet_stream  # noqa: E402
from kafka_spark_streaming_pipeline_spark.streaming.pipeline import (  # noqa: E402
    live_transform,
    start_foreach_batch,
)
from kafka_spark_streaming_pipeline_spark.streaming.sinks import (  # noqa: E402
    latest_view,
    make_live_log_sink,
)
from kafka_spark_streaming_pipeline_spark.streaming.state import track_gaps  # noqa: E402


def measure(spark, n_events: int = 200_000, n_batches: int = 4) -> dict:
    """Run the live-pipeline throughput measurement on an existing
    session and return the metrics dict (importable from bench.py so
    the per-round BENCH json carries a streaming number too)."""
    work = tempfile.mkdtemp(prefix="stream_bench_")

    # synthesize events with generated checksums (1000 streams, in-order
    # sequences with occasional gaps) directly as parquet micro-batches
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    per_batch = n_events // n_batches
    gen_t0 = time.time()
    for b in range(n_batches):
        df = (
            spark.range(b * per_batch, (b + 1) * per_batch)
            .withColumn("stream_id", F.concat(F.lit("live-"), (F.col("id") % 1000).cast("string")))
            .withColumn("chunk_index", (F.col("id") / 1000).cast("long"))
            .withColumn(
                "sequence_number",
                F.col("chunk_index") + F.when(F.col("id") % 997 == 0, 2).otherwise(0),
            )
            .withColumn("timestamp", F.lit("2024-01-01T00:00:00+00:00"))
            .withColumn("size_bytes", F.lit(1000) + F.col("chunk_index"))
            .withColumn("stream_type", F.lit("live"))
            .withColumn("status", F.lit("received"))
            .withColumn(
                "checksum",
                F.md5(
                    F.concat_ws(
                        "-", "stream_id", F.col("chunk_index").cast("string"),
                        F.col("size_bytes").cast("string"),
                    )
                ),
            )
            .withColumn("duration_ms", F.lit(2000))
            .withColumn("keyframe_aligned", F.lit(True))
            .withColumn("audio_track_id", F.lit("a"))
            .withColumn("video_track_id", F.lit("v"))
            .withColumn("match_home", F.lit("H"))
            .withColumn("match_away", F.lit("A"))
            .withColumn("competition", F.lit("L"))
            .drop("id")
        )
        staging = os.path.join(work, f"stage_{b}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        [part] = glob.glob(os.path.join(staging, "part-*.parquet"))
        shutil.move(part, os.path.join(in_dir, f"batch_{b}.parquet"))
    gen_s = time.time() - gen_t0

    stream = live_transform(
        parquet_stream(spark, in_dir, LIVE_CHUNK_SCHEMA, max_files_per_trigger=1)
    )
    meta_path = os.path.join(work, "meta")
    chunks_path = os.path.join(work, "chunks")

    t0 = time.time()
    queries = [
        start_foreach_batch(
            stream,
            make_live_log_sink(meta_path, chunks_path),
            checkpoint_dir=os.path.join(work, "ckpt_sink"),
            available_now=True,
            query_name="bench_sink",
        ),
        track_gaps(stream.select("stream_id", "sequence_number"))
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt_gaps"))
        .trigger(availableNow=True)
        .queryName("bench_gaps")
        .start(),
    ]
    for q in queries:
        q.awaitTermination(600)
    wall = time.time() - t0

    n_sunk = latest_view(spark, meta_path, ["stream_id", "chunk_index"], "sequence_number").count()
    result = {
        "metric": "streaming_events_per_second",
        "value": round(n_events / wall, 1),
        "unit": "events/sec",
        "n_events": n_events,
        "n_batches": n_batches,
        "wall_sec": round(wall, 2),
        "gen_sec": round(gen_s, 2),
        "rows_in_metadata_sink": n_sunk,
        "reference_events_per_second": 1.32,
    }
    shutil.rmtree(work, ignore_errors=True)
    return result


def main() -> None:
    """CLI entry: a FRESH SparkSession per invocation, best-of-N
    repeats.  bench.py shells out to this (subprocess) for the
    headline ``streaming_events_per_sec`` so the query bench's
    accumulated session state (hundreds of tracked caches at the end
    of a 35-query best-of-3 sweep) can never contaminate the one
    number compared against BASELINE.md's 1.32 events/s."""
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="stream_bench")
    spark.sparkContext.setLogLevel("ERROR")
    best = None
    for _ in range(repeats):
        m = measure(spark, n_events, n_batches)
        if best is None or m["value"] > best["value"]:
            best = m
        print(f"# repeat: {m['value']} events/s", file=sys.stderr)
    best["repeats"] = repeats
    best["isolation"] = "fresh-session subprocess"
    print(json.dumps(best))


if __name__ == "__main__":
    main()


def measure_gate(spark, sf_dir: str, n_docs: int = 20_000, n_batches: int = 4) -> dict:
    """Quality-gate throughput: docs/s through the full ingest gate
    (persisted-LM perplexity scoring + fingerprint-history dedup +
    accept/reject routing).  The LM build is train-once and excluded
    from the measured window; each batch is half exact-duplicates of
    earlier batches and half novel text, so both the dedup and the
    scoring paths are exercised."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        save_bigram_lm,
    )
    from kafka_spark_streaming_pipeline_spark.streaming.sinks import (
        make_quality_gate_sink,
    )

    work = tempfile.mkdtemp(prefix="gate_bench_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        save_bigram_lm(docs, f"{work}/lm")
        sink = make_quality_gate_sink(
            f"{work}/acc", f"{work}/rej", f"{work}/lm", f"{work}/fp",
            max_cross_entropy=100.0,
        )
        per_batch = max(1, n_docs // n_batches)
        base = docs.limit(per_batch).select("doc_id", "text")
        # the corpus may be smaller than requested: report what actually
        # flowed, never the ask (docs/s would silently inflate)
        n_base = base.count()
        t0 = time.time()
        for b in range(n_batches):
            batch = base.select(
                (F.col("doc_id") + F.lit(b * 1_000_000)).alias("doc_id"),
                F.when(
                    F.col("doc_id") % 2 == 0, F.col("text")  # dup across batches
                ).otherwise(F.concat(F.col("text"), F.lit(f" novel{b}"))).alias("text"),
            )
            sink(batch, b)
        wall = round(time.time() - t0, 3)
        n = n_base * n_batches
        return {
            "metric": "gate_docs_per_second",
            "value": round(n / wall, 1),
            "n_docs": n,
            "wall_sec": wall,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def measure_ingest(spark, sf_dir: str, n_docs: int = 20_000, n_batches: int = 4) -> dict:
    """Composed document-ingest throughput (VERDICT r5 #8): each batch
    flows through the FULL maintenance fan-out a production corpus
    keeps live — the quality gate (persisted-LM scoring +
    fingerprint-history dedup + accept/reject routing), the streaming
    datasheet (per-source integer partials + fingerprint HLL
    registers), and heavy-hitter term tracking (CMS + candidate log
    over the batch's exploded tokens).  The reported docs/s prices all
    three families together — the composed number the per-sink tests
    can't give — and the merged views are sanity-checked at the end so
    a silently-broken sink cannot inflate it."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        save_bigram_lm,
    )
    from kafka_spark_streaming_pipeline_spark.streaming.sinks import (
        datasheet_view,
        heavy_hitters_view,
        make_datasheet_sink,
        make_heavy_hitters_sink,
        make_quality_gate_sink,
    )

    work = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        save_bigram_lm(docs, f"{work}/lm")
        gate = make_quality_gate_sink(
            f"{work}/acc", f"{work}/rej", f"{work}/lm", f"{work}/fp",
            max_cross_entropy=100.0,
        )
        datasheet = make_datasheet_sink(f"{work}/ds")
        hh = make_heavy_hitters_sink(f"{work}/hh", candidate_floor=100)
        per_batch = max(1, n_docs // n_batches)
        base = docs.limit(per_batch).select("doc_id", "source", "text")
        n_base = base.count()  # corpus may be smaller than the ask
        t0 = time.time()
        for b in range(n_batches):
            batch = base.select(
                (F.col("doc_id") + F.lit(b * 1_000_000)).alias("doc_id"),
                "source",
                F.when(F.col("doc_id") % 2 == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(f" novel{b}")))
                .alias("text"),
            )
            gate(batch.select("doc_id", "text"), b)
            datasheet(batch, b)
            hh(
                batch.select(
                    F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
                ),
                b,
            )
        wall = round(time.time() - t0, 3)
        n = n_base * n_batches
        ds_sources = datasheet_view(spark, f"{work}/ds").count()
        top_terms = heavy_hitters_view(spark, f"{work}/hh", k=5).count()
        if ds_sources < 1 or top_terms != 5:
            raise RuntimeError(
                f"composed views inconsistent: {ds_sources} sources, {top_terms} terms"
            )
        return {
            "metric": "ingest_docs_per_second",
            "value": round(n / wall, 1),
            "n_docs": n,
            "n_batches": n_batches,
            "wall_sec": wall,
            "datasheet_sources": ds_sources,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def measure_curation(spark, sf_dir: str, n_docs: int = 10_000, n_batches: int = 4) -> dict:
    """Streaming-curation throughput: docs/s through the incremental
    funnel sink (Gopher rules + exact dedup vs fingerprint history +
    near-dup vs signature history + eval-gram decontamination, state
    advanced per batch).  Batches repeat half their docs across
    batches so the history tiers do real work; the cumulative yield
    view is consistency-checked at the end."""
    from kafka_spark_streaming_pipeline_spark.streaming.sinks import (
        curation_yield_view,
        make_curation_sink,
    )

    work = tempfile.mkdtemp(prefix="curation_bench_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        evals = docs.filter(F.col("doc_id") % 20 == 0)
        sink = make_curation_sink(f"{work}/cur", evals)
        per_batch = max(1, n_docs // n_batches)
        base = (
            docs.filter(F.col("doc_id") % 20 != 0)
            .limit(per_batch)
            .select("doc_id", "text")
        )
        n_base = base.count()
        t0 = time.time()
        for b in range(n_batches):
            batch = base.select(
                (F.col("doc_id") + F.lit(b * 1_000_000)).alias("doc_id"),
                F.when(F.col("doc_id") % 2 == 0, F.col("text"))  # dup across batches
                .otherwise(F.concat(F.col("text"), F.lit(f" fresh{b}")))
                .alias("text"),
            )
            sink(batch, b)
        wall = round(time.time() - t0, 3)
        n = n_base * n_batches
        yld = {r["stage"]: r for r in curation_yield_view(spark, f"{work}/cur").collect()}
        if yld["1_quality"]["docs_in"] != n:
            raise RuntimeError(f"yield log saw {yld['1_quality']['docs_in']} != {n}")
        return {
            "metric": "curation_docs_per_second",
            "value": round(n / wall, 1),
            "n_docs": n,
            "n_batches": n_batches,
            "wall_sec": wall,
            "accepted": int(yld["4_decontaminate"]["docs_out"]),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
