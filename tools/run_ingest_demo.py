#!/usr/bin/env python3
"""Incremental-ingest demo: the daily corpus-update loop on one Engine
handle — persisted histories, O(batch) matching, never a full-corpus
re-read after the one-time build.

  build once:
    -> exact fingerprint history      (Engine.build_dedup_history)
    -> MinHash signature history      (Engine.build_neardup_history)
  per batch:
    -> exact flags                    (ingest_dedup: seen/keep)
    -> near-dup candidate pairs       (ingest_neardup: vs history sigs)
    -> accept survivors               (accept_ingest / accept_neardup)
  and the streaming form:
    -> make_signature_sink batches    (replay-safe log appends)
    -> neardup_stream_check           (match against the merged view)

Prints what each stage sees, including proof that batch 2 matches a
doc accepted in batch 1 THROUGH THE HISTORY, not by rescanning text.

    python3 tools/run_ingest_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_spark_streaming_pipeline_spark.engine import Engine  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine(sf_dir=sf_dir)
    spark = eng.spark
    work = tempfile.mkdtemp(prefix="ingest_demo_")
    try:
        # ---- one-time history builds
        eng.build_dedup_history(f"{work}/fp_history")
        eng.build_neardup_history(f"{work}/sig_history")
        print(f"histories built under {work}")

        # ---- batch 1: one doc copied verbatim from the corpus, one new
        corpus_text = eng.table("documents").filter(F.col("doc_id") == 7).first().text
        b1 = spark.createDataFrame(
            [(90_001, corpus_text), (90_002, "a genuinely new document about engines")],
            ["doc_id", "text"],
        )
        flags = {r.doc_id: r for r in eng.ingest_dedup(b1).collect()}
        print(
            f"batch1 exact: doc 90001 seen_in_history={flags[90_001].seen_in_history} "
            f"keep={flags[90_001].keep}; doc 90002 keep={flags[90_002].keep}"
        )
        pairs = eng.ingest_neardup(b1, min_est_jaccard=0.5).collect()
        print(f"batch1 near-dup candidates: {len(pairs)} "
              f"(history matches: {sum(1 for p in pairs if p.from_history)})")

        accepted = b1.filter(F.col("doc_id") == 90_002)
        eng.accept_ingest(eng.ingest_dedup(b1))
        eng.accept_neardup(accepted)

        # ---- batch 2: near-copy of the batch-1 accepted doc — must be
        # caught through the HISTORY signatures, text never re-read
        b2 = spark.createDataFrame(
            [(90_003, "a genuinely new document about engines indeed")],
            ["doc_id", "text"],
        )
        p2 = eng.ingest_neardup(b2, min_est_jaccard=0.3).collect()
        hist_hits = [p for p in p2 if p.from_history and p.matched_id == 90_002]
        print(f"batch2 matched accepted doc 90002 via history: {bool(hist_hits)} "
              f"(est_jaccard={hist_hits[0].est_jaccard if hist_hits else None})")

        # ---- streaming form: signature sink + stream check
        from kafka_spark_streaming_pipeline_spark.streaming.sinks import (
            make_signature_sink,
            neardup_stream_check,
            signature_view,
        )

        sink = make_signature_sink(f"{work}/stream_sigs")
        sink(b1, 0)
        sink(b2, 1)
        n = signature_view(spark, f"{work}/stream_sigs").count()
        probe = spark.createDataFrame(
            [(90_004, "a genuinely new document about engines too")], ["doc_id", "text"]
        )
        hits = neardup_stream_check(
            spark, probe, f"{work}/stream_sigs", min_est_jaccard=0.3
        ).count()
        print(f"streaming history: {n} signatures, probe matched {hits} docs")

        # ---- the full quality gate as one sink: persisted-LM
        # perplexity filter + fingerprint-history dedup, with
        # attribution
        from kafka_spark_streaming_pipeline_spark.operators.curation import (
            save_bigram_lm,
        )
        from kafka_spark_streaming_pipeline_spark.streaming.sinks import (
            gate_view,
            make_quality_gate_sink,
        )

        save_bigram_lm(eng.table("documents"), f"{work}/lm")
        # threshold = corpus p95 cross-entropy: everything more
        # surprising than 95% of the training corpus is rejected
        from kafka_spark_streaming_pipeline_spark.operators.curation import (
            score_with_bigram_lm,
        )

        max_ce = score_with_bigram_lm(eng.table("documents"), f"{work}/lm").agg(
            F.expr("percentile(cross_entropy, 0.95)")
        ).first()[0]
        gate = make_quality_gate_sink(
            f"{work}/acc", f"{work}/rej", f"{work}/lm", f"{work}/gate_fp",
            max_cross_entropy=max_ce,
        )
        # NOTE: this synthetic corpus is bag-of-words text, so it has
        # no adjacency structure for the perplexity filter to defend —
        # the high_perplexity path is exercised on fluent corpora in
        # tests/test_streaming.py.  Here the gate demonstrates its
        # other two rejections: unscoreable junk and duplicates.
        doc_text = eng.table("documents").first()["text"]
        gate(spark.createDataFrame(
            [(90_010, doc_text), (90_011, "singleword")],
            ["doc_id", "text"],
        ), 0)
        gate(spark.createDataFrame([(90_012, doc_text)], ["doc_id", "text"]), 1)
        acc_n = gate_view(spark, f"{work}/acc").count()
        rejs = {r.doc_id: r.reject_reason
                for r in gate_view(spark, f"{work}/rej").collect()}
        print(f"quality gate: accepted {acc_n}, rejected {rejs}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
