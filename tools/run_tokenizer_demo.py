#!/usr/bin/env python3
"""Tokenizer workflow demo: the token-budget decision served two ways
from one Engine handle.

  per ingest batch (streaming sinks, vocabulary-sized state):
    -> word-frequency count partials   (make_wordfreq_sink)
    -> per-language fertility partials (make_fertility_sink)
  at any moment (views over the logs, never raw documents):
    -> unigram_model_view              (tokenizer retrained RIGHT NOW —
                                        bit-equal to batch x172)
    -> fertility_view                  (continuous x168 budget report)
  at decision time (batch gate over the full corpus):
    -> x176_tokenizer_audit            (compare + fertility + padding
                                        + truncation, one long form)

Prints the retrained model size and the top pieces after each batch,
an encode sanity line with the streamed model, and the final composed
audit — the decision artifact a token-budget owner reads.

    python3 tools/run_tokenizer_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_spark_streaming_pipeline_spark.engine import Engine  # noqa: E402
from kafka_spark_streaming_pipeline_spark.operators.text import (  # noqa: E402
    unigram_lm_encode,
)
from kafka_spark_streaming_pipeline_spark.streaming.sinks import (  # noqa: E402
    fertility_view,
    make_fertility_sink,
    make_wordfreq_sink,
    unigram_model_view,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine(sf_dir=sf_dir)
    spark = eng.spark
    work = tempfile.mkdtemp(prefix="tokenizer_demo_")
    try:
        docs = eng.table("documents")
        wf_sink = make_wordfreq_sink(f"{work}/wf")
        fert_sink = make_fertility_sink(f"{work}/fert")

        for b in (0, 1):
            half = docs.filter(F.col("doc_id") % 2 == b)
            wf_sink(half, b)
            fert_sink(half, b)
            model = unigram_model_view(spark, f"{work}/wf")
            pieces = model.orderBy(F.desc("contribution"), "piece").limit(3)
            top = ", ".join(
                f"{r['piece']}({r['cnt']})" for r in pieces.collect()
            )
            n_langs = fertility_view(spark, f"{work}/fert").count()
            print(
                f"after batch {b}: retrained vocab {model.count()} pieces "
                f"(top by contribution: {top}); fertility covers "
                f"{n_langs} languages"
            )

        enc = unigram_lm_encode(docs, unigram_model_view(spark, f"{work}/wf"))
        stats = enc.agg(
            F.sum("n_words").alias("w"),
            F.sum("n_pieces").alias("p"),
            F.sum("n_oov_words").alias("oov"),
        ).collect()[0]
        print(
            f"encode with streamed model: {stats['w']} words -> "
            f"{stats['p']} pieces ({stats['oov']} OOV) = "
            f"{stats['p'] / stats['w']:.4f} pieces/word"
        )

        print("\nbatch tokenizer-budget gate (x176):")
        for r in eng.tokenizer_audit().orderBy("family", "item", "metric").collect():
            print(
                f"  {r['family']:<10} {r['item']:<20} "
                f"{r['metric']:<16} {r['value']}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
