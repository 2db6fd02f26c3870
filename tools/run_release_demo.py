#!/usr/bin/env python3
"""Corpus-release workflow demo: the pre-publication gate served two
ways from one Engine handle.

  per ingest batch (streaming sinks, log-sized state):
    -> per-source datasheet partials   (make_datasheet_sink)
    -> k-anonymity count partials      (make_privacy_sink)
    -> classifier count partials       (make_classifier_sink)
  at any moment (views over the logs, never raw documents):
    -> release_audit_view              (continuous go/no-go report)
    -> classifier_model_view           (current NB model -> nb_score)
  at release time (batch gate over the full corpus):
    -> x164_release_audit              (datasheet + PII + k-anonymity
                                        + Bloom + sketch accuracy)

Prints the continuous report after each batch, the classifier's
prediction sanity on held-out docs, and the final batch gate with its
hard verdicts — the decision artifact a release manager reads.

    python3 tools/run_release_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_spark_streaming_pipeline_spark.engine import Engine  # noqa: E402
from kafka_spark_streaming_pipeline_spark.streaming.sinks import (  # noqa: E402
    classifier_model_view,
    make_classifier_sink,
    make_datasheet_sink,
    make_pii_sink,
    make_privacy_sink,
    release_audit_view,
)

QUASI = ["lang", "len_bucket"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine(sf_dir=sf_dir)
    spark = eng.spark
    work = tempfile.mkdtemp(prefix="release_demo_")
    try:
        docs = eng.table("documents")
        proj = docs.select(
            "lang",
            (F.col("n_chars") / F.lit(128.0)).cast("long").alias("len_bucket"),
            "source",
            "doc_id",
        )
        ds_sink = make_datasheet_sink(f"{work}/ds")
        priv_sink = make_privacy_sink(f"{work}/priv", QUASI, "source")
        clf_sink = make_classifier_sink(f"{work}/clf")
        pii_sink = make_pii_sink(f"{work}/pii")

        for b in (0, 1):
            half = docs.filter(F.col("doc_id") % 2 == b)
            ds_sink(half, b)
            priv_sink(proj.filter(F.col("doc_id") % 2 == b).drop("doc_id"), b)
            clf_sink(half.select("doc_id", "lang", "text"), b)
            pii_sink(half, b)
            report = release_audit_view(
                spark, f"{work}/ds", f"{work}/priv", QUASI, "source",
                pii_path=f"{work}/pii",
            )
            ka = {
                r["item"]: r
                for r in report.filter("family = 'k_anonymity'").collect()
            }
            n_sources = report.filter(
                "family = 'datasheet' AND metric = 'n_docs'"
            ).count()
            n_pii_bad = report.filter("family = 'pii' AND NOT ok").count()
            print(
                f"after batch {b}: datasheet covers {n_sources} sources; "
                f"PII residue in {n_pii_bad} sources; "
                "k-anonymity risky_row_frac: "
                + ", ".join(
                    f"{k}={ka[k]['value']} ({'ok' if ka[k]['ok'] else 'RISKY'})"
                    for k in sorted(ka)
                )
            )

        # the continuously-trained classifier scores held-out docs
        from kafka_spark_streaming_pipeline_spark.operators.classify import nb_score

        model = classifier_model_view(spark, f"{work}/clf")
        held = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "lang", "text")
        preds = nb_score(held, model)
        agree = (
            preds.join(held.select("doc_id", "lang"), "doc_id")
            .select((F.col("predicted") == F.col("lang")).cast("int").alias("hit"))
            .agg(F.avg("hit"))
            .first()[0]
        )
        print(f"streamed classifier agreement with labels on held-out docs: {agree:.2f}")

        # the full batch gate at release time
        rows = eng.release_audit().collect()
        hard = [r for r in rows if r["ok"] is not None]
        bad = [r for r in hard if not r["ok"]]
        print(f"batch release gate: {len(rows)} report rows, "
              f"{len(hard)} hard verdicts, {len(bad)} failing")
        for r in sorted(bad, key=lambda r: (r["family"], r["item"])):
            print(f"  FAIL {r['family']}/{r['item']} {r['metric']} = {r['value']}")
        print("release verdict:", "GO" if not bad else "NO-GO (see failures)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        eng.clear_caches()


if __name__ == "__main__":
    main()
