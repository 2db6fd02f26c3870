#!/usr/bin/env python3
"""End-to-end training-data curation demo: the full corpus pipeline on
one Engine handle, each stage a registered, oracle-verified operator.

  raw corpus
    -> Gopher quality rules           (x53: attributable keep flags)
    -> exact dedup                    (p11: fingerprint survivors)
    -> near-dup clusters              (p14: MinHash LSH + closure)
    -> semantic dedup                 (x51: SemDeDup over embeddings)
    -> perplexity filter              (x74: bigram-LM cross-entropy tail)
    -> eval decontamination           (x25: 5-gram overlap)
    -> quality-weighted sampling      (x58: RNG-free Bernoulli)
    -> training shards                (x52: deterministic order)

Prints the per-stage document yield — the funnel a pipeline operator
actually watches — plus a search sanity probe (BM25 + hybrid RRF) over
the surviving corpus.

    python3 tools/run_curation_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_spark_streaming_pipeline_spark.engine import Engine  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    eng = Engine(sf_dir=sf_dir)
    docs = eng.table("documents")
    n0 = docs.count()
    print(f"raw corpus: {n0} docs")

    # 1. rule-based quality filter
    keep_q = eng.quality_report().filter("keep").select("doc_id")
    n1 = keep_q.count()
    print(f"after quality rules: {n1} ({n1 / n0:.1%})")

    # 2. exact dedup (survivors only)
    exact = eng.query("p11_dedup_exact").filter("is_canonical").select("doc_id")
    survivors = keep_q.join(exact, "doc_id")
    n2 = survivors.count()
    print(f"after exact dedup: {n2} ({n2 / n0:.1%})")

    # 3. near-dup clusters: keep each cluster's canonical member
    kept_near = eng.query("p16_deduplicated_corpus").filter("kept").select("doc_id")
    survivors = survivors.join(kept_near, "doc_id")
    n3 = survivors.count()
    print(f"after near-dup clusters: {n3} ({n3 / n0:.1%})")

    # 4. semantic dedup: drop removed embeddings' docs
    removed = eng.semantic_dedup().select(F.col("removed_id").alias("doc_id"))
    survivors = survivors.join(removed, "doc_id", "left_anti")
    n4 = survivors.count()
    print(f"after semantic dedup: {n4} ({n4 / n0:.1%})")

    # 4b. perplexity filter: drop the high-cross-entropy tail (worst 5%)
    ppl = eng.perplexity_scores()
    cutoff = ppl.agg(
        F.expr("percentile(cross_entropy, 0.95)").alias("c")
    ).first()["c"]
    # drop only MEASURED high-CE docs; docs with no scorable bigram
    # are not silently removed (the streaming gate attributes those
    # as 'unscoreable' — here they just pass through)
    too_surprising = ppl.filter(F.col("cross_entropy") > cutoff).select("doc_id")
    survivors = survivors.join(too_surprising, "doc_id", "left_anti")
    n4b = survivors.count()
    print(f"after perplexity filter: {n4b} ({n4b / n0:.1%})")

    # 5. decontamination: drop eval-overlapping docs
    clean = eng.query("x25_decontaminate").filter(~F.col("contaminated")).select("doc_id")
    survivors = survivors.join(clean, "doc_id")
    n5 = survivors.count()
    print(f"after decontamination: {n5} ({n5 / n0:.1%})")

    # 6. quality-weighted sampling
    sampled = eng.weighted_sample(scale=0.9).filter("kept").select("doc_id")
    survivors = survivors.join(sampled, "doc_id")
    n6 = survivors.count()
    print(f"after weighted sampling: {n6} ({n6 / n0:.1%})")

    # 7. deterministic training shards over the survivors
    shards = (
        eng.shards(n_shards=4)
        .join(survivors, "doc_id")
        .groupBy("shard")
        .count()
        .orderBy("shard")
    )
    print("shard sizes:", {r["shard"]: r["count"] for r in shards.collect()})

    # search sanity probe over the corpus
    top = eng.search(["customer", "vector"], k=3).collect()
    hy = eng.hybrid_search(["customer", "vector", "merge", "stream"], k=3).collect()
    print("bm25 top-3:", [(r.doc_id, r.score) for r in top])
    print("hybrid top-3:", [(r.doc_id, r.rrf_score) for r in hy])

    # the same pipeline as ONE composed dataflow (x94: one corpus
    # scan, per-stage yields) with per-doc provenance (x102)
    print("\ncomposed one-scan funnel (x94):")
    for r in eng.curate().orderBy("stage").collect():
        print(
            f"  {r.stage:<16} in={r.docs_in:<6} removed={r.docs_removed:<5} "
            f"out={r.docs_out:<6} rate={r.removal_rate:<7} tokens={r.tokens_out}"
        )
    fates = eng.doc_fates().groupBy("fate").count().orderBy("fate").collect()
    print("per-doc fate breakdown (x102):", {r.fate: r["count"] for r in fates})


if __name__ == "__main__":
    main()
