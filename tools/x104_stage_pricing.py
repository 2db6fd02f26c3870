#!/usr/bin/env python3
"""Re-price x104's three stages under conjunctive blocking + pointer
doubling (VERDICT r10 item 4).

The r8 stage breakdown committed in PLANS.md (keys ~0.8s |
pairs+verify ~2.1s | closure ~4.2s at sf0.1) predates BOTH
optimizations that changed the query's shape: conjunctive
rare-token-PAIR blocking (r10) and O(log diameter) pointer doubling
in the closure (r8, landed after that measurement).  t_big = 41s was
the scale record's most expensive point; this probe re-prices at
sf0.1 AND the amplified big point.

Stage timing (best-of-3, noop-write, the bench discipline) over a
PERSISTED record frame, so each stage price excludes input rebuild:

  keys    — rare_token_pair_keys(toks) alone
  pairs   — entity_pairs(...) (includes keys work; verify price =
            t_pairs - t_keys)
  closure — connected_components over the PERSISTED verified pairs
            (pure closure cost, plus the measured materialized-round
            count vs the graph's true diameter, computed exactly in
            the driver from the collected edge list — bounded:
            |verified pairs|, not |records|)

Writes X104_STAGES.json at the repo root; PLANS.md's x104 claim
carries the refreshed numbers.

Usage: python3 tools/x104_stage_pricing.py
"""
from __future__ import annotations

import collections
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from kafka_spark_streaming_pipeline_spark.cache import (  # noqa: E402
    session_gc,
    tracked_persist,
    unpersist_tracked,
)
from kafka_spark_streaming_pipeline_spark.catalog import load_table  # noqa: E402
from kafka_spark_streaming_pipeline_spark.operators import dedup  # noqa: E402
from kafka_spark_streaming_pipeline_spark.operators.linkage import (  # noqa: E402
    _mention_tokens,
    entity_pairs,
    rare_token_pair_keys,
)
from kafka_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402

MID = "/root/testdata/sf0.1"
BIG = os.path.join(REPO, ".scaledata", "sf1.0")
REPEATS = 3
MIN_JACCARD = 0.75  # the registry query's setting (extensions.py x104)


def _records(spark, sf_dir):
    """The x104 record set: first-8-word mentions + dirty variants —
    the registry builder's exact construction (extensions.py)."""
    docs = load_table(spark, sf_dir, "documents")
    w8 = F.slice(F.split(F.lower(F.col("text")), " "), 1, 8)
    base = docs.select(
        F.col("doc_id").alias("rec_id"), F.array_join(w8, " ").alias("mention")
    )
    drop_idx = F.col("doc_id") % 7 + 2
    variant = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("rec_id"),
        F.array_join(
            F.filter(w8, lambda x, i: (i + F.lit(1)) != drop_idx), " "
        ).alias("mention"),
    )
    return base.unionByName(variant)


def _noop_best(df_builder) -> float:
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        df_builder().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _diameter(edge_rows) -> tuple[int, int]:
    """Exact (diameter, n_components) of the undirected match graph
    via per-component double-BFS sweep (eccentricity of a BFS-farthest
    node == tree-diameter lower bound; exact here via full BFS from
    every component's farthest frontier — components are tiny)."""
    adj: dict[int, set[int]] = collections.defaultdict(set)
    for a, b in edge_rows:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(start):
        dist = {start: 0}
        q = collections.deque([start])
        far, fd = start, 0
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    if dist[v] > fd:
                        far, fd = v, dist[v]
                    q.append(v)
        return far, fd, set(dist)

    seen: set[int] = set()
    diam = 0
    n_comp = 0
    for node in adj:
        if node in seen:
            continue
        n_comp += 1
        far, _, comp = bfs(node)
        # BFS from the farthest node of an arbitrary BFS gives the
        # true diameter on trees and a tight bound on small graphs;
        # make it exact by sweeping every node of small components
        if len(comp) <= 256:
            best = 0
            for u in comp:
                _, d, _ = bfs(u)
                best = max(best, d)
            diam = max(diam, best)
        else:
            _, d, _ = bfs(far)
            diam = max(diam, d)
        seen |= comp
    return diam, n_comp


def price_point(spark, sf_dir: str) -> dict:
    records = tracked_persist(_records(spark, sf_dir))
    n_records = records.count()
    toks = tracked_persist(_mention_tokens(records, "rec_id", "mention"))
    toks.count()

    t_keys = _noop_best(lambda: rare_token_pair_keys(toks, top_k=3))
    t_pairs = _noop_best(
        lambda: entity_pairs(
            records, min_jaccard=MIN_JACCARD, conjunctive=True
        )
    )
    pairs = tracked_persist(
        entity_pairs(records, min_jaccard=MIN_JACCARD, conjunctive=True)
    )
    n_pairs = pairs.count()
    t_closure = _noop_best(
        lambda: dedup.connected_components(pairs, "id_a", "id_b")
    )
    rounds = dedup.CC_LAST_ROUNDS
    diam, n_comp = _diameter(
        [(r.id_a, r.id_b) for r in pairs.collect()]  # |pairs|-bounded
    )
    unpersist_tracked()
    session_gc(spark)
    return {
        "n_records": n_records,
        "n_verified_pairs": n_pairs,
        "t_keys_sec": t_keys,
        "t_pairs_and_verify_sec": t_pairs,
        "t_verify_delta_sec": round(t_pairs - t_keys, 3),
        "t_closure_sec": t_closure,
        "closure_rounds_materialized": rounds,
        "graph_diameter": diam,
        "n_components": n_comp,
    }


def main() -> None:
    spark = get_spark(app_name="x104_stage_pricing")
    spark.range(1).count()
    if not os.path.isdir(BIG):
        raise SystemExit(f"amplified data missing: {BIG} (run bench_scale)")

    out = {
        "metric": "x104_stage_pricing",
        "repeats": REPEATS,
        "min_jaccard": MIN_JACCARD,
        "blocking": "conjunctive rare-token-pair (top_k=3)",
        "points": {},
    }
    for label, sf_dir in (("mid_sf0.1", MID), ("big_10x", BIG)):
        out["points"][label] = price_point(spark, sf_dir)
        print(f"# {label}: {out['points'][label]}", file=sys.stderr)

    path = os.path.join(REPO, "X104_STAGES.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out["points"], separators=(",", ":")))


if __name__ == "__main__":
    main()
