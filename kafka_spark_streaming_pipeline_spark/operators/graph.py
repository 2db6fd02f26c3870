"""Link-graph operators: PageRank-style authority scoring.

Web-corpus curation uses link authority as a quality prior (domain
PageRank / harmonic centrality over the interdomain graph is a
standard Common-Crawl-curation signal).  The reference app has no
graph surface; this joins connected_components (operators/dedup) as
the second iterative-algorithm family in the engine.

Scale design: every iteration is ONE join (edges x ranks, keyed on
src — co-partitioned with the out-degree join) + ONE aggregate keyed
on dst (map-side combinable sum).  The edge set is partitioned once
up front and reused across iterations (same localCheckpoint pattern
as connected_components); ranks are narrow (node, rank) rows.  A
FIXED iteration count keeps the computation deterministic and lets
the DuckDB oracle unroll the same iterations as CTEs; each
iteration's output is rounded (house +1e-9 nudge) so float drift
cannot accumulate across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    decimals: int = 6,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list -> (node,
    rank) after ``iterations`` steps from the uniform start.

    r'(v) = round((1-d)/N + d * sum_{u->v} r(u)/outdeg(u), decimals)

    No dangling-mass redistribution: intended for graphs where every
    node has out-edges (symmetric graphs like co-occurrence or mutual
    links trivially qualify); callers with true dangling nodes should
    add self-loops first.  N counts distinct sources (== all nodes
    under that precondition).  The per-iteration rounding is what
    makes the result engine-portable: both engines sum in arbitrary
    order, but agree once rounded, and agreement at iteration k feeds
    identical inputs to iteration k+1."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # partition once on the per-iteration join key; reuse across rounds
    e = e.repartition("src").localCheckpoint()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    n = deg.agg(F.count("*").alias("n_nodes"))
    ranks = (
        deg.crossJoin(F.broadcast(n))
        .select(
            F.col("src").alias("node"),
            F.round(F.lit(1.0) / F.col("n_nodes") + F.lit(1e-9), decimals).alias("rank"),
        )
    )
    with_deg = e.join(deg, "src")
    # the stable node universe: every node has out-edges (precondition),
    # so deg's keys are ALL nodes — a node with zero IN-degree must
    # still appear each iteration with mass 0, or its (1-d)/N base rank
    # and its outgoing contribution silently vanish from round 2 on
    nodes = deg.select(F.col("src").alias("node"))
    for _ in range(iterations):
        contribs = (
            with_deg.join(ranks, with_deg.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                F.round(
                    F.lit(1 - damping) / F.col("n_nodes")
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                    + F.lit(1e-9),
                    decimals,
                ).alias("rank"),
            )
        )
    return ranks


def triangle_stats(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    an undirected pair graph — the cohesion diagnostic for near-dup
    clusters: a component whose members form triangles is a genuine
    duplicate clique; a low-coefficient component is a CHAIN of
    borderline pairs, exactly where transitive merging (p14) risks
    gluing non-duplicates together.

    Algorithm: the degree-ORIENTED wedge join (each edge directed
    from its lower-(degree, id) endpoint), the standard distributed
    triangle counter — every triangle is generated exactly once from
    its lowest-degree corner, and per-source wedge work is bounded by
    out-degree^2 <= O(m) total (out-degree <= sqrt(2m)), immune to
    the hub blowup a naive a<b wedge join suffers on skewed graphs.
    Two shuffled joins on the (tiny, bucket-capped) pair set; the
    corpus itself is never touched.  c_v = 2T_v / (deg_v (deg_v - 1)),
    0 for degree-1 nodes."""
    from ..cache import tracked_persist

    # the canonical edge set feeds FOUR consumers (both degree
    # branches, the orientation join, the triangle-closing join) and
    # upstream of it sits the ENTIRE pair-generation pipeline (LSH
    # signatures at the x119 call site) — without the persist that
    # pipeline re-executes per consumer (a plan sweep measured 35
    # re-derived scans).  Edges and degrees are capped-pair-sized.
    e = tracked_persist(
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = tracked_persist(
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("degb"))
    with_deg = e.join(da, "a").join(db, "b")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    o = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    o2 = o.select(F.col("src").alias("src2"), F.col("dst").alias("dst2"))
    wedges = o.join(o2, F.col("src") == F.col("src2")).filter(
        F.col("dst") < F.col("dst2")
    )
    tri = tracked_persist(
        wedges.join(
            e,
            (F.least("dst", "dst2") == F.col("a"))
            & (F.greatest("dst", "dst2") == F.col("b")),
        ).select(
            F.col("src").alias("v"), F.col("dst").alias("u"), F.col("dst2").alias("w")
        )
    )
    tcount = (
        tri.select(F.col("v").alias("id"))
        .unionAll(tri.select(F.col("u").alias("id")))
        .unionAll(tri.select(F.col("w").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    degd = F.col("degree").cast("double")
    coef = F.when(
        F.col("degree") >= 2,
        F.lit(2.0) * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
        / (degd * (degd - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tcount, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            (F.round(coef + F.lit(1e-9), 6) + F.lit(0.0)).alias("clustering"),
        )
    )
