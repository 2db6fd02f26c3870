"""Retrieval operators: inverted index construction and BM25 scoring.

A training-data pipeline needs retrieval both for curation (find all
documents containing a term, rank near-matches of an eval query for
decontamination review) and for building retrieval-augmented training
sets.  Reference parity: the reference app has no search surface at
all (spark_job/spark_streaming.py consumes a fixed stream), so these
operators are part of the training-data extension tier, not §2.

Scale design:
- ``inverted_index`` is ONE explode + ONE grouped aggregation — the
  classic map/combine build.  Posting lists are per-term arrays whose
  length is the term's document frequency; the ``max_postings`` cap
  bounds the array for stopword-like terms EXPLICITLY (df stays exact,
  the stored list truncates, ``postings_truncated`` flags it) so one
  hot term cannot blow an executor.  The output schema is
  parameter-independent: ``postings_truncated`` is always present
  (constant false when uncapped).
- ``bm25_topk`` never explodes the corpus and never joins it: per-doc
  term frequencies for the (tiny) query-term set are computed as pure
  array expressions in ONE projection that drops the text column, and
  that narrow frame is persisted so the corpus parquet is scanned
  exactly once per query.  N, avgdl and EVERY per-term document
  frequency come from a single scalar-row aggregate over the cached
  frame (no per-term groupBy shuffle), broadcast to the scoring side;
  only docs matching ≥1 query term ever reach a shuffle.  The final
  top-k is ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
  (per-partition top-k + tiny driver merge), never a global
  single-partition sort of every matching doc.
- ``min_token_len`` guards both operators against stopword-like terms
  ("a", "the"): sub-length terms are dropped from the index and from
  the query before any work happens.

Everything is built-in column expressions — no Python UDFs — and is
mirrored 1:1 by DuckDB oracles in plans/extensions.py
(p17_inverted_index / p18_bm25_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .text import tokens


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 3,
    max_postings: int | None = None,
) -> DataFrame:
    """(term, df, postings, postings_truncated) with postings the
    sorted doc-id list.

    ``df`` counts ALL documents containing the term even when
    ``max_postings`` truncates the stored list (slice happens after the
    full aggregation, which is just an array op on the reduced row)."""
    term_docs = (
        docs.select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
        )
        .filter(F.length("term") >= min_token_len)
    )
    idx = term_docs.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_sort(F.collect_list(id_col)).alias("postings"),
    )
    if max_postings is not None:
        return idx.select(
            "term",
            "df",
            F.slice("postings", 1, max_postings).alias("postings"),
            (F.col("df") > max_postings).alias("postings_truncated"),
        )
    return idx.withColumn("postings_truncated", F.lit(False))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    min_token_len: int = 3,
) -> DataFrame:
    """Top-k documents for ``query_terms`` under BM25.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term contribution
    uses the standard length normalization (dl / avgdl).  Query terms
    are lowercased, de-duplicated (bag-of-words: each unique term
    scores once), and filtered by ``min_token_len`` so a stopword-like
    term cannot match most of the corpus.  The score is rounded BEFORE
    ranking (with the house +1e-9 nudge) so tie order is
    engine-independent; final tiebreak is doc id."""
    terms = [t for t in dict.fromkeys(t.lower() for t in query_terms)
             if len(t) >= min_token_len]
    if not terms:
        return (
            docs.select(F.col(id_col)).limit(0)
            .withColumn("score", F.lit(0.0))
            .withColumn("n_terms_matched", F.lit(0).cast("long"))
            .withColumn("rank", F.lit(0))
        )

    # ONE projection over ONE corpus scan computes everything any
    # consumer needs and drops the text column: (doc_id, dl,
    # tfs=[(term, tf>0)...]).  The frame is persisted, so the global
    # (N, avgdl) aggregate, the per-term document-frequency aggregate,
    # and the scoring all read the cached narrow rows — the documents
    # table itself is scanned exactly once (at cache population),
    # where the previous shape paid three full corpus reads per query.
    # The cache is a few small columns per doc (no text) and is
    # LRU-evicted under memory pressure.  Lifecycle note: the entry is
    # NOT unpersisted here — the returned frame is lazy and still
    # reads it — and the cache key depends on the query's term set, so
    # it is not reused across different queries; a long-lived service
    # issuing many distinct queries on one session should call
    # spark.catalog.clearCache() periodically (the entries hold no
    # corpus text, only the narrow stats rows).
    toks = tokens(F.col(text_col))

    def _match(term: str):
        # N.B. a 2-arg lambda would be interpreted by F.filter as
        # (element, index) — close over the term instead.
        return lambda x: x == F.lit(term)

    tf_structs = F.array(*[
        F.struct(
            F.lit(t).alias("term"),
            F.size(F.filter(toks, _match(t))).cast("long").alias("tf"),
        )
        for t in terms
    ])
    from ..cache import tracked_persist

    narrow = tracked_persist(docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        F.filter(tf_structs, lambda s: s["tf"] > 0).alias("tfs"),
    ))

    # N, avgdl AND every per-term document frequency in ONE scalar-row
    # aggregate over the cached frame (ALL docs count toward N/avgdl,
    # matched or not; df_i counts docs whose tfs contains term i).
    # Map-side partial aggregation reduces each partition to one row,
    # so the "shuffle" is a single-row-per-partition collect — there
    # is no per-term groupBy exchange at all.
    def _has_term(term: str):
        # closure, not a default arg: F.exists requires a 1-arg lambda
        return lambda s: s["term"] == F.lit(term)

    stats = narrow.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.exists("tfs", _has_term(t)), 1).otherwise(0))
            .cast("long").alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    # Docs with no matching term are dropped before anything shuffles.
    tf = (
        narrow.select(F.col(id_col), "dl", F.explode("tfs").alias("t"))
        .select(id_col, "dl", F.col("t.term").alias("term"), F.col("t.tf").alias("tf"))
    )

    # term -> df lookup against the broadcast scalar row
    df_map = F.map_from_arrays(
        F.array(*[F.lit(t) for t in terms]),
        F.array(*[F.col(f"df_{i}") for i in range(len(terms))]),
    )
    dfv = F.element_at(df_map, F.col("term"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - dfv + F.lit(0.5)) / (dfv + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1) / norm

    scored = (
        tf.crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(contrib) + F.lit(1e-9), 6).alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    # TakeOrderedAndProject: per-partition top-k, tiny driver-side
    # merge.  The rank stamp afterwards windows over ≤ topk rows.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(topk)
    w = W.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "n_terms_matched", "rank"
    )


def write_search_index(
    index: DataFrame, dest: str, n_buckets: int = 64
) -> None:
    """Persist an inverted index partitioned by a hash bucket of the
    term, so a term lookup reads 1/n_buckets of the files (partition
    pruning at the listing level — the same mechanism as the persisted
    IVF postings).  ``index`` is inverted_index() output or
    streaming.sinks.index_view()."""
    (
        index.withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        .write.partitionBy("term_bucket")
        .mode("overwrite")
        .parquet(dest)
    )


def lookup_terms(spark, dest: str, terms: list[str], n_buckets: int = 64) -> DataFrame:
    """Read postings for ``terms`` from a write_search_index() layout.

    The wanted buckets are computed with the SAME hash Spark wrote
    (one tiny local DataFrame evaluates xxhash64 over the term
    literals — no corpus touch), then applied as a literal IN filter
    on the partition column: only those bucket directories are listed
    and scanned, and the residual term filter pushes into the parquet
    scans of that 1/n_buckets slice.  An empty term list returns an
    empty result with the index schema (no buckets touched)."""
    if not terms:
        return (
            spark.read.parquet(dest).filter(F.lit(False)).drop("term_bucket")
        )
    term_rows = spark.createDataFrame([(t,) for t in terms], ["term"])
    buckets = sorted(
        r["b"]
        for r in term_rows.select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b")
        ).distinct().collect()
    )
    return (
        spark.read.parquet(dest)
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .drop("term_bucket")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankings into one hybrid ranking.

    Each input must carry (``id_col``, ``rank``) — e.g. BM25 top-n and
    dense-cosine top-n — and contributes 1/(k+rank) per appearance
    (Cormack & Clarke's RRF, k=60 by convention).  Scale shape: the
    inputs are already top-n (tiny), so the union + one grouped
    aggregate + TakeOrderedAndProject never touches the corpus; the
    only exchange is over at most N*n rows.  ``rrf_score`` is rounded
    (house +1e-9 nudge) before ranking and ties break on id, so the
    order is engine-independent.  ``n_sources`` counts how many input
    rankings contained the id (fusion provenance)."""
    parts = [r.select(F.col(id_col), F.col("rank").cast("long")) for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))) + F.lit(1e-9), 6
        ).alias("rrf_score"),
        F.count("*").cast("long").alias("n_sources"),
    )
    top = fused.orderBy(F.desc("rrf_score"), F.col(id_col)).limit(topk)
    w = W.orderBy(F.desc("rrf_score"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rrf_score", "n_sources", "rank"
    )


def rerank_blend(
    candidates: DataFrame,
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    w_retrieval: float = 0.7,
    topk: int = 10,
) -> DataFrame:
    """Second-stage reranker over first-stage ``candidates``
    (id, score, rank — e.g. BM25 top-n): blend the min-max-normalized
    retrieval score with the query↔document token Jaccard, then re-rank.
    The candidate set is top-n (tiny), so the text join broadcasts the
    candidates against the corpus scan and every downstream op touches
    n rows — the standard retrieve-then-rerank shape where stage 2 can
    afford per-candidate features stage 1 cannot.

    All arithmetic is column expressions (oracle-mirrorable); for
    model-based scorers see ``rerank_with_model`` (same contract, the
    scoring hop runs in Arrow batches)."""
    terms = sorted(set(t.lower() for t in query_terms))
    with_text = docs.select(F.col(id_col), F.col(text_col)).join(
        F.broadcast(candidates), id_col
    )
    toks = F.array_distinct(tokens(F.col(text_col)))
    qarr = F.array(*[F.lit(t) for t in terms])
    jacc = (
        F.size(F.array_intersect(toks, qarr))
        / F.size(F.array_union(toks, qarr))
    )
    bounds = candidates.agg(
        F.min("score").alias("__lo"), F.max("score").alias("__hi")
    )
    norm = F.when(
        F.col("__hi") > F.col("__lo"),
        (F.col("score") - F.col("__lo")) / (F.col("__hi") - F.col("__lo")),
    ).otherwise(F.lit(1.0))
    blended = (
        with_text.crossJoin(F.broadcast(bounds))
        .select(
            F.col(id_col),
            F.col("score").alias("retrieval_score"),
            F.round(
                F.lit(w_retrieval) * norm
                + F.lit(1.0 - w_retrieval) * jacc
                + F.lit(1e-9),
                6,
            ).alias("rerank_score"),
        )
    )
    top = blended.orderBy(F.desc("rerank_score"), F.col(id_col)).limit(topk)
    w = W.orderBy(F.desc("rerank_score"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "retrieval_score", "rerank_score", "rank"
    )


def rerank_with_model(
    candidates_with_text: DataFrame,
    model_fn=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 10,
) -> DataFrame:
    """Model-based second-stage reranker: score each candidate with a
    Python model over Arrow batches (``mapInPandas``) — the hop a
    cross-encoder / learned reranker runs in.  The candidate set is
    already top-n, so the Python boundary sees n rows per query, never
    the corpus; this is the ONE place in the retrieval stack where
    Python-side scoring is the right trade (the model can't be a
    column expression).

    ``model_fn(pdf) -> iterable of float`` scores a pandas frame with
    [id_col, text_col] columns.  The default is a deterministic stub
    (md5-derived, no model weights in this environment — same honest
    boundary as operators.multimodal): real deployments pass their own
    ``model_fn`` loading the actual cross-encoder per executor."""
    import pandas as pd

    if model_fn is None:
        def model_fn(pdf):
            import hashlib

            return [
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
                for t in pdf[text_col]
            ]

    # derive the id field's type from the input — string/long/etc. ids
    # all work, matching the rest of the retrieval surface
    id_type = candidates_with_text.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, model_score double"

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "model_score": [round(s + 1e-9, 6) for s in model_fn(pdf)],
                }
            )

    scored = candidates_with_text.select(id_col, text_col).mapInPandas(
        score_batches, schema=out_schema
    )
    top = scored.orderBy(F.desc("model_score"), F.col(id_col)).limit(topk)
    w = W.orderBy(F.desc("model_score"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def positional_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 1,
) -> DataFrame:
    """Positional inverted index: (term, doc_id, positions) with
    1-based token positions, sorted.  Same build shape as
    ``inverted_index`` (one posexplode + one grouped agg) with the
    position list kept — the structure phrase and proximity queries
    need.  Unlike the df index, positions are per (term, doc) so no
    single row aggregates a stopword's whole corpus: row width is
    bounded by one document's length."""
    toks = tokens(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos0", "term")
    ).filter(F.length("term") >= min_token_len)
    return (
        exploded.groupBy("term", id_col)
        .agg(F.array_sort(F.collect_list(F.col("pos0") + 1)).alias("positions"))
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 10,
) -> DataFrame:
    """Exact phrase query over the positional index: documents where
    ``phrase``'s terms occur at consecutive positions, ranked by
    occurrence count.  The positional postings of each phrase term are
    narrow (doc, positions) frames joined on doc_id — len(phrase)-1
    equi joins over only the docs containing EVERY term (the rarest
    term bounds the join size) — and adjacency is an array-HOF
    intersection, no re-scan of text.  Ranking is
    orderBy().limit(topk) (TakeOrderedAndProject)."""
    terms = [t.lower() for t in phrase]
    if len(terms) < 2:
        raise ValueError("phrase_search needs >= 2 terms")
    # restrict the postings to the phrase's terms BEFORE aggregating and
    # persist the (tiny) result: the corpus is scanned ONCE to populate
    # it, and the per-term branches below read the cache — the same
    # narrow-frame pattern as bm25_topk.  With a PERSISTED positional
    # index the restriction becomes a pruned index read instead.
    toks = tokens(F.col(text_col))
    from ..cache import tracked_persist

    post = tracked_persist(
        docs.select(F.col(id_col), F.posexplode(toks).alias("pos0", "term"))
        .filter(F.col("term").isin(terms))
        .groupBy("term", id_col)
        .agg(F.array_sort(F.collect_list(F.col("pos0") + 1)).alias("positions"))
    )
    base = post.filter(F.col("term") == terms[0]).select(
        F.col(id_col), F.col("positions").alias("pos_0")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = post.filter(F.col("term") == t).select(
            F.col(id_col), F.col("positions").alias(f"pos_{i}")
        )
        base = base.join(nxt, id_col)
    # a phrase occurrence starts at p iff every term i sits at p+i.
    # closure factory, NOT a default-arg lambda: pyspark treats a
    # 2-parameter lambda as (element, index)
    def _adjacent(i: int):
        return lambda p: F.exists(F.col(f"pos_{i}"), lambda q: q == p + F.lit(i))

    starts = F.col("pos_0")
    for i in range(1, len(terms)):
        starts = F.filter(starts, _adjacent(i))
    scored = base.select(
        F.col(id_col), F.size(starts).cast("long").alias("n_occurrences")
    ).filter(F.col("n_occurrences") > 0)
    top = scored.orderBy(F.desc("n_occurrences"), F.col(id_col)).limit(topk)
    w = W.orderBy(F.desc("n_occurrences"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def phrase_search_indexed(
    spark,
    dest: str,
    phrase: list[str],
    n_buckets: int = 64,
    id_col: str = "doc_id",
    topk: int = 10,
) -> DataFrame:
    """Phrase query against a PERSISTED positional index — the 100 TB
    path: ``write_search_index(positional_postings(docs), dest)``
    amortizes the corpus scan once, and each phrase query reads only
    the term-hash buckets its words live in (lookup_terms' pruned
    listing), never the corpus.  Adjacency/ranking semantics are
    identical to ``phrase_search`` (parity-tested)."""
    terms = [t.lower() for t in phrase]
    if len(terms) < 2:
        raise ValueError("phrase_search_indexed needs >= 2 terms")
    post = lookup_terms(spark, dest, terms, n_buckets)
    base = post.filter(F.col("term") == terms[0]).select(
        F.col(id_col), F.col("positions").alias("pos_0")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = post.filter(F.col("term") == t).select(
            F.col(id_col), F.col("positions").alias(f"pos_{i}")
        )
        base = base.join(nxt, id_col)

    def _adjacent(i: int):
        return lambda p: F.exists(F.col(f"pos_{i}"), lambda q: q == p + F.lit(i))

    starts = F.col("pos_0")
    for i in range(1, len(terms)):
        starts = F.filter(starts, _adjacent(i))
    scored = base.select(
        F.col(id_col), F.size(starts).cast("long").alias("n_occurrences")
    ).filter(F.col("n_occurrences") > 0)
    top = scored.orderBy(F.desc("n_occurrences"), F.col(id_col)).limit(topk)
    w = W.orderBy(F.desc("n_occurrences"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def mmr_rerank(
    shortlist: DataFrame,
    emb: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "doc_id",
    rel_col: str = "score",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversification of a retrieval
    shortlist: iteratively pick argmax(lam*rel - mu*max_sim_to_picked)
    with (score desc, id asc) tie order — the standard redundancy
    killer between first-stage retrieval and the final result page.

    Scale shape: MMR is inherently sequential in k, so it must NEVER
    see the corpus — only the bounded shortlist (top-n of a ranked
    stage, n ≈ tens).  The embedding join and the n² rounded-cosine
    similarity matrix run in Spark (broadcast self-pair of a frame
    whose size is the constant n); the selection loop then walks the
    collected n-row / n²-edge tables driver-side — the same bounded-
    collect discipline as the BPE merge table.  ``lam`` and ``mu`` are
    separate parameters (not lam/1-lam) so both engines combine
    IDENTICAL double literals; similarities enter the loop 4-dp
    rounded, relevance 6-dp (from BM25), making every comparison
    engine-exact.

    Returns (pick_rank, id, rel_score, max_sim_prior): the order
    picked, each pick's first-stage relevance, and its similarity to
    the already-picked set at pick time (0.0 for the first pick)."""
    from .similarity import _as_double, cosine

    sv = shortlist.select(F.col(id_col), F.col(rel_col).alias("__rel")).join(
        emb.select(
            F.col(emb_id_col).alias(id_col), _as_double(F.col(vec_col)).alias("__v")
        ),
        id_col,
    )
    a = sv.select(F.col(id_col).alias("__da"), F.col("__v").alias("__va"))
    b = sv.select(F.col(id_col).alias("__db"), F.col("__v").alias("__vb"))
    sims_df = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("__da") != F.col("__db"))
        .select(
            "__da",
            "__db",
            F.round(
                cosine(F.col("__va"), F.col("__vb")) + F.lit(1e-9), 4
            ).alias("__sim"),
        )
    )
    rel = {r[id_col]: float(r["__rel"]) for r in sv.select(id_col, "__rel").collect()}
    sim = {(r["__da"], r["__db"]): float(r["__sim"]) for r in sims_df.collect()}

    remaining = set(rel)
    chosen: list = []
    ms = {c: 0.0 for c in remaining}  # running max-sim to the picked set
    picked_rows = []
    while remaining and len(picked_rows) < k:
        nxt = min(remaining, key=lambda c: (-(lam * rel[c] - mu * ms[c]), c))
        picked_rows.append((len(picked_rows) + 1, nxt, rel[nxt], ms[nxt]))
        remaining.discard(nxt)
        for c in remaining:
            s = sim.get((c, nxt), 0.0)
            if s > ms[c]:
                ms[c] = s
        chosen.append(nxt)
    spark = shortlist.sparkSession
    return spark.createDataFrame(
        picked_rows,
        f"pick_rank INT, {id_col} BIGINT, rel_score DOUBLE, max_sim_prior DOUBLE",
    )


def prf_search(
    docs: DataFrame,
    query_terms: list[str],
    topk: int = 10,
    fb_k: int = 5,
    n_expand: int = 3,
    min_expand_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-lite): run
    BM25, treat the top ``fb_k`` docs as relevant, mine their best
    ``n_expand`` terms by tf x ln(N/df) (corpus df, so boilerplate
    that is frequent everywhere scores low), and re-run BM25 with the
    expanded term set — the classic recall fix for vocabulary
    mismatch between query and corpus.

    Candidates exclude the seed terms, stopwords, and terms shorter
    than ``min_expand_len``; selection scores are trunc-quantized to
    BIGINT micro-units so the (score desc, term asc) cut is
    engine-exact.  Driver state is bounded: fb_k ids + n_expand terms
    (the same contract as the term-bucket literals in lookup_terms).
    Scale: stage 1 is the persisted-narrow BM25; candidate mining
    explodes only fb_k docs; the corpus df aggregate joins the tiny
    candidate vocabulary.  Output adds ``expanded_terms`` (sorted
    CSV) for auditability."""
    from .text import STOPWORDS, tokens

    fb = bm25_topk(docs, query_terms, text_col, id_col, topk=fb_k)
    fb_ids = [r[id_col] for r in fb.select(id_col).collect()]
    seed = {t.lower() for t in query_terms}
    if not fb_ids:
        out = bm25_topk(docs, query_terms, text_col, id_col, topk=topk)
        return out.withColumn("expanded_terms", F.lit(""))

    cand = (
        docs.filter(F.col(id_col).isin(fb_ids))
        .select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(
            (F.length("term") >= min_expand_len)
            & ~F.col("term").isin(*sorted(seed))
            & ~F.col("term").isin(*STOPWORDS)
        )
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("fb_tf"))
    )
    n_docs = docs.count()
    dfreq = (
        docs.select(F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"))
        .join(F.broadcast(cand.select("term")), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    scored = cand.join(dfreq, "term").select(
        "term",
        (
            F.col("fb_tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("sq"),
    )
    expansion = [
        r["term"]
        for r in scored.orderBy(F.desc("sq"), "term").limit(n_expand).collect()
    ]
    out = bm25_topk(
        docs, sorted(seed) + expansion, text_col, id_col, topk=topk
    )
    return out.withColumn(
        "expanded_terms", F.lit(",".join(sorted(expansion)))
    )


def retrieval_eval(
    docs: DataFrame,
    n_queries: int = 20,
    topk: int = 10,
    n_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    rel_col: str = "source",
) -> DataFrame:
    """Retrieval-quality eval harness: MRR, precision@k and nDCG@k of
    the BM25 ranker (p18's scoring) over a deterministic query set —
    the missing measurement next to the search operators themselves
    (p17/p18/x50/x54 build rankers; this says how good they are before
    one is trusted for retrieval-augmented curation).

    Protocol (self-supervised, no human labels): each of the first
    ``n_queries`` documents becomes a query made of its ``n_terms``
    RAREST tokens (min document frequency — max-IDF terms, df >= 2 so
    every term matches at least one other document, token-asc
    tiebreak); a retrieved document is RELEVANT iff it shares the
    query document's ``rel_col`` (the source acts as a topic label);
    the query document itself is excluded from its result list.

    Scale shape: ONE corpus scan into a persisted (doc, term, tf) +
    doc-length frame (bm25_topk discipline); document frequency and
    the global (N, avgdl) run on that frame; the query side is
    |Q| x n_terms rows, broadcast into the postings join, so scoring
    touches only postings of query terms.  Scores are rounded before
    ranking (house tie discipline), tiebreak doc id.  Output: one row
    per query — EVERY query appears (zero metrics, n_retrieved 0, when
    its terms match no other document; NULL ndcg when n_rel_corpus ==
    0, i.e. the query doc's source is unique and the query is
    unanswerable — dropping or zeroing those rows would skew the
    aggregate MRR/nDCG).

    Implementation: the corpus reduces to the (d, rel, dl, term, tf)
    postings frame in one scan (``eval_tf_frame``), then delegates to
    ``retrieval_eval_from_tf`` — the same entry point the streaming
    twin's maintained postings store feeds (streaming/sinks.py
    make_retrieval_eval_sink), so the continuous view is bit-equal to
    this operator by construction."""
    return retrieval_eval_from_tf(
        eval_tf_frame(docs, id_col, text_col, rel_col),
        n_queries=n_queries, topk=topk, n_terms=n_terms, k1=k1, b=b,
    )


def eval_tf_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rel_col: str = "source",
) -> DataFrame:
    """(d, rel, dl, term, tf): the tf-grade postings frame the eval
    harness scores against — per-document facts, so per-batch partials
    of a streamed corpus union to exactly the batch frame (each doc
    arrives in one batch; no cross-batch merging needed)."""
    toks = tokens(F.col(text_col))
    return (
        docs.select(
            F.col(id_col).alias("d"),
            F.col(rel_col).alias("rel"),
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("d", "rel", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def retrieval_eval_from_tf(
    tf_raw: DataFrame,
    n_queries: int = 20,
    topk: int = 10,
    n_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``retrieval_eval`` over a pre-built (d, rel, dl, term, tf)
    postings frame — the shared core of the batch operator and the
    streaming view (whose maintained store is exactly this frame).
    The frame is persisted here: every downstream branch (stats, df,
    query mining, scoring, ideal-DCG) reads it."""
    from pyspark.sql import Window as W

    from ..cache import tracked_persist

    tf = tracked_persist(tf_raw)
    stats = tf.groupBy("d").agg(F.first("dl").alias("dl")).agg(
        F.count("*").cast("long").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    # query construction: rarest n_terms per query doc (df >= 2)
    qw = W.partitionBy("qid").orderBy(F.col("df").asc(), F.col("term").asc())
    qterms = (
        tf.filter(F.col("d") < n_queries)
        .filter(F.length("term") >= 3)
        .select(F.col("d").alias("qid"), "term")
        .join(dfreq.filter(F.col("df") >= 2), "term")
        .withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= n_terms)
        .select("qid", "term", "df")
    )
    # derived from the cached postings frame — no extra corpus scan
    qmeta = (
        tf.filter(F.col("d") < n_queries)
        .groupBy(F.col("d").alias("qid"))
        .agg(F.first("rel").alias("q_rel"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("d") != F.col("qid"))
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "d", "rel")
        .agg(
            F.round(
                F.sum(
                    F.log(
                        F.lit(1.0)
                        + (
                            F.col("n_docs").cast("double")
                            - F.col("df")
                            + F.lit(0.5)
                        )
                        / (F.col("df").cast("double") + F.lit(0.5))
                    )
                    * F.col("tf").cast("double")
                    * F.lit(k1 + 1.0)
                    / (
                        F.col("tf").cast("double")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
                        )
                    )
                )
                + F.lit(1e-9),
                6,
            ).alias("score")
        )
    )
    rw = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("d").asc())
    top = (
        scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= topk)
        .join(F.broadcast(qmeta), "qid")
        .withColumn("is_rel", (F.col("rel") == F.col("q_rel")).cast("long"))
    )
    ln2 = F.lit(0.6931471805599453)
    per_q = top.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_retrieved"),
        F.sum("is_rel").cast("long").alias("n_rel_at_k"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("first_rel_rank"),
        F.sum(
            F.col("is_rel").cast("double")
            / (F.log(F.col("rank").cast("double") + F.lit(1.0)) / ln2)
        ).alias("dcg_raw"),
    )
    # ideal DCG: R = relevant docs in the corpus (same rel group, self
    # excluded), capped at topk; a closed-form explode over 1..cap
    rel_counts = (
        tf.groupBy("d")
        .agg(F.first("rel").alias("q_rel"))
        .groupBy("q_rel")
        .agg((F.count("*") - F.lit(1)).cast("long").alias("n_rel_corpus"))
    )
    # anchored on qmeta so EVERY query appears (a query whose rare
    # terms match no other document still reports a zero-metric row;
    # dropping it would silently inflate aggregate MRR/nDCG).  The
    # sequence still runs over >= 1 position so idcg_raw is non-NULL,
    # but n_rel_corpus == 0 (the query doc's source is unique: the
    # query is UNANSWERABLE) reports NULL ndcg, not 0.
    ideal = (
        qmeta.join(F.broadcast(rel_counts), "q_rel")
        .select(
            "qid",
            "n_rel_corpus",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.least(F.col("n_rel_corpus"), F.lit(topk)), F.lit(1)
                    ),
                )
            ).alias("i"),
        )
        .groupBy("qid", "n_rel_corpus")
        .agg(
            F.sum(
                F.lit(1.0) / (F.log(F.col("i").cast("double") + F.lit(1.0)) / ln2)
            ).alias("idcg_raw")
        )
    )
    out = ideal.join(F.broadcast(per_q), "qid", "left").select(
        "qid",
        "n_rel_corpus",
        F.coalesce("n_retrieved", F.lit(0)).cast("long").alias("n_retrieved"),
        F.coalesce("n_rel_at_k", F.lit(0)).cast("long").alias("n_rel_at_k"),
        (
            F.round(
                F.coalesce("n_rel_at_k", F.lit(0)).cast("double")
                / F.lit(float(topk))
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("p_at_k"),
        (
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("first_rel_rank").cast("double"), F.lit(0.0)
                )
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("mrr"),
        F.when(
            F.col("n_rel_corpus") > 0,
            F.round(
                F.coalesce(F.col("dcg_raw"), F.lit(0.0)) / F.col("idcg_raw")
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0),
        ).alias("ndcg_at_k"),
    )
    return out
