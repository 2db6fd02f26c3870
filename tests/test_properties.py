"""Property-based tests (hypothesis): distributed operators vs
reference implementations on randomized inputs.  Example counts are
small — each example runs real Spark jobs."""

from __future__ import annotations

import datetime as dt
import hashlib

import pandas as pd
from hypothesis import given, settings, strategies as st

from kafka_spark_streaming_pipeline_spark.operators.joins import asof_join
from kafka_spark_streaming_pipeline_spark.operators.text import rolling_fingerprint

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


@st.composite
def asof_case(draw):
    keys = ["a", "b"]
    left = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 50)),
            min_size=1, max_size=8, unique=True,
        )
    )
    right = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 50), st.integers(0, 99)),
            min_size=0, max_size=8,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    return left, right


@settings(max_examples=12, deadline=None)
@given(asof_case())
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    lpdf = pd.DataFrame(
        [(k, BASE + dt.timedelta(seconds=s)) for k, s in left_rows],
        columns=["k", "lts"],
    ).sort_values("lts")
    rpdf = pd.DataFrame(
        [(k, BASE + dt.timedelta(seconds=s), v) for k, s, v in right_rows],
        columns=["k", "rts", "v"],
    ).sort_values("rts")

    if len(rpdf):
        expected = pd.merge_asof(
            lpdf, rpdf, left_on="lts", right_on="rts", by="k", direction="backward"
        )
        exp = {
            (r.k, r.lts.isoformat()): (None if pd.isna(r.v) else int(r.v))
            for r in expected.itertuples()
        }
    else:  # merge_asof rejects an empty (object-dtype) right frame
        exp = {(r.k, r.lts.isoformat()): None for r in lpdf.itertuples()}

    ldf = spark.createDataFrame(lpdf, "k string, lts timestamp")
    rdf = (
        spark.createDataFrame(rpdf, "k string, rts timestamp, v long")
        if len(rpdf)
        else spark.createDataFrame([], "k string, rts timestamp, v long")
    )
    got = {
        (r.k, r.lts.isoformat()): r.v_asof
        for r in asof_join(ldf, rdf, ["k"], "lts", "rts").collect()
    }
    assert got == exp


def _py_rolling_fp(text: str) -> int:
    acc = 0
    for tok in text.lower().split(" "):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 2147483647
        acc = (acc * 31 + h) % 2147483647
    return acc


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdefg h", min_size=1, max_size=30).map(str.strip).filter(bool),
        min_size=1, max_size=5,
    )
)
def test_rolling_fingerprint_matches_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.doc_id: r.fp
        for r in df.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert got == {i: _py_rolling_fp(t) for i, t in enumerate(texts)}


@st.composite
def packing_case(draw):
    # (shard, doc_id, n_tokens) with unique ids per shard
    n = draw(st.integers(1, 12))
    shards = draw(st.lists(st.sampled_from(["s0", "s1"]), min_size=n, max_size=n))
    toks = draw(st.lists(st.integers(1, 300), min_size=n, max_size=n))
    return [(shards[i], i, toks[i]) for i in range(n)]


@settings(max_examples=10, deadline=None)
@given(packing_case(), st.sampled_from([128, 512]))
def test_pack_sequences_matches_sequential_reference(spark, rows, budget):
    from kafka_spark_streaming_pipeline_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(s, i, " ".join(["w"] * t)) for s, i, t in rows],
        ["source", "doc_id", "text"],
    )
    got = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["n_tokens"])
        for r in pack_sequences(docs, budget=budget).collect()
    }
    # sequential reference: walk each shard in id order, binning by the
    # running total BEFORE each doc
    expect: dict[tuple, list] = {}
    for shard in sorted({s for s, _, _ in rows}):
        cum = 0
        for s, i, t in sorted(rows):
            if s != shard:
                continue
            b = cum // budget
            e = expect.setdefault((shard, b), [0, 0])
            e[0] += 1
            e[1] += t
            cum += t
    assert got == {k: tuple(v) for k, v in expect.items()}


@settings(max_examples=8, deadline=None)
@given(st.lists(st.sampled_from(["en", "de", "fr"]), min_size=1, max_size=30),
       st.sampled_from([0.25, 0.5, 1.0]))
def test_stratified_sample_counts_property(spark, langs, fraction):
    import math

    from kafka_spark_streaming_pipeline_spark.operators.curation import stratified_sample

    docs = spark.createDataFrame(list(enumerate(langs)), ["doc_id", "lang"])
    out = stratified_sample(docs, fraction=fraction, stratum_col="lang").collect()
    per = {}
    for r in out:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    from collections import Counter

    sizes = Counter(langs)
    assert per == {
        lang: math.ceil(n * fraction) for lang, n in sizes.items()
    }


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=25,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_matches_union_find(spark, edges):
    from kafka_spark_streaming_pipeline_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    # reference: classic union-find with min-label components
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == expect


@st.composite
def bm25_case(draw):
    vocab = ["aaa", "bbb", "ccc", "ddd", "eee"]
    docs = draw(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=12),
            min_size=1, max_size=8,
        )
    )
    terms = draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=3, unique=True))
    return docs, terms


def _bm25_reference(docs: list[list[str]], terms: list[str], k1=1.2, b=0.75):
    """Pure-Python BM25 mirroring the operator's contract (rounded
    score, (score desc, doc_id) order)."""
    import math

    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    df = {t: sum(1 for d in docs if t in d) for t in terms}
    out = []
    for i, d in enumerate(docs):
        score, matched = 0.0, 0
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if matched:
            out.append((i, round(score + 1e-9, 6), matched))
    out.sort(key=lambda r: (-r[1], r[0]))
    return [(i, s, m, rank + 1) for rank, (i, s, m) in enumerate(out)]


@settings(max_examples=10, deadline=None)
@given(bm25_case())
def test_bm25_topk_matches_python_reference(spark, case):
    from kafka_spark_streaming_pipeline_spark.operators.retrieval import bm25_topk

    docs, terms = case
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = [
        (r["doc_id"], r["score"], r["n_terms_matched"], r["rank"])
        for r in sorted(bm25_topk(df, terms, topk=100).collect(), key=lambda r: r["rank"])
    ]
    assert got == _bm25_reference(docs, terms)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.integers(0, 999).map(lambda i: f"t{i}"), min_size=1, max_size=90
    ),
    st.sampled_from([(8, 3), (16, 4), (32, 8)]),
)
def test_chunk_documents_reconstructs_original(spark, toks, cfg):
    from kafka_spark_streaming_pipeline_spark.operators.curation import chunk_documents

    chunk_tokens, overlap = cfg
    docs = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(docs, chunk_tokens=chunk_tokens, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stitching chunks back together (dropping each successor's overlap
    # prefix) reconstructs the document exactly — no token lost or
    # duplicated by the windowing
    rebuilt = rows[0]["chunk_text"].split(" ")
    pos = len(rebuilt)  # tokens consumed so far == 1-based next start - 1
    stride = chunk_tokens - overlap
    for r in rows[1:]:
        start = r["chunk_idx"] * stride  # 0-based window start
        chunk = r["chunk_text"].split(" ")
        rebuilt.extend(chunk[pos - start:])
        pos = start + len(chunk)
    assert rebuilt == toks
    # every chunk except possibly the last is full-size
    assert all(r["n_chunk_tokens"] == chunk_tokens for r in rows[:-1])


@st.composite
def url_case(draw):
    scheme = draw(st.sampled_from(["http", "HTTPS", "Http"]))
    host = draw(st.sampled_from(["Example.COM", "www.site.org", "a.b.c.net"]))
    path = draw(st.sampled_from(["", "/x", "/x/y/", "/x/y/z.html", "///"]))
    params = draw(
        st.lists(
            st.sampled_from(
                ["id=1", "v=2", "q=a+b", "utm_source=x", "utm_medium=y",
                 "fbclid=z", "gclid=w", "ref=tw"]
            ),
            max_size=4, unique=True,
        )
    )
    frag = draw(st.sampled_from(["", "#top", "#a/b?c=d"]))
    qs = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{path}{qs}{frag}"


@settings(max_examples=15, deadline=None)
@given(st.lists(url_case(), min_size=1, max_size=6))
def test_canonical_url_idempotent_and_tracker_free(spark, urls):
    from kafka_spark_streaming_pipeline_spark.operators.text import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonical_url(F.col("url")).alias("url"))
    c1 = [r["url"] for r in once.collect()]
    c2 = [r["url"] for r in once.select(canonical_url(F.col("url")).alias("url")).collect()]
    # canonicalization is a fixpoint, never emits trackers/fragments,
    # and lowercases scheme+host
    assert c1 == c2
    for c in c1:
        assert "#" not in c and "utm_" not in c and "fbclid" not in c
        assert c.split("://")[0].islower()


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=2, max_size=30, unique=True),
    extra=st.lists(st.integers(10_001, 20_000), min_size=1, max_size=10, unique=True),
)
@settings(max_examples=6, deadline=None)
def test_training_shards_stable_under_corpus_growth(spark, ids, extra):
    """Hash-based sharding must be STABLE: adding documents never moves
    an existing document to a different shard (its shuffle key is a
    pure function of its id), and within a shard the relative order of
    surviving docs is preserved — the property that makes incremental
    shard maintenance possible at all."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        training_shards,
    )

    def run(id_list):
        docs = spark.createDataFrame(
            [(i, f"text for doc {i}") for i in id_list], ["doc_id", "text"]
        )
        return {
            r.doc_id: (r.shard, r.pos)
            for r in training_shards(docs, n_shards=4).collect()
        }

    before = run(ids)
    after = run(ids + extra)
    for doc_id, (shard, _pos) in before.items():
        assert after[doc_id][0] == shard  # shard never changes
    # relative order within a shard is preserved for surviving docs
    for shard in {s for s, _ in before.values()}:
        old_order = [d for d, (s, p) in sorted(before.items(), key=lambda kv: kv[1][1]) if s == shard]
        new_order = [d for d, (s, p) in sorted(after.items(), key=lambda kv: kv[1][1])
                     if s == shard and d in before]
        assert new_order == old_order


@given(
    n_lists=st.integers(2, 4),
    seed=st.integers(0, 1000),
)
@settings(max_examples=6, deadline=None)
def test_rrf_fuse_permutation_invariant_and_bounded(spark, n_lists, seed):
    """RRF is a set-level fusion: the ORDER the rankings are passed in
    must not change any fused score or rank, and every fused score is
    bounded by n_lists / (k + 1)."""
    import random

    from kafka_spark_streaming_pipeline_spark.operators.retrieval import rrf_fuse

    rng = random.Random(seed)
    rankings = []
    for _ in range(n_lists):
        ids = rng.sample(range(100), rng.randint(1, 8))
        rankings.append(
            spark.createDataFrame(
                [(d, r + 1) for r, d in enumerate(ids)], ["doc_id", "rank"]
            )
        )
    fused = {
        r.doc_id: (r.rrf_score, r.n_sources, r.rank)
        for r in rrf_fuse(rankings, topk=200).collect()
    }
    shuffled = rankings[::-1]
    fused2 = {
        r.doc_id: (r.rrf_score, r.n_sources, r.rank)
        for r in rrf_fuse(shuffled, topk=200).collect()
    }
    assert fused == fused2
    # rrf_fuse rounds to 6 dp (retrieval.py), which can round UP by as
    # much as 5e-7 (e.g. rank-1 in every list: 2/61 = 0.03278688... ->
    # 0.032787), so the bound needs that rounding headroom.
    assert all(s <= n_lists / 61.0 + 5e-7 for s, _, _ in fused.values())


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="abcdefgh ", min_size=1, max_size=12),
             min_size=1, max_size=25, unique=True),
    st.lists(st.text(alphabet="abcdefgh ", min_size=1, max_size=12),
             min_size=1, max_size=25, unique=True),
)
def test_bloom_never_misses_members(spark, members, probes):
    """Bloom membership has NO false negatives on arbitrary inputs:
    every built-in value probes positive, whatever the collisions."""
    from kafka_spark_streaming_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_pack,
        bloom_probe,
    )

    mdf = spark.createDataFrame([(m,) for m in members], ["v"])
    packed = bloom_pack(bloom_build(mdf, "v"))
    both = spark.createDataFrame([(p,) for p in set(members) | set(probes)], ["v"])
    hits = {r.v: r.bloom_hit for r in bloom_probe(packed, both, "v").collect()}
    assert all(hits[m] == 1 for m in members)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
)
def test_kmv_overlap_invariants(spark, xs, ys):
    """KMV sketch invariants on arbitrary sets: below k everything is
    exact — distinct counts, union, Jaccard, and intersection all equal
    the true set arithmetic (the estimator's exact regime), and the
    report is symmetric in its inputs."""
    from kafka_spark_streaming_pipeline_spark.operators.sketches import (
        kmv_overlap,
        kmv_sketch,
    )

    a = kmv_sketch(spark.createDataFrame([(str(x),) for x in xs], ["v"]), F.col("v"))
    b = kmv_sketch(spark.createDataFrame([(str(y),) for y in ys], ["v"]), F.col("v"))
    row = kmv_overlap(a, b).first()
    sx, sy = set(xs), set(ys)
    assert row.est_distinct_a == len(sx)
    assert row.est_distinct_b == len(sy)
    assert row.est_union == len(sx | sy)
    true_j = len(sx & sy) / len(sx | sy)
    assert abs(row.kmv_jaccard - true_j) < 1e-3
    assert abs(row.est_intersection - len(sx & sy)) < 0.01
    swapped = kmv_overlap(b, a).first()
    assert (swapped.est_union, swapped.kmv_jaccard) == (row.est_union, row.kmv_jaccard)


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=8, deadline=None)
def test_bpe_train_matches_python_reference(spark, words_list, n_merges):
    """The distributed BPE loop must learn the exact merge sequence a
    sequential reference implementation learns (same tie-breaks, same
    leftmost-non-overlapping merge semantics)."""
    from kafka_spark_streaming_pipeline_spark.operators.text import bpe_train

    text = " ".join(words_list)

    # sequential reference BPE over the same whitespace tokenization
    from collections import Counter

    freqs = Counter(words_list)
    vocab = {w: list(w) for w in freqs if len(w) >= 2}
    expected = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freqs[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        expected.append((rank, l, r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = [
        (rw.merge_rank, rw.left, rw.right, rw.pair_count)
        for rw in bpe_train(docs, n_merges=n_merges).orderBy("merge_rank").collect()
    ]
    assert got == expected


@given(
    st.lists(
        st.text(alphabet="aben", min_size=1, max_size=8), min_size=1, max_size=10
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=8, deadline=None)
def test_bpe_encode_matches_training_fold(spark, words_list, n_merges):
    """bpe_encoded_words' boundary-preserving replace chain must apply
    learned merges with the exact leftmost-non-overlapping fold
    semantics of bpe_train — including repeated adjacent pairs
    ('banana' with (a,n) -> [b,an,an,a]), the case a single-space
    replace chain under-merges (regression for the round-5 advice)."""
    from kafka_spark_streaming_pipeline_spark.operators.text import (
        bpe_encode,
        bpe_train,
    )

    words_list = words_list + ["banana", "aaaa", "nananab"]
    text = " ".join(words_list)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = [
        (r.left, r.right)
        for r in bpe_train(docs, n_merges=n_merges).orderBy("merge_rank").collect()
    ]

    def ref_apply(w):
        syms = list(w)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return " ".join(syms)

    got = bpe_encode(docs, merges).first()
    expected_words = [ref_apply(w) for w in text.split(" ") if w]
    assert got.encoded == " | ".join(expected_words)
    assert got.n_symbols == sum(len(e.split(" ")) for e in expected_words)


@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None)
def test_containment_pairs_matches_bruteforce(spark, texts):
    """Every emitted containment pair must carry the exact brute-force
    metrics, and every pair that shares a rare shingle (df in the
    blocking band) with max directional containment >= threshold must
    be emitted — completeness within the blocking contract."""
    from collections import Counter

    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        containment_pairs,
    )

    docs = [(i, t) for i, t in enumerate(texts)]
    max_df, thr, k = 4, 0.5, 2

    def shingles(t):
        ws = t.lower().split(" ")
        if len(ws) < k:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    sets = {i: shingles(t) for i, t in docs}
    df = Counter(s for ss in sets.values() for s in ss)
    rare = {s for s, c in df.items() if 2 <= c <= max_df}

    expected = {}
    for a in sets:
        for b in sets:
            if a >= b or not (sets[a] & sets[b] & rare):
                continue
            inter = len(sets[a] & sets[b])
            ca, cb = inter / len(sets[a]), inter / len(sets[b])
            if max(ca, cb) >= thr:
                jac = inter / len(sets[a] | sets[b])
                expected[(a, b)] = (
                    round(ca + 1e-9, 4),
                    round(cb + 1e-9, 4),
                    round(jac + 1e-9, 4),
                )

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): (r.containment_a, r.containment_b, r.jaccard)
        for r in containment_pairs(
            sdf, shingle_k=k, max_df=max_df, min_containment=thr
        ).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=5).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None)
def test_bigram_cross_entropy_matches_python(spark, texts):
    """The distributed bigram LM must reproduce a sequential reference
    exactly (same smoothing, same context counts, 6-decimal rounds)."""
    import math
    from collections import Counter

    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        bigram_cross_entropy,
    )

    k = 0.5
    doc_bgs = {}
    for i, t in enumerate(texts):
        ws = t.lower().split(" ")
        doc_bgs[i] = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    bgc = Counter(bg for bgs in doc_bgs.values() for bg in bgs)
    ctx = Counter()
    for bg, c in bgc.items():
        ctx[bg.split(" ")[0]] += c
    V = len(ctx)
    expected = {}
    for i, bgs in doc_bgs.items():
        if not bgs:
            continue
        h = [
            -math.log((bgc[bg] + k) / (ctx[bg.split(" ")[0]] + k * V))
            for bg in bgs
        ]
        expected[i] = (len(bgs), round(sum(h) / len(h) + 1e-9, 6))

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in bigram_cross_entropy(sdf, k_smooth=k).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=0, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=0, max_size=12
    ),
)
@settings(max_examples=10, deadline=None)
def test_incremental_components_equals_batch(spark, edges1, edges2):
    """Folding a second edge batch into an existing labeling must give
    EXACTLY the labeling a from-scratch closure over all edges gives
    (components only merge; labels stay the min member id)."""
    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    # self-pairs INCLUDED: a doc whose only candidate pair is itself
    # must still come out labeled as a singleton
    e1 = [(a, b) for a, b in edges1 if a != b]  # prev built from real edges
    e2 = list(edges2)

    def df(edges):
        if not edges:
            return spark.createDataFrame([], "doc_a long, doc_b long")
        return spark.createDataFrame(edges, ["doc_a", "doc_b"])

    prev = connected_components(df(e1))
    incr = {
        (r.id, r.component)
        for r in incremental_components(prev, df(e2)).collect()
    }
    batch = {
        (r.id, r.component) for r in connected_components(df(e1 + e2)).collect()
    }
    assert incr == batch


@st.composite
def sig_corpus(draw):
    """Random 64-bit signatures as four 16-bit words, biased toward
    near-duplicates: a few base signatures plus per-doc bit flips."""
    n_bases = draw(st.integers(1, 3))
    bases = [
        [draw(st.integers(0, 65535)) for _ in range(4)] for _ in range(n_bases)
    ]
    docs = []
    n_docs = draw(st.integers(2, 10))
    for i in range(n_docs):
        sig = list(bases[draw(st.integers(0, n_bases - 1))])
        for _ in range(draw(st.integers(0, 5))):  # flip 0-5 bits
            bit = draw(st.integers(0, 63))
            sig[bit // 16] ^= 1 << (bit % 16)
        docs.append((i, sig))
    return docs


@settings(max_examples=10, deadline=None)
@given(sig_corpus(), st.sampled_from([2, 3]))
def test_hamming_band_pairs_pigeonhole_complete(spark, docs, max_hamming):
    """The banding recall guarantee, pinned: for max_hamming < bands,
    banded blocking + exact verify finds EXACTLY the brute-force pair
    set (pigeonhole: a pair within d < bands bit flips must agree on
    some band) — shared by text SimHash (x44), image dHash (x101),
    and audio fingerprints (x103)."""
    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        hamming_band_pairs,
    )

    sig_df = spark.createDataFrame(docs, "doc_id long, sig array<bigint>")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in hamming_band_pairs(sig_df, max_hamming=max_hamming).collect()
    }
    want = {}
    for i, a in docs:
        for j, b in docs:
            if i < j:
                h = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
                if h <= max_hamming:
                    want[(i, j)] = h
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    lens=st.lists(st.integers(1, 700), min_size=1, max_size=12),
)
def test_padding_and_truncation_conservation(spark, lens):
    """Padding report: every doc lands in exactly one bucket, waste +
    tokens == padded capacity, and the naive row accounts for the
    whole corpus.  Truncation sweep: loss is exact vs a Python
    reference and monotone non-increasing in max_len."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        padding_efficiency,
        truncation_loss,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id BIGINT, text STRING",
    )
    rows = padding_efficiency(docs, max_len=512, bucket_width=64).collect()
    bucketed = [r for r in rows if r["strategy"] == "bucketed"]
    [naive] = [r for r in rows if r["strategy"] == "naive_max_len"]
    assert sum(r["n_docs"] for r in bucketed) == len(lens) == naive["n_docs"]
    eff = [min(n, 512) for n in lens]
    assert sum(r["sum_tokens"] for r in bucketed) == sum(eff) == naive["sum_tokens"]
    for r in bucketed:
        assert r["waste_tokens"] == r["padded_tokens"] - r["sum_tokens"] >= 0
        assert r["cap_len"] == r["bucket"] * 64

    out = {
        r["max_len"]: r for r in truncation_loss(docs, (128, 256, 512)).collect()
    }
    prev = None
    for m in (128, 256, 512):
        want_lost = sum(max(n - m, 0) for n in lens)
        want_trunc = sum(1 for n in lens if n > m)
        r = out[m]
        assert r["n_tokens_lost"] == want_lost and r["n_truncated"] == want_trunc
        if prev is not None:
            assert r["n_tokens_lost"] <= prev
        prev = r["n_tokens_lost"]


@settings(max_examples=8, deadline=None)
@given(
    scores=st.lists(st.integers(0, 50), min_size=3, max_size=40),
    alpha_ppm=st.sampled_from([10_000, 100_000, 300_000]),
)
def test_conformal_threshold_matches_python_rank(spark, scores, alpha_ppm):
    """The engine's conformal threshold equals the k-th smallest
    calibration score computed in plain Python (k = floor(alpha *
    (n+1)); NULL when k = 0), for arbitrary duplicate-heavy quantized
    score sets."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        conformal_thresholds,
    )

    qs = [s * 10_000 for s in scores]
    cal = spark.createDataFrame([(v,) for v in qs], "qs LONG")
    test = spark.createDataFrame([(v,) for v in qs], "qs LONG")
    [r] = conformal_thresholds(
        cal, test, "qs", alpha_ppm=(alpha_ppm,)
    ).collect()
    n = len(qs)
    k = alpha_ppm * (n + 1) // 1_000_000
    assert r["k_rank"] == k and r["n_cal"] == n
    if k == 0:
        assert r["threshold"] is None and r["n_kept"] is None
    else:
        want_thr = sorted(qs)[k - 1]
        assert r["threshold"] == round(want_thr / 1e6 + 1e-9, 6)
        assert r["n_kept"] == sum(1 for v in qs if v >= want_thr)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=40,
    )
)
def test_k_anonymity_matches_python_reference(spark, rows):
    """Per-threshold risky classes/rows and worst l-diversity equal a
    plain-Python computation over random quasi-identifier/sensitive
    triples."""
    from collections import Counter, defaultdict

    from kafka_spark_streaming_pipeline_spark.operators.profile import (
        k_anonymity_audit,
    )

    df = spark.createDataFrame(rows, "q1 INT, q2 INT, s STRING")
    got = {r["k"]: r for r in k_anonymity_audit(df, ["q1", "q2"], "s").collect()}

    cls_n = Counter((a, b) for a, b, _ in rows)
    l_div = defaultdict(set)
    for a, b, s in rows:
        l_div[(a, b)].add(s)
    for k in (2, 5, 10, 25):
        risky = [c for c, n in cls_n.items() if n < k]
        r = got[k]
        assert r["n_classes"] == len(cls_n) and r["n_rows"] == len(rows)
        assert r["n_risky_classes"] == len(risky)
        assert r["n_risky_rows"] == sum(cls_n[c] for c in risky)
        want_l = min((len(l_div[c]) for c in risky), default=None)
        assert r["min_l_div_at_risk"] == want_l


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 20),
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=5),
            st.sampled_from(["L1", "L2"]),
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda t: t[0],
    ).filter(
        lambda rows: len({l for i, _, l in rows if i % 2 == 0}) >= 1
        and any(i % 2 == 0 for i, _, _ in rows)
        and any(i % 2 == 1 for i, _, _ in rows)
    )
)
def test_nb_calibration_consistent_with_nb_score(spark, rows):
    """Calibration's per-bucket counts cover every test document
    exactly once, and its predictions agree with nb_score on the same
    train/test split (the two paths share the scoring frame)."""
    from kafka_spark_streaming_pipeline_spark.operators.classify import (
        nb_calibration,
        nb_score,
        nb_train,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks), l) for i, toks, l in rows],
        "doc_id BIGINT, text STRING, lang STRING",
    )
    cal = nb_calibration(docs).collect()
    n_test = sum(1 for i, _, _ in rows if i % 2 == 1)
    assert sum(r["n_docs"] for r in cal) == n_test
    assert all(0 <= r["n_correct"] <= r["n_docs"] for r in cal)
    # cross-check aggregate accuracy against nb_score + truth
    model = nb_train(docs.filter(F.col("doc_id") % 2 == 0))
    preds = {
        r["doc_id"]: r["predicted"]
        for r in nb_score(docs.filter(F.col("doc_id") % 2 == 1), model).collect()
    }
    truth = {i: l for i, _, l in rows if i % 2 == 1}
    want_correct = sum(1 for i, p in preds.items() if p == truth[i])
    assert sum(r["n_correct"] for r in cal) == want_correct


def _py_unigram_train(
    words_list, vocab_multi, keep_multi, max_piece_len, max_word_len, iterations
):
    """Sequential reference of operators/text.py's unigram_lm_train —
    the exact spec (candidate counts, integer micro-nat costs, Viterbi
    tie rule (cost, then smaller start), add-one smoothing,
    contribution prune, final renormalize)."""
    import math
    from collections import Counter

    freqs = Counter(w[:max_word_len] for w in words_list if w)
    cand = Counter()
    for w, f in freqs.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                cand[w[i : i + ln]] += f
    multi = sorted(
        (p for p in cand if len(p) >= 2), key=lambda p: (-cand[p], p)
    )[:vocab_multi]
    kept = sorted([p for p in cand if len(p) == 1] + multi)
    counts = {p: cand[p] for p in kept}

    def costs(cnts):
        import math

        total = sum(cnts.values())
        return {
            p: math.floor(math.log(total / c) * 1e6 + 0.5)
            for p, c in cnts.items()
        }

    cost = costs(counts)

    def viterbi(w, cost):
        n = len(w)
        dp = [(0, -1)] + [(None, -1)] * n
        for j in range(1, n + 1):
            best = None
            for i in range(max(0, j - max_piece_len), j):
                if dp[i][0] is None:
                    continue
                c = cost.get(w[i:j])
                if c is None:
                    continue
                if best is None or (dp[i][0] + c, i) < best:
                    best = (dp[i][0] + c, i)
            if best is not None:
                dp[j] = best
        if dp[n][0] is None:
            return None
        pieces, pos = [], n
        while pos > 0:
            b = dp[pos][1]
            pieces.append(w[b:pos])
            pos = b
        return pieces

    for _ in range(iterations):
        used = Counter()
        for w, f in freqs.items():
            for p in viterbi(w, cost) or []:
                used[p] += f
        counts = {p: used.get(p, 0) + 1 for p in kept}
        cost = costs(counts)

    contrib = {p: counts[p] * cost[p] for p in kept}
    multi_kept = sorted(
        (p for p in kept if len(p) >= 2), key=lambda p: (-contrib[p], p)
    )[:keep_multi]
    final = sorted([p for p in kept if len(p) == 1] + multi_kept)
    fcost = costs({p: counts[p] for p in final})
    model = [(p, len(p), counts[p], fcost[p], contrib[p]) for p in final]
    final_cost = {p: fcost[p] for p in final}
    return model, final_cost, viterbi


@given(
    st.lists(
        st.text(alphabet="abrs", min_size=1, max_size=9), min_size=1, max_size=14
    )
)
@settings(max_examples=8, deadline=None)
def test_unigram_lm_train_matches_python_reference(spark, words_list):
    """The distributed hard-EM loop (codegen Viterbi folds + vocab-
    bounded driver state) must learn the exact model the sequential
    reference learns — candidate selection, both EM rounds' counts,
    the contribution prune, and the renormalized integer costs."""
    from kafka_spark_streaming_pipeline_spark.operators.text import (
        unigram_lm_train,
    )

    expected, _, _ = _py_unigram_train(
        words_list, vocab_multi=6, keep_multi=3, max_piece_len=3,
        max_word_len=12, iterations=2,
    )
    docs = spark.createDataFrame([(1, " ".join(words_list))], ["doc_id", "text"])
    got = [
        (r.piece, r.piece_len, r.cnt, r.cost_micro, r.contribution)
        for r in unigram_lm_train(
            docs, vocab_multi=6, keep_multi=3, max_piece_len=3
        ).orderBy("piece").collect()
    ]
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abrs", min_size=1, max_size=9),
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=5,
    )
)
@settings(max_examples=6, deadline=None)
def test_unigram_lm_encode_matches_python_reference(spark, doc_words):
    """Per-document encode totals must equal the sequential reference's
    per-word Viterbi segmentation under the trained model (train and
    encode share the corpus here, so no OOV)."""
    from kafka_spark_streaming_pipeline_spark.operators.text import (
        unigram_lm_encode, unigram_lm_train,
    )

    all_words = [w for ws in doc_words for w in ws]
    _, final_cost, viterbi = _py_unigram_train(
        all_words, vocab_multi=6, keep_multi=3, max_piece_len=3,
        max_word_len=12, iterations=2,
    )
    expected = {}
    for i, ws in enumerate(doc_words):
        segs = [viterbi(w[:12], final_cost) for w in ws]
        expected[i] = (
            len(ws),
            sum(1 for s in segs if s is None),
            sum(len(s) for s in segs if s is not None),
            sum(final_cost[p] for s in segs if s is not None for p in s),
        )

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(doc_words)],
        ["doc_id", "text"],
    )
    model = unigram_lm_train(docs, vocab_multi=6, keep_multi=3, max_piece_len=3)
    got = {
        r.doc_id: (r.n_words, r.n_oov_words, r.n_pieces, r.total_cost_micro)
        for r in unigram_lm_encode(docs, model, max_piece_len=3).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1,
                     max_size=5),
        ),
        min_size=6, max_size=18,
    )
)
@settings(max_examples=6, deadline=None)
def test_nb_conformal_sets_matches_python_reference(spark, labeled_docs):
    """The distributed conformal-set pipeline (NB scoring + histogram
    rank walk + set scan) must reproduce a sequential reference of the
    whole protocol exactly: quantized model, nonconformities, the
    ceil((n+1)(1-alpha)) rank, qhat, coverage and set sizes."""
    import math
    from collections import Counter

    from kafka_spark_streaming_pipeline_spark.operators.classify import (
        nb_conformal_sets,
    )

    rows = [(i, lab, " ".join(ws)) for i, (lab, ws) in enumerate(labeled_docs)]
    train = [(l, t) for i, l, t in rows if i % 3 == 0]
    cal = [(l, t) for i, l, t in rows if i % 3 == 1]
    test = [(l, t) for i, l, t in rows if i % 3 == 2]
    # hypothesis may produce splits with empty train/cal/test — the
    # operator needs at least one doc per split and >= 1 trained label
    if not train or not cal or not test:
        return

    counts = Counter()
    docn = Counter()
    for lab, t in train:
        docn[lab] += 1
        for tok in t.split(" "):
            counts[(lab, tok)] += 1
    vocab = sorted({tok for _, tok in counts})
    label_tot = Counter()
    for (lab, tok), c in counts.items():
        label_tot[lab] += c
    nd = sum(docn.values())
    prior = {
        lab: math.trunc(math.log(n / nd) * 1e6) for lab, n in docn.items()
    }
    qll = {
        (lab, tok): math.trunc(
            math.log(
                (counts.get((lab, tok), 0) + 0.5)
                / (label_tot[lab] + 0.5 * len(vocab))
            )
            * 1e6
        )
        for lab in docn
        for tok in vocab
    }

    def score(text, lab):
        tf = Counter(text.split(" "))
        ev = sum(
            n * qll[(lab, tok)] for tok, n in tf.items() if (lab, tok) in qll
        )
        return ev + prior[lab]

    # untrained true labels: infinite nonconformity — counted in n_cal,
    # absent from the finite order statistics (mirrors the operator)
    a_fin = sorted(-score(t, lab) for lab, t in cal if lab in prior)
    n_cal = len(cal)
    expected = {}
    for app in (50_000, 100_000, 200_000):
        k = (n_cal + 1) - (app * (n_cal + 1)) // 1_000_000
        qhat = a_fin[k - 1] if 1 <= k <= len(a_fin) else None
        sizes, covered = [], 0
        for lab, t in test:
            in_set = [
                l2
                for l2 in sorted(docn)
                if qhat is None or -score(t, l2) <= qhat
            ]
            sizes.append(len(in_set))
            covered += lab in in_set
        expected[app / 1e6] = (
            n_cal,
            k,
            len(test),
            round(covered / len(test) + 1e-9, 6),
            round(sum(sizes) / len(test) + 1e-9, 6),
        )

    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.alpha: (r.n_cal, r.k_rank, r.n_test, r.coverage, r.avg_set_size)
        for r in nb_conformal_sets(docs).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0, max_size=15,
    )
)
@settings(max_examples=8, deadline=None)
def test_leakage_safe_split_never_straddles_clusters(spark, edges):
    """x179's invariant: every near-dup cluster lands in exactly ONE
    split (the whole point — no train/test leakage through near-dups),
    singletons keep their naive assignment (moved == False), and
    ``moved`` is exactly 'split differs from the naive per-doc
    bucket'."""
    import hashlib

    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        leakage_safe_split,
    )
    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        connected_components,
    )

    n_docs = 31
    docs = spark.createDataFrame([(i,) for i in range(n_docs)], "doc_id long")
    pairs = [(a, b) for a, b in edges if a != b]

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100

    def split(b):
        return "train" if b < 90 else ("val" if b < 95 else "test")

    if pairs:
        comp = connected_components(
            spark.createDataFrame(pairs, "doc_a long, doc_b long")
        )
    else:
        comp = spark.createDataFrame([], "id long, component long")
    rows = leakage_safe_split(comp, docs).collect()
    assert len(rows) == n_docs

    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, set()).add(r.split)
        # split is the anchor's bucket; moved iff it differs from the
        # doc's own naive bucket
        assert r.split == split(bucket(r.anchor_id))
        assert r.moved == (r.split != split(bucket(r.doc_id)))
    # one split per cluster, no straddling
    assert all(len(s) == 1 for s in by_anchor.values())
    # singletons (docs in no pair) anchor on themselves and never move
    linked = {x for p in pairs for x in p}
    for r in rows:
        if r.doc_id not in linked:
            assert r.anchor_id == r.doc_id and r.moved is False


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.integers(0, 2),
            st.sampled_from(["s1", "s2", "s3"]),
        ),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_t_closeness_matches_python_reference(spark, rows):
    """The decimal-numerator TVD per equivalence class and the per-t
    report must match an exact-fraction sequential reference on random
    projections (incl. sensitive values absent from a class)."""
    from fractions import Fraction

    from kafka_spark_streaming_pipeline_spark.operators.profile import (
        t_closeness_audit,
    )

    from collections import Counter

    n = len(rows)
    glob = Counter(s for _, _, s in rows)
    classes = Counter((l, b) for l, b, _ in rows)
    cells = Counter(((l, b), s) for l, b, s in rows)
    tvds = {}
    for cls, cls_n in classes.items():
        tvd = sum(
            abs(
                Fraction(cells.get((cls, s), 0), cls_n) - Fraction(g, n)
            )
            for s, g in glob.items()
        ) / 2
        tvds[cls] = round(float(tvd) + 1e-9, 6)
    expected = {}
    for tp in (100_000, 200_000, 300_000):
        t = tp / 1e6
        over = [c for c, v in tvds.items() if v > t]
        expected[t] = (
            len(classes),
            len(over),
            sum(classes[c] for c in over),
            round(max(tvds.values()) + 1e-9, 6) if tvds else None,
        )

    df = spark.createDataFrame(rows, "lang string, len_bucket long, source string")
    got = {
        r.t: (r.n_classes, r.n_classes_over, r.n_rows_over, r.max_tvd)
        for r in t_closeness_audit(df, ["lang", "len_bucket"], "source").collect()
    }
    assert got == expected


# ---------------------------------------------------------------- substring dedup


def _py_windows(toks: list[str], k: int):
    """Replicates operators.dedup._window_occurrences: full k-windows,
    or ONE partial window for docs shorter than k (e capped at n)."""
    n = len(toks)
    out = []
    for s0 in range(max(n - k + 1, 1)):
        s, e = s0 + 1, min(s0 + k, n)
        out.append((s, e, tuple(toks[s0:e])))
    return out


def _py_occurrences(docs: dict[int, list[str]], k: int):
    occ: dict[tuple, list[tuple[int, int, int]]] = {}
    for i, toks in sorted(docs.items()):
        for s, e, gram in _py_windows(toks, k):
            occ.setdefault(gram, []).append((i, s, e))
    return occ


def _py_substring_spans(docs, k, min_docs=2):
    occ = _py_occurrences(docs, k)
    hits: dict[int, list[tuple[int, int, int]]] = {}
    for gram, lst in occ.items():
        nd = len({i for i, _, _ in lst})
        if nd >= min_docs:
            for i, s, e in lst:
                hits.setdefault(i, []).append((s, e, nd))
    spans = []
    for i, lst in hits.items():
        lst.sort()
        cur = None
        for s, e, nd in lst:
            if cur is None or s > cur[1] + 1:
                if cur:
                    spans.append((i, *cur))
                cur = [s, e, 1, nd]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
                cur[3] = max(cur[3], nd)
        if cur:
            spans.append((i, *cur))
    return {
        (i, s, e, e - s + 1, nw, nd) for i, s, e, nw, nd in spans
    }


def _py_substring_clean(docs, k, min_docs=2):
    occ = _py_occurrences(docs, k)
    removals: dict[int, list[tuple[int, int]]] = {}
    protections: dict[int, list[tuple[int, int]]] = {}
    for gram, lst in occ.items():
        if len({i for i, _, _ in lst}) >= min_docs:
            lst.sort()
            i, s, e = lst[0]
            protections.setdefault(i, []).append((s, e))
            for i, s, e in lst[1:]:
                removals.setdefault(i, []).append((s, e))
    out = {}
    for i, toks in docs.items():
        kept = [
            t
            for p, t in enumerate(toks, start=1)
            if not any(s <= p <= e for s, e in removals.get(i, ()))
            or any(s <= p <= e for s, e in protections.get(i, ()))
        ]
        out[i] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@st.composite
def substring_corpus(draw):
    n_docs = draw(st.integers(2, 5))
    words = ["aa", "bb", "cc", "dd"]
    return {
        i: draw(st.lists(st.sampled_from(words), min_size=1, max_size=12))
        for i in range(n_docs)
    }


@settings(max_examples=15, deadline=None)
@given(substring_corpus())
def test_substring_spans_match_python_reference(spark, docs):
    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        substring_dedup_spans,
    )

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_windows,
         r.max_window_docs)
        for r in substring_dedup_spans(df, k=3, min_docs=2).collect()
    }
    assert got == _py_substring_spans(docs, k=3)


@settings(max_examples=15, deadline=None)
@given(substring_corpus())
def test_substring_clean_matches_python_reference(spark, docs):
    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        substring_dedup_clean,
    )

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.cleaned_text, r.n_tokens_before, r.n_tokens_removed)
        for r in substring_dedup_clean(df, k=3, min_docs=2).collect()
    }
    assert got == _py_substring_clean(docs, k=3)


@settings(max_examples=12, deadline=None)
@given(substring_corpus())
def test_self_repetition_trim_matches_python_reference(spark, docs):
    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        self_repetition_trim,
    )

    def ref(toks, k):
        occ: dict[tuple, list[tuple[int, int]]] = {}
        for s, e, gram in _py_windows(toks, k):
            occ.setdefault(gram, []).append((s, e))
        rem, prot = [], []
        for lst in occ.values():
            if len(lst) >= 2:
                lst.sort()
                prot.append(lst[0])
                rem.extend(lst[1:])
        kept = [
            t
            for p, t in enumerate(toks, start=1)
            if not any(s <= p <= e for s, e in rem)
            or any(s <= p <= e for s, e in prot)
        ]
        return " ".join(kept), len(toks), len(toks) - len(kept)

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.cleaned_text, r.n_tokens_before, r.n_tokens_removed)
        for r in self_repetition_trim(df, k=3).collect()
    }
    assert got == {i: ref(t, 3) for i, t in docs.items()}


# ----------------------------------------------------- budget curation (x197/x198)
#
# Sequential Python references for the budget family (VERDICT r10
# item 5): the boundary semantics — budget landing exactly on a
# level's cumulative edge (<=, not <), source exhaustion below target
# (utilization < 1), and the empty-source left join — are oracle-
# pinned but were not property-tested the way the substring family
# is.  References re-derive EVERYTHING in plain Python (quality
# score, token count, md5 ranking hash), sharing no Spark expression
# with the operators under test.

_PY_STOPWORDS = {
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
}


def _half_up(x: float, n: int) -> float:
    """Spark's F.round on doubles: BigDecimal.valueOf (shortest repr,
    = Python repr) then HALF_UP — NOT Python's banker's rounding."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{n}"), ROUND_HALF_UP))


def _py_quality(text: str) -> float:
    toks = text.lower().split(" ")
    n = len(toks)
    length_ok = 1.0 if 20 <= n <= 2000 else 0.5
    stop = sum(1 for t in toks if t in _PY_STOPWORDS) / n
    stop_ok = 1.0 if 0.01 <= stop <= 0.6 else 0.5
    awl = sum(len(t) for t in toks) / n
    word_ok = 1.0 if 2.0 <= awl <= 12.0 else 0.5
    return (length_ok + stop_ok + word_ok) / 3.0


def _py_threshold_for_budget(texts: list[str], budget_den: int):
    levels: dict[float, list[int]] = {}
    corpus = 0
    for text in texts:
        q, nt = _py_quality(text), len(text.lower().split(" "))
        corpus += nt
        d = levels.setdefault(q, [0, 0])
        d[0] += 1
        d[1] += nt
    budget = corpus // budget_den
    out, cum_d, cum_t = set(), 0, 0
    for q in sorted(levels, reverse=True):
        n_docs, n_tokens = levels[q]
        cum_d += n_docs
        cum_t += n_tokens
        out.add(
            (_half_up(q + 1e-9, 4), n_docs, n_tokens, cum_d, cum_t,
             budget, cum_t <= budget)
        )
    return out


@st.composite
def budget_corpus(draw):
    # vocab spans the quality knobs: stopwords ('the', 'and'), short
    # non-stop words, and an awl-busting long word
    words = ["the", "and", "data", "x", "zzzzzzzzzzzzzzzzzz"]
    n_docs = draw(st.integers(1, 8))
    docs = []
    for i in range(n_docs):
        toks = draw(st.lists(st.sampled_from(words), min_size=1, max_size=25))
        src = draw(st.sampled_from(["s1", "s2", "s3"]))
        docs.append((i, src, " ".join(toks)))
    return docs, draw(st.integers(1, 8))


@settings(max_examples=12, deadline=None)
@given(budget_corpus())
def test_quality_threshold_for_budget_matches_python_reference(spark, case):
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        quality_threshold_for_budget,
    )

    docs, den = case
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = quality_threshold_for_budget(df, budget_den=den).collect()
    got = {
        (r.threshold, r.n_docs, r.n_tokens, r.cum_docs, r.cum_tokens,
         r.budget_tokens, r.fits_budget)
        for r in rows
    }
    assert got == _py_threshold_for_budget([t for _, _, t in docs], den)
    # fits_budget is a PREFIX of the desc-threshold walk (cum_tokens
    # monotone), and a budget landing exactly on a level's cumulative
    # edge FITS (<=, not <)
    ordered = sorted(rows, key=lambda r: -r.threshold)
    fits = [r.fits_budget for r in ordered]
    assert fits == sorted(fits, reverse=True)
    for r in rows:
        if r.cum_tokens == r.budget_tokens:
            assert r.fits_budget


def test_quality_threshold_budget_exact_edge(spark):
    """Deterministic edge pin: budget == the top level's cumulative
    tokens exactly -> that level fits; the next does not."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        quality_threshold_for_budget,
    )

    hi = "the and " + " ".join(["data"] * 23)  # 25 tokens, q = 1.0
    lo = " ".join(["zzzz"] * 5)  # 5 tokens, no stopwords, short: q = 2/3
    docs = [(i, "s", hi) for i in range(4)] + [
        (100 + i, "s", lo) for i in range(20)
    ]  # totals: 100 hi + 100 lo = 200; den=2 -> budget = 100 = hi cum
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = {
        r.threshold: r
        for r in quality_threshold_for_budget(df, budget_den=2).collect()
    }
    assert rows[1.0].cum_tokens == rows[1.0].budget_tokens == 100
    assert rows[1.0].fits_budget is True
    assert rows[_half_up(2 / 3 + 1e-9, 4)].fits_budget is False


def _py_materialize_mixture(docs, alpha: float, budget_den: int):
    import math

    per: dict[str, list] = {}
    for doc_id, src, text in docs:
        nt = len(text.lower().split(" "))
        rk = int(
            hashlib.md5(f"mixture|{doc_id}".encode()).hexdigest()[:15], 16
        )
        per.setdefault(src, []).append((rk, doc_id, nt))
    corpus = sum(nt for lst in per.values() for _, _, nt in lst)
    # source_mixture's temperature weights, rounded 6dp as published
    shares = {s: sum(nt for _, _, nt in lst) / corpus for s, lst in per.items()}
    pow_sum = sum(sh**alpha for sh in shares.values())
    budget = corpus // budget_den
    out = set()
    for src, lst in per.items():
        mw = _half_up(shares[src] ** alpha / pow_sum + 1e-9, 6)
        tgt = math.floor(budget * mw + 1e-6)
        cum = kd = kt = 0
        for rk, doc_id, nt in sorted(lst):
            cum += nt
            if cum <= tgt:
                kd += 1
                kt += nt
        out.add((src, mw, tgt, kd, kt, _half_up(kt / max(tgt, 1) + 1e-9, 4)))
    return out


@settings(max_examples=12, deadline=None)
@given(budget_corpus())
def test_materialize_mixture_matches_python_reference(spark, case):
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        materialize_mixture,
    )

    docs, den = case
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = materialize_mixture(df, alpha=0.5, budget_den=den).collect()
    got = {
        (r.source, r.mix_weight, r.target_tokens, r.kept_docs,
         r.kept_tokens, r.utilization)
        for r in rows
    }
    assert got == _py_materialize_mixture(docs, 0.5, den)
    for r in rows:
        # never overshoot the target; utilization is honest (<= 1 up
        # to the published rounding epsilon)
        assert r.kept_tokens <= r.target_tokens
        assert r.utilization <= 1.0 + 1e-9
    # source exhaustion: a source whose entire token mass fits under
    # its target keeps EVERYTHING and reports utilization < 1 exactly
    # when it ran out below target
    totals: dict[str, int] = {}
    for _, src, text in docs:
        totals[src] = totals.get(src, 0) + len(text.split(" "))
    for r in rows:
        if totals[r.source] <= r.target_tokens:
            assert r.kept_tokens == totals[r.source]


def test_materialize_mixture_empty_source_left_join(spark):
    """Budget so large a denominator that every target is 0: the
    summary must still carry every source (left join), all-zero kept
    and utilization 0.0 — not drop rows."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        materialize_mixture,
    )

    docs = [(1, "s1", "the and data"), (2, "s2", "x zzzz the")]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = materialize_mixture(df, budget_den=10**9).collect()
    assert {r.source for r in rows} == {"s1", "s2"}
    for r in rows:
        assert (r.target_tokens, r.kept_docs, r.kept_tokens, r.utilization) == (
            0, 0, 0, 0.0
        )


# ------------------------------------- streaming substring-clean sink
# (VERDICT r11 item 7): the batch x193-x196 family is property-tested
# above; this closes the gap for its streaming twin — arrival-order-
# partitioned cleanup through make_substring_clean_sink must equal
# the one-shot batch cleaner on the same corpus, for ANY doc-id-order
# batch partition, whenever the corpus is free of the corners
# streaming causality forbids (shipped batches are final, so any
# edit/protection decision that depends on documents arriving LATER
# cannot be replayed):
#   1. retroactive removal — a document self-repeats a window that
#      only later becomes cross-document shared: the batch cleaner
#      trims the already-shipped self-repeat;
#   2. retroactive protection — a window's protected FIRST occurrence
#      overlaps a removal span in the same (earliest-id, so
#      earliest-shipped) document, but the window only becomes
#      cross-document when a later doc arrives: the batch cleaner
#      shields those tokens, the stream has already dropped them.
# Removals themselves never lag: a non-first occurrence lives in a
# LARGER doc id, so its gram's first doc has always shipped first.


def _py_has_retroactive_corner(docs: dict[int, list[str]], k: int) -> bool:
    """True iff the corpus admits either causality corner above for
    SOME batch split (conservative: split-independent)."""
    occ = _py_occurrences(docs, k)
    removals: dict[int, list[tuple[int, int]]] = {}
    firsts: list[tuple[int, int, int]] = []
    for lst in occ.values():
        docs_seen = {i for i, _, _ in lst}
        if len(docs_seen) < 2:
            continue
        if len(lst) > len(docs_seen):
            return True  # corner 1: cross-doc gram self-repeats somewhere
        lst.sort()
        i0, s0, e0 = lst[0]
        firsts.append((i0, s0, e0))
        for i, s, e in lst[1:]:
            removals.setdefault(i, []).append((s, e))
    for i0, s0, e0 in firsts:
        if any(s <= e0 and s0 <= e for s, e in removals.get(i0, ())):
            return True  # corner 2: first occurrence overlaps a removal
    return False


@settings(max_examples=10, deadline=None)
@given(substring_corpus(), st.data())
def test_streaming_substring_clean_equals_batch_for_any_split(
    spark, docs, data
):
    import shutil
    import tempfile

    from hypothesis import assume

    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        substring_dedup_clean,
    )
    from kafka_spark_streaming_pipeline_spark.streaming.sinks import (
        make_substring_clean_sink,
        substring_clean_view,
    )

    assume(not _py_has_retroactive_corner(docs, 3))

    ordered = sorted(docs)
    n_batches = data.draw(st.integers(1, 3), label="n_batches")
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, len(ordered)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            ),
            label="cuts",
        )
    )
    bounds = [0, *cuts, len(ordered)]
    batches = [
        ordered[bounds[j]:bounds[j + 1]] for j in range(len(bounds) - 1)
    ]

    tmp = tempfile.mkdtemp(prefix="subclean_prop_")
    try:
        sink = make_substring_clean_sink(
            f"{tmp}/hashes", f"{tmp}/clean", k=3
        )
        for bid, ids in enumerate(batches):
            if not ids:
                continue
            sink(
                spark.createDataFrame(
                    [(i, " ".join(docs[i])) for i in ids],
                    "doc_id long, text string",
                ),
                bid,
            )
        got = {
            r.doc_id: (r.cleaned_text, r.n_tokens_before,
                       r.n_tokens_removed)
            for r in substring_clean_view(spark, f"{tmp}/clean").collect()
        }
        full = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs.items()],
            "doc_id long, text string",
        )
        want = {
            r.doc_id: (r.cleaned_text, r.n_tokens_before,
                       r.n_tokens_removed)
            for r in substring_dedup_clean(full, k=3, min_docs=2).collect()
        }
        # the python reference pins the batch side too, so a bug that
        # breaks BOTH engines identically cannot hide
        assert want == _py_substring_clean(docs, 3)
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
