"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of each shape):
- exact dedup: one hash-shuffle on the fingerprint — at 100 TB this is
  the cheapest possible full-corpus pass (map-side partial combine).
- MinHash+LSH: candidate generation NEVER compares all pairs — docs are
  exploded to (band_hash) buckets and only bucket-mates are joined, so
  cost is Σ bucket² instead of n².
- SimHash: a single grouped aggregation produces a 16-bit signature;
  near-dup candidates share the signature (or a band of it).
- n-gram Jaccard: exact verification, run only on blocked/candidate
  pairs, never the cross product.

Hash functions are md5-based (not xxhash) on purpose: md5 is available
and bit-identical in both Spark and DuckDB, so every operator here is
oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .text import tokens


# ------------------------------------------------------------------ exact

def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per document with its duplicate-group stats: fingerprint,
    the group's canonical (min) id, and group size.  ``is_canonical``
    marks the survivor (what dropDuplicates would keep, but
    deterministically)."""
    from .text import fingerprint

    fp = fingerprint(F.col(text_col))
    with_fp = docs.select(F.col(id_col), fp.alias("fingerprint"))
    groups = with_fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        with_fp.join(groups, "fingerprint")
        .select(
            id_col,
            "fingerprint",
            "canonical_id",
            "group_size",
            (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
        )
    )


# ------------------------------------------------------------- shingling

def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the lowercased text, as one column
    expression.  WARNING: every element_at re-evaluates the split — fine
    for a single projection, quadratic when a plan references it
    repeatedly.  Pipelines should use shingle_rows (below)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1)))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(k)]
    )
    return F.array_distinct(F.transform(idx, shingle))


def shingle_rows(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingle) rows via posexplode + window-lead: the text is split
    exactly ONCE per document, shingles assemble from lead() over token
    rows, and the per-key window repartitions the corpus — which also
    fixes the small-file problem (a single-partition parquet otherwise
    serializes the whole corpus onto one core).

    Semantics match word_shingles: docs shorter than k words yield one
    partial shingle (concat_ws skips the null leads)."""
    toks = tokens(F.col(text_col))
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    exploded = docs.repartition(parallelism).select(
        F.col(id_col),
        F.size(toks).alias("n_tok"),
        F.posexplode(toks).alias("pos", "tok"),
    )
    w = W.partitionBy(id_col).orderBy("pos")
    sh = F.concat_ws(" ", "tok", *[F.lead("tok", j).over(w) for j in range(1, k)])
    return (
        exploded.select(F.col(id_col), "n_tok", "pos", sh.alias("sh"))
        .filter(F.col("pos") <= F.greatest(F.col("n_tok") - F.lit(k), F.lit(0)))
        .select(id_col, "sh")
    )


def _hash_hex(value: Column, seed: int) -> Column:
    """Portable hash: md5 of 'seed:value' as a hex string.  Same-length
    lowercase hex compares lexicographically == numerically, and md5 is
    bit-identical in Spark and DuckDB — so min-over-hashes needs no
    hex->int conversion at all."""
    return F.md5(F.concat(F.lit(f"{seed}:"), value))


# -------------------------------------------------------------- minhash

def minhash_signature(text: Column, num_hashes: int = 16, shingle_k: int = 3) -> Column:
    """MinHash signature: array of num_hashes (string) min-over-shingles
    hashes.  NOTE: as a single nested expression this is fine for one
    projection, but referencing it repeatedly downstream makes Catalyst
    inline (= recompute) it per reference — use minhash_signatures (the
    explode+groupBy form) for multi-stage pipelines."""
    sh = word_shingles(text, shingle_k)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: _hash_hex(s, seed)))
            for seed in range(num_hashes)
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signatures as a DataFrame: explode shingles once, then ONE
    grouped aggregation computing all num_hashes mins in a single pass.

    The groupBy is a materialization barrier: downstream stages see
    concrete signature values instead of re-inlining the hash expression
    tree (which turned the naive column form into an exponential-size
    plan — 200s instead of ~2s on 500 docs).  min() over duplicate
    shingles equals min() over the distinct set, so no dedup pass is
    needed before hashing."""
    rows_df = shingle_rows(docs, text_col, id_col, shingle_k)
    mins = rows_df.groupBy(id_col).agg(
        *[F.min(_hash_hex(F.col("sh"), seed)).alias(f"mh{seed}") for seed in range(num_hashes)]
    )
    return mins.select(
        id_col, F.array(*[F.col(f"mh{s}") for s in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding over MinHash signatures.

    signature -> split into ``bands`` bands -> band hash -> docs sharing
    any band hash become candidates -> estimated Jaccard = fraction of
    matching signature positions.  The only join is bucket-equality —
    shuffle keys are (band_idx, band_hash), so skew is bounded by true
    duplicate-cluster size, not corpus size.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k)
    banded = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows + r + 1)
                                    for r in range(rows)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "sig", "band.band_idx", "band.band_hash")

    left = banded.select(
        F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band_idx", "band_hash"
    )
    right = banded.select(
        F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band_idx", "band_hash"
    )
    pairs = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x
        )
    )
    est = F.round(matches / F.lit(num_hashes), 4)
    return (
        pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )


# --------------------------------------------------------------- simhash

def simhash16(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash per document via one explode + grouped aggregation.

    Bit i of a token's hash = parity of the i-th hex char of md5(token)
    (ascii % 2) — weak but portable to SQL for oracle verification; the
    structure (explode -> 16 signed sums -> sign bits -> pack) is the
    real SimHash dataflow and swaps in a stronger hash trivially.
    """
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(parallelism).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    digest = F.md5(F.col("tok"))
    sums = [
        F.sum((F.ascii(F.substring(digest, i + 1, 1)) % 2) * 2 - 1).alias(f"s{i}")
        for i in range(16)
    ]
    agg = toks.groupBy(id_col).agg(*sums)
    packed = None
    for i in range(16):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        packed = bit if packed is None else packed + bit
    return agg.select(id_col, packed.cast("long").alias("simhash"))


# ------------------------------------------------------- n-gram jaccard

def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    block_words: int = 2,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity over k-word shingle sets, restricted to
    blocked candidate pairs (docs sharing their first ``block_words``
    lowercased words).  Blocking bounds the join output; the exact
    verification runs only inside blocks.  Shingle sets are built by
    the explode+collect_set pipeline (one split per doc, aggregation
    barrier) rather than a nested array expression."""
    toks = tokens(F.col(text_col))
    sets = (
        shingle_rows(docs, text_col, id_col, shingle_k)
        .groupBy(id_col)
        .agg(F.collect_set("sh").alias("shingles"))
    )
    prepared = docs.select(
        F.col(id_col),
        F.concat_ws(" ", *[F.element_at(toks, i + 1) for i in range(block_words)]).alias("blk"),
    ).join(sets, id_col)
    a = prepared.select(
        F.col(id_col).alias("doc_a"), F.col("blk"), F.col("shingles").alias("sh_a")
    )
    b = prepared.select(
        F.col(id_col).alias("doc_b"), F.col("blk"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union + F.lit(1e-9), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
