"""Text-analysis operators for large-scale document pipelines.

Language-ID (marker heuristic), quality scoring, token counting, and
document fingerprinting — all as built-in column expressions (no
Python UDFs), so they stay inside whole-stage codegen and scale to
100 TB document tables with zero serialization overhead.

Every function here is deliberately expressible in ANSI SQL so the
DuckDB oracle can verify it (plans/extensions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the heuristic language-ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
)


def let_expr(value: Column, body) -> Column:
    """Single-binding 'let' for column expressions: evaluate ``value``
    ONCE per row and reference it via the lambda variable
    (single-element-array transform).  Catalyst re-inlines a column
    expression everywhere it is referenced and codegen's
    common-subexpression elimination cannot cross lambda boundaries,
    so an O(n) expression referenced inside a per-element lambda
    otherwise costs O(n^2) per row (measured 12x on
    embed.hash_embeddings)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased).  split on single space —
    the corpus is single-space separated; a production corpus would use
    ``split(text, '\\\\s+')``."""
    return F.split(F.lower(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-like upper bound: ceil(bytes / 4) — the rule-of-thumb
    bytes-per-token constant, computed without any tokenizer model."""
    return F.ceil(F.octet_length(text) / F.lit(4.0)).cast("long")


# GPT-style pre-tokenizer shape: letter runs, single digits, punctuation
# runs.  Kept to constructs that match identically under Java regex
# (Spark) and RE2 (DuckDB) so the count is oracle-verifiable.
BPE_PRETOKEN_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]+"


def bpe_regex_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches in the
    lowercased text.  Closer to a real tokenizer's count than bytes/4
    (digits split individually, punctuation separates) while staying a
    pure JVM-side expression."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))).cast(
        "long"
    )


def hash60(value: Column, salt: str = "") -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of
    md5(salt||value) as an integer.  Bit-identical in Spark
    (``conv(...,16,10)``) and DuckDB (``('0x'||substr(...))::BIGINT``);
    always non-negative so ``%`` and ``min`` agree across engines."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), value)), 1, 15), 16, 10).cast("long")


# Rolling-hash parameters shared with the SQL oracles: polynomial fold
# base 31 mod 2^31-1 — intermediates stay < 2^36, overflow-safe in
# DuckDB (which errors on BIGINT overflow) as well as the JVM.
ROLLING_PRIME = 2_147_483_647


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash of
    the token-hash sequence, acc = (acc*31 + hash60(tok)) mod 2^31-1.
    Unlike the md5 ``fingerprint`` (which normalizes whitespace), this
    is the streaming-friendly form — computable incrementally per token
    — and any token insertion/deletion/reorder changes it."""
    hashed = F.transform(tokens(text), lambda t: hash60(t) % ROLLING_PRIME)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % ROLLING_PRIME,
    )


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """Number of tokens that are one of ``markers`` (exact word match)."""
    toks = tokens(text)
    hits = F.filter(toks, lambda t: t.isin(*markers))
    return F.size(hits).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: marker_hits(text, m) for lang, m in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """Predicted language = argmax marker-hit count; ties resolved in a
    fixed lang order; all-zero -> 'und' (undetermined)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr: Column = F.lit("und")
    # reversed so the first language in LANG_MARKERS wins ties
    for lang in reversed(list(scores)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def stopword_ratio(text: Column) -> Column:
    return marker_hits(text, STOPWORDS) / token_count(text)


def avg_word_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.size(toks)


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, 1]: rewards mid-length docs,
    presence of stopwords (natural language), and sane word lengths.
    Deterministic arithmetic only, deliberately UNROUNDED: identical
    per-row IEEE ops are bit-identical across engines, while round()
    itself diverges on decimal boundaries (see plans/relational._r)."""
    n_tok = token_count(text)
    length_ok = F.when((n_tok >= 20) & (n_tok <= 2000), F.lit(1.0)).otherwise(F.lit(0.5))
    stop = stopword_ratio(text)
    stop_ok = F.when((stop >= 0.01) & (stop <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    awl = avg_word_len(text)
    word_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_ok + stop_ok + word_ok) / F.lit(3.0)


def fingerprint(text: Column, length: int = 16) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text, truncated — the exact-dup clustering key."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")
    return F.substring(F.md5(normalized), 1, length)


def winnow_fingerprints(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
):
    """Winnowing (Schleimer/Wilkerson/Aiken, the MOSS fingerprinter):
    hash every k-token shingle, slide a window of ``window`` consecutive
    shingle hashes, keep each window's minimum — the selected set is a
    position-robust local fingerprint (guaranteed to share fingerprints
    with any copy that overlaps by >= window+k-1 tokens, unlike the
    whole-document rolling hash).

    One explode + one window-min + one distinct: the partition key is
    the document, so selection never shuffles shingles across docs.
    Returns distinct (id, fingerprint) rows.
    """
    from pyspark.sql import DataFrame, Window as W

    assert isinstance(docs, DataFrame)
    toks = tokens(F.col(text_col))
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    exploded = docs.repartition(parallelism).select(
        F.col(id_col),
        F.size(toks).alias("n_tok"),
        F.posexplode(toks).alias("pos", "tok"),
    )
    w = W.partitionBy(id_col).orderBy("pos")
    sh = F.concat_ws(" ", "tok", *[F.lead("tok", j).over(w) for j in range(1, k)])
    hashed = (
        exploded.select(F.col(id_col), "n_tok", "pos", sh.alias("sh"))
        .filter(F.col("pos") <= F.greatest(F.col("n_tok") - F.lit(k), F.lit(0)))
        .select(id_col, "pos", (hash60(F.col("sh")) % ROLLING_PRIME).alias("h"))
    )
    wmin = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    return (
        hashed.select(F.col(id_col), F.min("h").over(wmin).alias("fingerprint"))
        .distinct()
    )


def tfidf_top_terms(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_token_len: int = 3,
):
    """Top-k TF-IDF terms per document: explode tokens once, term
    frequency per (doc, term), smoothed idf = ln((N+1)/(df+1)) + 1,
    ranked window per doc.  Three shuffles total — (doc, term), (term),
    (doc) — each on well-spread keys; the doc-count N is a broadcast
    scalar.  Scores are rounded before ranking so rank order is
    identical across engines.

    The tf frame is multi-consumed (df leg + scoring leg) so it is
    PERSISTED — without it each consumer re-derives the corpus scan
    and token explode, which at 100 TB is the whole query cost (the
    p18 BM25 lesson; ReuseExchange does not fire because the two
    consumers prune different columns).  The only remaining second
    scan is the doc-count leg, column-pruned to the id."""
    from pyspark.sql import Window as W

    from ..cache import tracked_persist

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.length("term") >= min_token_len)
    tf = tracked_persist(toks.groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1) + 1e-9,
                6,
            ),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


# ------------------------------------------------------------ PII / URLs
#
# Regexes restricted to constructs with identical semantics under Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repetition,
# alternation — no lookaround, no backreferences.  A production corpus
# scrub would extend PII_PATTERNS; the mechanism (count + replace as
# pure codegen expressions) is the scale-relevant part — one text scan,
# zero Python.

PII_PATTERNS: dict[str, str] = {
    # label -> (pattern, replacement)
    "EMAIL": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}",
    "IPV4": "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "PHONE": "[0-9]{3}-[0-9]{3}-[0-9]{4}",
}

# Match order matters: IPV4 before PHONE is irrelevant (disjoint), but
# EMAIL must be redacted before IPV4 so "user@10.0.0.1"-style hosts are
# consumed by the email pass (both engines scan left-to-right,
# leftmost-longest within the alternatives given).
PII_ORDER: tuple[str, ...] = ("EMAIL", "IPV4", "PHONE")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts (before redaction)."""
    return {
        label: F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[label]), F.lit(0))).cast(
            "long"
        )
        for label in PII_ORDER
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its [LABEL] token, in PII_ORDER.
    Sequential regexp_replace passes — each is a single codegen'd scan
    of the (already short) string, and ordering makes the composition
    deterministic."""
    out = text
    for label in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[label], f"[{label}]")
    return out


URL_PATTERN = "https?://[a-zA-Z0-9.-]+(/[a-zA-Z0-9._/?=&%-]*)?"
# capture group 1 of this applied to a URL = the host
URL_HOST_PATTERN = "https?://([a-zA-Z0-9.-]+)"


def extract_urls(text: Column) -> Column:
    """All http(s) URLs in the text, in order (array<string>)."""
    return F.regexp_extract_all(text, F.lit(URL_PATTERN), F.lit(0))


def url_host(url: Column) -> Column:
    """Host part of a URL.  regexp_extract (not parse_url) so the exact
    same expression runs on the DuckDB oracle side."""
    return F.regexp_extract(url, URL_HOST_PATTERN, 1)


def registrable_domain(host: Column) -> Column:
    """Last two labels of the host (example.com from a.b.example.com) —
    the blocklist join key.  A production system would use the public
    suffix list; the two-label heuristic keeps the expression portable."""
    parts = F.split(host, "\\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


TRACKING_PARAM_PREFIXES: tuple[str, ...] = ("utm_", "fbclid=", "gclid=", "ref=")


def canonical_url(url: Column) -> Column:
    """Crawl-dedup canonical URL: lowercase scheme and host, drop the
    fragment, strip tracking parameters (utm_*, fbclid, gclid, ref),
    sort surviving query params, strip trailing path slashes.  The
    canonicalization a crawl frontier / URL-level dedup keys on —
    pure regex + array codegen, mirrored exactly by the SQL oracle.

    Non-absolute inputs (scheme-relative '//h/p', bare 'host/path')
    pass through UNCHANGED: every extraction below anchors on
    '^scheme://', so without the guard such URLs would all collapse to
    the single garbage key '://' and spuriously dedup against each
    other."""
    # fragment goes FIRST: a '?' inside the fragment must not be
    # mistaken for the query separator ('https://h/p#sec?x=1' has no
    # query at all)
    base = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.lower(F.regexp_extract(base, r"^[^:/]+://([^/?#]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract(base, r"^[^:/]+://[^/?#]+([^?#]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(base, r"\?(.*)$", 1)
    def _not_tracking(p):
        tracked = p.startswith(F.lit(TRACKING_PARAM_PREFIXES[0]))
        for pref in TRACKING_PARAM_PREFIXES[1:]:
            tracked = tracked | p.startswith(F.lit(pref))
        return (p != F.lit("")) & ~tracked

    kept = F.array_sort(F.filter(F.split(query, "&"), _not_tracking))
    qs = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    return F.when(
        url.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"),
        F.concat(scheme, F.lit("://"), host, path, qs),
    ).otherwise(url)


# ------------------------------------------------------ BPE pair stats

def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", top: int = 20
) -> DataFrame:
    """One round of byte-pair-encoding merge statistics (Sennrich et
    al. 2016) — the tokenizer-training primitive: count every adjacent
    CHARACTER pair across the corpus, weighted by word frequency, and
    rank the merge candidates.

    The scale trick is the same one real BPE trainers use: the corpus
    is scanned ONCE for word frequencies (vocabulary-sized output —
    orders of magnitude smaller than the corpus), and all pair
    arithmetic runs over the distinct vocabulary weighted by those
    frequencies.  Adjacent pairs expand via array expressions over the
    word (each occurrence position counts, as in BPE), one
    map-side-combinable sum per pair, TakeOrderedAndProject for the
    top-``top`` — nothing global sorts."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    n = F.length("word")
    pair_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.substr(F.col("word"), i, F.lit(1)).alias("left"),
                F.substr(F.col("word"), i + 1, F.lit(1)).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        words.select("freq", F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        .limit(top)
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-coverage report: build the top-``vocab_size`` word
    vocabulary by corpus frequency (deterministic ties on the word),
    then score every document's out-of-vocabulary token fraction — the
    signal that sizes a word/BPE vocabulary against a corpus (high OOV
    -> vocabulary too small or corpus off-domain).

    Scale shape: one corpus scan aggregates word frequencies
    (vocabulary-sized output), TakeOrderedAndProject keeps the top-V,
    and the OOV join broadcasts the vocabulary — the second corpus
    scan never shuffles.  Per doc: token count, OOV count, OOV rate."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(vocab_size)
        .select("word", F.lit(1).alias("__in_vocab"))
    )
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    return (
        toks.join(F.broadcast(words), "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
                / F.count("*")
                + F.lit(1e-9),
                4,
            ).alias("oov_rate"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining by pointwise mutual information: adjacent
    word pairs scored by ln(p(ab) / (p(a) p(b))) — high-PMI pairs are
    phrases (named entities, multiword terms) worth protecting from
    tokenization splits or using as phrase-query candidates.

    One corpus scan feeds both the unigram and bigram counts
    (vocabulary-sized outputs); the totals fold into broadcast
    scalars; ``min_count`` suppresses noise pairs and
    TakeOrderedAndProject keeps the top-``top`` — nothing global
    sorts."""
    from .dedup import shingle_arr
    from ..cache import tracked_persist

    # uni feeds the total AND both word-keyed joins; bi feeds its
    # total AND the scoring join — persist both vocabulary-sized
    # frames so the corpus explodes run once, not per consumer
    uni = tracked_persist(
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bi = tracked_persist(
        docs.select(F.explode(shingle_arr(F.col(text_col), 2)).alias("bg"))
        .filter(F.col("bg").contains(" "))
        .groupBy("bg")
        .agg(F.count("*").alias("cab"))
        .filter(F.col("cab") >= min_count)
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("left"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("right"),
            "cab",
        )
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bi = docs.select(F.explode(shingle_arr(F.col(text_col), 2)).alias("bg")).filter(
        F.col("bg").contains(" ")
    ).agg(F.count("*").alias("n_bi"))
    la = uni.select(F.col("w").alias("left"), F.col("c").alias("ca"))
    rb = uni.select(F.col("w").alias("right"), F.col("c").alias("cb"))
    pmi = F.round(
        F.log(
            (F.col("cab") / F.col("n_bi"))
            / ((F.col("ca") / F.col("n_uni")) * (F.col("cb") / F.col("n_uni")))
        )
        + F.lit(1e-9),
        4,
    )
    # unigram tables are vocabulary-sized: well-spread word-keyed joins,
    # NOT forced broadcasts (AQE may still broadcast when tiny)
    return (
        bi.join(la, "left")
        .join(rb, "right")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select("left", "right", F.col("cab").alias("pair_count"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("left"), F.asc("right"))
        .limit(top)
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Full BPE tokenizer training (Sennrich et al. 2016): iteratively
    pick the most frequent adjacent symbol pair and merge it, for
    ``n_merges`` rounds — the ranked merge list IS the tokenizer.

    Scale shape: the corpus is scanned ONCE into the word-frequency
    vocabulary (like bpe_pair_counts); every round then runs over that
    vocabulary-sized frame — one pair aggregate (map-side combinable),
    a 1-row argmax collect (bounded by n_merges, the standard
    iterative-driver pattern shared with k-means/PageRank), and a
    map-only leftmost-non-overlapping merge via an array fold.  The
    frame is localCheckpoint'ed per round to truncate the growing
    lineage.  Ties break deterministically (count desc, then left,
    then right asc) so the merge sequence is reproducible.

    Output: (merge_rank, left, right, pair_count) — one row per
    learned merge, rank 1 = first merge."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("word") >= 2)
        .select(
            F.split(F.col("word"), "").alias("syms"),
            "freq",
        )
        # lazy: each round's best-pair collect is the materializing
        # action (same job-halving as connected_components, r12)
        .localCheckpoint(eager=False)
    )
    merges = []
    for rank in range(1, n_merges + 1):
        pair_arr = F.zip_with(
            F.slice(F.col("syms"), 1, F.size("syms") - 1),
            F.slice(F.col("syms"), 2, F.size("syms") - 1),
            lambda a, b: F.struct(a.alias("left"), b.alias("right")),
        )
        best = (
            words.select("freq", F.explode(pair_arr).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0].pair_count <= 0:
            break
        l, r, cnt = best[0].left, best[0].right, best[0].pair_count
        merges.append((rank, l, r, cnt))
        # leftmost-non-overlapping merge: fold the symbol array; a pair
        # merged this step cannot immediately re-merge through its
        # right half (the `just` flag), matching reference BPE
        merged = F.aggregate(
            F.col("syms"),
            F.struct(
                F.array().cast("array<string>").alias("arr"),
                F.lit(False).alias("just"),
            ),
            lambda acc, s: F.when(
                (~acc["just"])
                & (F.size(acc["arr"]) > 0)
                & (F.element_at(acc["arr"], -1) == F.lit(l))
                & (s == F.lit(r)),
                F.struct(
                    F.concat(
                        F.slice(acc["arr"], 1, F.size(acc["arr"]) - 1),
                        F.array(F.lit(l + r)),
                    ).alias("arr"),
                    F.lit(True).alias("just"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(acc["arr"], F.array(s)).alias("arr"),
                    F.lit(False).alias("just"),
                )
            ),
            lambda acc: acc["arr"],
        )
        words = words.select(merged.alias("syms"), "freq").localCheckpoint(
            eager=False  # next round's collect materializes it
        )
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


def bpe_encoded_words(text: Column, merges: list) -> Column:
    """Column form of the BPE encode: array of space-joined symbol
    strings, one element per word — a pure codegen expression usable
    inside any single-scan projection (x91 composes it with lang-ID
    without a second corpus scan).

    Boundary-preserving encoding: symbols are joined with TWO spaces
    and each merge is one literal replace of ``' l  r '`` with
    ``' lr '``.  Every 2-space boundary donates exactly one space to a
    match and keeps one in the string (the replacement re-emits its
    outer spaces), so adjacent occurrences still find their leading
    boundary — e.g. 'banana' with merge (a,n) encodes to
    [b,an,an,a], exactly the leftmost-non-overlapping array fold used
    by ``bpe_train``.  (A single-space join under-merges: the first
    ``' a n '`` match consumes the space the next match needs,
    yielding [b,an,a,n,a].)  Equivalence to the fold is pinned by
    tests/test_operators.py::test_bpe_encode_matches_training_fold."""

    def encode_word(w):
        s = F.concat(F.lit("  "), F.concat_ws("  ", F.split(w, "")), F.lit("  "))
        for l, r in merges:
            s = F.replace(s, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
        return F.trim(F.replace(s, F.lit("  "), F.lit(" ")))

    return F.filter(F.transform(tokens(text), encode_word), lambda e: e != "")


def bpe_symbol_count(enc_words: Column) -> Column:
    """Total symbol count of a ``bpe_encoded_words`` array."""
    return F.aggregate(
        enc_words,
        F.lit(0).cast("long"),
        lambda acc, e: acc + F.size(F.split(e, " ")),
    )


def bpe_encode(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned BPE merge list to the corpus — the encode half
    of the tokenizer story (x77 trains, this tokenizes, x27 packs).

    ``merges`` is either a ``bpe_train`` output DataFrame (collected
    here — bounded by n_merges rows, the tokenizer artifact) or a list
    of (left, right) pairs in rank order.

    The merge application uses the boundary-preserving double-space
    encoding of ``bpe_encoded_words``: a word becomes ``'  c1  c2  '``
    (symbols are space-free by construction, so the representation is
    unambiguous) and each merge in rank order is ONE leftmost-
    non-overlapping string replace of ``' l  r '`` with ``' lr '`` —
    exactly the semantics of the training fold, incl. repeated
    adjacent pairs ('banana' -> [b,an,an,a]), but as a pure codegen
    expression chain: the whole encode is a map-only projection, no
    joins, no shuffles, no Python.  Scan cost O(len x n_merges) per
    word occurrence.

    Output: (id, encoded, n_words, n_symbols) — ``encoded`` joins
    words with ``' | '`` and symbols within a word with spaces."""
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("merge_rank").collect()
        ]
    enc_words = bpe_encoded_words(F.col(text_col), merges)
    return docs.select(F.col(id_col), enc_words.alias("__enc")).select(
        F.col(id_col),
        F.concat_ws(" | ", F.col("__enc")).alias("encoded"),
        F.size(F.col("__enc")).cast("long").alias("n_words"),
        bpe_symbol_count(F.col("__enc")).alias("n_symbols"),
    )


def rake_keyphrases(
    docs: DataFrame,
    top: int = 20,
    min_count: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    degree/frequency (degree = summed length of the phrases it appears
    in); a phrase scores the sum of its words' scores.  Corpus-level:
    identical phrases aggregate, and the top-``top`` by score are the
    corpus's keyphrases — the classic model-free keyword extractor
    next to TF-IDF (per-doc salience) and PMI (two-word collocations).

    Scale shape: phrase splitting is a pure regex projection; word
    statistics and phrase scores are vocabulary-sized grouped counts;
    ranking is TakeOrderedAndProject.  The stopword split regex is
    shared verbatim with the SQL oracle."""
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"
    phrases = (
        docs.select(
            F.explode(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), stop_re, "|"), r"\|")
            ).alias("p")
        )
        .select(F.trim(F.col("p")).alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    # len counts NON-EMPTY words only (consecutive spaces in the source
    # text otherwise inflate len and deflate the occurrence count)
    pw = phrases.select(
        "phrase",
        F.size(
            F.filter(F.split(F.col("phrase"), " "), lambda w: w != "")
        ).alias("len"),
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
    ).filter(F.col("word") != "")
    words = pw.groupBy("word").agg(
        F.count("*").alias("freq"), F.sum("len").alias("degree")
    )
    scored = (
        pw.join(words, "word")
        .groupBy("phrase")
        .agg(
            (F.count("*") / F.first("len")).alias("n_occurrences_raw"),
            F.sum(F.col("degree") / F.col("freq")).alias("score_sum"),
            F.first("len").alias("len"),
        )
    )
    return (
        scored.select(
            "phrase",
            (F.col("n_occurrences_raw")).cast("long").alias("n_occurrences"),
            F.round(F.col("score_sum") / F.col("n_occurrences_raw") + F.lit(1e-9), 4).alias(
                "rake_score"
            ),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.desc("rake_score"), F.asc("phrase"))
        .limit(top)
    )


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer: Viterbi hard-EM training
# over a substring candidate vocabulary, then prune by loss
# contribution.  Completes the tokenizer-family story next to BPE
# (bpe_train/bpe_encode) and the fertility/budget reports that consume
# tokenizers (x166/x168/x170).
#
# Determinism kit: piece probabilities are carried as INTEGER
# micro-nat code lengths, cost(piece) = floor(ln(total/cnt) * 1e6 +
# 0.5) — DP comparisons, tie-breaks (lower cost, then smaller start
# position), Laplace counts, and the contribution ranking are all
# exact integer arithmetic, so Spark, DuckDB (unrolled-CTE replay) and
# the sequential Python reference in tests agree bit-for-bit.  The
# only float op is the one ln per piece per iteration, rounded to a
# micro-nat — a cross-libm 1-ulp difference moves the integer only if
# the true value sits within ~1e-9 of a rounding boundary.

UNIGRAM_MAX_WORD_LEN = 12
UNIGRAM_MAX_PIECE_LEN = 4
UNIGRAM_VOCAB_MULTI = 40
UNIGRAM_KEEP_MULTI = 24
UNIGRAM_ITERATIONS = 2

_VIT_BIG = 1 << 40  # any real word cost << this; missing-piece sentinel
_VIT_UNREACH = 1 << 41  # unreachable DP slot (filtered before compare)


def _cost_map_literal(model: list[tuple[str, int]]) -> Column:
    """map<piece, cost_micro> literal from a collected model — the
    tokenizer artifact is vocab-bounded by construction, so inlining it
    keeps the per-word DP a pure codegen expression (no join).

    Scale boundary: a map literal is right while the vocabulary is
    expression-sized (the default chars + 40/24 multi-char pieces —
    and comfortably up to a few thousand).  A production 32k-100k
    SentencePiece vocabulary would blow up the generated expression;
    the scale path there is the x173 distinct-word shape taken one
    step further: explode each distinct word's (i, len) substring
    grid, JOIN the piece-cost table on the well-spread piece key,
    regroup to a per-word map_from_entries, and run the same fold on
    the per-word map column — same DP, join-fed instead of inlined
    (the nb_score broadcast_max_rows gating discipline)."""
    entries = []
    for piece, cost in model:
        entries.append(F.lit(piece))
        entries.append(F.lit(int(cost)).cast("long"))
    return F.create_map(*entries)


def _viterbi_dp(w: Column, cost_map: Column, max_piece_len: int) -> Column:
    """dp array for word ``w``: element j+1 is struct(c=min total
    micro-nat cost of segmenting the first j chars, b=backpointer).
    One left fold over positions; each step takes the array_min over
    the <= max_piece_len candidate predecessors — struct comparison is
    lexicographic (cost, then start position), which IS the tie rule
    (prefer the longer final piece)."""

    def step(acc: Column, j: Column) -> Column:
        cand = F.filter(
            F.transform(
                F.sequence(F.greatest(F.lit(0), j - max_piece_len), j - F.lit(1)),
                lambda i: F.struct(
                    (
                        F.element_at(acc, i + 1)["c"]
                        + F.coalesce(
                            F.element_at(cost_map, F.substring(w, i + 1, j - i)),
                            F.lit(_VIT_BIG).cast("long"),
                        )
                    ).alias("c"),
                    i.cast("int").alias("b"),
                ),
            ),
            lambda s: s["c"] < F.lit(_VIT_BIG),
        )
        best = F.coalesce(
            F.array_min(cand),
            F.struct(
                F.lit(_VIT_UNREACH).cast("long").alias("c"),
                F.lit(-1).alias("b"),
            ),
        )
        return F.concat(acc, F.array(best))

    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.array(
            F.struct(F.lit(0).cast("long").alias("c"), F.lit(-1).alias("b"))
        ),
        step,
    )


def _viterbi_pieces(w: Column, dp: Column) -> Column:
    """Backtrack the dp array into the argmin segmentation (array of
    pieces, right-to-left order — callers only count/explode).  An
    unreachable word (possible only at encode time with an
    out-of-vocabulary character) yields an empty array."""

    def step(acc: Column, _: Column) -> Column:
        bp = F.element_at(dp, acc["pos"] + 1)["b"]
        return F.when(acc["pos"] <= 0, acc).otherwise(
            F.struct(
                bp.alias("pos"),
                F.concat(
                    acc["ps"], F.array(F.substring(w, bp + 1, acc["pos"] - bp))
                ).alias("ps"),
            )
        )

    reachable = F.element_at(dp, F.length(w) + 1)["c"] < F.lit(_VIT_BIG)
    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.struct(
            F.when(reachable, F.length(w).cast("int"))
            .otherwise(F.lit(0))
            .alias("pos"),
            F.array().cast("array<string>").alias("ps"),
        ),
        step,
        lambda acc: acc["ps"],
    )


def _micro_cost(total: int, cnt: int) -> int:
    import math

    return int(math.floor(math.log(total / cnt) * 1e6 + 0.5))


def _word_freqs(docs: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    """(w, freq): corpus word frequencies, words truncated to
    ``max_word_len`` chars — the ONE corpus scan; everything after is
    vocabulary-sized."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .select(F.substring(F.col("word"), 1, max_word_len).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def unigram_lm_train(
    docs: DataFrame,
    vocab_multi: int = UNIGRAM_VOCAB_MULTI,
    keep_multi: int = UNIGRAM_KEEP_MULTI,
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
    iterations: int = UNIGRAM_ITERATIONS,
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo 2018, SentencePiece), hard-EM
    variant: candidate pieces are all word substrings of length <=
    ``max_piece_len`` (all single chars + the ``vocab_multi`` most
    frequent multi-char pieces); each EM iteration Viterbi-segments
    every distinct word under the current model and re-estimates piece
    probabilities from the (word-frequency-weighted) usage counts with
    add-one smoothing; after ``iterations`` rounds the vocabulary is
    pruned to all chars + the ``keep_multi`` multi-char pieces with the
    largest loss contribution cnt x cost (the total micro-nats the
    piece encodes — Kudo's prune criterion without the re-segmentation
    term), and final code lengths are renormalized over the survivors.

    Scale shape (the bpe_train/k-means iterative-driver pattern): the
    corpus is scanned ONCE into the distinct-word frequency frame
    (localCheckpoint'ed, reused every iteration); the per-word Viterbi
    DP is a pure codegen fold (no joins, no Python) over that frame
    with the model inlined as a map literal; driver state is bounded
    by the VOCABULARY PARAMS (chars + vocab_multi rows collected per
    iteration), never by corpus size.

    Output: (piece, piece_len, cnt, cost_micro, contribution) — cnt is
    the post-EM smoothed count, cost_micro = floor(ln(total/cnt)*1e6 +
    0.5) over the pruned vocabulary, contribution the pre-prune ranking
    key.  All integers.

    Implementation: the corpus reduces to the (w, freq) word-frequency
    frame in one scan, then delegates to ``unigram_lm_train_from_words``
    — the same entry point the streaming twin's maintained
    word-frequency store feeds (streaming/sinks.py make_wordfreq_sink),
    so the continuously-retrained model is bit-equal to this operator
    by construction (word counts are sum-mergeable)."""
    return unigram_lm_train_from_words(
        _word_freqs(docs, text_col, max_word_len),
        vocab_multi=vocab_multi,
        keep_multi=keep_multi,
        max_piece_len=max_piece_len,
        iterations=iterations,
    )


def unigram_lm_train_from_words(
    word_freqs: DataFrame,
    vocab_multi: int = UNIGRAM_VOCAB_MULTI,
    keep_multi: int = UNIGRAM_KEEP_MULTI,
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
    iterations: int = UNIGRAM_ITERATIONS,
) -> DataFrame:
    """``unigram_lm_train`` over a pre-aggregated (w, freq)
    word-frequency frame — the shared core of the batch operator and
    the streaming view (whose maintained state is exactly these
    sum-mergeable word counts).  The frame is localCheckpoint'ed here:
    candidate mining and every EM iteration's Viterbi pass re-scan it.
    EAGER (r13, reversing the r12 lazy form on measurement — VERDICT
    r12 item 7): the candidate aggregate reaches this frame through
    the substring explode, and the r13 interleaved A/B measured the
    eager materialization consistently faster (x172 median 1.52 ->
    1.41s, x176 2.85 -> 2.69s, all three eager totals below all three
    lazy totals in one band window) — the lazy form's saved job does
    not pay for the cold-frame recompute exposure here."""
    wf = word_freqs.localCheckpoint(eager=True)

    cand = (
        wf.select(
            "w",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
        )
        .select(
            "w",
            "freq",
            "i",
            F.explode(F.sequence(F.lit(1), F.lit(max_piece_len))).alias("l"),
        )
        .filter(F.col("i") + F.col("l") - 1 <= F.length("w"))
        .select(F.substring(F.col("w"), F.col("i"), F.col("l")).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        # EAGER on purpose: the vocabulary collect below references
        # this frame through TWO branches (chars + multi) — left cold,
        # both branches race to recompute the substring aggregate
        # (measured +0.4s); materializing it first also caches wf.
        .localCheckpoint()
    )
    chars = cand.filter(F.length("piece") == 1)
    multi = (
        cand.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(vocab_multi)
    )
    # the tokenizer vocabulary: bounded by params (all corpus chars +
    # vocab_multi pieces), THE artifact being trained — collect is the
    # iterative-driver pattern shared with bpe_train's per-round argmax
    kept = sorted(
        (r["piece"], int(r["cnt"])) for r in chars.unionAll(multi).collect()
    )
    total = sum(c for _, c in kept)
    model = [(p, _micro_cost(total, c)) for p, c in kept]

    counts = dict(kept)
    for _ in range(iterations):
        cost_map = _cost_map_literal(model)
        dp = _viterbi_dp(F.col("w"), cost_map, max_piece_len)
        seg = (
            wf.select("freq", _viterbi_pieces(F.col("w"), dp).alias("ps"))
            .select("freq", F.explode("ps").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("used"))
        )
        used = {r["piece"]: int(r["used"]) for r in seg.collect()}
        counts = {p: used.get(p, 0) + 1 for p, _ in kept}
        total = sum(counts.values())
        model = [(p, _micro_cost(total, counts[p])) for p in counts]

    # prune by loss contribution: chars are never pruned (coverage);
    # multi-char pieces keep the keep_multi largest cnt x cost
    cost = dict(model)
    contrib = {p: counts[p] * cost[p] for p in counts}
    multi_kept = sorted(
        (p for p in counts if len(p) >= 2),
        key=lambda p: (-contrib[p], p),
    )[:keep_multi]
    final_pieces = sorted([p for p in counts if len(p) == 1] + multi_kept)
    final_total = sum(counts[p] for p in final_pieces)
    rows = [
        (p, len(p), counts[p], _micro_cost(final_total, counts[p]), contrib[p])
        for p in final_pieces
    ]
    return word_freqs.sparkSession.createDataFrame(
        rows,
        "piece string, piece_len int, cnt long, cost_micro long, contribution long",
    )


def unigram_lm_encode(
    docs: DataFrame,
    model,
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Viterbi-encode the corpus with a trained unigram-LM model — the
    encode half of the tokenizer (unigram_lm_train trains, this
    tokenizes), mirroring bpe_encode for the BPE family.

    ``model`` is a ``unigram_lm_train`` output DataFrame (collected
    here — vocab-bounded, the tokenizer artifact) or a list of
    (piece, cost_micro) pairs.

    Scale shape: word stats (min-cost segmentation length + cost) are
    computed ONCE per DISTINCT word — the same codegen DP fold as
    training over the vocabulary-sized word frame — then joined back to
    the exploded corpus on the word key (well-spread, vocabulary-sized
    build side; AQE broadcasts when tiny) and rolled up per document.
    A word containing a character outside the model's coverage is
    unreachable and reported in ``n_oov_words`` (words are truncated to
    ``max_word_len`` exactly as in training).

    Output: (id, n_words, n_oov_words, n_pieces, total_cost_micro)."""
    if isinstance(model, DataFrame):
        model = [
            (r["piece"], int(r["cost_micro"]))
            for r in model.select("piece", "cost_micro").collect()
        ]
    cost_map = _cost_map_literal(model)

    dw = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "").select(
        id_col, F.substring(F.col("word"), 1, max_word_len).alias("w")
    )
    dp = _viterbi_dp(F.col("w"), cost_map, max_piece_len)
    wstats = (
        dw.select("w")
        .distinct()
        .select("w", dp.alias("dp"))
        .select(
            "w",
            F.element_at(F.col("dp"), F.length("w") + 1)["c"].alias("wcost"),
            F.size(_viterbi_pieces(F.col("w"), F.col("dp"))).alias("np"),
        )
        .select(
            "w",
            F.when(F.col("wcost") < F.lit(_VIT_BIG), F.col("wcost")).alias("wcost"),
            F.when(F.col("wcost") < F.lit(_VIT_BIG), F.col("np")).alias("np"),
        )
    )
    return (
        dw.join(wstats, "w", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            (F.count("*") - F.count("np")).cast("long").alias("n_oov_words"),
            F.coalesce(F.sum("np"), F.lit(0)).cast("long").alias("n_pieces"),
            F.coalesce(F.sum("wcost"), F.lit(0)).cast("long").alias(
                "total_cost_micro"
            ),
        )
    )


def tokenizer_compare(
    docs: DataFrame,
    bpe_merges: list,
    unigram_model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Side-by-side corpus compression report for the two trained
    tokenizer families (BPE merge list vs unigram-LM model) on the
    SAME corpus — the pick-a-tokenizer decision table: fewer pieces
    per word = cheaper training tokens for the same text.

    Unigram accounting covers segmentable words only (OOV words are
    excluded from both numerator and denominator — they have no piece
    count); BPE covers every word by construction.

    Scale shape: two map-only encode passes (the codegen replace chain
    and the distinct-word DP join) + one 1-row aggregate each — no new
    shuffle beyond the encodes themselves.

    Output: (tokenizer, n_words, n_pieces, pieces_per_word)."""
    bpe = bpe_encode(docs, bpe_merges, text_col=text_col, id_col=id_col).agg(
        F.sum("n_words").cast("long").alias("w"),
        F.sum("n_symbols").cast("long").alias("p"),
    )
    uni = unigram_lm_encode(
        docs, unigram_model, text_col=text_col, id_col=id_col
    ).agg(
        (F.sum("n_words") - F.sum("n_oov_words")).cast("long").alias("w"),
        F.sum("n_pieces").cast("long").alias("p"),
    )
    ratio = (
        F.round(
            F.col("p").cast("double") / F.col("w").cast("double") + F.lit(1e-9), 6
        )
        + F.lit(0.0)
    ).alias("pieces_per_word")
    return bpe.select(
        F.lit("bpe").alias("tokenizer"),
        F.col("w").alias("n_words"),
        F.col("p").alias("n_pieces"),
        ratio,
    ).unionByName(
        uni.select(
            F.lit("unigram").alias("tokenizer"),
            F.col("w").alias("n_words"),
            F.col("p").alias("n_pieces"),
            ratio,
        )
    )


def code_switching_report(
    docs: DataFrame,
    chunk_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document language-consistency (code-switching) report: the
    document is cut into fixed-size token chunks (x42's map-only
    chunker, zero overlap), each chunk gets the x07 marker lang-id,
    and the per-doc rollup answers 'is this document monolingual?' —
    the curation gate that catches mixed-language web text and
    template/boilerplate splices that a whole-doc argmax hides (the
    majority language wins the whole-doc vote even when half the
    chunks disagree).

    Output per doc: n_chunks, n_langs (distinct non-'und' chunk
    languages), majority_lang (most chunks, tie by lang asc; NULL when
    every chunk is 'und'), agreement (majority / scored chunks, 4-dp),
    code_switched (n_langs >= 2).

    Scale shape: chunking is a pure projection (one scan, no shuffle);
    the only exchanges are the (doc, chunk_lang) count aggregate and
    the per-doc rollups — all keyed on the well-spread doc id, all
    bounded by chunks-per-doc."""
    from pyspark.sql import Window as W

    from .curation import chunk_documents

    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=0,
        text_col=text_col, id_col=id_col,
    )
    per = (
        chunks.select(F.col(id_col), lang_id(F.col("chunk_text")).alias("cl"))
        .groupBy(id_col, "cl")
        .agg(F.count("*").cast("long").alias("n"))
    )
    scored = per.filter(F.col("cl") != "und")
    w = W.partitionBy(id_col).orderBy(F.col("n").desc(), F.col("cl").asc())
    top = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("cl").alias("majority_lang"),
            F.col("n").alias("n_major"),
        )
    )
    tot = per.groupBy(id_col).agg(F.sum("n").cast("long").alias("n_chunks"))
    sct = scored.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_scored"),
        F.countDistinct("cl").cast("long").alias("n_langs"),
    )
    return (
        tot.join(sct, id_col, "left")
        .join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_chunks",
            F.coalesce(F.col("n_langs"), F.lit(0)).cast("long").alias("n_langs"),
            "majority_lang",
            F.round(
                F.col("n_major").cast("double") / F.col("n_scored").cast("double")
                + F.lit(1e-9),
                4,
            ).alias("agreement"),
            F.coalesce(F.col("n_langs") >= 2, F.lit(False)).alias("code_switched"),
        )
    )


def pii_pseudonym_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudonymization map: every PII entity replaced by a STABLE
    surrogate (first 16 hex of md5('pseud|' || TYPE || '|' || entity))
    so analytics keep joinability — the same email maps to the same
    surrogate in every document — while the raw entity never leaves
    this projection (the output carries only surrogates and counts;
    redaction (x33) destroys joins, pseudonymization preserves them,
    the standard GDPR-pipeline distinction).

    Extraction is SEQUENTIAL in PII_ORDER on progressively-redacted
    text — exactly redact_pii's consumption semantics, so any overlap
    between patterns resolves in the same fixed order as the
    redaction pass.

    Output: (entity_type, surrogate, n_docs, n_occurrences) — one row
    per distinct entity per type; map-only extraction, one aggregate
    keyed on the well-spread surrogate."""
    frames = []
    cur = F.col(text_col)
    for label in PII_ORDER:
        matches = F.regexp_extract_all(cur, F.lit(PII_PATTERNS[label]), F.lit(0))
        frames.append(
            docs.select(
                F.col(id_col), F.explode(matches).alias("entity")
            ).select(
                F.lit(label).alias("entity_type"),
                F.substring(
                    F.md5(F.concat(F.lit(f"pseud|{label}|"), F.col("entity"))),
                    1,
                    16,
                ).alias("surrogate"),
                F.col(id_col),
            )
        )
        cur = F.regexp_replace(cur, PII_PATTERNS[label], f"[{label}]")
    allm = frames[0]
    for f in frames[1:]:
        allm = allm.unionByName(f)
    return allm.groupBy("entity_type", "surrogate").agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_occurrences"),
    )
