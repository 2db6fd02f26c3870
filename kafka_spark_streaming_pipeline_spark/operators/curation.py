"""Corpus-curation operators for training-data pipelines.

The reference pipeline stops at ingest/validate/store
(spark_job/spark_streaming.py); a training-data engine additionally
needs the curation passes that sit between a raw crawl and a tokenized
dataset.  This module adds the standard ones:

- eval-set decontamination (n-gram overlap against a held-out set),
- deterministic hash-based train/val/test split,
- token-budget sequence packing (context-window bin assignment),
- stratified sampling (per-stratum deterministic hash rank),
- repetition filtering (Gopher-style top-bigram fraction),
- temperature-scaled source-mixture weights (data mixing),
- unigram LM quality scoring (CCNet-style mean log-probability).

Scale design:
- decontamination broadcasts the (small) eval gram set — the 100 TB
  train side is never shuffled, each partition probes the broadcast
  hash set locally.
- hash split / repetition are pure projections or one well-spread
  shuffle keyed on doc_id — no global ordering anywhere.
- packing is sequential *within a shard* by construction (a cumulative
  sum), so it partitions by the shard column and orders only inside
  each shard — 20 sources here, thousands of input files at 100 TB.
- stratified sampling ranks within each stratum only (lang here), and
  the rank key is a hash, so no stratum needs a global sort of more
  than its own rows.

All arithmetic is md5/integer-based (operators/text.hash60) so every
operator is value-checkable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .dedup import shingle_arr
from .text import hash60, token_count, tokens as tokens_of

# ------------------------------------------------------- decontamination


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Per-train-document eval-set contamination report.

    Both sides are reduced to their distinct k-word-gram sets; the eval
    gram set (held-out benchmark, small by assumption) is broadcast and
    left-joined against the exploded train grams, so the train corpus is
    read once and never shuffled on the join.  Output per train doc:
    distinct gram count, grams also present in the eval set, the overlap
    ratio, and a ``contaminated`` flag at ``flag_threshold``.
    """
    train_grams = (
        train.select(id_col, F.explode(F.array_distinct(shingle_arr(F.col(text_col), k))).alias("gram"))
    )
    eval_grams = (
        eval_set.select(F.explode(F.array_distinct(shingle_arr(F.col(text_col), k))).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    joined = train_grams.join(F.broadcast(eval_grams), "gram", "left")
    ratio = F.round(
        F.sum("hit") / F.count("*") + F.lit(1e-9), 4
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.coalesce(ratio, F.lit(0.0)).alias("contamination_ratio"),
        )
        .withColumn("contaminated", F.col("contamination_ratio") >= flag_threshold)
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter contamination screen — ``decontaminate``'s shape at
    the scale where even the BROADCAST eval gram set is too big: the
    eval set folds into a fixed ~8 KB bit array (sketches.bloom_build /
    bloom_pack) and each train gram tests membership with a pure column
    expression — NO join against the gram set at all, so the train scan
    is map-only up to the final per-doc aggregate.

    Bloom semantics: no false negatives (every truly-shared gram is
    flagged — the guarantee decontamination needs: contaminated docs
    cannot slip through), false positives at the sketch's tunable rate
    only INFLATE the score.  Screen with this, then confirm flagged
    docs with the exact join (decontaminate) on the tiny flagged
    subset — the same two-phase economics as LSH -> exact verify."""
    from .sketches import bloom_build, bloom_pack, bloom_probe

    eval_grams = (
        eval_set.select(
            F.explode(F.array_distinct(shingle_arr(F.col(text_col), k))).alias("gram")
        )
        .distinct()
    )
    packed = bloom_pack(bloom_build(eval_grams, "gram"))
    train_grams = train.select(
        id_col,
        F.explode(F.array_distinct(shingle_arr(F.col(text_col), k))).alias("gram"),
    )
    probed = bloom_probe(packed, train_grams, "gram")
    return (
        probed.groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("bloom_hit").cast("long").alias("n_flagged"),
            F.round(
                F.sum("bloom_hit") / F.count("*") + F.lit(1e-9), 4
            ).alias("bloom_ratio"),
        )
    )


def decontaminate_tiered(
    train: DataFrame,
    eval_set: DataFrame,
    k: int = 5,
    shingle_k: int = 3,
    flag_threshold: float = 0.2,
    containment_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tiered eval-set decontamination — the three screens unified
    with escalating cost and a per-doc verdict + attribution:

    1. BLOOM screen (map-only over the full corpus, ~8 KB broadcast
       state): ``n_flagged == 0`` proves clean (no false negatives),
       and that is the overwhelming majority of a real corpus — they
       exit at tier 'bloom' having paid zero joins.
    2. EXACT k-gram join, on the Bloom SUSPECTS only: clears the
       Bloom false positives (tier 'gram', clean) and convicts docs
       whose distinct-gram overlap ratio >= ``flag_threshold``
       (tier 'gram', contaminated).
    3. CONTAINMENT verify, on the GRAY ZONE only (0 < ratio <
       threshold): the ratio normalizes by TRAIN doc size, so a huge
       page embedding one complete eval item sails under the
       threshold — exactly the leak this tier exists for.  Score
       max over eval docs of |shared shingles| / |eval doc shingles|
       (eval-side containment); >= ``containment_threshold`` convicts
       at tier 'containment'.

    Scale shape: tier 1 never shuffles the corpus; tiers 2-3 re-read
    only the suspect subset (left-semi join) against the BROADCAST
    eval grams/shingles.  Output per train doc: the three tiers'
    evidence columns, ``verdict`` ('clean'/'contaminated') and
    ``tier`` — which screen decided."""
    from ..cache import tracked_persist

    # the per-doc screen verdicts feed the suspect semi-join AND the
    # final assembly; the exact-tier verdicts feed the gray-zone ids
    # AND the final assembly — persist both (narrow per-doc rows) so
    # each tier's corpus work runs once, not once per consumer
    screen = tracked_persist(
        bloom_decontaminate(train, eval_set, k, text_col, id_col)
    )
    suspect_ids = screen.filter(F.col("n_flagged") > 0).select(id_col)
    suspects = train.join(suspect_ids, id_col, "left_semi")

    exact = tracked_persist(
        decontaminate(
            suspects, eval_set, k, text_col, id_col, flag_threshold
        ).select(id_col, "n_contaminated", "contamination_ratio")
    )

    # tier 3 input: gray-zone ids (some overlap, below the ratio bar)
    gray_ids = exact.filter(
        (F.col("n_contaminated") > 0)
        & (F.col("contamination_ratio") < flag_threshold)
    ).select(id_col)
    gray = train.join(gray_ids, id_col, "left_semi")
    ev_sh = eval_set.select(
        F.col(id_col).alias("__eval_id"),
        F.explode(
            F.array_distinct(shingle_arr(F.col(text_col), shingle_k))
        ).alias("sh"),
    )
    ev_sizes = ev_sh.groupBy("__eval_id").agg(F.count("*").alias("__ev_n"))
    gray_sh = gray.select(
        id_col,
        F.explode(
            F.array_distinct(shingle_arr(F.col(text_col), shingle_k))
        ).alias("sh"),
    )
    containment = (
        gray_sh.join(F.broadcast(ev_sh), "sh")
        .groupBy(id_col, "__eval_id")
        .agg(F.count("*").alias("__shared"))
        .join(F.broadcast(ev_sizes), "__eval_id")
        .groupBy(id_col)
        .agg(
            F.round(
                F.max(F.col("__shared") / F.col("__ev_n")) + F.lit(1e-9), 4
            ).alias("max_eval_containment")
        )
    )

    out = (
        screen.join(exact, id_col, "left")
        .join(containment, id_col, "left")
    )
    ratio = F.col("contamination_ratio")
    cont = F.col("max_eval_containment")
    tier = (
        F.when(F.col("n_flagged") == 0, F.lit("bloom"))
        .when(
            (F.col("n_contaminated") == 0) | (ratio >= flag_threshold),
            F.lit("gram"),
        )
        .otherwise(F.lit("containment"))
    )
    verdict = (
        F.when(F.col("n_flagged") == 0, F.lit("clean"))
        .when(F.col("n_contaminated") == 0, F.lit("clean"))
        .when(ratio >= flag_threshold, F.lit("contaminated"))
        .when(
            F.coalesce(cont, F.lit(0.0)) >= containment_threshold,
            F.lit("contaminated"),
        )
        .otherwise(F.lit("clean"))
    )
    return out.select(
        id_col,
        "n_grams",
        "n_flagged",
        "bloom_ratio",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias(
            "n_contaminated"
        ),
        F.coalesce(ratio, F.lit(0.0)).alias("contamination_ratio"),
        cont.alias("max_eval_containment"),
        verdict.alias("verdict"),
        tier.alias("tier"),
    )


def decontamination_report(tiered: DataFrame) -> DataFrame:
    """Yield report over a ``decontaminate_tiered`` result: docs and
    share per (tier, verdict) — which screens did the work and what
    fraction of the corpus survived (the x55-style accounting view)."""
    total = tiered.agg(F.count("*").alias("__total"))
    return (
        tiered.groupBy("tier", "verdict")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .select(
            "tier",
            "verdict",
            "n_docs",
            F.round(F.col("n_docs") / F.col("__total") + F.lit(1e-9), 4).alias(
                "share"
            ),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 64,
    select_quantile: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every raw document by how target-like its
    HASHED N-GRAM feature distribution is, then select the top tail.

    Both corpora reduce to ``n_buckets`` hashed feature counts
    (unigrams + bigrams, md5-bucketed — the paper's hashed n-gram
    generative model): p = target bucket distribution, q = raw bucket
    distribution, both add-1 smoothed.  A document's weight is the MEAN
    per-feature log importance ratio ln(p_b/q_b) over its feature
    occurrences (mean, not sum, so length doesn't bias selection);
    ``selected`` marks the top ``1-select_quantile`` tail by exact
    percentile.

    Scale shape: the bucket tables are ``n_buckets`` rows TOTAL
    regardless of corpus size (one map-side-combinable count each); the
    log-ratio table broadcasts; per-doc scoring is one scan + one
    per-doc aggregate.  The quantile is one tiny scalar aggregate over
    doc weights — nothing global ever sorts."""
    feats = lambda df: df.select(  # noqa: E731
        F.col(id_col),
        F.explode(
            F.concat(
                shingle_arr(F.col(text_col), 1), shingle_arr(F.col(text_col), 2)
            )
        ).alias("feat"),
    ).select(
        id_col, (hash60(F.col("feat"), salt="dsir|") % n_buckets).alias("bucket")
    )
    raw_b = feats(raw)
    tgt_b = feats(target)
    # localCheckpoint the two <= n_buckets-row count tables: totals and
    # the ratio grid both re-reference them, and without the barrier
    # every reference re-runs the full corpus feature scan
    tc = tgt_b.groupBy("bucket").agg(F.count("*").alias("tc")).localCheckpoint()
    rc = raw_b.groupBy("bucket").agg(F.count("*").alias("rc")).localCheckpoint()
    grid = raw_b.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    # coalesce: an EMPTY side sums to null; add-1 smoothing keeps the
    # ratio defined either way (empty target -> uniform smoothed target)
    totals = (
        tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("t_tot"))
        .crossJoin(rc.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("r_tot")))
    )
    lr = (
        grid.join(tc, "bucket", "left")
        .join(rc, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    ((F.coalesce(F.col("tc"), F.lit(0)) + 1)
                     / (F.col("t_tot") + n_buckets).cast("double"))
                    / ((F.coalesce(F.col("rc"), F.lit(0)) + 1)
                       / (F.col("r_tot") + n_buckets).cast("double"))
                )
                + F.lit(1e-9),
                6,
            ).alias("log_ratio"),
        )
    )
    # persist the narrow per-doc weight frame: the percentile cut and
    # the final selection both read it — without the barrier the raw
    # corpus feature scan would run once per reference (standard
    # two-pass threshold shape; (id, count, weight) rows spill fine)
    from ..cache import tracked_persist

    weights = tracked_persist(
        raw_b.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.avg("log_ratio") + F.lit(1e-9), 4).alias("dsir_weight"),
        )
    )
    # exact percentile with BOUNDED state: weights are rounded to 4 dp,
    # so the (weight, freq) histogram has a bounded number of rows no
    # matter the corpus size; percentile-with-frequency over it equals
    # the exact percentile over the raw multiset (same definition), but
    # the aggregate buffers the histogram, never one value per document
    wc = weights.groupBy("dsir_weight").agg(F.count("*").alias("__freq"))
    cut = wc.agg(
        F.round(
            F.percentile("dsir_weight", F.lit(select_quantile), F.col("__freq"))
            + F.lit(1e-9),
            4,
        ).alias("__cut")
    )
    return (
        weights.crossJoin(F.broadcast(cut))
        .withColumn("selected", F.col("dsir_weight") >= F.col("__cut"))
        .drop("__cut")
    )


def split_lines(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode a text column into (id, line_no, line) rows on newlines
    — the input shape ``line_dedup`` consumes.  Map-only."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )


def line_dedup(
    lines: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet / RefinedWeb-style LINE-level deduplication: a line whose
    normalized hash appears in >= ``min_docs`` DISTINCT documents is
    boilerplate (headers, nav bars, cookie banners, license blurbs)
    and is removed from every document that carries it.

    Input: (id, line_no, line) rows (``split_lines``, or any
    segmenter).  Output per document: line counts, the duplicated-line
    ratio, and the md5 fingerprint of the CLEANED text (kept lines
    re-joined in order with newlines) — the fingerprint keeps result
    rows narrow, same convention as the PII scrubber.

    Scale shape: one line-hash aggregate for the cross-doc frequency
    (count-distinct over the well-spread hash key), one hash-keyed
    join back (never a self-join), one per-doc aggregate.  No
    broadcast of the line set is assumed — boilerplate sets are small
    but not provably tiny, so the join shuffles on the hash key."""
    hashed = lines.select(
        id_col,
        "line_no",
        "line",
        hash60(F.trim(F.lower(F.col("line")))).alias("__h"),
    )
    freq = (
        hashed.groupBy("__h")
        .agg(F.count_distinct(id_col).alias("__docs"))
        .withColumn("__dup", F.col("__docs") >= min_docs)
        .select("__h", "__dup")
    )
    flagged = hashed.join(freq, "__h")
    kept_fp = F.md5(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__dup"), F.struct("line_no", "line")
                        )
                    )
                ),
                lambda s: s["line"],
            ),
        )
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("__dup").cast("int")).cast("long").alias("n_dup_lines"),
            F.round(
                F.sum(F.col("__dup").cast("int")) / F.count("*") + F.lit(1e-9), 4
            ).alias("dup_line_ratio"),
            kept_fp.alias("cleaned_fingerprint"),
        )
    )


# ------------------------------------------------------------ hash split


def with_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    hash60(id) % 100 — stable under corpus growth (a doc's split never
    depends on other rows), the property random sampling lacks.  Pure
    projection: no shuffle, survives any repartitioning."""
    bucket = hash60(F.col(id_col).cast("string")) % 100
    return docs.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_pct, "train")
        .when(F.col("split_bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def split_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-split corpus accounting: docs, whitespace tokens, chars, and
    each split's token share — one map-side-combined shuffle on a
    3-value key."""
    tagged = with_split(docs)
    per_split = tagged.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
    )
    total = per_split.agg(F.sum("n_tokens").alias("corpus_tokens"))
    return per_split.crossJoin(F.broadcast(total)).select(
        "split",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens") / F.col("corpus_tokens") + F.lit(1e-9), 4).alias("token_share"),
    )


# ------------------------------------------------------------- packing


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget sequence packing: assign documents to consecutive
    context-window bins of ``budget`` tokens, contiguously in id order
    within each shard (bin = floor(tokens-before-this-doc / budget)).

    Packing is inherently a running sum, so the window partitions by
    the shard column — each shard packs independently and in parallel;
    there is no global ordering.  Returns per-(shard, bin) fill stats;
    a doc whose tokens straddle a boundary counts toward the bin it
    STARTS in (greedy-fill semantics)."""
    toks = docs.select(
        shard_col, id_col, token_count(F.col(text_col)).alias("n_tokens")
    )
    w = (
        W.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    binned = toks.withColumn(
        "bin_id",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget).cast("long"),
    )
    return binned.groupBy(shard_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)) + F.lit(1e-9), 4).alias("fill_ratio"),
    )


# ------------------------------------------------------------- sampling


def stratified_sample(
    docs: DataFrame,
    fraction: float = 0.2,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: within each stratum, rank rows
    by a hash of their id and keep the first ceil(fraction * stratum
    size).  Unlike ``df.sample``, the result is reproducible across
    runs/engines and exact per stratum (every stratum retains its
    proportion, no binomial variance).  One shuffle on the stratum key;
    each stratum sorts only its own rows."""
    w = W.partitionBy(stratum_col).orderBy(F.col("sample_key"), F.col(id_col))
    keyed = docs.withColumn("sample_key", hash60(F.col(id_col).cast("string"), salt="sample:"))
    ranked = keyed.withColumn("sample_rank", F.row_number().over(w)).withColumn(
        "stratum_size", F.count("*").over(W.partitionBy(stratum_col))
    )
    return (
        ranked.filter(F.col("sample_rank") <= F.ceil(F.col("stratum_size") * fraction))
        .select(id_col, stratum_col, "sample_rank", "stratum_size")
    )


# ----------------------------------------------------------- repetition


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Gopher-style repetition filter: the fraction of a document's
    bigrams occupied by its single most-frequent bigram (Gopher's
    top-2-gram threshold, 0.2).  Boilerplate and degenerate
    generations score high; natural text scores low.
    Two aggregations, both keyed on (doc, gram) / doc — well-spread,
    map-side combinable."""
    grams = docs.select(id_col, F.explode(shingle_arr(F.col(text_col), 2)).alias("gram"))
    counts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.max("cnt").alias("top_bigram_count"),
            F.round(F.max("cnt") / F.sum("cnt") + F.lit(1e-9), 4).alias("top_bigram_frac"),
        )
        .withColumn("repetitive", F.col("top_bigram_frac") >= flag_threshold)
    )


# ------------------------------------------------------------- mixing


def source_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    shard_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled data-mixing weights per source: raw token
    share s_i is flattened to s_i^alpha / sum(s_j^alpha) (alpha<1
    upweights small/rare sources — the standard multilingual/multi-
    source mixing rule), plus the oversampling factor each source needs
    to hit its target share in one training epoch.  One tiny aggregate
    (n_sources rows) after a map-side-combined token count."""
    per = docs.groupBy(shard_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("corpus_tokens"))
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "raw_share", F.col("n_tokens") / F.col("corpus_tokens")
    )
    powsum = shared.agg(
        F.sum(F.pow("raw_share", F.lit(alpha))).alias("pow_sum")
    )
    return (
        shared.crossJoin(F.broadcast(powsum))
        .select(
            shard_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("raw_share") + F.lit(1e-9), 6).alias("raw_share"),
            F.round(
                F.pow("raw_share", F.lit(alpha)) / F.col("pow_sum") + F.lit(1e-9), 6
            ).alias("mix_weight"),
            F.round(
                (F.pow("raw_share", F.lit(alpha)) / F.col("pow_sum"))
                / F.col("raw_share")
                + F.lit(1e-9),
                4,
            ).alias("oversample_factor"),
        )
    )


# ------------------------------------------------------------ lm scoring


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM quality score, reduced to its distributed core: a
    unigram model estimated from the corpus itself, each document scored
    by its mean token log-probability (higher = more typical text;
    gibberish and off-distribution docs score low).

    Two shuffles keyed on token (frequency estimate + the prob join) and
    one on doc_id (the mean) — all well-spread.  The token-frequency
    table is orders of magnitude smaller than the corpus; Catalyst/AQE
    picks broadcast when it fits."""
    toks = docs.select(id_col, F.explode(tokens_of(F.col(text_col))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    freqs = counts.crossJoin(F.broadcast(total)).select(
        "tok", (F.col("cnt") / F.col("total")).alias("p")
    )
    return (
        toks.join(freqs, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log("p")) + F.lit(1e-9), 6).alias("mean_logprob"),
        )
    )


def bigram_cross_entropy(
    docs: DataFrame,
    k_smooth: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full CCNet/KenLM-style perplexity filter skeleton: an add-k
    smoothed BIGRAM model estimated from the corpus itself, each
    document scored by its mean negative log conditional probability
    (cross-entropy; perplexity = exp of it).  A bigram LM separates
    shuffled-word salad from fluent text, which the unigram score
    (``unigram_logprob``) cannot — the standard quality gate before
    tokenization.

    p(w2|w1) = (c(w1 w2) + k) / (c(w1 ._) + k·V), with c(w1 ._) the
    count of w1 as a bigram context and V the CONTEXT vocabulary size
    (distinct w1) — the branching-factor denominator the smoothing
    spreads mass over.

    Scale shape: ONE corpus scan (the same persisted-narrow-frame
    pattern as bm25_topk).  A single projection explodes bigrams and
    immediately compacts each to two portable 60-bit hashes — the
    bigram key and its context-word key — so the persisted frame is
    three longs per bigram occurrence, no strings.  Model counts,
    context counts c(w1) (= sum of bigram counts per context key), V,
    and the scoring join all read that cache; hash collisions merge
    counts identically in Spark and the DuckDB oracle because both
    compute the same md5-derived keys.  Nothing global-sorts and no
    driver state exists."""
    from ..cache import tracked_persist

    narrow, bgc, ctx, vocab = _bigram_model_tables(docs, id_col, text_col)
    # r13 optimization pass (guide §1.2 "don't compute twice"): the
    # context counts c(w1) used to regroup bgc and JOIN BACK — bgc's
    # aggregate over the corpus-sized narrow cache ran once under the
    # probs side and once under ctx.  A window sum over the SAME
    # groups is value-identical and reads bgc once; persisting bgc
    # (bigram-type-sized, orders of magnitude smaller than narrow)
    # lets the vocab scalar read the cache instead of re-scanning the
    # narrow frame a third time.
    bgc = tracked_persist(bgc)
    probs = (
        bgc.withColumn("c1", F.sum("c2").over(W.partitionBy("w1_h")))
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg_h",
            (
                (F.col("c2") + F.lit(k_smooth))
                / (F.col("c1") + F.lit(k_smooth) * F.col("v"))
            ).alias("p"),
        )
    )
    return (
        narrow.join(probs, "bg_h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log("p")) + F.lit(1e-9), 6).alias("cross_entropy"),
        )
    )


def trigram_cross_entropy(
    docs: DataFrame,
    k_smooth: float = 0.5,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Jelinek-Mercer interpolated TRIGRAM LM perplexity filter — the
    sharper sibling of ``bigram_cross_entropy`` (x74): each document
    scored by the mean negative log of

        p(w3|w1 w2) = l3 * (c123+k)/(c12 + k*V3)      trigram tier
                    + l2 * (c23 +k)/(c2  + k*V2)      bigram backoff
                    + l1 * (c3  +k)/(N1  + k*V1)      unigram backoff

    Fixed-weight interpolation (the KenLM-family backoff made
    deterministic: no discount estimation loop) ALWAYS mixes the three
    tiers, so rare-but-valid trigrams are rescued by their bigram /
    unigram mass while shuffled-word salad — whose bigrams and
    trigrams are both unseen-rare — stays expensive: strictly better
    salad-vs-fluent separation than the bigram model at the same scan
    cost (pinned by test).

    Scale shape: ONE corpus scan (the x74 persisted-narrow-frame
    pattern, one tier up).  A single projection explodes trigrams and
    compacts each occurrence to five portable 60-bit hashes — the
    trigram key, its (w1 w2) context key, the (w2 w3) bigram key, the
    w2 context key, and the w3 unigram key — so the persisted frame is
    six longs per trigram occurrence, no strings.  ALL lower-tier
    counts derive from that one trigram frame (bigram c23 = count of
    (w2 w3) as a trigram tail, unigram c3 = count of w3 as a trigram
    tail — the continuation-style counting Kneser-Ney uses, which
    keeps the scan count at one; the tiny doc-boundary undercount is a
    modeling convention, applied identically in the oracle).  Model
    tables are vocabulary-sized, tier V's and N1 fold into broadcast
    scalars, and the scoring join keys on the well-spread trigram
    hash.  Docs with < 3 tokens have no trigrams and drop out (the
    x74 inner-join convention)."""
    narrow, tgc, ctx12, bgc, ctx2, unic, scalars = _trigram_model_tables(
        docs, id_col, text_col
    )
    # Measured and REJECTED (r13 optimization pass): folding ctx12/ctx2
    # into window sums over tgc/bgc (the x74 fusion one tier up) —
    # value-identical, but the windows shuffle the FULL tier rows where
    # the regroup shuffles map-side-partial-aggregated (key, sum) pairs,
    # and the tier tables are type-sized (can approach occurrence count
    # on diverse corpora), so the fused shape measured slower at sf0.1
    # (0.79 -> 0.94-1.05s) and flat at the 10x amplified point both
    # with and without persisting the tiers.  The bigram scorer keeps
    # the fusion because its single context window DID clear the bar
    # (see bigram_cross_entropy).
    l3, l2, l1 = lambdas
    probs = (
        tgc.join(ctx12, "c12_h")
        .join(bgc, "b23_h")
        .join(ctx2, "w2_h")
        .join(unic, "w3_h")
        .crossJoin(F.broadcast(scalars))
        .select(
            "tg_h",
            (
                F.lit(l3)
                * (F.col("c3") + F.lit(k_smooth))
                / (F.col("c12") + F.lit(k_smooth) * F.col("v3"))
                + F.lit(l2)
                * (F.col("c2b") + F.lit(k_smooth))
                / (F.col("c2") + F.lit(k_smooth) * F.col("v2"))
                + F.lit(l1)
                * (F.col("c1w") + F.lit(k_smooth))
                / (F.col("n1") + F.lit(k_smooth) * F.col("v1"))
            ).alias("p"),
        )
    )
    return (
        narrow.join(probs, "tg_h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.round(F.avg(-F.log("p")) + F.lit(1e-9), 6).alias("cross_entropy"),
        )
    )


def _trigram_model_tables(docs: DataFrame, id_col: str, text_col: str):
    """Shared model-estimation pass for the trigram LM (the x74
    _bigram_model_tables pattern one tier up): ONE corpus scan into
    the persisted six-long narrow frame, then every tier count table
    and the scalar frame derive from that cache."""
    from ..cache import tracked_persist

    tg = F.col("tg")
    w = lambda i: F.split_part(tg, F.lit(" "), F.lit(i))  # noqa: E731
    narrow = tracked_persist(
        docs.select(
            F.col(id_col), F.explode(shingle_arr(F.col(text_col), 3)).alias("tg")
        )
        .filter(F.size(F.split(tg, " ")) == 3)
        .select(
            F.col(id_col),
            hash60(tg, "tlm|").alias("tg_h"),
            hash60(F.concat_ws(" ", w(1), w(2)), "tlm|").alias("c12_h"),
            hash60(F.concat_ws(" ", w(2), w(3)), "tlm|").alias("b23_h"),
            hash60(w(2), "tlm|").alias("w2_h"),
            hash60(w(3), "tlm|").alias("w3_h"),
        )
    )
    # trigram tier: c123 per trigram type, c12 per context, V3 contexts
    tgc = narrow.groupBy("tg_h").agg(
        F.count("*").alias("c3"),
        F.min("c12_h").alias("c12_h"),
        F.min("b23_h").alias("b23_h"),
        F.min("w3_h").alias("w3_h"),
    )
    ctx12 = tgc.groupBy("c12_h").agg(F.sum("c3").alias("c12"))
    # bigram tier over (w2 w3)-as-trigram-tail occurrences
    bgc = narrow.groupBy("b23_h").agg(
        F.count("*").alias("c2b"), F.min("w2_h").alias("w2_h")
    )
    ctx2 = bgc.groupBy("w2_h").agg(F.sum("c2b").alias("c2"))
    # unigram tier over w3-as-trigram-tail occurrences
    unic = narrow.groupBy("w3_h").agg(F.count("*").alias("c1w"))
    scalars = (
        ctx12.agg(F.count("*").alias("v3"))
        .crossJoin(ctx2.agg(F.count("*").alias("v2")))
        .crossJoin(unic.agg(F.count("*").alias("v1"), F.sum("c1w").alias("n1")))
    )
    return narrow, tgc, ctx12, bgc, ctx2, unic, scalars


def save_trigram_lm(
    docs: DataFrame,
    path: str,
    k_smooth: float = 0.5,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Train-once half of the trigram perplexity gate (the
    save_bigram_lm contract one tier up): persist the five
    vocabulary-sized count tables + the scalar meta, after which
    scoring a new batch or stream never touches the training corpus
    again."""
    narrow, tgc, ctx12, bgc, ctx2, unic, scalars = _trigram_model_tables(
        docs, id_col, text_col
    )
    tgc.select("tg_h", "c3").write.mode("overwrite").parquet(f"{path}/trigrams")
    ctx12.write.mode("overwrite").parquet(f"{path}/contexts12")
    bgc.select("b23_h", "c2b").write.mode("overwrite").parquet(f"{path}/bigrams23")
    ctx2.write.mode("overwrite").parquet(f"{path}/contexts2")
    unic.write.mode("overwrite").parquet(f"{path}/unigrams")
    scalars.withColumn("k_smooth", F.lit(k_smooth)).withColumn(
        "l3", F.lit(lambdas[0])
    ).withColumn("l2", F.lit(lambdas[1])).withColumn(
        "l1", F.lit(lambdas[2])
    ).write.mode("overwrite").parquet(f"{path}/meta")
    narrow.unpersist()


def score_with_trigram_lm(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score-many half: per-document interpolated cross-entropy of a
    NEW batch under the persisted trigram model.  Every tier joins
    LEFT with coalesce(0), so unseen events degrade tier by tier
    exactly as interpolation intends — unseen trigram in a seen
    context: (0+k)/(c12+kV3); unseen context: (0+k)/(0+kV3) = 1/V3;
    likewise per lower tier — novel text is scored, never dropped.
    O(batch) work against five vocabulary-sized tables; zero
    training-corpus reads."""
    spark = batch.sparkSession
    meta_df = spark.read.parquet(f"{path}/meta")
    meta = meta_df.first()
    return score_with_trigram_tables(
        batch,
        spark.read.parquet(f"{path}/trigrams"),
        spark.read.parquet(f"{path}/contexts12"),
        spark.read.parquet(f"{path}/bigrams23"),
        spark.read.parquet(f"{path}/contexts2"),
        spark.read.parquet(f"{path}/unigrams"),
        meta_df.select("v3", "v2", "v1", "n1"),
        k_smooth=meta["k_smooth"],
        lambdas=(meta["l3"], meta["l2"], meta["l1"]),
        id_col=id_col,
        text_col=text_col,
    )


def score_with_trigram_tables(
    batch: DataFrame,
    tgc: DataFrame,
    ctx12: DataFrame,
    bgc: DataFrame,
    ctx2: DataFrame,
    unic: DataFrame,
    meta_df: DataFrame,
    k_smooth: float = 0.5,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The tier-joined scoring core shared by the persisted-model path
    (``score_with_trigram_lm``) and the streaming counts view
    (``sinks.trigram_stream_score``): given the five count tables
    (tg_h->c3, c12_h->c12, b23_h->c2b, w2_h->c2, w3_h->c1w) and the
    scalar frame (v3, v2, v1, n1), scores a batch with left joins and
    coalesce backoff — identical arithmetic wherever the tables come
    from."""
    k = k_smooth
    l3, l2, l1 = lambdas
    tg = F.col("tg")
    w = lambda i: F.split_part(tg, F.lit(" "), F.lit(i))  # noqa: E731
    rows = (
        batch.select(
            F.col(id_col), F.explode(shingle_arr(F.col(text_col), 3)).alias("tg")
        )
        .filter(F.size(F.split(tg, " ")) == 3)
        .select(
            F.col(id_col),
            hash60(tg, "tlm|").alias("tg_h"),
            hash60(F.concat_ws(" ", w(1), w(2)), "tlm|").alias("c12_h"),
            hash60(F.concat_ws(" ", w(2), w(3)), "tlm|").alias("b23_h"),
            hash60(w(2), "tlm|").alias("w2_h"),
            hash60(w(3), "tlm|").alias("w3_h"),
        )
    )
    c = lambda name: F.coalesce(F.col(name), F.lit(0))  # noqa: E731
    p = (
        F.lit(l3) * (c("c3") + F.lit(k)) / (c("c12") + F.lit(k) * F.col("v3"))
        + F.lit(l2) * (c("c2b") + F.lit(k)) / (c("c2") + F.lit(k) * F.col("v2"))
        + F.lit(l1) * (c("c1w") + F.lit(k)) / (F.col("n1") + F.lit(k) * F.col("v1"))
    )
    return (
        rows.join(tgc.select("tg_h", "c3"), "tg_h", "left")
        .join(ctx12, "c12_h", "left")
        .join(bgc.select("b23_h", "c2b"), "b23_h", "left")
        .join(ctx2, "w2_h", "left")
        .join(unic, "w3_h", "left")
        .crossJoin(F.broadcast(meta_df))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.round(F.avg(-F.log(p)) + F.lit(1e-9), 6).alias("cross_entropy"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pre-training / RAG chunking step (stride = chunk_tokens -
    overlap; the final window clips at the document end).

    Pure array expressions on ONE scan: the token array binds once per
    row (let-binding via transform-over-single-element-array, the same
    trick as dedup.shingle_arr), chunk starts are a sequence, each
    chunk is a slice — then one posexplode.  No shuffle at all: output
    partitioning inherits the scan, which is exactly what the
    downstream packer (pack_sequences) wants at 100 TB.

    Output: (id, chunk_idx, chunk_text, n_chunk_tokens)."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    chunks = F.transform(
        F.array(tokens_of(F.col(text_col))),
        lambda t: F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size(t) - F.lit(overlap), F.lit(1)),
                F.lit(stride),
            ),
            lambda s: F.struct(
                ((s - 1) / stride).cast("long").alias("chunk_idx"),
                F.concat_ws(" ", F.slice(t, s, chunk_tokens)).alias("chunk_text"),
                F.size(F.slice(t, s, chunk_tokens)).cast("long").alias("n_chunk_tokens"),
            ),
        ),
    )[0]
    return docs.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col, "c.chunk_idx", "c.chunk_text", "c.n_chunk_tokens"
    )


def quality_yield_curve(
    docs: DataFrame,
    thresholds: tuple[float, ...] = (0.5, 0.667, 0.834, 1.0),
    text_col: str = "text",
) -> DataFrame:
    """Curation-tuning yield curve: documents and tokens retained at
    each quality-score threshold (keep iff score >= threshold), with
    the retained-docs fraction.  Every requested threshold appears in
    the output — a threshold nothing clears yields an explicit
    (t, 0, 0, 0.0) row, so the curve is always complete.  Two
    column-pruned corpus passes (the scored fan-out and the total
    count); the per-threshold fan-out itself is a tiny literal array
    explode and the aggregates combine map-side.  Monotone by
    construction: raising the threshold never increases yield."""
    from .text import quality_score

    scored = docs.select(
        quality_score(F.col(text_col)).alias("q"),
        token_count(F.col(text_col)).alias("nt"),
    )
    total = scored.agg(F.count("*").alias("total_docs"))
    fanned = scored.select(
        "q",
        "nt",
        F.explode(F.array(*[F.lit(float(t)) for t in thresholds])).alias("threshold"),
    ).filter(F.col("q") >= F.col("threshold"))
    agg = fanned.groupBy("threshold").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
    )
    thr = docs.sparkSession.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    return (
        thr.join(agg, "threshold", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "threshold",
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(F.col("n_docs"), F.lit(0)) / F.col("total_docs") + F.lit(1e-9), 4
            ).alias("pct_docs"),
        )
    )


def quality_threshold_for_budget(
    docs: DataFrame,
    budget_den: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """The INVERSE of the yield curve (quality_yield_curve answers
    'how much survives threshold t'; this answers 'which threshold
    fits my token budget'): cumulative doc/token mass per quality
    LEVEL walking from the highest score down, each level flagged
    with whether keeping everything at-or-above it still fits the
    budget.  The loosest fitting level is the data-derived cutoff —
    the highest-quality ``corpus_tokens // budget_den`` tokens.

    The budget is an integer division of the corpus total
    (``budget_den = 4`` -> a quarter of the corpus), exact in BIGINT
    in both engines — no float fraction at the budget boundary.

    Scale shape: one corpus scan into a quality-level aggregate
    (bounded by the composite score's value set), a cumulative window
    over those few rows (aggregate child — the sanctioned bounded
    single-partition window), and one broadcast scalar join."""
    from .text import quality_score

    scored = docs.select(
        quality_score(F.col(text_col)).alias("q"),
        token_count(F.col(text_col)).alias("nt"),
    )
    levels = scored.groupBy("q").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
    )
    tot = scored.agg(
        F.sum("nt").cast("long").alias("corpus_tokens")
    )
    w = (
        W.orderBy(F.desc("q"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        levels.withColumn(
            "cum_docs", F.sum("n_docs").over(w).cast("long")
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(F.col("q") + 1e-9, 4).alias("threshold"),
            "n_docs",
            "n_tokens",
            "cum_docs",
            "cum_tokens",
            F.expr(f"corpus_tokens div {int(budget_den)}")
            .cast("long")
            .alias("budget_tokens"),
            (
                F.col("cum_tokens")
                <= F.expr(f"corpus_tokens div {int(budget_den)}")
            ).alias("fits_budget"),
        )
    )


def materialize_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    budget_den: int = 4,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the temperature-scaled mixture at a global token
    budget — source_mixture (the x30 weights) composed with the x41
    budget sampler: each source's target is its mix weight times the
    global budget (``corpus_tokens // budget_den``), filled by the
    deterministic salted-hash ranking kept while the running token
    total fits.  The per-source summary a mixture run publishes:
    (source, mix_weight, target_tokens, kept_docs, kept_tokens,
    utilization).

    Utilization < 1 on two honest grounds: document granularity (the
    marginal doc overshoots) and source exhaustion (an upweighted
    rare source may simply run out — its oversample_factor > 1 in x30
    says repetition, not more unique data, closes that gap).

    Scale shape: the x30 aggregates (n_sources rows, broadcast), one
    per-source cumulative window over the salted ranking, one
    broadcast target join, one per-source summary aggregate."""
    from .text import hash60

    mix = source_mixture(docs, alpha, shard_col, text_col)
    tot = mix.agg(F.sum("n_tokens").cast("long").alias("corpus_tokens"))
    targets = mix.crossJoin(F.broadcast(tot)).select(
        shard_col,
        "mix_weight",
        F.floor(
            F.expr(f"corpus_tokens div {int(budget_den)}")
            * F.col("mix_weight")
            + F.lit(1e-6)
        )
        .cast("long")
        .alias("target_tokens"),
    )
    t = docs.select(
        F.col(id_col),
        F.col(shard_col),
        token_count(F.col(text_col)).alias("nt"),
        hash60(F.col(id_col).cast("string"), salt="mixture|").alias("rk"),
    )
    w = (
        W.partitionBy(shard_col)
        .orderBy("rk", id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    kept = (
        t.withColumn("cum", F.sum("nt").over(w).cast("long"))
        .join(F.broadcast(targets), shard_col)
        .filter(F.col("cum") <= F.col("target_tokens"))
        .groupBy(shard_col)
        .agg(
            F.count("*").cast("long").alias("kept_docs"),
            F.sum("nt").cast("long").alias("kept_tokens"),
        )
    )
    return targets.join(kept, shard_col, "left").select(
        shard_col,
        "mix_weight",
        "target_tokens",
        F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias(
            "kept_docs"
        ),
        F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias(
            "kept_tokens"
        ),
        F.round(
            F.coalesce(F.col("kept_tokens"), F.lit(0))
            / F.greatest(F.col("target_tokens"), F.lit(1))
            + F.lit(1e-9),
            4,
        ).alias("utilization"),
    )


def length_outlier_trim(
    docs: DataFrame,
    lo: float = 0.01,
    hi: float = 0.99,
    by: str = "source",
    text_col: str = "text",
    approx: bool = True,
) -> DataFrame:
    """Keep docs inside their group's [lo, hi] token-count percentile
    band — the truncated/garbage length-tail cut.

    ``approx=True`` (the scale path) uses approx_percentile: a
    MERGEABLE sketch, so the per-group aggregate combines map-side and
    never buffers a group's values in one place.  ``approx=False``
    uses exact interpolated percentiles — Spark's exact percentile
    collects each group's values into aggregate state, which is only
    sane at test scale; it exists here because exact interpolation is
    what the DuckDB oracle can mirror value-for-value."""
    t = docs.select(
        "doc_id", F.col(by).alias("grp"), token_count(F.col(text_col)).alias("n_tokens")
    )
    fn = "approx_percentile" if approx else "percentile"
    bounds = t.groupBy("grp").agg(
        F.round(F.expr(f"{fn}(n_tokens, {lo})") + F.lit(1e-9), 4).alias("p_lo"),
        F.round(F.expr(f"{fn}(n_tokens, {hi})") + F.lit(1e-9), 4).alias("p_hi"),
    )
    return (
        t.join(F.broadcast(bounds), "grp")
        .filter((F.col("n_tokens") >= F.col("p_lo")) & (F.col("n_tokens") <= F.col("p_hi")))
        .select("doc_id", F.col("grp").alias(by), "n_tokens", "p_lo", "p_hi")
    )


# ------------------------------------------------------- training order

def training_shards(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shuffle|",
    epoch: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle into training shards: the final
    step of a data pipeline — fix a pseudo-random training order
    WITHOUT an RNG, so re-runs (and the DuckDB oracle) reproduce it
    bit-for-bit.

    Each doc gets a portable md5-derived 60-bit shuffle key; its shard
    is ``key % n_shards`` and its position is the rank of the key
    within the shard.  Scale shape: ONE exchange (the per-shard
    window); shards are hash-balanced so each window sorts
    ~|corpus|/n_shards rows — at 100 TB you raise ``n_shards`` to keep
    the per-shard sort in memory, exactly how training shards are
    sized in practice.  No global sort, no single-partition exchange.
    """
    # epoch reshuffling: folding the epoch into the salt yields an
    # INDEPENDENT deterministic permutation per epoch — the standard
    # between-epoch reshuffle, still RNG-free and growth-stable
    if epoch is not None:
        salt = f"{salt}epoch{epoch}|"
    keyed = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        hash60(F.col(id_col).cast("string"), salt=salt).alias("shuffle_key"),
    ).withColumn("shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int"))
    w = W.partitionBy("shard").orderBy("shuffle_key", id_col)
    return keyed.withColumn("pos", F.row_number().over(w)).select(
        id_col, "shard", "pos", "n_tokens", "shuffle_key"
    )


# ------------------------------------------------- rule-based filtering

def gopher_metric_columns(text) -> dict:
    """The five Gopher rule metrics as named column expressions over a
    text column — shared by ``gopher_quality_rules`` and the composed
    ``curation_funnel`` so both filter on bit-identical values."""
    toks = tokens_of(text)
    tris = shingle_arr(text, 3)
    from .text import STOPWORDS

    return {
        "n_words": F.size(toks).cast("long"),
        "mean_word_len": (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.size(toks)
        ),
        "stop_hits": F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long"),
        "alpha_frac": (
            F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / F.size(toks)
        ),
        "dup_trigram_frac": (
            F.lit(1.0) - F.size(F.array_distinct(tris)) / F.size(tris)
        ),
    }


def gopher_rule_flags(
    min_words: int = 30,
    max_words: int = 10_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stop_hits: int = 2,
    min_alpha_frac: float = 0.8,
    max_dup_trigram_frac: float = 0.1,
) -> dict:
    """Per-rule boolean expressions over ALREADY-MATERIALIZED metric
    columns (gopher_metric_columns names) — cheap scalar comparisons,
    so a pipeline can persist the metrics once and derive the flags
    from the cached frame."""
    return {
        "r_len": (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        "r_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "r_stop": F.col("stop_hits") >= min_stop_hits,
        "r_alpha": F.col("alpha_frac") >= min_alpha_frac,
        "r_dup": F.col("dup_trigram_frac") <= max_dup_trigram_frac,
    }


def gopher_quality_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 10_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stop_hits: int = 2,
    min_alpha_frac: float = 0.8,
    max_dup_trigram_frac: float = 0.1,
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1):
    per-document metrics + one boolean per rule + the conjunction
    ``keep``, so downstream yield analysis can attribute every
    rejection to a rule (not just a score).

    Rules: word-count bounds, mean-word-length bounds, >=N stopwords
    (natural-language evidence), >=80% tokens containing a letter, and
    duplicated-trigram fraction (1 - distinct/total trigrams — the
    repetition signal; complements repetition_stats' top-bigram
    fraction).  Pure single-scan column expressions — token array and
    trigram array bound once per row, zero shuffle, stays in
    whole-stage codegen."""
    metrics = gopher_metric_columns(F.col(text_col))
    out = docs.select(
        F.col(id_col), *[expr.alias(name) for name, expr in metrics.items()]
    )
    flags = gopher_rule_flags(
        min_words,
        max_words,
        min_mean_word_len,
        max_mean_word_len,
        min_stop_hits,
        min_alpha_frac,
        max_dup_trigram_frac,
    )
    rules = out.select("*", *[expr.alias(name) for name, expr in flags.items()])
    return rules.withColumn(
        "keep",
        F.col("r_len") & F.col("r_word_len") & F.col("r_stop")
        & F.col("r_alpha") & F.col("r_dup"),
    )


def quality_weighted_sample(
    docs: DataFrame,
    weight_col,
    id_col: str = "doc_id",
    salt: str = "qsample|",
    scale: float = 1.0,
) -> DataFrame:
    """Deterministic quality-weighted Bernoulli downsample: keep each
    document with probability ``min(1, scale * weight)`` using the
    md5-derived uniform draw u(doc) = hash60(id)/2^60 instead of an
    RNG — the same stability property as the hash split (x26): a
    document's keep decision never changes as the corpus grows or the
    job re-runs, so incremental pipelines can re-derive the sample
    without storing it.

    Map-only (zero shuffle): one projection computes the draw, the
    acceptance bound, and the flag.  ``weight_col`` is any column
    expression in [0, 1] — a quality score, a language preference, a
    source prior; ``scale`` dials the overall sampling rate without
    changing relative weights (capped at 1)."""
    u = hash60(F.col(id_col).cast("string"), salt=salt) / F.lit(float(2**60))
    bound = F.least(F.lit(1.0), F.lit(float(scale)) * weight_col)
    return docs.select(
        F.col(id_col),
        F.round(u + F.lit(1e-9), 6).alias("draw"),
        F.round(bound + F.lit(1e-9), 6).alias("accept_below"),
    ).withColumn("kept", F.col("draw") < F.col("accept_below"))


def novelty_scores(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    DISTINCT k-word shingles that appear in no other document — the
    diversity/novelty signal used to up-weight unique content (and
    down-weight boilerplate) in corpus mixing.

    Shape: one shingle explode -> corpus-wide shingle df (map-side
    combinable) -> rejoin on the shingle -> per-doc fraction.  Both
    shuffles key on well-spread values (shingle hash, doc id); no
    per-doc corpus scan, no self-join.  Documents with no shingles of
    length k (shorter than k words yield 1 partial shingle, which
    still counts) never divide by zero."""
    grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingle_arr(F.col(text_col), k))).alias("gram"),
    )
    df_counts = grams.groupBy("gram").agg(F.count("*").alias("gram_df"))
    return (
        grams.join(df_counts, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("gram_df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique_grams"),
            F.round(
                F.sum(F.when(F.col("gram_df") == 1, 1).otherwise(0))
                / F.count("*")
                + F.lit(1e-9),
                4,
            ).alias("novelty"),
        )
    )


def _bigram_model_tables(docs: DataFrame, id_col: str, text_col: str):
    """Shared model-estimation pass for the bigram LM: the hashed
    narrow frame, the bigram count table, the context count table,
    and the scalar V (pure counts — smoothing applies at scoring
    time)."""
    from ..cache import tracked_persist

    narrow = tracked_persist(
        docs.select(
            F.col(id_col), F.explode(shingle_arr(F.col(text_col), 2)).alias("bg")
        )
        .filter(F.col("bg").contains(" "))
        .select(
            F.col(id_col),
            hash60(F.col("bg"), "blm|").alias("bg_h"),
            hash60(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)), "blm|").alias("w1_h"),
        )
    )
    bgc = narrow.groupBy("bg_h").agg(
        F.count("*").alias("c2"), F.min("w1_h").alias("w1_h")
    )
    ctx = bgc.groupBy("w1_h").agg(F.sum("c2").alias("c1"))
    vocab = ctx.agg(F.count("*").alias("v"))
    return narrow, bgc, ctx, vocab


def save_bigram_lm(
    docs: DataFrame,
    path: str,
    k_smooth: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Train-once half of the perplexity gate: estimate the bigram LM
    from the corpus and persist its two vocabulary-sized count tables
    + the scalar meta — after this, scoring a new batch or stream
    never touches the training corpus again (the same amortization as
    the persisted PQ/search indexes)."""
    narrow, bgc, ctx, vocab = _bigram_model_tables(docs, id_col, text_col)
    bgc.write.mode("overwrite").parquet(f"{path}/bigrams")
    ctx.write.mode("overwrite").parquet(f"{path}/contexts")
    vocab.withColumn("k_smooth", F.lit(k_smooth)).write.mode("overwrite").parquet(
        f"{path}/meta"
    )
    narrow.unpersist()


def score_with_bigram_lm(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score-many half: per-document cross-entropy of a NEW batch under
    the persisted model, with the standard add-k backoff for unseen
    events — unseen bigram in a seen context: (0+k)/(c1+kV); unseen
    context: 1/V.  The batch joins two vocabulary-sized tables (left
    joins, so novel text is scored, not dropped); O(batch) work,
    zero training-corpus reads."""
    spark = batch.sparkSession
    bgc = spark.read.parquet(f"{path}/bigrams")
    ctx = spark.read.parquet(f"{path}/contexts")
    meta = spark.read.parquet(f"{path}/meta").first()
    v, k = meta["v"], meta["k_smooth"]

    bg = (
        batch.select(
            F.col(id_col), F.explode(shingle_arr(F.col(text_col), 2)).alias("bg")
        )
        .filter(F.col("bg").contains(" "))
        .select(
            F.col(id_col),
            hash60(F.col("bg"), "blm|").alias("bg_h"),
            hash60(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)), "blm|").alias("w1_h"),
        )
    )
    p = (
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.lit(v))
    )
    return (
        bg.join(bgc.select("bg_h", "c2"), "bg_h", "left")
        .join(ctx, "w1_h", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)) + F.lit(1e-9), 6).alias("cross_entropy"),
        )
    )


# --------------------------------------------------- composed pipeline


def curation_flags(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_est_jaccard: float = 0.5,
    gram_k: int = 5,
    contamination_threshold: float = 0.2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The curation pipeline's PER-DOCUMENT flag frame — the shared
    core of curation_funnel (stage-level yields) and doc_fate
    (per-doc disposition): one train-corpus text scan into a
    persisted narrow frame (Gopher metrics, fingerprint, MinHash
    signature, gram-hash set), then every tier's verdict joined on as
    typed columns.  Returned PERSISTED with: doc_id, n_words, the
    five per-rule booleans, keep, canonical_id, surv_e, component,
    surv_n, contamination_ratio, surv_d."""
    from ..cache import tracked_persist
    from .dedup import (
        connected_components,
        lsh_pairs_from_signatures,
        minhash_sig_expr,
        shingle_arr,
    )
    from .text import fingerprint

    text = F.col(text_col)
    metrics = gopher_metric_columns(text)
    gram_set = F.array_distinct(
        F.transform(shingle_arr(text, gram_k), lambda g: hash60(g))
    )
    per_doc = tracked_persist(
        train.select(
            F.col(id_col).alias("doc_id"),
            *[expr.alias(name) for name, expr in metrics.items()],
            fingerprint(text).alias("fingerprint"),
            minhash_sig_expr(text, num_hashes, shingle_k).alias("sig"),
            gram_set.alias("grams"),
        )
    )

    # stage 1: quality — flags are scalar comparisons on cached metrics
    flags = gopher_rule_flags()
    keep = F.lit(True)
    for expr in flags.values():
        keep = keep & expr
    staged = per_doc.select(
        "*", *[expr.alias(name) for name, expr in flags.items()]
    ).withColumn("keep", keep)

    # stage 2: exact dedup among quality survivors (min-id canonical)
    canon = (
        staged.filter("keep")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    staged = staged.join(canon, "fingerprint", "left").withColumn(
        "surv_e", F.col("keep") & (F.col("doc_id") == F.col("canonical_id"))
    )

    # stage 3: near-dup closure among exact survivors — signatures come
    # from the cached frame, never recomputed from text
    pairs = lsh_pairs_from_signatures(
        staged.filter("surv_e").select("doc_id", "sig"),
        num_hashes=num_hashes,
        bands=bands,
        min_est_jaccard=min_est_jaccard,
        max_bucket_size=max_bucket_size,
    )
    comp = connected_components(pairs.select("doc_a", "doc_b"))
    staged = staged.join(comp, staged.doc_id == comp.id, "left").withColumn(
        "surv_n",
        F.col("surv_e")
        & (F.col("id").isNull() | (F.col("component") == F.col("doc_id"))),
    )

    # stage 4: decontamination — broadcast eval gram-hash set, train
    # side probes via its cached gram arrays
    eval_grams = (
        eval_set.select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        shingle_arr(F.col(text_col), gram_k), lambda g: hash60(g)
                    )
                )
            ).alias("gram")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    contaminated = (
        staged.filter("surv_n")
        .select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(eval_grams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.coalesce(F.sum("hit"), F.lit(0)) / F.count("*") + F.lit(1e-9), 4
            ).alias("contamination_ratio")
        )
    )
    # the finished flag frame feeds multiple consumers (funnel
    # aggregate + shard assignment, or the fate projection) — persist
    # it so the canon groupBy, closure join, and gram probe run once
    return tracked_persist(
        staged.join(
            contaminated.withColumnRenamed("doc_id", "c_id"),
            staged.doc_id == F.col("c_id"),
            "left",
        )
        .withColumn(
            "surv_d",
            F.col("surv_n")
            & ~F.coalesce(
                F.col("contamination_ratio") >= contamination_threshold, F.lit(False)
            ),
        )
        .select(
            "doc_id",
            "n_words",
            *gopher_rule_flags().keys(),
            "keep",
            "canonical_id",
            "surv_e",
            "component",
            "surv_n",
            "contamination_ratio",
            "surv_d",
        )
    )


def curation_funnel(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_est_jaccard: float = 0.5,
    gram_k: int = 5,
    contamination_threshold: float = 0.2,
    n_shards: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The full curation pipeline as ONE composed dataflow with
    per-stage yield accounting — the end product a training-data user
    actually runs (VERDICT r5 #6): eval holdout -> Gopher quality
    rules -> exact dedup (canonical fingerprint survivor) -> near-dup
    dedup (MinHash LSH pairs -> connected-component closure, min
    member survives) -> eval-set decontamination (5-gram overlap) ->
    deterministic training shards.

    Returns one row per stage: ``(stage, docs_in, docs_removed,
    docs_out, removal_rate, tokens_out)``.  Each tier filters the
    previous tier's survivors, so the funnel proves the tiers COMPOSE
    — and the plan proves they compose without re-scanning the corpus
    per tier:

    Scale shape: the train corpus text is scanned EXACTLY ONCE, into a
    persisted narrow per-doc frame carrying everything every later
    tier needs — token count, the five Gopher rule metrics, the exact
    fingerprint, the MinHash signature (doc-local column expression,
    ``dedup.minhash_sig_expr``), and the distinct 5-gram hash set.
    All tier logic (rule flags, canonical groupBy, LSH banding +
    closure, the gram join against the BROADCAST eval gram set, shard
    assignment, the funnel aggregate) runs over that cached frame and
    its derivatives; text is never read again.  Signatures and gram
    sets are computed for every doc in the single pass rather than
    only for quality survivors — re-scanning the pruned text would
    cost a second full corpus read, which is the wrong trade at
    100 TB (drop-rate-dependent: flip it by filtering on the metric
    columns first if quality rejects most of a corpus).

    The one deliberately-bounded piece of driver state is the
    connected-components loop (operators/dedup.connected_components:
    distributed label propagation, localCheckpoint-truncated lineage).
    """
    staged = curation_flags(
        train,
        eval_set,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        min_est_jaccard=min_est_jaccard,
        gram_k=gram_k,
        contamination_threshold=contamination_threshold,
        max_bucket_size=max_bucket_size,
    )

    # stage 5: shard assignment over final survivors (id-keyed shuffle
    # hash, no text needed).  Its row count feeds the funnel, so a
    # dropped/duplicated doc in sharding would break the value oracle.
    shard_rows = staged.filter("surv_d").select(
        "doc_id",
        "n_words",
        F.pmod(hash60(F.col("doc_id").cast("string"), salt="shuffle|"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def _n(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def _tok(cond):
        return F.sum(F.when(cond, F.col("n_words")).otherwise(0)).cast("long")

    tagg = staged.agg(
        F.count("*").cast("long").alias("n_train"),
        F.sum("n_words").cast("long").alias("tok_train"),
        _n(F.col("keep")).alias("n_q"),
        _tok(F.col("keep")).alias("tok_q"),
        _n(F.col("surv_e")).alias("n_e"),
        _tok(F.col("surv_e")).alias("tok_e"),
        _n(F.col("surv_n")).alias("n_n"),
        _tok(F.col("surv_n")).alias("tok_n"),
        _n(F.col("surv_d")).alias("n_d"),
        _tok(F.col("surv_d")).alias("tok_d"),
    )
    eagg = eval_set.agg(F.count("*").cast("long").alias("n_eval"))
    sagg = shard_rows.agg(
        F.count("*").cast("long").alias("n_sharded"),
        F.sum("n_words").cast("long").alias("tok_sharded"),
    )
    one = tagg.crossJoin(F.broadcast(eagg)).crossJoin(F.broadcast(sagg))

    def _stage(name, docs_in, removed, out, toks):
        return F.struct(
            F.lit(name).alias("stage"),
            docs_in.cast("long").alias("docs_in"),
            removed.cast("long").alias("docs_removed"),
            out.cast("long").alias("docs_out"),
            toks.cast("long").alias("tokens_out"),
        )

    c = F.col
    stages = one.select(
        F.explode(
            F.array(
                _stage(
                    "0_eval_holdout",
                    c("n_train") + c("n_eval"),
                    c("n_eval"),
                    c("n_train"),
                    c("tok_train"),
                ),
                _stage("1_quality", c("n_train"), c("n_train") - c("n_q"), c("n_q"), c("tok_q")),
                _stage("2_exact_dedup", c("n_q"), c("n_q") - c("n_e"), c("n_e"), c("tok_e")),
                _stage("3_near_dedup", c("n_e"), c("n_e") - c("n_n"), c("n_n"), c("tok_n")),
                _stage(
                    "4_decontaminate", c("n_n"), c("n_n") - c("n_d"), c("n_d"), c("tok_d")
                ),
                _stage(
                    "5_shards",
                    c("n_d"),
                    c("n_d") - c("n_sharded"),
                    c("n_sharded"),
                    c("tok_sharded"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return stages.select(
        "stage",
        "docs_in",
        "docs_removed",
        "docs_out",
        F.round(
            F.coalesce(c("docs_removed") / c("docs_in"), F.lit(0.0)) + F.lit(1e-9), 4
        ).alias("removal_rate"),
        "tokens_out",
    )


def split_leakage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 90,
    val_pct: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_est_jaccard: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs that CROSS the
    deterministic train/val/test boundary.  A hash split assigns
    whole documents, but near-duplicates of a test doc sitting in
    train leak the benchmark anyway — the standard held-out-set
    hygiene check run before training.  Output: one row per unordered
    split-label pair with its candidate-pair count, mean/max estimated
    Jaccard, and a ``leaky`` flag (labels differ); the within-split
    rows double as the baseline duplicate density.

    Scale shape: exactly p12's — LSH banding over MinHash signatures
    (never all-pairs) — plus a pure-projection split label on each
    endpoint and a 6-row-bounded aggregate; the split never shuffles
    anything."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        docs,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        min_est_jaccard=min_est_jaccard,
        max_bucket_size=max_bucket_size,
    )

    def split_of(doc_col):
        b = hash60(doc_col.cast("string")) % 100
        return (
            F.when(b < train_pct, "train")
            .when(b < train_pct + val_pct, "val")
            .otherwise("test")
        )

    labeled = pairs.select(
        split_of(F.col("doc_a")).alias("sa"),
        split_of(F.col("doc_b")).alias("sb"),
        "est_jaccard",
    )
    return (
        labeled.groupBy(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg("est_jaccard") + F.lit(1e-9), 4).alias("avg_est_jaccard"),
            F.max("est_jaccard").alias("max_est_jaccard"),
        )
        .withColumn("leaky", F.col("split_a") != F.col("split_b"))
    )


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    rate_drift_threshold: float = 0.1,
) -> DataFrame:
    """Per-source distribution drift between two corpus snapshots —
    the monitoring report a pipeline runs between crawls: doc/token
    volume, mean length, quality rate, and language rate per side,
    their deltas, and a ``drift`` flag when either rate moved more
    than ``rate_drift_threshold``.  Each side contributes one
    conditional-aggregation pass (signals are pure column
    expressions, x93's); the union aggregates on the well-spread
    source key.  Sources present in only one snapshot still report
    (full-outer semantics via the union), with the absent side's
    counts at 0."""
    from .text import lang_id, quality_score

    def tagged(df: DataFrame, half: int) -> DataFrame:
        t = F.col(text_col)
        return df.select(
            F.col(source_col).alias("source"),
            F.lit(half).alias("half"),
            token_count(t).alias("n_tokens"),
            (quality_score(t) >= 0.9).cast("long").alias("hi_q"),
            (lang_id(t) == "en").cast("long").alias("is_en"),
        )

    both = tagged(old, 0).unionAll(tagged(new, 1))

    def side(half: int, expr):
        return F.sum(F.when(F.col("half") == half, expr).otherwise(0))

    agg = both.groupBy("source").agg(
        side(0, F.lit(1)).cast("long").alias("n_docs_old"),
        side(1, F.lit(1)).cast("long").alias("n_docs_new"),
        side(0, F.col("n_tokens")).cast("long").alias("tok_old"),
        side(1, F.col("n_tokens")).cast("long").alias("tok_new"),
        side(0, F.col("hi_q")).alias("hi_q_old"),
        side(1, F.col("hi_q")).alias("hi_q_new"),
        side(0, F.col("is_en")).alias("en_old"),
        side(1, F.col("is_en")).alias("en_new"),
    )
    # absent-side guard: rate of an empty side is NULL (mirrors the
    # oracle's CASE WHEN n > 0), not a division-by-zero artifact
    no = F.when(F.col("n_docs_old") > 0, F.col("n_docs_old").cast("double"))
    nn = F.when(F.col("n_docs_new") > 0, F.col("n_docs_new").cast("double"))
    hi_old = F.col("hi_q_old") / no
    hi_new = F.col("hi_q_new") / nn
    en_old = F.col("en_old") / no
    en_new = F.col("en_new") / nn
    mean_old = F.col("tok_old") / no
    mean_new = F.col("tok_new") / nn

    def _r4(x):
        return F.round(x + F.lit(1e-9), 4)

    return agg.select(
        "source",
        "n_docs_old",
        "n_docs_new",
        _r4(mean_old).alias("mean_tokens_old"),
        _r4(mean_new).alias("mean_tokens_new"),
        _r4(mean_new - mean_old).alias("delta_mean_tokens"),
        _r4(hi_old).alias("hi_q_rate_old"),
        _r4(hi_new).alias("hi_q_rate_new"),
        _r4(hi_new - hi_old).alias("delta_hi_q_rate"),
        _r4(en_old).alias("en_rate_old"),
        _r4(en_new).alias("en_rate_new"),
        _r4(en_new - en_old).alias("delta_en_rate"),
        (
            (F.abs(hi_new - hi_old) > rate_drift_threshold)
            | (F.abs(en_new - en_old) > rate_drift_threshold)
        ).alias("drift"),
    )


def curriculum_order(
    docs: DataFrame,
    n_stages: int = 4,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "cur|",
) -> DataFrame:
    """Curriculum ordering: every document placed in a difficulty
    stage (corpus-relative quantiles of bigram cross-entropy — easy
    first) and, within its stage, dealt into hash-balanced shards
    with a deterministic pseudo-random position — the (stage, shard,
    pos) iteration order a curriculum-trained run consumes.

    No global sort anywhere (the x86 boundary pattern): stage
    boundaries come from ONE tiny exact-percentile aggregate
    broadcast back, stage assignment is a map-only comparison, and
    the position window partitions by (stage, shard) — balanced
    cells, each sorting ~|corpus|/(stages*shards) rows.  Docs without
    a scorable bigram (empty/single-token) are excluded, as in the
    perplexity filter."""
    ce = bigram_cross_entropy(docs, text_col=text_col, id_col=id_col).select(
        id_col, "cross_entropy"
    ).localCheckpoint()  # consumed by bounds AND scoring
    qs = F.array(*[F.lit(i / n_stages) for i in range(1, n_stages)])
    bounds = ce.agg(F.percentile("cross_entropy", qs).alias("qb"))
    staged = ce.crossJoin(F.broadcast(bounds)).select(
        id_col,
        "cross_entropy",
        (
            F.lit(1)
            + sum(
                (F.col("cross_entropy") > F.element_at("qb", i + 1)).cast("int")
                for i in range(n_stages - 1)
            )
        ).alias("stage"),
        hash60(F.col(id_col).cast("string"), salt=salt).alias("sk"),
    )
    w = W.partitionBy("stage", "shard").orderBy("sk", id_col)
    return (
        staged.withColumn("shard", F.pmod(F.col("sk"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .select(id_col, "cross_entropy", "stage", "shard", "pos")
    )


def token_budget_plan(
    docs: DataFrame,
    budget_factor: float = 2.0,
    alpha: float = 0.5,
    max_epochs: float = 4.0,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget sampling plan: given a training budget of
    ``budget_factor`` x corpus tokens, temperature-flattened target
    weights (share^alpha, the source_mixture rule with alpha=0.5 ==
    sqrt), and a repetition cap of ``max_epochs`` per source, compute
    each source's allocated tokens, its epoch count, whether the cap
    bound it, and the budget left unallocated by capping — the
    planning table a run configures its sampler from.

    Determinism across engines (the oracle hashes every double): the
    per-source aggregate is distributed, but the cross-source floats
    (total, the share^alpha normalizer) fold over ONE sorted
    collected array — sources are vocabulary-sized by definition —
    so float summation order is fixed; sqrt (not pow) keeps the
    operand chain bit-identical in DuckDB."""
    from .text import let_expr

    per = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
    )
    one = per.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(source_col), F.col("n_docs"), F.col("n_tokens")))
        ).alias("srcs")
    )
    tot = F.aggregate(
        F.col("srcs"), F.lit(0).cast("long"), lambda a, x: a + x["n_tokens"]
    )
    consts = one.select(
        "srcs",
        let_expr(
            tot,
            lambda t: F.struct(
                t.alias("tot"),
                F.aggregate(
                    F.col("srcs"),
                    F.lit(0.0),
                    lambda a, x: a + F.sqrt(x["n_tokens"] / t),
                ).alias("pow_sum"),
            ),
        ).alias("c"),
    )
    rows = consts.select(
        F.explode("srcs").alias("s"), F.col("c.tot").alias("tot"), F.col("c.pow_sum").alias("pow_sum")
    )
    w = F.sqrt(F.col("s.n_tokens") / F.col("tot")) / F.col("pow_sum")
    desired = (F.lit(budget_factor) * F.col("tot")) * w
    cap = F.lit(max_epochs) * F.col("s.n_tokens")
    alloc = F.floor(F.least(desired, cap)).cast("long")
    planned = rows.select(
        F.col("s." + source_col).alias(source_col),
        F.col("s.n_docs").alias("n_docs"),
        F.col("s.n_tokens").alias("n_tokens"),
        F.round(w + F.lit(1e-9), 6).alias("mix_weight"),
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("s.n_tokens") + F.lit(1e-9), 4).alias("epochs"),
        (desired > cap).alias("capped"),
        (F.floor(F.lit(budget_factor) * F.col("tot")).cast("long")).alias("__budget"),
    )
    spent = planned.agg(F.sum("alloc_tokens").alias("__spent"))
    return planned.crossJoin(F.broadcast(spent)).select(
        source_col,
        "n_docs",
        "n_tokens",
        "mix_weight",
        "alloc_tokens",
        "epochs",
        "capped",
        (F.col("__budget") - F.col("__spent")).alias("unallocated_tokens"),
    )


def doc_fate(flags: DataFrame) -> DataFrame:
    """Per-document disposition from the curation flag frame
    (curation_flags): which tier removed each doc and the typed
    evidence — the provenance/audit record a pipeline publishes next
    to the funnel.  ``failed_rule`` names the FIRST failed Gopher rule
    (rule order: length, word length, stopwords, alpha, dup-trigram);
    ``canonical_id`` is the surviving twin for exact duplicates,
    ``dup_component`` the near-dup cluster label, and
    ``contamination_ratio`` the eval-overlap score for every doc that
    reached the decontamination tier.  Pure projection over the
    persisted flag frame — no new scan or shuffle."""
    rule_order = ["r_len", "r_word_len", "r_stop", "r_alpha", "r_dup"]
    fate = (
        F.when(~F.col("keep"), F.lit("removed_quality"))
        .when(~F.col("surv_e"), F.lit("removed_exact_dup"))
        .when(~F.col("surv_n"), F.lit("removed_near_dup"))
        .when(~F.col("surv_d"), F.lit("removed_contaminated"))
        .otherwise(F.lit("kept"))
    )
    failed = F.when(
        ~F.col("keep"),
        F.coalesce(*[F.when(~F.col(r), F.lit(r)) for r in rule_order]),
    )
    return flags.select(
        "doc_id",
        fate.alias("fate"),
        failed.alias("failed_rule"),
        F.when(fate == "removed_exact_dup", F.col("canonical_id")).alias(
            "canonical_id"
        ),
        F.when(fate == "removed_near_dup", F.col("component")).alias("dup_component"),
        F.when(F.col("surv_n"), F.col("contamination_ratio")).alias(
            "contamination_ratio"
        ),
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-addressed shard manifest — the reproducibility record a
    training run pins so 'the data' is a checkable artifact, not a
    directory listing.

    Each document hashes to a shard (portable hash60 of its id) and
    contributes a 60-bit content fingerprint; per shard the manifest
    records counts, token/char volume, the id range, and TWO
    commutative checksums (bit_xor of fingerprints, sum of
    fingerprints mod 1e9+7).  Commutativity is the design point: the
    aggregates are invariant to partitioning, task order, and
    speculative re-execution, so two runs on different clusters — or
    local[32] vs 1000 executors — produce bit-equal manifests, and a
    single flipped byte in any document changes both checksums.  One
    scan, one groupBy(shard) with map-side combine; output is
    n_shards rows."""
    from .text import hash60, token_count

    t = F.col(text_col)
    per_doc = docs.select(
        F.pmod(hash60(F.col(id_col).cast("string"), salt="shard|"), F.lit(n_shards))
        .cast("int")
        .alias("shard_id"),
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        hash60(t, salt="content|").alias("fp"),
    )
    return (
        per_doc.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
            F.expr("bit_xor(fp)").alias("checksum_xor"),
            F.sum(F.pmod(F.col("fp"), F.lit(1_000_000_007))).cast("long").alias(
                "checksum_sum"
            ),
        )
    )


def manifest_diff(old_manifest: DataFrame, new_manifest: DataFrame) -> DataFrame:
    """Diff two content-addressed shard manifests (shard_manifest
    output) — the incremental-validation primitive: after a corpus
    update, only shards whose checksums moved need re-validation,
    re-indexing, or re-sharding, and the diff proves which.

    Pure outer join on shard_id (n_shards rows — trivial at any
    corpus size).  ``content_changed`` is true when either commutative
    checksum differs; volume deltas quantify growth; ``status`` is
    added/removed/changed/unchanged."""
    o = old_manifest.select(
        "shard_id",
        F.col("n_docs").alias("n_docs_old"),
        F.col("n_tokens").alias("tok_old"),
        F.col("checksum_xor").alias("xor_old"),
        F.col("checksum_sum").alias("sum_old"),
    )
    n = new_manifest.select(
        "shard_id",
        F.col("n_docs").alias("n_docs_new"),
        F.col("n_tokens").alias("tok_new"),
        F.col("checksum_xor").alias("xor_new"),
        F.col("checksum_sum").alias("sum_new"),
    )
    j = o.join(n, "shard_id", "outer")
    changed = (
        (F.col("xor_old") != F.col("xor_new"))
        | (F.col("sum_old") != F.col("sum_new"))
    )
    status = (
        F.when(F.col("n_docs_old").isNull(), F.lit("added"))
        .when(F.col("n_docs_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "shard_id",
        F.coalesce("n_docs_old", F.lit(0)).alias("n_docs_old"),
        F.coalesce("n_docs_new", F.lit(0)).alias("n_docs_new"),
        (F.coalesce("n_docs_new", F.lit(0)) - F.coalesce("n_docs_old", F.lit(0)))
        .alias("docs_delta"),
        (F.coalesce("tok_new", F.lit(0)) - F.coalesce("tok_old", F.lit(0)))
        .alias("tokens_delta"),
        F.coalesce(changed, F.lit(True)).alias("content_changed"),
        status.alias("status"),
    )


def pareto_frontier(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 16,
) -> DataFrame:
    """Pareto-frontier (skyline) document selection: the set of docs
    not dominated on (token cost DOWN, vocabulary richness UP) — the
    budget/quality trade-off curve a curation run picks operating
    points from.  Richness is the distinct-token ratio, trunc-quantized
    to BIGINT micro-units so every comparison is exact integer
    arithmetic in both engines.

    Scale shape: a GLOBAL skyline window over the corpus would be a
    data-bearing single-partition exchange — the one shape the plan
    linter exists to reject.  Instead: (1) bucket docs by
    n_tokens // bucket_width and aggregate each bucket's max richness
    (tiny grouped agg, one shuffle of (bucket, qq) pairs only);
    (2) broadcast the running max over strictly-lower buckets back
    onto the corpus — any doc at or below that max is dominated by
    some strictly-shorter doc, which prunes all but the quasi-
    increasing survivor set map-side; (3) run the exact two-window
    skyline (strictly-shorter max via RANGE ... 1 PRECEDING, equal-
    length peers via RANGE CURRENT ROW) on the tiny survivor set.
    The prune is frontier-lossless: every frontier doc survives it,
    and the skyline of a superset of the frontier is the frontier.
    """
    toks = tokens_of(F.col(text_col))
    scored = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            * F.lit(1000000.0)
            / F.size(toks)
        )
        .cast("long")
        .alias("qq"),
    )
    bucket = (F.col("n_tokens") / F.lit(bucket_width)).cast("long")
    bmax = (
        scored.groupBy(bucket.alias("b"))
        .agg(F.max("qq").alias("bq"))
        .withColumn(
            "lower_max",
            F.max("bq").over(
                W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
            ),
        )
    )
    from ..cache import tracked_persist

    # tiny by the prune argument, and multi-consumed (the per-length
    # bounds aggregate + the final flag join) — persist so the corpus
    # scan + prune join run once
    survivors = tracked_persist(
        scored.join(F.broadcast(bmax), bucket == F.col("b"))
        .filter(F.col("lower_max").isNull() | (F.col("qq") > F.col("lower_max")))
        .select(id_col, "n_tokens", "qq")
    )
    # BOTH skyline bounds derive from the per-length max table, so
    # the only global window runs over an AGGREGATE (one row per
    # distinct length — provably bounded, and the plan linter can see
    # it): peerq is the doc's length-class max, prevq the running max
    # over strictly shorter classes.  No survivor-row global window.
    lengths = survivors.groupBy("n_tokens").agg(F.max("qq").alias("peerq"))
    prev = W.orderBy("n_tokens").rowsBetween(W.unboundedPreceding, -1)
    bounds = lengths.select(
        "n_tokens", "peerq", F.max("peerq").over(prev).alias("prevq")
    )
    flagged = survivors.join(F.broadcast(bounds), "n_tokens")
    return (
        flagged.filter(
            (F.col("prevq").isNull() | (F.col("prevq") < F.col("qq")))
            & (F.col("peerq") == F.col("qq"))
        )
        .select(
            id_col,
            "n_tokens",
            (F.round(F.col("qq") / F.lit(1000000.0) + F.lit(1e-9), 4) + F.lit(0.0)).alias(
                "richness"
            ),
        )
    )


def quantile_normalized_selection(
    docs: DataFrame,
    frac: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source quantile normalization of a quality signal: raw
    scores from different sources are incomparable (a mid-quality web
    page and a mid-quality paper score on different scales), so each
    doc is mapped to its WITHIN-SOURCE percent rank and the selection
    keeps the top ``frac`` of every source — the calibration step
    before mixing heterogeneous sources under one quality budget.

    The signal here is the vocabulary-richness micro-unit score (same
    as pareto_frontier).  percent_rank = (#strictly-lower)/(n-1) with
    ties sharing a rank — but the plan never sorts the corpus: a
    (source, score) histogram (bounded by sources x 1e6 distinct
    scores, tiny) gets cumulative counts via a window over the
    HISTOGRAM only, and the rank map broadcasts back onto the corpus
    map-side.  The DuckDB oracle uses its native percent_rank()
    window, cross-validating the histogram rewrite.
    """
    toks = tokens_of(F.col(text_col))
    scored = docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            * F.lit(1000000.0)
            / F.size(toks)
        )
        .cast("long")
        .alias("qq"),
    )
    from ..cache import tracked_persist

    # the narrow (id, source, qq) frame feeds BOTH the rank histogram
    # and the final join-back — persist it so the corpus text is
    # tokenized exactly once (plan-shape test pins this)
    scored = tracked_persist(scored)
    hist = scored.groupBy("source", "qq").agg(F.count("*").alias("cnt"))
    wcum = (
        W.partitionBy("source").orderBy("qq").rowsBetween(W.unboundedPreceding, 0)
    )
    wall = W.partitionBy("source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = hist.select(
        "source",
        "qq",
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("n_lower"),
        F.sum("cnt").over(wall).cast("long").alias("n"),
    )
    pr = F.when(F.col("n") == 1, F.lit(0.0)).otherwise(
        F.col("n_lower").cast("double") / (F.col("n") - F.lit(1))
    )
    rank_map = cum.select("source", "qq", pr.alias("pr"))
    return (
        scored.join(F.broadcast(rank_map), ["source", "qq"])
        .select(
            id_col,
            "source",
            (
                F.round(F.col("qq") / F.lit(1000000.0) + F.lit(1e-9), 4) + F.lit(0.0)
            ).alias("richness"),
            (F.round(F.col("pr") + F.lit(1e-9), 6) + F.lit(0.0)).alias("pct_rank"),
            (F.col("pr") >= F.lit(1.0 - frac)).alias("selected"),
        )
    )


def rater_agreement(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    score_threshold: float = 0.8,
) -> DataFrame:
    """Cohen's kappa between two independent quality classifiers —
    the Gopher rule conjunction and the composite quality-score
    threshold — per source.  Raw percent agreement is misleading when
    one rater accepts almost everything; kappa corrects for the
    agreement expected by chance from the raters' marginals, which is
    exactly the check run before trusting a cheap filter as a proxy
    for an expensive one (per source, because agreement on clean web
    text says nothing about agreement on a noisy crawl).

    kappa = (po - pe) / (1 - pe) with po from the 2x2 cell counts and
    pe from the marginal products.  All four cells are exact integer
    sums; the marginal products are composed in DOUBLE (never BIGINT
    — n^2 overflows at ~3e9 docs) with identical op order in both
    engines.  One scan, one k-row aggregate.  Degenerate pe == 1
    (both raters constant) reports kappa 0 by convention."""
    from .text import quality_score

    metrics = gopher_metric_columns(F.col(text_col))
    flags = gopher_rule_flags()
    with_metrics = docs.select(
        F.col(source_col).alias("source"),
        quality_score(F.col(text_col)).alias("qs"),
        *[expr.alias(name) for name, expr in metrics.items()],
    )
    a = (
        F.col("r_len") & F.col("r_word_len") & F.col("r_stop")
        & F.col("r_alpha") & F.col("r_dup")
    )
    rated = with_metrics.select(
        "source",
        *[expr.alias(name) for name, expr in flags.items()],
        (F.col("qs") >= F.lit(score_threshold)).alias("b"),
    ).select("source", a.alias("a"), "b")
    cells = rated.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("a") & F.col("b")).cast("long")).cast("long").alias("n11"),
        F.sum((F.col("a") & ~F.col("b")).cast("long")).cast("long").alias("n10"),
        F.sum((~F.col("a") & F.col("b")).cast("long")).cast("long").alias("n01"),
        F.sum((~F.col("a") & ~F.col("b")).cast("long")).cast("long").alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01")).cast("double")
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00")).cast("double")
    ) / (nd * nd)
    kappa = F.when(pe == 1.0, F.lit(0.0)).otherwise((po - pe) / (F.lit(1.0) - pe))
    return cells.select(
        "source",
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        (F.round(po + F.lit(1e-9), 6) + F.lit(0.0)).alias("percent_agree"),
        (F.round(pe + F.lit(1e-9), 6) + F.lit(0.0)).alias("chance_agree"),
        (F.round(kappa + F.lit(1e-9), 6) + F.lit(0.0)).alias("kappa"),
    )


def priority_sample(
    docs: DataFrame,
    k: int = 100,
    weight=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "psample|",
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): an
    exactly-k weighted sample WITHOUT replacement whose Horvitz-
    Thompson weights make any downstream subset-sum estimate unbiased
    — the principled way to carry a fixed-size sketch of a weighted
    corpus (weight = token count by default) through a pipeline.

    Each doc gets priority q = w / u with u the RNG-free md5 uniform
    draw in (0, 1] (hash60(salt||id) + 1, so u is never zero); the
    sample is the top-k priorities, the threshold tau is the
    (k+1)-th, and each sampled doc's estimator weight is
    ht_weight = max(w, tau): sum(ht_weight) over any predicate-
    selected subset of the sample estimates the subset's true total
    weight, unbiased.

    Everything is IEEE +-*/ on exact integers — no transcendentals,
    so priorities are bit-identical across engines.  Shape: one
    map-side projection, one TakeOrderedAndProject top-(k+1) (never a
    global sort), then rank/threshold over the k+1 survivors (persisted
    once; provably bounded by the LIMIT).  Deterministic and stable:
    a doc's draw never changes as the corpus grows, and re-runs
    reproduce the sample bit-for-bit."""
    from ..cache import tracked_persist

    cand = tracked_persist(
        priority_candidates(
            docs, k, weight=weight, id_col=id_col, text_col=text_col, salt=salt
        )
    )
    return sample_from_candidates(cand, k, id_col=id_col)


def priority_candidates(
    docs: DataFrame,
    k: int,
    weight=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "psample|",
) -> DataFrame:
    """The top-(k+1) (id, weight, priority) rows by the deterministic
    priority draw — the mergeable HALF of priority sampling: any
    member of the global top-(k+1) is necessarily in its own subset's
    top-(k+1), so top-(k+1) of a union of candidate sets equals the
    candidates of the union (associative, commutative, idempotent).
    The streaming sink logs this per batch; ``sample_from_candidates``
    finishes either path."""
    from .text import hash60, token_count

    w = (weight if weight is not None else token_count(F.col(text_col)))
    pri = docs.select(
        F.col(id_col),
        w.cast("long").alias("weight"),
        (
            w.cast("long").cast("double")
            / (
                (hash60(F.col(id_col).cast("string"), salt) + F.lit(1)).cast("double")
                / F.lit(1152921504606846976.0)
            )
        ).alias("priority"),
    )
    return pri.orderBy(F.col("priority").desc(), F.col(id_col)).limit(k + 1)


def sample_from_candidates(
    cand: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Finish priority sampling from a BOUNDED candidate frame (at
    most k+1 distinct docs after upstream dedup): rank, take the
    threshold tau from the (k+1)-th priority, emit the top-k with
    ht_weight = max(w, tau).  The global window is provably bounded
    by the candidate LIMIT."""
    from pyspark.sql import Window

    wnd = Window.orderBy(F.col("priority").desc(), F.col(id_col))
    ranked = cand.select(
        "*", F.row_number().over(wnd).cast("long").alias("rn")
    )
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("priority"))), F.lit(0.0)
        ).alias("tau")
    )
    return (
        ranked.where(F.col("rn") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            id_col,
            "weight",
            "priority",
            F.greatest(F.col("weight").cast("double"), F.col("tau")).alias(
                "ht_weight"
            ),
        )
    )


_LN2 = 0.6931471805599453


def js_divergence_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram term
    distributions of every source pair — the distributional companion
    to the KMV set-overlap matrix (x97): overlap says how much vocab
    two crawls share, JS says how differently they USE it, which is
    what matters when deciding if two sources are redundant in a
    training mixture.  Symmetric, bounded in [0, ln 2].

    Shared-terms-only rewrite: for M = (P+Q)/2, every term missing
    from Q contributes exactly p*ln2 to KL(P||M), so

        KL(P||M) = sum_shared p*ln(2p/(p+q)) + ln2*(1 - shared_mass_P)

    and only an INNER self-join on term is needed — exclusive vocab
    (the long tail, most of the join otherwise) never materializes as
    pair rows; its whole effect is one exact BIGINT count per pair.

    Determinism: per-term contributions are trunc-quantized to
    pico-units (BIGINT) before summing, so no order-dependent DOUBLE
    accumulation; shared mass is summed as raw BIGINT counts and
    divided once.  Shape: ONE token histogram (map-side combined,
    PERSISTED — it feeds the totals and both join sides, so without
    the persist the corpus explode would run four times), one
    equi-join on term (well-spread key), one pair aggregate; the
    all-pairs skeleton is a k x k cross of the k-row totals frame."""
    from ..cache import tracked_persist
    from .text import tokens

    hist = tracked_persist(
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("src", "term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = hist.groupBy("src").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_terms"),
    )
    h = hist.join(F.broadcast(tot.select("src", "n")), "src")
    a = h.select(
        F.col("src").alias("source_a"),
        "term",
        F.col("cnt").alias("cnt_a"),
        F.col("n").alias("n_a"),
    )
    b = h.select(
        F.col("src").alias("source_b"),
        F.col("term"),
        F.col("cnt").alias("cnt_b"),
        F.col("n").alias("n_b"),
    )
    pa = F.col("cnt_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("cnt_b").cast("double") / F.col("n_b").cast("double")
    shared = (
        a.join(b, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            "cnt_a",
            "cnt_b",
            # cast-to-long truncates toward zero (terms can be negative
            # when p < q) — mirrored by trunc() in the oracle, NOT floor
            (pa * F.log(F.lit(2.0) * pa / (pa + pb)) * F.lit(1e12))
            .cast("long")
            .alias("ta"),
            (pb * F.log(F.lit(2.0) * pb / (pa + pb)) * F.lit(1e12))
            .cast("long")
            .alias("tb"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_shared_terms"),
            F.sum("cnt_a").cast("long").alias("sh_a"),
            F.sum("cnt_b").cast("long").alias("sh_b"),
            F.sum("ta").cast("long").alias("sum_ta"),
            F.sum("tb").cast("long").alias("sum_tb"),
        )
    )
    skel = (
        tot.select(
            F.col("src").alias("source_a"),
            F.col("n").alias("n_a"),
            F.col("n_terms").alias("n_terms_a"),
        )
        .crossJoin(
            tot.select(
                F.col("src").alias("source_b"),
                F.col("n").alias("n_b"),
                F.col("n_terms").alias("n_terms_b"),
            )
        )
        .where(F.col("source_a") < F.col("source_b"))
    )
    j = skel.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        "n_terms_a",
        "n_terms_b",
        F.coalesce(F.col("n_shared_terms"), F.lit(0)).cast("long").alias(
            "n_shared_terms"
        ),
        (
            F.lit(0.5)
            * (
                F.coalesce(F.col("sum_ta"), F.lit(0)).cast("double") / F.lit(1e12)
                + F.lit(_LN2)
                * (
                    F.lit(1.0)
                    - F.coalesce(F.col("sh_a"), F.lit(0)).cast("double")
                    / F.col("n_a").cast("double")
                )
            )
            + F.lit(0.5)
            * (
                F.coalesce(F.col("sum_tb"), F.lit(0)).cast("double") / F.lit(1e12)
                + F.lit(_LN2)
                * (
                    F.lit(1.0)
                    - F.coalesce(F.col("sh_b"), F.lit(0)).cast("double")
                    / F.col("n_b").cast("double")
                )
            )
        ).alias("js_raw"),
    )
    return j.select(
        "source_a",
        "source_b",
        "n_terms_a",
        "n_terms_b",
        "n_shared_terms",
        (F.round(F.col("js_raw") + F.lit(1e-9), 6) + F.lit(0.0)).alias("js_divergence"),
    )


def lexical_diversity(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Lexical-diversity report per source: type-token ratio, hapax
    ratio (share of vocabulary seen exactly once), and Simpson
    concentration (sum of squared term probabilities — the chance two
    random tokens are the same word).  Low TTR + high Simpson =
    boilerplate; these are the cheap lexical screens run next to the
    Gopher rules when triaging a new crawl.

    One token histogram (map-side combined) -> per-source aggregate.
    Simpson terms are trunc-quantized to pico-units per distinct term
    BEFORE summing (order-independent BIGINT; raw sum(cnt^2) would
    overflow BIGINT at ~3e9 tokens/source)."""
    from ..cache import tracked_persist

    hist = tracked_persist(term_histogram(docs, source_col, text_col))
    return lexical_diversity_from_hist(hist, source_col)


def term_histogram(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The (src, term, cnt) token histogram — the mergeable state
    shared by the lexical screens (x129 diversity, x132 Zipf, x134
    fightin'-words all finish from it): counts ADD cell-wise across
    disjoint batches, so one incrementally-maintained histogram store
    serves every downstream lexical statistic, the same way the
    hourly-count store serves the four time-series detectors."""
    from .text import tokens

    return (
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("src", "term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def lexical_diversity_from_hist(
    hist: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Finish the lexical-diversity report from a (possibly merged)
    term histogram — see ``lexical_diversity``."""
    tot = hist.groupBy("src").agg(F.sum("cnt").cast("long").alias("n_tokens"))
    p = F.col("cnt").cast("double") / F.col("n_tokens").cast("double")
    per = (
        hist.join(F.broadcast(tot), "src")
        .select(
            "src",
            "n_tokens",
            "cnt",
            (p * p * F.lit(1e12)).cast("long").alias("sq"),
        )
        .groupBy("src")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum((F.col("cnt") == 1).cast("long")).cast("long").alias("n_hapax"),
            F.sum("sq").cast("long").alias("simpson_q"),
        )
    )
    return per.select(
        F.col("src").alias(source_col),
        "n_tokens",
        "n_types",
        "n_hapax",
        (
            F.round(
                F.col("n_types").cast("double") / F.col("n_tokens").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("type_token_ratio"),
        (
            F.round(
                F.col("n_hapax").cast("double") / F.col("n_types").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("hapax_ratio"),
        (
            F.round(F.col("simpson_q").cast("double") / F.lit(1e12) + F.lit(1e-9), 6)
            + F.lit(0.0)
        ).alias("simpson"),
        # Good-Turing missing mass: the probability the NEXT token is a
        # type never seen in this source — n_1/N, the standard estimate
        # of how under-sampled a source's vocabulary still is
        (
            F.round(
                F.col("n_hapax").cast("double") / F.col("n_tokens").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("gt_missing_mass"),
    )


def capture_recapture(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Chapman capture-recapture estimate of the underlying content
    population for every source pair — two crawls that independently
    sample the same population and share m documents imply a total of
    N ~ (n1+1)(n2+1)/(m+1) - 1 distinct documents, so N minus what we
    hold is the UNSEEN mass: the coverage question ('how much of this
    domain have we actually crawled?') answered from overlap alone.

    Identity is the content fingerprint (md5 of normalized text), so
    near-identical mirrors count as recaptures.  Shape: one scan to a
    distinct (source, fingerprint) frame (persisted — it feeds totals
    and both join sides), fingerprint equi-join for pair overlaps
    (well-spread key), k x k skeleton cross of the k-row totals.  All
    counts are exact BIGINTs; the estimator and its standard error
    compose in DOUBLE with fixed op order.  Pairs with zero overlap
    report NULL (the estimator is unbounded there)."""
    from ..cache import tracked_persist
    from .text import fingerprint

    fp = tracked_persist(
        docs.select(
            F.col(source_col).alias("src"),
            fingerprint(F.col(text_col)).alias("fp"),
        ).distinct()
    )
    tot = fp.groupBy("src").agg(F.count("*").cast("long").alias("n"))
    a = fp.select(F.col("src").alias("source_a"), "fp")
    b = fp.select(F.col("src").alias("source_b"), F.col("fp"))
    overlap = (
        a.join(b, "fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("m"))
    )
    skel = (
        tot.select(F.col("src").alias("source_a"), F.col("n").alias("n_a"))
        .crossJoin(tot.select(F.col("src").alias("source_b"), F.col("n").alias("n_b")))
        .where(F.col("source_a") < F.col("source_b"))
    )
    j = skel.join(overlap, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("n_shared"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    md = F.col("n_shared").cast("double")
    nhat = (na + F.lit(1.0)) * (nb + F.lit(1.0)) / (md + F.lit(1.0)) - F.lit(1.0)
    se = F.sqrt(
        (na + F.lit(1.0)) * (nb + F.lit(1.0)) * (na - md) * (nb - md)
        / ((md + F.lit(1.0)) * (md + F.lit(1.0)) * (md + F.lit(2.0)))
    )
    return j.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        "n_shared",
        F.when(
            F.col("n_shared") > 0,
            F.round(nhat + F.lit(1e-9), 4) + F.lit(0.0),
        ).alias("est_population"),
        F.when(
            F.col("n_shared") > 0,
            F.round(se + F.lit(1e-9), 4) + F.lit(0.0),
        ).alias("est_se"),
    )


def zipf_fit(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Least-squares Zipf fit per source: regress ln(term frequency)
    on ln(rank) over the full vocabulary and report the slope (natural
    language sits near -1), intercept, and R^2.  A crawl whose slope
    is far from -1 or whose fit is poor is usually template/boiler-
    plate or machine-generated text — the distributional companion to
    the TTR/hapax screens (x129).

    Shape: one token histogram; rank = row_number over (cnt DESC,
    term) per source — a window over DISTINCT TERMS, never corpus
    rows.  All four regression moments are per-term trunc-quantized
    BIGINT sums (micro-units for the squared/product terms, whose raw
    DOUBLE sums would be order-dependent; ln(rank) <= ~19 and
    ln(rank)^2 <= ~340, so sums stay under BIGINT through 1e8-term
    vocabularies).  Single-term vocabularies are degenerate -> NULL."""
    return zipf_fit_from_hist(term_histogram(docs, source_col, text_col), source_col)


def zipf_fit_from_hist(hist: DataFrame, source_col: str = "source") -> DataFrame:
    """Finish the Zipf fit from a (possibly merged) term histogram —
    see ``zipf_fit``."""
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("cnt").desc(), "term")
    lr = F.log(F.row_number().over(w).cast("double"))
    lf = F.log(F.col("cnt").cast("double"))
    mega = F.lit(1e6)
    terms = hist.select(
        "src",
        (lr * mega).cast("long").alias("qx"),
        (lf * mega).cast("long").alias("qy"),
        (lr * lr * mega).cast("long").alias("qxx"),
        (lr * lf * mega).cast("long").alias("qxy"),
        (lf * lf * mega).cast("long").alias("qyy"),
    )
    per = terms.groupBy("src").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("qx").cast("long").alias("sx"),
        F.sum("qy").cast("long").alias("sy"),
        F.sum("qxx").cast("long").alias("sxx"),
        F.sum("qxy").cast("long").alias("sxy"),
        F.sum("qyy").cast("long").alias("syy"),
    )
    nd = F.col("n_types").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e6)
    sy = F.col("sy").cast("double") / F.lit(1e6)
    sxx = F.col("sxx").cast("double") / F.lit(1e6)
    sxy = F.col("sxy").cast("double") / F.lit(1e6)
    syy = F.col("syy").cast("double") / F.lit(1e6)
    den_x = nd * sxx - sx * sx
    den_y = nd * syy - sy * sy
    cov = nd * sxy - sx * sy
    slope = cov / den_x
    intercept = (sy - slope * sx) / nd
    r2 = cov * cov / (den_x * den_y)
    ok = (F.col("n_types") > 1) & (den_x > 0)
    return per.select(
        F.col("src").alias(source_col),
        "n_types",
        F.when(ok, F.round(slope + F.lit(1e-9), 6) + F.lit(0.0)).alias("zipf_slope"),
        F.when(ok, F.round(intercept + F.lit(1e-9), 6) + F.lit(0.0)).alias(
            "zipf_intercept"
        ),
        F.when(
            ok & (den_y > 0), F.round(r2 + F.lit(1e-9), 6) + F.lit(0.0)
        ).alias("r_squared"),
    )


def packing_efficiency(
    docs: DataFrame,
    budget: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Packing-efficiency report per shard: how many context windows
    the greedy id-order packing (x27 semantics) uses versus the naive
    one-doc-per-window baseline (long docs cost ceil(tokens/budget)
    windows either way), and the fill ratio of each — the number that
    justifies running the packer at all, and the regression canary
    when document length distributions drift.

    ONE scan: the per-doc token counts flow through the same per-shard
    running-sum window as pack_sequences, then a single per-shard
    aggregate computes docs, tokens, distinct bins, and naive window
    counts together.  All integers except the three final ratios."""
    toks = docs.select(
        shard_col, id_col, token_count(F.col(text_col)).alias("n_tokens")
    )
    w = (
        W.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    binned = toks.select(
        shard_col,
        "n_tokens",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget
        ).cast("long").alias("bin_id"),
        F.ceil(F.col("n_tokens") / F.lit(float(budget))).cast("long").alias(
            "n_naive_windows"
        ),
    )
    per = binned.groupBy(shard_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("bin_id").cast("long").alias("n_packed"),
        F.sum("n_naive_windows").cast("long").alias("n_naive"),
    )
    bd = F.lit(float(budget))
    return per.select(
        shard_col,
        "n_docs",
        "total_tokens",
        "n_packed",
        "n_naive",
        (
            F.round(
                F.col("total_tokens").cast("double")
                / (F.col("n_packed").cast("double") * bd)
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("packed_fill"),
        (
            F.round(
                F.col("total_tokens").cast("double")
                / (F.col("n_naive").cast("double") * bd)
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("naive_fill"),
        (
            F.round(
                F.col("n_naive").cast("double") / F.col("n_packed").cast("double")
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("window_savings"),
    )


def distinguishing_terms(
    docs: DataFrame,
    source_a: str,
    source_b: str,
    topk: int = 15,
    alpha: float = 0.01,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The terms that statistically distinguish source A from source B
    — log-odds ratio with an informative Dirichlet prior (Monroe,
    Colaresi & Quinn, "Fightin' Words", 2008), the standard
    comparative-corpus analysis: raw frequency differences overweight
    common words and raw ratios overweight rare ones; the prior (here
    alpha x the pooled corpus frequency) shrinks both, and the z-score
    ranks by EVIDENCE of difference.

        delta_w = ln(y_aw + a_w) - ln(n_a + a0 - y_aw - a_w)
                - ln(y_bw + a_w) + ln(n_b + a0 - y_bw - a_w)
        var_w   ~ 1/(y_aw + a_w) + 1/(y_bw + a_w)
        z_w     = delta_w / sqrt(var_w)

    Top-k by z in each direction.  Shape: one token histogram for the
    two sources (FULL OUTER merged via conditional aggregation on the
    pooled per-term counts — one groupBy, absent terms get count 0;
    PERSISTED, because the totals and both top-k directions consume
    it), scalar totals broadcast, map-side z computation, two
    TakeOrderedAndProject top-ks.  z is per-term arithmetic
    (unrounded per-row ln is fine — the output rounds once)."""
    from ..cache import tracked_persist
    from .text import tokens

    pair = docs.where(F.col(source_col).isin([source_a, source_b]))
    hist = tracked_persist(
        pair.select(
            F.col(source_col).alias("src"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("term")
        .agg(
            F.sum((F.col("src") == source_a).cast("long")).cast("long").alias("ya"),
            F.sum((F.col("src") == source_b).cast("long")).cast("long").alias("yb"),
        )
    )
    tot = hist.agg(
        F.sum("ya").cast("long").alias("na"),
        F.sum("yb").cast("long").alias("nb"),
        F.count("*").cast("long").alias("vocab"),
    )
    h = hist.crossJoin(F.broadcast(tot))
    ya = F.col("ya").cast("double")
    yb = F.col("yb").cast("double")
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    # informative prior: alpha * pooled frequency share, floored so
    # every term has positive mass on both sides
    aw = F.lit(alpha) * (ya + yb)
    a0 = F.lit(alpha) * (na + nb)
    delta = (
        F.log(ya + aw)
        - F.log(na + a0 - ya - aw)
        - F.log(yb + aw)
        + F.log(nb + a0 - yb - aw)
    )
    var = F.lit(1.0) / (ya + aw) + F.lit(1.0) / (yb + aw)
    z = delta / F.sqrt(var)
    scored = h.select(
        "term",
        "ya",
        "yb",
        (F.round(z + F.lit(1e-9), 4) + F.lit(0.0)).alias("z"),
    )
    top_a = scored.orderBy(F.col("z").desc(), "term").limit(topk).select(
        F.lit(source_a).alias("favors"), "term", "ya", "yb", "z"
    )
    top_b = scored.orderBy(F.col("z").asc(), "term").limit(topk).select(
        F.lit(source_b).alias("favors"), "term", "ya", "yb", "z"
    )
    return top_a.unionByName(top_b)


def readability_report(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    hard_threshold: float = 30.0,
) -> DataFrame:
    """Flesch reading-ease report per source — the classic readability
    screen (206.835 - 1.015*(words/sentences) - 84.6*(syllables/word))
    computed with a deterministic syllable proxy: vowel-group count
    per word, floored at 1 (the standard heuristic; identical under
    Java regex and RE2, so oracle-checkable).  Scores ~90 read like
    children's books, ~30 like academic prose; a source whose mean
    collapses or whose hard-share spikes usually changed extraction,
    not audience.

    ONE scan, map-only per-doc arithmetic (token array bound once),
    per-doc scores trunc-quantized to micro-units so the per-source
    mean is an exact-BIGINT sum divided once."""
    from .text import tokens

    toks = tokens(F.col(text_col))
    w_cnt = F.size(toks).cast("double")
    sentences = F.greatest(
        F.size(
            F.filter(
                F.split(F.col(text_col), "[.!?]"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ),
        F.lit(1),
    ).cast("double")
    syllables = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))), F.lit(1)
        ).cast("long"),
    ).cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (w_cnt / sentences)
        - F.lit(84.6) * (syllables / w_cnt)
    )
    rated = docs.select(
        F.col(source_col).alias("src"),
        (flesch * F.lit(1e6)).cast("long").alias("fq"),
    )
    per = rated.groupBy("src").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("fq").cast("long").alias("sum_fq"),
        F.sum((F.col("fq") < F.lit(int(hard_threshold * 1e6))).cast("long"))
        .cast("long")
        .alias("n_hard"),
    )
    return per.select(
        F.col("src").alias(source_col),
        "n_docs",
        (
            F.round(
                F.col("sum_fq").cast("double")
                / F.col("n_docs").cast("double")
                / F.lit(1e6)
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("mean_flesch"),
        (
            F.round(
                F.col("n_hard").cast("double") / F.col("n_docs").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("hard_share"),
    )


def vocabulary_churn(
    old_docs: DataFrame,
    new_docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary churn between two corpus snapshots, per source: how
    many terms appeared, vanished, and persisted — and how much TOKEN
    MASS the churned terms carry (type counts alone overweight the
    hapax tail; a crawl can gain 50% new types that carry 0.1% of
    tokens).  High mass-weighted churn means the extraction or the
    underlying content actually changed; the term-level companion to
    x98's distribution drift.

    Shape: one term histogram per side merged by a conditional
    aggregation on (src, term) — one groupBy, absent sides get count
    0, no join; then a per-source k-row aggregate.  All counts exact
    BIGINTs; the three rates are the only rounded ratios."""
    both = old_docs.select(
        F.lit(0).alias("side"), F.col(source_col).alias("s"), F.col(text_col).alias("t")
    ).unionByName(
        new_docs.select(
            F.lit(1).alias("side"),
            F.col(source_col).alias("s"),
            F.col(text_col).alias("t"),
        )
    )
    from .text import tokens

    hist = (
        both.select("side", F.col("s").alias("src"), F.explode(tokens(F.col("t"))).alias("term"))
        .groupBy("src", "term")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast("long").alias("c_old"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("c_new"),
        )
    )
    per = hist.groupBy("src").agg(
        F.sum((F.col("c_old") > 0).cast("long")).cast("long").alias("n_types_old"),
        F.sum((F.col("c_new") > 0).cast("long")).cast("long").alias("n_types_new"),
        F.sum(((F.col("c_old") > 0) & (F.col("c_new") == 0)).cast("long"))
        .cast("long")
        .alias("n_lost"),
        F.sum(((F.col("c_old") == 0) & (F.col("c_new") > 0)).cast("long"))
        .cast("long")
        .alias("n_gained"),
        F.sum(F.col("c_new")).cast("long").alias("tok_new"),
        F.sum(F.when(F.col("c_old") == 0, F.col("c_new")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tok_new_in_gained"),
        F.sum(F.col("c_old")).cast("long").alias("tok_old"),
        F.sum(F.when(F.col("c_new") == 0, F.col("c_old")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tok_old_in_lost"),
    )
    return per.select(
        F.col("src").alias(source_col),
        "n_types_old",
        "n_types_new",
        "n_lost",
        "n_gained",
        F.when(
            F.col("n_types_new") > 0,
            F.round(
                F.col("n_gained").cast("double") / F.col("n_types_new").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0),
        ).alias("type_gain_rate"),
        F.when(
            F.col("tok_new") > 0,
            F.round(
                F.col("tok_new_in_gained").cast("double")
                / F.col("tok_new").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0),
        ).alias("mass_gain_rate"),
        F.when(
            F.col("tok_old") > 0,
            F.round(
                F.col("tok_old_in_lost").cast("double")
                / F.col("tok_old").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0),
        ).alias("mass_loss_rate"),
    )


def ks_drift(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test of the document-LENGTH
    distribution (token counts) between every source pair: D = the
    maximum ECDF gap, with the asymptotic p-value — the standard
    'did this crawl's length profile drift?' screen, sharper than
    comparing means because it sees shape changes (truncation,
    chunking, boilerplate padding) that leave the mean alone.

    Shape: ONE corpus scan into a (src, len, cnt) histogram (persisted
    — it feeds totals and both pair sides); the pair grid is the union
    of distinct lengths per pair, a full-outer align + two running
    sums over the AGGREGATED frame only.  ECDF values are exact-BIGINT
    ratios, so D is bit-identical across engines; the p-value is the
    standard Kolmogorov asymptotic series truncated at one term
    (2*exp(-2 D^2 n_e)), documented as an upper-tail approximation."""
    from ..cache import tracked_persist

    hist = tracked_persist(length_histogram(docs, source_col, text_col))
    return ks_from_hist(hist)


def length_histogram(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The (src, len, cnt) document-length histogram — mergeable state
    (counts ADD cell-wise across disjoint batches) shared by the KS
    drift screen, the same way ``term_histogram`` serves the lexical
    family and the hourly store serves the time-series detectors."""
    return (
        docs.select(
            F.col(source_col).alias("src"),
            token_count(F.col(text_col)).alias("len"),
        )
        .groupBy("src", "len")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def ks_from_hist(hist: DataFrame) -> DataFrame:
    """Finish the pairwise KS drift report from a (possibly merged)
    length histogram — see ``ks_drift``."""
    tot = hist.groupBy("src").agg(F.sum("cnt").cast("long").alias("n"))
    skel = (
        tot.select(F.col("src").alias("source_a"), F.col("n").alias("n_a"))
        .crossJoin(
            F.broadcast(
                tot.select(F.col("src").alias("source_b"), F.col("n").alias("n_b"))
            )
        )
        .where(F.col("source_a") < F.col("source_b"))
    )
    pair_keys = skel.select("source_a", "source_b")
    ga = hist.select(
        F.col("src").alias("source_a"), "len", F.col("cnt").alias("ca")
    ).join(F.broadcast(pair_keys), "source_a")
    gb = hist.select(
        F.col("src").alias("source_b"), "len", F.col("cnt").alias("cb")
    ).join(F.broadcast(pair_keys), "source_b")
    grid = ga.join(gb, ["source_a", "source_b", "len"], "full_outer")
    # the full-outer align keeps every length either side observed;
    # absent-side counts are zero and two running sums give the ECDFs
    w = W.partitionBy("source_a", "source_b").orderBy("len")
    cum = grid.select(
        "source_a",
        "source_b",
        "len",
        F.sum(F.coalesce(F.col("ca"), F.lit(0))).over(w).cast("long").alias("cum_a"),
        F.sum(F.coalesce(F.col("cb"), F.lit(0))).over(w).cast("long").alias("cum_b"),
    )
    d_at = F.abs(
        F.col("cum_a").cast("double") / F.col("n_a").cast("double")
        - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
    )
    per = (
        cum.join(F.broadcast(skel), ["source_a", "source_b"])
        .groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(F.max(d_at).alias("ks_d_raw"))
    )
    ne = (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    p = F.least(
        F.lit(1.0),
        F.lit(2.0) * F.exp(F.lit(-2.0) * F.col("ks_d_raw") * F.col("ks_d_raw") * ne),
    )
    return per.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        (F.round(F.col("ks_d_raw") + F.lit(1e-9), 6) + F.lit(0.0)).alias("ks_d"),
        (F.round(p + F.lit(1e-9), 6) + F.lit(0.0)).alias("p_value"),
        (F.col("ks_d_raw") > F.lit(1.36) * F.sqrt(F.lit(1.0) / ne)).alias(
            "drifted"
        ),
    )


def heaps_fit(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law fit per source: vocabulary growth V(n) ~ K * n^beta
    over the corpus read in doc_id order — beta near 0.4-0.6 is
    natural text; beta near 0 means the vocabulary saturates
    (template/boilerplate), beta near 1 means unbounded novel tokens
    (serial numbers, hashes — tokenizer poison).  The scaling
    companion to Zipf's x132: Zipf checks the frequency SHAPE, Heaps
    checks how the vocabulary GROWS, and a source can pass one while
    failing the other.

    Exact integer construction: global token position = per-source
    running sum of doc lengths (the x133 window) + within-doc offset;
    each term's FIRST position is a min-aggregate; checkpoints are the
    power-of-two positions (bucket = bit-length(first_pos) - 1, pure
    integer arithmetic — no float log2 edge cases), so V at checkpoint
    2^(b+1)-1 is a cumulative count of first occurrences.  The log-log
    OLS runs over <= 40 checkpoints with per-checkpoint micro-
    quantized BIGINT moments (the x132 regression kit).  Sources with
    < 3 checkpoints report NULL fits."""
    from ..cache import tracked_persist

    narrow = tracked_persist(
        docs.select(
            F.col(source_col).alias("src"),
            F.col(id_col).alias("did"),
            token_count(F.col(text_col)).alias("nt"),
        )
    )
    wdoc = (
        W.partitionBy("src")
        .orderBy("did")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # the running-sum window runs over NARROW (src, did, nt) rows only
    # (the x133 discipline) — the corpus text never rides the per-source
    # sort; offsets join back to the text on the well-spread doc id
    offsets = narrow.select(
        "src",
        "did",
        F.coalesce(F.sum("nt").over(wdoc), F.lit(0)).cast("long").alias("offset"),
    )
    with_off = docs.select(
        F.col(id_col).alias("did"), tokens_of(F.col(text_col)).alias("toks")
    ).join(offsets, "did")
    positioned = with_off.select(
        "src", "offset", F.posexplode("toks").alias("pos", "term")
    )
    first = (
        positioned.select(
            "src", "term", (F.col("offset") + F.col("pos") + 1).alias("gpos")
        )
        .groupBy("src", "term")
        .agg(F.min("gpos").cast("long").alias("first_pos"))
    )
    n_tok = narrow.groupBy("src").agg(F.sum("nt").cast("long").alias("n_tokens"))
    bucket = (F.length(F.conv(F.col("first_pos"), 10, 2)) - 1).cast("int")
    by_bucket = (
        first.select("src", bucket.alias("b"))
        .groupBy("src", "b")
        .agg(F.count("*").cast("long").alias("new_types"))
    )
    wb = W.partitionBy("src").orderBy("b")
    ckpt = (
        by_bucket.select(
            "src",
            "b",
            F.sum("new_types").over(wb).cast("long").alias("v"),
        )
        .join(F.broadcast(n_tok), "src")
        .select(
            "src",
            F.least(
                F.expr("shiftleft(CAST(1 AS BIGINT), b + 1)") - 1,
                F.col("n_tokens"),
            ).alias("n_at"),
            "v",
            "n_tokens",
        )
    )
    mega = F.lit(1e6)
    lx = F.log(F.col("n_at").cast("double"))
    ly = F.log(F.col("v").cast("double"))
    terms = ckpt.select(
        "src",
        "n_tokens",
        (lx * mega).cast("long").alias("qx"),
        (ly * mega).cast("long").alias("qy"),
        (lx * lx * mega).cast("long").alias("qxx"),
        (lx * ly * mega).cast("long").alias("qxy"),
        (ly * ly * mega).cast("long").alias("qyy"),
    )
    per = terms.groupBy("src").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count("*").cast("long").alias("n_checkpoints"),
        F.sum("qx").cast("long").alias("sx"),
        F.sum("qy").cast("long").alias("sy"),
        F.sum("qxx").cast("long").alias("sxx"),
        F.sum("qxy").cast("long").alias("sxy"),
        F.sum("qyy").cast("long").alias("syy"),
    )
    nd = F.col("n_checkpoints").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e6)
    sy = F.col("sy").cast("double") / F.lit(1e6)
    sxx = F.col("sxx").cast("double") / F.lit(1e6)
    sxy = F.col("sxy").cast("double") / F.lit(1e6)
    syy = F.col("syy").cast("double") / F.lit(1e6)
    den_x = nd * sxx - sx * sx
    den_y = nd * syy - sy * sy
    cov = nd * sxy - sx * sy
    slope = cov / den_x
    intercept = (sy - slope * sx) / nd
    r2 = cov * cov / (den_x * den_y)
    ok = (F.col("n_checkpoints") >= 3) & (den_x > 0)
    return per.select(
        F.col("src").alias(source_col),
        "n_tokens",
        "n_checkpoints",
        F.when(ok, F.round(slope + F.lit(1e-9), 6) + F.lit(0.0)).alias("heaps_beta"),
        F.when(ok, F.round(F.exp(intercept) + F.lit(1e-9), 4) + F.lit(0.0)).alias(
            "heaps_k"
        ),
        F.when(
            ok & (den_y > 0), F.round(r2 + F.lit(1e-9), 6) + F.lit(0.0)
        ).alias("r_squared"),
    )


def psi_from_hist(hist: DataFrame, smooth: float = 0.5, crit: float = 0.2) -> DataFrame:
    """Finish the PSI drift report from a (possibly merged) length
    histogram — see ``length_psi``."""
    binned = (
        hist.select(
            "src",
            (F.length(F.conv(F.col("len"), 10, 2)) - 1).cast("int").alias("b"),
            "cnt",
        )
        .groupBy("src", "b")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    tot_bin = binned.groupBy("b").agg(F.sum("n").cast("long").alias("n_all"))
    tot_src = binned.groupBy("src").agg(F.sum("n").cast("long").alias("n_src"))
    n_total = binned.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.countDistinct("b").cast("long").alias("n_bins"),
    )
    skel = tot_src.crossJoin(F.broadcast(tot_bin))
    cells = (
        skel.join(binned, ["src", "b"], "left")
        .select(
            "src",
            "b",
            "n_src",
            "n_all",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_in"),
        )
        .crossJoin(F.broadcast(n_total))
    )
    sm = F.lit(smooth)
    bins_d = F.col("n_bins").cast("double")
    p = (F.col("n_in").cast("double") + sm) / (
        F.col("n_src").cast("double") + sm * bins_d
    )
    rest_in = (F.col("n_all") - F.col("n_in")).cast("double")
    rest_tot = (F.col("n_tot") - F.col("n_src")).cast("double")
    q = (rest_in + sm) / (rest_tot + sm * bins_d)
    termq = ((p - q) * F.log(p / q) * F.lit(1e12)).cast("long")
    per = cells.groupBy("src", "n_src").agg(
        F.max("n_bins").alias("n_bins"),
        F.sum(termq).cast("long").alias("psi_q"),
    )
    psi = F.col("psi_q").cast("double") / F.lit(1e12)
    return per.select(
        F.col("src").alias("source"),
        F.col("n_src").alias("n_docs"),
        "n_bins",
        (F.round(psi + F.lit(1e-9), 6) + F.lit(0.0)).alias("psi"),
        (psi > F.lit(crit)).alias("drifted"),
    )


def length_psi(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    smooth: float = 0.5,
    crit: float = 0.2,
) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the REST of the corpus — the standard ML-ops
    drift score (PSI > 0.2 = significant shift), reported next to the
    KS test (x139): KS answers 'statistically different?', PSI scores
    HOW FAR the mass moved in interpretable units.

    Bins are integer bit-length buckets of the token count (pure
    integer arithmetic, no libm edge cases), Laplace-smoothed so
    empty bins never hit ln(0); per-bin contributions are
    pico-quantized BIGINTs before the cross-bin sum (house float
    discipline).  One corpus scan into the SAME persisted length
    histogram the KS screen reads — the two drift monitors share one
    store, batch and streaming."""
    from ..cache import tracked_persist

    hist = tracked_persist(length_histogram(docs, source_col, text_col))
    return psi_from_hist(hist, smooth, crit)


def hill_tail_index(
    docs: DataFrame,
    k: int = 50,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Hill estimator of the term-frequency tail index per source —
    the heavy-tail diagnostic next to the Zipf fit: the OLS slope
    (x132) fits the WHOLE rank curve, while the Hill alpha
    (1 / mean ln(f_i / f_(k+1)) over the top-k frequencies) measures
    just the head's decay, so the two disagreeing localizes WHERE the
    distribution deviates (head vs tail).

    One token histogram (the shared ``term_histogram``), a rank
    window over DISTINCT TERMS only (cnt desc, term tiebreak —
    deterministic under frequency ties), and a k-row-per-source
    aggregate of micro-quantized BIGINT ln-ratio terms.  Sources with
    fewer than k+1 types report NULL."""
    from ..cache import tracked_persist

    hist = term_histogram(docs, source_col, text_col)
    w = W.partitionBy("src").orderBy(F.col("cnt").desc(), "term")
    # persisted: the (k+1)-per-source head feeds both the f_(k+1)
    # lookup and the ln-ratio sum — without it the corpus explode +
    # rank window run twice
    top = tracked_persist(
        hist.select(
            "src", "cnt", F.row_number().over(w).alias("rn")
        ).filter(F.col("rn") <= k + 1)
    )
    fk1 = top.filter(F.col("rn") == k + 1).select(
        "src", F.col("cnt").alias("f_k1")
    )
    lterm = F.log(F.col("cnt").cast("double") / F.col("f_k1").cast("double"))
    per = (
        top.filter(F.col("rn") <= k)
        .join(F.broadcast(fk1), "src", "left")
        .select(
            "src",
            "f_k1",
            F.when(
                F.col("f_k1").isNotNull(), (lterm * F.lit(1e6)).cast("long")
            ).alias("lq"),
        )
        .groupBy("src", "f_k1")
        .agg(
            F.count("*").cast("long").alias("n_head"),
            F.sum("lq").cast("long").alias("lsum"),
        )
    )
    mean_l = F.col("lsum").cast("double") / F.lit(1e6) / F.col("n_head").cast(
        "double"
    )
    return per.select(
        F.col("src").alias(source_col),
        F.col("n_head").alias("k"),
        F.col("f_k1").alias("f_kplus1"),
        F.when(
            (F.col("n_head") == k) & (mean_l > 0),
            F.round(F.lit(1.0) / mean_l + F.lit(1e-9), 4) + F.lit(0.0),
        ).alias("hill_alpha"),
    )


def conformal_thresholds(
    cal: DataFrame,
    test: DataFrame,
    qscore_col: str,
    alpha_ppm: tuple[int, ...] = (10_000, 50_000, 100_000),
) -> DataFrame:
    """Split-conformal calibration of a quality-filter threshold: on
    the calibration split, take the k-th smallest score where k =
    floor(alpha * (n_cal + 1)) — the distribution-free threshold that
    rejects at most an alpha fraction of in-distribution documents
    (finite-sample guarantee, no model assumptions) — then report the
    ACHIEVED keep-rate on the held-out split.  The principled way to
    turn any quality signal (x08, x129) into a filter cutoff, replacing
    hand-picked thresholds.

    ``qscore_col`` must be BIGINT-quantized (house discipline); alphas
    arrive in parts-per-million so the rank k = (alpha_ppm *
    (n_cal + 1)) // 1e6 is EXACT integer arithmetic — no float
    boundary can flip an order statistic.  When alpha < 1/(n_cal+1)
    the rank is 0 and NO finite-sample cutoff exists (clamping to the
    minimum score would reject up to 1/(n_cal+1) > alpha of
    in-distribution documents, breaking the guarantee) — the row is
    emitted with NULL threshold / n_kept / test_keep_rate.

    Scale shape: one persisted calibration-score histogram (bounded by
    score quantization, not rows) serves the totals; the cumulative
    walk is fed from an identity re-aggregation of the cached
    histogram so the single-partition exchange's direct child is an
    aggregate the plan linter can prove bounded (key_skew_profile
    discipline, operators/profile.py); the test scan aggregates
    against the |alphas|-row broadcast threshold frame.  Output: one
    row per alpha.

    Implementation: both splits reduce to exact (q, nk) histograms in
    ONE scan each, then delegate to ``conformal_from_hist`` — the same
    entry point the streaming twin's maintained histogram store feeds
    (streaming/sinks.py make_conformal_sink), so the continuous view
    is bit-equal to this operator by construction."""
    q = F.col(qscore_col)
    cal_hist = cal.groupBy(q.alias("q")).agg(
        F.count("*").cast("long").alias("nk")
    )
    test_hist = test.groupBy(q.alias("q")).agg(
        F.count("*").cast("long").alias("nk")
    )
    return conformal_from_hist(cal_hist, test_hist, alpha_ppm)


def conformal_from_hist(
    cal_hist: DataFrame,
    test_hist: DataFrame,
    alpha_ppm: tuple[int, ...] = (10_000, 50_000, 100_000),
) -> DataFrame:
    """``conformal_thresholds`` over pre-aggregated exact score
    histograms (q, nk) — the shared core of the batch operator and the
    streaming view (whose maintained state is exactly these mergeable
    count cells).  All rank arithmetic is integer; histogram totals
    replace row counts one-for-one (sum(nk) == count of underlying
    rows), so the two entry points are value-identical."""
    from pyspark.sql import Window as W

    from ..cache import tracked_persist

    # The cumulative walk feeds from an identity RE-AGGREGATION of the
    # cached histogram (q is unique, sum(nk) == nk) — NOT from hist
    # directly: the global window's single-partition exchange must
    # have an aggregate as its direct child so the plan linter can
    # prove it bounded (key_skew_profile discipline, profile.py; an
    # InMemoryRelation child hides the proof, and Spark's cache
    # substitution re-inserts one for any plan-equal subtree, so the
    # re-aggregation is the only shape that survives).
    hist = tracked_persist(
        cal_hist.groupBy("q").agg(F.sum("nk").cast("long").alias("nk"))
    )
    tot = hist.agg(F.sum("nk").cast("long").alias("n_cal"))
    cum = (
        hist.groupBy("q")
        .agg(F.sum("nk").cast("long").alias("nk"))
        .withColumn("ck", F.sum("nk").over(W.orderBy("q")))
    )
    alphas = cal_hist.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(a)) for a in alpha_ppm])).alias("a")
    ).select(F.col("a").cast("long").alias("alpha_ppm"))
    ranks = alphas.crossJoin(F.broadcast(tot)).select(
        "alpha_ppm",
        "n_cal",
        F.expr("alpha_ppm * (n_cal + 1) div 1000000")
        .cast("long")
        .alias("k_rank"),
    )
    thr_hit = (
        ranks.filter(F.col("k_rank") >= 1)
        .join(cum.crossJoin(F.broadcast(tot)).select("q", "ck", "n_cal"), "n_cal")
        .filter(F.col("ck") >= F.col("k_rank"))
        .groupBy("alpha_ppm", "n_cal", "k_rank")
        .agg(F.min("q").alias("threshold_q"))
    )
    # k_rank == 0 rows survive with NULL threshold_q (no valid cutoff)
    thr = ranks.join(thr_hit, ["alpha_ppm", "n_cal", "k_rank"], "left")
    kept = (
        test_hist.select(F.col("q").alias("tq"), "nk")
        .crossJoin(F.broadcast(thr))
        .groupBy("alpha_ppm", "n_cal", "k_rank", "threshold_q")
        .agg(
            F.sum("nk").cast("long").alias("n_test"),
            # three-way: NULL threshold stays NULL (no valid cutoff),
            # a valid threshold counts nk above it and 0 below —
            # sum(over all-below) must be 0, not NULL, to match the
            # row-level sum((tq >= thr)::long) it replaces
            F.sum(
                F.when(F.col("threshold_q").isNull(), F.lit(None))
                .when(F.col("tq") >= F.col("threshold_q"), F.col("nk"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_kept"),
        )
    )
    return kept.select(
        (F.col("alpha_ppm").cast("double") / F.lit(1e6)).alias("alpha"),
        "n_cal",
        "k_rank",
        (
            F.round(F.col("threshold_q").cast("double") / F.lit(1e6) + F.lit(1e-9), 6)
            + F.lit(0.0)
        ).alias("threshold"),
        "n_test",
        "n_kept",
        (
            F.round(
                F.col("n_kept").cast("double") / F.col("n_test").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("test_keep_rate"),
    )


def padding_efficiency(
    docs: DataFrame,
    max_len: int = 512,
    bucket_width: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Length-bucketed batch-planning report: how much padding a
    training loader wastes batching these documents, per length bucket
    and against the naive pad-everything-to-max_len baseline — the
    datasheet a dynamic-batching (bucket-by-length) loader is sized
    from.  Documents longer than ``max_len`` tokens truncate to it
    (the loader's behavior); each doc pads to its bucket's cap
    (ceil(len / bucket_width) * bucket_width, capped at max_len).

    Output (long-form): one row per non-empty bucket with strategy
    'bucketed' (bucket, cap_len, n_docs, sum_tokens, padded_tokens,
    waste_tokens, efficiency = sum/padded) plus ONE 'naive_max_len'
    row (every doc padded to max_len) — the efficiency gap between
    them is the win bucketing buys.  All integer arithmetic except
    the final ratio.

    Scale shape: ONE corpus scan -> per-bucket combinable aggregate
    (bounded by max_len / bucket_width buckets); the naive row is a
    re-aggregation of the same tiny frame."""
    from ..cache import tracked_persist
    from .text import token_count

    eff_len = F.least(token_count(F.col(text_col)), F.lit(max_len))
    n_buckets = (max_len + bucket_width - 1) // bucket_width
    bucket = F.least(
        F.ceil(eff_len.cast("double") / F.lit(float(bucket_width))).cast("long"),
        F.lit(n_buckets).cast("long"),
    )
    # ONE corpus scan; both strategies read this bucket-count frame
    per_bucket = tracked_persist(
        docs.select(bucket.alias("bucket"), eff_len.alias("len"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("len").cast("long").alias("sum_tokens"),
        )
    )
    cap = F.col("bucket") * F.lit(bucket_width)
    bucketed = per_bucket.select(
        F.lit("bucketed").alias("strategy"),
        F.col("bucket").cast("long").alias("bucket"),
        cap.cast("long").alias("cap_len"),
        "n_docs",
        "sum_tokens",
        (F.col("n_docs") * cap).cast("long").alias("padded_tokens"),
        (F.col("n_docs") * cap - F.col("sum_tokens"))
        .cast("long")
        .alias("waste_tokens"),
    )
    naive = per_bucket.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_tokens").cast("long").alias("sum_tokens"),
    ).select(
        F.lit("naive_max_len").alias("strategy"),
        F.lit(None).cast("long").alias("bucket"),
        F.lit(max_len).cast("long").alias("cap_len"),
        "n_docs",
        "sum_tokens",
        (F.col("n_docs") * F.lit(max_len)).cast("long").alias("padded_tokens"),
        (F.col("n_docs") * F.lit(max_len) - F.col("sum_tokens"))
        .cast("long")
        .alias("waste_tokens"),
    )
    out = bucketed.unionByName(naive)
    return out.select(
        "strategy",
        "bucket",
        "cap_len",
        "n_docs",
        "sum_tokens",
        "padded_tokens",
        "waste_tokens",
        (
            F.round(
                F.col("sum_tokens").cast("double")
                / F.col("padded_tokens").cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("efficiency"),
    )


def truncation_loss(
    docs: DataFrame,
    max_lens: tuple[int, ...] = (128, 256, 512, 1024, 2048),
    text_col: str = "text",
) -> DataFrame:
    """Context-length sweep: for each candidate ``max_len``, the
    fraction of documents that would truncate and the fraction of
    corpus TOKENS lost to truncation — the report that picks a
    training sequence length (the doc-count view understates the
    damage: a few long documents can carry most of the tokens, so
    both fractions are reported).

    ONE corpus scan -> per-doc token count -> explode over the
    |max_lens| literals -> combinable aggregate (|max_lens| rows).
    All integer sums; the two fractions divide exact BIGINTs."""
    from .text import token_count

    lens = docs.select(token_count(F.col(text_col)).alias("len"))
    swept = lens.select(
        "len",
        F.explode(F.array(*[F.lit(int(m)) for m in max_lens])).alias("max_len"),
    )
    n = F.count("*")
    return (
        swept.groupBy(F.col("max_len").cast("long").alias("max_len"))
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum((F.col("len") > F.col("max_len")).cast("long"))
            .cast("long")
            .alias("n_truncated"),
            F.sum("len").cast("long").alias("n_tokens"),
            F.sum(
                F.greatest(F.col("len") - F.col("max_len"), F.lit(0))
            )
            .cast("long")
            .alias("n_tokens_lost"),
        )
        .select(
            "max_len",
            "n_docs",
            "n_truncated",
            "n_tokens",
            "n_tokens_lost",
            (
                F.round(
                    F.col("n_truncated").cast("double")
                    / F.col("n_docs").cast("double")
                    + F.lit(1e-9),
                    6,
                )
                + F.lit(0.0)
            ).alias("doc_trunc_frac"),
            (
                F.round(
                    F.col("n_tokens_lost").cast("double")
                    / F.col("n_tokens").cast("double")
                    + F.lit(1e-9),
                    6,
                )
                + F.lit(0.0)
            ).alias("token_loss_frac"),
        )
    )


def lexdiv_qscore(text: Column) -> Column:
    """Micro-quantized lexical-diversity quality score (distinct-token
    ratio * 1e6, BIGINT) — the conformal-calibration signal shared
    verbatim by the batch x162 query and the streaming conformal sink
    so the continuous view is bit-equal to the batch operator."""
    from .text import tokens

    t = tokens(text)
    return (
        F.size(F.array_distinct(t)).cast("double") / F.size(t) * F.lit(1e6)
    ).cast("long")


def leakage_safe_split(
    components: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe train/val/test assignment — the CONSTRUCTIVE fix
    to what x96 detects: a document's split is keyed on its near-dup
    CLUSTER representative (p14 component min-id; singletons key on
    themselves), so an entire duplicate cluster always lands in ONE
    split and benchmark near-dups can never straddle train/test.  The
    buckets are x26's exact md5 arithmetic (90/5/5), applied to the
    anchor id instead of the document id; ``moved`` marks documents
    whose split differs from the naive per-doc assignment — the
    measurable cost of hygiene.

    Scale shape: the component frame is |clustered docs| (pairs-sized,
    never corpus); one left join on the doc key, then map-only hash
    arithmetic.  Output: (id, anchor_id, split, moved)."""
    comp = components.select(F.col("id").alias(id_col), "component")
    anchor = F.coalesce(F.col("component"), F.col(id_col))
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            anchor.alias("anchor_id"),
            split_of_id(anchor).alias("split"),
            (
                split_of_id(anchor) != split_of_id(F.col(id_col))
            ).alias("moved"),
        )
    )


def split_of_id(val: Column) -> Column:
    """The x26/x179 split assignment for one id column: exact md5
    bucket (90/5/5) -> train/val/test.  Shared by the batch split
    (``leakage_safe_split``) and the streaming split-stability sink so
    both produce bit-identical assignments for the same anchor."""
    from .text import hash60

    b = hash60(val.cast("string")) % 100
    return (
        F.when(b < 90, F.lit("train"))
        .when(b < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def effective_token_budget(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lsh_kwargs,
) -> DataFrame:
    """Dedup-adjusted token budget per source — the number a training
    plan actually spends: raw token counts overstate the corpus by the
    near-duplicate mass, so the effective budget counts each near-dup
    CLUSTER once, at its canonical representative (p14 min-id; the
    doc a hard dedup would keep).  Per source: docs/tokens raw vs
    kept, and the duplicate token fraction the plan must discount.

    Scale shape: the p14 LSH closure (capped buckets, corpus text
    scanned once for signatures) + one membership left join + ONE
    conditional per-source aggregate over a single corpus scan —
    token counting and survivorship resolve in the same pass."""
    from .dedup import connected_components, minhash_lsh_pairs

    comp = connected_components(
        minhash_lsh_pairs(docs, text_col=text_col, id_col=id_col, **lsh_kwargs)
    ).select(F.col("id").alias(id_col), "component")
    kept = F.coalesce(F.col("component"), F.col(id_col)) == F.col(id_col)
    labeled = docs.join(comp, id_col, "left").select(
        F.col("source"),
        token_count(F.col(text_col)).alias("nt"),
        kept.alias("kept"),
    )
    n = F.count("*")
    raw_tokens = F.sum("nt").cast("long")
    eff_tokens = F.sum(F.when(F.col("kept"), F.col("nt")).otherwise(0)).cast("long")
    return labeled.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
        raw_tokens.alias("raw_tokens"),
        eff_tokens.alias("effective_tokens"),
        (
            F.round(
                F.lit(1.0) - eff_tokens.cast("double") / raw_tokens.cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("dup_token_frac"),
    )
