"""Multinomial Naive Bayes text classifier — train + score + audit.

The quality/domain classifier step of a curation pipeline (the role
fastText linear classifiers play in CCNet-style corpus filtering, and
the model-based companion to the x07 marker heuristic): closed-form
training (one token-count aggregate), so the whole train -> score ->
confusion dataflow is declarative DataFrame code with a DuckDB value
oracle — no iterative optimization, no Python in the hot path.

Scale shape (100 TB): training is ONE corpus scan (explode -> (label,
token) count); the dense model is |V| x |L| rows — vocabulary-sized,
NOT corpus-sized — and joins the score side broadcast while it fits
(like the x25/x63 decontamination eval sides) or by a plain shuffle
on the well-spread token key above ``nb_score``'s documented
``broadcast_max_rows`` gate.  Scoring is one corpus
scan -> per-(doc, label) BIGINT sum -> argmax window over |docs| x |L|
rows.  All log-likelihoods are micro-quantized BIGINT (trunc(ln(p) *
1e6)) before any sum, so the argmax is integer arithmetic and
deterministic across engines (house float discipline, cf.
operators/embed.fisher_separation).

Reference parity: the reference pipeline has no model-based filter at
all (spark_job/spark_streaming.py validates with fixed rules); this is
part of the §2.9-beyond-reference curation surface next to x53 Gopher
rules and x64 DSIR weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .text import tokens

# ln(p) in micro-units: BIGINT sums stay exact (|qll| <= ~3e7 per
# token; 1e5 tokens/doc * 3e7 = 3e12, far under BIGINT).
_Q = 1e6


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Train a multinomial NB model: one explode -> (label, token)
    count aggregate, densified to every (vocab token, label) pair with
    Laplace smoothing ``alpha``.

    Returns the DENSE model frame ``(label, tok, qll, prior_q)`` —
    |V| x |L| rows with quantized log-likelihood ``qll =
    trunc(ln((c + alpha) / (N_label + alpha * |V|)) * 1e6)`` and the
    per-label log-prior ``prior_q = trunc(ln(n_docs_label /
    n_docs) * 1e6)`` repeated per row (broadcast-friendly single
    frame).  Unseen-(token, label) pairs get the smoothed zero-count
    likelihood, so scoring never needs a fallback branch."""
    lbl = F.col(label_col).alias("label")
    tok_rows = docs.select(lbl, F.explode(tokens(F.col(text_col))).alias("tok"))
    # ONE corpus text scan; nb_model_from_counts persists this
    # model-sized (label, tok, c) frame for its several consumers
    counts = tok_rows.groupBy("label", "tok").agg(
        F.count("*").cast("long").alias("c")
    )
    doc_counts = docs.groupBy(lbl).agg(F.count("*").cast("long").alias("n"))
    return nb_model_from_counts(counts, doc_counts, alpha=alpha)


def nb_model_from_counts(
    counts: DataFrame, doc_counts: DataFrame, alpha: float = 0.5
) -> DataFrame:
    """The dense-model densification shared by batch training
    (``nb_train``: counts from one corpus scan) and the streaming
    classifier view (counts folded from per-batch sum-mergeable
    partials): takes ``(label, tok, c)`` token counts and ``(label,
    n)`` document counts, returns the ``(label, tok, qll, prior_q)``
    dense model.  Both consumers get bit-identical models for the
    same underlying corpus because everything here is a deterministic
    function of the two count frames.

    Both inputs are persisted here: ``counts`` feeds the |V| count,
    the vocabulary, the per-label totals AND the densification join
    (un-persisted, the streaming view would re-fold its whole log 3x
    per model build); ``doc_counts`` feeds the collected total and
    the priors."""
    from ..cache import tracked_persist

    counts = tracked_persist(counts)
    doc_counts = tracked_persist(doc_counts)
    vocab = counts.select("tok").distinct()
    n_vocab = vocab.count()  # one scalar: |V| (model-sized, not corpus)
    label_tot = counts.groupBy("label").agg(F.sum("c").cast("long").alias("n_tok"))
    # |L| rows collected: priors need the global doc total (the frame
    # itself stays lazy — a label-only scan, re-run once)
    n_docs = sum(r["n"] for r in doc_counts.collect())
    priors = doc_counts.select(
        "label",
        (F.log(F.col("n").cast("double") / F.lit(float(n_docs))) * _Q)
        .cast("long")
        .alias("prior_q"),
    )
    dense = (
        vocab.crossJoin(F.broadcast(label_tot))
        .join(counts, ["label", "tok"], "left")
        .select(
            "label",
            "tok",
            (
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (
                        F.col("n_tok").cast("double")
                        + F.lit(alpha) * F.lit(float(n_vocab))
                    )
                )
                * _Q
            )
            .cast("long")
            .alias("qll"),
        )
    )
    # the model is |V| x |L| rows and is consumed several times by
    # nb_score (score join, prior-only fallback) — persist it so no
    # consumer re-derives the densification (release via
    # cache.unpersist_tracked / Engine.clear_caches)
    return tracked_persist(dense.join(F.broadcast(priors), "label"))


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """Score documents against a trained model: one corpus scan ->
    (doc, tok, tf) -> model join -> BIGINT per-(doc, label) score ->
    argmax window (score DESC, label ASC — deterministic ties).
    Out-of-vocabulary tokens are dropped (the standard multinomial-NB
    treatment); a document with NO in-vocab tokens falls back to the
    prior-only argmax (the majority-prior label), so every input
    document gets a prediction.

    Join strategy is SIZE-GATED: the dense model is |V| x |L| rows,
    and broadcasting it is only right while that fits comfortably in
    every executor (~100 MB at the 2M-row default, ~50 B/row).  Web-
    scale vocabularies (1e8 tokens x dozens of labels) blow past any
    broadcast budget, so above ``broadcast_max_rows`` the model joins
    by a plain shuffle on ``tok`` — a well-spread key (token hash), so
    the shuffle is skew-free and scales with |V| instead of pinning
    |V| x |L| into RAM.  The gate costs one count() on the model frame
    (cached when it came from ``nb_train``).

    Returns ``(id_col, predicted, score_q)``; ``score_q`` is the
    winning quantized log-posterior (NULL on the prior-only path,
    where no token evidence was summed)."""
    scored = _score_frame(docs, model, id_col, text_col, broadcast_max_rows)
    w = W.partitionBy(id_col).orderBy(F.col("score_q").desc(), F.col("label").asc())
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("label").alias("predicted"), "score_q")
    )
    return best.unionByName(
        _prior_fallback(docs, model, best, id_col, "score_q")
    )


def _prior_fallback(
    docs: DataFrame,
    model: DataFrame,
    covered: DataFrame,
    id_col: str,
    null_col: str,
) -> DataFrame:
    """The prior-only OOV fallback shared by ``nb_score`` and
    ``nb_calibration``: ONE row (the max-prior label, label ASC on
    ties) broadcast-crossed with the zero-evidence documents (those
    absent from ``covered``), carrying a NULL ``null_col`` (no token
    evidence was summed, so neither a score nor a margin exists)."""
    prior_w = W.orderBy(F.col("prior_q").desc(), F.col("label").asc())
    top_prior = (
        model.select("label", "prior_q")
        .distinct()
        .withColumn("rn", F.row_number().over(prior_w))
        .filter(F.col("rn") == 1)
        .select(F.col("label").alias("predicted"))
    )
    uncovered = docs.select(id_col).join(
        covered.select(id_col), id_col, "left_anti"
    )
    return uncovered.crossJoin(F.broadcast(top_prior)).select(
        id_col, "predicted", F.lit(None).cast("long").alias(null_col)
    )


def nb_confusion(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """End-to-end classifier audit on a deterministic even/odd
    ``id_col`` split: train on even ids, score odd ids, return the
    confusion matrix ``(label, predicted, n_docs)`` — at most |L|^2
    rows, the artifact a curation run reviews before trusting the
    classifier as a filter."""
    train = docs.filter(F.col(id_col) % 2 == 0)
    test = docs.filter(F.col(id_col) % 2 == 1)
    model = nb_train(train, label_col=label_col, text_col=text_col, alpha=alpha)
    preds = nb_score(test, model, id_col=id_col, text_col=text_col)
    truth = test.select(F.col(id_col), F.col(label_col).alias("label"))
    return (
        preds.join(truth, id_col)
        .groupBy("label", "predicted")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def _score_frame(
    docs: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    broadcast_max_rows: int,
) -> DataFrame:
    """The per-(doc, label) quantized log-posterior frame shared by
    ``nb_score`` (argmax) and ``nb_calibration`` (top-2 margin): one
    corpus token scan -> (doc, tok, tf) -> SIZE-GATED model join (see
    ``nb_score``'s broadcast_max_rows contract) -> BIGINT score sum."""
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    model_side = (
        F.broadcast(model) if model.count() <= broadcast_max_rows else model
    )
    return (
        tf.join(model_side, "tok")
        .groupBy(id_col, "label")
        .agg(
            (F.sum(F.col("tf") * F.col("qll")) + F.first("prior_q"))
            .cast("long")
            .alias("score_q")
        )
    )


def nb_calibration(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    max_bucket: int = 10,
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """Classifier reliability curve on the even/odd split: bucket the
    scored test documents by prediction MARGIN (top-1 minus top-2
    quantized log-posterior, in whole natural-log units, capped at
    ``max_bucket``) and report accuracy per bucket — the calibration
    evidence that says WHERE the classifier's confidence is
    trustworthy before a margin threshold gates a corpus (x159 says
    how good the classifier is overall; this says which margin buys
    which accuracy).

    Prior-only fallback documents (no in-vocab token) have no margin
    and report as bucket -1.  The margin is exact BIGINT arithmetic
    (micro-quantized log-likelihood sums), so bucket assignment is
    deterministic across engines.

    Scale shape: the x159 dataflow (one train token scan -> dense
    model; one test token scan -> per-(doc, label) scores) plus a
    top-2 window over |docs| x |L| rows; the report is a <=
    (max_bucket + 2)-row aggregate."""
    train = docs.filter(F.col(id_col) % 2 == 0)
    test = docs.filter(F.col(id_col) % 2 == 1)
    model = nb_train(train, label_col=label_col, text_col=text_col, alpha=alpha)
    scored = _score_frame(test, model, id_col, text_col, broadcast_max_rows)
    w = W.partitionBy(id_col).orderBy(F.col("score_q").desc(), F.col("label").asc())
    ranked = scored.select(
        id_col,
        "label",
        "score_q",
        F.row_number().over(w).alias("rn"),
        F.lead("score_q").over(w).alias("next_q"),
    )
    top = ranked.filter(F.col("rn") == 1).select(
        id_col,
        F.col("label").alias("predicted"),
        (F.col("score_q") - F.coalesce(F.col("next_q"), F.col("score_q")))
        .cast("long")
        .alias("margin_q"),
    )
    # prior-only fallback: no token evidence -> no margin -> bucket -1
    preds = top.unionByName(
        _prior_fallback(test, model, top, id_col, "margin_q")
    )
    truth = test.select(F.col(id_col), F.col(label_col).alias("truth"))
    bucket = F.when(
        F.col("margin_q").isNull(), F.lit(-1).cast("long")
    ).otherwise(
        F.least(
            F.expr("margin_q div 1000000").cast("long"),
            F.lit(max_bucket).cast("long"),
        )
    )
    n = F.count("*")
    return (
        preds.join(truth, id_col)
        .groupBy(bucket.alias("margin_bucket"))
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum((F.col("predicted") == F.col("truth")).cast("long"))
            .cast("long")
            .alias("n_correct"),
            (
                F.round(
                    F.sum((F.col("predicted") == F.col("truth")).cast("long"))
                    .cast("double")
                    / n
                    + F.lit(1e-9),
                    6,
                )
                + F.lit(0.0)
            ).alias("accuracy"),
        )
    )


def _evidence_frame(
    docs: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    broadcast_max_rows: int,
) -> DataFrame:
    """Per-(doc, label) token-evidence sums WITHOUT the prior — the
    conformal machinery densifies missing pairs (a document with zero
    in-vocab tokens still scores every label via its prior), so the
    prior is added downstream after the coalesce, unlike
    ``_score_frame`` which fuses it into the covered-pairs aggregate.
    Same one-scan + size-gated model join shape."""
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    model_side = (
        F.broadcast(model) if model.count() <= broadcast_max_rows else model
    )
    return (
        tf.join(model_side, "tok")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("tf") * F.col("qll")).cast("long").alias("ev"))
    )


def nb_conformal_sets(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha_ppm: tuple[int, ...] = (50_000, 100_000, 200_000),
    alpha: float = 0.5,
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """Split-conformal prediction SETS for the NB classifier (Vovk;
    the classification twin of x162's threshold calibration): train on
    id%3==0, calibrate on id%3==1, evaluate on id%3==2.  The
    nonconformity of a (doc, label) is the negated quantized
    log-posterior -(evidence + prior) — exact BIGINT; qhat is the
    k = ceil((n_cal+1)(1-alpha))-th smallest calibration nonconformity
    of the TRUE label (integer rank arithmetic: k = (n_cal+1) -
    alpha_ppm*(n_cal+1) div 1e6); a test document's prediction set is
    every label at or under qhat.  Reported per alpha: empirical
    coverage (true label in set — guaranteed >= 1-alpha marginally)
    and average set size (the price of that guarantee: an uncertain
    classifier pays in wider sets, not silent errors).  k > n_cal
    means no finite-sample qhat exists: the set degenerates to ALL
    labels (NULL qhat), never a guarantee-breaking clamp (the x162
    NULL discipline).

    Scale shape: scoring is the x159 dataflow (one token scan per
    split, size-gated model join); the calibration walk runs on the
    nonconformity histogram (bounded by distinct scores) with the
    conformal_from_hist lint discipline; the per-alpha set scan is one
    pass over the |test| x |L| score frame against the broadcast
    |alphas|-row qhat frame.  Output: one row per alpha."""
    from ..cache import lineage_checkpoint

    train = docs.filter(F.col(id_col) % 3 == 0)
    cal = docs.filter(F.col(id_col) % 3 == 1)
    test = docs.filter(F.col(id_col) % 3 == 2)
    # Lineage-truncate the |V| x |L| model: it feeds labels + both
    # splits' evidence joins, and under plain persist each reader
    # re-optimizes/reprints the whole train subtree (VERDICT r8 item
    # 2: x177's dump hit 178 scans / 348 exchanges of reprints).
    model = lineage_checkpoint(
        nb_train(train, label_col=label_col, text_col=text_col, alpha=alpha)
    )
    labels = model.select("label", "prior_q").distinct()

    truth = cal.select(F.col(id_col), F.col(label_col).alias("label"))
    # LEFT join: a calibration document whose true label was never
    # trained has INFINITE nonconformity (a NULL here) — it counts in
    # n_cal (pushing k into the infinite region makes qhat NULL = the
    # full-set degenerate answer, the conservative direction) but has
    # no finite histogram cell; silently dropping it would bias qhat
    # optimistic for the deployed distribution.
    calf = lineage_checkpoint(
        truth.join(F.broadcast(labels), "label", "left")
        .join(
            _evidence_frame(cal, model, id_col, text_col, broadcast_max_rows),
            [id_col, "label"],
            "left",
        )
        .select(
            (-(F.coalesce(F.col("ev"), F.lit(0)) + F.col("prior_q")))
            .cast("long")
            .alias("a")
        )
    )
    # k-th-smallest walk on the FINITE nonconformity histogram —
    # identity re-aggregation before the global window so the single-
    # partition exchange's child is an aggregate (conformal_from_hist
    # discipline); a k beyond the finite region finds no ck and yields
    # NULL qhat via the left join below.
    hist = lineage_checkpoint(
        calf.filter(F.col("a").isNotNull())
        .groupBy("a")
        .agg(F.count("*").cast("long").alias("nk"))
    )
    tot = calf.agg(F.count("*").cast("long").alias("n_cal"))
    cum = (
        hist.groupBy("a")
        .agg(F.sum("nk").cast("long").alias("nk"))
        .withColumn("ck", F.sum("nk").over(W.orderBy("a")))
    )
    alphas = docs.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(x)) for x in alpha_ppm])).alias("alpha_ppm")
    ).select(F.col("alpha_ppm").cast("long").alias("alpha_ppm"))
    ranks = alphas.crossJoin(F.broadcast(tot)).select(
        "alpha_ppm",
        "n_cal",
        (
            F.col("n_cal")
            + F.lit(1)
            - F.expr("alpha_ppm * (n_cal + 1) div 1000000")
        )
        .cast("long")
        .alias("k_rank"),
    )
    qhat_hit = (
        ranks.filter(F.col("k_rank") >= 1)
        .join(cum.crossJoin(F.broadcast(tot)).select("a", "ck", "n_cal"), "n_cal")
        .filter(F.col("ck") >= F.col("k_rank"))
        .groupBy("alpha_ppm", "n_cal", "k_rank")
        .agg(F.min("a").alias("qhat"))
    )
    qhat = ranks.join(qhat_hit, ["alpha_ppm", "n_cal", "k_rank"], "left")

    t_truth = test.select(F.col(id_col), F.col(label_col).alias("true_label"))
    testf = (
        test.select(id_col)
        .crossJoin(F.broadcast(labels))
        .join(
            _evidence_frame(test, model, id_col, text_col, broadcast_max_rows),
            [id_col, "label"],
            "left",
        )
        .join(t_truth, id_col)
        .select(
            id_col,
            "label",
            "true_label",
            (-(F.coalesce(F.col("ev"), F.lit(0)) + F.col("prior_q")))
            .cast("long")
            .alias("a"),
        )
    )
    in_set = F.col("qhat").isNull() | (F.col("a") <= F.col("qhat"))
    sets = (
        testf.crossJoin(F.broadcast(qhat))
        .groupBy("alpha_ppm", "n_cal", "k_rank", id_col)
        .agg(
            F.sum(F.when(in_set, 1).otherwise(0)).cast("long").alias("set_size"),
            F.max(
                F.when((F.col("label") == F.col("true_label")) & in_set, 1)
                .otherwise(0)
            ).alias("covered"),
        )
    )
    return (
        sets.groupBy("alpha_ppm", "n_cal", "k_rank")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            (
                F.round(
                    F.sum("covered").cast("double") / F.count("*") + F.lit(1e-9), 6
                )
                + F.lit(0.0)
            ).alias("coverage"),
            (
                F.round(
                    F.sum("set_size").cast("double") / F.count("*") + F.lit(1e-9),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_set_size"),
        )
        .select(
            (F.col("alpha_ppm").cast("double") / F.lit(1e6)).alias("alpha"),
            "n_cal",
            "k_rank",
            "n_test",
            "coverage",
            "avg_set_size",
        )
    )
