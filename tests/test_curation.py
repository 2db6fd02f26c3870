"""Unit tests for corpus-curation operators (operators/curation.py) —
edge semantics the driver oracle can't express: planted contamination,
budget invariants of packing, exact per-stratum proportions, split
stability under corpus growth."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_spark_streaming_pipeline_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    repetition_stats,
    split_summary,
    stratified_sample,
    with_split,
)


def test_decontaminate_plants_and_finds_overlap(spark):
    # train doc 1 contains the eval doc verbatim -> every eval gram hits;
    # train doc 2 shares nothing.
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "intro words alpha beta gamma delta epsilon zeta closing words here"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in decontaminate(train, eval_df, k=5).collect()}
    assert out[1]["n_contaminated"] == 2  # both 5-grams of the 6-word eval doc
    assert out[1]["contaminated"]
    assert out[2]["n_contaminated"] == 0
    assert not out[2]["contaminated"]
    assert out[2]["contamination_ratio"] == 0.0


def test_bloom_decontaminate_has_no_false_negatives(spark, sf_dir):
    """The bloom screen must flag EVERY gram the exact join finds (no
    false negatives — the decontamination guarantee); false positives
    only inflate the ratio, so bloom_ratio >= exact ratio per doc."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        bloom_decontaminate,
    )
    from kafka_spark_streaming_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 20 != 0)
    eval_set = docs.filter(F.col("doc_id") % 20 == 0)
    exact = {r.doc_id: r for r in decontaminate(train, eval_set, k=5).collect()}
    bloom = {r.doc_id: r for r in bloom_decontaminate(train, eval_set, k=5).collect()}
    assert set(bloom) == set(exact)
    for d, e in exact.items():
        b = bloom[d]
        assert b.n_grams == e.n_grams
        assert b.n_flagged >= e.n_contaminated, d  # superset: no false negatives
    # the screen must stay USEFUL: false positives bounded (the sketch
    # is sized so fp-rate << 1 at this gram load)
    extra = sum(bloom[d].n_flagged - e.n_contaminated for d, e in exact.items())
    total = sum(e.n_grams for e in exact.values())
    assert extra / total < 0.05


def test_dsir_upweights_target_like_docs(spark):
    """A raw doc written in the target's vocabulary must outscore one
    written off-distribution, and the top-tail selection must pick it."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import dsir_weights

    target = spark.createDataFrame(
        [(100 + i, "quantum physics entangles photons across optical cavities")
         for i in range(5)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [
            (1, "quantum physics entangles photons in optical experiments"),
            (2, "cheap pills buy now discount offer click here free"),
            (3, "weather report rain tomorrow sunny weekend mild temperatures"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dsir_weights(raw, target, select_quantile=0.67).collect()}
    assert out[1].dsir_weight > out[2].dsir_weight
    assert out[1].dsir_weight > out[3].dsir_weight
    assert out[1].selected
    assert not out[2].selected


def test_split_is_stable_under_corpus_growth(spark):
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    s_small = {r["doc_id"]: r["split"] for r in with_split(small).collect()}
    s_big = {r["doc_id"]: r["split"] for r in with_split(big).collect()}
    assert all(s_big[i] == s_small[i] for i in s_small)  # growth never reassigns


def test_split_summary_shares_sum_to_one(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("a b c d e").alias("text")
    )
    rows = split_summary(docs).collect()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    total = sum(r["n_docs"] for r in rows)
    assert total == 200


def test_pack_sequences_bins_are_contiguous_and_budgeted(spark):
    # 10 docs x 600 tokens in one shard, budget 2048 -> a doc starts a new
    # bin exactly when the tokens before it cross a 2048 boundary.
    docs = spark.createDataFrame(
        [("s0", i, " ".join(["w"] * 600)) for i in range(10)],
        ["source", "doc_id", "text"],
    )
    bins = {r["bin_id"]: r for r in pack_sequences(docs, budget=2048).collect()}
    # cumulative-before: 0,600,...,5400 -> bins 0,0,0,0,1,1,1,2,2,2
    assert [bins[b]["n_docs"] for b in sorted(bins)] == [4, 3, 3]
    # a bin never overfills by more than one straddling doc, and all
    # docs/tokens are accounted for exactly once
    assert all(r["n_tokens"] <= 2048 + 600 for r in bins.values())
    assert sum(r["n_docs"] for r in bins.values()) == 10
    assert sum(r["n_tokens"] for r in bins.values()) == 6000


def test_stratified_sample_exact_proportions(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(90)], ["doc_id", "lang"]
    )
    out = stratified_sample(docs, fraction=0.5, stratum_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang["en"]) == 30  # ceil(60 * 0.5)
    assert len(by_lang["de"]) == 15  # ceil(30 * 0.5)
    # deterministic: a second run picks the identical ids
    again = {r["doc_id"] for r in stratified_sample(docs, 0.5, "lang").collect()}
    assert again == {r["doc_id"] for r in out}


def test_repetition_flags_degenerate_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "a fresh sentence with entirely distinct successive words"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["repetitive"] and out[1]["top_bigram_frac"] == 1.0
    assert not out[2]["repetitive"]


def test_chunk_documents_windows_and_overlap(spark):
    import pytest

    from kafka_spark_streaming_pipeline_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(70))), (2, "a b c")],
        ["doc_id", "text"],
    )
    rows = sorted(
        chunk_documents(docs, chunk_tokens=32, overlap=8).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # stride 24: windows at tokens 1, 25, 49; final window clips
    assert [r["chunk_idx"] for r in d1] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in d1] == [32, 32, 22]
    # consecutive chunks overlap by exactly `overlap` tokens
    first, second = d1[0]["chunk_text"].split(" "), d1[1]["chunk_text"].split(" ")
    assert first[-8:] == second[:8]
    # short doc -> one clipped chunk
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "a b c"
    # every token is covered: union of chunks == original tokens
    covered = set()
    for r in d1:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(70)}
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_quality_yield_curve_monotone(spark):
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        quality_yield_curve,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(["the dog ran to the park and sat in it"] * 4)),
            (2, "zz qq ww"),
            (3, " ".join(f"w{i}" for i in range(25))),
        ],
        ["doc_id", "text"],
    )
    rows = sorted(quality_yield_curve(docs).collect(), key=lambda r: r["threshold"])
    # monotone: raising the threshold never increases yield
    for lo, hi in zip(rows, rows[1:]):
        assert lo["n_docs"] >= hi["n_docs"]
        assert lo["n_tokens"] >= hi["n_tokens"]
    # the lowest threshold (0.5) keeps everything: score is >= 0.5 by construction
    assert rows[0]["n_docs"] == 3 and abs(rows[0]["pct_docs"] - 1.0) < 1e-6
    # every requested threshold appears, including ones nothing clears
    assert [r["threshold"] for r in rows] == [0.5, 0.667, 0.834, 1.0]
    top = rows[-1]
    if top["n_docs"] == 0:
        assert top["n_tokens"] == 0 and abs(top["pct_docs"]) < 1e-6


def test_length_outlier_trim_approx_close_to_exact(spark):
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        length_outlier_trim,
    )

    docs = spark.createDataFrame(
        [(i, "src", " ".join(["w"] * n)) for i, n in enumerate(
            [5] + [50] * 200 + [55] * 200 + [400]
        )],
        ["doc_id", "source", "text"],
    )
    exact = {r["doc_id"] for r in length_outlier_trim(docs, approx=False).collect()}
    approx = {r["doc_id"] for r in length_outlier_trim(docs, approx=True).collect()}
    # exact interpolated bounds cut both planted extremes (ids 0, 401)
    assert 0 not in exact and 401 not in exact
    # approx_percentile returns a real element (rank-based, no
    # interpolation) — on this sample p01 lands on the min so the low
    # outlier survives; the high outlier is cut and the body kept
    assert 401 not in approx
    assert len(exact) >= 398 and len(approx) >= 399


def test_training_shards_is_deterministic_permutation(spark, sf_dir):
    from kafka_spark_streaming_pipeline_spark.catalog import load_table
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = training_shards(docs, n_shards=4).collect()
    n_docs = docs.count()
    # every doc exactly once
    assert len(out) == n_docs
    assert len({r.doc_id for r in out}) == n_docs
    # positions are contiguous 1..len(shard) within each shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic: a second run yields the identical order
    again = training_shards(docs, n_shards=4).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in again} == {
        (r.doc_id, r.shard, r.pos) for r in out
    }


def test_gopher_rules_attribute_rejections(spark):
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        gopher_quality_rules,
    )

    good = (
        "the quick brown fox jumps over a lazy dog near the old mill and "
        "then it runs down to the river where a tall heron waits for fish "
        "in the cold clear water of that quiet valley every single morning"
    )
    rows = [
        (1, good),                                    # passes all rules
        (2, "too short for the corpus"),              # r_len
        (3, " ".join(f"w{i}" for i in range(40))),    # r_stop (no stopwords)
        (4, "the " + " ".join(["1 2 3"] * 20)),       # r_alpha + r_dup
        (5, "the a " + "spam ham eggs " * 15),        # r_dup (repeated trigram)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_quality_rules(docs).collect()}
    assert out[1].keep
    assert not out[2].keep and not out[2].r_len
    assert not out[3].keep and not out[3].r_stop and out[3].r_len
    assert not out[4].keep and not out[4].r_alpha and not out[4].r_dup
    assert not out[5].keep and not out[5].r_dup and out[5].r_stop
    # metrics are attributable, not just the final boolean
    assert out[5].dup_trigram_frac > 0.1 and out[1].dup_trigram_frac <= 0.1


def test_quality_weighted_sample_rate_and_stability(spark, sf_dir):
    """Empirical keep rate tracks scale * mean(weight) (md5 draws are
    uniform), and a doc's decision never changes when the corpus
    grows — the property that lets incremental pipelines re-derive
    the sample instead of storing it."""
    from kafka_spark_streaming_pipeline_spark.catalog import load_table
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        quality_weighted_sample,
    )
    from kafka_spark_streaming_pipeline_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    out = quality_weighted_sample(docs, quality_score(F.col("text")), scale=0.8)
    n = docs.count()
    kept = out.filter("kept").count()
    mean_w = docs.select(F.avg(quality_score(F.col("text")))).first()[0]
    expect = 0.8 * mean_w
    assert abs(kept / n - expect) < 0.08  # binomial noise at n=500

    # stability: decisions on a subset equal decisions on the full corpus
    sub = quality_weighted_sample(
        docs.filter("doc_id < 100"), quality_score(F.col("text")), scale=0.8
    )
    full = {r.doc_id: r.kept for r in out.filter("doc_id < 100").collect()}
    assert {r.doc_id: r.kept for r in sub.collect()} == full


def test_novelty_scores_planted(spark):
    """A doc sharing every shingle with a twin scores 0 novelty; a doc
    of globally-unique text scores 1; a half-shared doc lands between."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        novelty_scores,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, shared),
        (2, shared),                                    # exact twin -> 0
        (3, "unique one two three four five six"),      # all unique -> 1
        (4, shared + " seven eight nine ten"),          # mixed
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in novelty_scores(docs, k=3).collect()}
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0
    assert out[3].novelty == 1.0
    assert 0.0 < out[4].novelty < 1.0
    assert out[3].n_grams == out[3].n_unique_grams


def test_training_shards_epoch_reshuffle(spark):
    """Each epoch is an independent deterministic permutation: orders
    differ between epochs, while every epoch is reproducible and epoch
    None equals the base salt (the x52 oracle contract)."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(60)], ["doc_id", "text"]
    )

    def order(epoch):
        return [
            r.doc_id
            for r in training_shards(docs, n_shards=2, epoch=epoch)
            .orderBy("shard", "pos")
            .collect()
        ]

    e0, e1 = order(0), order(1)
    assert e0 != e1 and sorted(e0) == sorted(e1)
    assert order(0) == e0  # reproducible
    base = [
        r.doc_id
        for r in training_shards(docs, n_shards=2).orderBy("shard", "pos").collect()
    ]
    assert base != e0  # epoch salt is distinct from the base salt


def test_line_dedup_removes_cross_doc_boilerplate_only(spark):
    """A line shared by two docs is boilerplate and removed from both;
    a line repeated twice WITHIN one doc only is kept (the rule counts
    distinct documents, not occurrences)."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        line_dedup,
        split_lines,
    )

    docs = spark.createDataFrame(
        [
            (1, "unique first line\ncookie banner text\nown content one"),
            (2, "cookie banner text\nother body text"),
            (3, "self repeated line\nself repeated line\nsolo content"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in line_dedup(split_lines(docs), min_docs=2).collect()}
    assert out[1].n_dup_lines == 1 and out[2].n_dup_lines == 1
    assert out[3].n_dup_lines == 0  # within-doc repeat is not boilerplate
    import hashlib

    assert out[1].cleaned_fingerprint == hashlib.md5(
        b"unique first line\nown content one"
    ).hexdigest()
    assert out[2].cleaned_fingerprint == hashlib.md5(b"other body text").hexdigest()
    assert out[3].cleaned_fingerprint == hashlib.md5(
        b"self repeated line\nself repeated line\nsolo content"
    ).hexdigest()


def test_new_operators_degrade_gracefully_on_empty_inputs(spark):
    """Empty corpora/batches are the boundary every ingest loop hits;
    none of the round-4 operators may crash or emit nulls there."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        bloom_decontaminate,
        dsir_weights,
        line_dedup,
        split_lines,
    )
    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        incremental_neardup,
        minhash_signatures,
    )
    from kafka_spark_streaming_pipeline_spark.operators.text import bpe_pair_counts

    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "some real text here")], ["doc_id", "text"])

    [row] = bloom_decontaminate(docs, empty).collect()
    assert row.n_flagged == 0 and row.bloom_ratio == 0.0
    assert bloom_decontaminate(empty, docs).collect() == []

    [w] = dsir_weights(docs, empty).collect()
    assert w.dsir_weight is not None and w.selected is not None

    assert line_dedup(split_lines(empty)).collect() == []
    assert bpe_pair_counts(empty).collect() == []
    assert incremental_neardup(docs, minhash_signatures(empty)).collect() == []
    assert incremental_neardup(empty, minhash_signatures(docs)).collect() == []


def test_bigram_cross_entropy_separates_word_salad(spark):
    """The bigram LM must score shuffled-word salad WORSE (higher
    cross-entropy) than fluent text built from the same vocabulary —
    exactly the separation the unigram score cannot make (identical
    unigram distribution on both docs)."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        bigram_cross_entropy,
        unigram_logprob,
    )

    fluent = "the cat sat on the mat and the dog sat on the mat"
    # same multiset of words, adjacency destroyed
    salad = "mat the on dog sat the and cat mat the on the sat"
    # corpus context: several fluent docs establish the bigram stats
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(8)] + [(100, salad)], ["doc_id", "text"]
    )
    ce = {r.doc_id: r.cross_entropy for r in bigram_cross_entropy(docs).collect()}
    assert ce[100] > ce[0], "salad must have higher bigram cross-entropy"

    uni = {r.doc_id: r.mean_logprob for r in unigram_logprob(docs).collect()}
    assert abs(uni[100] - uni[0]) < 1e-6, "unigram score cannot separate them"

    # docs shorter than 2 tokens produce no bigrams and no row
    tiny = spark.createDataFrame([(1, "word"), (2, "two words")], ["doc_id", "text"])
    out = {r.doc_id for r in bigram_cross_entropy(tiny).collect()}
    assert out == {2}


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A short doc fully quoted inside a much longer one: containment
    ~1.0 in the contained direction while Jaccard is far below any
    symmetric near-dup threshold."""
    from kafka_spark_streaming_pipeline_spark.operators.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon zeta"
    container = (
        "intro words before the quoted passage now "
        + quote
        + " and a long tail of unrelated trailing commentary goes here "
        + "with many extra filler tokens one two three four five six seven"
    )
    unrelated = "completely different content about other topics entirely now"
    docs = spark.createDataFrame(
        [(1, quote), (2, container), (3, unrelated)], ["doc_id", "text"]
    )
    rows = containment_pairs(docs, min_containment=0.8).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment_a >= 0.99  # every shingle of the quote is in the container
    assert r.jaccard < 0.5  # symmetric metric would never flag it

    # empty corpus: no pairs, no crash
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert containment_pairs(empty).collect() == []


def test_round4_operators_degrade_gracefully_on_empty_inputs(spark):
    """Every round-4 operator must return an empty, correctly-typed
    frame on an empty corpus instead of crashing."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        bigram_cross_entropy,
    )
    from kafka_spark_streaming_pipeline_spark.operators.embed import all_but_the_top
    from kafka_spark_streaming_pipeline_spark.operators.similarity import (
        contrastive_triplets,
    )
    from kafka_spark_streaming_pipeline_spark.operators.sketches import (
        dd_build,
        dd_quantiles,
    )
    from kafka_spark_streaming_pipeline_spark.operators.text import bpe_train

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    empty_vals = spark.createDataFrame([], "v double")

    assert bigram_cross_entropy(empty_docs).collect() == []
    assert bpe_train(empty_docs).collect() == []
    assert dd_quantiles(dd_build(empty_vals, "v"), [0.5]).collect() == []
    assert contrastive_triplets(empty_emb, [[1, 0], [0, 1]]).collect() == []
    out = all_but_the_top(empty_emb)
    assert out.collect() == [] and "processed" in out.columns


def test_persisted_bigram_lm_scores_match_and_backoff(spark, tmp_path):
    """Scoring a batch against the persisted model must equal the
    in-corpus score for documents the model saw, apply the documented
    add-k backoff to novel text instead of dropping it, and never read
    the training corpus (only the two persisted count tables)."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        bigram_cross_entropy,
        save_bigram_lm,
        score_with_bigram_lm,
    )

    fluent = "the cat sat on the mat and the dog sat on the mat"
    corpus = spark.createDataFrame(
        [(i, fluent) for i in range(6)] + [(10, "the cat ran home")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "lm")
    save_bigram_lm(corpus, path)

    # scoring the training docs through the persisted model == the
    # one-shot in-corpus computation
    want = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in bigram_cross_entropy(corpus).collect()
    }
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in score_with_bigram_lm(corpus, path).collect()
    }
    assert got == want

    # novel text scores via backoff (higher CE than seen text), and
    # entirely-unseen contexts still produce a finite score
    new_batch = spark.createDataFrame(
        [(100, fluent), (101, "zebra quantum flux unseen words here")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.cross_entropy for r in score_with_bigram_lm(new_batch, path).collect()}
    assert out[100] == want[0][1]
    assert out[101] > out[100]

    # the scoring plan reads the persisted tables, never the corpus
    plan = (
        score_with_bigram_lm(new_batch, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "w1_h:bigint,c1:bigint" in plan  # contexts table scanned
    assert "bg_h:bigint,c2:bigint" in plan  # bigrams table scanned


def test_tiered_decontamination_each_tier_catches_its_leak(spark):
    """Planted corpus proving the tier economics: a clean doc exits at
    the Bloom screen; a verbatim near-copy is convicted by the exact
    gram ratio; a HUGE page embedding one complete eval item slides
    under the train-normalized ratio and is caught ONLY by eval-side
    containment; a doc sharing a single 5-gram reaches the containment
    tier and is correctly cleared.  Bloom never false-negatives: every
    doc with a truly shared gram is a suspect."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        decontaminate_tiered,
        decontamination_report,
    )

    eval_doc = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i}" for i in range(120))
    train = spark.createDataFrame(
        [
            (1, "completely unrelated words about seven red boats sailing home"),
            (2, eval_doc + " iota"),  # near-copy: high gram ratio
            (3, filler + " " + eval_doc + " " + filler),  # embedded eval item
            (4, "alpha beta gamma delta epsilon " + filler),  # one shared gram
        ],
        ["doc_id", "text"],
    )
    eval_set = spark.createDataFrame([(100, eval_doc)], ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in decontaminate_tiered(train, eval_set, k=5, shingle_k=3).collect()
    }

    assert (out[1].verdict, out[1].tier) == ("clean", "bloom")
    assert (out[2].verdict, out[2].tier) == ("contaminated", "gram")
    assert out[2].contamination_ratio >= 0.2
    # the containment-tier leak: ratio under the bar, containment 1.0
    assert (out[3].verdict, out[3].tier) == ("contaminated", "containment")
    assert out[3].contamination_ratio < 0.2
    assert out[3].max_eval_containment == 1.0
    # light overlap reaches containment and is cleared there
    assert (out[4].verdict, out[4].tier) == ("clean", "containment")
    assert out[4].max_eval_containment < 0.8
    # Bloom screen: no false negatives among truly-overlapping docs
    for d in (2, 3, 4):
        assert out[d].n_flagged > 0

    rep = {
        (r.tier, r.verdict): (r.n_docs, r.share)
        for r in decontamination_report(
            decontaminate_tiered(train, eval_set, k=5, shingle_k=3)
        ).collect()
    }
    assert sum(n for n, _ in rep.values()) == 4
    assert abs(sum(s for _, s in rep.values()) - 1.0) < 1e-6
    assert rep[("containment", "contaminated")][0] == 1


def test_pareto_frontier_planted_domination_and_ties(spark):
    """Crafted corpus with a known skyline: longer docs must buy
    strictly more vocabulary richness to stay on the frontier;
    equal-(cost, richness) peers are BOTH kept (neither dominates);
    same-cost lower-richness and same-richness higher-cost docs are
    dominated.  bucket_width=2 forces the prune across multiple
    buckets so the lossless-prune path is exercised, and the result
    must equal the default single-bucket run."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        pareto_frontier,
    )

    rows = [
        (1, "x x"),        # (2 tok, 0.5)    frontier: cheapest
        (2, "x y y"),      # (3 tok, 0.6667) frontier: richer
        (3, "u u v"),      # (3 tok, 0.6667) frontier: tie peer of 2
        (4, "p q r s"),    # (4 tok, 1.0)    frontier: richest
        (5, "p p q r"),    # (4 tok, 0.75)   dominated by 4 (same cost)
        (6, "a b c d e e e"),  # (7 tok, 0.7143) dominated by 4
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r for r in pareto_frontier(docs, bucket_width=2).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["richness"] == 0.5
    assert got[2]["richness"] == got[3]["richness"] == 0.6667
    assert got[4]["richness"] == 1.0
    wide = {r["doc_id"] for r in pareto_frontier(docs).collect()}
    assert wide == set(got)


def test_quantile_normalized_selection_calibrates_across_sources(spark):
    """A 'harsh' source whose raw scores are all low must still
    contribute its top fraction: selection is by within-source rank,
    not raw score.  Ties share a rank (percent_rank semantics) and a
    single-doc source gets rank 0 (never selected at frac<1)."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        quantile_normalized_selection,
    )

    def doc(uniq, total):
        # total tokens, uniq distinct -> richness = uniq/total
        return " ".join(f"w{i}" for i in range(uniq)) + " w0" * (total - uniq)

    rows = (
        # source A: raw richness 0.9, 0.7, 0.5, 0.3 (high-scoring source)
        [(i, doc(9 * (5 - i), 10 * (5 - i)), "A") for i in range(1, 2)]
        + [(2, doc(7, 10), "A"), (3, doc(5, 10), "A"), (4, doc(3, 10), "A")]
        + [(1, doc(9, 10), "A")][:0]
        # source B: raw richness 0.4, 0.3, 0.2, 0.1 (harsh source)
        + [(5, doc(4, 10), "B"), (6, doc(3, 10), "B"),
           (7, doc(2, 10), "B"), (8, doc(1, 10), "B")]
        # source C: a single doc
        + [(9, doc(5, 10), "C")]
    )
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    got = {
        r["doc_id"]: r
        for r in quantile_normalized_selection(docs, frac=0.3).collect()
    }
    # top-of-source selected in BOTH sources despite B's low raw scores
    assert got[1]["selected"] and got[5]["selected"]
    assert not any(got[i]["selected"] for i in (2, 3, 4, 6, 7, 8, 9))
    # ranks: 4 docs/source -> pct_rank steps of 1/3
    assert got[5]["pct_rank"] == 1.0 and got[6]["pct_rank"] == 0.666667
    assert got[9]["pct_rank"] == 0.0
    # raw richness preserved for downstream inspection
    assert got[8]["richness"] == 0.1


def test_rater_agreement_kappa_corrects_for_chance(spark):
    """Hand-computed 2x2: kappa must equal the textbook value, and a
    skewed both-raters-accept-almost-everything source must score a
    LOW kappa despite high raw agreement (the reason kappa exists)."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        rater_agreement,
    )

    stop = "the a of and to in is it that for"
    # passes gopher (30+ words, stopwords, sane lengths) AND qs>=0.8
    good = (stop + " alpha beta gamma delta epsilon zeta eta theta iota kappa "
            + "lam mu nu xi omicron pi rho sigma tau upsilon")
    # fails gopher (too short) and fails the score threshold (no stopwords)
    bad = "zz yy xx"
    # fails gopher (dup-trigram repetition) but PASSES the score: 32
    # tokens, stopword ratio 2/32, sane word lengths -> score 1.0
    mixed = "the of " + "red green blue " * 10
    rows = (
        [(i, good, "A") for i in range(4)]
        + [(i, bad, "A") for i in range(4, 8)]
        + [(i, mixed, "A") for i in range(8, 10)]
        # source B: raters agree 9/10 times but almost everything passes
        + [(i, good, "B") for i in range(10, 19)]
        + [(19, mixed, "B")]
    )
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    got = {r["source"]: r for r in rater_agreement(docs).collect()}

    a = got["A"]
    assert (a["n11"], a["n10"], a["n01"], a["n00"]) == (4, 0, 2, 4)
    po = 8 / 10
    pe = (4 * 6 + 6 * 4) / 100
    want = round((po - pe) / (1 - pe) + 1e-9, 6)
    assert a["kappa"] == want and a["percent_agree"] == 0.8

    b = got["B"]
    # 90% raw agreement but kappa collapses to 0 (one rater constant)
    assert b["percent_agree"] == 0.9
    assert b["kappa"] == 0.0


def test_soft_dedup_flattens_cluster_mass(spark):
    """A corpus where one text is crawled 40x and another appears
    once: soft dedup at frac=1.0 must keep the 40-dup cluster's
    expected contribution near 1 doc (not 40), keep singleton docs
    with probability ~1 (weight 1.0 -> always selected), and be
    deterministic across invocations."""
    from kafka_spark_streaming_pipeline_spark.operators.dedup import (
        cluster_weighted_sample,
    )

    dup_text = ("the quick brown fox jumps over the lazy dog again and again "
                "in a very repetitive crawl of the same page content")
    rows = [(i, dup_text + f" tail{i % 2}") for i in range(40)]
    rows += [(100 + i, f"unique document number {i} with its own words "
              + " ".join(f"w{i}x{j}" for j in range(20))) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = cluster_weighted_sample(
        docs, frac=1.0, num_hashes=16, bands=4, shingle_k=3, min_est_jaccard=0.5
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 45
    # singletons: weight 1.0, always selected
    for i in range(100, 105):
        assert by_id[i]["cluster_size"] == 1 and by_id[i]["selected"]
    # the big cluster: every member shares one dup_group, weight 1/size
    big = [r for r in out if r["doc_id"] < 40]
    sizes = {r["cluster_size"] for r in big}
    assert sizes == {40}, sizes
    n_kept = sum(1 for r in big if r["selected"])
    assert n_kept <= 5  # expected 1, deterministic draw keeps it tiny
    # determinism
    again = cluster_weighted_sample(
        docs, frac=1.0, num_hashes=16, bands=4, shingle_k=3, min_est_jaccard=0.5
    ).collect()
    assert {(r["doc_id"], r["selected"]) for r in again} == {
        (r["doc_id"], r["selected"]) for r in out
    }


def test_js_divergence_identical_disjoint_and_half_shared(spark):
    """Identical distributions score 0; fully disjoint vocabularies
    score ln 2; A={a,b} uniform vs B={a,c} uniform shares only 'a'
    (p=q=0.5, zero shared contribution) so JS = ln2/2 exactly.  The
    matrix is the strict upper triangle of the source set."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        js_divergence_matrix,
    )

    rows = (
        [("s1", i, "a b") for i in range(10)]
        + [("s2", 100 + i, "a b") for i in range(10)]
        + [("s3", 200 + i, "x y") for i in range(10)]
        + [("s4", 300 + i, "a c") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")
    out = {
        (r["source_a"], r["source_b"]): r for r in js_divergence_matrix(docs).collect()
    }
    assert len(out) == 6
    ln2 = 0.6931471805599453
    assert out[("s1", "s2")]["js_divergence"] == 0.0
    assert out[("s1", "s3")]["js_divergence"] == round(ln2 + 1e-9, 6)
    assert out[("s1", "s3")]["n_shared_terms"] == 0
    assert out[("s1", "s4")]["js_divergence"] == round(ln2 / 2 + 1e-9, 6)
    assert out[("s1", "s4")]["n_shared_terms"] == 1
    assert out[("s1", "s2")]["n_terms_a"] == 2


def test_lexical_diversity_hand_case_and_boilerplate_signal(spark):
    """Tokens (x,x,y): TTR=2/3, hapax=1/2, Simpson=5/9.  A
    boilerplate source (one phrase repeated) shows lower TTR and
    higher Simpson than a diverse one of the same size."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        lexical_diversity,
    )

    rows = (
        [("hand", 1, "x x y")]
        + [("boiler", 10 + i, "click here to subscribe now") for i in range(20)]
        + [("diverse", 40 + i, f"topic{i} detail{i} nuance{i} angle{i} fact{i}")
           for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")
    out = {r["source"]: r for r in lexical_diversity(docs).collect()}
    h = out["hand"]
    assert h["n_tokens"] == 3 and h["n_types"] == 2 and h["n_hapax"] == 1
    assert h["type_token_ratio"] == round(2 / 3 + 1e-9, 6)
    assert h["hapax_ratio"] == 0.5
    assert abs(h["simpson"] - 5 / 9) < 2e-6
    assert h["gt_missing_mass"] == round(1 / 3 + 1e-9, 6)  # 1 hapax of 3 tokens
    assert out["boiler"]["type_token_ratio"] < out["diverse"]["type_token_ratio"]
    assert out["boiler"]["simpson"] > out["diverse"]["simpson"]
    assert out["diverse"]["hapax_ratio"] == 1.0


def test_capture_recapture_chapman_hand_case(spark):
    """Crawls of 20 and 10 docs sharing 4: Chapman N = 21*11/5 - 1 =
    45.2, SE = sqrt(21*11*16*6 / (25*6)) ~ 12.1589; a disjoint pair
    reports NULL (the estimator is unbounded at zero overlap).
    Within-source duplicate rows must not inflate counts (distinct
    fingerprints per source)."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        capture_recapture,
    )

    shared = [f"shared document text number {i}" for i in range(4)]
    rows = (
        [("A", i, shared[i]) for i in range(4)]
        + [("A", 10 + i, f"a-only text {i}") for i in range(16)]
        + [("B", 100 + i, shared[i]) for i in range(4)]
        + [("B", 110 + i, f"b-only text {i}") for i in range(6)]
        + [("B", 120, "b-only text 0")]          # within-source dup: no effect
        + [("C", 200 + i, f"c-only text {i}") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")
    out = {
        (r["source_a"], r["source_b"]): r for r in capture_recapture(docs).collect()
    }
    ab = out[("A", "B")]
    assert ab["n_a"] == 20 and ab["n_b"] == 10 and ab["n_shared"] == 4
    assert ab["est_population"] == round(21 * 11 / 5 - 1 + 1e-9, 4)
    import math
    want_se = math.sqrt(21 * 11 * 16 * 6 / (25 * 6))
    assert abs(ab["est_se"] - want_se) < 1e-3
    ac = out[("A", "C")]
    assert ac["n_shared"] == 0 and ac["est_population"] is None


def test_zipf_fit_exact_power_law_uniform_and_degenerate(spark):
    """Frequencies 840/i for ranks i=1..7 are EXACTLY Zipfian (all
    integers), so the fit must return slope -1, R^2 = 1; uniform
    frequencies give slope ~0 with R^2 ~0 (or NULL when the quantized
    y-variance lands exactly at zero);
    a one-term vocabulary is degenerate -> NULL."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import zipf_fit

    zipf_tokens = []
    for i in range(1, 8):
        zipf_tokens += [f"t{i}"] * (840 // i)
    rows = [
        ("zipf", 1, " ".join(zipf_tokens)),
        ("uniform", 2, "a a b b c c d d"),
        ("single", 3, "x x x x"),
    ]
    docs = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")
    out = {r["source"]: r for r in zipf_fit(docs).collect()}
    z = out["zipf"]
    assert z["n_types"] == 7
    assert abs(z["zipf_slope"] + 1.0) < 1e-4
    assert abs(z["r_squared"] - 1.0) < 1e-4
    import math
    assert abs(z["zipf_intercept"] - math.log(840)) < 1e-3
    u = out["uniform"]
    assert abs(u["zipf_slope"]) < 1e-4
    assert u["r_squared"] is None or u["r_squared"] < 1e-4
    s = out["single"]
    assert s["zipf_slope"] is None and s["n_types"] == 1


def test_packing_efficiency_hand_case(spark):
    """Docs of 1000/1000/100/2048/3000 tokens at budget 2048 pack into
    3 bins (greedy id order, straddlers count toward their starting
    bin) vs 6 naive windows (the 3000-token doc needs 2): savings 2.0,
    packed fill 7148/6144."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        packing_efficiency,
    )

    sizes = [1000, 1000, 100, 2048, 3000]
    rows = [("s", i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")
    r = packing_efficiency(docs, budget=2048).collect()[0]
    assert r["n_docs"] == 5 and r["total_tokens"] == 7148
    assert r["n_packed"] == 3 and r["n_naive"] == 6
    assert r["window_savings"] == 2.0
    assert r["packed_fill"] == round(7148 / (3 * 2048.0) + 1e-9, 6)
    assert r["naive_fill"] == round(7148 / (6 * 2048.0) + 1e-9, 6)


def test_distinguishing_terms_finds_planted_vocabulary(spark):
    """'physics' is used overwhelmingly by A, 'finance' by B, filler
    words equally: the top favors-A term must be physics (z > 0), the
    top favors-B term finance (z < 0), and shared filler must rank
    below both planted terms in |z|."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        distinguishing_terms,
    )

    rows = (
        [("A", i, "physics quantum common filler words") for i in range(30)]
        + [("B", 100 + i, "finance market common filler words") for i in range(30)]
    )
    docs = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")
    out = distinguishing_terms(docs, "A", "B", topk=3).collect()
    a_side = sorted(
        [r for r in out if r["favors"] == "A"], key=lambda r: -r["z"]
    )
    b_side = sorted(
        [r for r in out if r["favors"] == "B"], key=lambda r: r["z"]
    )
    assert a_side[0]["term"] in ("physics", "quantum") and a_side[0]["z"] > 2
    assert b_side[0]["term"] in ("finance", "market") and b_side[0]["z"] < -2
    fillers = {r["term"]: r["z"] for r in out if r["term"] in ("common", "filler",
                                                               "words")}
    assert all(abs(z) < 1 for z in fillers.values())


def test_readability_hand_case_and_monotonicity(spark):
    """Hand case: 'the cat sat. it ran away.' -> W=6, S=2, syllables
    (vowel groups, floor 1): the=1 cat=1 sat=1 it=1 ran=1 away=2 = 7;
    flesch = 206.835 - 1.015*3 - 84.6*(7/6).  Polysyllabic prose must
    score LOWER than monosyllabic prose, and the hard_share flags
    only the difficult source."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        readability_report,
    )

    rows = (
        [("hand", 1, "the cat sat. it ran away.")]
        + [("easy", 10 + i, "the dog ran. the cat sat. it was fun.")
           for i in range(5)]
        + [("dense", 20 + i,
            "institutional epistemological considerations necessitate "
            "multidimensional organizational restructuring imperatives.")
           for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")
    out = {r["source"]: r for r in readability_report(docs).collect()}
    want = 206.835 - 1.015 * (6 / 2) - 84.6 * (7 / 6)
    import math
    assert abs(out["hand"]["mean_flesch"] - want) < 1e-3
    assert out["easy"]["mean_flesch"] > out["dense"]["mean_flesch"]
    assert out["easy"]["hard_share"] == 0.0
    assert out["dense"]["hard_share"] == 1.0


def test_vocabulary_churn_separates_type_and_mass(spark):
    """Old corpus says 'alpha beta' heavily; the new crawl keeps them,
    drops 'beta', gains hapax junk: type_gain_rate is HIGH while
    mass_gain_rate stays LOW (the hapax tail carries no tokens) —
    exactly the distinction type counts alone miss."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        vocabulary_churn,
    )

    old = spark.createDataFrame(
        [("s", i, "alpha beta alpha beta alpha") for i in range(10)],
        "source STRING, doc_id BIGINT, text STRING",
    )
    new = spark.createDataFrame(
        [("s", 100 + i, f"alpha alpha alpha alpha junk{i}") for i in range(10)],
        "source STRING, doc_id BIGINT, text STRING",
    )
    r = vocabulary_churn(old, new).collect()[0]
    assert r["n_types_old"] == 2              # alpha, beta
    assert r["n_types_new"] == 11             # alpha + 10 junk hapaxes
    assert r["n_lost"] == 1 and r["n_gained"] == 10
    assert r["type_gain_rate"] == round(10 / 11 + 1e-9, 6)
    assert r["mass_gain_rate"] == round(10 / 50 + 1e-9, 6)
    assert r["mass_loss_rate"] == round(20 / 50 + 1e-9, 6)


def test_conformal_thresholds_exact_rank(spark):
    """With calibration scores 1..100 (quantized), alpha=0.05 gives
    k = floor(0.05 * 101) = 5 -> threshold = 5th smallest; the keep
    rate on an identical test split is exact."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        conformal_thresholds,
    )

    cal = spark.createDataFrame([(i * 10_000,) for i in range(1, 101)], "qs LONG")
    test = spark.createDataFrame([(i * 10_000,) for i in range(1, 101)], "qs LONG")
    out = {
        r["alpha"]: r
        for r in conformal_thresholds(cal, test, "qs").collect()
    }
    r = out[0.05]
    assert r["n_cal"] == 100 and r["k_rank"] == 5
    assert r["threshold"] == 0.05  # 5 * 10_000 / 1e6
    assert r["n_kept"] == 96 and r["test_keep_rate"] == 0.96
    # alpha=0.01: floor(0.01 * 101) = 1 naturally (no clamping)
    r1 = out[0.01]
    assert r1["k_rank"] == 1 and r1["n_kept"] == 100
    assert out[0.1]["k_rank"] == 10 and out[0.1]["n_kept"] == 91


def test_conformal_thresholds_no_valid_cutoff_is_null(spark):
    """alpha < 1/(n_cal+1) admits NO finite-sample cutoff: the rank is
    0 and the row reports NULL threshold / n_kept / keep-rate instead
    of clamping to the minimum score (which would over-reject)."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        conformal_thresholds,
    )

    cal = spark.createDataFrame([(i * 10_000,) for i in range(1, 11)], "qs LONG")
    test = spark.createDataFrame([(i * 10_000,) for i in range(1, 11)], "qs LONG")
    out = {
        r["alpha"]: r
        for r in conformal_thresholds(cal, test, "qs").collect()
    }
    # floor(0.01 * 11) = 0 -> no cutoff
    r = out[0.01]
    assert r["k_rank"] == 0 and r["n_cal"] == 10
    assert r["threshold"] is None
    assert r["n_kept"] is None and r["test_keep_rate"] is None
    assert r["n_test"] == 10  # the test split is still counted
    # floor(0.1 * 11) = 1 -> the minimum IS valid at alpha = 0.1
    assert out[0.1]["k_rank"] == 1 and out[0.1]["n_kept"] == 10


def test_retrieval_eval_planted_relevance(spark):
    """A corpus with two topics and topic-exclusive rare terms: every
    query's nearest results share its source, so MRR and nDCG are 1.0
    and p@k reflects the topic size."""
    from kafka_spark_streaming_pipeline_spark.operators.retrieval import (
        retrieval_eval,
    )

    rows = []
    for i in range(3):
        rows.append((i, f"alpha apple axe common filler{i}", "sA"))
    for i in range(3):
        rows.append((10 + i, f"beta bolt bus common filler{10+i}", "sB"))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    out = {
        r["qid"]: r
        for r in retrieval_eval(docs, n_queries=20, topk=10, n_terms=3).collect()
    }
    assert len(out) == 6
    for qid, r in out.items():
        assert r["n_rel_corpus"] == 2
        assert r["mrr"] == 1.0, (qid, r)  # a same-topic doc ranks first
        assert r["ndcg_at_k"] == 1.0
        # the 3 rarest terms are topic-exclusive (df=3 beats 'common'
        # at df=6), so exactly the 2 same-topic docs are retrieved
        assert r["n_retrieved"] == 2 and r["n_rel_at_k"] == 2
        assert r["p_at_k"] == 0.2


def test_retrieval_eval_keeps_unanswerable_and_dry_queries(spark):
    """Every query appears: a query doc with a UNIQUE source (no
    relevant doc exists in the corpus) reports NULL ndcg, not 0; a
    query doc whose every token is a hapax (no df>=2 term) retrieves
    nothing and reports an explicit zero-metric row instead of
    silently dropping out of the aggregate."""
    from kafka_spark_streaming_pipeline_spark.operators.retrieval import (
        retrieval_eval,
    )

    rows = [
        # qid 0: terms match the sA docs, but its source is unique ->
        # unanswerable (n_rel_corpus = 0)
        (0, "alpha apple axe", "sUnique"),
        # qid 1: all-hapax text -> no query terms -> nothing retrieved
        (1, "qqq zzz www", "sA"),
    ]
    for i in range(3):
        rows.append((2 + i, f"alpha apple axe common filler{i}", "sA"))
    for i in range(3):
        rows.append((10 + i, f"beta bolt bus common filler{10+i}", "sB"))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    out = {
        r["qid"]: r
        for r in retrieval_eval(docs, n_queries=20, topk=10, n_terms=3).collect()
    }
    assert len(out) == 8  # all 8 docs are queries; none dropped
    solo = out[0]
    assert solo["n_rel_corpus"] == 0 and solo["n_retrieved"] > 0
    assert solo["n_rel_at_k"] == 0 and solo["mrr"] == 0.0
    assert solo["ndcg_at_k"] is None  # unanswerable, not 'scored 0'
    dry = out[1]
    assert dry["n_retrieved"] == 0 and dry["n_rel_at_k"] == 0
    assert dry["p_at_k"] == 0.0 and dry["mrr"] == 0.0
    assert dry["n_rel_corpus"] == 3  # answerable, the ranker found none
    assert dry["ndcg_at_k"] == 0.0


def test_release_audit_families_and_invariants(spark, sf_dir):
    """The composed x164 gate reports every family, and the hard
    invariants hold on clean synthetic data: zero PII residue, zero
    Bloom false negatives, sketch audits within their bounds;
    informational datasheet rows carry NULL verdicts."""
    from kafka_spark_streaming_pipeline_spark.plans import QUERIES

    rows = QUERIES["x164_release_audit"].builder(spark, sf_dir).collect()
    fams = {r["family"] for r in rows}
    assert fams == {
        "datasheet", "pii", "k_anonymity", "bloom",
        "quantile_sketch", "cardinality_sketch",
    }
    by = {}
    for r in rows:
        by.setdefault((r["family"], r["metric"]), []).append(r)
    # informational metrics: NULL verdict by design
    assert all(r["ok"] is None for r in by[("datasheet", "n_docs")])
    assert all(r["ok"] is None for r in by[("datasheet", "dup_rate")])
    # hard invariants on the synthetic corpus (no real PII planted)
    assert all(r["value"] == 0.0 and r["ok"] for r in by[("pii", "pii_doc_rate")])
    [missed] = by[("bloom", "missed_members")]
    assert missed["value"] == 0.0 and missed["ok"]
    [dd] = by[("quantile_sketch", "max_rel_err")]
    assert dd["ok"] and dd["value"] <= 0.02
    [hll] = by[("cardinality_sketch", "max_rel_err")]
    assert hll["ok"] and hll["value"] <= 0.195
    # one k-anonymity row per threshold, frac in [0, 1]
    kas = by[("k_anonymity", "risky_row_frac")]
    assert {r["item"] for r in kas} == {"k=2", "k=5", "k=10", "k=25"}
    assert all(0.0 <= r["value"] <= 1.0 for r in kas)


def test_padding_efficiency_hand_case(spark):
    """Lengths 10/64/65/600 at width 64, max 512: buckets 1,1,2,8
    (600 truncates to 512); waste is exact integer arithmetic and the
    naive baseline pads everything to 512."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        padding_efficiency,
    )

    def text(n):
        return " ".join(["w"] * n)

    docs = spark.createDataFrame(
        [(i, text(n)) for i, n in enumerate([10, 64, 65, 600])],
        "doc_id BIGINT, text STRING",
    )
    rows = padding_efficiency(docs).collect()
    by = {(r["strategy"], r["bucket"]): r for r in rows}
    b1 = by[("bucketed", 1)]
    assert b1["n_docs"] == 2 and b1["sum_tokens"] == 74
    assert b1["padded_tokens"] == 128 and b1["waste_tokens"] == 54
    b2 = by[("bucketed", 2)]
    assert b2["n_docs"] == 1 and b2["cap_len"] == 128 and b2["waste_tokens"] == 63
    b8 = by[("bucketed", 8)]  # the 600-token doc truncates to 512
    assert b8["sum_tokens"] == 512 and b8["waste_tokens"] == 0
    nv = by[("naive_max_len", None)]
    assert nv["n_docs"] == 4 and nv["padded_tokens"] == 4 * 512
    assert nv["waste_tokens"] == 4 * 512 - (10 + 64 + 65 + 512)
    # bucketing strictly beats naive on this corpus
    bucketed_eff = sum(r["sum_tokens"] for r in rows if r["strategy"] == "bucketed") / sum(
        r["padded_tokens"] for r in rows if r["strategy"] == "bucketed"
    )
    assert bucketed_eff > nv["efficiency"]


def test_truncation_loss_hand_case(spark):
    """Lengths 100 and 300 at max_len 128/256: exact truncated counts
    and token losses; monotone decreasing loss in max_len."""
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        truncation_loss,
    )

    def text(n):
        return " ".join(["w"] * n)

    docs = spark.createDataFrame(
        [(0, text(100)), (1, text(300))], "doc_id BIGINT, text STRING"
    )
    out = {r["max_len"]: r for r in truncation_loss(docs, (128, 256)).collect()}
    r128 = out[128]
    assert r128["n_truncated"] == 1 and r128["n_tokens_lost"] == 300 - 128
    assert r128["doc_trunc_frac"] == 0.5
    assert r128["token_loss_frac"] == round(172 / 400 + 1e-9, 6)
    r256 = out[256]
    assert r256["n_truncated"] == 1 and r256["n_tokens_lost"] == 44
    assert r256["token_loss_frac"] < r128["token_loss_frac"]


def test_trigram_strictly_sharper_than_bigram_on_salad(spark):
    """x184's reason to exist: on the SAME fluent-vs-salad fixture the
    interpolated trigram LM separates (mean salad CE - mean fluent CE)
    strictly wider than the x74 bigram LM — order evidence three
    tokens deep beats two.  Both must also separate at all (gap > 0);
    measured 0.316 (trigram) vs 0.247 (bigram) on this fixture."""
    from kafka_spark_streaming_pipeline_spark.cache import unpersist_tracked
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        bigram_cross_entropy,
        trigram_cross_entropy,
    )

    base = [
        "the quick brown fox jumps over the lazy dog near the old stone bridge",
        "a gentle river flows through the quiet valley under the morning sun",
        "children play happy games in the green park beside the tall trees",
    ]
    rows, did = [], 0
    for s in base:
        for _ in range(4):
            rows.append((did, s + " " + s))
            did += 1
    for s in base:
        for _ in range(4):
            rows.append((did, " ".join(sorted((s + " " + s).split()))))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_fluent = 12

    def sep(fn):
        ce = {r["doc_id"]: r["cross_entropy"] for r in fn(docs).collect()}
        unpersist_tracked()
        fluent = sum(v for k, v in ce.items() if k < n_fluent) / n_fluent
        salad = sum(v for k, v in ce.items() if k >= n_fluent) / n_fluent
        return salad - fluent

    bi, tri = sep(bigram_cross_entropy), sep(trigram_cross_entropy)
    assert bi > 0 and tri > 0
    assert tri > bi


def test_trigram_cross_entropy_interpolation_tiers(spark):
    """The three tiers actually mix: a pure-Python replay of the
    trigram/bigram/unigram continuation counts and the 0.6/0.3/0.1
    interpolation reproduces every per-doc cross-entropy exactly (6-dp
    house rounding)."""
    import math

    from kafka_spark_streaming_pipeline_spark.cache import unpersist_tracked
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        trigram_cross_entropy,
    )

    rows = [
        (0, "alpha beta gamma delta alpha beta gamma"),
        (1, "alpha beta gamma alpha beta gamma delta"),
        (2, "delta gamma beta alpha delta gamma beta"),
        (3, "epsilon zeta eta theta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_trigrams"], r["cross_entropy"])
        for r in trigram_cross_entropy(docs).collect()
    }
    unpersist_tracked()

    # pure-Python replay on the token strings (hashing is injective on
    # this tiny vocab, so string keys replay the hash-keyed counts)
    k = 0.5
    tri, c12, b23, w2c, uni = {}, {}, {}, {}, {}
    occ = []
    for did, text in rows:
        t = text.lower().split()
        for i in range(len(t) - 2):
            w1, w2, w3 = t[i], t[i + 1], t[i + 2]
            occ.append((did, (w1, w2, w3)))
            tri[(w1, w2, w3)] = tri.get((w1, w2, w3), 0) + 1
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            b23[(w2, w3)] = b23.get((w2, w3), 0) + 1
            w2c[w2] = w2c.get(w2, 0) + 1
            uni[w3] = uni.get(w3, 0) + 1
    v3, v2, v1, n1 = len(c12), len(w2c), len(uni), sum(uni.values())
    expect = {}
    for did, (w1, w2, w3) in occ:
        p = (
            0.6 * (tri[(w1, w2, w3)] + k) / (c12[(w1, w2)] + k * v3)
            + 0.3 * (b23[(w2, w3)] + k) / (w2c[w2] + k * v2)
            + 0.1 * (uni[w3] + k) / (n1 + k * v1)
        )
        n, s = expect.get(did, (0, 0.0))
        expect[did] = (n + 1, s - math.log(p))
    want = {
        did: (n, round(s / n + 1e-9, 6)) for did, (n, s) in expect.items()
    }
    assert got == want


def test_trigram_lm_save_score_roundtrip_and_unseen_backoff(spark, tmp_path):
    """The trigram train-once/score-many split (x74's
    save/score contract one tier up): scoring the training corpus
    through the persisted model reproduces trigram_cross_entropy
    exactly; a batch with unseen trigrams/contexts/words still gets a
    finite score through the tier-by-tier backoff (never dropped),
    and fully-novel text scores strictly worse than re-scored
    training text."""
    from kafka_spark_streaming_pipeline_spark.cache import unpersist_tracked
    from kafka_spark_streaming_pipeline_spark.operators.curation import (
        save_trigram_lm,
        score_with_trigram_lm,
        trigram_cross_entropy,
    )

    rows = [
        (0, "alpha beta gamma delta alpha beta gamma"),
        (1, "alpha beta gamma alpha beta gamma delta"),
        (2, "delta gamma beta alpha delta gamma beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "tri_lm")
    save_trigram_lm(docs, path)
    unpersist_tracked()

    want = {
        (r["doc_id"], r["n_trigrams"], r["cross_entropy"])
        for r in trigram_cross_entropy(docs).collect()
    }
    unpersist_tracked()
    got = {
        (r["doc_id"], r["n_trigrams"], r["cross_entropy"])
        for r in score_with_trigram_lm(docs, path).collect()
    }
    assert got == want

    novel = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),        # seen trigrams
            (11, "zz yy xx ww vv"),                # fully novel
            (12, "alpha beta zz"),                 # seen context, novel tail
        ],
        "doc_id long, text string",
    )
    scored = {r["doc_id"]: r["cross_entropy"] for r in
              score_with_trigram_lm(novel, path).collect()}
    assert set(scored) == {10, 11, 12}           # nothing dropped
    assert all(s == s and s < float("inf") for s in scored.values())
    assert scored[11] > scored[10]               # novel costs more
    assert scored[12] > scored[10]
