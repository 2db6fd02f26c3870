"""Dataset profiling: per-column stats in ONE pass over the table.

The first thing a training-data pipeline does to a new source is
profile it (null rates, cardinalities, ranges).  This computes every
column's stats in a single aggregate — one scan, one reduce — then
unpivots the one-row result into (col_name, ...) rows with an array
explode, so profiling a 100 TB table costs exactly one pass.

Numeric mins/maxes surface as doubles; timestamps as epoch millis
(cast through the UTC session zone); strings contribute counts only —
cross-engine string formatting of doubles/timestamps is deliberately
avoided so the profile is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per profiled column: n_rows, n_non_null, n_distinct,
    min_num, max_num (doubles; epoch ms for timestamps; null for
    strings/complex)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        if isinstance(dt, NumericType):
            mn = F.min(c).cast("double")
            mx = F.max(c).cast("double")
        elif isinstance(dt, (TimestampType, TimestampNTZType)):
            mn = F.unix_millis(F.min(c).cast("timestamp")).cast("double")
            mx = F.unix_millis(F.max(c).cast("timestamp")).cast("double")
        else:
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
        aggs.append(mn.alias(f"{c}__mn"))
        aggs.append(mx.alias(f"{c}__mx"))
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_non_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_num"),
                F.col(f"{c}__mx").alias("max_num"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE pass:
    all k(k-1)/2 co-moment aggregates run in a single map-side-
    combinable aggregation over one scan (never k² scans or a driver
    loop) and unpivot to (col_a, col_b, corr) rows — the feature-
    redundancy screen of dataset profiling."""
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least 2 columns")
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.corr(a, b).alias(f"{a}|{b}"))
            pairs.append((a, b))
    wide = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(F.col(f"`{a}|{b}`") + F.lit(1e-9), 4).alias("corr"),
                )
                for a, b in pairs
            ]
        )
    ).alias("p")
    return wide.select(stacked).select("p.col_a", "p.col_b", "p.corr")


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 5, p_hot: float = 0.99
) -> DataFrame:
    """Join/aggregation-key skew diagnostics in one row: the pre-join
    report that decides whether a key needs salting (operators/skew.py)
    or AQE skew handling before a 100 TB shuffle is launched.

    Scale shape: ONE groupBy(key) frequency aggregate (map-side
    combinable) is the only corpus-sized shuffle.  Percentiles come
    from the frequency-of-frequencies histogram — (freq, n_keys)
    rows, bounded by the number of DISTINCT frequency values, walked
    with the same cumulative-rank window discipline as the DDSketch
    quantile (single partition of a provably tiny frame, never of
    data).  Top keys are orderBy().limit() — TakeOrderedAndProject,
    per-partition top-k + driver merge.

    Output: (key_column, n_rows, n_keys, max_freq, p50_freq,
    p99_freq, mean_freq, skew_ratio = max/p50, suggested_salt =
    ceil(max/p99) — the replication factor that would level the
    hottest key to the p99 key's load — and the top-k hot keys as
    'key:freq' CSV).  All integer arithmetic except the two rounded
    ratios, so the row is engine-exact."""
    from pyspark.sql import Window as W

    from ..cache import tracked_persist

    # freq (distinct-keys-sized, the product of the one corpus-sized
    # shuffle) feeds the histogram AND the top-k scan — persisted so
    # no consumer re-runs the corpus aggregate (plan sweep: 6
    # scans/key before).  ff stays UNPERSISTED on purpose: its two
    # consumers re-aggregate the cached freq rows (trivial), and the
    # percentile walk's single-partition exchange must be fed by the
    # aggregate directly so the plan linter can prove it bounded
    freq = tracked_persist(
        df.groupBy(F.col(key_col).cast("string").alias("k")).agg(
            F.count("*").alias("freq")
        )
    )
    ff = freq.groupBy("freq").agg(F.count("*").alias("nk"))
    tot = ff.agg(
        F.sum("nk").cast("long").alias("n_keys"),
        F.sum(F.col("freq") * F.col("nk")).cast("long").alias("n_rows"),
        F.max("freq").alias("max_freq"),
    )
    cum = ff.withColumn(
        "ck", F.sum("nk").over(W.orderBy("freq"))
    )  # distinct-freq-sized frame: bounded single partition by design
    with_tot = cum.crossJoin(F.broadcast(tot))
    p50 = (
        with_tot.filter(F.col("ck") >= F.ceil(F.col("n_keys") * 0.5))
        .agg(F.min("freq").alias("p50_freq"))
    )
    p99 = (
        with_tot.filter(F.col("ck") >= F.ceil(F.col("n_keys") * F.lit(p_hot)))
        .agg(F.min("freq").alias("p99_freq"))
    )
    top = (
        freq.orderBy(F.desc("freq"), "k")
        .limit(top_k)
        .agg(
            F.array_sort(
                F.collect_list(F.struct((-F.col("freq")).alias("nf"), F.col("k")))
            ).alias("t")
        )
        .select(
            F.array_join(
                F.transform("t", lambda s: F.concat_ws(":", s["k"], -s["nf"])), ","
            ).alias("top_keys_csv")
        )
    )
    return (
        tot.crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p99))
        .crossJoin(F.broadcast(top))
        .select(
            F.lit(key_col).alias("key_column"),
            "n_rows",
            "n_keys",
            "max_freq",
            "p50_freq",
            "p99_freq",
            (
                F.round(F.col("n_rows") / F.col("n_keys") + F.lit(1e-9), 4)
                + F.lit(0.0)
            ).alias("mean_freq"),
            (
                F.round(F.col("max_freq") / F.col("p50_freq") + F.lit(1e-9), 4)
                + F.lit(0.0)
            ).alias("skew_ratio"),
            F.ceil(F.col("max_freq") / F.col("p99_freq")).cast("long").alias(
                "suggested_salt"
            ),
            "top_keys_csv",
        )
    )


def srm_check(
    df: DataFrame,
    unit_col: str,
    n_arms: int = 2,
    crit: float = 3.841,
    salt: str = "srm|",
) -> DataFrame:
    """Sample-ratio-mismatch audit for a deterministic hash split —
    the guard every A/B assignment and train/eval split runs before
    anyone trusts downstream numbers: if the realized arm sizes are
    statistically incompatible with the intended equal split, the
    assignment (or the logging) is broken.

    The unit of randomization is ``unit_col`` (distinct units, not
    rows — row counts are reported but never tested, since activity
    per unit is expected to vary).  chi2 = sum over arms of
    (obs - n/k)^2 / (n/k); per-arm terms are trunc-quantized to
    BIGINTs before the cross-arm sum so the statistic is
    order-independent (house float discipline).  ``crit`` defaults to
    the 0.05 critical value for 1 dof (k=2).

    Scale shape: ONE corpus scan into one unit-keyed aggregate (the
    only corpus-sized exchange) that yields BOTH distinct-unit and
    row counts per arm; the k-row arm table is persisted because it
    feeds three consumers (total, chi2, final rows) — without that,
    each consumer re-runs the corpus scan (plan-shape test pins it).
    Output: one row per arm carrying its counts plus the shared
    chi2/flag."""
    from ..cache import tracked_persist
    from .text import hash60

    per_unit = df.groupBy(
        F.col(unit_col).cast("string").alias("u")
    ).agg(F.count("*").alias("m"))
    arms = tracked_persist(
        per_unit.select(
            F.pmod(hash60(F.col("u"), salt=salt), F.lit(n_arms)).alias("arm"), "m"
        )
        .groupBy("arm")
        .agg(
            F.count("*").cast("long").alias("n_units"),
            F.sum("m").cast("long").alias("n_rows"),
        )
    )
    rows = arms.select("arm", "n_rows")
    tot = arms.agg(F.sum("n_units").cast("long").alias("n_total"))
    with_tot = arms.select("arm", "n_units").crossJoin(F.broadcast(tot))
    expected = F.col("n_total") / F.lit(float(n_arms))
    termq = (
        ((F.col("n_units") - expected) * (F.col("n_units") - expected) / expected)
        * 1000000
    ).cast("long")
    chi = with_tot.agg(
        (
            F.round(F.sum(termq) / F.lit(1000000.0) + F.lit(1e-9), 4) + F.lit(0.0)
        ).alias("chi2")
    )
    return (
        with_tot.join(rows, "arm", "left")
        .crossJoin(F.broadcast(chi))
        .select(
            "arm",
            "n_units",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            (F.round(expected + F.lit(1e-9), 4) + F.lit(0.0)).alias("expected_units"),
            "chi2",
            (F.col("chi2") > F.lit(crit)).alias("srm_flag"),
        )
    )


# log10(1 + 1/d) for d = 1..9, as FIXED literals: computing them with
# log10() at runtime risks a last-ulp disagreement between the JVM's
# and DuckDB's libm, which the quantized chi-square could straddle.
BENFORD_P = {
    1: 0.301029995663981,
    2: 0.176091259055681,
    3: 0.124938736608300,
    4: 0.096910013008056,
    5: 0.079181246047625,
    6: 0.066946789630613,
    7: 0.057991946977687,
    8: 0.051152522447381,
    9: 0.045757490560675,
}


def benford_audit(
    df: DataFrame, value_col: str, crit: float = 15.507
) -> DataFrame:
    """Benford's-law first-digit audit of a positive monetary column —
    the classic screen for fabricated or mis-joined numeric data
    (natural multiplicative amounts follow P(d) = log10(1+1/d);
    uniform or hand-entered ones don't).

    Digit extraction dodges floating point entirely: amounts become
    exact integer cents (floor(x*100 + 0.5)), and the leading digit is
    the first character of the INTEGER's decimal rendering — identical
    in both engines, where a log10-based extraction can disagree by an
    ulp at power-of-ten boundaries.  chi2 terms are trunc-quantized to
    BIGINTs before the cross-digit sum (house float discipline);
    ``crit`` defaults to the 0.05 critical value for 8 dof.  One scan,
    one 9-row aggregate; the statistic rides broadcast back on the
    digit rows."""
    cents = F.floor(F.col(value_col) * F.lit(100.0) + F.lit(0.5)).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    from ..cache import tracked_persist

    # the 9-row digit aggregate feeds THREE consumers (total, chi2,
    # final rows) — without the persist each one re-runs the full
    # fact-table scan (plan-shape test pins this)
    digits = tracked_persist(
        df.filter(F.col(value_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    tot = digits.agg(F.sum("n_obs").cast("long").alias("n_total"))
    p = F.lit(None).cast("double")
    for d, pd in sorted(BENFORD_P.items(), reverse=True):
        p = F.when(F.col("digit") == d, F.lit(pd)).otherwise(p)
    with_p = digits.crossJoin(F.broadcast(tot)).select(
        "digit", "n_obs", "n_total", p.alias("benford_p")
    )
    expected = F.col("n_total") * F.col("benford_p")
    termq = (
        ((F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected)
        * F.lit(1000000.0)
    ).cast("long")
    chi = with_p.agg(
        (
            F.round(F.sum(termq) / F.lit(1000000.0) + F.lit(1e-9), 4) + F.lit(0.0)
        ).alias("chi2")
    )
    return (
        with_p.crossJoin(F.broadcast(chi))
        .select(
            "digit",
            "n_obs",
            (F.round(expected + F.lit(1e-9), 4) + F.lit(0.0)).alias("expected_n"),
            "benford_p",
            "chi2",
            (F.col("chi2") > F.lit(crit)).alias("benford_violation"),
        )
    )


def roc_auc(
    rated: DataFrame,
    score_col: str = "score_q",
    label_col: str = "label",
    group_col: str = "source",
) -> DataFrame:
    """Exact ROC-AUC of a numeric score against a boolean label, per
    group — the threshold-free counterpart of the kappa agreement
    check (``rater_agreement``): before trusting a cheap continuous
    signal as a ranking proxy for an expensive classifier, measure how
    often it ranks a positive above a negative.

    AUC equals the normalized Mann-Whitney U statistic, computed from
    a (group, score) HISTOGRAM with midranks for ties — never a
    per-row rank over the corpus:

        hist      = count of positives / negatives per distinct score
        midrank2  = 2*(rows below) + (rows at this score) + 1
        U         = sum(n_pos * midrank) - n_pos*(n_pos+1)/2
        AUC       = U / (n_pos * n_neg)

    Doubled midranks keep every running statistic an exact BIGINT
    (exact up to ~2.1e9 rows per group; the final ratio is composed
    in DOUBLE with identical op order in both engines).  The one
    window runs per group over DISTINCT QUANTIZED SCORES — bounded by
    score cardinality, not corpus size.  Degenerate groups (all
    positive or all negative) report NULL: AUC is undefined there and
    a silent 0.5 would hide a constant classifier.

    Input contract: ``score_col`` must already be an exactly
    groupable value (BIGINT quantization upstream — never raw
    DOUBLE), ``label_col`` a non-null boolean.
    """
    from pyspark.sql import Window

    hist = rated.groupBy(group_col, score_col).agg(
        F.sum(F.col(label_col).cast("long")).cast("long").alias("n_pos"),
        F.sum((~F.col(label_col)).cast("long")).cast("long").alias("n_neg"),
    )
    w = Window.partitionBy(group_col).orderBy(score_col)
    cnt = F.col("n_pos") + F.col("n_neg")
    cum = F.sum(cnt).over(w)  # inclusive running total
    ranked = hist.select(
        group_col,
        "n_pos",
        "n_neg",
        # 2*midrank = 2*cum_before + cnt + 1 = 2*cum - cnt + 1
        (F.lit(2) * cum - cnt + F.lit(1)).cast("long").alias("midrank2"),
    )
    per = ranked.groupBy(group_col).agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(F.col("n_pos") * F.col("midrank2")).cast("long").alias("ranksum2"),
    )
    npd = F.col("n_pos").cast("double")
    nnd = F.col("n_neg").cast("double")
    # U = ranksum - n_pos*(n_pos+1)/2 ; AUC = U / (n_pos*n_neg); the
    # doubled ranksum folds the /2 into a single final division.
    auc = (
        (F.col("ranksum2").cast("double") - npd * (npd + F.lit(1.0)))
        / (F.lit(2.0) * npd * nnd)
    )
    return per.select(
        group_col,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(auc + F.lit(1e-9), 6) + F.lit(0.0),
        ).alias("auc"),
    )


# Poisson(1) CDF boundaries for the deterministic multiplicity draw —
# fixed shared literals (like the Benford table): P(X <= j) for
# j = 0..7; draws past the table get multiplicity 8 (P ~ 1e-5).
_POISSON1_CDF = (
    0.3678794411714423,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def bootstrap_mean_ci(
    df: DataFrame,
    value_q_col: str = "value_q",
    group_col: str = "source",
    id_col: str = "doc_id",
    n_boot: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for a per-group mean —
    the bootstrap that works when the data does not fit on one
    machine (Chamandy et al., "Estimating Uncertainty for Massive
    Data Streams", Google 2012): instead of materializing B resampled
    corpora, every row draws an independent Poisson(1) multiplicity
    per replicate, which for large n is indistinguishable from
    multinomial resampling.

    The multiplicity is RNG-free: u = hash60(salt+b+'|'+id)/2^60
    thresholded against the fixed Poisson(1) CDF literals, so every
    replicate is deterministic and bit-identical across engines and
    re-runs.  ``value_q_col`` must be a pre-quantized BIGINT so the
    replicate sums are exact integers (never order-dependent DOUBLE
    sums); the only DOUBLEs are one division per (group, replicate)
    and the final /1e6 display scaling.

    Shape: ONE corpus scan — explode b in [-1, n_boot) (b = -1 is the
    identity replicate carrying the point estimate), map-side-combined
    groupBy (group, b), then rank windows over n_boot rows per group.
    Returns per group: n_docs, mean (point), ci_lo / ci_hi (the 2nd /
    (nb-1)-th order statistics of the replicate means, a ~90% interval
    at B = 32), n_boot_valid."""
    return ci_from_bootstrap_partials(
        bootstrap_partials(df, value_q_col, group_col, id_col, n_boot, salt),
        group_col,
    )


def bootstrap_partials(
    df: DataFrame,
    value_q_col: str = "value_q",
    group_col: str = "source",
    id_col: str = "doc_id",
    n_boot: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """The mergeable HALF of the Poisson bootstrap: per (group,
    replicate) BIGINT sums (sum_m, sum_mv).  Multiplicities are pure
    functions of (replicate, doc id), so partials from disjoint
    batches ADD to exactly the whole-corpus partial — the streaming
    sink logs these per batch and the merged CI is bit-equal to the
    batch bootstrap."""
    from .text import hash60

    b = F.explode(F.sequence(F.lit(-1), F.lit(n_boot - 1))).alias("b")
    exploded = df.select(
        F.col(group_col).alias("grp"), F.col(value_q_col).alias("vq"),
        F.col(id_col).alias("rid"), b,
    )
    u = hash60(
        F.concat(F.col("b").cast("string"), F.lit("|"), F.col("rid").cast("string")),
        salt,
    ).cast("double") / F.lit(1152921504606846976.0)
    m = F.lit(8)
    for j in range(len(_POISSON1_CDF) - 1, -1, -1):
        m = F.when(u < F.lit(_POISSON1_CDF[j]), F.lit(j)).otherwise(m)
    m = F.when(F.col("b") == -1, F.lit(1)).otherwise(m)
    return (
        exploded.select("grp", "b", m.cast("long").alias("m"), "vq")
        .groupBy("grp", "b")
        .agg(
            F.sum("m").cast("long").alias("sum_m"),
            F.sum(F.col("m") * F.col("vq")).cast("long").alias("sum_mv"),
        )
    )


def ci_from_bootstrap_partials(
    partials: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Finish the bootstrap from (possibly merged) per-(group,
    replicate) partial sums: drop empty replicates, rank the replicate
    means, report point estimate + order-statistic CI.  All windows
    run over at most n_boot rows per group."""
    from pyspark.sql import Window

    per_rep = (
        partials
        .where((F.col("sum_m") > 0) | (F.col("b") == -1))
        .select(
            "grp", "b", "sum_m",
            (F.col("sum_mv").cast("double") / F.col("sum_m").cast("double"))
            .alias("mean_q"),
        )
    )
    reps = per_rep.where(F.col("b") >= 0)
    point = per_rep.where(F.col("b") == -1).select(
        "grp", F.col("sum_m").alias("n_docs"), F.col("mean_q").alias("point_q")
    )
    wnd = Window.partitionBy("grp").orderBy("mean_q", "b")
    ranked = reps.select(
        "grp", "mean_q",
        F.row_number().over(wnd).cast("long").alias("rn"),
        F.count("*").over(Window.partitionBy("grp")).cast("long").alias("nb"),
    )
    ci = ranked.groupBy("grp").agg(
        F.max(F.when(F.col("rn") == 2, F.col("mean_q"))).alias("lo_q"),
        F.max(F.when(F.col("rn") == F.col("nb") - 1, F.col("mean_q"))).alias("hi_q"),
        F.max("nb").alias("n_boot_valid"),
    )
    six = F.lit(1e6)
    return point.join(ci, "grp").select(
        F.col("grp").alias(group_col),
        "n_docs",
        (F.round(F.col("point_q") / six + F.lit(1e-9), 6) + F.lit(0.0)).alias("mean"),
        (F.round(F.col("lo_q") / six + F.lit(1e-9), 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(F.col("hi_q") / six + F.lit(1e-9), 6) + F.lit(0.0)).alias("ci_hi"),
        "n_boot_valid",
    )


def gini_concentration(
    rated: DataFrame,
    weight_col: str = "weight",
    group_col: str = "source",
) -> DataFrame:
    """Exact Gini coefficient of a non-negative weight per group — the
    concentration diagnostic for a corpus: a source whose token mass
    sits in a few giant documents (or a key whose traffic sits on a
    few users) behaves very differently under sharding, sampling, and
    dedup than a flat one.  G = 0 is perfectly flat, G -> 1 is fully
    concentrated.

    Computed from a (group, weight) HISTOGRAM with cumulative counts
    — the data is never sorted: for the ascending distinct weights,
    a tie-group of c docs at weight w after C lighter docs contributes
    w * (c*C + c*(c+1)/2) to the rank-weighted sum S, and
    G = 2*S / (n*T) - (n+1)/n.  Each group's contribution is
    normalized by n*T FIRST and trunc-quantized to pico-units
    (BIGINT), so the cross-group sum is order-independent and no
    intermediate exceeds BIGINT at any corpus size (raw S would
    overflow at ~3e6 docs x 1e6 tokens).  The one window runs per
    group over DISTINCT WEIGHTS, never corpus rows."""
    hist = rated.groupBy(group_col, weight_col).agg(
        F.count("*").cast("long").alias("cnt")
    )
    return gini_from_hist(hist, weight_col, group_col)


def gini_from_hist(
    hist: DataFrame,
    weight_col: str = "weight",
    group_col: str = "source",
) -> DataFrame:
    """Finish the Gini computation from a (group, weight, cnt)
    HISTOGRAM — the mergeable half: histograms from disjoint batches
    ADD (counts sum per cell), and the distinct-weight cell count is
    bounded by the weight DOMAIN (e.g. tokens per document), not the
    corpus, so a streaming sink's state stays tiny forever."""
    from pyspark.sql import Window

    tot = hist.groupBy(group_col).agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum(F.col("cnt") * F.col(weight_col)).cast("long").alias("total_weight"),
    )
    w = Window.partitionBy(group_col).orderBy(weight_col)
    cum = F.sum("cnt").over(w)
    with_prior = hist.select(
        group_col,
        weight_col,
        "cnt",
        (cum - F.col("cnt")).cast("long").alias("c_before"),
    ).join(F.broadcast(tot), group_col)
    cd = F.col("cnt").cast("double")
    term = (
        F.col(weight_col).cast("double")
        * (cd * F.col("c_before").cast("double") + cd * (cd + F.lit(1.0)) / F.lit(2.0))
        / (F.col("n_docs").cast("double") * F.col("total_weight").cast("double"))
        * F.lit(1e12)
    ).cast("long")
    per = with_prior.groupBy(group_col).agg(
        F.max("n_docs").alias("n_docs"),
        F.max("total_weight").alias("total_weight"),
        F.sum(term).cast("long").alias("s_q"),
    )
    nd = F.col("n_docs").cast("double")
    gini = (
        F.lit(2.0) * F.col("s_q").cast("double") / F.lit(1e12)
        - (nd + F.lit(1.0)) / nd
    )
    return per.select(
        group_col,
        "n_docs",
        "total_weight",
        (F.round(gini + F.lit(1e-9), 6) + F.lit(0.0)).alias("gini"),
    )


def spearman_correlation(
    rated: DataFrame,
    x_col: str = "x_q",
    y_col: str = "y_q",
    group_col: str = "source",
) -> DataFrame:
    """Exact-rank Spearman correlation between two numeric signals per
    group — the robust companion to the Pearson correlation_matrix:
    rank correlation answers "is signal B just a monotone proxy for
    signal A?" without being dragged by outliers or nonlinearity,
    which is the screen run before dropping one of two quality scores.

    Spearman = Pearson on midranks.  Midranks come from per-signal
    (group, value) HISTOGRAMS with cumulative counts (the x123
    discipline — doubled midranks, exact BIGINTs, windows over
    distinct quantized values only), joined back on the well-spread
    (group, value) key.  Rank sums have the closed form n(n+1), so
    the means are exact; the three second moments are computed on
    [0,1]-normalized midranks with per-doc products trunc-quantized
    to nano-units (BIGINT), making the sums order-independent and
    overflow-proof to ~9e9 docs per group (raw midrank product sums
    overflow BIGINT at ~1.3e6).  Degenerate constant signals report
    NULL.  Input contract: x/y pre-quantized BIGINTs.

    The narrow (group, x, y) projection is PERSISTED — it feeds both
    histograms, the totals, and the join-back, so without the persist
    the corpus scan would run four times (the BM25 narrow-frame
    discipline)."""
    from pyspark.sql import Window

    from ..cache import tracked_persist

    rated = tracked_persist(rated.select(group_col, x_col, y_col))

    def midrank2(col: str, out: str) -> DataFrame:
        hist = rated.groupBy(group_col, col).agg(
            F.count("*").cast("long").alias("cnt")
        )
        w = Window.partitionBy(group_col).orderBy(col)
        cum = F.sum("cnt").over(w)
        return hist.select(
            group_col,
            col,
            (F.lit(2) * cum - F.col("cnt") + F.lit(1)).cast("long").alias(out),
        )

    tot = rated.groupBy(group_col).agg(F.count("*").cast("long").alias("n_docs"))
    joined = (
        rated.join(midrank2(x_col, "r2x"), [group_col, x_col])
        .join(midrank2(y_col, "r2y"), [group_col, y_col])
        .join(F.broadcast(tot), group_col)
    )
    nd = F.col("n_docs").cast("double")
    ux = F.col("r2x").cast("double") / (F.lit(2.0) * nd)
    uy = F.col("r2y").cast("double") / (F.lit(2.0) * nd)
    giga = F.lit(1e9)
    per = joined.select(
        group_col,
        "n_docs",
        (ux * ux * giga).cast("long").alias("qxx"),
        (uy * uy * giga).cast("long").alias("qyy"),
        (ux * uy * giga).cast("long").alias("qxy"),
    ).groupBy(group_col).agg(
        F.max("n_docs").alias("n_docs"),
        F.sum("qxx").cast("long").alias("sxx"),
        F.sum("qyy").cast("long").alias("syy"),
        F.sum("qxy").cast("long").alias("sxy"),
    )
    nd2 = F.col("n_docs").cast("double")
    # mean normalized midrank is exactly (n+1)/(2n) for BOTH signals
    mean_u = (nd2 + F.lit(1.0)) / (F.lit(2.0) * nd2)
    exx = F.col("sxx").cast("double") / (F.lit(1e9) * nd2) - mean_u * mean_u
    eyy = F.col("syy").cast("double") / (F.lit(1e9) * nd2) - mean_u * mean_u
    exy = F.col("sxy").cast("double") / (F.lit(1e9) * nd2) - mean_u * mean_u
    rho = exy / F.sqrt(exx * eyy)
    return per.select(
        group_col,
        "n_docs",
        F.when(
            (exx > 0) & (eyy > 0),
            F.round(rho + F.lit(1e-9), 6) + F.lit(0.0),
        ).alias("spearman_rho"),
    )


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    crit: float | None = None,
) -> DataFrame:
    """Chi-squared test of independence between two categorical
    columns, with Cramer's V effect size — the profiling screen for
    'is this metadata balanced across that one?' (language across
    sources, label across shards): a significant dependence means
    per-source models see skewed label mixes and sampling by one
    column silently biases the other.

    ONE corpus scan into the r x c contingency table; margins and the
    statistic run on the tiny aggregate (persisted — it feeds the two
    margins and the cell output).  Per-cell (O-E)^2/E terms are
    trunc-quantized to micro-units BEFORE the cross-cell sum (house
    float discipline).  ``crit=None`` (the default) derives the 0.05
    critical value from the table's ACTUAL dof: exact quantiles for
    dof 1 and 2 (where the cube approximation is 2.5% / 0.9%
    anti-conservative), Wilson-Hilferty above (within 0.1% of exact
    for dof >= 3; 21.03 at 12 dof vs the exact 21.026) — a fixed
    default would be the wrong quantile for every other table shape.
    Pass an explicit ``crit`` to pin a textbook value.
    Output: one row per observed cell carrying its counts plus the
    shared chi2 / dof / Cramer's V / verdict."""
    from ..cache import tracked_persist

    cells = tracked_persist(
        df.groupBy(
            F.col(row_col).cast("string").alias("rv"),
            F.col(col_col).cast("string").alias("cv"),
        ).agg(F.count("*").cast("long").alias("n_obs"))
    )
    rmarg = cells.groupBy("rv").agg(F.sum("n_obs").cast("long").alias("n_row"))
    cmarg = cells.groupBy("cv").agg(F.sum("n_obs").cast("long").alias("n_col"))
    tot = cells.agg(
        F.sum("n_obs").cast("long").alias("n_total"),
        F.countDistinct("rv").cast("long").alias("n_r"),
        F.countDistinct("cv").cast("long").alias("n_c"),
    )
    # the statistic runs over the FULL r x c grid — zero cells carry
    # (0-E)^2/E = E and omitting them (a groupBy sees observed cells
    # only) understates chi2 exactly when dependence is strongest
    grid = rmarg.crossJoin(F.broadcast(cmarg))
    wide = (
        grid.join(cells, ["rv", "cv"], "left")
        .select(
            "rv",
            "cv",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            "n_row",
            "n_col",
        )
        .crossJoin(F.broadcast(tot))
    )
    expected = (
        F.col("n_row").cast("double")
        * F.col("n_col").cast("double")
        / F.col("n_total").cast("double")
    )
    o = F.col("n_obs").cast("double")
    termq = (((o - expected) * (o - expected) / expected) * F.lit(1e6)).cast("long")
    per_cell = wide.select(
        "rv", "cv", "n_obs", "n_row", "n_col", "n_total", "n_r", "n_c",
        (F.round(expected + F.lit(1e-9), 4) + F.lit(0.0)).alias("expected"),
        termq.alias("termq"),
    )
    stat = per_cell.groupBy("n_total", "n_r", "n_c").agg(
        F.sum("termq").cast("long").alias("chiq")
    )
    chi2 = F.col("chiq").cast("double") / F.lit(1e6)
    dof = (F.col("n_r") - 1) * (F.col("n_c") - 1)
    if crit is not None:
        crit_col = F.lit(float(crit))
    else:
        # Wilson-Hilferty: chi2_{0.95}(k) ~ k*(1 - 2/(9k) + z_.95*sqrt(2/(9k)))^3
        # — accurate to <0.1% for dof >= 3, but ~2.5% anti-conservative
        # at dof 1 (3.747 vs the exact 3.841) and ~0.9% at dof 2, so the
        # two small dofs get their exact quantiles pinned
        k = dof.cast("double")
        z95 = F.lit(1.6448536269514722)
        crit_col = (
            F.when(dof == 1, F.lit(3.841458820694124))
            .when(dof == 2, F.lit(5.991464547107979))
            .when(
                dof >= 3,
                k
                * F.pow(
                    F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * k)
                    + z95 * F.sqrt(F.lit(2.0) / (F.lit(9.0) * k)),
                    F.lit(3.0),
                ),
            )
        )  # dof == 0 (single row or column level): no test, NULL verdict
    v = F.sqrt(
        chi2
        / (
            F.col("n_total").cast("double")
            * F.least(F.col("n_r"), F.col("n_c")).cast("double")
            - F.col("n_total").cast("double")
        )
    )
    shared = stat.select(
        "n_total",
        (F.round(chi2 + F.lit(1e-9), 4) + F.lit(0.0)).alias("chi2"),
        dof.cast("long").alias("dof"),
        (F.round(v + F.lit(1e-9), 6) + F.lit(0.0)).alias("cramers_v"),
        (chi2 > crit_col).alias("dependent"),
    )
    return (
        per_cell.select("rv", "cv", "n_obs", "expected", "n_total")
        .join(F.broadcast(shared), "n_total")
        .select(
            F.col("rv").alias(row_col),
            F.col("cv").alias(col_col),
            "n_obs",
            "expected",
            "chi2",
            "dof",
            "cramers_v",
            "dependent",
        )
    )


def ols2_fit(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_col: str,
    y_scale: float = 1.0,
    x1_scale: float = 1.0,
    x2_scale: float = 1.0,
) -> DataFrame:
    """Closed-form two-regressor OLS per group — in-database linear
    modeling from ONE scan: all nine second-order moments accumulate
    as a single combinable aggregate (never an iterative solver, never
    a driver-side matrix), then the 2x2 normal equations solve in
    closed form.  The workhorse for 'which cheap signals explain this
    KPI?' regressions at 100 TB: the scan is the whole cost and it is
    map-side combinable.

    Float discipline: inputs are divided by caller-chosen scales that
    bring them to O(1) (coefficients are reported back in NATURAL
    units), and every per-row product is trunc-quantized to 1e-8 units
    in BIGINT before summing — order-independent across partitions and
    engines; sums stay in-range through ~1e8 rows per group for O(10)
    scaled magnitudes (pick bigger scales for bigger groups).
    Groups with a singular design (collinear or constant regressors)
    report NULL coefficients."""
    q = F.lit(1e8)
    ys = F.col(y_col).cast("double") / F.lit(y_scale)
    x1 = F.col(x1_col).cast("double") / F.lit(x1_scale)
    x2 = F.col(x2_col).cast("double") / F.lit(x2_scale)
    rows = df.select(
        F.col(group_col).alias("grp"),
        (x1 * q).cast("long").alias("q1"),
        (x2 * q).cast("long").alias("q2"),
        (ys * q).cast("long").alias("qy"),
        (x1 * x1 * q).cast("long").alias("q11"),
        (x2 * x2 * q).cast("long").alias("q22"),
        (x1 * x2 * q).cast("long").alias("q12"),
        (x1 * ys * q).cast("long").alias("q1y"),
        (x2 * ys * q).cast("long").alias("q2y"),
        (ys * ys * q).cast("long").alias("qyy"),
    )
    per = rows.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q1").cast("long").alias("s1"),
        F.sum("q2").cast("long").alias("s2"),
        F.sum("qy").cast("long").alias("sy"),
        F.sum("q11").cast("long").alias("s11"),
        F.sum("q22").cast("long").alias("s22"),
        F.sum("q12").cast("long").alias("s12"),
        F.sum("q1y").cast("long").alias("s1y"),
        F.sum("q2y").cast("long").alias("s2y"),
        F.sum("qyy").cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    dq = F.lit(1e8)
    s1 = F.col("s1").cast("double") / dq
    s2 = F.col("s2").cast("double") / dq
    sy = F.col("sy").cast("double") / dq
    s11 = F.col("s11").cast("double") / dq
    s22 = F.col("s22").cast("double") / dq
    s12 = F.col("s12").cast("double") / dq
    s1y = F.col("s1y").cast("double") / dq
    s2y = F.col("s2y").cast("double") / dq
    syy = F.col("syy").cast("double") / dq
    c11 = s11 - s1 * s1 / nd
    c22 = s22 - s2 * s2 / nd
    c12 = s12 - s1 * s2 / nd
    c1y = s1y - s1 * sy / nd
    c2y = s2y - s2 * sy / nd
    cyy = syy - sy * sy / nd
    det = c11 * c22 - c12 * c12
    b1s = (c22 * c1y - c12 * c2y) / det
    b2s = (c11 * c2y - c12 * c1y) / det
    b0s = (sy - b1s * s1 - b2s * s2) / nd
    r2 = (b1s * c1y + b2s * c2y) / cyy
    # back to natural units: y = Sy*b0s + (Sy/S1)*b1s*x1 + (Sy/S2)*b2s*x2
    ok = (F.col("n") >= 3) & (det > F.lit(1e-12))
    return per.select(
        F.col("grp").alias(group_col),
        "n",
        F.when(
            ok, F.round(b0s * F.lit(y_scale) + F.lit(1e-9), 4) + F.lit(0.0)
        ).alias("b0"),
        F.when(
            ok,
            F.round(b1s * F.lit(y_scale / x1_scale) + F.lit(1e-9), 4) + F.lit(0.0),
        ).alias("b1"),
        F.when(
            ok,
            F.round(b2s * F.lit(y_scale / x2_scale) + F.lit(1e-9), 4) + F.lit(0.0),
        ).alias("b2"),
        F.when(
            ok & (cyy > 0), F.round(r2 + F.lit(1e-9), 6) + F.lit(0.0)
        ).alias("r_squared"),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    ks: tuple[int, ...] = (2, 5, 10, 25),
) -> DataFrame:
    """K-anonymity / l-diversity audit of a release projection: group
    rows into equivalence classes over the quasi-identifier columns,
    then report, for each anonymity threshold ``k``, how many classes
    and rows fall below it (re-identifiable under linkage attack) and
    the worst l-diversity (distinct sensitive values) among those
    at-risk classes — the privacy screen a corpus release runs next to
    x33's PII redaction (redaction removes direct identifiers; this
    measures what the REMAINING quasi-identifiers still leak).

    One scan -> QI-class aggregate (bounded by QI cardinality, not row
    count); the per-k report is an explode over a literal array on
    that tiny frame.  Output: one row per k with exact BIGINT counts.
    """
    # ONE scan into the QI-class frame; the per-k walk is shared with
    # the streaming privacy view (k_anonymity_from_classes)
    classes = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("cls_n"),
        F.countDistinct(sensitive_col).cast("long").alias("l_div"),
    )
    return k_anonymity_from_classes(classes, ks)


def k_anonymity_from_classes(
    classes: DataFrame, ks: tuple[int, ...] = (2, 5, 10, 25)
) -> DataFrame:
    """The per-threshold k-anonymity report from an already-built
    equivalence-class frame ``(..., cls_n, l_div)`` — the shared walk
    behind the batch audit (x160, classes from one corpus scan) and
    the streaming privacy view (classes folded from per-batch count
    partials).  The class frame is bounded by QI cardinality, so it is
    persisted here for its two consumers (totals + per-k report)."""
    from ..cache import tracked_persist

    classes = tracked_persist(classes)
    tot = classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("cls_n").cast("long").alias("n_rows"),
    )
    per_k = (
        classes.select(
            "cls_n",
            "l_div",
            F.explode(F.array(*[F.lit(k) for k in ks])).alias("k"),
        )
        .filter(F.col("cls_n") < F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_risky_classes"),
            F.sum("cls_n").cast("long").alias("n_risky_rows"),
            F.min("l_div").cast("long").alias("min_l_div_at_risk"),
        )
    )
    # keep zero-risk thresholds in the report (left join from the k list)
    k_frame = classes.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in ks])).alias("k")
    )
    out = (
        k_frame.join(per_k, "k", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            "n_classes",
            "n_rows",
            F.coalesce(F.col("n_risky_classes"), F.lit(0)).cast("long").alias(
                "n_risky_classes"
            ),
            F.coalesce(F.col("n_risky_rows"), F.lit(0)).cast("long").alias(
                "n_risky_rows"
            ),
            "min_l_div_at_risk",
        )
    )
    return out.withColumn(
        "risky_row_frac",
        F.round(
            F.col("n_risky_rows").cast("double") / F.col("n_rows").cast("double")
            + F.lit(1e-9),
            6,
        )
        + F.lit(0.0),
    )


def welch_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Welch's unequal-variance t-test plus Cohen's d between every
    group pair on an INTEGER-valued metric — "is source A's length /
    token-count distribution actually different from source B's, and
    by how much" — the pairwise effect-size companion to x144's chi2
    independence and x139's KS drift (those test association/shape;
    this quantifies mean shift with a magnitude readers can act on).

    One scan -> per-group (n, sum, sum-of-squares) BIGINT moments
    (exact for integer metrics — no float-summation order issues), so
    the |G|^2/2 pair join runs on a |G|-row frame.  ``z_flag`` uses
    the normal approximation of the t reference (documented: exact at
    the corpus's per-group n >> 30).  Non-integer metrics should be
    pre-quantized by the caller (house discipline)."""
    v = F.col(value_col).cast("long")
    per = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(v).cast("long").alias("sv"),
        F.sum(v * v).cast("long").alias("svv"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sv").cast("double") / nd
    # sample variance (ddof=1) from exact BIGINT moments
    var = (F.col("svv").cast("double") - F.col("sv").cast("double") * mean) / (
        nd - F.lit(1.0)
    )
    from ..cache import tracked_persist

    # ONE scan: the |G|-row moment frame feeds both sides of the pair
    # join from cache
    stats = tracked_persist(
        per.select(
            "g", "n", mean.alias("m"), F.greatest(var, F.lit(0.0)).alias("s2")
        )
    )
    a = stats.select(
        F.col("g").alias("group_a"),
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
        F.col("s2").alias("s2_a"),
    )
    b = stats.select(
        F.col("g").alias("group_b"),
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
        F.col("s2").alias("s2_b"),
    )
    pairs = a.crossJoin(F.broadcast(b)).where(F.col("group_a") < F.col("group_b"))
    va_n = F.col("s2_a") / F.col("n_a").cast("double")
    vb_n = F.col("s2_b") / F.col("n_b").cast("double")
    se2 = va_n + vb_n
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2 + F.lit(1e-300))
    dfree = (se2 * se2) / (
        va_n * va_n / (F.col("n_a").cast("double") - F.lit(1.0))
        + vb_n * vb_n / (F.col("n_b").cast("double") - F.lit(1.0))
        + F.lit(1e-300)
    )
    pooled = (
        (F.col("n_a").cast("double") - F.lit(1.0)) * F.col("s2_a")
        + (F.col("n_b").cast("double") - F.lit(1.0)) * F.col("s2_b")
    ) / (F.col("n_a").cast("double") + F.col("n_b").cast("double") - F.lit(2.0))
    d = (F.col("m_a") - F.col("m_b")) / F.sqrt(pooled + F.lit(1e-300))
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        (F.round(t + F.lit(1e-9), 4) + F.lit(0.0)).alias("t_stat"),
        (F.round(dfree + F.lit(1e-9), 2) + F.lit(0.0)).alias("welch_df"),
        (F.round(d + F.lit(1e-9), 4) + F.lit(0.0)).alias("cohens_d"),
        (F.abs(t) > F.lit(1.96)).alias("z_flag"),
    )


def tokenizer_fertility(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-efficiency report per language (or any grouping): how
    many sub-word tokens the BPE-ish pre-tokenizer spends per
    whitespace word (FERTILITY — the standard 'is the tokenizer fair
    to this language' number: high-fertility languages pay more
    sequence length per sentence, skewing both cost and effective
    context), plus bytes per token and characters per word — the
    budgeting inputs next to x12's per-doc counts and x30's mixture
    weights.

    ONE corpus scan into a |groups|-row combinable aggregate of exact
    BIGINT sums; the three ratios divide those sums (corpus-level
    fertility, not a mean of per-doc ratios — short docs don't get
    up-weighted)."""
    from .text import bpe_regex_token_count, token_count

    t = F.col(text_col)
    per = docs.select(
        F.col(group_col).alias("grp"),
        token_count(t).alias("ws"),
        bpe_regex_token_count(t).alias("bpe"),
        F.octet_length(t).cast("long").alias("bytes"),
        F.length(t).cast("long").alias("chars"),
    )
    g = per.groupBy(F.col("grp").alias(group_col)).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("n_words"),
        F.sum("bpe").cast("long").alias("n_tokens"),
        F.sum("bytes").cast("long").alias("n_bytes"),
        F.sum("chars").cast("long").alias("n_chars"),
    )

    def ratio(num, den):
        return (
            F.round(
                F.col(num).cast("double") / F.col(den).cast("double")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        )

    return g.select(
        group_col,
        "n_docs",
        "n_words",
        "n_tokens",
        "n_bytes",
        ratio("n_tokens", "n_words").alias("fertility"),
        ratio("n_bytes", "n_tokens").alias("bytes_per_token"),
        ratio("n_chars", "n_words").alias("chars_per_word"),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: tuple[int, ...] = (100_000, 200_000, 300_000),
) -> DataFrame:
    """T-closeness audit — the third leg of the privacy triad after
    k-anonymity and l-diversity (x160): even a large, diverse
    equivalence class leaks when its SENSITIVE-value distribution
    diverges from the corpus-wide one (a class that is 90% one source
    against a uniform global tells an attacker the source with 90%
    confidence regardless of class size).  Distance is total variation
    0.5 * sum_v |p_class(v) - p_global(v)|; a class violates at
    threshold t when its distance exceeds t.

    Exact arithmetic: the TVD numerator sum_v |c_v*N - g_v*n_cls| is
    computed over DECIMAL(18,0) operand products (exact DECIMAL(38,0)
    sums, order-independent — the x158 ACF widening discipline);
    absent sensitive values contribute (N - sum_present g_v) * n_cls
    in closed form, so the (QI-class x sensitive) cell frame is the
    only state — bounded by cardinality, never rows.  The single
    float op is the final division, rounded to 6 before both the
    report and the threshold comparison, so the verdicts are
    engine-exact.

    Output: one row per t — (t, n_classes, n_classes_over,
    n_rows_over, max_tvd).

    Implementation: the projection reduces to (QI..., sensitive, cv)
    count cells in one scan, then delegates to
    ``t_closeness_from_cells`` — the same entry point the streaming
    privacy store feeds (streaming/sinks.t_closeness_view; the store
    maintained by make_privacy_sink IS this cell frame), so the
    continuous view is bit-equal to this operator by construction."""
    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").cast("long").alias("cv")
    )
    return t_closeness_from_cells(cells, quasi_cols, sensitive_col, t_ppm)


def t_closeness_from_cells(
    cells: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: tuple[int, ...] = (100_000, 200_000, 300_000),
) -> DataFrame:
    """``t_closeness_audit`` over a pre-aggregated (QI..., sensitive,
    cv) count-cell frame — the shared core of the batch audit and the
    streaming view (whose maintained state is exactly these
    sum-mergeable cells).  The global sensitive distribution is
    derived from the cells themselves (sums commute with the
    cell partials), so the two entry points are value-identical."""
    from ..cache import tracked_persist

    d18 = "decimal(18,0)"
    glob = cells.groupBy(sensitive_col).agg(
        F.sum("cv").cast("long").alias("gv")
    )
    n_total = glob.agg(F.sum("gv").cast("long").alias("n_tot"))
    # per class: present-value numerator parts + present global mass
    per_cell = (
        cells.join(F.broadcast(glob), sensitive_col)
        .groupBy(*quasi_cols)
        .agg(
            F.sum("cv").cast("long").alias("cls_n"),
            F.sum("gv").cast("long").alias("g_present"),
            F.collect_list(F.struct("cv", "gv")).alias("pairs"),
        )
    )
    num_present = F.aggregate(
        F.col("pairs"),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, p: acc
        + F.abs(
            p["cv"].cast(d18) * F.col("n_tot").cast(d18)
            - p["gv"].cast(d18) * F.col("cls_n").cast(d18)
        ).cast("decimal(38,0)"),
    )
    tvd = (
        F.round(
            (
                num_present
                + (F.col("n_tot") - F.col("g_present")).cast(d18)
                * F.col("cls_n").cast(d18)
            ).cast("double")
            / (
                F.lit(2.0)
                * F.col("cls_n").cast("double")
                * F.col("n_tot").cast("double")
            )
            + F.lit(1e-9),
            6,
        )
        + F.lit(0.0)
    )
    classes = tracked_persist(
        per_cell.crossJoin(F.broadcast(n_total)).select(
            F.col("cls_n"), tvd.alias("tvd")
        )
    )
    ts = cells.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(t)) for t in t_ppm])).alias("tp")
    )
    return (
        classes.crossJoin(F.broadcast(ts))
        .groupBy("tp")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum((F.col("tvd") > F.col("tp") / F.lit(1e6)).cast("long"))
            .cast("long")
            .alias("n_classes_over"),
            F.sum(
                F.when(F.col("tvd") > F.col("tp") / F.lit(1e6), F.col("cls_n"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_rows_over"),
            F.max("tvd").alias("max_tvd"),
        )
        .select(
            (F.col("tp").cast("double") / F.lit(1e6)).alias("t"),
            "n_classes",
            "n_classes_over",
            "n_rows_over",
            "max_tvd",
        )
    )
