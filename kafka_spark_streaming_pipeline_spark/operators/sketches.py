"""Mergeable sketch aggregations (Apache DataSketches via Spark 4
built-ins).

`approx_count_distinct` (used in streaming metrics) gives one number;
HLL *sketches* give a mergeable state: pre-aggregate distinct-user
sketches per (day, key) once, then answer any rollup (weekly, monthly,
all keys) by unioning sketches — no rescan of the raw data.  That is
the 100 TB pattern: the expensive pass over raw events happens once,
rollups are cheap sketch merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_by(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch of ``col`` plus its estimate.  The ``sketch``
    binary column is the mergeable state — persist it as the
    pre-aggregate."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_rows"),
    ).withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))


def hll_rollup(pre: DataFrame, keys: list[str]) -> DataFrame:
    """Roll pre-aggregated sketches up to coarser ``keys`` by sketch
    union — never touches the raw table."""
    return (
        pre.groupBy(*keys)
        .agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )


# ------------------------------------------ portable register-level HLL

# The DataSketches HLL above is the production sketch (compact binary,
# battle-tested bias correction) but its register layout is opaque, so
# its estimates can only be rows-only-checked.  This variant keeps the
# registers as ordinary (bucket, rho) rows built from the md5-based
# hash60 — every step is exact integer arithmetic except ONE division
# and one ln(), so the whole sketch INCLUDING the estimator is
# bit-reproducible in the DuckDB oracle (the same trick as the Bloom
# x63 / KMV x68 / DDSketch x76 value checks).  Same mergeability story:
# register rollup is max(rho) per bucket, a map-side-combinable agg.

HLL_P = 8  # 2^8 = 256 registers; hash60 leaves 52 bits for the rho draw

_HLL_RHO_MAX = 53  # (60 - HLL_P) leading-zero positions + 1


def _hll_rho(w):
    """Position of the first set bit (from the MSB of the 52-bit
    window) = 53 - bitlength(w); the all-zero window maps to 53.
    ``conv(w, 10, 2)`` has no leading zeros, so its length IS the bit
    length — mirrored in SQL as ``length(bin(w))``."""
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    return F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(F.lit(_HLL_RHO_MAX) - bitlen)


def hll_portable_registers(
    df: DataFrame, keys: list[str], col: str, p: int = HLL_P
) -> DataFrame:
    """Per-key HLL registers as (keys..., bucket, rho) rows: bucket =
    low ``p`` bits of hash60, rho = first-set-bit position of the high
    52 bits, max-aggregated per bucket.  ONE pass over the raw data
    (explode-free: one hash + one map-side-combinable max) — the
    expensive scan happens here, every rollup after is register math."""
    m = 1 << p
    return (
        df.select(*keys, _hash60_col(col).alias("__h"))
        .select(
            *keys,
            F.pmod(F.col("__h"), F.lit(m)).alias("bucket"),
            _hll_rho(F.shiftright(F.col("__h"), p)).alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def _hash60_col(col: str):
    from .text import hash60

    return hash60(F.col(col).cast("string"), salt="hll|")


def hll_portable_rollup(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Merge registers up to coarser ``keys``: max(rho) per bucket —
    the union of HLLs IS the element-wise register max, so rollups
    never rescan raw data and merge order is irrelevant."""
    return registers.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def hll_portable_estimate(
    registers: DataFrame, keys: list[str], p: int = HLL_P
) -> DataFrame:
    """Classic HLL estimator over register rows, kept oracle-exact:
    the harmonic sum is computed as an exact BIGINT (each register
    contributes ``2^(53 - rho)``, empty registers ``2^53``), so the
    only float ops are one division, the optional linear-counting
    ``ln``, and the 4-dp round — identical IEEE results in both
    engines.  Small-range correction: E <= 2.5m with empty registers
    falls back to linear counting ``m * ln(m / V)``."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << _HLL_RHO_MAX)
    grouped = registers.groupBy(*keys).agg(
        F.count("*").alias("__present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - rho)")
        ).alias("__scaled"),
    )
    v_zero = F.lit(m) - F.col("__present")
    denom = (F.col("__scaled") + v_zero * F.lit(1 << _HLL_RHO_MAX)).cast("double")
    raw = F.lit(alpha * m * m * scale) / denom
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return grouped.select(
        *keys,
        F.round(est + F.lit(1e-9), 4).alias("approx_distinct"),
        v_zero.cast("int").alias("v_zero"),
    )


# --------------------------------------------------- count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_slot(term, depth: int, width: int = CMS_WIDTH):
    """Deterministic slot for a term in depth row ``depth`` — the
    md5-based portable hash (operators/text.hash60) so the sketch is
    bit-identical in the SQL oracle."""
    from .text import hash60

    return hash60(term, salt=f"cms{depth}|") % width


def cms_build(
    df: DataFrame, term_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of a term column: (depth, slot, cnt) rows —
    depth*width counters TOTAL regardless of input size, built by one
    explode (term -> depth rows) + one map-side-combinable count.

    Like the HLL pre-aggregates above, the sketch is MERGEABLE: counter
    matrices from per-day / per-shard passes add cell-wise, so the raw
    scan happens once and any frequency question afterwards reads
    depth*width rows.  Estimates are biased up only (collisions add),
    never down."""
    slots = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        cms_slot(F.col(term_col), d, width).alias("slot"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("ds")
    ).select("ds.depth", "ds.slot")
    return slots.groupBy("depth", "slot").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each term's frequency from the sketch: min over
    the depth rows of the term's counter.  The sketch is depth*width
    rows — always broadcast; the term side never shuffles."""
    probes = terms.select(
        term_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        cms_slot(F.col(term_col), d, width).alias("slot"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("ds"),
    ).select(term_col, "ds.depth", "ds.slot")
    return (
        probes.join(F.broadcast(sketch), ["depth", "slot"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_estimate"))
    )


# ------------------------------------------------------- bloom filter

BLOOM_BITS = 65_536  # 2^16 bits -> ~1041 63-bit words
BLOOM_K = 4
_WORD = 63  # usable bits per BIGINT word: 1<<63 overflows DuckDB


def _bloom_bit(value, i: int, bits: int):
    from .text import hash60

    return hash60(value, salt=f"bf{i}|") % bits


def bloom_build(df: DataFrame, col: str, bits: int = BLOOM_BITS, k: int = BLOOM_K) -> DataFrame:
    """Bloom filter over a value column as (word, bits) BIGINT rows —
    at most ``bits/63`` rows TOTAL regardless of input size (63 usable
    bits per word: ``1 << 63`` overflows DuckDB's BIGINT, so the top
    bit is never used and the sketch stays oracle-portable).

    Like the count-min sketch above it is MERGEABLE — word-wise
    ``bit_or`` folds per-shard / per-day filters together — and built
    by one explode (value -> k set-bit positions) + one
    map-side-combinable ``bit_or``.  Membership has NO false negatives
    and a tunable false-positive rate ((1-e^{-kn/m})^k); at the default
    sizing the whole filter is ~8 KB — it rides a broadcast join, never
    a shuffle.  The classic use: a 100 TB corpus probes a filter built
    from a small eval/blocklist set without materializing the set on
    every executor as an equi-join build side."""
    positions = df.select(
        F.explode(
            F.array(*[_bloom_bit(F.col(col), i, bits) for i in range(k)])
        ).alias("bit")
    )
    return (
        positions.select(
            (F.col("bit") / _WORD).cast("long").alias("word"),
            (F.col("bit") % _WORD).cast("int").alias("pos"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(F.call_function("shiftleft", F.lit(1).cast("long"), F.col("pos"))).alias("bits")
        )
    )


def bloom_pack(sketch: DataFrame, bits: int = BLOOM_BITS) -> DataFrame:
    """Fold the (word, bits) rows into ONE dense array row (missing
    words -> 0) — ~8 KB at the default sizing, the broadcast-ready
    form ``bloom_probe`` consumes."""
    n_words = (bits + _WORD - 1) // _WORD
    return (
        sketch.groupBy()
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda w: F.coalesce(
                    F.element_at(F.col("m"), w.cast("long")), F.lit(0).cast("long")
                ),
            ).alias("__bloom")
        )
    )


def bloom_probe(
    packed: DataFrame,
    df: DataFrame,
    col: str,
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Append ``bloom_hit`` (1/0) to ``df``: 1 iff ALL k of the value's
    bits are set in the filter.  The packed one-row filter is
    broadcast-nested-loop attached and the test is a PURE column
    expression (k array lookups + shifts) — the probed scan never
    shuffles, never explodes, and reads only ``col``.  This is the
    whole point at 100 TB: membership against a small set costs a
    map-only pass."""
    checks = []
    for i in range(k):
        bit = _bloom_bit(F.col(col), i, bits)
        word_bits = F.element_at(F.col("__bloom"), (bit / _WORD).cast("int") + 1)
        checks.append(
            F.call_function("shiftright", word_bits, (bit % _WORD).cast("int")).bitwiseAND(F.lit(1))
        )
    hit = F.least(*checks) if k > 1 else checks[0]
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn("bloom_hit", hit.cast("int"))
        .drop("__bloom")
    )


# ------------------------------------------------- k-minimum-values

KMV_K = 64
_HASH_SPACE = float(1 << 60)  # hash60 draws uniformly from [0, 2^60)


def kmv_sketch(df: DataFrame, col, k: int = KMV_K) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al.): the ``k``
    smallest 60-bit hashes of the column's distinct values, as ONE
    sorted-array row.  TakeOrderedAndProject does the heavy lifting —
    per-partition top-k then a k-row driver merge, never a global
    sort — so the sketch costs one scan regardless of input size.

    Mergeable: the union sketch of two sets is the k smallest of the
    concatenated sketches (kmv_overlap), which is what makes distinct /
    union / intersection questions answerable from per-shard sketches
    without rescanning.  Everything is md5-derived — no RNG — so the
    sketch and every estimate from it are engine-portable and
    reproducible."""
    from .text import hash60

    h = (
        df.select(hash60(col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return h.agg(F.array_sort(F.collect_list("h")).alias("kmv"))


def _kmv_est(arr, k: int):
    """Distinct-count estimate: exact below k, else (k-1) * space /
    kth-smallest-hash."""
    n = F.size(arr)
    kth = F.element_at(arr, F.least(n, F.lit(k)))
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth.cast("double")
    )


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Set-overlap report from two KMV sketches (one-row frames from
    ``kmv_sketch``): estimated distinct counts, union estimate from
    the merged sketch, KMV Jaccard (shared fraction of the union
    sketch), and the intersection estimate jaccard * union — the
    dataset-overlap audit (did corpus B leak into corpus A?) computed
    from 2k hashes instead of the corpora."""
    ab = a.select(F.col("kmv").alias("a")).crossJoin(
        b.select(F.col("kmv").alias("b"))
    )
    un = F.slice(F.array_sort(F.array_distinct(F.concat(F.col("a"), F.col("b")))), 1, k)
    stats = ab.select(
        F.col("a"), F.col("b"), un.alias("u")
    ).select(
        F.round(_kmv_est(F.col("a"), k) + F.lit(1e-9), 2).alias("est_distinct_a"),
        F.round(_kmv_est(F.col("b"), k) + F.lit(1e-9), 2).alias("est_distinct_b"),
        F.round(_kmv_est(F.col("u"), k) + F.lit(1e-9), 2).alias("est_union"),
        F.round(
            F.size(
                F.filter(
                    F.col("u"),
                    lambda x: F.array_contains(F.col("a"), x)
                    & F.array_contains(F.col("b"), x),
                )
            )
            / F.size(F.col("u"))
            + F.lit(1e-9),
            4,
        ).alias("kmv_jaccard"),
    )
    return stats.withColumn(
        "est_intersection",
        F.round(F.col("kmv_jaccard") * F.col("est_union") + F.lit(1e-9), 2),
    )


# ---------------------------------------------- ddsketch quantiles

DD_ALPHA = 0.01


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_build(
    df: DataFrame, col, keys: list[str] | None = None, alpha: float = DD_ALPHA
) -> DataFrame:
    """DDSketch (Masson et al., VLDB'19) pre-aggregate: per-key counts
    over logarithmic buckets i = ceil(log_gamma(|x|)), gamma=(1+a)/(1-a)
    — the mergeable quantile state with a RELATIVE-error guarantee
    (any quantile off by <= alpha of its true value), which is the
    right contract for long-tailed metrics (latencies, prices) where
    rank-error sketches blur the p99 tail.

    THREE stores, as in the reference sketch: a positive log-bucket
    store, a MIRRORED negative store (sgn=-1, bucket over |x| — so the
    alpha guarantee holds for negative data too, not just silently for
    positives), and the exact-zero bucket (sgn=0).  NULLs are ignored
    (standard sketch semantics).

    One grouped count over (keys, sgn, bucket); bucket cardinality is
    log_gamma(max|x|/min|x|) per key per sign (~a few hundred for a
    10^6 dynamic range at alpha=0.01) regardless of row count — the
    100 TB pattern: scan once, persist the tiny (key, sgn, bucket,
    cnt) state, answer any quantile later without rescanning."""
    keys = keys or []
    gamma = _dd_gamma(alpha)
    import math

    v = F.col("__v")
    sgn = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    bucket = F.when(
        v != 0, F.ceil(F.log(F.abs(v)) / F.lit(math.log(gamma)))
    )  # NULL for the exact-zero bucket
    return (
        df.select(*keys, F.col(col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .select(*keys, sgn.cast("int").alias("sgn"), bucket.alias("bucket"))
        .groupBy(*keys, "sgn", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dd_merge(pre: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge DDSketch pre-aggregates (from different shards / days /
    epochs) by bucket-count addition — the merge is exact, so a merged
    sketch answers quantiles with the same alpha guarantee as one
    built in a single pass."""
    keys = keys or []
    return pre.groupBy(*keys, "sgn", "bucket").agg(F.sum("cnt").alias("cnt"))


def dd_quantiles(
    sketch: DataFrame,
    qs: list[float],
    keys: list[str] | None = None,
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Quantile estimates from a DDSketch: for each q, the value
    sgn * 2*gamma^b / (gamma+1) (log-midpoint) of the first bucket —
    in VALUE order — whose cumulative count reaches ceil(q * n).

    Value order across the three stores is (sgn ASC, sgn*bucket ASC):
    negatives sort most-negative first (mirror store: larger |bucket|
    = more negative, and sgn*bucket = -bucket flips it), then the zero
    bucket, then positives by bucket.  Per-key bucket lists are
    log-range-sized, so the window sort is over hundreds of rows per
    key, never the data.  Output: one row per (keys, q)."""
    from pyspark.sql import Window as W

    keys = keys or []
    gamma = _dd_gamma(alpha)

    # ord is integer arithmetic — exact in both engines; the zero
    # bucket (bucket NULL) gets ord 0 within sgn=0
    ordered = sketch.select(
        *keys,
        "sgn",
        "bucket",
        (F.col("sgn") * F.coalesce(F.col("bucket"), F.lit(0))).alias("ord"),
        "cnt",
    )
    w_cum = W.partitionBy(*keys).orderBy("sgn", "ord")
    w_all = W.partitionBy(*keys)
    cum = ordered.select(
        *keys,
        "sgn",
        "bucket",
        "ord",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    q_lits = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    # target rank ceil(q*n); the FIRST bucket (in value order) whose
    # cumulative count reaches it holds the quantile
    cand = cum.select(*keys, "sgn", "bucket", "ord", "cum", "total", q_lits).filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("total"))
    )
    w_pick = W.partitionBy(*keys, "q").orderBy("sgn", "ord")
    first = cand.withColumn("__rn", F.row_number().over(w_pick)).filter(
        F.col("__rn") == 1
    )
    est = F.when(
        F.col("sgn") != 0,
        F.col("sgn")
        * F.lit(2.0)
        * F.pow(F.lit(gamma), F.col("bucket"))
        / F.lit(gamma + 1.0),
    ).otherwise(F.lit(0.0))
    return first.select(*keys, "q", F.col("total").alias("n"), est.alias("estimate"))


def kmv_partial_rows(df: DataFrame, keys: list[str], col, k: int = KMV_K) -> DataFrame:
    """Per-group bottom-k distinct hash60 values as ROWS (keys..., h):
    distinct then a rank window — Spark compiles rank<=k to
    WindowGroupLimit, a partial map-side top-k BEFORE the one
    group-key exchange, so no group ever sorts more than its own
    candidate minima.  Row form is what the streaming KMV sink logs
    (bounded: |groups| x k rows per batch); ``kmv_sketch_by`` folds it
    to arrays."""
    from pyspark.sql import Window as W

    from .text import hash60

    h = df.select(*keys, hash60(col).alias("h")).distinct()
    w = W.partitionBy(*keys).orderBy("h")
    return (
        h.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_sketch_by(df: DataFrame, keys: list[str], col, k: int = KMV_K) -> DataFrame:
    """Per-group KMV sketches: kmv_partial_rows folded to one sorted
    k-array per group.  The group-wise twin of ``kmv_sketch``."""
    return (
        kmv_partial_rows(df, keys, col, k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
    )


def _kmv_pair_stats(ab: DataFrame, k: int) -> DataFrame:
    """Shared estimator block: expects columns ``a``/``b`` (sorted KMV
    arrays) plus any carry-through columns; appends the overlap
    estimates (same math as kmv_overlap)."""
    un = F.slice(F.array_sort(F.array_distinct(F.concat(F.col("a"), F.col("b")))), 1, k)
    with_u = ab.withColumn("u", un)
    carry = [c for c in ab.columns if c not in ("a", "b")]
    return with_u.select(
        *carry,
        F.round(_kmv_est(F.col("a"), k) + F.lit(1e-9), 2).alias("est_distinct_a"),
        F.round(_kmv_est(F.col("b"), k) + F.lit(1e-9), 2).alias("est_distinct_b"),
        F.round(_kmv_est(F.col("u"), k) + F.lit(1e-9), 2).alias("est_union"),
        F.round(
            F.size(
                F.filter(
                    F.col("u"),
                    lambda x: F.array_contains(F.col("a"), x)
                    & F.array_contains(F.col("b"), x),
                )
            )
            / F.size(F.col("u"))
            + F.lit(1e-9),
            4,
        ).alias("kmv_jaccard"),
    ).withColumn(
        "est_intersection",
        F.round(F.col("kmv_jaccard") * F.col("est_union") + F.lit(1e-9), 2),
    )


def kmv_overlap_matrix(sketches: DataFrame, key: str, k: int = KMV_K) -> DataFrame:
    """Pairwise content-overlap matrix across ALL groups from their
    per-group KMV sketches (kmv_sketch_by): which sources share
    material, estimated from group-count x k hashes instead of the
    corpora.  The pair expansion is groups², but groups (sources,
    crawls, shards) are vocabulary-sized by assumption — the sketch
    side is broadcast and each pair's math touches two k-arrays."""
    a = sketches.select(F.col(key).alias(f"{key}_a"), F.col("kmv").alias("a"))
    b = sketches.select(F.col(key).alias(f"{key}_b"), F.col("kmv").alias("b"))
    ab = a.join(F.broadcast(b), F.col(f"{key}_a") < F.col(f"{key}_b"))
    return _kmv_pair_stats(ab, k)


def bloom_fpr_audit(
    build: DataFrame,
    probe: DataFrame,
    col: str,
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Empirical false-positive-rate audit of the Bloom filter: build
    on one value set, probe a second, and measure the observed FPR
    among TRUE NEGATIVES against the theoretical (1 - e^{-kn/m})^k —
    plus the no-false-negative invariant (missed members MUST be 0).
    The 'can I trust this filter at this sizing' report run before a
    100 TB corpus screens against it.

    Both value sets reduce to DISTINCT values first (persisted — the
    build side feeds the filter, the membership join, and the count);
    the probe pass is the same broadcast map-only scan as production
    ``bloom_probe``.  Output: ONE row of exact counts + the two rates
    (observed composed from exact BIGINTs, theoretical from fixed
    literals — both engines bit-agree)."""
    from ..cache import tracked_persist

    b = tracked_persist(build.select(F.col(col).alias("v")).distinct())
    p = probe.select(F.col(col).alias("v")).distinct()
    flagged = p.join(b.withColumn("m", F.lit(1)), "v", "left").select(
        "v", F.coalesce("m", F.lit(0)).alias("member")
    )
    packed = bloom_pack(bloom_build(b, "v", bits, k), bits)
    probed = bloom_probe(packed, flagged, "v", bits, k)
    n_ins = b.agg(F.count("*").cast("long").alias("n_inserted"))
    per = probed.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum("member").cast("long").alias("n_members"),
        F.sum(
            (F.lit(1) - F.col("member")) * F.col("bloom_hit")
        ).cast("long").alias("n_false_pos"),
        F.sum(
            F.col("member") * (F.lit(1) - F.col("bloom_hit"))
        ).cast("long").alias("n_missed_members"),
    ).crossJoin(F.broadcast(n_ins))
    tn = (F.col("n_probes") - F.col("n_members")).cast("double")
    fpr = F.col("n_false_pos").cast("double") / tn
    theo = F.pow(
        F.lit(1.0)
        - F.exp(
            F.lit(-float(k)) * F.col("n_inserted").cast("double") / F.lit(float(bits))
        ),
        F.lit(float(k)),
    )
    return per.select(
        "n_inserted",
        "n_probes",
        "n_members",
        (F.col("n_probes") - F.col("n_members")).alias("n_true_neg"),
        "n_false_pos",
        "n_missed_members",
        F.when(tn > 0, F.round(fpr + F.lit(1e-9), 6) + F.lit(0.0)).alias(
            "observed_fpr"
        ),
        (F.round(theo + F.lit(1e-9), 6) + F.lit(0.0)).alias("theoretical_fpr"),
    )
