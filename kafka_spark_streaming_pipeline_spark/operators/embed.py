"""Model-free text embeddings via the hashing trick.

The similarity/semantic-dedup tier consumes an ``array<float>``
embedding column; in environments with no model weights (or as the
cheap first tier before a learned embedder), FEATURE-HASHING
embeddings are the standard stand-in: each token hashes to a
dimension and a sign, occurrences sum, and the vector L2-normalizes.
Sparse random projections of the bag-of-words — Johnson-Lindenstrauss
style — so cosine similarity approximates token-overlap similarity,
which is exactly what near-dup detection needs.  Deterministic
(md5-derived hashes, no RNG), so the DuckDB oracle reproduces every
component bit-for-bit and re-runs are stable.

Scale shape: one token explode -> one (doc, dim) partial-sum
aggregate (map-side combinable, keys well-spread) -> one per-doc
fold into the dense array.  No joins, no corpus self-interaction;
composes directly with cosine_topk / semantic_dedup /
embedding_neardup_pairs / the IVF tier.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import hash60, let_expr, tokens


def hash_embeddings(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """(id, embedding array<double>, n_tokens): L2-normalized
    feature-hashing embedding of the token bag.  Components are
    rounded AFTER normalization (house +1e-9 nudge) so the oracle
    matches; an all-cancelled (zero) vector stays all-zero instead of
    dividing by zero."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    comp = (
        toks.select(
            F.col(id_col),
            (hash60(F.col("tok"), salt="embdim|") % dim).cast("int").alias("d"),
            (hash60(F.col("tok"), salt="embsign|") % 2 * 2 - 1)
            .cast("double")
            .alias("s"),
        )
        .groupBy(id_col, "d")
        .agg(F.sum("s").alias("v"), F.count("*").alias("n"))
    )
    folded = comp.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("d", "v"))).alias("m"),
        F.sum("n").cast("long").alias("n_tokens"),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(F.try_element_at(F.col("m"), d), F.lit(0.0)),
    )
    # let-bind dense, then the norm (text.let_expr): without the
    # bindings the generated expression re-inlines the dim-lookup
    # `dense` for EVERY component and the norm for every division —
    # O(dim^2) map probes per row instead of O(dim)
    normalized = let_expr(
        dense,
        lambda dn: let_expr(
            F.sqrt(F.aggregate(dn, F.lit(0.0), lambda acc, x: acc + x * x)),
            lambda nr: F.transform(
                dn,
                lambda x: F.round(
                    F.when(nr > 0, x / nr).otherwise(F.lit(0.0)) + F.lit(1e-9),
                    decimals,
                ),
            ),
        ),
    )
    return folded.select(
        F.col(id_col), normalized.alias("embedding"), "n_tokens"
    )


def top_principal_component(
    emb,
    n_iter: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-8,
    moment_dim_cap: int = 256,
    stats: dict | None = None,
    portable: bool = False,
):
    """Dominant principal component of the (mean-centered) embedding
    matrix — scan count chosen by dimensionality.

    MODERATE dim (<= ``moment_dim_cap``, the common embedding case):
    ONE corpus scan computes every first+second moment — each row
    emits its flattened upper-triangle outer product (plus the vector
    and a count slot) through posexplode + groupBy(pos), so partial
    aggregation collapses each partition to dim(dim+3)/2+1 rows
    before the shuffle and NO wide codegen is generated.  The driver
    then assembles the dim x dim covariance (dim^2 floats — KBs) and
    runs the power iteration locally: every subsequent round is free.
    At 100 TB this turns 12 corpus passes into one.

    LARGE dim (outer-product work O(dim^2)/row would dominate the
    scan): classic distributed power iteration — each round is ONE
    map-side-combinable aggregate where every row contributes
    ((x-mu)·v)·(x-mu) with the current direction riding in as a
    broadcast single-row relation (values stay OUT of the generated
    source, so codegen compiles once and is cache-hit every round).

    Both paths are deterministic (all-ones start, no RNG) and share
    the convergence EARLY-EXIT: iteration stops once the direction
    moves less than ``tol`` in max-norm (sign-aligned, so the ±v
    oscillation of a negative-dominant spectrum counts as converged);
    ``n_iter`` is the cap, not the count.

    Returns (mu, pc, eigenvalue_estimate) as plain Python lists/float.
    Pass ``stats={}`` to get {"rounds": k, "path": "moment"|"scan"}
    recorded (observability for the early-exit)."""
    from pyspark.sql import functions as F

    probe = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if probe is None:  # empty input: no direction to find
        return [], [], 0.0
    dim = probe["d"]
    v = emb.select(F.col(vec_col).cast("array<double>").alias("x"))

    def _iterate(matvec, mu, n):
        """Shared power-iteration driver loop over a z = C·v oracle."""
        # math.sqrt, not ** 0.5: sqrt is IEEE-correctly-rounded, pow is
        # not guaranteed to be — the x80 oracle replays this loop in SQL
        vec = [1.0 / math.sqrt(dim)] * dim
        eig = 0.0
        for rnd in range(n_iter):
            if stats is not None:
                stats["rounds"] = rnd + 1
            z = matvec(mu, vec)
            norm = math.sqrt(sum(c * c for c in z))
            if norm == 0:
                break
            eig = norm / n  # Rayleigh estimate: ||C v|| with unit v
            new_vec = [c / norm for c in z]
            # sign-align before the delta test: with a dominant
            # NEGATIVE eigenvalue the iterate flips sign every round
            # while the eigenspace is fully converged
            dot = sum(a * b for a, b in zip(new_vec, vec))
            sgn = -1.0 if dot < 0 else 1.0
            delta = max(abs(a - sgn * b) for a, b in zip(new_vec, vec))
            vec = new_vec
            if delta < tol:
                break
        return mu, vec, eig

    if stats is not None:
        stats["path"] = "moment" if dim <= moment_dim_cap else "scan"
    if portable and dim > moment_dim_cap:
        raise ValueError(
            "portable mode pins the one-scan moment path; "
            f"dim {dim} exceeds moment_dim_cap {moment_dim_cap}"
        )
    if dim <= moment_dim_cap:
        # one-scan moment pass: pos 0 -> count, pos 1..dim -> sums,
        # pos dim+1.. -> row-major upper-triangle sum(x_i * x_j)
        tri = F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.transform(
                    F.sequence(i, F.lit(dim)),
                    lambda j: F.element_at("x", i.cast("int"))
                    * F.element_at("x", j.cast("int")),
                ),
            )
        )
        arr = F.concat(F.array(F.lit(1.0)), F.col("x"), tri)
        exploded = v.select(F.posexplode(arr).alias("pos", "val"))
        if portable:
            # x15/x62 determinism kit: quantize each moment term to a
            # BIGINT (1e-6 resolution) so the cross-partition sum is
            # exact and order-independent — with the moments
            # bit-identical, the driver's power iteration is pure
            # deterministic scalar math that a SQL oracle can replay
            # round for round (x80).  At this quantization the
            # direction perturbation is ~1e-6 x dim / eigengap.
            agg = F.sum((F.col("val") * 1_000_000).cast("long")).alias("s")
            rows = exploded.groupBy("pos").agg(agg).collect()
            m = {r["pos"]: r["s"] / 1_000_000.0 for r in rows}
        else:
            rows = exploded.groupBy("pos").agg(F.sum("val").alias("s")).collect()
            m = {r["pos"]: r["s"] for r in rows}
        n = int(m[0])
        if n == 0:
            return [], [], 0.0
        mu = [m[1 + i] / n for i in range(dim)]
        # covariance C = P/n - mu mu^T from the upper triangle
        cov = [[0.0] * dim for _ in range(dim)]
        pos = 1 + dim
        for i in range(dim):
            for j in range(i, dim):
                c = m[pos] / n - mu[i] * mu[j]
                cov[i][j] = c
                cov[j][i] = c
                pos += 1

        def matvec(mu_, vec):
            # n * C v, matching the distributed path's z = sum c (c·v)
            return [n * sum(cov[i][j] * vec[j] for j in range(dim)) for i in range(dim)]

        return _iterate(matvec, mu, n)

    # large-dim fallback: one combinable aggregate per round
    spark = emb.sparkSession
    mu_row = v.agg(
        F.count("*").alias("n"),
        *[F.avg(F.element_at("x", i + 1)).alias(f"m{i}") for i in range(dim)],
    ).first()
    mu = [mu_row[f"m{i}"] for i in range(dim)]
    n = mu_row["n"]
    if n == 0:
        return [], [], 0.0

    def matvec_dist(mu_, vec):
        param = F.broadcast(
            spark.createDataFrame([(mu_, vec)], "mu: array<double>, v: array<double>")
        )
        centered = F.zip_with("x", "mu", lambda a, b: a - b)
        s = F.aggregate(
            F.zip_with(centered, F.col("v"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        contrib = v.crossJoin(param).select(centered.alias("c"), s.alias("s"))
        z_row = contrib.agg(
            *[
                F.sum(F.element_at("c", i + 1) * F.col("s")).alias(f"z{i}")
                for i in range(dim)
            ]
        ).first()
        return [z_row[f"z{i}"] for i in range(dim)]

    return _iterate(matvec_dist, mu, n)


def all_but_the_top(
    emb,
    n_iter: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
):
    """All-but-the-top embedding postprocess (Mu & Viswanath 2018):
    mean-center every vector and remove its projection onto the
    corpus's dominant principal component — the standard fix for the
    anisotropy that makes raw embedding cosines saturate.  The PC
    comes from the power iteration above (driver holds dim floats);
    the correction itself is a map-only projection, so the full pass
    over 100 TB of vectors is one scan with two broadcast literals.

    Output: (id, processed array, removed-component magnitude)."""
    from pyspark.sql import functions as F

    mu, pc, _ = top_principal_component(emb, n_iter, id_col, vec_col, portable=portable)
    if not pc:  # empty input: empty output with the right schema
        return emb.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("processed"),
            F.lit(0.0).alias("removed_magnitude"),
        ).limit(0)
    mu_lit = F.array(*[F.lit(m) for m in mu])
    pc_lit = F.array(*[F.lit(c) for c in pc])
    centered = F.zip_with(F.col(vec_col).cast("array<double>"), mu_lit, lambda a, b: a - b)
    proj = F.aggregate(
        F.zip_with(centered, pc_lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )
    bound = emb.select(F.col(id_col), centered.alias("c"), proj.alias("p"))
    return bound.select(
        id_col,
        F.zip_with("c", pc_lit, lambda c, pcv: c - F.col("p") * pcv).alias("processed"),
        F.round(F.abs(F.col("p")) + F.lit(1e-9), 6).alias("removed_magnitude"),
    )


def centroid_drift(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "label",
    vec_col: str = "embedding",
    min_cosine: float = 0.98,
    max_norm_delta: float = 0.1,
) -> DataFrame:
    """Embedding-space drift between two corpus snapshots, per key:
    did a source/label's semantic center move between crawls (encoder
    re-run, content shift, pipeline bug)?

    Per key and side the centroid is computed with the portable
    exact-BIGINT kit: every coordinate quantized to trunc(val*1000)
    BIGINTs whose sum is order-independent (float summation order is
    the classic cross-run nondeterminism), reconstructed with exactly
    two IEEE divisions; per-row L2 norms quantize at 1e-4 the same
    way.  One union scan -> one (key, side, dim) aggregate (k x d
    rows) -> one k-row report; nothing about the corpus size survives
    the first aggregate, so the op is a single bounded shuffle at any
    scale.

    Returns per key: member counts, centroid cosine between sides
    (4-dp), mean-norm per side and delta (4-dp), and a ``drift`` flag
    (cosine below ``min_cosine`` or |norm delta| above
    ``max_norm_delta``)."""
    from .similarity import _as_double, _dot, cosine

    def side(df: DataFrame, tag: int) -> DataFrame:
        v = _as_double(F.col(vec_col))
        # double->BIGINT cast truncates toward zero in Spark (DuckDB
        # mirrors it with trunc() before the cast — x06 convention)
        return df.select(
            F.col(key_col).alias("key"),
            F.lit(tag).alias("side"),
            v.alias("v"),
            (F.sqrt(_dot(v, v)) * 10000).cast("long").alias("normq"),
        )

    both = side(old, 0).unionByName(side(new, 1))
    by_dim = (
        both.select(
            "key", "side", "normq", F.posexplode("v").alias("dim", "val")
        )
        .withColumn("valq", (F.col("val") * 1000).cast("long"))
        .groupBy("key", "side", "dim")
        .agg(
            F.sum("valq").alias("sumq"),
            F.count("*").alias("n"),
            F.sum(F.when(F.col("dim") == 0, F.col("normq"))).alias("normq_sum"),
        )
    )
    per_side = (
        by_dim.groupBy("key", "side")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "sumq"))).alias("ds"),
            F.first("n").alias("n"),
            F.max("normq_sum").alias("normq_sum"),
        )
        .select(
            "key",
            "side",
            "n",
            F.transform(
                "ds", lambda s: s["sumq"] / F.lit(1000.0) / F.col("n")
            ).alias("centroid"),
            (F.col("normq_sum") / F.lit(10000.0) / F.col("n")).alias("mean_norm"),
        )
    )
    o = per_side.filter(F.col("side") == 0).select(
        F.col("key"), F.col("n").alias("n_old"),
        F.col("centroid").alias("c_old"), F.col("mean_norm").alias("norm_old"),
    )
    n = per_side.filter(F.col("side") == 1).select(
        F.col("key"), F.col("n").alias("n_new"),
        F.col("centroid").alias("c_new"), F.col("mean_norm").alias("norm_new"),
    )
    cos = F.round(cosine(F.col("c_old"), F.col("c_new")) + F.lit(1e-9), 4)
    rounded_delta = F.round(
        F.col("norm_new") - F.col("norm_old") + F.lit(1e-9), 4
    )
    return (
        o.join(n, "key", "outer")
        .select(
            F.col("key").alias(key_col),
            "n_old",
            "n_new",
            (cos + F.lit(0.0)).alias("centroid_cos"),
            (F.round(F.col("norm_old") + F.lit(1e-9), 4) + F.lit(0.0)).alias(
                "mean_norm_old"
            ),
            (F.round(F.col("norm_new") + F.lit(1e-9), 4) + F.lit(0.0)).alias(
                "mean_norm_new"
            ),
            (rounded_delta + F.lit(0.0)).alias("norm_delta"),
            (
                (cos < F.lit(min_cosine))
                | (F.abs(rounded_delta) > F.lit(max_norm_delta))
            ).alias("drift"),
        )
    )


def embedding_health(
    emb: DataFrame,
    vec_col: str = "embedding",
    near_zero: float = 0.01,
) -> DataFrame:
    """Per-dimension embedding health report: mean, std, and the
    fraction of near-zero activations per dimension — the 'is this
    embedding space alive' screen that catches dead dimensions
    (collapsed autoencoder units, over-aggressive quantization) and
    mean-offset anisotropy (the common-direction disease x80
    removes) BEFORE a similarity index is built on the space.

    One posexplode into a (dim)-keyed combinable aggregate; moment
    terms are trunc-quantized BIGINT (1e-8 units — sums safe through
    ~1e9 vectors/dim for O(10) activations).  ``is_dead`` flags
    dimensions whose std collapses or whose activations are almost
    all near zero."""
    q = F.lit(1e8)
    rows = emb.select(
        F.posexplode(F.col(vec_col).cast("array<double>"))
    ).select(
        (F.col("pos") + 1).alias("dim"),
        (F.col("col") * q).cast("long").alias("qv"),
        (F.col("col") * F.col("col") * q).cast("long").alias("qvv"),
        (F.abs(F.col("col")) < F.lit(near_zero)).cast("long").alias("nz"),
    )
    per = rows.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("qv").cast("long").alias("sv"),
        F.sum("qvv").cast("long").alias("svv"),
        F.sum("nz").cast("long").alias("n_near_zero"),
    )
    return embedding_health_from_moments(per)


def embedding_health_from_moments(per: DataFrame) -> DataFrame:
    """The health report from an already-built per-dimension moment
    frame ``(dim, n, sv, svv, n_near_zero)`` — shared by the batch
    operator (moments from one posexplode) and the streaming embedding
    monitor (moments folded from per-batch sum-mergeable partials), so
    both produce bit-identical reports for the same vectors."""
    nd = F.col("n").cast("double")
    mean = F.col("sv").cast("double") / F.lit(1e8) / nd
    var = F.col("svv").cast("double") / F.lit(1e8) / nd - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    nzf = F.col("n_near_zero").cast("double") / nd
    return per.select(
        "dim",
        "n",
        (F.round(mean + F.lit(1e-9), 6) + F.lit(0.0)).alias("mean"),
        (F.round(std + F.lit(1e-9), 6) + F.lit(0.0)).alias("std"),
        (F.round(nzf + F.lit(1e-9), 6) + F.lit(0.0)).alias("near_zero_frac"),
        ((std < F.lit(1e-4)) | (nzf > F.lit(0.99))).alias("is_dead"),
    )


def fisher_separation(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Fisher discriminant ratio between every label pair:
    J = sum over dims of (mu_a - mu_b)^2 / (var_a + var_b + eps) —
    the closed-form 'are these classes separable in this space'
    score that ranks label pairs by how much the embedding actually
    distinguishes them (a retrieval/classification-readiness check
    that needs no model training).

    One posexplode into a (label, dim) moment aggregate (labels x
    dims rows); the pair join and the per-dim term sum run on that
    tiny frame.  Per-dim terms are trunc-quantized BIGINT before the
    cross-dim sum (house float discipline)."""
    q = F.lit(1e8)
    rows = emb.select(
        F.col(label_col).alias("lbl"),
        F.posexplode(F.col(vec_col).cast("array<double>")),
    ).select(
        "lbl",
        (F.col("pos") + 1).alias("dim"),
        (F.col("col") * q).cast("long").alias("qv"),
        (F.col("col") * F.col("col") * q).cast("long").alias("qvv"),
    )
    per = rows.groupBy("lbl", "dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("qv").cast("long").alias("sv"),
        F.sum("qvv").cast("long").alias("svv"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sv").cast("double") / F.lit(1e8) / nd
    var = F.col("svv").cast("double") / F.lit(1e8) / nd - mean * mean
    stats = per.select(
        "lbl", "dim", F.col("n").alias("n_vec"), mean.alias("mu"), var.alias("vr")
    )
    a = stats.select(
        F.col("lbl").alias("label_a"),
        "dim",
        F.col("n_vec").alias("n_a"),
        F.col("mu").alias("mu_a"),
        F.col("vr").alias("vr_a"),
    )
    b = stats.select(
        F.col("lbl").alias("label_b"),
        "dim",
        F.col("n_vec").alias("n_b"),
        F.col("mu").alias("mu_b"),
        F.col("vr").alias("vr_b"),
    )
    pairs = a.join(b, "dim").where(F.col("label_a") < F.col("label_b"))
    # a zero-variance separated dim is 'infinitely' discriminative —
    # cap its term so the quantized cross-dim sum can never overflow
    # (cap * 1e9 * n_dims stays far under BIGINT)
    term = F.least(
        (F.col("mu_a") - F.col("mu_b"))
        * (F.col("mu_a") - F.col("mu_b"))
        / (F.col("vr_a") + F.col("vr_b") + F.lit(1e-9)),
        F.lit(1e6),
    )
    out = pairs.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        (term * F.lit(1e9)).cast("long").alias("tq"),
    ).groupBy("label_a", "label_b", "n_a", "n_b").agg(
        F.sum("tq").cast("long").alias("jq")
    )
    return out.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        (
            F.round(F.col("jq").cast("double") / F.lit(1e9) + F.lit(1e-9), 4)
            + F.lit(0.0)
        ).alias("fisher_j"),
    )


def int8_quantize_audit(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scalar int8 quantization fidelity audit — the 4x-memory
    compression tier BELOW product quantization (x62 trades recall for
    64x; this trades almost nothing for 4x): each vector is encoded as
    round-half-up codes floor(x / scale * 127 + 0.5) against its own
    max-abs scale, and the audit reports how faithful the dequantized
    copy is — the go/no-go check before serving ANN from int8.

    Per vector: the scale, cosine(v, dequant(v)) (the scale cancels,
    so it is computed dot(v,c)/(|v||c|) directly on the integer
    codes), and the max absolute elementwise reconstruction error.
    Zero-vectors (scale 0) report NULL fidelity/error.

    Scale shape: map-only — one scan, per-row array folds, zero
    exchanges (the x88/x33 class).  Every binding is let-bound so the
    O(dim) subexpressions evaluate once per row, not O(dim^2)
    (let_expr discipline, operators/text.py)."""
    from .similarity import _dot
    from .text import let_expr as _let

    def per_vec(v: Column) -> Column:
        def with_scale(scale: Column) -> Column:
            codes_d = F.transform(
                v, lambda x: F.floor(x / scale * 127.0 + F.lit(0.5)).cast("double")
            )

            def with_codes(cd: Column) -> Column:
                cos = F.round(
                    _dot(v, cd) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(cd, cd)))
                    + F.lit(1e-9),
                    4,
                ) + F.lit(0.0)
                err = F.round(
                    F.array_max(
                        F.zip_with(
                            v, cd, lambda a, c: F.abs(a - c * scale / F.lit(127.0))
                        )
                    )
                    + F.lit(1e-9),
                    6,
                ) + F.lit(0.0)
                return F.struct(
                    (F.round(scale + F.lit(1e-9), 6) + F.lit(0.0)).alias("scale"),
                    cos.alias("cos_fidelity"),
                    err.alias("max_abs_err"),
                )

            return F.when(scale > 0, _let(codes_d, with_codes)).otherwise(
                F.struct(
                    F.lit(0.0).alias("scale"),
                    F.lit(None).cast("double").alias("cos_fidelity"),
                    F.lit(None).cast("double").alias("max_abs_err"),
                )
            )

        return _let(F.array_max(F.transform(v, F.abs)), with_scale)

    return emb.select(
        F.col(id_col),
        per_vec(F.col(vec_col).cast("array<double>")).alias("__a"),
    ).select(
        id_col,
        F.col("__a.scale").alias("scale"),
        F.col("__a.cos_fidelity").alias("cos_fidelity"),
        F.col("__a.max_abs_err").alias("max_abs_err"),
    )
