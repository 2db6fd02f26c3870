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
):
    """Dominant principal component of the (mean-centered) embedding
    matrix via distributed power iteration.

    Each round is ONE map-side-combinable aggregate: with the current
    direction v broadcast as a literal, every row contributes
    ((x-mu)·v)·(x-mu), whose per-dimension sums are dim sum() columns —
    no posexplode, no shuffle of vectors, no driver-side matrix.  The
    driver holds only the dim-float direction between rounds (the same
    bounded-driver-state pattern as k-means/BPE).  Deterministic: the
    start direction is the all-ones unit vector, no RNG.

    Returns (mu, pc, eigenvalue_estimate) as plain Python lists/float.
    """
    from pyspark.sql import functions as F

    probe = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if probe is None:  # empty input: no direction to find
        return [], [], 0.0
    dim = probe["d"]
    v = emb.select(F.col(vec_col).cast("array<double>").alias("x"))
    mu_row = v.agg(
        *[F.avg(F.element_at("x", i + 1)).alias(f"m{i}") for i in range(dim)]
    ).first()
    mu = [mu_row[f"m{i}"] for i in range(dim)]

    vec = [1.0 / dim ** 0.5] * dim
    eig = 0.0
    n = v.count()
    for _ in range(n_iter):
        mu_lit = F.array(*[F.lit(m) for m in mu])
        v_lit = F.array(*[F.lit(c) for c in vec])
        centered = F.zip_with("x", mu_lit, lambda a, b: a - b)
        s = F.aggregate(
            F.zip_with(centered, v_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        contrib = v.select(centered.alias("c"), s.alias("s"))
        z_row = contrib.agg(
            *[
                F.sum(F.element_at("c", i + 1) * F.col("s")).alias(f"z{i}")
                for i in range(dim)
            ]
        ).first()
        z = [z_row[f"z{i}"] for i in range(dim)]
        norm = sum(c * c for c in z) ** 0.5
        if norm == 0:
            break
        eig = norm / n  # Rayleigh estimate: ||C v|| with unit v
        vec = [c / norm for c in z]
    return mu, vec, eig


def all_but_the_top(
    emb,
    n_iter: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
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

    mu, pc, _ = top_principal_component(emb, n_iter, id_col, vec_col)
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
