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

from .text import hash60, tokens


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
    norm = F.sqrt(
        F.aggregate(dense, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    normalized = F.transform(
        dense,
        lambda x: F.round(
            F.when(norm > 0, x / norm).otherwise(F.lit(0.0)) + F.lit(1e-9),
            decimals,
        ),
    )
    return folded.select(
        F.col(id_col), normalized.alias("embedding"), "n_tokens"
    )
