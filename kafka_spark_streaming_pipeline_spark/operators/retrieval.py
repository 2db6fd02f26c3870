"""Retrieval operators: inverted index construction and BM25 scoring.

A training-data pipeline needs retrieval both for curation (find all
documents containing a term, rank near-matches of an eval query for
decontamination review) and for building retrieval-augmented training
sets.  Reference parity: the reference app has no search surface at
all (spark_job/spark_streaming.py consumes a fixed stream), so these
operators are part of the training-data extension tier, not §2.

Scale design:
- ``inverted_index`` is ONE explode + ONE grouped aggregation — the
  classic map/combine build.  Posting lists are per-term arrays whose
  length is the term's document frequency; the ``max_postings`` cap
  bounds the array for stopword-like terms EXPLICITLY (df stays exact,
  the stored list truncates, ``postings_truncated`` flags it) so one
  hot term cannot blow an executor.
- ``bm25_topk`` never touches documents that share no term with the
  query: tokens are filtered to the (tiny, broadcast) query-term set
  before any shuffle, so cost is O(matching postings), not O(corpus).
  Both global scalars (N, avgdl) ride along as broadcast single rows.

Everything is built-in column expressions — no Python UDFs — and is
mirrored 1:1 by a DuckDB oracle in plans/extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .text import tokens


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 3,
    max_postings: int | None = None,
) -> DataFrame:
    """(term, df, postings) with postings the sorted doc-id list.

    ``df`` counts ALL documents containing the term even when
    ``max_postings`` truncates the stored list (slice happens after the
    full aggregation, which is just an array op on the reduced row)."""
    term_docs = (
        docs.select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
        )
        .filter(F.length("term") >= min_token_len)
    )
    idx = term_docs.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_sort(F.collect_list(id_col)).alias("postings"),
    )
    if max_postings is not None:
        idx = idx.select(
            "term",
            "df",
            F.slice("postings", 1, max_postings).alias("postings"),
            (F.col("df") > max_postings).alias("postings_truncated"),
        )
    return idx


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Top-k documents for ``query_terms`` under BM25.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term contribution
    uses the standard length normalization (dl / avgdl).  The score is
    rounded BEFORE ranking (with the house +1e-9 nudge) so tie order
    is engine-independent; final tiebreak is doc id."""
    terms = [t.lower() for t in query_terms]
    dl = docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    qtok = tok.filter(F.col("term").isin(terms))
    tf = qtok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1) / norm

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(contrib) + F.lit(1e-9), 6).alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    w = W.orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(id_col, "score", "n_terms_matched", "rank")
    )
