"""Reusable operator builders — the engine's public operator API."""

from . import (  # noqa: F401
    curation,
    dedup,
    joins,
    multimodal,
    profile,
    retrieval,
    similarity,
    sketches,
    skew,
    text,
)
from .curation import (  # noqa: F401
    chunk_documents,
    decontaminate,
    length_outlier_trim,
    pack_sequences,
    quality_yield_curve,
    repetition_stats,
    split_summary,
    stratified_sample,
    with_split,
)
from .dedup import (  # noqa: F401
    connected_components,
    edit_distance_pairs,
    exact_dedup_groups,
    incremental_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_neardup_pairs,
    verify_candidate_pairs,
)
from .joins import asof_join  # noqa: F401
from .retrieval import bm25_topk, inverted_index  # noqa: F401
from .profile import profile as profile_table  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_cosine_topk,
)
from .sketches import hll_rollup, hll_sketch_by  # noqa: F401
from .skew import skew_join, two_phase_topk, two_stage_distinct_count  # noqa: F401
from .text import (  # noqa: F401
    bpe_regex_token_count,
    canonical_url,
    lang_id,
    quality_score,
    rolling_fingerprint,
    tfidf_top_terms,
    token_count,
    winnow_fingerprints,
)
