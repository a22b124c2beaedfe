from .asof import asof_fill, asof_join
from .bucketing import bucketed_join, write_bucketed
from .dedup import (
    NonConvergenceError,
    affine_params,
    assign_components,
    connected_components,
    connected_components_large_star,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    portable_hash60,
    simhash,
    simhash_near_duplicates,
)
from .dims import build_dim, build_dim_incremental, mint_surrogate_ids, null_safe_join, resolve_fk
from .fill import forward_fill, forward_fill_expr
from .merge import apply_cdc, latest_changes
from .materialize import MATERIALIZE_MODE_CONF, materialize
from .multimodal import decode_and_featurize, payload_metadata, sample_frames, with_payload
from .sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
    hash_topk_per_group,
    mixture_sample,
    pack_token_bins,
    stratified_hash_sample,
)
from .text_analysis import chunk_windows, redact_pii
from .similarity import (
    cosine_topk_bruteforce,
    embedding_neardup_pairs,
    embedding_neardup_pairs_matrix,
    ivf_topk,
    kmeans_centroids,
    lsh_bucket_topk,
    semantic_dedup,
)
from .skew import salted_agg, skew_safe_count_distinct

__all__ = [
    "MATERIALIZE_MODE_CONF",
    "NonConvergenceError",
    "materialize",
    "asof_fill",
    "asof_join",
    "bucketed_join",
    "write_bucketed",
    "affine_params",
    "assign_components",
    "connected_components",
    "connected_components_large_star",
    "portable_hash60",
    "hash_bucket",
    "hash_sample",
    "hash_split",
    "hash_topk_per_group",
    "pack_token_bins",
    "stratified_hash_sample",
    "chunk_windows",
    "redact_pii",
    "exact_dedup",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_duplicates",
    "build_dim",
    "build_dim_incremental",
    "mint_surrogate_ids",
    "null_safe_join",
    "resolve_fk",
    "forward_fill",
    "forward_fill_expr",
    "decode_and_featurize",
    "payload_metadata",
    "sample_frames",
    "with_payload",
    "cosine_topk_bruteforce",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_matrix",
    "ivf_topk",
    "kmeans_centroids",
    "lsh_bucket_topk",
    "semantic_dedup",
    "apply_cdc",
    "latest_changes",
    "mixture_sample",
    "salted_agg",
    "skew_safe_count_distinct",
]
