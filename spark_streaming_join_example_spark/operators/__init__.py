from .graph import bfs_hops, connected_components, connected_components_star, kcore
from .joins import asof_join
from .similarity import as_double_array, cosine, cosine_topk_pairs, dot
from .dedup import (
    banded_signatures,
    distinct_tokens,
    exact_jaccard_verify,
    jaccard,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    prefix_filter_jaccard_pairs,
    shingles,
)

__all__ = [
    "asof_join",
    "bfs_hops",
    "connected_components",
    "connected_components_star",
    "kcore",
    "as_double_array",
    "cosine",
    "cosine_topk_pairs",
    "dot",
    "banded_signatures",
    "distinct_tokens",
    "exact_jaccard_verify",
    "jaccard",
    "minhash_near_duplicates",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "prefix_filter_jaccard_pairs",
    "shingles",
]
