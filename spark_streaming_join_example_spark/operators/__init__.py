from .graph import bfs_hops, connected_components, connected_components_star, kcore
from .joins import asof_join
from .similarity import as_double_array, cosine, cosine_topk_pairs, dot
from .dedup import distinct_tokens, jaccard, minhash_signatures, lsh_candidate_pairs, shingles

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
    "distinct_tokens",
    "jaccard",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "shingles",
]
