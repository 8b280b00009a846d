from .shingles import with_shingles, with_tokens
from .jaccard import ngram_jaccard_pairs
from .minhash import minhash_lsh_pairs
from .simhash import simhash_fingerprints, simhash_near_pairs
from .embedding import embedding_near_dup_pairs
from .incremental import (
    minhash_index_build,
    minhash_index_probe,
    optimize_index,
)
from .semantic import assign_clusters, semantic_dedup_kept
from .spans import shared_span_pairs

__all__ = [
    "with_shingles",
    "with_tokens",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "embedding_near_dup_pairs",
    "minhash_index_build",
    "minhash_index_probe",
    "optimize_index",
    "assign_clusters",
    "semantic_dedup_kept",
    "shared_span_pairs",
]
