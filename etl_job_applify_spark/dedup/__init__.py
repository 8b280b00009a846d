from .shingles import with_shingles, with_tokens
from .jaccard import ngram_jaccard_pairs, prefix_filtered_jaccard_pairs
from .minhash import minhash_lsh_pairs
from .simhash import simhash_fingerprints, simhash_near_pairs
from .embedding import embedding_near_dup_pairs
from .incremental import (
    is_versioned_index,
    minhash_index_build,
    minhash_index_apply_cdc,
    minhash_index_delete,
    minhash_index_probe,
    minhash_index_stats,
    optimize_index,
    vacuum_minhash_index,
    versioned_index_append,
    versioned_index_has_epoch,
)
from .semantic import assign_clusters, semantic_dedup_kept
from .spans import shared_span_pairs

__all__ = [
    "with_shingles",
    "with_tokens",
    "ngram_jaccard_pairs",
    "prefix_filtered_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "embedding_near_dup_pairs",
    "minhash_index_build",
    "minhash_index_apply_cdc",
    "minhash_index_delete",
    "minhash_index_probe",
    "minhash_index_stats",
    "vacuum_minhash_index",
    "optimize_index",
    "is_versioned_index",
    "versioned_index_append",
    "versioned_index_has_epoch",
    "assign_clusters",
    "semantic_dedup_kept",
    "shared_span_pairs",
]
