from .brute import cosine_topk
from .ivf import ann_topk_ivf, build_ivf_index, query_ivf_index
from .lsh import with_hyperplane_buckets, ann_topk_lsh
from .pq import (
    ann_topk_ivfpq,
    ann_topk_pq,
    pq_encode_expr,
    train_pq_codebooks,
    train_residual_quantizer,
)
from .vector_index import (
    optimize_vector_index,
    vacuum_vector_index,
    reindex_vector_index,
    vector_index_apply_cdc,
    vector_index_build,
    vector_index_cell_histogram,
    vector_index_delete,
    vector_index_knn_join,
    vector_index_probe,
    vector_index_stats,
)

__all__ = [
    "vector_index_apply_cdc",
    "vector_index_build",
    "vector_index_probe",
    "vector_index_knn_join",
    "vector_index_delete",
    "optimize_vector_index",
    "reindex_vector_index",
    "vector_index_stats",
    "vector_index_cell_histogram",
    "vacuum_vector_index",
    "train_residual_quantizer",
    "cosine_topk",
    "with_hyperplane_buckets",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "build_ivf_index",
    "query_ivf_index",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "pq_encode_expr",
    "train_pq_codebooks",
]
