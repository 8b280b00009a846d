from .brute import cosine_topk
from .ivf import ann_topk_ivf, build_ivf_index, query_ivf_index
from .lsh import with_hyperplane_buckets, ann_topk_lsh
from .pq import ann_topk_ivfpq, ann_topk_pq, pq_encode_expr, train_pq_codebooks

__all__ = [
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
