from .brute import cosine_topk
from .ivf import ann_topk_ivf
from .lsh import with_hyperplane_buckets, ann_topk_lsh

__all__ = [
    "cosine_topk",
    "with_hyperplane_buckets",
    "ann_topk_lsh",
    "ann_topk_ivf",
]
