from .brute import cosine_topk
from .lsh import with_hyperplane_buckets, ann_topk_lsh

__all__ = ["cosine_topk", "with_hyperplane_buckets", "ann_topk_lsh"]
