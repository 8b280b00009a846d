from .topk import top_k_per_group
from .asof import asof_join
from .sessionize import sessionize
from .range_join import range_join

__all__ = ["top_k_per_group", "asof_join", "sessionize", "range_join"]
