from .topk import top_k_per_group
from .asof import asof_join
from .sessionize import sessionize
from .range_join import range_join
from .scd2 import scd2_apply, scd2_intervals
from .components import cc_update, connected_components
from .kcore import k_core, k_core_update
from .scc import strongly_connected_components
from .salting import (
    differential_salted_join,
    hot_keys,
    profile_join_keys,
    salted_agg_sum,
    salted_join,
)
from .triangles import (
    ApproxTriangleStats,
    TriangleStats,
    approx_triangle_stats,
    triangle_stats,
    TriangleCounts,
    triangle_update,
)

__all__ = [
    "top_k_per_group",
    "asof_join",
    "sessionize",
    "range_join",
    "scd2_apply",
    "scd2_intervals",
    "cc_update",
    "connected_components",
    "k_core",
    "k_core_update",
    "strongly_connected_components",
    "salted_agg_sum",
    "salted_join",
    "hot_keys",
    "differential_salted_join",
    "profile_join_keys",
    "ApproxTriangleStats",
    "TriangleStats",
    "approx_triangle_stats",
    "triangle_stats",
    "TriangleCounts",
    "triangle_update",
]
