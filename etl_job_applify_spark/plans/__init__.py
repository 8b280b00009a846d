from .explain import explain_str, pushed_filters, has_broadcast_join, shuffle_count

__all__ = ["explain_str", "pushed_filters", "has_broadcast_join", "shuffle_count"]
