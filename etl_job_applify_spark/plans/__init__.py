from .explain import explain_str, pushed_filters, has_broadcast_join, shuffle_count
from .lint import Finding, lint_errors, lint_plan

__all__ = ["explain_str", "pushed_filters", "has_broadcast_join", "shuffle_count",
           "Finding", "lint_plan", "lint_errors"]
