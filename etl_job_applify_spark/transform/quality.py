"""Declarative data-quality checks: Deequ-style constraints as one scan.

AWS Deequ / Great Expectations distilled to the part that matters at
100 TB: a rule list compiles to a SINGLE aggregate pass (every metric is
an algebraic aggregate, so one scan computes all of them map-side), and
the result is a row per rule — (rule, column, metric, passed) — that a
pipeline gates on before publishing a snapshot. Contrast the naive
approach of one action per rule: a 20-rule suite on a 100 TB table must
not cost 20 scans.

Rule vocabulary (each a dict, declarative like the schema contract):

- ``{"type": "completeness", "column": c, "min": 0.99}`` — non-null
  fraction ≥ min;
- ``{"type": "uniqueness", "column": c, "min": 1.0}`` — distinct/total
  ≥ min (1.0 = primary-key check);
- ``{"type": "bounds", "column": c, "lo": x, "hi": y}`` — fraction of
  non-null values inside [lo, hi]; passes iff it is 1.0 (every value in
  range), the metric reports the compliant fraction;
- ``{"type": "pattern", "column": c, "regex": r, "min": f}`` — fraction
  of non-null values matching an RE2-compatible regex;
- ``{"type": "member", "column": c, "allowed": [...], "min": f}`` —
  fraction of non-null values in the allowed set.

The quarantine path (contract.apply_with_quarantine) answers "which
rows are bad"; this answers "is the dataset publishable" — the two
halves of the quality story.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _metric_expr(rule: dict) -> tuple[F.Column, float]:
    """(metric column, pass threshold) for one rule."""
    c = rule["column"]
    t = rule["type"]
    nn = F.count(F.col(c))  # non-null count
    if t == "completeness":
        return nn / F.count(F.lit(1)), float(rule.get("min", 1.0))
    if t == "uniqueness":
        return F.countDistinct(F.col(c)) / nn, float(rule.get("min", 1.0))
    if t == "bounds":
        ok = F.sum(
            F.col(c).between(rule["lo"], rule["hi"]).cast("long")
        )
        return ok / nn, float(rule.get("min", 1.0))
    if t == "pattern":
        ok = F.sum(F.col(c).rlike(rule["regex"]).cast("long"))
        return ok / nn, float(rule.get("min", 1.0))
    if t == "member":
        ok = F.sum(F.col(c).isin(list(rule["allowed"])).cast("long"))
        return ok / nn, float(rule.get("min", 1.0))
    raise ValueError(f"unknown rule type {t!r}")


def check_rules(df: DataFrame, rules: Sequence[dict]) -> DataFrame:
    """One row per rule: (rule, column, metric, passed).

    All metrics ride ONE aggregate (one scan, map-side partials); the
    single result row is exploded to rule rows via ``stack`` — still
    zero extra passes. Empty input: completeness metrics are 0.0 (an
    empty table is 100% missing), value-fraction metrics are NULL and
    the rule fails (no evidence ≠ pass).
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs, metas = [], []
    for i, rule in enumerate(rules):
        metric, threshold = _metric_expr(rule)
        aggs.append(metric.cast("double").alias(f"__m{i}"))
        metas.append((f"{rule['type']}({rule['column']})", rule["column"],
                      threshold))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', '{col}', __m{i}, CAST({thr} AS DOUBLE)"
        for i, (name, col, thr) in enumerate(metas)
    )
    return one.select(
        F.expr(
            f"stack({len(metas)}, {stack_args}) AS (rule, column, metric,"
            " threshold)"
        )
    ).select(
        "rule",
        "column",
        "metric",
        F.coalesce(F.col("metric") >= F.col("threshold"), F.lit(False)).alias(
            "passed"
        ),
    )


def assert_rules(df: DataFrame, rules: Sequence[dict]) -> None:
    """Gate form: raise with every failing rule's metric if any rule
    fails — the call a pipeline makes between compute and publish."""
    failed = [
        (r["rule"], r["metric"])
        for r in check_rules(df, rules).collect()
        if not r["passed"]
    ]
    if failed:
        detail = ", ".join(f"{name}={m}" for name, m in failed)
        raise ValueError(f"data-quality gate failed: {detail}")
