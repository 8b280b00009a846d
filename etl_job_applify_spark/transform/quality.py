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


def exact_grouped_median(
    df: DataFrame,
    key: str,
    val,
    out: str = "median",
) -> DataFrame:
    """(key, out): the EXACT per-group median of ``val`` (a column name
    or Column) — lower/upper middle averaged with one deterministic
    double division for even counts, so the value is engine-portable
    (``approx_percentile`` sketches are not, and their error is the
    wrong trade for a FILTER threshold). One window rank + one
    aggregate per group; the window partitions by the group key, so
    there is no global sort."""
    from pyspark.sql import Window

    v = F.col(val) if isinstance(val, str) else val
    proj = df.select(F.col(key), v.alias("__v"))
    w = Window.partitionBy(key).orderBy("__v")
    ranked = proj.select(
        key,
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(key)).alias("__n"),
    )
    # integer div: lower and upper middle (equal when the count is odd)
    mid = ranked.filter(
        (F.col("__rn") == F.expr("(__n + 1) div 2"))
        | (F.col("__rn") == F.expr("(__n + 2) div 2"))
    )
    return mid.groupBy(key).agg(
        (
            F.sum(F.col("__v").cast("double"))
            / F.count("*").cast("double")
        ).alias(out)
    )


def robust_outliers(
    df: DataFrame,
    key: str,
    val: str,
    id_col: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier flags via the modified z-score
    (Iglewicz–Hoaglin): z = 0.6745 · (x − median) / MAD, flagged when
    |z| > ``z_threshold`` — the curation-pipeline filter for
    length/score anomalies that mean/stddev would let a heavy tail
    drag (median and MAD have a 50% breakdown point; stddev has 0).
    Returns the FLAGGED rows (id_col, key, val, med, mad, z). Groups
    whose MAD is 0 (at least half the values identical) flag nothing —
    the standard convention; both medians are EXACT
    (``exact_grouped_median``), so the flag set is engine-portable
    (every arithmetic step is deterministic IEEE)."""
    med = exact_grouped_median(df, key, val, out="med")
    with_med = df.select(id_col, key, val).join(med, key)
    mad = exact_grouped_median(
        with_med,
        key,
        F.abs(F.col(val).cast("double") - F.col("med")),
        out="mad",
    )
    z = (
        F.lit(0.6745)
        * (F.col(val).cast("double") - F.col("med"))
        / F.col("mad")
    )
    return (
        with_med.join(mad, key)
        .filter(F.col("mad") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > z_threshold)
        .select(id_col, key, val, "med", "mad", "z")
    )
