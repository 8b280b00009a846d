"""Incremental aggregate maintenance (materialized-rollup refresh).

The warehouse pattern the reference's upsert sink implies but never
reaches: a rollup table (group keys → additive states) kept current by
folding in ONLY new data, never rescanning the fact table. Works for any
decomposable aggregate — here SUM (exact DECIMAL state) and COUNT, with
AVG derived at read time as sum/n (deriving, not storing, is what keeps
every stored state mergeable).

At 100 TB this is the difference between a rollup refresh that reads one
day's partition and one that reads three years of facts: merge cost is
O(|rollup| + |increment|), independent of history size. The same
mergeable-state design extends to the sketch family (q99's HLL union,
q102's theta sketches) — counts/sums are just the exact special case.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DECIMAL(28,6) sum state — exact and associative, so merge order (and
#: therefore partitioning/parallelism) can never change the result
_STATE_T = "decimal(28,6)"


def aggregate_increment(
    new_rows: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, str],
) -> DataFrame:
    """Collapse raw rows to rollup state: one row per key group with
    ``<m>_sum`` (exact decimal) per measure and ``n_rows``."""
    aggs = [
        F.sum(F.expr(expr).cast(_STATE_T)).alias(f"{name}_sum")
        for name, expr in measures.items()
    ]
    return new_rows.groupBy(*keys).agg(
        *aggs, F.count(F.lit(1)).alias("n_rows")
    )


def merge_rollup(
    existing: DataFrame | None,
    increment: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, str],
) -> DataFrame:
    """Fold an aggregated increment into the rollup: union + re-group.

    SUM-of-sums and SUM-of-counts are the merge functions; because the
    sum states are DECIMAL, a rollup built from daily increments is
    bit-identical to one built from a full recompute, in any order.
    """
    sum_cols = [f"{name}_sum" for name in measures] + ["n_rows"]
    if existing is None:
        return increment
    return (
        existing.unionByName(increment)
        .groupBy(*keys)
        .agg(*[F.sum(c).cast(_STATE_T if c != "n_rows" else "bigint")
               .alias(c) for c in sum_cols])
    )


def changes_increment(
    changes: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, str],
) -> DataFrame:
    """Signed rollup increment from a change data feed
    (sinks/changes.py): insert/update_postimage contribute +1, delete/
    update_preimage contribute −1, so an update's net effect on the
    group is (new − old) and a row that moves BETWEEN groups debits one
    and credits the other. Folding the result with ``merge_rollup``
    advances a materialized rollup from version N to M touching only the
    delta — updates and deletes included, which append-only increments
    (``aggregate_increment``) cannot express.

    Groups whose ``n_rows`` reaches 0 after a fold carry zeroed state;
    ``prune_empty_groups`` drops them.
    """
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    aggs = [
        F.sum(
            (F.expr(expr).cast(_STATE_T) * sign).cast(_STATE_T)
        ).alias(f"{name}_sum")
        for name, expr in measures.items()
    ]
    return changes.groupBy(*keys).agg(
        *aggs, F.sum(sign).cast("bigint").alias("n_rows")
    )


def prune_empty_groups(rollup: DataFrame) -> DataFrame:
    """Drop groups whose membership fell to zero (their sums are exact
    zeros by construction — DECIMAL state, no float residue)."""
    return rollup.filter(F.col("n_rows") > 0)


def rollup_readout(rollup: DataFrame, measures: Mapping[str, str]) -> DataFrame:
    """Derive the user-facing view: DOUBLE sums and averages from the
    exact states (the only place floating point appears)."""
    cols = list(rollup.columns)
    out = rollup
    for name in measures:
        out = out.withColumn(
            f"{name}_total", F.col(f"{name}_sum").cast("double")
        ).withColumn(
            f"{name}_avg",
            F.col(f"{name}_sum").cast("double") / F.col("n_rows"),
        )
    return out.drop(*[c for c in cols if c.endswith("_sum")])
