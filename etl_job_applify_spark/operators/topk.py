"""Grouped top-k (SURVEY §2b: sorts/limits/top-k — ABSENT in reference).

``row_number`` over a per-group window: one shuffle on the group keys, sort
within partition only. At scale this beats a global ``orderBy`` + driver
filter by never materializing a total order; AQE handles skewed groups.
Always include a deterministic tiebreaker in ``order_by`` — ties otherwise
make the survivor run-dependent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``k`` rows of each group under ``order_by``.

    ``rank_col``: optionally keep the 1-based rank as a column.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")
