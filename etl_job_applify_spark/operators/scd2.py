"""SCD2 (slowly-changing-dimension type 2) interval construction.

Turns a change-event stream (key, ts, attrs) into validity intervals:
``valid_from = ts``, ``valid_to = next change's ts`` (null = current row).
One window per key — single shuffle+sort, the same cost as any windowed
op; the standard way to build dimension history without a transactional
table format (with Delta/Iceberg the same logic backs ``MERGE``-based
SCD2 upserts).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Append ``valid_from``/``valid_to``/``is_current`` to change rows.

    Changes must be unique per (keys, ts) for deterministic intervals —
    dedup upstream (e.g. ``dedup_keep_first``).
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_tiebreak]
    )
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
