"""Gap-based sessionization (SURVEY §2b: session windows — batch form).

Classic lag → gap-flag → cumulative-sum assembly: two window passes over
the SAME (key, ts) partitioning/sort, so Catalyst reuses one shuffle+sort
for both. Streaming twin: ``F.session_window`` in streaming/jobs.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``. ``order_tiebreak``
    makes ordering (hence session boundaries at equal ts) deterministic.
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # fractional-second precision (micros/1e6 as double) — matches SQL
    # engines' epoch() semantics; a long cast would truncate micros
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col).cast("double") - prev_ts.cast("double") > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
