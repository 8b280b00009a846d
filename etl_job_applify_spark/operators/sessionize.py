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


def capped_sessions(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    max_duration_seconds: int,
    session_col: str = "session_id",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Sessionization with BOTH an inactivity gap and a hard duration
    cap: a new session starts when the gap from the previous event
    exceeds ``gap_seconds`` OR when including this event would stretch
    the CURRENT session past ``max_duration_seconds`` since its first
    event.

    The cap makes the assignment state-dependent (whether a row opens a
    session depends on where the current session STARTED, which depends
    on every prior decision) — not prefix-decomposable, so no
    lag/cumsum window rewrite exists. This is the documented
    applyInPandas case (SURVEY §2b UDF row): one Arrow-batched linear
    scan per key group, O(rows-per-key) work and state, exactly the
    shape Structured Streaming's applyInPandasWithState uses for the
    same semantics online. Per-key row counts bound the group memory —
    the same premise every per-user analytic in this repo rides.

    Determinism: rows scan in (ts, *order_tiebreak) order; ties never
    straddle a boundary decision ambiguously because the comparison
    uses exact microsecond integers. Returns df's columns +
    ``session_col`` (per-key ordinal starting at 1). ``ts_col`` must be
    non-null: a NaT would silently corrupt the integer-micros
    conversion, so null timestamps are rejected per batch.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    # fresh StructType — StructType.add MUTATES, and mutating the
    # DataFrame's cached schema corrupts later column resolution
    out_schema = StructType(
        list(df.schema.fields) + [StructField(session_col, LongType())]
    )
    key_list = list(keys)
    tiebreak = list(order_tiebreak)
    gap_us = int(gap_seconds) * 1_000_000
    cap_us = int(max_duration_seconds) * 1_000_000
    ts_name = ts_col

    def assign(pdf):
        pdf = pdf.sort_values([ts_name, *tiebreak], kind="mergesort")
        if pdf[ts_name].isna().any():
            raise ValueError(
                f"capped_sessions: null {ts_name} in group — NaT would "
                "silently corrupt the integer-micros conversion"
            )
        # datetime64[ns] → exact integer micros (no float round-trip)
        ts_us = pdf[ts_name].astype("int64") // 1000
        sids = []
        sid = 0
        prev = None
        start = None
        for t in ts_us:
            if prev is None or t - prev > gap_us or t - start > cap_us:
                sid += 1
                start = t
            prev = t
            sids.append(sid)
        pdf[session_col] = sids
        return pdf

    return df.groupBy(*key_list).applyInPandas(assign, schema=out_schema)
