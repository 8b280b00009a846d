"""As-of join (SURVEY §2b: joins/as-of — ABSENT in reference; Spark has no
native ASOF JOIN).

Implemented with the union-and-carry-forward assembly rather than a range
cross join:

1. tag right rows (build) and left rows (probe), union them on the key and
   a common timestamp;
2. one window per key ordered by (ts, side) — build rows sort BEFORE probe
   rows at equal timestamps so backward as-of is inclusive;
3. ``last(payload_struct, ignorenulls=True)`` carries the most recent build
   payload forward onto every probe row. The payload travels as ONE struct
   column (not per-column carries): a build row whose payload has NULL in
   some field still produces a non-null struct, so every projected field
   comes from the SAME matched build row — per-column ``last(ignorenulls)``
   would back-fill a NULL field from an older build row and mix rows.

Cost: ONE shuffle + sort on the key — the same cost as a sort-merge join,
no candidate explosion, skew handled by AQE. This is the 100 TB-safe shape;
a per-group ``pd.merge_asof`` via ``applyInPandas`` would ship every group
through Python and cap at one group per task.

Right rows must be unique per (key, ts) for deterministic output — callers
dedup first (e.g. ``dedup_keep_first``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str] | None = None,
    how: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the payload of the most recent right row
    with the same key and ``right_ts <= left_ts`` (``how="backward"``),
    the earliest with ``right_ts >= left_ts`` (``how="forward"``), or
    whichever of the two is CLOSER (``how="nearest"`` — pandas
    ``merge_asof`` parity; an exact tie prefers the backward match).

    ``tolerance``: maximum allowed |left_ts − right_ts| — matches
    further away resolve to NULL payload (again the ``merge_asof``
    contract). Units follow the RIGHT timestamp column's type: the
    raw difference for numeric columns, whole DAYS for dates (a
    timestamp left side is truncated to its date by the comparison),
    SECONDS for timestamps (fractional allowed — the comparison runs
    in exact integer MICROSECONDS, so sub-second timestamps gate and
    tie-break exactly as pandas ``merge_asof`` does).

    ``nearest`` still costs the ONE shuffle: both directional carries
    ride the same keyed exchange (two sorted window passes over it),
    and the pick is a row-local comparison.

    Returns all left columns plus ``payload`` columns (null when no match).
    """
    if how not in ("backward", "forward", "nearest"):
        raise ValueError("how must be backward|forward|nearest")
    on = list(on)
    payload = list(payload) if payload is not None else [
        c for c in right.columns if c not in on and c != right_ts
    ]
    left_cols = left.columns
    clash = set(payload) & {c for c in left_cols if c not in on}
    if clash:
        raise ValueError(
            f"payload columns {sorted(clash)} collide with left columns — "
            "rename one side before the as-of join"
        )

    # left_ts travels once, as __ts (the final select restores its name) —
    # carrying it twice would shuffle a redundant timestamp copy per row
    carry = [c for c in left_cols if c not in on and c != left_ts]
    from pyspark.sql.types import StructField, StructType

    # the matched build timestamp travels INSIDE the payload struct so
    # tolerance/nearest can compare against the SAME matched row
    payload_t = StructType(
        [StructField("__rts", right.schema[right_ts].dataType, True)]
        + [StructField(c, right.schema[c].dataType, True) for c in payload]
    )
    probe = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in carry],
        F.lit(None).cast(payload_t).alias("__b"),
    )
    build = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload]
        ).alias("__b"),
    )
    unioned = probe.unionByName(build)

    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    from pyspark.sql.types import DateType, TimestampType

    _rt = right.schema[right_ts].dataType

    def _dist(lts, rts):
        if isinstance(_rt, DateType):
            return F.abs(F.datediff(lts, rts))
        if isinstance(_rt, TimestampType):
            # exact integer MICROSECONDS — unix_timestamp truncates to
            # whole seconds, which (a) can pick the farther neighbor
            # under `nearest` when both truncated distances tie
            # (backward preferred) and (b) gates tolerance off by up
            # to 1 s vs pandas merge_asof with sub-second timestamps
            return F.abs(F.unix_micros(lts) - F.unix_micros(rts))
        return F.abs(lts - rts)

    # tolerance stays caller-specified in SECONDS for timestamps
    # (fractional allowed); the comparison happens in the distance's
    # own unit
    _tol = tolerance
    if tolerance is not None and isinstance(_rt, TimestampType):
        _tol = int(round(tolerance * 1_000_000))

    def _gate(m):
        """NULL out a carried match that violates the tolerance."""
        if tolerance is None:
            return m
        return F.when(
            m.isNotNull()
            & (_dist(F.col("__ts"), m["__rts"]) <= F.lit(_tol)),
            m,
        )

    if how in ("backward", "forward"):
        w = w_back if how == "backward" else w_fwd
        carried = unioned.select(
            *unioned.columns,
            _gate(
                F.last(F.col("__b"), ignorenulls=True).over(w)
            ).alias("__m"),
        )
    else:  # nearest: both directional carries on the one exchange
        both = unioned.select(
            *unioned.columns,
            F.last(F.col("__b"), ignorenulls=True).over(w_back).alias(
                "__mb"
            ),
            F.last(F.col("__b"), ignorenulls=True).over(w_fwd).alias(
                "__mf"
            ),
        )
        mb, mf = _gate(F.col("__mb")), _gate(F.col("__mf"))
        carried = both.select(
            *unioned.columns,
            F.when(mf.isNull(), mb)
            .when(mb.isNull(), mf)
            .when(
                _dist(F.col("__ts"), mb["__rts"])
                <= _dist(F.col("__ts"), mf["__rts"]),
                mb,
            )
            .otherwise(mf)
            .alias("__m"),
        )
    out = carried.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[c for c in left_cols if c not in on and c != left_ts],
        *[F.col("__m")[c].alias(c) for c in payload],
    )
    return out
