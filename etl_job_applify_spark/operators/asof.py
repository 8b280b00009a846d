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
) -> DataFrame:
    """For each left row, attach the payload of the most recent right row
    with the same key and ``right_ts <= left_ts`` (``how="backward"``), or
    the earliest with ``right_ts >= left_ts`` (``how="forward"``).

    Returns all left columns plus ``payload`` columns (null when no match).
    """
    if how not in ("backward", "forward"):
        raise ValueError("how must be backward|forward")
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

    payload_t = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in payload]
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
        F.struct(*[F.col(c) for c in payload]).alias("__b"),
    )
    unioned = probe.unionByName(build)

    if how == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    carried = unioned.select(
        *unioned.columns,
        F.last(F.col("__b"), ignorenulls=True).over(w).alias("__m"),
    )
    out = carried.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[c for c in left_cols if c not in on and c != left_ts],
        *[F.col("__m")[c].alias(c) for c in payload],
    )
    return out
