"""Range / theta joins (SURVEY §2b: joins/theta+range — ABSENT in
reference).

Two regimes:

- small band table (price bands, age brackets, SLA tiers): broadcast the
  bands and let the executor-local nested loop over a handful of bands do
  the interval test — no shuffle at all. This is ``range_join``'s default
  and the right call whenever one side fits in memory.
- both sides large: bucketize the range key to a common grid, equi-join on
  the bucket (one shuffle each side), then re-check the precise predicate.
  ``range_join_bucketed`` implements this; bucket width should be on the
  order of the interval width so each row lands in O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Theta join on an arbitrary condition; broadcasts the right side by
    default (bands/dimension tables). With ``broadcast_right=False`` Spark
    falls back to BNLJ/cartesian — only acceptable for tiny inputs."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=condition, how=how)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Interval join for two LARGE sides: ``left.point ∈ [right.lo,
    right.hi)``. Right intervals are exploded to every bucket they overlap
    (``ceil((hi-lo)/width)`` rows each — keep width ≈ typical interval
    length), both sides equi-join on the bucket id with the exact
    predicate in the JOIN CONDITION (a post-join filter would silently
    turn outer joins into inner ones by dropping null-extended rows).
    Shuffle is on (bucket), so skew only arises from genuinely hot
    ranges — handled by AQE skew-join.

    ``how``: inner or left. Right/full-outer are rejected: the exploded
    right side would emit one null-extended row PER OVERLAPPED BUCKET for
    every unmatched interval.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "range_join_bucketed supports how='inner'|'left' only; the "
            "bucket-exploded right side cannot express right/full outer"
        )
    lb = left.withColumn("__lb", F.floor(F.col(left_point) / bucket_width))
    # stop bucket = floor(hi/w): points equal to hi are excluded by the
    # exact predicate anyway (an epsilon here would LOSE matches when hi
    # sits just above a boundary). greatest() clamps inverted/corrupt
    # intervals (hi < lo) to one bucket instead of a huge descending
    # sequence — the predicate then yields zero rows for them.
    start = F.floor(F.col(right_lo) / bucket_width)
    stop = F.greatest(F.floor(F.col(right_hi) / bucket_width), start)
    rb = right.withColumn("__rb", F.explode(F.sequence(start, stop)))
    cond = (
        (F.col("__lb") == F.col("__rb"))
        & (F.col(left_point) >= F.col(right_lo))
        & (F.col(left_point) < F.col(right_hi))
    )
    return lb.join(rb, on=cond, how=how).drop("__lb", "__rb")
