"""Grid-blocked spatial radius join.

The relational form of a fixed-radius 2-D spatial join: hash both point
sets onto a square grid with cell size = the query radius, replicate ONE
side into its 3×3 cell neighborhood, equi-join on the cell id, and apply
the exact distance predicate last. Guarantees: any pair within radius r
lies in the same or an adjacent cell (cell ≥ r), so the candidate set is
a superset of the answer; each candidate pair is generated exactly once
(the probe point lives in exactly one cell and the build point's nine
replicas carry distinct cell ids).

Scale shape (100 TB lens): ONE equi-join shuffle on the cell key with a
constant ×9 replication on the chosen side (replicate the SMALLER side).
Cell population is bounded by point density × r², not corpus size; a
skewed hot cell is an AQE skew-join split, not a crossJoin. This is how
Sedona/GeoSpark-style engines lower ST_DWithin onto Spark — expressed
here with nothing but built-in functions, so the whole plan stays in
whole-stage codegen.

The distance predicate is squared-Euclidean (rational arithmetic only —
bit-identical across engines); geographic callers substitute a
haversine predicate and a latitude-corrected cell width at the marked
seam in ``grid_radius_join``.

Reference parity: the reference has no join surface at all (SURVEY.md
§2b "joins" — ABSENT); this extends the theta/range/as-of join family
(operators/range_join.py, asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """All (left, right) pairs with squared-Euclidean distance ≤ radius².

    ``left``/``right`` carry point coordinates in ``x``/``y`` plus any
    payload columns (names must be disjoint apart from x/y). The RIGHT
    side is replicated into the 3×3 neighborhood — pass the smaller
    relation as ``right``. Returns the payload columns of both sides,
    the left coordinates as ``<x>_left``/``<y>_left``, the right
    coordinates as ``<x>``/``<y>``, and ``dist_sq``.
    """
    r = float(radius)
    if not r > 0.0:
        # r = 0 would divide by zero in the cell mapping, and a negative
        # radius silently returns an empty result — both caller bugs
        raise ValueError(f"radius must be positive, got {radius}")
    lx, ly = f"{x}_left", f"{y}_left"
    probe = (
        left.withColumnRenamed(x, lx)
        .withColumnRenamed(y, ly)
        .withColumn("__cx", F.floor(F.col(lx) / F.lit(r)).cast("int"))
        .withColumn("__cy", F.floor(F.col(ly) / F.lit(r)).cast("int"))
    )
    neighborhood = F.array(F.lit(-1), F.lit(0), F.lit(1))
    build = (
        right.withColumn("__dx", F.explode(neighborhood))
        .withColumn("__dy", F.explode(neighborhood))
        .withColumn(
            "__cx",
            F.floor(F.col(x) / F.lit(r)).cast("int") + F.col("__dx"),
        )
        .withColumn(
            "__cy",
            F.floor(F.col(y) / F.lit(r)).cast("int") + F.col("__dy"),
        )
        .drop("__dx", "__dy")
    )
    # exact-predicate seam: swap for haversine on geographic data
    dist_sq = (F.col(lx) - F.col(x)) * (F.col(lx) - F.col(x)) + (
        F.col(ly) - F.col(y)
    ) * (F.col(ly) - F.col(y))
    return (
        probe.join(build, ["__cx", "__cy"])
        .withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= F.lit(r * r))
        .drop("__cx", "__cy")
    )
