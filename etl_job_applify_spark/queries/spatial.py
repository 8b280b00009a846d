"""Spatial query: grid-blocked radius join between two synthetic point
sets (customers and suppliers placed on a 100×100 plane).

The coordinates are DERIVED deterministically from the fixture keys with
pure integer arithmetic (multiplicative scatter mod 10⁴, scaled to two
decimals), so the DuckDB oracle re-derives the identical point sets and
verifies the grid join against a brute-force distance filter — the
candidate-superset + exact-predicate contract of
``operators/spatial.grid_radius_join`` checked end to end: if the grid
ever dropped a true neighbor pair, the count compare would fail.

Scale: the Spark side never builds the cross product — one cell-key
equi-join with ×9 replication of the supplier (small) side; the oracle's
brute-force cross join exists only at sf0.01 gate scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import tbl
from ..operators.spatial import grid_radius_join

_RADIUS = 2.0

# coordinate derivations — IDENTICAL SQL text in both engines (exact
# integer mod, then a /100 scale; every double is a 0.01 multiple)
_CX = "CAST((c_custkey * 7919) % 10000 AS DOUBLE) / 100.0"
_CY = "CAST((c_custkey * 104729) % 10000 AS DOUBLE) / 100.0"
_SX = "CAST((s_suppkey * 4409) % 10000 AS DOUBLE) / 100.0"
_SY = "CAST((s_suppkey * 9973) % 10000 AS DOUBLE) / 100.0"


# --- q218: pairs within radius 2.0, rolled up per customer nation --------

def q218_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr(_CX).alias("x"),
        F.expr(_CY).alias("y"),
    )
    supp = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(_SX).alias("x"),
        F.expr(_SY).alias("y"),
    )
    pairs = grid_radius_join(cust, supp, radius=_RADIUS)
    return pairs.groupBy(
        F.col("c_nationkey").cast("int").alias("c_nationkey")
    ).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
    )


_Q218_SQL = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         {_CX} AS x,
         {_CY} AS y
  FROM customer
),
s AS (
  SELECT s_suppkey,
         {_SX} AS x,
         {_SY} AS y
  FROM supplier
),
pairs AS (
  SELECT c.c_custkey, c.c_nationkey
  FROM c JOIN s
    ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
       <= {_RADIUS} * {_RADIUS}
)
SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
FROM pairs
GROUP BY c_nationkey
"""


QUERIES = {
    "q218_grid_radius_join": q218_grid_radius_join,
}

ORACLE = {
    "q218_grid_radius_join": _Q218_SQL,
}
