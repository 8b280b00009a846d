"""Higher-order function, map-type, and null-semantics surfaces.

All array/map work stays in codegen'd JVM expressions; the DuckDB oracle
mirrors each higher-order function with its list_* twin (and map scalar
lookup via ``map_extract(...)[1]`` — DuckDB returns a single-element list
where Spark's ``element_at`` returns the scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import tbl


# --- q63: map construction + access --------------------------------------
# Maps are built from the events' json props + type; outputs are scalars
# (map-typed outputs don't hash portably across engines — entry order is
# engine-dependent).

def q63_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("k"), F.lit("type_len")),
        F.array(
            F.get_json_object("props", "$.k").cast("long"),
            F.length("event_type").cast("long"),
        ),
    )
    return events.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "type_len").alias("type_len"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
    )


_Q63_SQL = """
WITH m AS (
  SELECT event_id,
         map(['k', 'type_len'],
             [CAST(json_extract_string(props, '$.k') AS BIGINT),
              CAST(length(event_type) AS BIGINT)]) AS mp
  FROM events
)
SELECT event_id,
       map_extract(mp, 'k')[1] AS k_val,
       map_extract(mp, 'type_len')[1] AS type_len,
       CAST(cardinality(mp) AS INT) AS m_size,
       array_to_string(map_keys(mp), ',') AS keys_joined
FROM m
"""


# --- q64: higher-order functions over the embedding arrays ---------------

def q64_hof_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.expr(
            "size(filter(embedding, x -> CAST(x AS DOUBLE) > 0))"
        ).alias("n_positive"),
        F.expr(
            "aggregate(embedding, 0D, (acc, x) -> acc + abs(CAST(x AS DOUBLE)))"
        ).alias("l1_norm"),
        F.expr(
            "exists(embedding, x -> CAST(x AS DOUBLE) > 0.2)"
        ).alias("has_large"),
        F.expr(
            "aggregate(embedding, 0D, (acc, x) -> "
            "CASE WHEN abs(CAST(x AS DOUBLE)) > acc THEN abs(CAST(x AS DOUBLE)) "
            "ELSE acc END)"
        ).alias("max_abs"),
    )


_Q64_SQL = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS INT)
         AS n_positive,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
           (acc, v) -> acc + v) AS l1_norm,
       len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.2)) > 0
         AS has_large,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
           (acc, v) -> CASE WHEN v > acc THEN v ELSE acc END) AS max_abs
FROM embeddings
"""


# --- q65: null-safe equality join ----------------------------------------
# <=> (IS NOT DISTINCT FROM): null keys match each other — the semantics
# CDC/dedup pipelines need when the key itself is nullable.

def q65_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    left = customer.select(
        F.col("c_custkey").alias("lk"),
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"),
    )
    right = (
        customer.select(
            F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg")
        )
        .groupBy("seg")
        .agg(F.count("*").alias("seg_n"))
    )
    return (
        left.join(right, left.seg.eqNullSafe(right.seg))
        .select("lk", left.seg.alias("seg"), "seg_n")
    )


_Q65_SQL = """
WITH l AS (
  SELECT c_custkey AS lk, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer
),
r AS (
  SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg, COUNT(*) AS seg_n
  FROM customer GROUP BY 1
)
SELECT l.lk, l.seg, r.seg_n
FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg
"""


QUERIES = {
    "q63_map_fns": q63_map_fns,
    "q64_hof_arrays": q64_hof_arrays,
    "q65_nullsafe_join": q65_nullsafe_join,
}

ORACLE = {
    "q63_map_fns": _Q63_SQL,
    "q64_hof_arrays": _Q64_SQL,
    "q65_nullsafe_join": _Q65_SQL,
}
