"""Brute-force cosine top-k — the exact baseline.

Queries broadcast to every executor; each corpus partition scores its
vectors against all queries JVM-side (zip_with/aggregate, no UDF) and a
per-query window keeps k. Cost O(|corpus|·|queries|) — correct for
evaluation and for small query batches; the scale paths are lsh.py
(hyperplane buckets) and ivf.py (coarse-quantizer cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, with_norm


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, neighbor, cosine, rank) — top-k corpus neighbors per
    query vector. Ties broken by neighbor id for determinism."""
    c = with_norm(corpus.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("neighbor"),
        F.col(vec_col).alias("__cv"),
        F.col("norm").alias("__cn"),
    )
    q = with_norm(queries.select(query_id_col, vec_col), vec_col).select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("norm").alias("__qn"),
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", cosine_expr("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor", "cosine", "rank")
    )
