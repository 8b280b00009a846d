"""Embedding-cosine near-duplicate pairs.

Near-dup = cosine(a, b) >= threshold over an embedding column. The
exact variant runs on LSH-bucketed candidates (random hyperplane signs)
so the pair space stays near-linear; see similarity/ for the top-k search
versions of the same machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_double_expr, to_double_expr, with_norm
from ..similarity.lsh import with_hyperplane_buckets


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Pairs (a, b, cosine) with cosine >= threshold.

    Candidates = same random-hyperplane sign bucket (high-cosine vectors
    collide with high probability; 16 planes ≈ 65k buckets). For exact
    recall at moderate scale, call with ``num_planes=0`` to compare all
    pairs (gated: quadratic).
    """
    base = with_norm(emb.select(id_col, vec_col), vec_col).withColumn(
        vec_col, to_double_expr(vec_col)
    )
    if num_planes:
        base = with_hyperplane_buckets(base, vec_col, num_planes, seed)
        join_keys = ["bucket"]
    else:
        base = base.withColumn("bucket", F.lit(0))
        join_keys = ["bucket"]
    a = base.select(
        F.col("bucket"),
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
    )
    b = base.select(
        F.col("bucket"),
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
    )
    return (
        a.join(b, join_keys)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cosine_double_expr("va", "vb", "na", "nb"))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
