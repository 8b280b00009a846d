"""Random-hyperplane (sign) LSH for approximate nearest neighbors.

``num_planes`` fixed random hyperplanes (deterministic seed) map each
vector to a bit signature; vectors sharing the signature bucket are
candidates. P(bit agrees) = 1 − θ/π per plane, so high-cosine pairs
collide on the full signature with probability (1 − θ/π)^planes.

The plane matrix is tiny (planes × dim) and is inlined as literal arrays
into a codegen'd expression — no UDF, no broadcast variable, no Python on
the hot path. Multi-probe: queries also probe all Hamming-1 neighbor
buckets, trading planes·|q| extra lookups for recall.

At 100 TB the bucketed equi-join shuffles each side once on the bucket id
— the same cost profile as any key join, with AQE handling hot buckets.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, with_norm


def _planes(num_planes: int, dim: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((num_planes, dim))


def _bucket_expr(vec_col: str, planes: np.ndarray) -> F.Column:
    """Pack sign bits of plane dot-products into one int bucket id."""
    bits = []
    for i, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{x}D" for x in plane) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr},"
            f" (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << i}L ELSE 0L END)")
    return F.expr(" + ".join(bits))


def with_hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 16,
    seed: int = 7,
    dim: int | None = None,
    out: str = "bucket",
) -> DataFrame:
    """Add the LSH bucket id column. ``dim`` defaults to the length of the
    first vector (driver peek — pass explicitly in production jobs)."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"])
    return df.withColumn(out, _bucket_expr(vec_col, _planes(num_planes, dim, seed)))


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 12,
    seed: int = 7,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate (query_id, neighbor, cosine, rank): exact cosine ranking
    restricted to same-bucket (± Hamming-1 with multi_probe) candidates."""
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"])
    c = with_norm(corpus.select(id_col, vec_col), vec_col)
    c = with_hyperplane_buckets(c, vec_col, num_planes, seed, dim).select(
        F.col("bucket"),
        F.col(id_col).alias("neighbor"),
        F.col(vec_col).alias("__cv"),
        F.col("norm").alias("__cn"),
    )
    q = with_norm(queries.select(query_id_col, vec_col), vec_col)
    q = with_hyperplane_buckets(q, vec_col, num_planes, seed, dim)
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(num_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    q = q.select(
        F.col("bucket"),
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("norm").alias("__qn"),
    )
    scored = c.join(q, "bucket").withColumn(
        "cosine", cosine_expr("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor"))
    return (
        scored.select("query_id", "neighbor", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
