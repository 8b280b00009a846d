"""Random-hyperplane (sign) LSH for approximate nearest neighbors.

Fixed random hyperplanes (deterministic seed) map each vector to sign
bits; P(bit agrees) = 1 − θ/π per plane. A single signature table is
only usable for very high-cosine targets: at the cosine ≈ 0.3 typical of
true nearest neighbors in a random-ish embedding space, per-plane
agreement is ≈ 0.6 and a 10-bit signature collides with probability
0.6^10 ≈ 0.6% — recall collapses. ``ann_topk_lsh`` therefore uses the
textbook AND-OR construction: ``num_tables`` independent tables of
``num_planes`` bits each (all bits computed in ONE pass and banded,
exactly like MinHash banding); a pair is a candidate if it collides in
ANY table, P = 1 − (1 − p^r)^L. Multi-probe: queries additionally probe
every Hamming-1 bucket within each table, lifting per-table collision to
p^r + r·p^(r−1)(1−p) at L·(r+1) probe keys per query.

The plane matrix is tiny (L·r × dim) and is inlined as literal arrays
into a codegen'd expression — no UDF, no broadcast variable, no Python on
the hot path. Candidate generation joins narrow (table, bucket, id) rows
only; vectors re-join by id for exact rerank, so the wide embedding
payload is never multiplied by L.

At 100 TB each table's bucket join is an ordinary key join (shuffle the
8-byte bucket ids, AQE handles hot buckets); recall/cost tunes with
(r, L) per the S-curve, and the honest limit applies: for mid-cosine
targets LSH prunes a few-×, not orders of magnitude — IVF (ivf.py) is
the better scale path there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

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


def _table_keys_udf(planes: np.ndarray, num_tables: int, multi_probe: bool):
    """Arrow-batched probe-key computation: all L·r sign bits come from ONE
    numpy matmul per batch, then band t packs bits [t·r, (t+1)·r) with the
    table id into a bigint key (table id in the high bits keeps tables'
    buckets disjoint). With ``multi_probe``, each table also yields its r
    Hamming-1 keys.

    This is the deliberate Pandas-UDF exception to the engine's
    JVM-expressions-first rule: a 128-plane signature as inlined SQL
    literal arrays is an 8000-term expression tree — seconds of Catalyst
    compile time and interpreted higher-order-function evaluation per row
    — while the matmul form is a single vectorized kernel per Arrow batch
    and scales with rows · planes · dim like any BLAS call."""
    from pyspark.sql.types import ArrayType, LongType

    r = len(planes) // num_tables
    if r >= 32:
        # keys pack the bucket in bits 0..31 and the table id from bit 32
        # up; a wider bucket would silently collide with the table bits
        # (and multi-probe's XOR would flip table ids, not bucket bits)
        raise ValueError(
            f"num_planes per table must be < 32, got {r} "
            f"({len(planes)} planes / {num_tables} tables)"
        )
    P = planes.astype(np.float64).T  # (dim, L*r)
    weights = (1 << np.arange(r)).astype(np.int64)
    bases = ((np.arange(num_tables) + 1) << 32).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def keys(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
        bits = (X @ P) > 0  # (n, L*r)
        buckets = bits.reshape(len(X), num_tables, r) @ weights  # (n, L)
        base_keys = buckets + bases  # broadcast over tables
        if multi_probe:
            flips = base_keys[:, :, None] ^ weights[None, None, :]
            all_keys = np.concatenate(
                [base_keys[:, :, None], flips], axis=2
            ).reshape(len(X), -1)
        else:
            all_keys = base_keys
        return pd.Series(list(all_keys))

    return keys


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    num_tables: int = 16,
    seed: int = 7,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate (query_id, neighbor, cosine, rank): exact cosine rerank
    restricted to candidates colliding in at least one of ``num_tables``
    LSH tables of ``num_planes`` bits (queries probe Hamming-1 buckets too
    when ``multi_probe``). Deterministic for a fixed seed."""
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"])
    planes = _planes(num_planes * num_tables, dim, seed)

    # candidate generation on NARROW rows: (key, id) only — the vector
    # payload re-joins after dedup, so it is never replicated per table
    corpus_keys = _table_keys_udf(planes, num_tables, multi_probe=False)
    query_keys = _table_keys_udf(planes, num_tables, multi_probe)
    ckeys = corpus.select(
        F.col(id_col).alias("neighbor"),
        F.explode(corpus_keys(F.col(vec_col))).alias("key"),
    )
    qkeys = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(query_keys(F.col(vec_col))).alias("key"),
    )
    cand = ckeys.join(qkeys, "key").select("query_id", "neighbor").distinct()

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
    scored = (
        cand.join(c, "neighbor")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", cosine_expr("__qv", "__cv", "__qn", "__cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor"))
    return (
        scored.select("query_id", "neighbor", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
