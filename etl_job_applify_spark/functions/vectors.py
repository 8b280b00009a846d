"""Embedding vector math as JVM-side higher-order-function expressions.

No UDFs: ``zip_with`` + ``aggregate`` compile to codegen'd loops over the
array, so dot products run at memory bandwidth inside the JVM — the Arrow
round-trip of a Pandas UDF only wins once you batch into BLAS (see
similarity/ivf.py for that variant).

Determinism: ``aggregate`` is a left fold in array order with a 0.0 init,
i.e. ((0+x₁)+x₂)+… — the same sequence a serial engine (the DuckDB oracle
mirrors it with ``list_reduce``) produces, so cosine values compare
bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> Column:
    """Σ aᵢ·bᵢ in double precision (float inputs upcast exactly)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" 0D, (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    """‖a‖₂ (sqrt is IEEE-correctly-rounded → cross-engine exact)."""
    return F.sqrt(dot_expr(a, a))


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    return df.withColumn(out, norm_expr(vec_col))


def py_norm(vec) -> float:
    """Driver-side twin of ``norm_expr``: the same left fold
    ``((0+x₁²)+x₂²)+…`` then ``sqrt``, in IEEE doubles (Python float ==
    JVM double; ``math.sqrt`` and JVM sqrt are both correctly rounded),
    so the value is bit-identical to evaluating the expression on the
    same row. Used by the vector-index probe path to serve query norms
    from a driver-computed local relation."""
    import math

    acc = 0.0
    for x in vec:
        x = float(x)
        acc = acc + x * x
    return math.sqrt(acc)


def cosine_expr(a: str, b: str, norm_a: str | None = None, norm_b: str | None = None) -> Column:
    """cosine(a, b); pass precomputed norm columns to avoid recomputing
    them per pair (they should be materialized once per vector)."""
    na = F.col(norm_a) if norm_a else norm_expr(a)
    nb = F.col(norm_b) if norm_b else norm_expr(b)
    return dot_expr(a, b) / (na * nb)


def to_double_expr(a: str) -> Column:
    """Upcast a float array to double ONCE per vector — pairwise ops then
    skip 3×dim casts per pair (the casts dominated the exact all-pairs
    hot loop). Element values are identical to casting at use."""
    return F.expr(f"transform({a}, x -> CAST(x AS DOUBLE))")


def dot_double_expr(a: str, b: str) -> Column:
    """Σ aᵢ·bᵢ for arrays already in double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )


def cosine_double_expr(a: str, b: str, norm_a: str, norm_b: str) -> Column:
    """cosine for pre-cast double arrays with precomputed norms."""
    return dot_double_expr(a, b) / (F.col(norm_a) * F.col(norm_b))
