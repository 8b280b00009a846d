"""The quantized-transcendental accumulation discipline, centralized.

Double-precision SUM is order-dependent (floating-point addition is
not associative), so a parallel Spark aggregation and a serial oracle
aggregation of identical inputs can drift in the last bits — and
transcendental inputs (ln, log2, pow) are themselves only
libm-reproducible to the last ulp. The repo-wide contract (q190 /
``_idf_expr`` lesson):

1. quantize every per-row term to the exact DECIMAL(28,6) grid
   (``quantize_expr``) — a 1-ulp transcendental drift flips the
   quantized value only when it straddles a 1e-6 grid boundary;
2. SUM the decimals — exact and associative, so the result is
   identical at ANY parallelism, including a 1000-executor cluster;
3. surface the exact result as DOUBLE once, at the end
   (``decimal_sum_expr``); when the scaled magnitude can cross 2^53,
   pin the decimal→double conversion through a STRING hop
   (``pinned=True`` — int128→double division differs from Java's
   correctly-rounded conversion in the last ulp, but both engines
   parse decimal strings correctly rounded; see q89).

Every scoring kernel that sums transcendental terms builds its
expression from these two helpers (BM25 contributions in
``functions/retrieval.py``, DCG terms in ``functions/ireval.py``,
Naive Bayes log-likelihoods in ``transform/nbayes.py``, and the
query-inventory DSUM/DAVG in ``queries/_util.py``), so the next
kernel cannot drift from the contract — the property test in
tests/test_properties.py pins grid semantics and order independence.
"""

from __future__ import annotations

#: the shared accumulator grid: 28 digits, 6 fractional
PRECISION = 28
SCALE = 6


def quantize_expr(term: str, scale: int = SCALE, precision: int = PRECISION) -> str:
    """SQL text casting ``term`` onto the exact decimal accumulator
    grid (HALF_UP at the 10^-scale boundary in both Spark and DuckDB)."""
    return f"CAST(({term}) AS DECIMAL({precision},{scale}))"


def decimal_sum_expr(
    term: str,
    scale: int = SCALE,
    pinned: bool = False,
    as_double: bool = True,
) -> str:
    """SQL text for the exact distributed sum of ``term`` on the
    decimal grid, surfaced as DOUBLE (the default), as a pinned
    string-hop DOUBLE (``pinned=True`` — required when the scaled sum
    can cross 2^53), or as the raw DECIMAL (``as_double=False``)."""
    inner = f"SUM({quantize_expr(term, scale)})"
    if pinned:
        return f"CAST(CAST({inner} AS STRING) AS DOUBLE)"
    if as_double:
        return f"CAST({inner} AS DOUBLE)"
    return inner
