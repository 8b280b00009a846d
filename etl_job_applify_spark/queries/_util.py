"""Shared helpers for the query inventory.

The DECIMAL-accumulate-then-DOUBLE idiom: double-precision SUM is
order-dependent (floating-point addition is not associative), so a
parallel Spark aggregation and a serial DuckDB aggregation of identical
inputs can differ in the last bits — enough to fail a value-hash compare.
Accumulating in DECIMAL(28,6) is exact and associative; casting the exact
result to DOUBLE is deterministic. Both engines evaluate the SAME SQL text
for these expressions, so results match bit-for-bit at any parallelism —
this also holds on a 1000-executor cluster, where partial-aggregate order
is even less predictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture table loader.

    Pins engine semantics the queries rely on, because the driver runs
    them on ITS OWN SparkSession (arbitrary configs):

    - session semantics (ANSI off, nanos-as-long) are pinned idempotently
      by ``session.prepare_session`` inside ``load_table`` — one place,
      no per-query ``conf.set``.
    - ``events.ts`` is normalized to session-zoned TimestampType whatever
      the fixture generation encoded (TIMESTAMP(NANOS)-as-long with
      integer ``div 1000``, or native micros TIMESTAMP_NTZ cast at the
      UTC-pinned session) — see sources/readers.py ``normalize_events_ts``.
    """
    from ..sources.readers import load_table

    return load_table(spark, sf_dir, name)


def DSUM(expr: str, scale: int = 6) -> str:
    """Exact distributed sum of a double expression, surfaced as DOUBLE
    (the shared grid contract: functions/exact.py)."""
    from ..functions.exact import decimal_sum_expr

    return decimal_sum_expr(expr, scale=scale)


def DAVG(expr: str, scale: int = 6) -> str:
    """Exact-sum average: deterministic DOUBLE division at the end."""
    return f"{DSUM(expr, scale)} / COUNT({expr})"


def DSUM_PINNED(expr: str) -> str:
    """Exact distributed sum with the decimal → STRING → double hop.

    When the sum scaled by 10^6 exceeds 2^53, DuckDB's native
    decimal→double (int128→double, then divide) differs from Java's
    correctly-rounded conversion in the last ulp — but BOTH engines
    parse decimal strings correctly rounded, so the string hop pins the
    bits (see relational3.py q89). Use this instead of DSUM whenever the
    accumulated magnitude can cross 2^53 (e.g. squared-price sums).
    """
    from ..functions.exact import decimal_sum_expr

    return decimal_sum_expr(expr, pinned=True)


def dsum(expr: str, alias: str):
    return F.expr(DSUM(expr)).alias(alias)


def davg(expr: str, alias: str):
    return F.expr(DAVG(expr)).alias(alias)
