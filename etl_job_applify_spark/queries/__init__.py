"""Registered query inventory.

Every operator the engine claims (SURVEY.md §2) is demonstrated by a named
query here: a PySpark DataFrame build in ``QUERIES`` and, where
SQL-expressible, a DuckDB oracle in ``ORACLE`` — the driver cross-checks
row counts, schema, and order-insensitive value hashes at sf=0.01.

Cross-engine determinism rules used throughout (see queries/_util.py):
- money/measure aggregates go through exact DECIMAL accumulation and are
  cast back to DOUBLE (associative → identical bits regardless of
  aggregation order / parallelism);
- every ranking/window ordering carries a unique tiebreaker column;
- transcendental functions (log/exp/pow) are avoided in checked outputs —
  libm rounding differs across engines; sqrt/abs/floor/ceil are IEEE-exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    analytics,
    analytics2,
    textops,
    temporal,
    timeseries,
    advanced,
    hof,
    lifecycleops,
    verification,
    pipelineops,
    pipelineops2,
    sketches,
    graphmatch,
    graphpaths,
    mediadecode,
    mining,
    mlops,
    spatial,
    subword,
    transactional,
    vectorindex,
)


_MODULES = [
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    analytics,
    analytics2,
    textops,
    temporal,
    timeseries,
    advanced,
    hof,
    lifecycleops,
    verification,
    pipelineops,
    pipelineops2,
    sketches,
    graphmatch,
    graphpaths,
    mediadecode,
    mining,
    mlops,
    spatial,
    subword,
    transactional,
    vectorindex,
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
