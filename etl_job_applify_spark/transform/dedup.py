"""Exact deduplication (reference parity: T1, services/transformer.py:13-17).

The reference's ``clean_data`` is ``df.dropDuplicates()`` — full-row, and
which physical row survives is arbitrary. Both variants here scale: one
shuffle on the dedup key, map-side partial aggregation, AQE-coalesced.

Fuzzy/near dedup (MinHash LSH, SimHash, n-gram Jaccard) lives in
``etl_job_applify_spark.dedup``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Reference-semantics dedup: arbitrary survivor per key group."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    ascending: bool = True,
) -> DataFrame:
    """Deterministic dedup: keep the first row per key group under
    ``order_by``. One shuffle on ``keys``; survivor is reproducible, which
    the arbitrary-survivor ``dropDuplicates`` is not (and reproducibility is
    what you want when the job reruns over 100 TB)."""
    cols = [F.col(c) if ascending else F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
