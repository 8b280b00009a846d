"""Materialization helper for ITERATIVE DataFrame kernels.

``Dataset.localCheckpoint`` truncates lineage but COPIES the
pre-checkpoint plan's ESTIMATED statistics onto the checkpointed leaf
(so one-shot pipelines keep their broadcast decisions). In an
iterative kernel that inheritance is a time bomb: round N's plan
multiplies the inherited leaf estimates through its joins (sizeInBytes
estimates are products), round N+1 checkpoints THAT estimate onto its
leaf, and the figure compounds geometrically — measured on the SCC
kernel, the stats BigInteger reaches millions of digits within ~3
phases, after which every planning pass grinds through
million-digit arithmetic (SizeInBytesOnlyStatsPlanVisitor) and the
driver eventually OOMs inside a localCheckpoint call. The data is
tiny; the ESTIMATE is what explodes.

``fresh_local_checkpoint`` materializes via localCheckpoint, then
rewraps the checkpointed internal RDD as a fresh ``LogicalRDD`` with
DEFAULT leaf statistics — planning stays O(plan) per round forever.
Default (unknown-size) leaf stats are the right call under AQE: the
frontier⋈edges joins these kernels run get their broadcast decisions
from AQE's RUNTIME sizes, not from compile-time estimates, so nothing
is lost and the compounding is gone.

The rewrap uses the classic-session internal constructor
(``internalCreateDataFrame`` — the same entry PySpark's own
createDataFrame path uses); where it is unavailable (e.g. a connect
client) the helper degrades to the plain localCheckpoint, which is
correct but re-inherits estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fresh_local_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint with STATISTICS RESET — the per-round
    materialization for iterative kernels (see module docstring)."""
    ck = df.localCheckpoint(eager=True)
    try:
        from pyspark.sql.classic.dataframe import (
            DataFrame as _ClassicDataFrame,
        )

        jdf = ck._jdf
        spark = ck.sparkSession
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return _ClassicDataFrame(jnew, spark)
    except Exception:  # connect clients / internal API drift
        return ck
