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

import warnings

from pyspark.sql import DataFrame

try:  # absent on pure-connect clients
    from py4j.protocol import Py4JError as _Py4JError
except ImportError:  # pragma: no cover

    class _Py4JError(Exception):
        pass


_WARNED_FALLBACK = False


def fresh_local_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint with STATISTICS RESET — the per-round
    materialization for iterative kernels (see module docstring).

    LAZY (eager=False), since round 15: ``localCheckpoint`` plans the
    query at call time either way (under AQE every exchange stage is
    submitted and awaited right then — the loop's pacing is
    unchanged), but the eager variant then runs one more JOB just to
    compute and cache the final stage, which the first consumer
    re-reads. Lazy defers that final computation into the first
    consuming job: same work, one fewer job dispatch and one fewer
    cache-read pass PER ROUND — exactly the per-job floor that
    dominates control-plane-sized loop bodies (measured: eager =
    2 jobs at the call + cache read at first use; lazy = 1 job at the
    call, first use computes+caches in-place, later uses read cache).
    Spark's LocalRDDCheckpointData backfills any partitions the first
    job did not compute before truncating lineage, so partial-consume
    actions (take/limit) stay safe.

    The 'pacing unchanged' premise of the lazy variant holds only
    under AQE: ``toRdd`` materializes the exchange stages via
    AdaptiveSparkPlanExec, so the loop body still executes at the
    call. With ``spark.sql.adaptive.enabled=false`` nothing would run
    here — lineage would physically chain across rounds and every
    round's compute (and failures) would surface at the first
    downstream action — so the non-AQE path stays EAGER (the round-14
    behavior: one extra job per round, bounded lineage).

    When the classic-session internal constructor is unavailable
    (pyspark<4 module layout, connect clients, internal-API drift),
    degrades to the plain localCheckpoint — correct but re-inheriting
    estimates, i.e. the geometric stats-compounding this helper
    exists to stop. That degradation is LOUD (a one-time
    RuntimeWarning) and the except is narrow, so an unexpected error
    in a long iterative job surfaces in planning reviews rather than
    as a driver OOM hours later."""
    global _WARNED_FALLBACK
    try:
        aqe = (
            df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true")
            == "true"
        )
    except Exception:  # pragma: no cover - conf surface drift
        aqe = True
    ck = df.localCheckpoint(eager=not aqe)
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
    except (ImportError, AttributeError, TypeError, _Py4JError) as e:
        # connect clients / pyspark<4 layout / internal-API drift:
        # the stats-reset rewrap is genuinely unavailable here
        if not _WARNED_FALLBACK:
            _WARNED_FALLBACK = True
            warnings.warn(
                "fresh_local_checkpoint: stats-reset rewrap "
                f"unavailable ({type(e).__name__}: {e}); falling back "
                "to plain localCheckpoint — iterative kernels on this "
                "session re-inherit estimated statistics and long "
                "loops may hit the geometric stats-compounding "
                "planner blowup documented in operators/iterate.py",
                RuntimeWarning,
                stacklevel=2,
            )
        return ck
