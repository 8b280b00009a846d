"""Transactional MERGE INTO over versioned parquet tables.

Closes the loop the reference never closed: its upsert only PRINTED
``DELETE ... INSERT`` SQL (services/data_store.py:29-41). Here MERGE is
(a) expressed relationally (sinks/upsert.py — anti-join + union, one
key shuffle or a broadcast for CDC-sized batches) and (b) committed with
snapshot isolation + optimistic concurrency through a ``MergeBackend``
(sinks/backends.py): read version v, compute the merged snapshot,
CAS-publish as v+1, and on conflict re-read and recompute — the
semantics ``MERGE INTO`` has on Delta/Iceberg. The default backend is
the directory-versioned parquet protocol (those jars aren't in this
image); a real deployment swaps in a Delta/Iceberg adapter that passes
the same contract tests (tests/test_merge_backend.py), or lowers the
whole call to the format's native MERGE.

Scale: each attempt is one distributed anti-join + union write; the
conflict loop retries the COMMIT, never blocks writers on a lock, and
loser work is proportional to conflict rate (the optimistic trade).
Contended multi-writer tables want the transactional format; this
protocol is correct for the common few-writers lake case.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .upsert import upsert
from .versioned import CommitConflict


def merge_into(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
    version_col: str | None = None,
    max_retries: int = 5,
    backend=None,
) -> int:
    """MERGE ``updates`` into the versioned table at ``table_path``.

    ``when_matched``:
      - ``"update"``: matched target rows are replaced by their update
        row; unmatched update rows are inserted (classic upsert).
      - ``"delete"``: matched target rows are deleted; unmatched update
        rows are inserted (the CDC tombstone pattern).

    ``version_col``: last-writer-wins tie-break when the batch carries
    several rows per key (see sinks/upsert.py).

    ``backend``: the storage protocol to commit through
    (sinks/backends.py MergeBackend); defaults to the directory-
    versioned parquet backend.

    Returns the committed version number. Makes one initial attempt plus
    up to ``max_retries`` retries; raises ``CommitConflict`` once all
    ``max_retries + 1`` successive commits lost the CAS race.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if backend is None:
        from .backends import DEFAULT_BACKEND

        backend = DEFAULT_BACKEND
    keys = list(keys)
    last: CommitConflict | None = None
    for _ in range(max_retries + 1):
        base = backend.latest_version(spark, table_path)
        if base:
            target = backend.read(spark, table_path)
        else:
            target = spark.createDataFrame([], updates.schema)
        if when_matched == "update":
            merged = upsert(target, updates, keys, version_col)
        else:
            kept = target.join(updates.select(*keys), on=keys, how="left_anti")
            inserts = updates.join(
                target.select(*keys), on=keys, how="left_anti"
            )
            merged = kept.unionByName(inserts.select(*target.columns))
        try:
            return backend.commit(merged, table_path, base)
        except CommitConflict as exc:
            last = exc
            continue
    raise last if last is not None else CommitConflict("merge_into: no attempt ran")
