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


def _evolve(target: DataFrame, updates: DataFrame):
    """Schema evolution à la Delta's mergeSchema: columns new in the
    batch are added to the target as NULLs (existing rows never had the
    value), and target columns the batch omits are NULL-filled on the
    batch side. Column TYPES must still agree where names collide —
    silent casts are a data-corruption vector, so a type change raises
    instead of evolving."""
    from pyspark.sql import functions as F

    t_fields = {f.name: f.dataType for f in target.schema.fields}
    u_fields = {f.name: f.dataType for f in updates.schema.fields}
    for name in t_fields.keys() & u_fields.keys():
        if t_fields[name] != u_fields[name]:
            raise ValueError(
                f"schema evolution cannot change column {name!r}: "
                f"{t_fields[name].simpleString()} -> "
                f"{u_fields[name].simpleString()}"
            )
    for name, dtype in u_fields.items():
        if name not in t_fields:
            target = target.withColumn(name, F.lit(None).cast(dtype))
    for name, dtype in t_fields.items():
        if name not in u_fields:
            updates = updates.withColumn(name, F.lit(None).cast(dtype))
    # column ORDER pinned to target-then-new so every commit's parquet
    # schema is stable regardless of batch column order
    cols = list(t_fields) + [n for n in u_fields if n not in t_fields]
    return target.select(*cols), updates.select(*cols)


def merge_into(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
    version_col: str | None = None,
    max_retries: int = 5,
    backend=None,
    schema_evolution: bool = False,
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

    ``schema_evolution``: batches may add NEW columns (existing rows get
    NULLs) or omit existing ones (NULL-filled) — Delta's mergeSchema
    semantics; a TYPE change for an existing column always raises.

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
        # re-derived each attempt from the ORIGINAL batch: a retry reads
        # a fresh target whose schema may itself have evolved
        if schema_evolution:
            target, batch = _evolve(target, updates)
        else:
            drift = set(updates.columns) ^ set(target.columns)
            if drift:
                # silently dropping batch columns (or NULL-filling target
                # ones) without opt-in is a data-corruption vector —
                # Delta's MERGE refuses this without autoMerge too
                raise ValueError(
                    f"batch schema differs from table on {sorted(drift)}; "
                    "pass schema_evolution=True to evolve"
                )
            batch = updates
        if when_matched == "update":
            merged = upsert(target, batch, keys, version_col)
        else:
            kept = target.join(batch.select(*keys), on=keys, how="left_anti")
            inserts = batch.join(
                target.select(*keys), on=keys, how="left_anti"
            )
            merged = kept.unionByName(inserts.select(*target.columns))
        try:
            return backend.commit(merged, table_path, base)
        except CommitConflict as exc:
            last = exc
            continue
    raise last if last is not None else CommitConflict("merge_into: no attempt ran")
