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
from .versioned import CommitConflict, commit_staged


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
    cow: bool = False,
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

    ``cow``: file-granular copy-on-write — consult the snapshot's stats
    sidecar, REWRITE only the files whose ``keys[0]`` range can contain
    a batch key, and carry every other file into the new snapshot as a
    hard link (zero data movement). Falls back to the full rewrite when
    prerequisites are missing (no stats, non-local table). This is what
    turns MERGE cost from O(|table|) to O(|files touched|) — the gap
    between a toy snapshot store and a lakehouse MERGE.

    Returns the committed version number. Makes one initial attempt plus
    up to ``max_retries`` retries; raises ``CommitConflict`` once all
    ``max_retries + 1`` successive commits lost the CAS race.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if cow:
        if backend is not None:
            raise ValueError(
                "cow=True is a directory-protocol optimization; custom "
                "backends implement their own file-level rewrite"
            )
        if schema_evolution:
            raise ValueError(
                "cow=True cannot evolve schemas: carried-over files would "
                "lack the new columns; use a full-rewrite merge (or a "
                "table format with real schema evolution)"
            )
        return _merge_cow(
            spark, table_path, updates, list(keys), when_matched,
            version_col, max_retries,
        )
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


#: batch key-set collection cap: below it, file pruning tests membership
#: against the batch's actual distinct keys (tight); above it, against
#: the batch's [min, max] interval (coarse but still conservative)
_COW_KEYSET_CAP = 100_000


def _merge_cow(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys,
    when_matched: str,
    version_col: str | None,
    max_retries: int,
) -> int:
    """File-granular copy-on-write MERGE on the versioned protocol.

    Correctness rests on one invariant, the same one Delta's
    file-pruning MERGE uses: a file is carried over UNREWRITTEN only
    when its ``keys[0]`` min/max PROVE it contains no batch key — so
    every row that could match lives in the rewritten subset, and the
    anti-join there is globally correct. Pruning on the FIRST key is
    conservative for composite keys (no composite match without a
    first-key match). Carried files are hard links: zero bytes moved,
    and snapshots stay self-contained directories (a manifest-based
    layout is the object-store equivalent; documented trade)."""
    import bisect
    import os

    from . import stats as _stats
    from .versioned import _resolve_snapshot, list_versions

    key0 = keys[0]
    # the batch key profile is computed once (control plane, capped)
    distinct_keys = [
        r[0]
        for r in updates.select(key0).distinct().limit(
            _COW_KEYSET_CAP + 1
        ).collect()
    ]
    use_interval = len(distinct_keys) > _COW_KEYSET_CAP
    if distinct_keys:
        keys_sorted = sorted(distinct_keys)
        k_lo, k_hi = keys_sorted[0], keys_sorted[-1]

    def file_touched(col_stats) -> bool:
        st = col_stats.get(key0)
        if st is None or not distinct_keys:
            return True  # no stats (or unknowable batch) → rewrite
        lo, hi = st["min"], st["max"]
        try:
            if hi < k_lo or lo > k_hi:
                return False
            if use_interval:
                return True
            i = bisect.bisect_left(keys_sorted, lo)
            return i < len(keys_sorted) and keys_sorted[i] <= hi
        except TypeError:
            return True  # incomparable types → rewrite

    last: CommitConflict | None = None
    for _ in range(max_retries + 1):
        versions = list_versions(spark, table_path)
        base = versions[-1] if versions else 0
        if not base:
            # empty table: nothing to prune, ordinary first commit
            try:
                return merge_into(
                    spark, table_path, updates, keys, when_matched,
                    version_col, max_retries=0,
                )
            except CommitConflict as exc:
                last = exc
                continue
        snap = _resolve_snapshot(spark, table_path, base)
        local = _stats._local_path(snap)
        doc = _stats.load_stats(snap)
        if doc is None or local is None:
            # no stats / non-local: the optimization has no basis
            return merge_into(
                spark, table_path, updates, keys, when_matched,
                version_col, max_retries,
            )
        touched = [
            name
            for name, cols in doc["files"].items()
            if file_touched(cols)
        ]
        carried = [name for name in doc["files"] if name not in set(touched)]
        schema = spark.read.parquet(snap).schema
        drift = set(updates.columns) ^ set(schema.names)
        if drift:
            raise ValueError(
                f"batch schema differs from table on {sorted(drift)}; "
                "cow merge cannot evolve schemas"
            )
        if touched:
            target_part = spark.read.parquet(
                *[os.path.join(local, n) for n in touched]
            )
        else:
            target_part = spark.createDataFrame([], schema)
        if when_matched == "update":
            merged_part = upsert(target_part, updates, keys, version_col)
        else:
            kept = target_part.join(
                updates.select(*keys), on=keys, how="left_anti"
            )
            inserts = updates.join(
                target_part.select(*keys), on=keys, how="left_anti"
            )
            merged_part = kept.unionByName(
                inserts.select(*target_part.columns)
            )

        # keep file count stable across merges: the rewritten subset
        # replaces len(touched) files, so it should land as ~that many
        # (otherwise every cow merge balloons the snapshot's file count
        # and the stats sidecar with it)
        merged_part = merged_part.repartition(max(len(touched), 1))

        def populate(staging: str) -> None:
            merged_part.write.mode("overwrite").parquet(staging)
            staging_local = _stats._local_path(staging)
            for name in carried:
                src = os.path.join(local, name)
                dst = os.path.join(staging_local, name)
                try:
                    os.link(src, dst)  # zero-copy carryover
                except OSError:
                    import shutil

                    shutil.copy2(src, dst)

        try:
            return commit_staged(spark, table_path, base, populate)
        except CommitConflict as exc:
            last = exc
            continue
    raise last if last is not None else CommitConflict("merge cow: no attempt ran")
