"""MergeBackend: the lowering seam between MERGE semantics and table
storage.

``merge_into`` (sinks/merge.py) owns the MERGE *algebra* — read the
current snapshot, compute the merged relation, optimistically commit,
retry on conflict. What varies across deployments is only the storage
protocol underneath: this image has the directory-versioned parquet
protocol (sinks/versioned.py); a cluster with Delta or Iceberg jars has
a transaction log. ``MergeBackend`` is that boundary as a typed
protocol, so the production lowering is an adapter, not a rewrite.

An adapter is correct iff it passes the CONTRACT TESTS
(tests/test_merge_backend.py ``BackendContract``): versions increase
monotonically from commits; a commit against a stale base raises
``CommitConflict`` and publishes nothing; committed snapshots are
immutable (snapshot isolation — a reader pinned to version v is
unaffected by later commits); and ``merge_into`` converges through the
retry loop under contention. The tests run against the default
directory backend AND a minimal transaction-log-style backend modeled
on Delta's ``_delta_log`` shape, proving the seam carries both.

A real Delta adapter maps ``latest_version`` to the log's last entry,
``read`` to time travel (``versionAsOf``), and ``commit`` to a
transactional overwrite that asserts the base version — or, where the
format exposes native MERGE with conflict detection, implements the
whole ``merge_into`` call as one ``DeltaTable.merge`` and lets the
format's own OCC replace the retry loop (the algebra is then the
format's, with identical observable semantics).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession

from .versioned import commit_version, list_versions, read_table


@runtime_checkable
class MergeBackend(Protocol):
    """Storage protocol ``merge_into`` commits through."""

    def latest_version(self, spark: SparkSession, table_path: str) -> int:
        """Newest committed version; 0 when the table doesn't exist."""
        ...

    def read(
        self,
        spark: SparkSession,
        table_path: str,
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot at ``version`` (latest when None). Must raise
        ``FileNotFoundError`` for a missing table/version."""
        ...

    def commit(
        self, df: DataFrame, table_path: str, base_version: int
    ) -> int:
        """CAS-publish ``df`` as ``base_version + 1`` iff ``base_version``
        is still newest; raise ``CommitConflict`` otherwise (leaving no
        partial state behind). Returns the committed version."""
        ...


class VersionedParquetBackend:
    """Default backend: the directory-versioned parquet protocol with
    rename-CAS commits and per-file skipping stats (sinks/versioned.py)."""

    def latest_version(self, spark: SparkSession, table_path: str) -> int:
        versions = list_versions(spark, table_path)
        return versions[-1] if versions else 0

    def read(
        self,
        spark: SparkSession,
        table_path: str,
        version: int | None = None,
    ) -> DataFrame:
        return read_table(spark, table_path, version)

    def commit(
        self, df: DataFrame, table_path: str, base_version: int
    ) -> int:
        return commit_version(df, table_path, base_version)


DEFAULT_BACKEND = VersionedParquetBackend()
