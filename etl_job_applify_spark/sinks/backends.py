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

from .versioned import (
    CommitConflict,
    commit_version,
    list_versions,
    read_table,
)


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


def delta_available() -> bool:
    """True when the public ``delta-spark`` package (PyPI) and its jars
    are importable in this environment."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _is_delta_concurrency_conflict(exc: BaseException) -> bool:
    """Classify a Delta commit failure as an OCC conflict by exception
    CLASS, never by message substrings (a stack-trace fragment that
    merely mentions 'Concurrent' must not be misreported as a retryable
    conflict, and a differently-wrapped real conflict must not be
    re-raised raw). Three shapes are recognised:

    - delta-spark's Python exception classes
      (``delta.exceptions.ConcurrentModificationException`` and
      subclasses like ``ConcurrentAppendException``) — matched by MRO;
    - a Py4J ``JavaError``-style wrapper: walk the attached
      ``java_exception``'s class chain via getClass().getName() and its
      getCause() chain for the io.delta / org.apache.spark.sql.delta
      ``...ConcurrentModificationException`` family;
    - Spark Connect / captured errors exposing ``getErrorClass`` with a
      ``DELTA_CONCURRENT...`` error class.
    """
    try:
        from delta import exceptions as dex

        py_base = getattr(dex, "ConcurrentModificationException", None)
        if py_base is not None and isinstance(exc, py_base):
            return True
    except ImportError:
        pass
    _CONFLICT_PKGS = ("io.delta.", "org.apache.spark.sql.delta.")
    _CONFLICT_NAMES = (
        "ConcurrentModificationException",
        "ConcurrentWriteException",
        "ConcurrentAppendException",
        "ConcurrentDeleteReadException",
        "ConcurrentDeleteDeleteException",
        "ConcurrentTransactionException",
        "MetadataChangedException",
        "ProtocolChangedException",
    )
    jexc = getattr(exc, "java_exception", None)
    hops = 0
    while jexc is not None and hops < 16:  # bounded cause-chain walk
        try:
            name = jexc.getClass().getName()
        except Exception:
            break
        if name.startswith(_CONFLICT_PKGS) and name.rsplit(".", 1)[
            -1
        ] in _CONFLICT_NAMES:
            return True
        try:
            jexc = jexc.getCause()
        except Exception:
            break
        hops += 1
    get_cls = getattr(exc, "getErrorClass", None)
    if callable(get_cls):
        try:
            ec = get_cls()
        except Exception:
            ec = None
        if isinstance(ec, str) and ec.startswith("DELTA_CONCURRENT"):
            return True
    return False


class DeltaBackend:
    """``MergeBackend`` over a real Delta Lake table (public
    ``delta-spark`` package). Requires a session built with the Delta
    extensions::

        from delta import configure_spark_with_delta_pip
        spark = configure_spark_with_delta_pip(
            SparkSession.builder
            .config("spark.sql.extensions",
                    "io.delta.sql.DeltaSparkSessionExtension")
            .config("spark.sql.catalog.spark_catalog",
                    "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        ).getOrCreate()

    Version mapping: Delta numbers commits from 0, this protocol from 1
    (0 = "table doesn't exist"), so protocol version N is Delta version
    N-1 throughout — ``read(version=v)`` is ``versionAsOf v-1``.

    ``commit`` CAS semantics: check the base immediately before the
    overwrite, then map Delta's own optimistic-concurrency failures
    (``ConcurrentModificationException`` subclasses — two overwrites of
    the same snapshot conflict under Serializable/WriteSerializable) to
    ``CommitConflict``. Delta's OCC is the real guard: at the default
    isolation the losing overwrite ABORTS, nothing lands, and the retry
    loop recomputes against the winner's snapshot. The post-write
    version re-verify is a DETECTOR for misconfigured weaker isolation
    only — if Delta admitted both overwrites, the stale merge has
    already landed and cannot be rolled back from here; the raised
    ``CommitConflict`` names the landed version so the operator can
    RESTORE via time travel. It narrows, not closes, the
    check-then-write window: run merged tables at Serializable (or
    WriteSerializable) isolation, where the window is closed by the
    format itself.

    Not exercised in this image: the sandbox has no delta-spark and
    package installs are disallowed (see tests/test_merge_backend.py,
    which parametrizes the contract over this backend and skips with
    that reason). The adapter is written against the public DeltaTable
    API only.
    """

    def _delta_table(self, spark: SparkSession, table_path: str):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(spark, table_path)

    def latest_version(self, spark: SparkSession, table_path: str) -> int:
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(spark, table_path):
            return 0
        row = (
            self._delta_table(spark, table_path)
            .history(1)
            .select("version")
            .first()
        )
        return (int(row[0]) + 1) if row is not None else 0

    def read(
        self,
        spark: SparkSession,
        table_path: str,
        version: int | None = None,
    ) -> DataFrame:
        latest = self.latest_version(spark, table_path)
        if latest == 0:
            raise FileNotFoundError(f"no delta table at {table_path}")
        v = latest if version is None else version
        if not 1 <= v <= latest:
            raise FileNotFoundError(f"no version {v} at {table_path}")
        return (
            spark.read.format("delta")
            .option("versionAsOf", v - 1)
            .load(table_path)
        )

    def commit(
        self, df: DataFrame, table_path: str, base_version: int
    ) -> int:
        spark = df.sparkSession
        if self.latest_version(spark, table_path) != base_version:
            raise CommitConflict(f"stale base {base_version}")
        try:
            df.write.format("delta").mode("overwrite").option(
                "overwriteSchema", "true"
            ).save(table_path)
        except Exception as exc:  # Py4J wraps the JVM exception class
            if _is_delta_concurrency_conflict(exc):
                raise CommitConflict(str(exc)) from exc
            raise
        landed = self.latest_version(spark, table_path)
        if landed != base_version + 1:
            raise CommitConflict(
                f"interleaved writer admitted by weak isolation: expected "
                f"version {base_version + 1}, table is at {landed}. This "
                f"overwrite HAS landed and may have dropped the interleaved "
                f"writer's rows — RESTORE to version {landed - 1} (time "
                f"travel) and re-run, and set the table to Serializable "
                f"isolation, where Delta aborts the losing overwrite instead."
            )
        return landed


DEFAULT_BACKEND = VersionedParquetBackend()
