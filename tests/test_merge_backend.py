"""MergeBackend contract: the tests any Delta/Iceberg adapter must pass.

Parametrized over two structurally different backends — the default
directory-versioned parquet protocol (rename-CAS) and a minimal
transaction-LOG-style backend modeled on Delta's ``_delta_log`` shape
(data files land first, an O_EXCL log entry naming them is the atomic
commit) — so the contract provably carries across storage protocols,
not just the one that ships.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.sinks import (
    CommitConflict,
    VersionedParquetBackend,
    merge_into,
)


class DeltaLogStyleBackend:
    """Test-local adapter in the shape a Delta lowering takes: immutable
    data directories plus a ``_log/N.json`` entry per commit, where
    creating the log entry with O_EXCL *is* the CAS."""

    def _log_dir(self, table_path):
        return os.path.join(table_path, "_log")

    def latest_version(self, spark, table_path):
        d = self._log_dir(table_path)
        if not os.path.isdir(d):
            return 0
        entries = [
            int(f[: -len(".json")])
            for f in os.listdir(d)
            if f.endswith(".json")
        ]
        return max(entries, default=0)

    def read(self, spark, table_path, version=None):
        v = version or self.latest_version(spark, table_path)
        entry = os.path.join(self._log_dir(table_path), f"{v}.json")
        if not os.path.isfile(entry):
            raise FileNotFoundError(f"no version {v} at {table_path}")
        with open(entry) as fh:
            data_dir = json.load(fh)["data_dir"]
        return spark.read.parquet(os.path.join(table_path, data_dir))

    def commit(self, df, table_path, base_version):
        import uuid

        if self.latest_version(df.sparkSession, table_path) != base_version:
            raise CommitConflict(f"stale base {base_version}")
        data_dir = f"data_{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(
            os.path.join(table_path, data_dir)
        )
        os.makedirs(self._log_dir(table_path), exist_ok=True)
        entry = os.path.join(
            self._log_dir(table_path), f"{base_version + 1}.json"
        )
        try:
            fd = os.open(entry, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflict(
                f"version {base_version + 1} committed concurrently"
            ) from None
        with os.fdopen(fd, "w") as fh:
            json.dump({"data_dir": data_dir}, fh)
        return base_version + 1


from etl_job_applify_spark.sinks.backends import DeltaBackend, delta_available

BACKENDS = [
    VersionedParquetBackend,
    DeltaLogStyleBackend,
    pytest.param(
        DeltaBackend,
        marks=pytest.mark.skipif(
            not delta_available(),
            reason=(
                "delta-spark not installed and package installs are "
                "disallowed in this image; the adapter targets the "
                "public DeltaTable API and runs wherever the Delta "
                "jars are on the session classpath"
            ),
        ),
    ),
]


@pytest.fixture(params=BACKENDS, ids=lambda c: getattr(c, "__name__", str(c)))
def backend(request):
    return request.param()


def _orders(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_contract_versions_increase_monotonically(spark, tmp_path, backend):
    t = str(tmp_path / "t")
    assert backend.latest_version(spark, t) == 0
    v1 = merge_into(spark, t, _orders(spark, [(1, "a")]), ["k"], backend=backend)
    v2 = merge_into(spark, t, _orders(spark, [(2, "b")]), ["k"], backend=backend)
    assert (v1, v2) == (1, 2)
    assert backend.latest_version(spark, t) == 2


def test_contract_upsert_and_delete_semantics(spark, tmp_path, backend):
    t = str(tmp_path / "t")
    merge_into(spark, t, _orders(spark, [(1, "a"), (2, "b")]), ["k"],
               backend=backend)
    merge_into(spark, t, _orders(spark, [(2, "B"), (3, "c")]), ["k"],
               backend=backend)
    got = {r["k"]: r["v"] for r in backend.read(spark, t).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    merge_into(spark, t, _orders(spark, [(1, "x"), (9, "i")]), ["k"],
               when_matched="delete", backend=backend)
    got = {r["k"]: r["v"] for r in backend.read(spark, t).collect()}
    assert got == {2: "B", 3: "c", 9: "i"}


def test_contract_stale_commit_conflicts_and_publishes_nothing(
    spark, tmp_path, backend
):
    t = str(tmp_path / "t")
    merge_into(spark, t, _orders(spark, [(1, "a")]), ["k"], backend=backend)
    merge_into(spark, t, _orders(spark, [(2, "b")]), ["k"], backend=backend)
    with pytest.raises(CommitConflict):
        backend.commit(_orders(spark, [(99, "z")]), t, base_version=1)
    assert backend.latest_version(spark, t) == 2
    got = {r["k"] for r in backend.read(spark, t).collect()}
    assert got == {1, 2}, "losing commit leaked rows"


def test_contract_snapshot_isolation(spark, tmp_path, backend):
    t = str(tmp_path / "t")
    merge_into(spark, t, _orders(spark, [(1, "a")]), ["k"], backend=backend)
    merge_into(spark, t, _orders(spark, [(1, "A2"), (2, "b")]), ["k"],
               backend=backend)
    old = {r["k"]: r["v"] for r in backend.read(spark, t, version=1).collect()}
    new = {r["k"]: r["v"] for r in backend.read(spark, t).collect()}
    assert old == {1: "a"}, "committed snapshot mutated"
    assert new == {1: "A2", 2: "b"}


def test_contract_retry_converges_after_interleaved_writer(
    spark, tmp_path, backend
):
    """A writer that loses the race must re-read, recompute against the
    NEW snapshot, and commit a result containing both writers' rows."""
    t = str(tmp_path / "t")
    merge_into(spark, t, _orders(spark, [(1, "a")]), ["k"], backend=backend)

    interloper = {"done": False}
    real_latest = backend.latest_version

    def racing_latest(spark_, path_):
        v = real_latest(spark_, path_)
        if not interloper["done"]:
            # someone else commits between our read and our commit
            interloper["done"] = True
            backend.commit(_orders(spark, [(1, "a"), (7, "g")]), path_, v)
        return v

    backend.latest_version = racing_latest  # type: ignore[method-assign]
    try:
        v = merge_into(
            spark, t, _orders(spark, [(2, "b")]), ["k"], backend=backend
        )
    finally:
        backend.latest_version = real_latest  # type: ignore[method-assign]
    assert v == 3  # interloper took 2; retry committed 3
    got = {r["k"]: r["v"] for r in backend.read(spark, t).collect()}
    assert got == {1: "a", 2: "b", 7: "g"}, "retry lost a writer's rows"


def test_contract_missing_version_raises(spark, tmp_path, backend):
    t = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        backend.read(spark, t)
    merge_into(spark, t, _orders(spark, [(1, "a")]), ["k"], backend=backend)
    with pytest.raises(FileNotFoundError):
        backend.read(spark, t, version=5)


class _FakeDeltaHistory:
    def __init__(self, versions):
        self._versions = versions

    def select(self, _col):
        return self

    def first(self):
        return None if not self._versions else (max(self._versions),)


class _FakeDeltaTables:
    """A minimal in-memory stand-in for delta.tables.DeltaTable: enough
    surface for DeltaBackend's version mapping and history probe. Data
    itself is stored per (path, delta_version) as collected rows."""

    store: dict = {}

    class DeltaTable:
        def __init__(self, path):
            self._path = path

        @classmethod
        def isDeltaTable(cls, _spark, path):
            return path in _FakeDeltaTables.store

        @classmethod
        def forPath(cls, _spark, path):
            return cls(path)

        def history(self, _n):
            return _FakeDeltaHistory(
                list(_FakeDeltaTables.store.get(self._path, {}))
            )


def _install_fake_delta(monkeypatch):
    import sys
    import types

    delta = types.ModuleType("delta")
    tables = types.ModuleType("delta.tables")
    tables.DeltaTable = _FakeDeltaTables.DeltaTable
    delta.tables = tables
    monkeypatch.setitem(sys.modules, "delta", delta)
    monkeypatch.setitem(sys.modules, "delta.tables", tables)


def test_delta_backend_version_mapping_with_fake_module(spark, monkeypatch):
    """The adapter's protocol<->Delta version arithmetic, missing-table
    and missing-version behavior, and stale-base refusal — exercised
    against an in-memory DeltaTable stand-in, since delta-spark itself
    is absent from this image."""
    from etl_job_applify_spark.sinks import CommitConflict
    from etl_job_applify_spark.sinks.backends import DeltaBackend, delta_available

    _install_fake_delta(monkeypatch)
    assert delta_available()  # the fake module satisfies the probe
    b = DeltaBackend()
    path = "/fake/delta/table"
    _FakeDeltaTables.store.pop(path, None)

    # missing table: protocol version 0, read raises
    assert b.latest_version(spark, path) == 0
    with pytest.raises(FileNotFoundError):
        b.read(spark, path)

    # delta versions 0 and 1 exist -> protocol latest is 2
    _FakeDeltaTables.store[path] = {0: None, 1: None}
    assert b.latest_version(spark, path) == 2
    with pytest.raises(FileNotFoundError):
        b.read(spark, path, version=3)  # beyond latest
    with pytest.raises(FileNotFoundError):
        b.read(spark, path, version=0)  # protocol versions start at 1

    # stale-base commit refused BEFORE any write is attempted
    df = _orders(spark, [(1, "a")])
    with pytest.raises(CommitConflict, match="stale base"):
        b.commit(df, path, base_version=1)  # latest is 2
    _FakeDeltaTables.store.pop(path, None)


def test_conflict_classifier_matches_class_not_message():
    """OCC-conflict classification is by exception CLASS: a JVM
    exception whose MESSAGE merely mentions 'ConcurrentModification'
    (e.g. a stack-trace fragment) must NOT be classified as a conflict,
    while the io.delta ConcurrentModificationException family — even
    nested as a cause under an unrelated wrapper — must be."""
    from etl_job_applify_spark.sinks.backends import (
        _is_delta_concurrency_conflict,
    )

    class _JClass:
        def __init__(self, name):
            self._n = name

        def getName(self):
            return self._n

    class _JExc:
        def __init__(self, name, cause=None):
            self._c = _JClass(name)
            self._cause = cause

        def getClass(self):
            return self._c

        def getCause(self):
            return self._cause

    class _Py4JError(Exception):
        def __init__(self, jexc):
            super().__init__("jvm error")
            self.java_exception = jexc

    # message-only mention, unrelated class -> NOT a conflict
    noise = _Py4JError(
        _JExc("java.io.IOException")
    )
    noise.args = ("stack mentions ConcurrentModificationException",)
    assert not _is_delta_concurrency_conflict(noise)

    # exact io.delta conflict class -> conflict
    assert _is_delta_concurrency_conflict(
        _Py4JError(_JExc("io.delta.exceptions.ConcurrentAppendException"))
    )
    # spark-internal delta package spelling -> conflict
    assert _is_delta_concurrency_conflict(
        _Py4JError(
            _JExc(
                "org.apache.spark.sql.delta.ConcurrentModificationException"
            )
        )
    )
    # conflict buried one cause deep under an unrelated wrapper
    assert _is_delta_concurrency_conflict(
        _Py4JError(
            _JExc(
                "org.apache.spark.SparkException",
                cause=_JExc(
                    "io.delta.exceptions.ConcurrentWriteException"
                ),
            )
        )
    )
    # a NON-delta ConcurrentModificationException (java.util) is not ours
    assert not _is_delta_concurrency_conflict(
        _Py4JError(_JExc("java.util.ConcurrentModificationException"))
    )
    # error-class surface (Spark Connect style)
    class _Captured(Exception):
        def getErrorClass(self):
            return "DELTA_CONCURRENT_APPEND"

    assert _is_delta_concurrency_conflict(_Captured())
    # plain python exception -> not a conflict
    assert not _is_delta_concurrency_conflict(ValueError("Concurrent"))
