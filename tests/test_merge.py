"""Transactional MERGE INTO: semantics + optimistic concurrency."""

from __future__ import annotations

import threading

import pytest

from etl_job_applify_spark.sinks import (
    CommitConflict,
    commit_version,
    list_versions,
    merge_into,
    read_table,
    write_version,
)

SCHEMA = "k int, v string"


def _rows(spark, path, version=None):
    return {
        (r.k, r.v) for r in read_table(spark, path, version=version).collect()
    }


def test_merge_update_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = merge_into(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA),
        keys=["k"],
    )
    assert v1 == 1
    v2 = merge_into(
        spark,
        path,
        spark.createDataFrame([(2, "B"), (3, "c")], SCHEMA),
        keys=["k"],
    )
    assert v2 == 2
    assert _rows(spark, path) == {(1, "a"), (2, "B"), (3, "c")}
    # snapshot isolation: version 1 is still readable, unchanged
    assert _rows(spark, path, version=1) == {(1, "a"), (2, "b")}


def test_merge_delete_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_into(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA),
        keys=["k"],
    )
    # matched key 2 -> tombstoned; unmatched key 9 -> inserted
    merge_into(
        spark,
        path,
        spark.createDataFrame([(2, "x"), (9, "z")], SCHEMA),
        keys=["k"],
        when_matched="delete",
    )
    assert _rows(spark, path) == {(1, "a"), (9, "z")}


def test_commit_version_cas_rejects_stale_writer(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], SCHEMA)
    assert commit_version(df, path, base_version=0) == 1
    # a writer that read version 0 must NOT be able to clobber version 1
    with pytest.raises(CommitConflict):
        commit_version(spark.createDataFrame([(1, "stale")], SCHEMA), path, 0)
    assert _rows(spark, path) == {(1, "a")}
    # correctly-based commit proceeds
    assert commit_version(df, path, base_version=1) == 2


def test_merge_retries_through_interleaved_commit(spark, tmp_path):
    """merge_into recomputes against the NEW snapshot after losing the
    race — the interleaved writer's rows survive the retry."""
    path = str(tmp_path / "t")
    write_version(spark.createDataFrame([(1, "a")], SCHEMA), path)

    calls = {"n": 0}
    import etl_job_applify_spark.sinks.backends as backends_mod

    real_list_versions = backends_mod.list_versions

    def racing_list_versions(s, p):
        # first attempt reads, then an interloper commits before our CAS
        # (write_version publishes a COMPLETE snapshot, so the interloper
        # carries the existing row forward)
        out = real_list_versions(s, p)
        if calls["n"] == 0:
            calls["n"] += 1
            write_version(
                spark.createDataFrame(
                    [(1, "a"), (7, "interloper")], SCHEMA
                ),
                p,
            )
        return out

    backends_mod.list_versions = racing_list_versions
    try:
        v = merge_into(
            spark,
            path,
            spark.createDataFrame([(2, "b")], SCHEMA),
            keys=["k"],
        )
    finally:
        backends_mod.list_versions = real_list_versions
    assert v == 3  # base 1, interloper took 2, retry committed 3
    assert _rows(spark, path) == {(1, "a"), (7, "interloper"), (2, "b")}


def test_concurrent_merges_both_land(spark, tmp_path):
    """Two threads merging disjoint keys concurrently: the CAS loop
    serializes them and neither batch is lost (the lost-update anomaly
    a blind overwrite would produce)."""
    path = str(tmp_path / "t")
    write_version(spark.createDataFrame([(0, "seed")], SCHEMA), path)
    errs = []

    def worker(k, v):
        try:
            merge_into(
                spark,
                path,
                spark.createDataFrame([(k, v)], SCHEMA),
                keys=["k"],
                max_retries=10,
            )
        except Exception as exc:  # pragma: no cover - failure reporting
            errs.append(exc)

    threads = [
        threading.Thread(target=worker, args=(1, "one")),
        threading.Thread(target=worker, args=(2, "two")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert _rows(spark, path) == {(0, "seed"), (1, "one"), (2, "two")}
    assert list_versions(spark, path) == [1, 2, 3]


def test_many_concurrent_merges_serialize_without_loss(spark, tmp_path):
    """4 writers x 3 commits each, all racing: every batch must land
    exactly once and the version chain must be gapless — the stronger
    linearizability check over the CAS protocol."""
    path = str(tmp_path / "t")
    write_version(spark.createDataFrame([(0, "seed")], SCHEMA), path)
    errs = []

    def worker(wid):
        try:
            for j in range(3):
                merge_into(
                    spark,
                    path,
                    spark.createDataFrame(
                        [(100 * wid + j, f"w{wid}c{j}")], SCHEMA
                    ),
                    keys=["k"],
                    max_retries=40,
                )
        except Exception as exc:  # pragma: no cover - failure reporting
            errs.append(exc)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(1, 5)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    rows = _rows(spark, path)
    expect = {(0, "seed")} | {
        (100 * w + j, f"w{w}c{j}") for w in range(1, 5) for j in range(3)
    }
    assert rows == expect
    assert list_versions(spark, path) == list(range(1, 14))


def test_merge_schema_evolution_adds_column(spark, tmp_path):
    """A later batch carrying a NEW column evolves the table: existing
    rows read NULL for it, and a batch omitting an existing column gets
    NULL-filled — Delta mergeSchema semantics on the directory backend."""
    path = str(tmp_path / "t")
    merge_into(
        spark, path, spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA),
        keys=["k"],
    )
    evolved = spark.createDataFrame(
        [(2, "B", 9.5), (3, "c", 1.0)], "k int, v string, score double"
    )
    merge_into(spark, path, evolved, keys=["k"], schema_evolution=True)
    got = {
        (r["k"], r["v"], r["score"])
        for r in read_table(spark, path).collect()
    }
    assert got == {(1, "a", None), (2, "B", 9.5), (3, "c", 1.0)}
    # a batch OMITTING a column is also legal under evolution
    merge_into(
        spark, path, spark.createDataFrame([(4, "d")], SCHEMA),
        keys=["k"], schema_evolution=True,
    )
    rows = {r["k"]: r["score"] for r in read_table(spark, path).collect()}
    assert rows[4] is None and rows[2] == 9.5


def test_merge_schema_evolution_rejects_type_change(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_into(
        spark, path, spark.createDataFrame([(1, "a")], SCHEMA), keys=["k"]
    )
    bad = spark.createDataFrame([(1, 5)], "k int, v int")
    with pytest.raises(ValueError, match="cannot change column"):
        merge_into(spark, path, bad, keys=["k"], schema_evolution=True)
    # without the flag, schema drift is a hard error too (no silent
    # column drops): the new column is refused by the strict union
    extra = spark.createDataFrame(
        [(9, "z", 1.0)], "k int, v string, score double"
    )
    with pytest.raises(Exception):
        merge_into(spark, path, extra, keys=["k"])
    # table unchanged by the failed merges
    assert {(r["k"], r["v"]) for r in read_table(spark, path).collect()} == {
        (1, "a")
    }
