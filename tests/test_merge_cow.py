"""File-granular copy-on-write MERGE: only key-overlapping files are
rewritten; everything else is hard-linked into the new snapshot."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.sinks import (
    list_versions,
    merge_into,
    read_table,
    write_version,
)


def _seed(spark, path, n=20000, files=16):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )
    # clustered on k so per-file min/max are tight intervals
    write_version(df, path, cluster_by=(("k", 0, n),), num_files=files)


def _inodes(snap_dir):
    return {
        os.path.basename(p): os.stat(p).st_ino
        for p in glob.glob(snap_dir + "/part-*.parquet")
    }


def test_cow_rewrites_only_touched_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    old = _inodes(path + "/snap_00000001")
    # batch touches a narrow key band → one or two files
    batch = spark.createDataFrame(
        [(100, -1, 0.0), (105, -1, 0.0), (20005, -1, 7.5)],
        "k long, grp long, v double",
    )
    v = merge_into(spark, path, batch, keys=["k"], cow=True)
    assert v == 2
    new = _inodes(path + "/snap_00000002")
    linked = {n for n, ino in new.items() if old.get(n) == ino}
    rewritten = set(new) - linked
    assert len(linked) >= len(old) - 2, (
        f"too many rewrites: {len(rewritten)} fresh vs {len(old)} old"
    )
    assert linked < set(old.keys()) | set(new.keys())
    # semantics identical to a full merge
    got = read_table(spark, path)
    assert got.count() == 20001  # 2 updates + 1 insert
    updated = {r["k"]: r["grp"] for r in got.filter("grp = -1").collect()}
    assert set(updated) == {100, 105, 20005}


def test_cow_equals_full_merge_rowwise(spark, tmp_path):
    p_cow = str(tmp_path / "cow")
    p_full = str(tmp_path / "full")
    _seed(spark, p_cow, n=5000, files=8)
    _seed(spark, p_full, n=5000, files=8)
    batch = spark.range(50, 70).select(
        F.col("id").alias("k"),
        F.lit(-7).alias("grp"),
        F.lit(0.25).alias("v"),
    )
    merge_into(spark, p_cow, batch, keys=["k"], cow=True)
    merge_into(spark, p_full, batch, keys=["k"])
    a, b = read_table(spark, p_cow), read_table(spark, p_full)
    assert a.count() == b.count() == 5000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_cow_delete_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path, n=5000, files=8)
    tomb = spark.createDataFrame(
        [(10, 0, 0.0), (11, 0, 0.0), (9999, 0, 0.0)],
        "k long, grp long, v double",
    )
    merge_into(spark, path, tomb, keys=["k"], when_matched="delete", cow=True)
    got = read_table(spark, path)
    assert got.count() == 5000 - 2 + 1  # 10,11 deleted; 9999 inserted
    assert got.filter("k in (10, 11)").count() == 0
    assert got.filter("k = 9999").count() == 1


def test_cow_missing_stats_falls_back_to_full(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path, n=2000, files=4)
    os.remove(path + "/snap_00000001/_stats.json")
    batch = spark.createDataFrame([(5, -1, 0.0)], "k long, grp long, v double")
    v = merge_into(spark, path, batch, keys=["k"], cow=True)
    assert v == 2
    got = read_table(spark, path)
    assert got.count() == 2000
    assert got.filter("grp = -1").count() == 1


def test_cow_refuses_schema_evolution_and_drift(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path, n=1000, files=2)
    with pytest.raises(ValueError, match="cannot evolve"):
        merge_into(
            spark, path,
            spark.createDataFrame([(1, 0, 0.0)], "k long, grp long, v double"),
            keys=["k"], cow=True, schema_evolution=True,
        )
    bad = spark.createDataFrame([(1, "x")], "k long, extra string")
    with pytest.raises(ValueError, match="differs from table"):
        merge_into(spark, path, bad, keys=["k"], cow=True)
    assert list_versions(spark, path) == [1]


def test_cow_first_commit_on_empty_table(spark, tmp_path):
    path = str(tmp_path / "t")
    batch = spark.createDataFrame([(1, 2, 3.0)], "k long, grp long, v double")
    assert merge_into(spark, path, batch, keys=["k"], cow=True) == 1
    assert read_table(spark, path).count() == 1


def test_cow_conflict_retry_reconverges(spark, tmp_path):
    """A CAS loss mid-cow must re-read, re-prune against the NEW
    snapshot (whose files differ), and land both writers' rows."""
    path = str(tmp_path / "t")
    _seed(spark, path, n=2000, files=4)

    import etl_job_applify_spark.sinks.merge as merge_mod

    fired = {"done": False}
    real = merge_mod.commit_staged

    def racing(spark_, table_path_, base, populate):
        if not fired["done"]:
            fired["done"] = True
            interloper = spark.createDataFrame(
                [(3000, -9, 1.0)], "k long, grp long, v double"
            )
            merge_into(spark_, table_path_, interloper, keys=["k"])
        return real(spark_, table_path_, base, populate)

    merge_mod.commit_staged = racing
    try:
        v = merge_into(
            spark, path,
            spark.createDataFrame([(5, -1, 0.0)], "k long, grp long, v double"),
            keys=["k"], cow=True,
        )
    finally:
        merge_mod.commit_staged = real
    assert v == 3
    got = read_table(spark, path)
    assert got.filter("k = 3000").count() == 1  # interloper survived
    assert got.filter("grp = -1").count() == 1  # our update landed
