"""File-skipping statistics on versioned tables.

The contract under test: a selective range predicate over a Z-ordered
snapshot must (a) actually read FEWER files — asserted by counting, not
trusted — and (b) return exactly the rows a full scan + filter returns.
"""

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.sinks import (
    commit_version,
    read_table,
    snapshot_files,
    write_version,
)
from etl_job_applify_spark.sinks.stats import load_stats


def _table(spark, n=20000):
    # two independent uniform columns so Z-ordering (not lexicographic
    # luck) is what makes BOTH prune
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 997).alias("k1"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k2"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture(scope="module")
def zordered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vstats") / "tbl")
    df = _table(spark)
    v = write_version(
        df, path, cluster_by=(("k1", 0, 997), ("k2", 0, 1000)),
        num_files=16,
    )
    assert v == 1
    return path


def test_stats_sidecar_written_with_per_file_minmax(spark, zordered):
    doc = load_stats(zordered + "/snap_00000001")
    assert doc is not None and doc["stats_version"] == 1
    files = doc["files"]
    assert len(files) > 4, "need a multi-file snapshot to test skipping"
    for cols in files.values():
        for c in ("id", "k1", "k2"):
            assert cols[c]["min"] <= cols[c]["max"]


def test_selective_predicate_reads_fewer_files(spark, zordered):
    kept, total = snapshot_files(
        spark, zordered, ranges={"k1": (10, 30)}
    )
    assert total > 4
    assert len(kept) < total, (
        f"no files pruned: {len(kept)}/{total} — Z-order layout or "
        "stats consultation is broken"
    )
    # both clustered columns prune independently (the Z-order property)
    kept2, _ = snapshot_files(spark, zordered, ranges={"k2": (0, 40)})
    assert len(kept2) < total


def test_pruned_read_matches_full_scan_filter(spark, zordered):
    ranges = {"k1": (10, 30), "k2": (None, 600)}
    pruned = read_table(spark, zordered, ranges=ranges)
    full = read_table(spark, zordered).filter(
        (F.col("k1") >= 10) & (F.col("k1") <= 30) & (F.col("k2") <= 600)
    )
    assert pruned.count() == full.count() > 0
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0


def test_all_pruned_returns_empty_with_schema(spark, zordered):
    out = read_table(spark, zordered, ranges={"k1": (5000, 6000)})
    assert out.count() == 0
    assert out.columns == ["id", "k1", "k2", "v"]
    kept, total = snapshot_files(
        spark, zordered, ranges={"k1": (5000, 6000)}
    )
    assert kept == [] and total > 0


def test_missing_sidecar_degrades_to_full_scan(spark, tmp_path):
    import os

    path = str(tmp_path / "nostats")
    write_version(_table(spark, 2000), path)
    os.remove(path + "/snap_00000001/_stats.json")
    out = read_table(spark, path, ranges={"k1": (0, 5)})
    expect = read_table(spark, path).filter("k1 between 0 and 5")
    assert out.count() == expect.count() > 0
    kept, total = snapshot_files(spark, path, ranges={"k1": (0, 5)})
    assert len(kept) == total  # nothing pruned, nothing lost


def test_cas_commit_carries_stats_atomically(spark, tmp_path):
    path = str(tmp_path / "cas")
    v = commit_version(_table(spark, 5000).repartition(8), path, 0)
    assert v == 1
    assert load_stats(path + "/snap_00000001") is not None
    # unclustered files still prune on the monotonically-laid-out id
    kept, total = snapshot_files(spark, path, ranges={"id": (0, 10)})
    assert len(kept) <= total


def test_optimize_compacts_many_small_snapshot_files(spark, tmp_path):
    """Many-small-files snapshot (the streaming-sink pathology) →
    optimize publishes a NEW compacted version; the old one is intact."""
    import glob

    path = str(tmp_path / "opt")
    from etl_job_applify_spark.sinks import optimize_table

    write_version(_table(spark, 5000).repartition(40), path)
    before = glob.glob(path + "/snap_00000001/part-*.parquet")
    assert len(before) == 40
    v = optimize_table(spark, path)
    assert v == 2
    after = glob.glob(path + "/snap_00000002/part-*.parquet")
    assert len(after) < len(before)
    # same rows, old version untouched
    assert read_table(spark, path, version=2).count() == 5000
    assert len(glob.glob(path + "/snap_00000001/part-*.parquet")) == 40


def test_optimize_recluster_restores_skipping(spark, tmp_path):
    """An unclustered table prunes poorly; optimize with cluster_by
    rewrites the layout and the SAME predicate prunes afterwards."""
    path = str(tmp_path / "reclust")
    from etl_job_applify_spark.sinks import optimize_table

    # shuffle rows so k1 is scattered across files
    df = _table(spark, 20000).orderBy(F.xxhash64("id")).repartition(16)
    write_version(df, path)
    kept1, total1 = snapshot_files(spark, path, ranges={"k1": (10, 30)})
    # small target so the tiny fixture still yields a multi-file layout
    v = optimize_table(
        spark, path, cluster_by=(("k1", 0, 997), ("k2", 0, 1000)),
        target_file_bytes=20_000,
    )
    assert v == 2
    kept2, total2 = snapshot_files(spark, path, ranges={"k1": (10, 30)})
    assert len(kept2) / total2 < len(kept1) / total1
    out = read_table(spark, path, ranges={"k1": (10, 30)})
    expect = read_table(spark, path, version=1).filter("k1 between 10 and 30")
    assert out.count() == expect.count() > 0


def test_vacuum_prunes_old_versions_and_stale_debris(spark, tmp_path):
    import os

    from etl_job_applify_spark.sinks import (
        list_versions,
        read_table,
        vacuum_table,
    )

    path = str(tmp_path / "vac")
    for i in range(4):
        write_version(spark.range(i, i + 10).toDF("id"), path)
    # crash debris: a dead writer's staging dir and an orphan snapshot
    # that never got _SUCCESS
    os.makedirs(os.path.join(path, ".staging_deadbeef"))
    open(os.path.join(path, ".staging_deadbeef", "part-0.parquet"), "w").close()
    os.makedirs(os.path.join(path, "snap_00000099"))

    out = vacuum_table(spark, path, retain=2, min_age_s=0.0)
    assert out["snapshots_removed"] == [1, 2]
    assert out["debris_removed"] == [".staging_deadbeef", "snap_00000099"]
    assert list_versions(spark, path) == [3, 4]
    # newest retained versions stay readable; vacuumed version is gone
    assert read_table(spark, path, version=3).count() == 10
    with pytest.raises(FileNotFoundError):
        read_table(spark, path, version=1)


def test_vacuum_age_gate_protects_live_writer_staging(spark, tmp_path):
    import os

    from etl_job_applify_spark.sinks import vacuum_table

    path = str(tmp_path / "vac2")
    write_version(spark.range(5).toDF("id"), path)
    os.makedirs(os.path.join(path, ".staging_inflight"))
    # a fresh staging dir (an in-flight writer) survives the default age gate
    out = vacuum_table(spark, path, retain=1, min_age_s=3600.0)
    assert out == {"snapshots_removed": [], "debris_removed": []}
    assert os.path.isdir(os.path.join(path, ".staging_inflight"))


def test_vacuum_rejects_zero_retention(spark, tmp_path):
    from etl_job_applify_spark.sinks import vacuum_table

    with pytest.raises(ValueError, match="retain"):
        vacuum_table(spark, str(tmp_path / "x"), retain=0)


def test_timestamp_time_travel_and_history(spark, tmp_path):
    import os
    import time

    from etl_job_applify_spark.sinks import (
        read_table,
        table_history,
        version_as_of,
    )

    path = str(tmp_path / "tt")
    for i in range(3):
        write_version(spark.range(10 * (i + 1)).toDF("id"), path)
    # pin distinct, known commit instants (mtime of _SUCCESS is the
    # commit marker) so the test is sleep-free and deterministic
    base = time.time()
    for v, t in ((1, base - 300), (2, base - 200), (3, base - 100)):
        os.utime(os.path.join(path, f"snap_0000000{v}", "_SUCCESS"),
                 (t, t))

    ms = lambda s: int(s * 1000)
    assert version_as_of(spark, path, ms(base - 150)) == 2
    assert version_as_of(spark, path, ms(base)) == 3
    assert read_table(spark, path, as_of_ms=ms(base - 250)).count() == 10
    with pytest.raises(FileNotFoundError, match="at or before"):
        version_as_of(spark, path, ms(base - 400))
    with pytest.raises(ValueError, match="not both"):
        read_table(spark, path, version=1, as_of_ms=ms(base))

    hist = {r["version"]: (r["committed_at_ms"], r["n_files"], r["total_bytes"])
            for r in table_history(spark, path).collect()}
    assert sorted(hist) == [1, 2, 3]
    assert hist[1][0] == ms(base - 300)
    assert all(n > 0 and b > 0 for _, n, b in hist.values())


# --- Bloom-filter point-lookup sidecar (sinks/bloom.py) -------------------


@pytest.fixture(scope="module")
def bloomed(spark, tmp_path_factory):
    """k1-clustered table with a Bloom index on `id` — the column the
    layout does NOT cluster, where min/max stats cannot prune."""
    path = str(tmp_path_factory.mktemp("vbloom") / "tbl")
    v = write_version(
        _table(spark),
        path,
        cluster_by=(("k1", 0, 997),),
        num_files=16,
        bloom_columns=("id",),
    )
    assert v == 1
    return path


def test_bloom_sidecar_written(spark, bloomed):
    from etl_job_applify_spark.sinks.bloom import load_blooms
    from etl_job_applify_spark.sinks.versioned import _resolve_snapshot

    doc = load_blooms(_resolve_snapshot(spark, bloomed, None))
    assert doc["k"] == 4 and doc["m"] >= 64
    entry = doc["columns"]["id"]
    assert entry["dtype"] == "bigint"
    assert len(entry["files"]) == 16


def test_bloom_point_lookup_prunes_most_files(spark, bloomed):
    # an existing id lives in exactly one file; bloom should prune the
    # scan to that file plus rare false positives
    kept, total = snapshot_files(spark, bloomed, equals={"id": 12345})
    assert total == 16
    assert 1 <= len(kept) <= 4, f"kept {len(kept)} of {total}"


def test_bloom_absent_key_prunes_everything(spark, bloomed):
    kept, _ = snapshot_files(spark, bloomed, equals={"id": 10**15})
    assert kept == []
    assert read_table(spark, bloomed, equals={"id": 10**15}).count() == 0


def test_bloom_read_matches_full_scan_filter(spark, bloomed):
    keys = [7, 9999, 19998]
    got = (
        read_table(spark, bloomed, equals={"id": keys})
        .orderBy("id")
        .collect()
    )
    exp = (
        read_table(spark, bloomed)
        .filter(F.col("id").isin(keys))
        .orderBy("id")
        .collect()
    )
    assert got == exp and len(got) == 3


def test_bloom_composes_with_ranges(spark, bloomed):
    # id=12345 has k1 = 12345 % 997; a DISJOINT k1 range + that id must
    # intersect to zero files
    k1 = 12345 % 997
    lo, hi = (0, 50) if k1 > 100 else (900, 997)
    kept, _ = snapshot_files(
        spark, bloomed, ranges={"k1": (lo, hi)}, equals={"id": 12345}
    )
    both = read_table(
        spark, bloomed, ranges={"k1": (lo, hi)}, equals={"id": 12345}
    )
    assert both.count() == 0
    # and the compatible range keeps the row
    assert (
        read_table(
            spark, bloomed, ranges={"k1": (k1, k1)}, equals={"id": 12345}
        ).count()
        == 1
    )


def test_bloom_unindexed_column_degrades_to_full_scan(spark, bloomed):
    kept, total = snapshot_files(spark, bloomed, equals={"k2": 5})
    assert len(kept) == total == 16  # no index on k2 → nothing pruned
    n = read_table(spark, bloomed, equals={"k2": 5}).count()
    exp = read_table(spark, bloomed).filter(F.col("k2") == 5).count()
    assert n == exp


def test_bloom_false_positive_rate_bounded(spark, bloomed):
    # probe 200 absent keys; with 16 bits/row, k=4 the per-file fp rate
    # is ~0.2%, so across 16 files ~3% of probes may keep a file
    absent = [10**12 + i for i in range(200)]
    kept_files = 0
    from etl_job_applify_spark.sinks.bloom import prune_files_bloom
    from etl_job_applify_spark.sinks.versioned import _resolve_snapshot

    snap = _resolve_snapshot(spark, bloomed, None)
    for key in absent:
        kept, _ = prune_files_bloom(spark, snap, {"id": key})
        kept_files += len(kept)
    assert kept_files <= 40, f"{kept_files} false-positive file hits / 3200"


def test_bloom_build_budget_guard(spark, tmp_path):
    from etl_job_applify_spark.sinks.bloom import build_blooms
    import pytest as _pytest

    snap = str(tmp_path / "snap")
    spark.range(1000).write.parquet(snap)
    with _pytest.raises(ValueError, match="native bloom filter"):
        build_blooms(spark, snap, ["id"], max_total_positions=100)
    # within budget still builds
    assert build_blooms(spark, snap, ["id"]) is True


def test_clone_table_zero_copy_and_independent(spark, tmp_path):
    import glob
    import os

    from etl_job_applify_spark.sinks import (
        clone_table,
        read_table,
        snapshot_files,
        write_version,
    )

    src = str(tmp_path / "src")
    write_version(spark.range(1000), src, bloom_columns=("id",))
    dst = str(tmp_path / "dst")
    assert clone_table(spark, src, dst) == 1
    # zero-copy: every data file shares an inode with the source
    src_inodes = {
        os.path.basename(p): os.stat(p).st_ino
        for p in glob.glob(f"{src}/snap_00000001/part-*.parquet")
    }
    for p in glob.glob(f"{dst}/snap_00000001/part-*.parquet"):
        assert os.stat(p).st_ino == src_inodes[os.path.basename(p)]
    # same data; the bloom sidecar came along
    assert read_table(spark, dst).count() == 1000
    kept, total = snapshot_files(spark, dst, equals={"id": 5})
    assert len(kept) < total or total == 1
    # independence: writing to the clone never touches the source
    write_version(spark.range(5), dst)
    assert read_table(spark, src).count() == 1000
    assert read_table(spark, dst).count() == 5
    # refuse to clobber
    import pytest

    with pytest.raises(ValueError, match="not empty"):
        clone_table(spark, src, dst)


def test_clone_table_carries_table_properties(spark, tmp_path):
    """A clone of a bloom-indexed table must keep the recorded index:
    the NEXT commit on the clone rebuilds the sidecar instead of
    silently dropping it (the properties.py maintenance contract)."""
    from etl_job_applify_spark.sinks import clone_table, write_version
    from etl_job_applify_spark.sinks.bloom import load_blooms
    from etl_job_applify_spark.sinks.properties import get_table_properties

    src = str(tmp_path / "src")
    write_version(spark.range(100), src, bloom_columns=("id",))
    dst = str(tmp_path / "dst")
    clone_table(spark, src, dst)
    assert get_table_properties(dst).get("bloom_columns") == ["id"]
    write_version(spark.range(100, 150), dst)  # no explicit bloom arg
    assert load_blooms(f"{dst}/snap_00000002") is not None


def test_write_version_publishes_even_if_bloom_build_fails(
    spark, tmp_path, monkeypatch, caplog
):
    """The bloom sidecar builds AFTER the snapshot is live, so a build
    failure (e.g. the position budget) must degrade to 'no sidecar'
    with a warning — never surface as a failed publish that makes the
    caller retry into a duplicate version. FSCK repair then rebuilds."""
    import logging

    from etl_job_applify_spark.sinks import (
        fsck_table,
        read_table,
        table_history,
        write_version,
    )
    from etl_job_applify_spark.sinks import bloom as _bloom
    from etl_job_applify_spark.sinks.bloom import load_blooms

    tbl = str(tmp_path / "t")
    write_version(spark.range(100), tbl, bloom_columns=("id",))

    def boom(*a, **k):
        raise ValueError("bloom position budget exceeded (simulated)")

    monkeypatch.setattr(_bloom, "build_blooms", boom)
    with caplog.at_level(logging.WARNING):
        v = write_version(spark.range(100, 250), tbl, retain=10)
    assert v == 2  # published despite the sidecar failure
    assert any("bloom sidecar build failed" in r.message for r in caplog.records)
    assert load_blooms(f"{tbl}/snap_00000002") is None
    assert read_table(spark, tbl).count() == 150
    assert table_history(spark, tbl).count() == 2
    monkeypatch.undo()
    # FSCK flags the missing sidecar and repair restores pruning
    findings = fsck_table(spark, tbl, repair=True)
    assert any(f["kind"] == "missing-bloom" for f in findings)
    assert load_blooms(f"{tbl}/snap_00000002") is not None


def test_bloom_index_survives_merge_and_optimize(spark, tmp_path):
    """bloom_columns is a TABLE property: MERGE commits and OPTIMIZE
    rewrites rebuild the sidecar automatically — point lookups keep
    pruning after maintenance instead of silently degrading to scans."""
    import pyspark.sql.functions as F

    from etl_job_applify_spark.sinks import (
        merge_into,
        optimize_table,
        read_table,
        snapshot_files,
        write_version,
    )

    path = str(tmp_path / "t")
    write_version(
        spark.range(5000).select("id", (F.col("id") * 2.0).alias("v")),
        path,
        num_files=8,
        bloom_columns=("id",),
    )
    # MERGE (CAS path) — no bloom argument anywhere
    merge_into(
        spark,
        path,
        spark.range(10).select("id", (F.col("id") * 100.0).alias("v")),
        keys=["id"],
    )
    kept, total = snapshot_files(spark, path, equals={"id": 4321})
    assert total > 1 and len(kept) < total, "bloom lost after merge"
    assert read_table(spark, path, equals={"id": 4321}).count() == 1
    # OPTIMIZE (write_version path)
    optimize_table(spark, path, target_file_bytes=16 * 1024)
    kept2, total2 = snapshot_files(spark, path, equals={"id": 4321})
    assert total2 > 1 and len(kept2) < total2, "bloom lost after optimize"
    rows = read_table(spark, path, equals={"id": 9}).collect()
    assert len(rows) == 1 and rows[0]["v"] == 900.0  # merged value visible


def test_fsck_detects_and_repairs_sidecar_drift(spark, tmp_path):
    import json
    import os

    from etl_job_applify_spark.sinks import (
        fsck_table,
        snapshot_files,
        write_version,
    )

    path = str(tmp_path / "t")
    write_version(spark.range(2000), path, bloom_columns=("id",))
    assert fsck_table(spark, path) == []  # clean after commit
    snap = f"{path}/snap_00000001"
    # corrupt: drop the bloom sidecar, stale-ify stats
    os.remove(f"{snap}/_bloom.json")
    doc = json.load(open(f"{snap}/_stats.json"))
    doc["files"]["ghost.parquet"] = {}
    json.dump(doc, open(f"{snap}/_stats.json", "w"))
    kinds = {f["kind"] for f in fsck_table(spark, path)}
    assert kinds == {"stale-stats", "missing-bloom"}
    # repair rebuilds both; pruning works again
    fsck_table(spark, path, repair=True)
    assert fsck_table(spark, path) == []
    kept, total = snapshot_files(spark, path, equals={"id": 7})
    assert len(kept) <= total


def test_restore_table_rolls_back_with_history(spark, tmp_path):
    from etl_job_applify_spark.sinks import (
        list_versions,
        read_table,
        restore_table,
        snapshot_files,
        table_changes,
        write_version,
    )

    path = str(tmp_path / "t")
    write_version(spark.range(100), path, bloom_columns=("id",))   # v1
    write_version(spark.range(5), path)                            # v2 (bad)
    assert restore_table(spark, path, 1) == 3
    assert read_table(spark, path).count() == 100                  # restored
    assert list_versions(spark, path) == [1, 2, 3]                 # history kept
    # the restore is an ordinary delta for CDC consumers
    delta = table_changes(spark, path, 2, 3, keys=["id"])
    assert delta.filter("_change_type = 'insert'").count() == 95
    # sidecars carried: point lookup still prunes (or single file)
    kept, total = snapshot_files(spark, path, equals={"id": 3})
    assert len(kept) <= total
