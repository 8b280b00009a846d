"""Versioned (object-store-capable) dedup index layout: log-structured
CAS-committed snapshots (dedup/incremental.py versioned section).

Contract: probe results identical to the flat layout; appends are CAS
commits with optional epoch-fence replay detection; compaction
publishes through commit_staged with a watermark marker and prunes
AFTER commit (crash windows repaired idempotently at every entry
point); no os.rename of live data anywhere in the lifecycle.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.dedup import (
    is_versioned_index,
    minhash_index_build,
    minhash_index_probe,
    optimize_index,
    versioned_index_append,
    versioned_index_has_epoch,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


def _corpus(spark):
    rows = [
        (i, f"{_BASE} unique filler sentence number {i} " * 2)
        for i in range(50)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch(spark):
    rows = [
        (100, f"{_BASE} unique filler sentence number 7 " * 2 + "extra"),
        (101, f"{_BASE} unique filler sentence number 23 " * 2 + "coda"),
        (102, "completely different content about distributed query "
              "engines and columnar execution " * 3),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _snaps(idx):
    return sorted(
        d for d in os.listdir(idx) if d.startswith("snap_")
    ) if os.path.exists(idx) else []


def test_versioned_probe_matches_flat_layout(spark, tmp_path):
    flat, vers = str(tmp_path / "flat"), str(tmp_path / "vers")
    history = _corpus(spark)
    minhash_index_build(history, flat, num_hashes=64, bands=16, layout="flat")
    minhash_index_build(
        history, vers, num_hashes=64, bands=16, layout="versioned"
    )
    assert is_versioned_index(spark, vers)
    assert not is_versioned_index(spark, flat)
    got_flat = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in minhash_index_probe(
            spark, flat, _batch(spark), history
        ).collect()
    }
    got_vers = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in minhash_index_probe(
            spark, vers, _batch(spark), history
        ).collect()
    }
    assert got_vers == got_flat
    assert (7, 100) in {(a, b) for a, b, _ in got_vers}


def test_versioned_append_and_param_drift(spark, tmp_path):
    idx = str(tmp_path / "vers")
    history = _corpus(spark)
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, layout="versioned"
    )
    first = _batch(spark)
    # append routes through the versioned path automatically
    minhash_index_build(first, idx, num_hashes=64, bands=16, mode="append")
    assert len(_snaps(idx)) == 2  # one cheap snapshot per batch
    second = spark.createDataFrame(
        [(200, f"{_BASE} unique filler sentence number 7 " * 2 + "extra2")],
        "doc_id long, text string",
    )
    all_docs = history.unionByName(first)
    got = {
        (r["a"], r["b"])
        for r in minhash_index_probe(spark, idx, second, all_docs).collect()
    }
    assert (7, 200) in got and (100, 200) in got  # both generations hit
    with pytest.raises(ValueError, match="was built with"):
        minhash_index_build(
            second, idx, num_hashes=32, bands=16, mode="append"
        )


def test_versioned_epoch_fence_skips_replay(spark, tmp_path):
    """The exactly-once primitive: appending the same batch twice under
    one epoch mark commits ONCE — the replay is detected off the live
    snapshots and skipped, so index row counts (and probe results)
    are replay-invariant."""
    idx = str(tmp_path / "vers")
    history = _corpus(spark)
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, layout="versioned"
    )
    batch = _batch(spark)
    v = versioned_index_append(batch, idx, epoch_mark="_epoch_dedup_1")
    assert v == 2
    assert versioned_index_has_epoch(spark, idx, "_epoch_dedup_1")
    # replay: same epoch mark -> skipped, nothing committed
    assert versioned_index_append(
        batch, idx, epoch_mark="_epoch_dedup_1"
    ) is None
    assert len(_snaps(idx)) == 2
    rows = spark.read.parquet(*[f"{idx}/{s}" for s in _snaps(idx)]).count()
    assert rows == 53 * 16  # one entry per doc per band, NO duplicates


def test_versioned_compaction_folds_prunes_and_carries_fences(
    spark, tmp_path
):
    idx = str(tmp_path / "vers")
    history = _corpus(spark)
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, layout="versioned"
    )
    for g in range(3):
        rows = [
            (1000 + g * 10 + i,
             f"generation {g} doc {i} with its own vocabulary " * 3)
            for i in range(4)
        ]
        gen = spark.createDataFrame(rows, "doc_id long, text string")
        versioned_index_append(gen, idx, epoch_mark=f"_epoch_dedup_{g}")
        history = history.unionByName(gen)
    before = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history
        ).collect()
    }
    assert len(_snaps(idx)) == 4
    res = optimize_index(spark, idx)  # auto-routes to the CAS path
    assert res["rows_before"] == res["rows_after"] == 62 * 16
    from etl_job_applify_spark.dedup.incremental import _vidx_recover_live

    # folded + live set reduced to the compacted snapshot; the folded
    # snapshots stay on disk for one grace cycle (in-flight readers)
    assert [p.rsplit("/", 1)[1] for p in _vidx_recover_live(spark, idx)] == [
        "snap_00000005"
    ]
    assert _snaps(idx)[0] == "snap_00000001"  # grace-kept, not live
    # epoch fences survive compaction -> replay detection still works
    for g in range(3):
        assert versioned_index_has_epoch(spark, idx, f"_epoch_dedup_{g}")
    after = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history
        ).collect()
    }
    assert after == before and (7, 100) in after
    # a second compaction supersedes the first: its folded snapshots
    # are then physically pruned
    optimize_index(spark, idx)
    assert "snap_00000001" not in _snaps(idx)
    assert after == {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history
        ).collect()
    }


def test_versioned_crash_between_commit_and_prune_recovers(spark, tmp_path):
    """Folded-but-unpruned snapshots (a crash between a compaction's
    commit and its prune — and, since the grace window, also the NORMAL
    state for one compaction cycle) must never be double-counted: the
    watermark marker, not the directory listing, is the source of
    truth for the live set."""
    from etl_job_applify_spark.dedup.incremental import _vidx_recover_live

    idx = str(tmp_path / "vers")
    history = _corpus(spark)
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, layout="versioned"
    )
    versioned_index_append(_batch(spark), idx)
    history2 = history.unionByName(_batch(spark))
    optimize_index(spark, idx)
    # the folded pre-compaction snapshots are still on disk (grace)…
    assert _snaps(idx) == [
        "snap_00000001", "snap_00000002", "snap_00000003"
    ]
    # …but the live set is exactly the compacted snapshot, so the probe
    # must not double-count the folded entries
    probe = spark.createDataFrame(
        [(300, _BASE + " unique filler sentence number 7 " * 2 + "x")],
        "doc_id long, text string",
    )
    got = {
        (r["a"], r["b"])
        for r in minhash_index_probe(spark, idx, probe, history2).collect()
    }
    assert (7, 300) in got and (100, 300) in got
    assert [p.rsplit("/", 1)[1] for p in _vidx_recover_live(spark, idx)] == [
        "snap_00000003"
    ]


def test_versioned_tombstone_purge_to_empty_stays_probeable(spark, tmp_path):
    idx = str(tmp_path / "vers")
    history = _corpus(spark)
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, layout="versioned"
    )
    dead = history.select(F.col("doc_id").alias("doc"))
    res = optimize_index(spark, idx, tombstones=dead)
    assert res["rows_before"] == 50 * 16 and res["rows_after"] == 0
    empty_hist = history.filter(F.lit(False))
    assert minhash_index_probe(
        spark, idx, _batch(spark), empty_hist
    ).count() == 0
    # lifecycle continues after the purge
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, mode="append"
    )
    got = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history
        ).collect()
    }
    assert (7, 100) in got and (23, 101) in got


def _stream_state(spark, state):
    from etl_job_applify_spark.sinks.versioned import read_log_table

    pairs = {
        (r["a"], r["b"], r["batch_id"])
        for r in read_log_table(spark, state + "/pairs").collect()
    }
    corpus = {
        r["doc_id"]
        for r in read_log_table(spark, state + "/corpus").collect()
    }
    idx_rows = spark.read.parquet(
        *[f for f in __import__("glob").glob(state + "/index/snap_*")]
    ).count()
    return pairs, corpus, idx_rows


def test_streaming_exactly_once_replay_invariant(spark, tmp_path):
    """Exactly-once contract: re-delivering EVERY micro-batch (a full
    second run of the stream over the same source) leaves pairs,
    corpus, and index bit-identical — every epoch is fenced at every
    table, so replays commit nothing."""
    import time

    from etl_job_applify_spark.streaming import run_incremental_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    _corpus(spark).coalesce(1).write.parquet(str(src / "batch1.parquet"))
    time.sleep(1.1)
    _batch(spark).coalesce(1).write.parquet(str(src / "batch2.parquet"))

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_incremental_dedup_stream(stream, state, exactly_once=True)

    run()
    first = _stream_state(spark, state)
    pairs, corpus, idx_rows = first
    assert {(7, 100), (23, 101)} <= {(a, b) for a, b, _ in pairs}
    assert not any(102 in (a, b) for a, b, _ in pairs)
    assert len(corpus) == 53 and idx_rows == 53 * 16

    run()  # full at-least-once replay: same files, same epoch ids
    assert _stream_state(spark, state) == first


def test_streaming_exactly_once_founding_crash_window(spark, tmp_path):
    """The founding batch's crash window: index founded (epoch mark
    committed) but corpus append lost. The replay must append the
    corpus WITHOUT inventing intra-batch pairs (a crash-free run
    records no pairs for the founding batch) and without duplicating
    index entries."""
    import glob
    import shutil
    import time

    from etl_job_applify_spark.sinks.versioned import read_log_table
    from etl_job_applify_spark.streaming import run_incremental_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    # founding corpus contains near-identical docs -> a naive replay
    # probe WOULD find intra-batch pairs
    rows = [(i, f"{_BASE} shared body {i % 2} " * 3) for i in range(10)]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_incremental_dedup_stream(stream, state, exactly_once=True)

    run()
    # simulate the crash: drop the corpus and pairs logs entirely, as
    # if the process died right after the index's founding commit
    shutil.rmtree(state + "/corpus")
    shutil.rmtree(state + "/pairs", ignore_errors=True)
    run()  # replay of epoch 0
    assert read_log_table(spark, state + "/corpus").count() == 10
    # no retroactive intra-batch pairs
    try:
        n_pairs = read_log_table(spark, state + "/pairs").count()
    except FileNotFoundError:
        n_pairs = 0
    assert n_pairs == 0
    idx_rows = spark.read.parquet(
        *glob.glob(state + "/index/snap_*")
    ).count()
    assert idx_rows == 10 * 16  # founding entries exactly once


def test_log_table_append_read_fence_and_empty_batches(spark, tmp_path):
    """The generic log-table API (sinks/versioned.py): CAS appends
    accumulate as snapshots, marked appends fence replays, and a log
    whose batches are ALL empty still reads (recorded schema)."""
    import pytest

    from etl_job_applify_spark.sinks.versioned import (
        append_log_version,
        log_has_mark,
        log_snapshots,
        read_log_table,
    )

    log = str(tmp_path / "log")
    with pytest.raises(FileNotFoundError):
        read_log_table(spark, log)

    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b2 = spark.createDataFrame([(3, "c")], "id long, v string")
    assert append_log_version(b1, log, ["_epoch_w_0"]) == 1
    assert append_log_version(b2, log, ["_epoch_w_1"]) == 2
    assert {r["id"] for r in read_log_table(spark, log).collect()} == {1, 2, 3}
    assert log_has_mark(spark, log, "_epoch_w_0")
    assert not log_has_mark(spark, log, "_epoch_w_9")
    # replay fenced: nothing committed
    assert append_log_version(b2, log, ["_epoch_w_1"]) is None
    assert len(log_snapshots(spark, log)) == 2
    # unmarked appends always commit (no fence)
    assert append_log_version(b2, log) == 3

    # all-empty log stays readable via the recorded schema
    empty_log = str(tmp_path / "empty")
    empty = b1.filter("id < 0")
    assert append_log_version(empty, empty_log, ["_epoch_w_0"]) == 1
    got = read_log_table(spark, empty_log)
    assert got.count() == 0 and got.columns == ["id", "v"]


def test_versioned_dedup_delete_then_reappend_probes_again(spark, tmp_path):
    """A doc id deleted and then re-appended (erase-then-reingest) must
    surface as a probe candidate again: tombstones are version-scoped,
    so only entries committed BEFORE the delete stay suppressed."""
    from etl_job_applify_spark.dedup import minhash_index_delete

    idx = str(tmp_path / "vers_reapp")
    history = _corpus(spark)
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, layout="versioned"
    )
    minhash_index_delete(spark, idx, [7, 23])
    # tombstones took effect: the near-dups of 7/23 no longer pair
    got = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history
        ).collect()
    }
    assert (7, 100) not in got and (23, 101) not in got
    # re-ingest doc 7 (same content) AFTER the delete
    versioned_index_append(
        history.filter(F.col("doc_id") == 7), idx
    )
    got = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history
        ).collect()
    }
    assert (7, 100) in got          # the re-appended entry is live again
    assert (23, 101) not in got     # the still-deleted doc stays dark
    # compaction folds the mixed history without resurrecting doc 23
    optimize_index(spark, idx)
    got = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history
        ).collect()
    }
    assert (7, 100) in got and (23, 101) not in got


def test_versioned_dedup_auto_compaction_threshold(spark, tmp_path):
    """max_snapshots on versioned_index_append: live snapshot count
    stays bounded by auto-triggered compaction; probe results equal the
    unbounded index's."""
    from etl_job_applify_spark.dedup.incremental import _vidx_recover_live

    idx = str(tmp_path / "auto_vers")
    history = _corpus(spark)
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, layout="versioned"
    )
    for g in range(6):
        rows = [
            (2000 + g * 10 + i,
             f"generation {g} doc {i} with its own vocabulary " * 3)
            for i in range(3)
        ]
        gen = spark.createDataFrame(rows, "doc_id long, text string")
        versioned_index_append(gen, idx, max_snapshots=3)
        history = history.unionByName(gen)
        assert len(_vidx_recover_live(spark, idx)) <= 3
    got = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history
        ).collect()
    }
    assert (7, 100) in got and (23, 101) in got


def test_minhash_index_stats_lifecycle(spark, tmp_path):
    """DESCRIBE INDEX on the dedup index: the entries == docs x bands
    invariant holds through append + delete + compaction, tombstone
    accounting is exact, and the bucket-pressure fields are sane."""
    from etl_job_applify_spark.dedup import (
        minhash_index_delete,
        minhash_index_stats,
    )

    idx = str(tmp_path / "vidx_stats")
    minhash_index_build(
        _corpus(spark), idx, num_hashes=64, bands=16, layout="versioned"
    )
    versioned_index_append(_batch(spark), idx)
    minhash_index_delete(spark, idx, [0, 1])
    st = minhash_index_stats(spark, idx)
    assert st["layout"] == "versioned" and st["live_snapshots"] == 3
    assert st["n_docs"] == 51 and st["n_entries"] == 51 * 16
    assert st["n_pending_tombstones"] == 2
    assert st["num_hashes"] == 64 and st["bands"] == 16
    assert st["max_bucket"] >= 1 and st["mean_bucket"] >= 1.0
    optimize_index(spark, idx)
    st2 = minhash_index_stats(spark, idx)
    assert st2["n_pending_tombstones"] == 0
    assert st2["n_entries"] == 51 * 16 and st2["live_snapshots"] == 1


def test_dedup_cdc_atomic_snapshot_and_replay(spark, tmp_path):
    """minhash_index_apply_cdc: one CAS snapshot carries tombstones +
    new band entries + fence. Delete+re-add in one batch lands as the
    re-add; unknown delete ids are ignored; a replayed epoch is a
    whole-batch no-op — including after a LATER epoch deleted one of
    the replayed adds (the two-commit divergence)."""
    from etl_job_applify_spark.dedup import (
        minhash_index_apply_cdc,
        minhash_index_build,
        minhash_index_stats,
    )
    from etl_job_applify_spark.dedup.incremental import _vidx_read

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta epsilon zeta tok{i} "
                f"w{i % 3} f{i % 5} common text body row")
            for i in range(1, 21)
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "didx_cdc")
    minhash_index_build(docs, idx, num_hashes=16, bands=4)
    batch = spark.createDataFrame(
        [(3, "replacement text body gamma delta epsilon zeta", "add"),
         (3, None, "delete"),
         (5, None, "delete"), (999, None, "delete"),
         (21, "fresh doc alpha beta gamma delta epsilon zeta", "add")],
        "doc_id long, text string, op string",
    )
    out = minhash_index_apply_cdc(batch, idx, epoch_mark="_epoch_d_1")
    assert out["n_added"] == 2 and out["n_tombstoned"] == 2
    st = minhash_index_stats(spark, idx)
    assert st["n_docs"] == 20  # -5, 3 replaced, +21
    _p, entries, _l = _vidx_read(spark, idx)
    live = {r["doc"] for r in entries.collect()}
    assert 5 not in live and 21 in live and 3 in live
    # the surviving 3 is the re-add: exactly bands entries, all from
    # the CDC snapshot (version 2)
    assert entries.filter("doc = 3").count() == 4

    # replay: fenced whole-batch no-op
    assert minhash_index_apply_cdc(batch, idx, epoch_mark="_epoch_d_1") is None
    assert minhash_index_stats(spark, idx)["n_docs"] == 20

    # later epoch deletes one of epoch 1's adds; replaying epoch 1
    # must not resurrect it
    b2 = spark.createDataFrame(
        [(21, None, "delete")], "doc_id long, text string, op string"
    )
    minhash_index_apply_cdc(b2, idx, epoch_mark="_epoch_d_2")
    assert minhash_index_apply_cdc(batch, idx, epoch_mark="_epoch_d_1") is None
    _p2, e2, _l2 = _vidx_read(spark, idx)
    assert 21 not in {r["doc"] for r in e2.collect()}
    assert minhash_index_stats(spark, idx)["n_docs"] == 19


def test_dedup_cdc_upsert_and_batch_dedup(spark, tmp_path):
    """CDC adds are upserts: a plain re-add of a live doc (no delete
    row) tombstones the old version in the same snapshot — exactly
    ``bands`` live entries per doc — and duplicate add rows for one
    id reduce to ONE deterministic winner."""
    from etl_job_applify_spark.dedup import (
        minhash_index_apply_cdc,
        minhash_index_build,
        minhash_index_stats,
    )
    from etl_job_applify_spark.dedup.incremental import _vidx_read

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i} common body row")
         for i in range(1, 11)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "didx_upsert")
    minhash_index_build(docs, idx, num_hashes=16, bands=4)
    batch = spark.createDataFrame(
        # doc 3 is LIVE, re-added with no delete row; doc 100 is new
        # but appears twice with different texts
        [(3, "rewritten body gamma delta epsilon", "add"),
         (100, "first candidate text alpha beta", "add"),
         (100, "second candidate text zeta eta", "add")],
        "doc_id long, text string, op string",
    )
    out = minhash_index_apply_cdc(batch, idx, epoch_mark="_u1")
    assert out["n_added"] == 2 and out["n_tombstoned"] == 1
    st = minhash_index_stats(spark, idx)
    assert st["n_docs"] == 11  # 10 - 1 replaced + 2
    assert st["n_entries"] == 11 * 4  # the invariant double-serve breaks
    _p, entries, _l = _vidx_read(spark, idx)
    assert entries.filter("doc = 3").count() == 4
    assert entries.filter("doc = 100").count() == 4
    # deterministic winner: re-applying under a new epoch is stable
    sig1 = sorted(
        (r["band"], r["bucket"]) for r in entries.filter("doc = 100").collect()
    )
    minhash_index_apply_cdc(batch, idx, epoch_mark="_u2")
    _p2, e2, _l2 = _vidx_read(spark, idx)
    assert minhash_index_stats(spark, idx)["n_docs"] == 11
    assert sorted(
        (r["band"], r["bucket"]) for r in e2.filter("doc = 100").collect()
    ) == sig1
