"""Incremental near-dup dedup: persisted MinHash index build + probe.

The steady-state contract: a new batch probed against a prebuilt index
finds its planted near-dups of history WITHOUT recomputing any
historical signature, appends cleanly, and refuses parameter drift.
"""

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.dedup import (
    minhash_index_build,
    minhash_index_probe,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


def _corpus(spark):
    rows = [(i, f"{_BASE} unique filler sentence number {i} " * 2) for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch(spark):
    # 100/101: near-dups of history docs 7 and 23 (one word changed);
    # 102: novel text with no historical relative
    rows = [
        (100, f"{_BASE} unique filler sentence number 7 " * 2 + "extra"),
        (101, f"{_BASE} unique filler sentence number 23 " * 2 + "coda"),
        (102, "completely different content about distributed query engines "
              "and columnar execution with vectorized operators " * 3),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_finds_planted_cross_dups(spark, tmp_path):
    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    pairs = minhash_index_probe(
        spark, idx, _batch(spark), history, threshold=0.5
    ).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (7, 100) in got and (23, 101) in got
    assert all(r["jaccard"] >= 0.5 for r in pairs)
    assert not any(102 in p for p in got), "novel doc matched nothing"


def test_probe_skips_recrawled_self_match(spark, tmp_path):
    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    recrawl = history.filter(F.col("doc_id") == 7)
    pairs = minhash_index_probe(spark, idx, recrawl, history).collect()
    assert not any(r["a"] == r["b"] for r in pairs)


def test_append_then_probe_sees_both_generations(spark, tmp_path):
    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    # ingest the first batch into the index (the post-probe step)
    first = _batch(spark)
    minhash_index_build(
        first, idx, num_hashes=64, bands=16, mode="append"
    )
    # a second batch duplicating doc 100 (itself a near-dup of 7) must
    # match BOTH generations through one probe
    second = spark.createDataFrame(
        [(200, f"{_BASE} unique filler sentence number 7 " * 2 + "extra2")],
        "doc_id long, text string",
    )
    all_docs = history.unionByName(first)
    pairs = minhash_index_probe(spark, idx, second, all_docs).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (7, 200) in got and (100, 200) in got


def test_optimize_index_bounds_files_and_preserves_probes(spark, tmp_path):
    """N batch appends grow the index file count without bound (small-
    file rot on the most-read table of the pipeline); optimize_index
    compacts each band partition to a bounded bin count with probe
    results IDENTICAL before and after."""
    from etl_job_applify_spark.dedup import optimize_index
    from etl_job_applify_spark.dedup.incremental import _index_data_files

    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    # 5 small appends: novel docs so probe expectations stay stable
    for g in range(5):
        rows = [
            (1000 + g * 10 + i,
             f"generation {g} document {i} about unrelated topic "
             f"with its own vocabulary entirely " * 3)
            for i in range(4)
        ]
        gen = spark.createDataFrame(rows, "doc_id long, text string")
        minhash_index_build(gen, idx, num_hashes=64, bands=16, mode="append")
        history = history.unionByName(gen)

    before = minhash_index_probe(spark, idx, _batch(spark), history)
    got_before = {(r["a"], r["b"]) for r in before.collect()}
    files_grown = len(_index_data_files(idx))

    res = optimize_index(spark, idx)
    assert res["rows_before"] == res["rows_after"] == 70 * 16
    # bounded: one file per band bin (bins=1 at this size), and strictly
    # fewer than the append-grown count
    assert res["files_after"] <= 16 < files_grown == res["files_before"]

    after = minhash_index_probe(spark, idx, _batch(spark), history)
    assert {(r["a"], r["b"]) for r in after.collect()} == got_before
    assert (7, 100) in got_before and (23, 101) in got_before


def test_optimize_index_tombstones_purge_deleted_docs(spark, tmp_path):
    """A takedown: after compacting with tombstones, the purged doc no
    longer matches probes, other docs are untouched, and further
    appends still work."""
    from etl_job_applify_spark.dedup import optimize_index

    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    dead = spark.createDataFrame([(7,)], "doc bigint")
    res = optimize_index(spark, idx, tombstones=dead)
    assert res["rows_after"] == res["rows_before"] - 16  # 16 bands/doc

    live_history = history.filter(F.col("doc_id") != 7)
    pairs = minhash_index_probe(spark, idx, _batch(spark), live_history)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (23, 101) in got          # untouched doc still found
    assert not any(7 in p for p in got)  # purged doc gone
    # append after compaction: meta carried over, params still enforced
    extra = spark.createDataFrame(
        [(500, "fresh appended content after compaction " * 4)],
        "doc_id long, text string",
    )
    minhash_index_build(extra, idx, num_hashes=64, bands=16, mode="append")
    with pytest.raises(ValueError, match="was built with"):
        minhash_index_build(extra, idx, num_hashes=32, bands=16, mode="append")


def test_parameter_drift_refused(spark, tmp_path):
    idx = str(tmp_path / "idx")
    minhash_index_build(_corpus(spark), idx, num_hashes=64, bands=16, layout="flat")
    with pytest.raises(ValueError, match="built with"):
        minhash_index_build(
            _batch(spark), idx, num_hashes=128, bands=32, mode="append"
        )
    import json
    import os

    with open(os.path.join(idx, "_index_meta.json")) as fh:
        assert json.load(fh) == {"n": 3, "num_hashes": 64, "bands": 16}


def test_hot_template_bucket_capped(spark, tmp_path):
    """A bucket shared by more history docs than the cap is dropped:
    template boilerplate must cost a count, not a quadratic fanout."""
    idx = str(tmp_path / "idx")
    template = ("terms of service apply to all users of this site "
                "please read carefully before proceeding " * 3)
    history = spark.createDataFrame(
        [(i, template) for i in range(40)], "doc_id long, text string"
    )
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    probe = spark.createDataFrame(
        [(999, template)], "doc_id long, text string"
    )
    pairs = minhash_index_probe(
        spark, idx, probe, history, max_bucket_size=8
    )
    assert pairs.count() == 0


def test_streaming_incremental_dedup_across_microbatches(spark, tmp_path):
    """Two micro-batches through the streaming job: the second batch's
    near-dup of a FIRST-batch document must be detected by probing the
    index built from batch one — cross-batch dedup with no recompute."""
    import time

    from etl_job_applify_spark.streaming import run_incremental_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    gen1 = _corpus(spark)
    gen1.coalesce(1).write.parquet(str(src / "batch1.parquet"))
    time.sleep(1.1)  # file-source ordering is mtime-based
    _batch(spark).coalesce(1).write.parquet(str(src / "batch2.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    run_incremental_dedup_stream(stream, state)

    pairs = spark.read.parquet(state + "/pairs")
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (7, 100) in got and (23, 101) in got
    # batch lineage recorded; first batch probed an empty index → no rows
    assert {r["batch_id"] for r in pairs.collect()} == {1}
    # corpus and index carry both generations for the NEXT batch
    assert spark.read.parquet(state + "/corpus").count() == 53
    probe2 = spark.createDataFrame(
        [(200, _BASE + " unique filler sentence number 7 " * 2 + "x")],
        "doc_id long, text string",
    )
    from etl_job_applify_spark.dedup import minhash_index_probe

    found = minhash_index_probe(
        spark,
        state + "/index",
        probe2,
        spark.read.parquet(state + "/corpus"),
    ).collect()
    assert {(r["a"], r["b"]) for r in found} >= {(7, 200), (100, 200)}


def test_streaming_dedup_periodic_compaction_bounds_index_files(
    spark, tmp_path
):
    """compact_every: the streaming ingest's per-batch index appends are
    compacted in-loop, so the file count stays bounded while probes
    against the compacted index still find cross-batch dups."""
    import time

    from etl_job_applify_spark.dedup import minhash_index_probe
    from etl_job_applify_spark.dedup.incremental import _index_data_files
    from etl_job_applify_spark.streaming import run_incremental_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    gen1 = _corpus(spark)
    gen1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    for g in (2, 3, 4):
        time.sleep(1.1)
        rows = [
            (g * 1000 + i,
             f"gen {g} doc {i} with its own unrelated vocabulary " * 3)
            for i in range(3)
        ]
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{g}.parquet"))
    time.sleep(1.1)
    _batch(spark).coalesce(1).write.parquet(str(src / "b5.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    run_incremental_dedup_stream(stream, state, compact_every=2)

    # 5 appended batches each leave up to tasks x 16 band files;
    # compaction at epochs 1 and 3 resets to 16 bins, so the final count
    # is bounded by one compacted set plus the appends AFTER the last
    # compaction (epoch 4) — not the full five-batch accumulation
    n_files = len(_index_data_files(state + "/index"))
    assert n_files <= 16 * 4  # 16 compacted + <=3 tasks x 16 for epoch 4
    pairs = spark.read.parquet(state + "/pairs")
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (7, 100) in got and (23, 101) in got  # found via compacted index
    probe = spark.createDataFrame(
        [(500, _BASE + " unique filler sentence number 7 " * 2 + "x")],
        "doc_id long, text string",
    )
    found = minhash_index_probe(
        spark, state + "/index", probe,
        spark.read.parquet(state + "/corpus"),
    ).collect()
    assert {(r["a"], r["b"]) for r in found} >= {(7, 500), (100, 500)}


def test_optimize_index_recovers_from_stale_staging_dirs(spark, tmp_path):
    """Crash recovery: leftovers from an interrupted compaction (stale
    __compact or __old directories) must not break or corrupt the next
    optimize_index run."""
    import os

    from etl_job_applify_spark.dedup import optimize_index
    from etl_job_applify_spark.dedup.incremental import minhash_index_probe

    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    before = minhash_index_probe(spark, idx, _batch(spark), history)
    got_before = {(r["a"], r["b"]) for r in before.collect()}

    # simulate a crash that left both scratch dirs behind
    os.makedirs(idx + "__compact/garbage", exist_ok=True)
    open(idx + "__compact/partial.parquet", "w").write("junk")
    os.makedirs(idx + "__old", exist_ok=True)
    open(idx + "__old/stale.parquet", "w").write("junk")

    res = optimize_index(spark, idx)
    assert res["rows_after"] == 50 * 16
    assert not os.path.exists(idx + "__compact")
    assert not os.path.exists(idx + "__old")
    after = minhash_index_probe(spark, idx, _batch(spark), history)
    assert {(r["a"], r["b"]) for r in after.collect()} == got_before


def test_interrupted_swap_recovers_instead_of_refounding(spark, tmp_path):
    """The fatal crash window: between the swap's two renames there is
    NO live index — a complete __compact (and the renamed __old) sit
    beside the missing path. Every entry point must finish the swap;
    in particular the streaming ingest's first-batch branch must NOT
    treat it as 'no index yet' and silently re-found empty."""
    import os

    from etl_job_applify_spark.dedup import optimize_index
    from etl_job_applify_spark.dedup.incremental import (
        _recover_index,
        minhash_index_probe,
    )

    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    optimize_index(spark, idx)  # produce a compacted layout to copy

    # simulate the mid-swap crash: live index renamed away, compacted
    # copy still at __compact
    import shutil

    shutil.copytree(idx, idx + "__compact")
    os.rename(idx, idx + "__old")
    assert not os.path.exists(idx)

    # probe transparently completes the swap and still finds the dups
    pairs = minhash_index_probe(spark, idx, _batch(spark), history)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (7, 100) in got and (23, 101) in got
    assert os.path.exists(idx) and not os.path.exists(idx + "__old")
    assert not os.path.exists(idx + "__compact")

    # rollback branch: only __old survives (staging incomplete/absent)
    os.rename(idx, idx + "__old")
    _recover_index(idx)
    assert os.path.exists(idx)  # previous live index restored
    pairs2 = minhash_index_probe(spark, idx, _batch(spark), history)
    assert {(r["a"], r["b"]) for r in pairs2.collect()} >= {(7, 100)}


def test_optimize_index_rejects_non_local_paths(spark):
    import pytest

    from etl_job_applify_spark.dedup import optimize_index

    with pytest.raises(ValueError, match="local index path"):
        optimize_index(spark, "s3://bucket/index")

def test_recover_cleans_stale_complete_compact_beside_live_index(
    spark, tmp_path
):
    """A crash AFTER the staging meta write but BEFORE the swap leaves a
    COMPLETE __compact next to a live index. It must be removed at the
    next entry point: left in place it is a stale snapshot, and if the
    live directory were ever lost later, recovery would promote it and
    silently roll the index back past every append made since."""
    import os
    import shutil

    from etl_job_applify_spark.dedup.incremental import (
        _recover_index,
        minhash_index_probe,
    )

    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    # stale-but-complete staging: full copy with its meta, live intact
    shutil.copytree(idx, idx + "__compact")
    assert os.path.exists(idx + "__compact/_index_meta.json")

    # append a new generation, then probe — the probe's recovery pass
    # must clear the stale staging while leaving the appended index
    extra = spark.createDataFrame(
        [(300, _BASE + " unique filler sentence number 7 " * 2 + "y")],
        "doc_id long, text string",
    )
    minhash_index_build(extra, idx, num_hashes=64, bands=16, mode="append")
    assert not os.path.exists(idx + "__compact")

    probe = spark.createDataFrame(
        [(400, _BASE + " unique filler sentence number 7 " * 2 + "z")],
        "doc_id long, text string",
    )
    all_docs = history.unionByName(extra)
    got = {
        (r["a"], r["b"])
        for r in minhash_index_probe(spark, idx, probe, all_docs).collect()
    }
    # both generations present — nothing was rolled back
    assert {(7, 400), (300, 400)} <= got


def test_optimize_index_purge_everything_publishes_empty_index(
    spark, tmp_path
):
    """A retention sweep that tombstones EVERY document must publish a
    valid empty index (zero data files would otherwise make the
    schema-inferring staging read abort the optimize), and later probes
    and appends against the empty index must still work."""
    from etl_job_applify_spark.dedup import optimize_index
    from etl_job_applify_spark.dedup.incremental import minhash_index_probe

    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    dead = history.select(F.col("doc_id").alias("doc"))
    res = optimize_index(spark, idx, tombstones=dead)
    assert res["rows_before"] == 50 * 16 and res["rows_after"] == 0

    # empty index is probe-able (explicit-schema read) and finds nothing
    empty_hist = history.filter(F.lit(False))
    pairs = minhash_index_probe(spark, idx, _batch(spark), empty_hist)
    assert pairs.count() == 0

    # and the lifecycle continues: append re-populates, probe finds dups
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


def test_probe_broadcast_batch_knob_off_same_results_no_forced_hint(
    spark, tmp_path
):
    """broadcast_batch=False: results identical, and the plan contains
    no hint-forced broadcast of batch-derived relations — a heavy crawl
    day breaks the 'batch is small' premise and AQE must size the joins
    instead (triangles.py broadcast_closing discipline)."""
    idx = str(tmp_path / "idx")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    off = minhash_index_probe(
        spark, idx, _batch(spark), history, broadcast_batch=False
    )
    # the ANALYZED plan (pre cache-substitution — persisted subtrees
    # from other runs would otherwise leak their hinted plans into the
    # optimized string) must carry no hint node anywhere. AQE may still
    # CHOOSE a physical broadcast from runtime sizes — that's the point
    # — but nothing may force it.
    analyzed = off._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed
    rows_off = {(r["a"], r["b"], round(r["jaccard"], 9)) for r in off.collect()}
    on = minhash_index_probe(
        spark, idx, _batch(spark), history, broadcast_batch=True
    )
    rows_on = {(r["a"], r["b"], round(r["jaccard"], 9)) for r in on.collect()}
    assert rows_on == rows_off and (7, 100) in {(a, b) for a, b, _ in rows_on}
    # and the default (knob on) DOES hint — the premise documented
    assert "ResolvedHint" in on._jdf.queryExecution().analyzed().toString()


def test_immediate_delete_hides_doc_from_probe(spark, tmp_path):
    """minhash_index_delete must stop a history doc surfacing as a
    candidate IMMEDIATELY (before any compaction); optimize_index then
    purges its band entries physically and clears the tombstone set."""
    import os

    from etl_job_applify_spark.dedup import (
        minhash_index_delete,
        optimize_index,
    )

    idx = str(tmp_path / "idx_del")
    history = _corpus(spark)
    minhash_index_build(history, idx, num_hashes=64, bands=16, layout="flat")
    out = minhash_index_delete(spark, idx, [7])
    assert out["n_tombstoned"] == 1

    pairs = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history, threshold=0.5
        ).collect()
    }
    assert (7, 100) not in pairs, "deleted doc still surfaced"
    assert (23, 101) in pairs, "unrelated doc was lost"

    # re-delete is a deduplicated no-op
    assert minhash_index_delete(spark, idx, [7, 9999])["n_tombstoned"] == 1
    assert minhash_index_delete(spark, idx, [7])["n_tombstoned"] == 0

    optimize_index(spark, idx)
    assert not os.path.isdir(os.path.join(idx, "_deletes"))
    entries = spark.read.parquet(idx)
    assert entries.filter(F.col("doc") == 7).count() == 0
    pairs2 = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history, threshold=0.5
        ).collect()
    }
    assert pairs2 == pairs


def test_versioned_immediate_delete(spark, tmp_path):
    """Versioned layout: the delete snapshot must hide the doc from
    probes at once, survive an append, and compaction must purge both
    the entries and the delete snapshot."""
    from etl_job_applify_spark.dedup import (
        minhash_index_delete,
        optimize_index,
    )
    from etl_job_applify_spark.dedup.incremental import _vidx_read
    from etl_job_applify_spark.sinks.versioned import snapshot_members

    idx = str(tmp_path / "vidx_del")
    history = _corpus(spark)
    minhash_index_build(
        history, idx, num_hashes=64, bands=16, layout="versioned"
    )
    assert minhash_index_delete(spark, idx, [23])["n_tombstoned"] == 1
    pairs = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history, threshold=0.5
        ).collect()
    }
    assert (23, 101) not in pairs and (7, 100) in pairs

    optimize_index(spark, idx)
    params, entries, live = _vidx_read(spark, idx)
    assert len(live) == 1
    assert "_deletes" not in snapshot_members(spark, live[0])
    assert entries.filter(F.col("doc") == 23).count() == 0
    pairs2 = {
        (r["a"], r["b"])
        for r in minhash_index_probe(
            spark, idx, _batch(spark), history, threshold=0.5
        ).collect()
    }
    assert pairs2 == pairs


def test_default_layout_is_versioned(spark, tmp_path):
    """A build with no layout argument founds the versioned CAS layout
    (flat is an explicit local-filesystem opt-in)."""
    from etl_job_applify_spark.dedup import minhash_index_build
    from etl_job_applify_spark.sinks.versioned import list_versions

    idx = str(tmp_path / "defidx")
    minhash_index_build(_corpus(spark), idx, num_hashes=64, bands=16)
    assert list_versions(spark, idx) == [1]
    import os

    assert not os.path.exists(os.path.join(idx, "_index_meta.json"))


def test_streaming_dedup_file_pressure_policy_compacts(spark, tmp_path):
    """compact_max_files — the dedup family's POLICY LOOP (the
    ``reindex_skew_threshold`` twin): per-batch appends drive the live
    data-file count over the threshold, the trigger fires at the epoch
    boundary, and the post-action signal recovers (final count is back
    under the threshold, where 5 uncompacted appends alone leave >= 80
    per-band files). Probes against the policy-compacted index still
    find cross-batch dups."""
    import time

    from etl_job_applify_spark.dedup import minhash_index_probe
    from etl_job_applify_spark.sinks.versioned import fs_count_data_files
    from etl_job_applify_spark.streaming import run_incremental_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    _corpus(spark).coalesce(1).write.parquet(str(src / "b1.parquet"))
    for g in (2, 3, 4):
        time.sleep(1.1)
        rows = [
            (g * 1000 + i,
             f"gen {g} doc {i} with its own unrelated vocabulary " * 3)
            for i in range(3)
        ]
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{g}.parquet"))
    time.sleep(1.1)
    _batch(spark).coalesce(1).write.parquet(str(src / "b5.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    run_incremental_dedup_stream(stream, state, compact_max_files=40)

    # the signal recovered: a 5-append run leaves >= 5 x 16 band files
    # without the policy, so the trigger must have fired at least once,
    # and the final (post-compaction) count sits under the threshold
    assert fs_count_data_files(spark, state + "/index") <= 40
    pairs = spark.read.parquet(state + "/pairs")
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (7, 100) in got and (23, 101) in got
    probe = spark.createDataFrame(
        [(500, _BASE + " unique filler sentence number 7 " * 2 + "x")],
        "doc_id long, text string",
    )
    found = minhash_index_probe(
        spark, state + "/index", probe,
        spark.read.parquet(state + "/corpus"),
    ).collect()
    assert {(r["a"], r["b"]) for r in found} >= {(7, 500), (100, 500)}
