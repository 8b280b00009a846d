"""Persisted IVF/PQ vector index lifecycle (similarity/vector_index.py).

Contract, mirroring the text index's (tests/test_text_index.py):
index-served ANN results are BIT-IDENTICAL to the recompute kernels
pinned to the same quantizer (shared assignment/probe/scoring
expressions), appends reuse the founding quantizer, deletes take effect
immediately and purge at compaction, crash windows recover at every
entry point, and concurrent CAS deletes serialize without lost updates.
"""

import os
import threading

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.similarity import (
    ann_topk_ivf,
    ann_topk_ivfpq,
    cosine_topk,
    optimize_vector_index,
    vector_index_build,
    vector_index_delete,
    vector_index_probe,
)

DIM = 8


def _vecs(spark, start=0, n=48):
    """Deterministic unit-ish vectors: vec_id i gets a dim-8 pattern."""
    rows = [
        (
            start + i,
            [
                float(((start + i) * 7 + j * 3) % 11) / 11.0 + 0.05
                for j in range(DIM)
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(spark):
    rows = [
        (100 + q, [float((q * 5 + j) % 9) / 9.0 + 0.1 for j in range(DIM)])
        for q in range(3)
    ]
    return spark.createDataFrame(rows, "query_id long, embedding array<double>")


def _anchor_centroids(corpus, num_cells=4):
    """Deterministic quantizer: the num_cells lowest-id vectors."""
    rows = corpus.orderBy("vec_id").limit(num_cells).collect()
    return [r["embedding"] for r in rows]


def _res(df):
    return sorted(
        (r["query_id"], r["neighbor"], r["cosine"], r["rank"])
        for r in df.collect()
    )


@pytest.mark.parametrize("layout", ["flat", "versioned"])
def test_probe_matches_recompute_bit_exact(spark, tmp_path, layout):
    corpus = _vecs(spark)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / f"vxi_{layout}")
    meta = vector_index_build(
        corpus, idx, num_cells=4, layout=layout, centroids=cents
    )
    assert meta["n_vecs"] == 48 and meta["num_cells"] == 4
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    want = ann_topk_ivf(
        corpus, _queries(spark), k=5, num_cells=4, nprobe=2,
        centroids=__import__("numpy").asarray(cents),
    )
    assert _res(got) == _res(want)


def test_full_probe_equals_brute_force(spark, tmp_path):
    """nprobe >= num_cells degenerates to exact cosine_topk — the
    contract that lets the index serve q200's hybrid-RRF leg exactly."""
    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_full")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus)
    )
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=99)
    want = cosine_topk(corpus, _queries(spark), k=5)
    assert _res(got) == _res(want)


def test_pq_probe_matches_recompute(spark, tmp_path):
    import numpy as np

    from etl_job_applify_spark.similarity import train_pq_codebooks

    corpus = _vecs(spark)
    cents = np.asarray(_anchor_centroids(corpus))
    books = train_pq_codebooks(corpus, m=4, k=4)
    idx = str(tmp_path / "vxi_pq")
    meta = vector_index_build(
        corpus, idx, num_cells=4, m=4, k_codes=4,
        centroids=cents, codebooks=books,
    )
    assert meta["m"] == 4 and meta["k_codes"] == 4
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=3,
        use_codes=True, shortlist=16,
    )
    want = ann_topk_ivfpq(
        corpus, _queries(spark), k=5, num_cells=4, nprobe=3, m=4,
        k_codes=4, shortlist=16, centroids=cents, codebooks=books,
    )
    assert _res(got) == _res(want)


def test_use_codes_requires_pq_build(spark, tmp_path):
    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_nocodes")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus)
    )
    with pytest.raises(ValueError, match="no PQ codes"):
        vector_index_probe(
            spark, idx, _queries(spark), use_codes=True
        ).collect()


@pytest.mark.parametrize("layout", ["flat", "versioned"])
def test_append_uses_founding_quantizer(spark, tmp_path, layout):
    """history founds, batch appends: the probe must equal a recompute
    over the FULL corpus with the FOUNDING centroids — an append that
    retrained or re-assigned would diverge."""
    corpus = _vecs(spark)
    history = corpus.filter(F.col("vec_id") % 5 != 0)
    batch = corpus.filter(F.col("vec_id") % 5 == 0)
    cents = _anchor_centroids(history)
    idx = str(tmp_path / f"vxi_app_{layout}")
    vector_index_build(
        history, idx, num_cells=4, layout=layout, centroids=cents
    )
    meta = vector_index_build(batch, idx, mode="append")
    assert meta["n_vecs"] == 48
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    want = ann_topk_ivf(
        corpus, _queries(spark), k=5, num_cells=4, nprobe=2,
        centroids=__import__("numpy").asarray(cents),
    )
    assert _res(got) == _res(want)


def test_versioned_epoch_fence_skips_replay(spark, tmp_path):
    from etl_job_applify_spark.sinks.versioned import list_versions

    corpus = _vecs(spark)
    history = corpus.filter(F.col("vec_id") < 40)
    batch = corpus.filter(F.col("vec_id") >= 40)
    idx = str(tmp_path / "vxi_fence")
    vector_index_build(
        history, idx, num_cells=4, centroids=_anchor_centroids(history)
    )
    vector_index_build(batch, idx, mode="append", epoch_mark="_epoch_t1")
    n_after = len(list_versions(spark, idx))
    # replay: fenced no-op — no new snapshot, counts unchanged
    meta = vector_index_build(
        batch, idx, mode="append", epoch_mark="_epoch_t1"
    )
    assert len(list_versions(spark, idx)) == n_after
    assert meta["n_vecs"] == 48


@pytest.mark.parametrize("layout", ["flat", "versioned"])
def test_delete_then_compact_serves_survivors(spark, tmp_path, layout):
    corpus = _vecs(spark)
    doomed = [i for i in range(48) if i % 4 == 1]
    idx = str(tmp_path / f"vxi_del_{layout}")
    vector_index_build(
        corpus, idx, num_cells=4, layout=layout,
        centroids=_anchor_centroids(corpus),
    )
    out = vector_index_delete(spark, idx, doomed)
    assert out["n_tombstoned"] == len(doomed)
    # re-delete is a no-op
    assert vector_index_delete(spark, idx, doomed)["n_tombstoned"] == 0
    survivors = corpus.filter(~F.col("vec_id").isin(doomed))
    want = _res(
        ann_topk_ivf(
            survivors, _queries(spark), k=5, num_cells=4, nprobe=2,
            centroids=__import__("numpy").asarray(
                _anchor_centroids(corpus)
            ),
        )
    )
    before = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    assert before == want
    stats = optimize_vector_index(spark, idx)
    assert stats["rows_before"] == 48 - len(doomed)
    after = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    assert after == want


def test_versioned_delete_then_reappend_serves_again(spark, tmp_path):
    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_reapp")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus)
    )
    vector_index_delete(spark, idx, [3, 7])
    reingested = corpus.filter(F.col("vec_id").isin([3, 7]))
    meta = vector_index_build(reingested, idx, mode="append")
    assert meta["n_vecs"] == 48  # -2 then +2: counters stay exact
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=99)
    want = cosine_topk(corpus, _queries(spark), k=5)
    assert _res(got) == _res(want)


def test_versioned_delete_race_loses_no_tombstones(spark, tmp_path):
    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_race")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus)
    )
    set_a = [0, 1, 2, 3]
    set_b = [4, 5, 6, 7]
    results = {}

    def worker(name, ids):
        results[name] = vector_index_delete(spark, idx, ids)["n_tombstoned"]

    threads = [
        threading.Thread(target=worker, args=("a", set_a)),
        threading.Thread(target=worker, args=("b", set_b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["a"] == 4 and results["b"] == 4
    survivors = corpus.filter(~F.col("vec_id").isin(set_a + set_b))
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=99)
    want = cosine_topk(survivors, _queries(spark), k=5)
    assert _res(got) == _res(want)


def test_flat_interrupted_optimize_swap_recovers(spark, tmp_path):
    """Crash between the two renames of the flat compaction publish:
    a complete __compact staging with the live index gone must be
    promoted on the next entry."""
    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_crash")
    vector_index_build(
        corpus, idx, num_cells=4, layout="flat",
        centroids=_anchor_centroids(corpus),
    )
    want = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    # simulate: staging complete, live renamed away (crash point is
    # after `os.rename(index_path, old)`)
    os.rename(idx, idx + "__compact")
    got = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    assert got == want
    assert os.path.exists(os.path.join(idx, "_vector_index_meta.json"))


def test_versioned_commit_prune_crash_recovers(spark, tmp_path):
    """A compaction that committed its watermark snapshot but crashed
    before pruning: the next read must prune the folded snapshots and
    serve identical results."""
    from etl_job_applify_spark.similarity.vector_index import (
        _vxi_recover_live,
    )

    corpus = _vecs(spark)
    history = corpus.filter(F.col("vec_id") < 40)
    batch = corpus.filter(F.col("vec_id") >= 40)
    idx = str(tmp_path / "vxi_prune")
    vector_index_build(
        history, idx, num_cells=4, centroids=_anchor_centroids(history)
    )
    vector_index_build(batch, idx, mode="append")
    want = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    optimize_vector_index(spark, idx)
    # compaction pruned; live set is exactly one snapshot and results hold
    assert len(_vxi_recover_live(spark, idx)) == 1
    got = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    assert got == want


def test_versioned_delete_everything_then_probe(spark, tmp_path):
    corpus = _vecs(spark, n=12)
    idx = str(tmp_path / "vxi_purgeall")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus)
    )
    assert vector_index_delete(
        spark, idx, list(range(12))
    )["n_tombstoned"] == 12
    assert (
        vector_index_probe(spark, idx, _queries(spark), k=5).count() == 0
    )
    optimize_vector_index(spark, idx)  # purge-everything compaction
    assert (
        vector_index_probe(spark, idx, _queries(spark), k=5).count() == 0
    )


def test_probe_prunes_to_probed_cells(spark, tmp_path):
    """The probe's cells scan must carry the static cell partition
    filter (PartitionFilters in the scan node) — the physical
    disk-pruning contract."""
    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_prune_plan")
    vector_index_build(
        corpus, idx, num_cells=4, layout="flat",
        centroids=_anchor_centroids(corpus),
    )
    df = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan
    # nprobe=1 over 3 distinct queries cannot touch all 4 cells unless
    # every query probes a different cell; assert the filter exists by
    # checking the formatted plan mentions a cell IN filter
    from etl_job_applify_spark.plans.explain import explain_str

    fmt = explain_str(df, "formatted")
    assert "PartitionFilters" in fmt and "cell" in fmt


def test_pq_refine_scan_is_pruned(spark, tmp_path):
    """BOTH index scans on the use_codes path — the ADC codes scan AND
    the exact-refine raw-vector fetch — must carry the static cell
    partition filter. The refine join reads the probe-pruned cells
    relation, not the full live index (the r11 'unpruned refine fetch'
    scale wart): at 100 TB an unpruned refine is a full-index scan per
    query batch."""
    import numpy as np

    from etl_job_applify_spark.similarity import train_pq_codebooks

    corpus = _vecs(spark)
    cents = np.asarray(_anchor_centroids(corpus))
    books = train_pq_codebooks(corpus, m=4, k=4)
    idx = str(tmp_path / "vxi_refine_prune")
    vector_index_build(
        corpus, idx, num_cells=4, m=4, k_codes=4,
        centroids=cents, codebooks=books,
    )
    df = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=1,
        use_codes=True, shortlist=8,
    )
    from etl_job_applify_spark.plans.explain import explain_str

    fmt = explain_str(df, "formatted")
    # the only parquet scans in this plan are the index's cells —
    # every one of them must be partition-pruned (no empty filter)
    assert "PartitionFilters" in fmt and "cell" in fmt
    assert "PartitionFilters: []" not in fmt


def test_streaming_ingest_exactly_once_replay_invariant(spark, tmp_path):
    """Streaming embedding ingest (run_vector_index_ingest_stream):
    a full at-least-once replay of every micro-batch commits nothing —
    every epoch's mark rides its CAS snapshot, so the index state is
    bit-identical after the second run, and the served results equal a
    one-shot build over the union of batches with the same (founding)
    quantizer."""
    import glob
    import time

    from etl_job_applify_spark.streaming import (
        run_vector_index_ingest_stream,
    )

    corpus = _vecs(spark)
    b1 = corpus.filter(F.col("vec_id") < 30)
    b2 = corpus.filter(F.col("vec_id") >= 30)
    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "stream_idx")
    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    b2.coalesce(1).write.parquet(str(src / "b2.parquet"))
    cents = _anchor_centroids(b1)

    def run():
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_vector_index_ingest_stream(
            stream, idx, num_cells=4, centroids=cents
        )

    def cell_rows(snaps):
        # per-root reads: multi-root partition discovery conflicts on
        # partitioned subtrees (the same reason _vxi_read unions)
        return sum(
            spark.read.parquet(f"{p}/cells").count() for p in snaps
        )

    run()
    snaps1 = sorted(glob.glob(idx + "/snap_*"))
    assert cell_rows(snaps1) == 48
    first = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )

    run()  # full replay: same files, same epoch ids -> all fenced
    snaps2 = sorted(glob.glob(idx + "/snap_*"))
    assert snaps2 == snaps1
    assert cell_rows(snaps2) == 48
    # and the stream-built index serves exactly what a one-shot build
    # with the same quantizer serves
    ref = str(tmp_path / "ref_idx")
    vector_index_build(corpus, ref, num_cells=4, centroids=cents)
    assert first == _res(
        vector_index_probe(spark, ref, _queries(spark), k=5, nprobe=2)
    )


@pytest.mark.parametrize("layout", ["flat", "versioned"])
def test_reindex_retrains_and_purges(spark, tmp_path, layout):
    """Quantizer-drift maintenance: reindex on the live corpus must
    (a) serve through the NEW quantizer geometry — probe equals a
    recompute pinned to the new centroids over the survivors, (b) purge
    tombstones, (c) preserve exact counters, and (d) allow re-shaping
    num_cells."""
    corpus = _vecs(spark)
    doomed = [1, 5, 9]
    idx = str(tmp_path / f"vxi_re_{layout}")
    vector_index_build(
        corpus, idx, num_cells=4, layout=layout,
        centroids=_anchor_centroids(corpus),
    )
    vector_index_delete(spark, idx, doomed)
    survivors = corpus.filter(~F.col("vec_id").isin(doomed))
    new_cents = [
        r["embedding"]
        for r in survivors.orderBy(F.desc("vec_id")).limit(3).collect()
    ]
    from etl_job_applify_spark.similarity import reindex_vector_index

    meta = reindex_vector_index(
        spark, idx, num_cells=3, centroids=new_cents
    )
    assert meta["num_cells"] == 3
    assert meta["n_vecs"] == 48 - len(doomed)
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    want = ann_topk_ivf(
        survivors, _queries(spark), k=5, num_cells=3, nprobe=2,
        centroids=__import__("numpy").asarray(new_cents),
    )
    assert _res(got) == _res(want)
    # appends after the reindex use the NEW quantizer
    if layout == "versioned":
        extra = _vecs(spark, start=200, n=4)
        vector_index_build(extra, idx, mode="append")
        got2 = vector_index_probe(
            spark, idx, _queries(spark), k=5, nprobe=2
        )
        want2 = ann_topk_ivf(
            survivors.unionByName(extra), _queries(spark), k=5,
            num_cells=3, nprobe=2,
            centroids=__import__("numpy").asarray(new_cents),
        )
        assert _res(got2) == _res(want2)


def test_reindex_trained_roundtrip_and_pq_reshape(spark, tmp_path):
    """Trained-quantizer reindex: a PQ index reindexed to m=0 drops the
    code path (use_codes raises), counters hold, and the exact-cosine
    probe over all cells still equals brute force."""
    import numpy as np

    from etl_job_applify_spark.similarity import (
        reindex_vector_index,
        train_pq_codebooks,
    )

    corpus = _vecs(spark)
    cents = np.asarray(_anchor_centroids(corpus))
    books = train_pq_codebooks(corpus, m=4, k=4)
    idx = str(tmp_path / "vxi_re_pq")
    vector_index_build(
        corpus, idx, num_cells=4, m=4, k_codes=4,
        centroids=cents, codebooks=books,
    )
    meta = reindex_vector_index(spark, idx, m=0)
    assert meta["m"] == 0 and meta["n_vecs"] == 48
    with pytest.raises(ValueError, match="no PQ codes"):
        vector_index_probe(
            spark, idx, _queries(spark), use_codes=True
        ).collect()
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=99)
    want = cosine_topk(corpus, _queries(spark), k=5)
    assert _res(got) == _res(want)


def test_streaming_search_exactly_once_results(spark, tmp_path):
    """Nearline serving (run_vector_search_stream): per-batch probes
    against the persisted index land in a fenced results log — a full
    replay of the query stream appends nothing, and every batch's
    results equal a direct probe of the same query set."""
    import time

    from etl_job_applify_spark.sinks.versioned import read_log_table
    from etl_job_applify_spark.streaming import run_vector_search_stream

    corpus = _vecs(spark)
    idx = str(tmp_path / "serve_idx")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus)
    )
    src = tmp_path / "qsrc"
    src.mkdir()
    results = str(tmp_path / "results")
    q1 = _queries(spark).filter(F.col("query_id") <= 101)
    q2 = _queries(spark).filter(F.col("query_id") > 101)
    q1.coalesce(1).write.parquet(str(src / "q1.parquet"))
    time.sleep(1.1)
    q2.coalesce(1).write.parquet(str(src / "q2.parquet"))

    def run():
        stream = (
            spark.readStream.schema(
                "query_id long, embedding array<double>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_vector_search_stream(stream, idx, results, k=5, nprobe=2)

    run()
    got = read_log_table(spark, results)
    first = sorted(map(tuple, got.collect()))
    assert {r["batch_id"] for r in got.collect()} == {0, 1}
    direct = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=2
    )
    assert sorted(
        (r["query_id"], r["neighbor"], r["cosine"], r["rank"])
        for r in got.collect()
    ) == _res(direct)

    run()  # full replay: every epoch fenced, results log unchanged
    assert sorted(
        map(tuple, read_log_table(spark, results).collect())
    ) == first


def test_append_param_mismatch_raises(spark, tmp_path):
    """Explicitly passed quantizer-shape params on an append must match
    the recorded index (the recorded quantizer is always used — a
    silent mismatch would lie to the caller); matching params and
    omitted params both succeed; pinning a quantizer on an append
    raises outright."""
    corpus = _vecs(spark)
    history = corpus.filter(F.col("vec_id") < 40)
    batch = corpus.filter(F.col("vec_id") >= 40)
    for layout in ("flat", "versioned"):
        idx = str(tmp_path / f"vxi_val_{layout}")
        vector_index_build(
            history, idx, num_cells=4, layout=layout,
            centroids=_anchor_centroids(history),
        )
        with pytest.raises(ValueError, match="must match the recorded"):
            vector_index_build(batch, idx, mode="append", num_cells=8)
        with pytest.raises(ValueError, match="must match the recorded"):
            vector_index_build(batch, idx, mode="append", m=4)
        with pytest.raises(ValueError, match="recorded quantizer"):
            vector_index_build(
                batch, idx, mode="append",
                centroids=_anchor_centroids(history),
            )
        # matching explicit params and omitted params both append
        meta = vector_index_build(
            batch, idx, mode="append", num_cells=4, m=0,
        )
        assert meta["n_vecs"] == 48


def test_flat_refound_clears_stale_tombstones(spark, tmp_path):
    """mode='overwrite' founding over a path that previously held a
    flat index must not inherit its deletes/: re-founded vectors whose
    ids were tombstoned in the PRIOR index serve again, and n_vecs is
    exact."""
    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_refound")
    vector_index_build(
        corpus, idx, num_cells=4, layout="flat",
        centroids=_anchor_centroids(corpus),
    )
    vector_index_delete(spark, idx, [1, 2, 3])
    meta = vector_index_build(  # re-found over the same path
        corpus, idx, num_cells=4, layout="flat",
        centroids=_anchor_centroids(corpus),
    )
    assert meta["n_vecs"] == 48
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=99)
    want = cosine_topk(corpus, _queries(spark), k=5)
    assert _res(got) == _res(want)


def test_versioned_empty_append_commits_readable_snapshot(spark, tmp_path):
    """An empty batch appended to a versioned index must not kill the
    writer: the recorded cells schema rides the commit, so the empty
    snapshot stays readable and counts are unchanged."""
    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_empty")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus)
    )
    empty = corpus.filter(F.lit(False))
    meta = vector_index_build(empty, idx, mode="append")
    assert meta["n_vecs"] == 48
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    want = ann_topk_ivf(
        corpus, _queries(spark), k=5, num_cells=4, nprobe=2,
        centroids=__import__("numpy").asarray(_anchor_centroids(corpus)),
    )
    assert _res(got) == _res(want)


def test_empty_corpus_founding_raises_cleanly(spark, tmp_path):
    corpus = _vecs(spark).filter(F.lit(False))
    with pytest.raises(ValueError, match="empty corpus"):
        vector_index_build(corpus, str(tmp_path / "vxi_none"), num_cells=4)


def test_compaction_grace_keeps_inflight_probes_alive(spark, tmp_path):
    """The one-compaction-cycle grace window: a probe DataFrame built
    BEFORE a compaction (lazily referencing the pre-compaction snapshot
    files) still collects correctly AFTER it — folded snapshots are not
    physically deleted until a later compaction supersedes them."""
    import glob

    corpus = _vecs(spark)
    history = corpus.filter(F.col("vec_id") < 40)
    batch = corpus.filter(F.col("vec_id") >= 40)
    idx = str(tmp_path / "vxi_grace")
    vector_index_build(
        history, idx, num_cells=4, centroids=_anchor_centroids(history)
    )
    vector_index_build(batch, idx, mode="append")
    inflight = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=2
    )  # lazy: captures snap_1/snap_2 file paths
    want = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    optimize_vector_index(spark, idx)
    # grace: folded snapshots still on disk -> the in-flight plan scans
    # intact files and returns the pre-compaction result
    assert sorted(
        os.path.basename(p) for p in glob.glob(idx + "/snap_*")
    ) == ["snap_00000001", "snap_00000002", "snap_00000003"]
    assert _res(inflight) == want
    # fresh probes serve identical results from the compacted snapshot
    assert _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    ) == want
    # a second compaction supersedes the first: its folded snapshots
    # are then physically pruned
    optimize_vector_index(spark, idx)
    on_disk = sorted(
        os.path.basename(p) for p in glob.glob(idx + "/snap_*")
    )
    assert "snap_00000001" not in on_disk
    assert "snap_00000002" not in on_disk
    assert _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    ) == want


def _meta_corpus(spark, n=48):
    """_vecs plus a deterministic metadata column (vec_id % 3 -> lang)."""
    langs = ["en", "de", "fr"]
    return _vecs(spark, n=n).withColumn(
        "lang",
        F.element_at(
            F.array(*[F.lit(x) for x in langs]),
            (F.col("vec_id") % 3 + 1).cast("int"),
        ),
    )


def test_filtered_probe_exact_path(spark, tmp_path):
    """Filtered ANN (where= over meta_cols): the predicate applies
    INSIDE the probed cells before top-k, so the result equals the
    recompute kernel over the pre-filtered corpus with the same
    quantizer — full k survivors, never a post-filtered short list."""
    corpus = _meta_corpus(spark)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "vxi_filt")
    meta = vector_index_build(
        corpus, idx, num_cells=4, centroids=cents, meta_cols=["lang"]
    )
    assert meta["meta_cols"] == ["lang"]
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=2, where="lang = 'en'"
    )
    want = ann_topk_ivf(
        corpus.filter(F.col("lang") == "en"), _queries(spark),
        k=5, num_cells=4, nprobe=2,
        centroids=__import__("numpy").asarray(cents),
    )
    assert _res(got) == _res(want)
    assert all(r["rank"] <= 5 for r in got.collect())
    # Column predicate form too
    got2 = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=2,
        where=F.col("lang").isin("en", "de"),
    )
    want2 = ann_topk_ivf(
        corpus.filter(F.col("lang").isin("en", "de")), _queries(spark),
        k=5, num_cells=4, nprobe=2,
        centroids=__import__("numpy").asarray(cents),
    )
    assert _res(got2) == _res(want2)


def test_filtered_probe_pq_path(spark, tmp_path):
    """On the PQ path the predicate applies BEFORE the ADC shortlist,
    so the shortlist (and therefore top-k) is drawn from predicate
    survivors only — equal to the IVFxPQ recompute over the filtered
    corpus with the recorded quantizer."""
    import numpy as np

    from etl_job_applify_spark.similarity import train_pq_codebooks

    corpus = _meta_corpus(spark)
    cents = np.asarray(_anchor_centroids(corpus))
    books = train_pq_codebooks(corpus, m=4, k=4)
    idx = str(tmp_path / "vxi_filt_pq")
    vector_index_build(
        corpus, idx, num_cells=4, m=4, k_codes=4,
        centroids=cents, codebooks=books, meta_cols=["lang"],
    )
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=3,
        use_codes=True, shortlist=8, where="lang <> 'fr'",
    )
    want = ann_topk_ivfpq(
        corpus.filter(F.col("lang") != "fr"), _queries(spark),
        k=5, num_cells=4, nprobe=3, m=4, k_codes=4, shortlist=8,
        centroids=cents, codebooks=books,
    )
    assert _res(got) == _res(want)


def test_filtered_probe_escalation_fills_k(spark, tmp_path):
    """escalate=True: a selective predicate whose survivors under-fill
    k at the base nprobe escalates (nprobe doubling) until every query
    fills — and when fewer than k survivors EXIST in the whole live
    index, escalation reaches the predicate-filtered full scan and
    returns the maximal (short) answer, equal to brute force over the
    filtered corpus."""
    corpus = _meta_corpus(spark)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "vxi_escal")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=cents, meta_cols=["lang"]
    )
    # 16 'fr' survivors spread over the cells: nprobe=1 under-fills
    # some queries at k=5; escalation must fill all of them to k
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=1,
        where="lang = 'fr'", escalate=True,
    )
    per_q = {
        r["query_id"]: r["n"]
        for r in got.groupBy("query_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert per_q == {100: 5, 101: 5, 102: 5}
    # predicate with only 4 survivors in the WHOLE index: escalation
    # reaches full coverage and the result equals filtered brute force
    got_short = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=1,
        where="vid >= 44", escalate=True,
    )
    want_short = cosine_topk(
        corpus.filter(F.col("vec_id") >= 44), _queries(spark), k=5
    )
    assert _res(got_short) == _res(want_short)
    assert got_short.count() == 12  # 4 survivors x 3 queries, maximal


def test_filtered_probe_escalation_fast_path_unchanged(spark, tmp_path):
    """Queries that fill at the base nprobe return results
    bit-identical to escalate=False — escalation never perturbs the
    non-escalating fast path (the q238 contract stays pinned)."""
    corpus = _meta_corpus(spark)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "vxi_escal_fast")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=cents, meta_cols=["lang"]
    )
    base = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=2, where="lang <> 'fr'"
    )
    assert all(
        r["n"] == 5
        for r in base.groupBy("query_id").agg(
            F.count("*").alias("n")
        ).collect()
    )  # premise: everything fills at the base nprobe
    esc = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=2,
        where="lang <> 'fr'", escalate=True,
    )
    assert _res(esc) == _res(base)


def test_meta_cols_survive_append_delete_compact(spark, tmp_path):
    """meta_cols ride every lifecycle stage: appended batches carry
    them (validated when passed explicitly), tombstones and compaction
    preserve them, and filtered probes stay correct throughout."""
    corpus = _meta_corpus(spark)
    history = corpus.filter(F.col("vec_id") < 40)
    batch = corpus.filter(F.col("vec_id") >= 40)
    cents = _anchor_centroids(history)
    idx = str(tmp_path / "vxi_meta_life")
    vector_index_build(
        history, idx, num_cells=4, centroids=cents, meta_cols=["lang"]
    )
    # append without meta in the batch frame raises (column required)
    with pytest.raises(Exception):
        vector_index_build(
            batch.drop("lang"), idx, mode="append"
        )
    # explicit mismatched meta_cols on append raises
    with pytest.raises(ValueError, match="must match the recorded"):
        vector_index_build(batch, idx, mode="append", meta_cols=["other"])
    vector_index_build(batch, idx, mode="append", meta_cols=["lang"])
    vector_index_delete(spark, idx, [0, 3, 6])
    optimize_vector_index(spark, idx)
    live = corpus.filter(~F.col("vec_id").isin([0, 3, 6]))
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=99, where="lang = 'de'"
    )
    want = cosine_topk(
        live.filter(F.col("lang") == "de"), _queries(spark), k=5
    )
    assert _res(got) == _res(want)


def test_streaming_ingest_auto_compaction_threshold(spark, tmp_path):
    """max_snapshots: a 30-epoch streamed ingest must keep the LIVE
    snapshot count at or below the threshold (compaction auto-triggers
    under the usual CAS publish — no manual optimize anywhere), with
    counts exact and probe results bit-identical to a one-shot build
    over the union of all batches with the same founding quantizer."""
    from etl_job_applify_spark.similarity.vector_index import (
        _vxi_read,
        _vxi_recover_live,
    )
    from etl_job_applify_spark.streaming import (
        run_vector_index_ingest_stream,
    )

    corpus = _vecs(spark, n=60)
    src = tmp_path / "src30"
    src.mkdir()
    for b in range(30):
        corpus.filter(
            (F.col("vec_id") >= 2 * b) & (F.col("vec_id") < 2 * (b + 1))
        ).coalesce(1).write.parquet(str(src / f"b{b:02d}.parquet"))
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "auto_idx")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    run_vector_index_ingest_stream(
        stream, idx, num_cells=4, centroids=cents, max_snapshots=5
    )
    live = _vxi_recover_live(spark, idx)
    # 30 epochs, threshold 5: without the trigger the live set would be
    # 30 snapshots — the threshold bounds it
    assert 1 <= len(live) <= 5
    meta = _vxi_read(spark, idx)[0]
    assert meta["n_vecs"] == 60
    ref = str(tmp_path / "auto_ref")
    vector_index_build(corpus, ref, num_cells=4, centroids=cents)
    assert _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    ) == _res(
        vector_index_probe(spark, ref, _queries(spark), k=5, nprobe=2)
    )


def test_batch_append_auto_compaction_invariant(spark, tmp_path):
    """The live-count invariant holds after EVERY append, and the same
    threshold exists on the text and dedup indexes (shared protocol)."""
    from etl_job_applify_spark.similarity.vector_index import (
        _vxi_recover_live,
    )

    corpus = _vecs(spark, n=48)
    idx = str(tmp_path / "auto_batch")
    vector_index_build(
        corpus.filter(F.col("vec_id") < 8), idx, num_cells=4,
        centroids=_anchor_centroids(corpus),
    )
    for b in range(1, 6):
        vector_index_build(
            corpus.filter(
                (F.col("vec_id") >= 8 * b) & (F.col("vec_id") < 8 * (b + 1))
            ),
            idx, mode="append", max_snapshots=3,
        )
        assert len(_vxi_recover_live(spark, idx)) <= 3
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=99)
    want = cosine_topk(corpus, _queries(spark), k=5)
    assert _res(got) == _res(want)


def test_residual_pq_probe_matches_recompute_and_survives_lifecycle(
    spark, tmp_path
):
    """pq_encoding='residual' (FAISS IVFADC, mean-offset variant): the
    index-served ADC probe equals the recompute kernel pinned to the
    recorded (centroids, codebooks, offsets); the recorded encoding —
    offsets riding the centroids relation — survives append, delete,
    compaction; a full-shortlist full-nprobe probe equals brute-force
    cosine over the live corpus."""
    from etl_job_applify_spark.similarity.pq import ann_topk_ivfpq as ivfpq
    from etl_job_applify_spark.similarity.vector_index import _live_cells

    corpus = _vecs(spark)
    history = corpus.filter(F.col("vec_id") < 40)
    batch = corpus.filter(F.col("vec_id") >= 40)
    idx = str(tmp_path / "vxi_resid")
    meta = vector_index_build(
        history, idx, num_cells=4, m=4, k_codes=4, pq_encoding="residual"
    )
    assert meta["pq_encoding"] == "residual"
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=3,
        use_codes=True, shortlist=16,
    )
    _, cents, books, offs, _ = _live_cells(spark, idx)
    assert offs is not None
    want = ivfpq(
        history, _queries(spark), k=5, num_cells=4, nprobe=3, m=4,
        k_codes=4, shortlist=16, centroids=cents, codebooks=books,
        encoding="residual", offsets=offs,
    )
    assert _res(got) == _res(want)
    # lifecycle: append (encoded with the recorded residual quantizer),
    # delete, compact — then the degenerate-exact probe equals brute
    vector_index_build(batch, idx, mode="append")
    vector_index_delete(spark, idx, [2, 6])
    optimize_vector_index(spark, idx)
    live = corpus.filter(~F.col("vec_id").isin([2, 6]))
    got2 = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=99,
        use_codes=True, shortlist=9999,
    )
    assert _res(got2) == _res(cosine_topk(live, _queries(spark), k=5))


def test_residual_reindex_and_param_validation(spark, tmp_path):
    """Reindex keeps (or re-shapes) the recorded encoding; pinned
    residual codebooks without offsets are refused."""
    from etl_job_applify_spark.similarity import reindex_vector_index
    from etl_job_applify_spark.similarity.pq import train_pq_codebooks

    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_resid_re")
    vector_index_build(
        corpus, idx, num_cells=4, m=4, k_codes=4, pq_encoding="residual"
    )
    meta = reindex_vector_index(spark, idx, num_cells=3)
    assert meta["pq_encoding"] == "residual" and meta["num_cells"] == 3
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=99,
        use_codes=True, shortlist=9999,
    )
    assert _res(got) == _res(cosine_topk(corpus, _queries(spark), k=5))
    # reshape residual -> plain drops the offsets cleanly
    meta = reindex_vector_index(spark, idx, pq_encoding="plain")
    assert meta["pq_encoding"] == "plain"
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=99,
        use_codes=True, shortlist=9999,
    )
    assert _res(got) == _res(cosine_topk(corpus, _queries(spark), k=5))
    # pinned residual codebooks need matching offsets
    books = train_pq_codebooks(corpus, m=4, k=4)
    with pytest.raises(ValueError, match="matching offsets"):
        vector_index_build(
            corpus, str(tmp_path / "vxi_bad"), num_cells=4, m=4,
            k_codes=4, pq_encoding="residual", codebooks=books,
        )


def test_streaming_search_filtered(spark, tmp_path):
    """Filtered nearline serving: run_vector_search_stream(where=...)
    probes with the predicate inside the cells — every batch's logged
    results equal a direct filtered probe, exactly once under replay."""
    import time

    from etl_job_applify_spark.sinks.versioned import read_log_table
    from etl_job_applify_spark.streaming import run_vector_search_stream

    corpus = _meta_corpus(spark)
    idx = str(tmp_path / "fserve_idx")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus),
        meta_cols=["lang"],
    )
    src = tmp_path / "fqsrc"
    src.mkdir()
    results = str(tmp_path / "fresults")
    q1 = _queries(spark).filter(F.col("query_id") <= 101)
    q2 = _queries(spark).filter(F.col("query_id") > 101)
    q1.coalesce(1).write.parquet(str(src / "q1.parquet"))
    time.sleep(1.1)
    q2.coalesce(1).write.parquet(str(src / "q2.parquet"))

    def run():
        stream = (
            spark.readStream.schema(
                "query_id long, embedding array<double>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_vector_search_stream(
            stream, idx, results, k=5, nprobe=2, where="lang = 'en'"
        )

    run()
    got = read_log_table(spark, results)
    direct = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=2, where="lang = 'en'"
    )
    assert sorted(
        (r["query_id"], r["neighbor"], r["cosine"], r["rank"])
        for r in got.collect()
    ) == _res(direct)
    first = sorted(map(tuple, got.collect()))
    run()  # replay: fenced, log unchanged
    assert sorted(
        map(tuple, read_log_table(spark, results).collect())
    ) == first


def test_stats_and_histogram_both_layouts(spark, tmp_path):
    """DESCRIBE INDEX surface: exact logical counter == live rows ==
    histogram total, pending tombstones tracked, snapshot/file counts
    layout-appropriate, and the skew signal sane — both layouts."""
    from etl_job_applify_spark.similarity import (
        vector_index_cell_histogram,
        vector_index_stats,
    )

    corpus = _meta_corpus(spark)
    for layout in ("flat", "versioned"):
        idx = str(tmp_path / f"vxi_stats_{layout}")
        vector_index_build(
            corpus, idx, num_cells=4, layout=layout,
            centroids=_anchor_centroids(corpus), meta_cols=["lang"],
        )
        vector_index_delete(spark, idx, [1, 2, 3])
        st = vector_index_stats(spark, idx)
        hist = vector_index_cell_histogram(spark, idx)
        total = hist.agg(F.sum("n_live")).first()[0]
        assert st["layout"] == layout
        assert st["n_vecs"] == st["n_live_rows"] == total == 45
        assert st["n_pending_tombstones"] == 3
        assert st["meta_cols"] == ["lang"]
        assert st["live_snapshots"] == (2 if layout == "versioned" else 1)
        assert st["cell_skew"] >= 1.0 and st["max_cell"] >= 45 // 4
        assert st["data_files"] >= st["nonempty_cells"] >= 1
        # compaction purges tombstones; the counter is unchanged
        optimize_vector_index(spark, idx)
        st2 = vector_index_stats(spark, idx)
        assert st2["n_pending_tombstones"] == 0
        assert st2["n_vecs"] == 45 and st2["live_snapshots"] == 1


def test_concurrent_appends_with_auto_compaction_race(spark, tmp_path):
    """Two appenders racing with max_snapshots triggers: CAS retries
    serialize appends AND the triggered compactions; no batch is lost,
    counts stay exact, probes equal brute force over the union."""
    import threading

    from etl_job_applify_spark.similarity.vector_index import (
        _vxi_read,
        _vxi_recover_live,
    )

    corpus = _vecs(spark, n=48)
    idx = str(tmp_path / "vxi_race_auto")
    vector_index_build(
        corpus.filter(F.col("vec_id") < 8), idx, num_cells=4,
        centroids=_anchor_centroids(corpus),
    )
    batches_a = [(8, 16), (16, 24)]
    batches_b = [(24, 32), (32, 40), (40, 48)]
    errs = []

    def worker(batches):
        try:
            for lo, hi in batches:
                vector_index_build(
                    corpus.filter(
                        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                    ),
                    idx, mode="append", max_snapshots=2,
                )
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errs.append(exc)

    threads = [
        threading.Thread(target=worker, args=(batches_a,)),
        threading.Thread(target=worker, args=(batches_b,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert _vxi_read(spark, idx)[0]["n_vecs"] == 48
    # compactions happened (live bounded well below the 6 commits);
    # the bound may be briefly exceeded between a racing append and
    # its trigger, so assert "compacted at all" rather than <= 2
    assert len(_vxi_recover_live(spark, idx)) <= 4
    got = vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=99)
    want = cosine_topk(corpus, _queries(spark), k=5)
    assert _res(got) == _res(want)


def test_knn_join_parity_with_probe(spark, tmp_path):
    """The bulk cell-keyed shuffle-join kNN path returns results
    bit-identical to vector_index_probe on the same live index — same
    assignment/probe/scoring expressions, different physical plan (no
    driver collect of probe cells, no query-side broadcast)."""
    from etl_job_applify_spark.similarity import vector_index_knn_join

    corpus = _meta_corpus(spark)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "vxi_knnj")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=cents, meta_cols=["lang"]
    )
    want = _res(
        vector_index_probe(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    got = _res(
        vector_index_knn_join(spark, idx, _queries(spark), k=5, nprobe=2)
    )
    assert got == want
    # filtered variant matches the filtered probe too
    want_f = _res(vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=2, where="lang = 'en'"
    ))
    got_f = _res(vector_index_knn_join(
        spark, idx, _queries(spark), k=5, nprobe=2, where="lang = 'en'"
    ))
    assert got_f == want_f


def test_knn_join_self_join_excludes_self(spark, tmp_path):
    """Corpus self-join kNN (the semantic-dedup feeder): exclude_self
    drops the trivial self-match BEFORE ranking, so every returned
    neighbor is a distinct vector and rank 1 is the true nearest
    other vector."""
    from etl_job_applify_spark.similarity import vector_index_knn_join

    corpus = _vecs(spark, n=24)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "vxi_knnj_self")
    vector_index_build(corpus, idx, num_cells=4, centroids=cents)
    got = vector_index_knn_join(
        spark, idx,
        corpus.select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=3, nprobe=4, exclude_self=True,
    )
    rows = got.collect()
    assert all(r["neighbor"] != r["query_id"] for r in rows)
    assert got.groupBy("query_id").count().filter("count != 3").count() == 0
    assert got.select("query_id").distinct().count() == 24


def test_knn_join_plan_is_distributed(spark, tmp_path):
    """With auto-broadcast disabled the kNN join compiles to a shuffle
    join keyed by cell (SortMergeJoin/ShuffledHashJoin) — proof the
    path has no query-side broadcast dependency, unlike the probe."""
    from etl_job_applify_spark.plans.explain import explain_str
    from etl_job_applify_spark.similarity import vector_index_knn_join

    corpus = _vecs(spark)
    idx = str(tmp_path / "vxi_knnj_plan")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus)
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = vector_index_knn_join(
            spark, idx, _queries(spark), k=5, nprobe=2
        )
        fmt = explain_str(df, "formatted")
        assert "SortMergeJoin" in fmt or "ShuffledHashJoin" in fmt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_ingest_auto_reindex_on_skew(spark, tmp_path):
    """The policy loop on the observability signal: drifted appends pile
    into one founding cell (cell_skew rises); with
    reindex_skew_threshold set the ingest stream triggers
    reindex_vector_index at the epoch boundary. Assertions: the frozen
    twin (no policy) ends above the threshold, the policy index ends
    with materially lower skew, exact counts survive, and probe recall
    against exact brute force is no worse than the frozen twin's."""
    from etl_job_applify_spark.similarity import (
        cosine_topk,
        vector_index_stats,
    )
    from etl_job_applify_spark.streaming import (
        run_vector_index_ingest_stream,
    )

    # founding corpus: the usual spread patterns; drift: 40 vectors
    # tightly clustered far from all founding centroids
    founding = _vecs(spark, n=16)
    drift_rows = [
        (
            1000 + i,
            [5.0 + float((i * 3 + j) % 7) / 100.0 for j in range(DIM)],
        )
        for i in range(40)
    ]
    drift = spark.createDataFrame(
        drift_rows, "vec_id long, embedding array<double>"
    )
    cents = _anchor_centroids(founding)
    src = tmp_path / "src_drift"
    src.mkdir()
    founding.coalesce(1).write.parquet(str(src / "b00.parquet"))
    for b in range(4):
        drift.filter(
            (F.col("vec_id") >= 1000 + 10 * b)
            & (F.col("vec_id") < 1000 + 10 * (b + 1))
        ).coalesce(1).write.parquet(str(src / f"b{b + 1:02d}.parquet"))

    def ingest(idx, threshold):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_vector_index_ingest_stream(
            stream, idx, num_cells=4, centroids=cents,
            reindex_skew_threshold=threshold,
            reindex_min_vecs=30 if threshold else 0,
        )

    frozen = str(tmp_path / "idx_frozen")
    policy = str(tmp_path / "idx_policy")
    ingest(frozen, None)
    ingest(policy, 2.0)
    s_frozen = vector_index_stats(spark, frozen)
    s_policy = vector_index_stats(spark, policy)
    # the premise: drift really does skew the frozen quantizer
    assert s_frozen["cell_skew"] > 2.0
    # the policy: reindex retrained on the drifted live corpus
    assert s_policy["cell_skew"] < s_frozen["cell_skew"]
    assert s_policy["n_vecs"] == s_frozen["n_vecs"] == 56
    # recall against exact brute force must not regress vs frozen
    full = founding.unionByName(drift)
    queries = spark.createDataFrame(
        [(2000 + q, [5.0 + float(q) / 50.0] * DIM) for q in range(3)],
        "query_id long, embedding array<double>",
    )
    truth = {
        (r["query_id"], r["neighbor"])
        for r in cosine_topk(full, queries, k=5).collect()
    }

    def recall(idx):
        got = {
            (r["query_id"], r["neighbor"])
            for r in vector_index_probe(
                spark, idx, queries, k=5, nprobe=2
            ).collect()
        }
        return len(got & truth) / len(truth)

    assert recall(policy) >= recall(frozen)


def test_filtered_probe_escalation_pq_path(spark, tmp_path):
    """escalate=True composes with use_codes: the ADC shortlist + exact
    refine run per escalation stage, and a facet with fewer survivors
    than k forces full coverage — equal to filtered brute force (the
    shortlist covers all survivors at shortlist >= |survivors|)."""
    import numpy as np

    from etl_job_applify_spark.similarity import train_pq_codebooks

    corpus = _meta_corpus(spark)
    cents = np.asarray(_anchor_centroids(corpus))
    books = train_pq_codebooks(corpus, m=4, k=4)
    idx = str(tmp_path / "vxi_escal_pq")
    vector_index_build(
        corpus, idx, num_cells=4, m=4, k_codes=4,
        centroids=cents, codebooks=books, meta_cols=["lang"],
    )
    got = vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=1,
        use_codes=True, shortlist=64,
        where="vid < 4", escalate=True,
    )
    want = cosine_topk(
        corpus.filter(F.col("vec_id") < 4), _queries(spark), k=5
    )
    assert _res(got) == _res(want)


def test_knn_join_ensure_k_distributed_escalation(spark, tmp_path):
    """ensure_k: the bulk twin of probe escalation — pass 1 at the base
    nprobe, a relational count splits filled/under-filled, pass 2
    re-runs only the under-filled at full coverage. Under a facet with
    fewer survivors than k, every query reaches the filtered exact
    answer; filled-at-base queries keep bit-identical pass-1 results."""
    from etl_job_applify_spark.similarity import vector_index_knn_join

    corpus = _meta_corpus(spark)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "vxi_knnj_ensure")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=cents, meta_cols=["lang"]
    )
    # facet with 4 survivors < k=5: forces full coverage for every query
    got = vector_index_knn_join(
        spark, idx, _queries(spark), k=5, nprobe=1,
        where="vid < 4", ensure_k=True,
    )
    want = cosine_topk(
        corpus.filter(F.col("vec_id") < 4), _queries(spark), k=5
    )
    assert _res(got) == _res(want)
    # unfiltered at nprobe=2: queries that fill at base keep pass-1
    # results bit-identical to ensure_k=False
    base = vector_index_knn_join(
        spark, idx, _queries(spark), k=5, nprobe=2
    )
    filled_ids = {
        r["query_id"]
        for r in base.groupBy("query_id").count().filter(
            "count >= 5"
        ).collect()
    }
    ens = vector_index_knn_join(
        spark, idx, _queries(spark), k=5, nprobe=2, ensure_k=True
    )
    assert sorted(
        t for t in _res(ens) if t[0] in filled_ids
    ) == sorted(t for t in _res(base) if t[0] in filled_ids)
    # and every query ends with exactly k rows (48 vectors >> k)
    assert all(
        r["count"] == 5
        for r in ens.groupBy("query_id").count().collect()
    )


def test_streaming_search_escalated(spark, tmp_path):
    """Escalated nearline serving: a facet too selective for the base
    nprobe still serves the maximal answer from the stream — logged
    results equal the filtered brute force (full-coverage escalation),
    per batch, exactly once."""
    from etl_job_applify_spark.sinks.versioned import read_log_table
    from etl_job_applify_spark.streaming import run_vector_search_stream

    corpus = _meta_corpus(spark)
    idx = str(tmp_path / "eserve_idx")
    vector_index_build(
        corpus, idx, num_cells=4, centroids=_anchor_centroids(corpus),
        meta_cols=["lang"],
    )
    src = tmp_path / "eqsrc"
    src.mkdir()
    results = str(tmp_path / "eresults")
    _queries(spark).coalesce(1).write.parquet(str(src / "q.parquet"))
    stream = (
        spark.readStream.schema("query_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    run_vector_search_stream(
        stream, idx, results, k=5, nprobe=1,
        where="vid < 4", escalate=True,
    )
    got = sorted(
        (r["query_id"], r["neighbor"], r["cosine"], r["rank"])
        for r in read_log_table(spark, results).collect()
    )
    want = _res(
        cosine_topk(
            corpus.filter(F.col("vec_id") < 4), _queries(spark), k=5
        )
    )
    assert got == want


def test_escalation_batch_size_guard(spark, tmp_path):
    """escalate=True enforces its control-plane batch contract: a query
    relation with more distinct ids than ESCALATE_MAX_BATCH raises (the
    per-round isin literal filters would otherwise become a giant
    plan), and the error names the relational alternative."""
    import pytest as _pytest

    from etl_job_applify_spark.similarity import vector_index as vxi

    corpus = _meta_corpus(spark)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "vxi_guard")
    vector_index_build(corpus, idx, num_cells=4, centroids=cents)
    big = spark.range(vxi.ESCALATE_MAX_BATCH + 1).select(
        F.col("id").alias("query_id"),
        F.expr(
            "array(1.0D, 0D, 0D, 0D, 0D, 0D, 0D, 0D)"
        ).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="vector_index_knn_join"):
        vector_index_probe(
            spark, idx, big, k=2, nprobe=1, escalate=True,
        )


def test_knn_join_adc_parity_with_probe(spark, tmp_path):
    """use_codes=True on the bulk join: the compressed path (relational
    per-(query,cell) LUTs, codes-only shuffle, shortlist + exact
    refine) is bit-identical to vector_index_probe(use_codes=True) at
    the same shortlist — on a PLAIN-encoded index, a RESIDUAL-encoded
    index, and under a where predicate."""
    import numpy as np

    from etl_job_applify_spark.similarity import (
        train_pq_codebooks,
        vector_index_knn_join,
    )

    corpus = _meta_corpus(spark)
    cents = np.asarray(_anchor_centroids(corpus))
    books = train_pq_codebooks(corpus, m=4, k=4)
    for enc in ("plain", "residual"):
        idx = str(tmp_path / f"vxi_knnj_adc_{enc}")
        vector_index_build(
            corpus, idx, num_cells=4, m=4, k_codes=4,
            centroids=cents, codebooks=books if enc == "plain" else None,
            pq_encoding=enc, meta_cols=["lang"],
        )
        want = _res(vector_index_probe(
            spark, idx, _queries(spark), k=5, nprobe=2,
            use_codes=True, shortlist=8,
        ))
        got = _res(vector_index_knn_join(
            spark, idx, _queries(spark), k=5, nprobe=2,
            use_codes=True, shortlist=8,
        ))
        assert got == want, enc
        want_f = _res(vector_index_probe(
            spark, idx, _queries(spark), k=5, nprobe=2,
            use_codes=True, shortlist=8, where="lang = 'en'",
        ))
        got_f = _res(vector_index_knn_join(
            spark, idx, _queries(spark), k=5, nprobe=2,
            use_codes=True, shortlist=8, where="lang = 'en'",
        ))
        assert got_f == want_f, enc


def test_knn_join_adc_ensure_k_and_guards(spark, tmp_path):
    """ADC bulk join composes with ensure_k (under-filled queries
    re-run at full coverage through the SAME compressed pass), and a
    codes-free index refuses use_codes with the probe's error."""
    import pytest as _pytest

    from etl_job_applify_spark.similarity import vector_index_knn_join

    corpus = _meta_corpus(spark)
    cents = _anchor_centroids(corpus)
    idx = str(tmp_path / "vxi_knnj_adc_ek")
    vector_index_build(
        corpus, idx, num_cells=4, m=4, k_codes=4,
        centroids=cents, meta_cols=["lang"],
    )
    # selective facet: nprobe=1 under-fills some queries at k=5
    got = vector_index_knn_join(
        spark, idx, _queries(spark), k=5, nprobe=1,
        use_codes=True, shortlist=16, where="lang = 'fr'",
        ensure_k=True,
    )
    per_q = {
        r["query_id"]: r["n"]
        for r in got.groupBy("query_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert per_q == {100: 5, 101: 5, 102: 5}
    # full-coverage ADC equals the full-coverage probe (the maximal
    # answer contract at nprobe = num_cells)
    want_full = _res(vector_index_probe(
        spark, idx, _queries(spark), k=5, nprobe=4,
        use_codes=True, shortlist=16, where="lang = 'fr'",
    ))
    got_full = _res(vector_index_knn_join(
        spark, idx, _queries(spark), k=5, nprobe=4,
        use_codes=True, shortlist=16, where="lang = 'fr'",
    ))
    assert got_full == want_full

    idx_plain = str(tmp_path / "vxi_knnj_nocodes")
    vector_index_build(corpus, idx_plain, num_cells=4, centroids=cents)
    with _pytest.raises(ValueError, match="no PQ codes"):
        vector_index_knn_join(
            spark, idx_plain, _queries(spark), k=5, use_codes=True
        )


def test_streaming_ingest_recall_policy_loop(spark, tmp_path):
    """The QUALITY policy loop: planted drift (a tight off-distribution
    cluster midway between two founding centroids) splits true
    neighbor sets across cells the serving nprobe never probes
    together — shadow recall@k drops below target and the loop
    triggers a reindex; post-action the drifted region owns a cell and
    recall recovers. The frozen twin (no loop) stays degraded, proving
    both the premise and the action."""
    from etl_job_applify_spark.streaming import (
        run_vector_index_ingest_stream,
    )

    # founding: four tight clusters on axes, pinned centroids
    cents = [
        [10.0 if j == c else 0.0 for j in range(DIM)] for c in range(4)
    ]
    f_rows = [
        (
            10 * c + i,
            [
                (10.0 if j == c else 0.0) + (0.1 * ((i + j) % 3))
                for j in range(DIM)
            ],
        )
        for c in range(4)
        for i in range(6)
    ]
    founding = spark.createDataFrame(
        f_rows, "vec_id long, embedding array<double>"
    )
    # drift: 12 vectors around [7,7,0,...] — jitter alternates toward
    # c0 / c1, so assignment under the FOUNDING quantizer splits them
    # across the two cells
    d_rows = []
    for i in range(1, 7):
        base = [0.0] * DIM
        d_rows.append(
            (1000 + i, [7.0 + 0.1 * i, 7.0 - 0.1 * i] + base[2:])
        )
        d_rows.append(
            (1100 + i, [7.0 - 0.1 * i, 7.0 + 0.1 * i] + base[2:])
        )
    drift = spark.createDataFrame(
        d_rows, "vec_id long, embedding array<double>"
    )
    shadow = spark.createDataFrame(
        [(1, [7.0, 7.0] + [0.0] * (DIM - 2))],
        "query_id long, embedding array<double>",
    )
    src = tmp_path / "src_recall"
    src.mkdir()
    founding.coalesce(1).write.parquet(str(src / "b0.parquet"))
    import time

    time.sleep(1.1)
    drift.coalesce(1).write.parquet(str(src / "b1.parquet"))

    def ingest(idx, target):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_vector_index_ingest_stream(
            stream, idx, num_cells=4, centroids=cents,
            shadow_queries=shadow, recall_target=target,
            recall_k=8, recall_nprobe=1,
        )

    def recall(idx):
        exact = {
            r["neighbor"]
            for r in vector_index_probe(
                spark, idx, shadow, k=8, nprobe=4
            ).collect()
        }
        served = {
            r["neighbor"]
            for r in vector_index_probe(
                spark, idx, shadow, k=8, nprobe=1
            ).collect()
        }
        return len(served & exact) / len(exact)

    frozen = str(tmp_path / "idx_recall_frozen")
    policy = str(tmp_path / "idx_recall_policy")
    ingest(frozen, None)
    ingest(policy, 0.8)
    # premise: under the frozen founding quantizer the drifted
    # neighbors split across two cells and nprobe=1 misses half
    assert recall(frozen) <= 0.5
    # action: the loop reindexed; the drifted region owns a cell now
    assert recall(policy) >= 0.8


def test_vector_cdc_atomic_snapshot_and_replay(spark, tmp_path):
    """vector_index_apply_cdc: one CAS snapshot carries tombstones +
    encoded adds + net count + fence. Delete+re-add in one batch lands
    as the re-add; unknown delete vids are ignored; a replayed epoch
    is a whole-batch no-op — including after a LATER epoch deleted one
    of the replayed adds (the divergence two-commit CDC suffers)."""
    from etl_job_applify_spark.similarity import vector_index_apply_cdc
    from etl_job_applify_spark.similarity.vector_index import (
        _vxi_read,
        vector_index_stats,
    )

    corpus = _vecs(spark, n=20)
    idx = str(tmp_path / "vxi_cdc")
    vector_index_build(
        corpus, idx, num_cells=4,
        centroids=_anchor_centroids(corpus),
    )
    readd = [9.0] * DIM
    batch = spark.createDataFrame(
        [(3, readd, "add"), (3, None, "delete"),
         (5, None, "delete"), (999, None, "delete"),
         (21, [1.0] * DIM, "add")],
        "vec_id long, embedding array<double>, op string",
    )
    out = vector_index_apply_cdc(batch, idx, epoch_mark="_epoch_t_1")
    assert out["n_added"] == 2 and out["n_tombstoned"] == 2
    st = vector_index_stats(spark, idx)
    assert st["n_vecs"] == 20  # -5, 3 replaced, +21
    _m, cells, _l = _vxi_read(spark, idx)
    live = {r["vid"]: r for r in cells.collect()}
    assert len(live) == 20 and 5 not in live and 21 in live
    # exactly one copy of 3, and it is the re-add
    assert [round(float(x), 3) for x in live[3]["vec"]] == readd

    # replay: fenced whole-batch no-op, stats identical
    assert vector_index_apply_cdc(batch, idx, epoch_mark="_epoch_t_1") is None
    assert vector_index_stats(spark, idx)["n_vecs"] == 20

    # later epoch deletes one of epoch 1's adds; replaying epoch 1
    # must NOT resurrect it (nor re-tombstone anything)
    b2 = spark.createDataFrame(
        [(21, None, "delete")],
        "vec_id long, embedding array<double>, op string",
    )
    vector_index_apply_cdc(b2, idx, epoch_mark="_epoch_t_2")
    assert vector_index_apply_cdc(batch, idx, epoch_mark="_epoch_t_1") is None
    _m2, cells2, _l2 = _vxi_read(spark, idx)
    vids = {r["vid"] for r in cells2.collect()}
    assert 21 not in vids and _m2["n_vecs"] == 19 == len(vids)


def test_streaming_vector_cdc_replay_invariance(spark, tmp_path):
    """run_vector_index_ingest_stream(op_col=...): CDC batches fold
    exactly-once; a full redelivery (fresh query, same source) leaves
    the index state identical — the text-stream CDC contract on the
    vector family."""
    import time

    from etl_job_applify_spark.similarity.vector_index import (
        _vxi_read,
        vector_index_stats,
    )
    from etl_job_applify_spark.streaming import (
        run_vector_index_ingest_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "vxi_stream_cdc")
    corpus = _vecs(spark, n=16)
    b0 = corpus.withColumn("op", F.lit("add"))
    b1 = spark.createDataFrame(
        [(2, None, "delete"), (16, [2.0] * DIM, "add"),
         (3, None, "delete"), (3, [3.0] * DIM, "add")],
        "vec_id long, embedding array<double>, op string",
    )
    b0.coalesce(1).write.parquet(str(src / "b0.parquet"))
    time.sleep(1.1)
    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    cents = _anchor_centroids(corpus)

    def run():
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<double>, op string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_vector_index_ingest_stream(
            stream, idx, num_cells=4, centroids=cents, op_col="op"
        )

    run()
    st1 = vector_index_stats(spark, idx)
    _m, cells, _l = _vxi_read(spark, idx)
    state1 = sorted(
        (r["vid"], tuple(round(float(x), 6) for x in r["vec"]))
        for r in cells.collect()
    )
    assert st1["n_vecs"] == 16  # -2, 3 replaced, +16
    assert 2 not in {v for v, _ in state1}
    run()  # full redelivery: epochs 0 and 1 again
    st2 = vector_index_stats(spark, idx)
    _m2, cells2, _l2 = _vxi_read(spark, idx)
    state2 = sorted(
        (r["vid"], tuple(round(float(x), 6) for x in r["vec"]))
        for r in cells2.collect()
    )
    assert state1 == state2
    assert st1["n_vecs"] == st2["n_vecs"]


def test_vector_cdc_upsert_and_batch_dedup(spark, tmp_path):
    """CDC adds are upserts: a plain re-add of a live vid (no delete
    row) tombstones the old version in the same snapshot, so exactly
    one version is served; duplicate add rows for one vid in a batch
    reduce to ONE deterministic winner (no duplicate cell entries, no
    inflated n_vecs)."""
    from etl_job_applify_spark.similarity import vector_index_apply_cdc
    from etl_job_applify_spark.similarity.vector_index import (
        _vxi_read,
        vector_index_stats,
    )

    corpus = _vecs(spark, n=8)
    idx = str(tmp_path / "vxi_upsert")
    vector_index_build(
        corpus, idx, num_cells=2, centroids=_anchor_centroids(corpus, 2),
    )
    v_a, v_b = [2.0] * DIM, [4.0] * DIM
    batch = spark.createDataFrame(
        # vid 3 is LIVE and re-added with no delete row; vid 100 is
        # new but appears twice with different vectors
        [(3, [9.0] * DIM, "add"), (100, v_a, "add"), (100, v_b, "add")],
        "vec_id long, embedding array<double>, op string",
    )
    out = vector_index_apply_cdc(batch, idx, epoch_mark="_e1")
    assert out["n_added"] == 2          # distinct vids, not raw rows
    assert out["n_tombstoned"] == 1     # the replaced live vid 3
    assert vector_index_stats(spark, idx)["n_vecs"] == 9  # 8 - 1 + 2
    _m, cells, _l = _vxi_read(spark, idx)
    rows = cells.collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["vid"], []).append(r)
    assert len(by_vid[3]) == 1          # old version not served
    assert [round(float(x), 3) for x in by_vid[3][0]["vec"]] == [9.0] * DIM
    assert len(by_vid[100]) == 1        # batch duplicates reduced
    # the winner is deterministic: re-applying the same batch under a
    # new epoch replaces with the SAME row (n_vecs stays put)
    win1 = [round(float(x), 3) for x in by_vid[100][0]["vec"]]
    vector_index_apply_cdc(batch, idx, epoch_mark="_e2")
    _m2, cells2, _l2 = _vxi_read(spark, idx)
    live2 = {r["vid"]: r for r in cells2.collect()}
    assert _m2["n_vecs"] == 9
    assert [round(float(x), 3) for x in live2[100]["vec"]] == win1


def test_streaming_vector_cdc_deletes_only_founding_batch_dropped(
    spark, tmp_path
):
    """A deletes-only CDC batch delivered BEFORE the index is founded
    targets nothing (documented contract): it must be dropped — not
    found a degenerate index by training the quantizer on zero adds —
    and the next adds-bearing batch founds normally."""
    import time

    from etl_job_applify_spark.similarity.vector_index import (
        _vxi_is_versioned,
        vector_index_stats,
    )
    from etl_job_applify_spark.streaming import (
        run_vector_index_ingest_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "vxi_founding_dels")
    b0 = spark.createDataFrame(
        [(1, None, "delete"), (2, None, "delete")],
        "vec_id long, embedding array<double>, op string",
    )
    corpus = _vecs(spark, n=12)
    b1 = corpus.withColumn("op", F.lit("add"))
    b0.coalesce(1).write.parquet(str(src / "b0.parquet"))
    time.sleep(1.1)
    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<double>, op string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    run_vector_index_ingest_stream(
        stream, idx, num_cells=4,
        centroids=_anchor_centroids(corpus), op_col="op",
    )
    assert _vxi_is_versioned(spark, idx)
    assert vector_index_stats(spark, idx)["n_vecs"] == 12


def test_driver_probe_twins_bit_exact(spark):
    """The driver-side probe planners (py_norm / py_probe_cells /
    py_normed / py_residual / py_lut) must reproduce the Spark
    expressions BIT-FOR-BIT — the probe path serves their values as
    local relations, so any ulp drift would silently change shortlist
    membership and therefore served top-k rows."""
    import struct

    import numpy as np

    from etl_job_applify_spark.functions.vectors import py_norm, with_norm
    from etl_job_applify_spark.similarity.ivf import py_probe_cells
    from etl_job_applify_spark.similarity.pq import (
        _adc_lut_expr,
        adc_lut_raw_expr,
        py_lut,
        py_normed,
        py_residual,
        residual_col,
        train_pq_codebooks,
    )
    from etl_job_applify_spark.similarity.vector_index import (
        _probe_cells_expr,
    )

    def bits(x):
        return struct.pack("<d", float(x)).hex()

    corpus = _vecs(spark, n=48)
    cents = np.asarray(_anchor_centroids(corpus, num_cells=4))
    offs = cents * 0.25  # arbitrary per-cell offsets for the residual leg
    books = train_pq_codebooks(corpus, m=4, k=4, seed=7)
    q = _queries(spark)
    got = (
        with_norm(q, "embedding")
        .withColumn(
            "probe", F.expr(_probe_cells_expr("embedding", cents, 3))
        )
        .withColumn("lut", _adc_lut_expr("embedding", books))
        .withColumn("cell", F.lit(2))
        .withColumn("resid", residual_col("embedding", "cell", offs))
        .withColumn("rlut", adc_lut_raw_expr("resid", books))
        .collect()
    )
    for r in got:
        vec = list(r["embedding"])
        norm = py_norm(vec)
        assert bits(norm) == bits(r["norm"])
        assert py_probe_cells(vec, cents, 3) == list(r["probe"])
        normed = py_normed(vec, norm)
        lut = py_lut(normed, books)
        assert [[bits(x) for x in row] for row in lut] == [
            [bits(x) for x in row] for row in r["lut"]
        ]
        resid = py_residual(normed, 2, offs)
        assert [bits(x) for x in resid] == [bits(x) for x in r["resid"]]
        rlut = py_lut(resid, books)
        assert [[bits(x) for x in row] for row in rlut] == [
            [bits(x) for x in row] for row in r["rlut"]
        ]
