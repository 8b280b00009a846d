"""Persisted inverted text index: build/append/probe/optimize lifecycle
(functions/text_index.py).

Contract: index-served BM25 scores and phrase hits are BIT-IDENTICAL
to the recompute path over the same corpus (shared scoring kernel),
appends keep df/dl/stats exact, probes prune to the query terms'
bucket partitions, and compaction preserves results while bounding the
file count — the q190/q191 lifecycle lowered onto persisted state.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.functions.retrieval import bm25_scores
from etl_job_applify_spark.functions.text_index import (
    _index_data_files,
    optimize_text_index,
    text_index_bm25,
    text_index_build,
    text_index_phrase_hits,
    text_index_terms,
)

_WORDS = [
    "hash", "join", "scan", "filter", "sort", "merge", "stream",
    "batch", "window", "spark", "column", "vector",
]


def _docs(spark, start=0, n=40):
    rows = [
        (
            start + i,
            " ".join(
                _WORDS[(start + i + j) % len(_WORDS)]
                for j in range((start + i) % 7 + 3)
            ),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _qterms(spark):
    return spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "sort"), (2, "merge"), (2, "scan")],
        "qid int, word string",
    )


def _score_map(df):
    return {
        (r["qid"], r["doc_id"]): r["score"] for r in df.collect()
    }


def test_index_bm25_bit_identical_to_recompute(spark, tmp_path):
    idx = str(tmp_path / "tidx")
    docs = _docs(spark)
    text_index_build(docs, idx, layout="flat")
    served = _score_map(text_index_bm25(spark, idx, _qterms(spark)))
    recomputed = _score_map(bm25_scores(docs, _qterms(spark)))
    assert served == recomputed and len(served) > 0  # bit-exact, == not ≈


def test_index_append_keeps_df_dl_stats_exact(spark, tmp_path):
    """After appending a second generation, served scores must equal a
    recompute over BOTH generations — df, dl and the integer avgdl
    stats all shift with the append and any drift changes bits."""
    idx = str(tmp_path / "tidx")
    gen1, gen2 = _docs(spark, 0, 40), _docs(spark, 100, 25)
    text_index_build(gen1, idx, layout="flat")
    text_index_build(gen2, idx, mode="append")
    both = gen1.unionByName(gen2)
    served = _score_map(text_index_bm25(spark, idx, _qterms(spark)))
    assert served == _score_map(bm25_scores(both, _qterms(spark)))


def test_index_phrase_hits_match_recompute(spark, tmp_path):
    from etl_job_applify_spark.functions.retrieval import (
        phrase_hits,
        token_positions,
    )

    idx = str(tmp_path / "tidx")
    docs = _docs(spark)
    text_index_build(docs, idx, layout="flat")
    phrase = ["hash", "join"]
    served = {
        (r["doc_id"], r["p"])
        for r in text_index_phrase_hits(spark, idx, phrase).collect()
    }
    direct = {
        (r["doc_id"], r["p"])
        for r in phrase_hits(token_positions(docs), phrase).collect()
    }
    assert served == direct and len(served) > 0


def test_probe_prunes_to_term_buckets(spark, tmp_path):
    """The per-term scan must PRUNE partitions: with 64 wb buckets and
    2 query terms, at most 2 bucket partitions may survive into the
    scan (the point of the layout — a term read never scans the
    index), and the word predicate must push into the parquet scan."""
    idx = str(tmp_path / "tidx")
    text_index_build(_docs(spark), idx, num_buckets=64, layout="flat")
    scan = text_index_terms(spark, idx, ["hash", "join"])
    plan = scan._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[wb[^ ]* IN \(([^)]*)\)\]", plan)
    assert m, plan  # partition filter present, IN-list form
    assert len(m.group(1).split(",")) <= 2  # <= one bucket per term
    m2 = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m2 and "In(word" in m2.group(1)  # word IN pushed to parquet
    # pruning has something to prune: the index spans > 2 bucket dirs
    all_buckets = {
        f.split("wb=")[1].split("/")[0]
        for f in _index_data_files(os.path.join(idx, "postings"))
    }
    assert len(all_buckets) > 2


def test_append_parameter_drift_refused(spark, tmp_path):
    idx = str(tmp_path / "tidx")
    text_index_build(_docs(spark), idx, num_buckets=64, layout="flat")
    with pytest.raises(ValueError, match="num_buckets"):
        text_index_build(
            _docs(spark, 100), idx, num_buckets=32, mode="append"
        )


def test_optimize_bounds_files_preserves_results(spark, tmp_path):
    idx = str(tmp_path / "tidx")
    text_index_build(_docs(spark, 0, 30), idx, num_buckets=8, layout="flat")
    for g in range(4):
        text_index_build(
            _docs(spark, 200 + g * 50, 10), idx, num_buckets=8,
            mode="append",
        )
    before = _score_map(text_index_bm25(spark, idx, _qterms(spark)))
    files_grown = len(_index_data_files(idx))
    res = optimize_text_index(spark, idx)
    assert res["files_after"] < files_grown == res["files_before"]
    # postings bounded by buckets x bins (bins=1 here), doclens by 1
    assert (
        len(_index_data_files(os.path.join(idx, "postings"))) <= 8
        and len(_index_data_files(os.path.join(idx, "doclens"))) == 1
    )
    assert _score_map(text_index_bm25(spark, idx, _qterms(spark))) == before
    # lifecycle continues: append after compaction still exact
    extra = _docs(spark, 900, 10)
    text_index_build(extra, idx, num_buckets=8, mode="append")
    all_docs = _docs(spark, 0, 30)
    for g in range(4):
        all_docs = all_docs.unionByName(_docs(spark, 200 + g * 50, 10))
    all_docs = all_docs.unionByName(extra)
    assert _score_map(
        text_index_bm25(spark, idx, _qterms(spark))
    ) == _score_map(bm25_scores(all_docs, _qterms(spark)))


def test_interrupted_optimize_swap_recovers(spark, tmp_path):
    """Mid-swap crash (live index renamed away, complete __compact
    present): the next probe must transparently finish the swap; a
    stale-but-complete __compact beside a LIVE index must be cleared,
    never promoted later."""
    import shutil

    idx = str(tmp_path / "tidx")
    docs = _docs(spark)
    text_index_build(docs, idx, layout="flat")
    before = _score_map(text_index_bm25(spark, idx, _qterms(spark)))

    # mid-swap crash
    shutil.copytree(idx, idx + "__compact")
    os.rename(idx, idx + "__old")
    assert _score_map(text_index_bm25(spark, idx, _qterms(spark))) == before
    assert os.path.exists(idx)
    assert not os.path.exists(idx + "__old")
    assert not os.path.exists(idx + "__compact")

    # stale complete staging beside live index: cleared at next entry
    shutil.copytree(idx, idx + "__compact")
    text_index_build(_docs(spark, 500, 5), idx, mode="append")
    assert not os.path.exists(idx + "__compact")


def test_optimize_rejects_non_local_paths(spark):
    with pytest.raises(ValueError, match="local index path"):
        optimize_text_index(spark, "s3://bucket/tidx")


def test_versioned_text_index_matches_flat_and_recompute(spark, tmp_path):
    """layout='versioned': one CAS snapshot per batch, scores
    bit-identical to both the flat layout and the raw-text recompute
    (the summed per-snapshot stats must equal the flat running meta)."""
    flat, vers = str(tmp_path / "flat"), str(tmp_path / "vers")
    gen1, gen2 = _docs(spark, 0, 40), _docs(spark, 100, 25)
    text_index_build(gen1, flat, layout="flat")
    text_index_build(gen2, flat, mode="append")
    text_index_build(gen1, vers, layout="versioned")
    text_index_build(gen2, vers, mode="append")  # auto-detects layout
    assert len([d for d in os.listdir(vers) if d.startswith("snap_")]) == 2
    both = gen1.unionByName(gen2)
    served_flat = _score_map(text_index_bm25(spark, flat, _qterms(spark)))
    served_vers = _score_map(text_index_bm25(spark, vers, _qterms(spark)))
    assert served_vers == served_flat
    assert served_vers == _score_map(bm25_scores(both, _qterms(spark)))
    # phrase path too
    phrase = ["hash", "join"]
    assert {
        (r["doc_id"], r["p"])
        for r in text_index_phrase_hits(spark, vers, phrase).collect()
    } == {
        (r["doc_id"], r["p"])
        for r in text_index_phrase_hits(spark, flat, phrase).collect()
    }


def test_versioned_text_index_epoch_fence_and_compaction(spark, tmp_path):
    """Replayed appends are fenced; CAS compaction folds snapshots,
    sums stats, carries epoch marks, prunes — and serves identical
    scores after."""
    from etl_job_applify_spark.functions.text_index import (
        _index_data_files as files,
    )

    vers = str(tmp_path / "vers")
    gen1, gen2 = _docs(spark, 0, 30), _docs(spark, 100, 12)
    text_index_build(gen1, vers, layout="versioned")
    text_index_build(
        gen2, vers, mode="append", epoch_mark="_epoch_tidx_1"
    )
    text_index_build(  # replay: must commit nothing
        gen2, vers, mode="append", epoch_mark="_epoch_tidx_1"
    )
    snaps = [d for d in os.listdir(vers) if d.startswith("snap_")]
    assert len(snaps) == 2
    both = gen1.unionByName(gen2)
    before = _score_map(text_index_bm25(spark, vers, _qterms(spark)))
    assert before == _score_map(bm25_scores(both, _qterms(spark)))

    res = optimize_text_index(spark, vers)  # auto-routes to CAS path
    from etl_job_applify_spark.functions.text_index import _tidx_recover_live

    # live set = the compacted snapshot; folded snapshots stay on disk
    # for one grace cycle (in-flight readers finish against intact files)
    assert [p.rsplit("/", 1)[1] for p in _tidx_recover_live(spark, vers)] == [
        "snap_00000003"
    ]
    snaps = sorted(d for d in os.listdir(vers) if d.startswith("snap_"))
    assert snaps == ["snap_00000001", "snap_00000002", "snap_00000003"]
    assert res["files_after"] <= res["files_before"]
    # fence survived compaction; scores unchanged; appends continue
    assert "_epoch_tidx_1" in os.listdir(f"{vers}/{snaps[-1]}")
    assert _score_map(text_index_bm25(spark, vers, _qterms(spark))) == before
    gen3 = _docs(spark, 300, 8)
    text_index_build(gen3, vers, mode="append")
    assert _score_map(
        text_index_bm25(spark, vers, _qterms(spark))
    ) == _score_map(bm25_scores(both.unionByName(gen3), _qterms(spark)))


def test_versioned_text_index_commit_prune_crash_recovers(spark, tmp_path):
    """Folded-but-unpruned snapshots (the commit-to-prune crash window —
    and, since the grace window, the normal state for one compaction
    cycle) must never be double-counted: df/tf double-counting would
    shift every score. A second compaction physically prunes the first
    cycle's folded snapshots."""
    from etl_job_applify_spark.functions.text_index import _tidx_recover_live

    vers = str(tmp_path / "vers")
    text_index_build(_docs(spark, 0, 30), vers, layout="versioned")
    text_index_build(_docs(spark, 100, 12), vers, mode="append")
    expect = _score_map(text_index_bm25(spark, vers, _qterms(spark)))
    optimize_text_index(spark, vers)
    # folded snapshots still on disk, excluded from scoring
    assert "snap_00000001" in os.listdir(vers)
    assert _score_map(text_index_bm25(spark, vers, _qterms(spark))) == expect
    assert [
        p.rsplit("/", 1)[1] for p in _tidx_recover_live(spark, vers)
    ] == ["snap_00000003"]
    optimize_text_index(spark, vers)  # supersedes the first compaction
    assert "snap_00000001" not in os.listdir(vers)
    assert _score_map(text_index_bm25(spark, vers, _qterms(spark))) == expect


def test_delete_serves_surviving_corpus_exactly(spark, tmp_path):
    """After tombstoning, every probe surface (BM25 scores, phrase hits,
    term postings, stats) must equal a fresh index built on only the
    survivors — bit-exact."""
    from etl_job_applify_spark.functions.text_index import text_index_delete

    idx = str(tmp_path / "tidx_del")
    ref = str(tmp_path / "tidx_ref")
    docs = _docs(spark)
    survivors = docs.filter(F.col("doc_id") % 4 != 1)
    text_index_build(docs, idx, layout="flat")
    text_index_build(survivors, ref, layout="flat")
    doomed = [int(r.doc_id) for r in docs.filter(
        F.col("doc_id") % 4 == 1).collect()]
    out = text_index_delete(spark, idx, doomed)
    assert out["n_tombstoned"] == len(doomed)

    q = _qterms(spark)
    assert _score_map(text_index_bm25(spark, idx, q)) == _score_map(
        text_index_bm25(spark, ref, q)
    )
    got_hits = {
        (r.doc_id, r.p)
        for r in text_index_phrase_hits(spark, idx, ["hash", "join"]).collect()
    }
    want_hits = {
        (r.doc_id, r.p)
        for r in text_index_phrase_hits(spark, ref, ["hash", "join"]).collect()
    }
    assert got_hits == want_hits
    assert not any(
        r.doc % 4 == 1
        for r in text_index_terms(spark, idx, ["hash"]).collect()
    )

    # idempotence: re-deleting the same ids (plus unknown ids) is a no-op
    again = text_index_delete(spark, idx, doomed + [10_000, 10_001])
    assert again["n_tombstoned"] == 0
    assert _score_map(text_index_bm25(spark, idx, q)) == _score_map(
        text_index_bm25(spark, ref, q)
    )


def test_optimize_purges_tombstones_and_restores_fast_path(spark, tmp_path):
    """Compaction must rewrite only surviving rows, drop the deletes
    directory, fix the meta counters, and keep every served result
    identical."""
    import os as _os

    from etl_job_applify_spark.functions.text_index import (
        _read_meta,
        text_index_delete,
    )

    idx = str(tmp_path / "tidx_purge")
    docs = _docs(spark)
    text_index_build(docs, idx, layout="flat")
    text_index_delete(
        spark, idx,
        [int(r.doc_id) for r in docs.filter(F.col("doc_id") < 10).collect()],
    )
    q = _qterms(spark)
    before = _score_map(text_index_bm25(spark, idx, q))
    optimize_text_index(spark, idx)
    assert not _os.path.isdir(_os.path.join(idx, "deletes"))
    assert _score_map(text_index_bm25(spark, idx, q)) == before
    meta = _read_meta(idx)
    survivors = docs.filter(F.col("doc_id") >= 10)
    assert meta["n_docs"] == survivors.count()
    # no tombstoned row survives in the data files
    assert not any(
        r.doc < 10 for r in text_index_terms(spark, idx, _WORDS).collect()
    )




def test_versioned_delete_lifecycle(spark, tmp_path):
    """Versioned layout: the delete snapshot (tombstones + negative
    stats increment, one CAS commit) must make every probe equal a
    survivor-only rebuild; append-after-delete composes; compaction
    purges tombstoned rows and the delete snapshot itself."""
    from etl_job_applify_spark.functions.text_index import (
        _tidx_read,
        text_index_delete,
    )
    from etl_job_applify_spark.sinks.versioned import snapshot_members

    idx = str(tmp_path / "tidx_vdel")
    ref = str(tmp_path / "tidx_vref")
    docs = _docs(spark)
    text_index_build(docs, idx, layout="versioned")
    doomed = [int(r.doc_id) for r in docs.filter(
        F.col("doc_id") % 4 == 1).collect()]
    out = text_index_delete(spark, idx, doomed)
    assert out["n_tombstoned"] == len(doomed)

    # append a fresh batch AFTER the delete
    extra = _docs(spark, start=100, n=10)
    text_index_build(extra, idx, mode="append")
    survivors = docs.filter(F.col("doc_id") % 4 != 1).unionByName(extra)
    text_index_build(survivors, ref, layout="versioned")

    q = _qterms(spark)
    assert _score_map(text_index_bm25(spark, idx, q)) == _score_map(
        text_index_bm25(spark, ref, q)
    )

    # re-delete is a no-op (no new snapshot, same results)
    assert text_index_delete(spark, idx, doomed)["n_tombstoned"] == 0

    # compaction purges rows AND the tombstone subtree
    before = _score_map(text_index_bm25(spark, idx, q))
    optimize_text_index(spark, idx, target_file_rows=10)
    meta, posts, dls, live = _tidx_read(spark, idx)
    assert len(live) == 1
    assert "deletes" not in snapshot_members(spark, live[0])
    assert meta["n_docs"] == survivors.count()
    assert not any(r.doc % 4 == 1 and r.doc < 100 for r in posts.collect())
    assert _score_map(text_index_bm25(spark, idx, q)) == before


def test_versioned_delete_everything_then_probe(spark, tmp_path):
    """Deleting the whole corpus must serve zero results (and compaction
    of the empty index must not crash on the 0-row schema read-back)."""
    from etl_job_applify_spark.functions.text_index import text_index_delete

    idx = str(tmp_path / "tidx_vempty")
    docs = _docs(spark, n=8)
    text_index_build(docs, idx, layout="versioned")
    ids = [int(r.doc_id) for r in docs.collect()]
    assert text_index_delete(spark, idx, ids)["n_tombstoned"] == 8
    assert text_index_bm25(spark, idx, _qterms(spark)).count() == 0
    optimize_text_index(spark, idx)
    assert text_index_bm25(spark, idx, _qterms(spark)).count() == 0


def test_versioned_delete_race_loses_no_tombstones(spark, tmp_path):
    """Two threads deleting DISJOINT doc sets concurrently: the CAS loop
    must serialize them — both tombstone sets take effect, no lost
    update."""
    import threading

    from etl_job_applify_spark.functions.text_index import text_index_delete

    idx = str(tmp_path / "tidx_race")
    docs = _docs(spark)
    text_index_build(docs, idx, layout="versioned")
    set_a = [0, 1, 2, 3]
    set_b = [4, 5, 6, 7]
    results = {}

    def worker(name, ids):
        results[name] = text_index_delete(spark, idx, ids)["n_tombstoned"]

    threads = [
        threading.Thread(target=worker, args=("a", set_a)),
        threading.Thread(target=worker, args=("b", set_b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["a"] == 4 and results["b"] == 4

    survivors = docs.filter(~F.col("doc_id").isin(set_a + set_b))
    ref = str(tmp_path / "tidx_race_ref")
    text_index_build(survivors, ref, layout="versioned")
    q = _qterms(spark)
    assert _score_map(text_index_bm25(spark, idx, q)) == _score_map(
        text_index_bm25(spark, ref, q)
    )


def test_versioned_delete_then_reappend_serves_again(spark, tmp_path):
    """GDPR-erase-then-reingest: a doc id appended AFTER its deletion
    must be served again (tombstones are version-scoped to the
    snapshots that preceded the delete), and the summed stats counters
    must stay exact — every probe equals a clean rebuild of the final
    corpus."""
    from etl_job_applify_spark.functions.text_index import (
        _tidx_read,
        text_index_delete,
    )

    idx = str(tmp_path / "tidx_reapp")
    ref = str(tmp_path / "tidx_reapp_ref")
    docs = _docs(spark, n=20)
    text_index_build(docs, idx, layout="versioned")
    erased = [3, 7, 11]
    assert text_index_delete(spark, idx, erased)["n_tombstoned"] == 3

    # re-ingest the erased ids with NEW text (the reingest flow)
    reingested = spark.createDataFrame(
        [(i, "hash join hash stream") for i in erased],
        "doc_id long, text string",
    )
    text_index_build(reingested, idx, mode="append")

    final = docs.filter(~F.col("doc_id").isin(erased)).unionByName(
        reingested
    )
    text_index_build(final, ref, layout="versioned")
    q = _qterms(spark)
    assert _score_map(text_index_bm25(spark, idx, q)) == _score_map(
        text_index_bm25(spark, ref, q)
    )
    # the re-appended ids are served (not suppressed by the older
    # tombstone), with the NEW postings only
    served = {
        int(r.doc)
        for r in text_index_terms(spark, idx, ["hash"]).collect()
    }
    assert set(erased) <= served
    meta, posts, dls, _ = _tidx_read(spark, idx)
    assert meta["n_docs"] == final.count()
    assert meta["total_dl"] == dls.agg(F.sum("dl")).first()[0]
    # compaction folds the mixed history without resurrecting anything
    optimize_text_index(spark, idx)
    assert _score_map(text_index_bm25(spark, idx, q)) == _score_map(
        text_index_bm25(spark, ref, q)
    )


def test_flat_purge_everything_stays_probeable(spark, tmp_path):
    """Flat layout: tombstoning EVERY document and compacting must leave
    a probeable (0-result) index — the optimize records the postings/
    doclens schemas in the meta so later reads never schema-infer an
    empty directory — and a later append revives it."""
    from etl_job_applify_spark.functions.text_index import text_index_delete

    idx = str(tmp_path / "tidx_flat_empty")
    docs = _docs(spark, n=8)
    text_index_build(docs, idx, layout="flat")
    ids = [int(r.doc_id) for r in docs.collect()]
    assert text_index_delete(spark, idx, ids)["n_tombstoned"] == 8
    optimize_text_index(spark, idx)
    q = _qterms(spark)
    assert text_index_bm25(spark, idx, q).count() == 0
    assert text_index_terms(spark, idx, ["hash"]).count() == 0
    assert text_index_phrase_hits(spark, idx, ["hash", "join"]).count() == 0
    # the empty index accepts a fresh batch and serves exactly it
    batch = _docs(spark, start=50, n=6)
    text_index_build(batch, idx, mode="append")
    ref = str(tmp_path / "tidx_flat_empty_ref")
    text_index_build(batch, ref, layout="flat")
    assert _score_map(text_index_bm25(spark, idx, q)) == _score_map(
        text_index_bm25(spark, ref, q)
    )


def test_log_idf_pruned_topk_lossless_with_negative_idf(spark, tmp_path):
    """scoring="log" can produce NEGATIVE idf (df > n/2 stopwords);
    the WAND bound dominance is sign-agnostic, so the pruned top-k must
    still equal the exhaustive-scoring top-k exactly. 'the' is in every
    doc (df = n → idf = ln(0.5/(n+0.5)) < 0); 'rare' is in two."""
    from pyspark.sql import Window

    from etl_job_applify_spark.functions.text_index import (
        text_index_bm25_topk,
    )

    rows = [
        (i, "the " + " ".join(_WORDS[(i + j) % len(_WORDS)]
                              for j in range(i % 5 + 2))
            + (" rare" if i in (3, 17) else ""))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qterms = spark.createDataFrame(
        [(1, "the"), (1, "rare"), (2, "the"), (2, "hash")],
        "qid int, word string",
    )
    idx = str(tmp_path / "logidx")
    text_index_build(docs, idx, layout="flat")
    pruned = text_index_bm25_topk(spark, idx, qterms, k=3, scoring="log")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    exhaustive = (
        text_index_bm25(spark, idx, qterms, scoring="log")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("qid", "doc_id", "rnk", "score")
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, exhaustive.collect())
    )
    # the premise actually held: at least one idf was negative (a
    # negative contribution implies negative idf)
    any_neg = (
        text_index_bm25(spark, idx, qterms.filter("word = 'the'"),
                        scoring="log")
        .filter(F.col("score") < 0)
        .count()
    )
    assert any_neg > 0


def test_bm25_scoring_variant_validation(spark):
    import pytest as _pytest

    from etl_job_applify_spark.functions.retrieval import _idf_expr

    assert _idf_expr("odds").startswith("((")
    assert _idf_expr("log").startswith("ln((")
    with _pytest.raises(ValueError):
        _idf_expr("bm25plus")


def test_default_layout_is_versioned(spark, tmp_path):
    """Production default: a build with no layout argument founds the
    versioned (object-store-capable, CAS-committed) layout — the flat
    directory layout is an explicit local-filesystem opt-in."""
    from etl_job_applify_spark.sinks.versioned import list_versions

    idx = str(tmp_path / "defidx")
    text_index_build(_docs(spark), idx)
    assert list_versions(spark, idx) == [1]
    assert not os.path.exists(os.path.join(idx, "_text_index_meta.json"))
    # and the default-layout index serves identically to the recompute
    got = _score_map(text_index_bm25(spark, idx, _qterms(spark)))
    want = _score_map(
        bm25_scores(_docs(spark), _qterms(spark)).withColumnRenamed(
            "doc_id", "doc_id"
        )
    )
    assert got == want


def test_versioned_text_index_auto_compaction_threshold(spark, tmp_path):
    """max_snapshots on appends: the live snapshot count stays bounded
    (auto-triggered optimize under the CAS publish) and scores stay
    bit-identical to the raw-text recompute throughout."""
    from etl_job_applify_spark.functions.text_index import (
        _tidx_recover_live,
    )

    vers = str(tmp_path / "auto_vers")
    gens = [_docs(spark, 100 * g, 6) for g in range(7)]
    text_index_build(gens[0], vers, layout="versioned")
    both = gens[0]
    for gen in gens[1:]:
        text_index_build(gen, vers, mode="append", max_snapshots=3)
        both = both.unionByName(gen)
        assert len(_tidx_recover_live(spark, vers)) <= 3
    assert _score_map(
        text_index_bm25(spark, vers, _qterms(spark))
    ) == _score_map(bm25_scores(both, _qterms(spark)))


def test_text_index_stats_flat_lifecycle(spark, tmp_path):
    """DESCRIBE INDEX on the flat layout: counters exact through
    append/delete/compact; postings-derived shape matches a recompute."""
    from etl_job_applify_spark.functions.retrieval import token_positions
    from etl_job_applify_spark.functions.text_index import text_index_delete, text_index_stats

    idx = str(tmp_path / "tidx_stats")
    gen1, gen2 = _docs(spark, 0, 30), _docs(spark, 100, 10)
    text_index_build(gen1, idx, layout="flat")
    text_index_build(gen2, idx, mode="append")
    text_index_delete(spark, idx, [0, 1, 100])
    st = text_index_stats(spark, idx)
    both = gen1.unionByName(gen2).filter(
        ~F.col("doc_id").isin([0, 1, 100])
    )
    toks = token_positions(both)
    want_postings = toks.groupBy("doc_id", "word").count().count()
    want_terms = toks.select("word").distinct().count()
    assert st["layout"] == "flat" and st["live_snapshots"] == 1
    assert st["n_pending_tombstones"] == 3
    assert st["n_docs_live"] == 37
    assert st["n_postings"] == want_postings
    assert st["n_terms"] == want_terms
    assert st["bucket_skew"] >= 1.0 and st["data_files"] >= 2
    optimize_text_index(spark, idx)
    st2 = text_index_stats(spark, idx)
    assert st2["n_pending_tombstones"] == 0
    assert st2["n_docs"] == st2["n_docs_live"] == 37
    assert st2["n_postings"] == want_postings


def _meta_docs(spark, start=0, n=40):
    langs = ["en", "de", "fr"]
    return _docs(spark, start, n).withColumn(
        "lang",
        F.element_at(
            F.array(*[F.lit(x) for x in langs]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    )


def test_filtered_bm25_faceted_semantics(spark, tmp_path):
    """Faceted retrieval: where= filters CANDIDATES while corpus stats
    stay corpus-wide — served scores equal the raw recompute over the
    full live corpus post-filtered to the facet (score identity), and
    the WAND top-k path stays lossless within the facet. Exercised
    through append + delete on the flat layout (meta columns survive
    both) and compaction."""
    from etl_job_applify_spark.functions.text_index import (
        text_index_bm25_topk,
        text_index_delete,
    )

    idx = str(tmp_path / "tidx_facet")
    gen1, gen2 = _meta_docs(spark, 0, 40), _meta_docs(spark, 100, 20)
    text_index_build(gen1, idx, layout="flat", meta_cols=["lang"])
    text_index_build(gen2, idx, mode="append")
    text_index_delete(spark, idx, [3, 6, 102])
    live = gen1.unionByName(gen2).filter(
        ~F.col("doc_id").isin([3, 6, 102])
    )
    served = _score_map(
        text_index_bm25(spark, idx, _qterms(spark), where="lang = 'en'")
    )
    full = _score_map(bm25_scores(live, _qterms(spark)))
    en_ids = {
        r["doc_id"] for r in live.filter(F.col("lang") == "en").collect()
    }
    want = {k: v for k, v in full.items() if k[1] in en_ids}
    assert served == want and len(served) > 0
    # every served doc scores identically to its unfaceted self
    assert all(full[k] == v for k, v in served.items())
    # pruned top-k lossless within the facet
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    exh = (
        text_index_bm25(spark, idx, _qterms(spark), where="lang = 'en'")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("qid", "doc_id", "rnk", "score")
    )
    got = text_index_bm25_topk(
        spark, idx, _qterms(spark), k=3, where="lang = 'en'"
    ).select("qid", "doc_id", "rnk", "score")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exh.collect())
    )
    # compaction preserves meta columns and faceted results
    optimize_text_index(spark, idx)
    assert _score_map(
        text_index_bm25(spark, idx, _qterms(spark), where="lang = 'en'")
    ) == served


def test_filtered_bm25_meta_col_validation(spark, tmp_path):
    from etl_job_applify_spark.functions.text_index import text_index_stats

    idx = str(tmp_path / "tidx_facet_val")
    text_index_build(_meta_docs(spark), idx, meta_cols=["lang"])
    assert text_index_stats(spark, idx)["meta_cols"] == ["lang"]
    with pytest.raises(ValueError, match="meta_cols"):
        text_index_build(
            _meta_docs(spark, 100, 5), idx, mode="append",
            meta_cols=["other"],
        )
    # omitted meta_cols on append: recorded set carried automatically
    text_index_build(_meta_docs(spark, 100, 5), idx, mode="append")
    served = _score_map(
        text_index_bm25(spark, idx, _qterms(spark), where="lang = 'de'")
    )
    assert len(served) > 0


def test_bm25_facet_scoped_stats(spark, tmp_path):
    """stats_scope="facet": n/avgdl/df recompute over the predicate
    survivors — served scores equal the raw recompute over ONLY the
    facet sub-corpus (as if it were the whole index), and differ from
    the corpus-scoped default whenever the facet shifts any statistic.
    Validation: facet scope without a predicate raises, unknown scopes
    raise."""
    from etl_job_applify_spark.functions.retrieval import bm25_scores

    idx = str(tmp_path / "tidx_facet_stats")
    docs = _meta_docs(spark, 0, 40)
    text_index_build(docs, idx, meta_cols=["lang"])
    def _rows(df):
        return sorted(
            (r["qid"], r["doc_id"], r["score"]) for r in df.collect()
        )

    got = _rows(
        text_index_bm25(
            spark, idx, _qterms(spark),
            where="lang = 'en'", stats_scope="facet",
        )
    )
    sub = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    want = _rows(
        bm25_scores(sub, _qterms(spark)).withColumnRenamed(
            "__doc", "doc_id"
        )
        if "__doc" in bm25_scores(sub, _qterms(spark)).columns
        else bm25_scores(sub, _qterms(spark))
    )
    assert got == want
    corpus_scoped = _rows(
        text_index_bm25(spark, idx, _qterms(spark), where="lang = 'en'")
    )
    assert got != corpus_scoped  # the facet really shifts statistics
    with pytest.raises(ValueError, match="requires a where"):
        text_index_bm25(
            spark, idx, _qterms(spark), stats_scope="facet"
        )
    with pytest.raises(ValueError, match="unknown stats_scope"):
        text_index_bm25(
            spark, idx, _qterms(spark),
            where="lang = 'en'", stats_scope="shard",
        )


def _stream_batches(spark, tmp_path, batches):
    """Write parquet micro-batches (mtime-ordered) and return a
    maxFilesPerTrigger=1 file-source stream over them."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    schema = None
    for i, df in enumerate(batches):
        if i:
            time.sleep(1.1)  # file-source ordering is mtime-based
        df.coalesce(1).write.parquet(str(src / f"b{i}.parquet"))
        schema = df.schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )


def test_streaming_text_index_ingest_and_snapshot_pressure_policy(
    spark, tmp_path
):
    """Streamed text-index ingest (the policy-loop triad's text leg):
    per-batch CAS appends serve cross-batch BM25 bit-identical to the
    recompute over the full corpus, and the max_snapshots state
    trigger fires on snapshot pressure — 4 appends would leave a
    4-way per-probe union, the policy folds it back to 1."""
    from etl_job_applify_spark.functions.text_index import text_index_stats
    from etl_job_applify_spark.streaming import run_text_index_ingest_stream

    idx = str(tmp_path / "tidx_stream")
    batches = [_docs(spark, start=10 * g, n=10) for g in range(4)]
    stream = _stream_batches(spark, tmp_path, batches)
    run_text_index_ingest_stream(
        stream, idx, num_buckets=8, max_snapshots=2
    )

    # signal recovered: the last over-threshold append folded to 1
    assert text_index_stats(spark, idx)["live_snapshots"] <= 2
    corpus = batches[0]
    for b in batches[1:]:
        corpus = corpus.unionByName(b)
    got = _score_map(text_index_bm25(spark, idx, _qterms(spark)))
    want = _score_map(
        bm25_scores(corpus, _qterms(spark), id_col="doc_id")
    )
    assert got == want


def test_streaming_text_index_tombstone_pressure_policy(spark, tmp_path):
    """CDC-shaped stream (op_col): deletes tombstone served docs, and
    tombstone pressure above compact_tombstone_ratio triggers
    compaction at the epoch boundary — post-run the pending-tombstone
    signal is 0 (reclaimed), live_snapshots folded to 1, and BM25
    equals the recompute over the surviving corpus."""
    from etl_job_applify_spark.functions.text_index import text_index_stats
    from etl_job_applify_spark.streaming import run_text_index_ingest_stream

    idx = str(tmp_path / "tidx_cdc")
    b0 = _docs(spark, start=0, n=20).withColumn("op", F.lit("add"))
    # delete 8 of the 20 -> ratio 8/12 = 0.67 > 0.5 trips the trigger
    b1 = spark.createDataFrame(
        [(i, "x", "delete") for i in range(8)],
        "doc_id long, text string, op string",
    )
    stream = _stream_batches(spark, tmp_path, [b0, b1])
    run_text_index_ingest_stream(
        stream, idx, op_col="op", compact_tombstone_ratio=0.5
    )

    stats = text_index_stats(spark, idx)
    assert stats["n_pending_tombstones"] == 0  # signal recovered
    assert stats["live_snapshots"] == 1
    assert stats["n_docs"] == 12 and stats["n_docs_live"] == 12
    survivors = _docs(spark, start=0, n=20).filter("doc_id >= 8")
    got = _score_map(text_index_bm25(spark, idx, _qterms(spark)))
    want = _score_map(
        bm25_scores(survivors, _qterms(spark), id_col="doc_id")
    )
    assert got == want


def test_ir_metrics_hand_checkable(spark):
    """MRR / nDCG@k / recall@k on a hand-computed fixture: q1 finds its
    two relevant docs at ranks 1 and 3 (mrr 1.0, recall 1.0, nDCG =
    (1 + 1/2) / (1 + 1/log2(3))); q2's only relevant doc is missed
    (all zeros except recall 0); q3 has no relevant docs (recall 1,
    ndcg 0 — nothing to find)."""
    import math

    from etl_job_applify_spark.functions.ireval import ir_metrics

    ranking = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 102, 3),
         (2, 200, 1), (2, 201, 2),
         (3, 300, 1)],
        "qid int, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 100, 1), (1, 102, 1), (2, 999, 1)],
        "qid int, doc_id long, grade int",
    )
    got = {
        r["qid"]: (r["n_rel"], r["mrr"], r["ndcg"], r["recall"])
        for r in ir_metrics(ranking, qrels, k=10).collect()
    }
    def q(x):  # the DECIMAL(28,6) per-term grid the kernel sums on
        from decimal import Decimal
        return float(Decimal(repr(x)).quantize(Decimal("0.000001")))
    dcg1 = q(1 / math.log2(2)) + q(1 / math.log2(4))
    idcg1 = q(1 / math.log2(2)) + q(1 / math.log2(3))
    assert got[1] == (2, 1.0, dcg1 / idcg1, 1.0)
    assert got[2] == (1, 0.0, 0.0, 0.0)
    assert got[3] == (0, 0.0, 0.0, 1.0)


def test_streaming_text_index_cdc_replay_invariance(spark, tmp_path):
    """Re-running the CDC ingest stream over the SAME source (a fresh
    query restarts epoch ids, so every batch — deletes included —
    re-delivers with its original epoch) must leave the index
    bit-identical: the batch's tombstones, adds, stats delta, and
    epoch mark ride ONE CAS snapshot, so a redelivered delete epoch
    can never land a fresh tombstone above an already-committed
    re-add. Covers the two divergence shapes: delete+re-add of one id
    in the SAME batch, and delete in one epoch with the re-add in a
    LATER epoch (the whole-source replay pattern)."""
    import time

    from etl_job_applify_spark.functions.text_index import (
        text_index_stats,
    )
    from etl_job_applify_spark.sinks.versioned import list_versions
    from etl_job_applify_spark.streaming import (
        run_text_index_ingest_stream,
    )

    idx = str(tmp_path / "tidx_cdc_replay")
    b0 = _docs(spark, start=0, n=10).withColumn("op", F.lit("add"))
    # epoch 1: delete docs 3 and 5; re-add doc 3 in the SAME batch
    b1 = spark.createDataFrame(
        [
            (3, "x", "delete"),
            (5, "x", "delete"),
            (3, "hash join hash readded", "add"),
        ],
        "doc_id long, text string, op string",
    )
    # epoch 2: re-add doc 5 (delete landed one epoch earlier)
    b2 = spark.createDataFrame(
        [(5, "sort merge scan readded", "add")],
        "doc_id long, text string, op string",
    )
    src = tmp_path / "src_cdc_replay"
    src.mkdir()
    for i, df in enumerate([b0, b1, b2]):
        if i:
            time.sleep(1.1)  # file-source ordering is mtime-based
        df.coalesce(1).write.parquet(str(src / f"b{i}.parquet"))

    def fresh_stream():
        return (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )

    run_text_index_ingest_stream(fresh_stream(), idx, op_col="op")
    first_scores = _score_map(text_index_bm25(spark, idx, _qterms(spark)))
    first_stats = text_index_stats(spark, idx)
    first_versions = list_versions(spark, idx)

    # the state equals the recompute over the surviving corpus: both
    # re-adds live with their NEW text, the originals suppressed
    survivors = (
        _docs(spark, start=0, n=10)
        .filter("doc_id NOT IN (3, 5)")
        .unionByName(
            spark.createDataFrame(
                [
                    (3, "hash join hash readded"),
                    (5, "sort merge scan readded"),
                ],
                "doc_id long, text string",
            )
        )
    )
    want = _score_map(bm25_scores(survivors, _qterms(spark), id_col="doc_id"))
    assert first_scores == want
    assert first_stats["n_docs"] == 10

    # whole-source replay: every epoch (0, 1, 2) redelivers — the
    # delete epoch 1 now arrives AFTER doc 5's re-add is committed
    run_text_index_ingest_stream(fresh_stream(), idx, op_col="op")
    assert list_versions(spark, idx) == first_versions  # nothing committed
    assert text_index_stats(spark, idx) == first_stats
    assert _score_map(text_index_bm25(spark, idx, _qterms(spark))) == want


def test_cdc_apply_race_loses_no_batches(spark, tmp_path):
    """Two threads applying DISJOINT CDC batches concurrently (each a
    delete + a re-add mixed in ONE snapshot): the CAS loop must
    serialize them — both tombstone sets and both add sets land, stats
    stay exact, and the served state equals a clean rebuild of the
    final corpus."""
    import threading

    from etl_job_applify_spark.functions.text_index import (
        text_index_apply_cdc,
        text_index_stats,
    )

    idx = str(tmp_path / "tidx_cdc_race")
    docs = _docs(spark, n=12)
    text_index_build(docs, idx, layout="versioned")
    # batch A: delete 0-1, re-add 0 with new text; batch B: delete
    # 10-11, re-add 11 with new text
    batch_a = spark.createDataFrame(
        [(0, "x", "delete"), (1, "x", "delete"),
         (0, "hash join scan replaced", "add")],
        "doc_id long, text string, op string",
    )
    batch_b = spark.createDataFrame(
        [(10, "x", "delete"), (11, "x", "delete"),
         (11, "sort merge window replaced", "add")],
        "doc_id long, text string, op string",
    )
    errs = []

    def worker(batch):
        try:
            text_index_apply_cdc(batch, idx)
        except Exception as e:  # surfacing beats a hung assert
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(b,))
        for b in (batch_a, batch_b)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    final = (
        docs.filter(~F.col("doc_id").isin([0, 1, 10, 11]))
        .unionByName(
            spark.createDataFrame(
                [(0, "hash join scan replaced"),
                 (11, "sort merge window replaced")],
                "doc_id long, text string",
            )
        )
    )
    ref = str(tmp_path / "tidx_cdc_race_ref")
    text_index_build(final, ref, layout="versioned")
    q = _qterms(spark)
    assert _score_map(text_index_bm25(spark, idx, q)) == _score_map(
        text_index_bm25(spark, ref, q)
    )
    assert text_index_stats(spark, idx)["n_docs"] == 10


def test_proximity_hits_and_index_probe(spark, tmp_path):
    """proximity_hits: span semantics, window edge, duplicate-word
    rejection; the index-served probe equals the raw-text kernel."""
    import pytest

    from etl_job_applify_spark.functions.retrieval import (
        proximity_hits,
        token_positions,
    )
    from etl_job_applify_spark.functions.text_index import (
        text_index_build,
        text_index_proximity,
    )

    docs = spark.createDataFrame(
        [
            (1, "a x b x x c tail"),        # a@1 b@3 c@6 -> span 5
            (2, "c b a"),                   # span 2, any order counts
            (3, "a x x x x x x x b c"),     # a@1 b@9 c@10 -> span 9
            (4, "a b a c"),                 # two a's: spans 3 and 2
        ],
        "doc_id long, text string",
    )
    toks = token_positions(docs)
    got = sorted(
        map(tuple, proximity_hits(toks, ["a", "b", "c"], 6).collect())
    )
    assert got == [(1, 5), (2, 2), (4, 2), (4, 3)]
    # window edge: span 9 needs window >= 10
    assert (
        proximity_hits(toks, ["a", "b", "c"], 10)
        .filter("doc_id = 3").count() == 1
    )
    with pytest.raises(ValueError):
        proximity_hits(toks, ["a", "a"], 5)

    path = str(tmp_path / "pidx")
    text_index_build(docs, path)
    served = {
        (r["doc_id"], r["n_windows"], r["min_span"])
        for r in text_index_proximity(
            spark, path, ["a", "b", "c"], 6
        ).collect()
    }
    assert served == {(1, 1, 5), (2, 1, 2), (4, 2, 2)}


def test_text_cdc_upsert_and_batch_dedup(spark, tmp_path):
    """CDC adds are upserts: a plain re-add of a live doc (no delete
    row) tombstones the old postings in the same snapshot — searches
    see exactly one version — and duplicate add rows for one id
    reduce to ONE deterministic winner (duplicate rows would merge
    into corrupt postings)."""
    from etl_job_applify_spark.functions.text_index import (
        _tidx_read,
        text_index_apply_cdc,
        text_index_bm25,
        text_index_build,
        text_index_stats,
    )

    docs = _docs(spark, n=10)
    idx = str(tmp_path / "tidx_upsert")
    text_index_build(docs, idx, num_buckets=16, layout="versioned")
    n0 = text_index_stats(spark, idx)["n_docs"]
    batch = spark.createDataFrame(
        # doc 3 is LIVE, re-added (no delete row); doc 100 is new but
        # duplicated with different texts
        [(3, "zanzibar quorum rewrite", "add"),
         (100, "zanzibar first version", "add"),
         (100, "zanzibar second version", "add")],
        "doc_id long, text string, op string",
    )
    meta = text_index_apply_cdc(batch, idx, epoch_mark="_u1")
    assert meta["n_docs"] == n0 + 2 - 1  # +{3,100} adds, -replaced 3
    _m, _posts, dls, _live = _tidx_read(spark, idx)
    assert dls.filter("doc = 3").count() == 1
    assert dls.filter("doc = 100").count() == 1
    q = spark.createDataFrame([(1, "zanzibar")], "qid int, word string")
    hits = text_index_bm25(spark, idx, q)
    got = {r["doc_id"] for r in hits.collect()}
    assert got == {3, 100}
    # old version of doc 3 no longer serves its former tokens only
    # once: its doclen must be the NEW text's length (3 tokens)
    assert dls.filter("doc = 3").first()["dl"] == 3
