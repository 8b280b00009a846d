"""Explicit retention for stopped-compaction tables + founding-time
input validation (round-12 ADVICE items).

The grace-window recover pass (sinks/versioned.py
recover_live_snapshots) only deletes snapshots folded by an OLDER
watermark, so an index that compacts once and never again would retain
its entire pre-compaction log on disk forever. ``vacuum_*`` is the
explicit entry point that collapses the window — callable when no
in-flight probe spans the last compaction.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.dedup import (
    minhash_index_build,
    minhash_index_stats,
    optimize_index,
    vacuum_minhash_index,
)
from etl_job_applify_spark.functions.text_index import (
    optimize_text_index,
    text_index_bm25,
    text_index_build,
    vacuum_text_index,
)
from etl_job_applify_spark.similarity import (
    optimize_vector_index,
    vacuum_vector_index,
    vector_index_build,
    vector_index_probe,
)

DIM = 8


def _vecs(spark, start=0, n=48):
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


def _snaps(idx):
    return sorted(os.path.basename(p) for p in glob.glob(idx + "/snap_*"))


def test_vacuum_vector_index_collapses_grace_window(spark, tmp_path):
    corpus = _vecs(spark)
    cents = [
        r["embedding"]
        for r in corpus.orderBy("vec_id").limit(4).collect()
    ]
    idx = str(tmp_path / "vxi_vac")
    vector_index_build(
        corpus.filter(F.col("vec_id") < 40), idx,
        num_cells=4, centroids=cents,
    )
    vector_index_build(
        corpus.filter(F.col("vec_id") >= 40), idx, mode="append"
    )
    want = sorted(
        (r["query_id"], r["neighbor"], r["cosine"], r["rank"])
        for r in vector_index_probe(
            spark, idx, _queries(spark), k=5, nprobe=2
        ).collect()
    )
    optimize_vector_index(spark, idx)
    # grace: the single compaction keeps its folded snapshots on disk
    assert _snaps(idx) == [
        "snap_00000001", "snap_00000002", "snap_00000003"
    ]
    deleted = vacuum_vector_index(spark, idx)
    assert sorted(deleted) == ["snap_00000001", "snap_00000002"]
    assert _snaps(idx) == ["snap_00000003"]
    got = sorted(
        (r["query_id"], r["neighbor"], r["cosine"], r["rank"])
        for r in vector_index_probe(
            spark, idx, _queries(spark), k=5, nprobe=2
        ).collect()
    )
    assert got == want
    # idempotent; and a never-compacted table vacuums nothing
    assert vacuum_vector_index(spark, idx) == []
    idx2 = str(tmp_path / "vxi_vac_nocompact")
    vector_index_build(corpus, idx2, num_cells=4, centroids=cents)
    assert vacuum_vector_index(spark, idx2) == []
    assert _snaps(idx2) == ["snap_00000001"]


def _docs(spark):
    rows = [
        (i, f"alpha beta gamma doc{i % 5} delta " * 3) for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vacuum_text_index(spark, tmp_path):
    idx = str(tmp_path / "tidx_vac")
    docs = _docs(spark)
    text_index_build(docs.filter(F.col("doc_id") < 10), idx)
    text_index_build(
        docs.filter(F.col("doc_id") >= 10), idx, mode="append"
    )
    qterms = spark.createDataFrame([(1, "alpha")], "qid int, word string")
    want = sorted(
        (r["qid"], r["doc_id"], r["score"])
        for r in text_index_bm25(spark, idx, qterms).collect()
    )
    optimize_text_index(spark, idx)
    assert len(_snaps(idx)) == 3
    deleted = vacuum_text_index(spark, idx)
    assert sorted(deleted) == ["snap_00000001", "snap_00000002"]
    got = sorted(
        (r["qid"], r["doc_id"], r["score"])
        for r in text_index_bm25(spark, idx, qterms).collect()
    )
    assert got == want


def test_vacuum_minhash_index(spark, tmp_path):
    idx = str(tmp_path / "midx_vac")
    docs = _docs(spark)
    minhash_index_build(
        docs.filter(F.col("doc_id") < 10), idx, layout="versioned"
    )
    minhash_index_build(
        docs.filter(F.col("doc_id") >= 10), idx,
        layout="versioned", mode="append",
    )
    n_before = minhash_index_stats(spark, idx)["n_docs"]
    optimize_index(spark, idx)
    assert len(_snaps(idx)) == 3
    deleted = vacuum_minhash_index(spark, idx)
    assert sorted(deleted) == ["snap_00000001", "snap_00000002"]
    stats = minhash_index_stats(spark, idx)
    assert stats["n_docs"] == n_before
    assert stats["live_snapshots"] == 1
    assert stats["data_files"] > 0  # FS-API count sees compacted files


def test_reserved_meta_cols_rejected_at_founding(spark, tmp_path):
    corpus = _vecs(spark, n=8).withColumn("cell", F.lit("x"))
    with pytest.raises(ValueError, match="collide"):
        vector_index_build(
            corpus, str(tmp_path / "vxi_bad"),
            num_cells=2, meta_cols=["cell"],
        )
    docs = _docs(spark).withColumn("dl", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        text_index_build(
            docs, str(tmp_path / "tidx_bad"), meta_cols=["dl"]
        )


def test_ivfpq_offsets_without_codebooks_rejected(spark):
    from etl_job_applify_spark.similarity import ann_topk_ivfpq

    corpus = _vecs(spark, n=16)
    with pytest.raises(ValueError, match="offsets passed without"):
        ann_topk_ivfpq(
            corpus, _queries(spark), k=3, num_cells=2, nprobe=1,
            m=4, k_codes=4, encoding="residual",
            offsets=[[0.0] * DIM, [0.0] * DIM],
        )


def test_index_admin_cli(spark, tmp_path):
    """tools/index_admin.py: the unified admin surface — describe /
    histogram / compact / vacuum dispatch per family, against a live
    session (no subprocess: the CLI accepts an injected SparkSession)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "index_admin",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "index_admin.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    corpus = _vecs(spark)
    cents = [
        r["embedding"]
        for r in corpus.orderBy("vec_id").limit(4).collect()
    ]
    idx = str(tmp_path / "vxi_cli")
    vector_index_build(
        corpus.filter(F.col("vec_id") < 40), idx,
        num_cells=4, centroids=cents,
    )
    vector_index_build(
        corpus.filter(F.col("vec_id") >= 40), idx, mode="append"
    )
    st = mod.main(["describe", "vector", idx], spark=spark)
    assert st["n_vecs"] == 48 and st["live_snapshots"] == 2
    hist = mod.main(["histogram", "vector", idx], spark=spark)
    assert sum(n for _, n in hist["cells"]) == 48
    mod.main(["compact", "vector", idx], spark=spark)
    vac = mod.main(["vacuum", "vector", idx], spark=spark)
    assert sorted(vac["result"]) == ["snap_00000001", "snap_00000002"]
    st2 = mod.main(["describe", "vector", idx], spark=spark)
    assert st2["n_vecs"] == 48 and st2["live_snapshots"] == 1
    # forget: tombstone a takedown set through the CLI (both id paths)
    out = mod.main(
        ["forget", "vector", idx, "--ids", "1,2,999"], spark=spark
    )
    assert out == {"vector": 2}  # 999 unknown -> ignored
    st3 = mod.main(["describe", "vector", idx], spark=spark)
    assert st3["n_vecs"] == 46 and st3["n_pending_tombstones"] == 2
    ids_pq = str(tmp_path / "takedown_ids")
    spark.createDataFrame([(3,), (1,)], "vid bigint").write.parquet(ids_pq)
    out2 = mod.main(
        ["forget", "vector", idx, "--ids-parquet", ids_pq], spark=spark
    )
    assert out2 == {"vector": 1}  # 1 already tombstoned -> idempotent


def test_index_admin_apply_cdc(spark, tmp_path):
    """tools/index_admin.py apply-cdc: one op-column feed parquet lands
    in a family as a fenced snapshot; re-running with the same
    --epoch-mark reports 'fenced' (the q278 one-feed semantics per
    family)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "index_admin",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "index_admin.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    corpus = _vecs(spark, n=12)
    cents = [
        r["embedding"]
        for r in corpus.orderBy("vec_id").limit(4).collect()
    ]
    idx = str(tmp_path / "vxi_cdc_cli")
    vector_index_build(corpus, idx, num_cells=4, centroids=cents)
    feed_pq = str(tmp_path / "feed")
    spark.createDataFrame(
        [(3, None, "delete"), (100, [1.0] * 8, "add")],
        "vec_id long, embedding array<double>, op string",
    ).write.parquet(feed_pq)
    out = mod.main(
        ["apply-cdc", "vector", idx, "--feed-parquet", feed_pq,
         "--id-col", "vec_id", "--epoch-mark", "_epoch_cli_1"],
        spark=spark,
    )
    assert out["vector"]["n_added"] == 1
    assert out["vector"]["n_tombstoned"] == 1
    st = mod.main(["describe", "vector", idx], spark=spark)
    assert st["n_vecs"] == 12
    out2 = mod.main(
        ["apply-cdc", "vector", idx, "--feed-parquet", feed_pq,
         "--id-col", "vec_id", "--epoch-mark", "_epoch_cli_1"],
        spark=spark,
    )
    assert out2 == {"vector": "fenced"}
