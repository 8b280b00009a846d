"""The showcase curation pipeline must run end-to-end and actually dedup."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/examples")

from llm_corpus_pipeline import curate

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_curation_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    report = curate(spark, SF_SMOKE, out_dir=out).collect()
    assert len(report) == 5  # all five languages survive
    assert all(r["n_docs"] > 0 for r in report)

    landed = spark.read.parquet(out)
    # partitioned by lang + near/exact dups and half of each stratum gone
    assert landed.select("lang").distinct().count() == 5
    assert 0 < landed.count() < 500
    # content-hash split landed as a partition column with sane shares
    splits = {r["split"] for r in landed.select("split").distinct().collect()}
    assert "train" in splits and splits <= {"train", "val", "test"}
    n_train = landed.filter("split = 'train'").count()
    assert n_train > landed.count() / 2


def test_warehouse_sync_example(spark, tmp_path):
    """Two sync cycles: initial load, then an upsert that replaces one
    row by version — the flow the reference staged but never executed."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from warehouse_sync import sync

    drop = tmp_path / "drop"
    drop.mkdir()
    table = str(tmp_path / "users")
    with open(drop / "batch-000.jsonl", "w") as fh:
        for i in range(5):
            fh.write(json.dumps({
                "user_id": i, "name": f"user{i}",
                "updated_at": "2024-01-01 10:00:00", "v": 1,
            }) + "\n")
        fh.write("corrupt line\n")  # permissive ingest must survive this
    m1 = sync(spark, str(drop), table)
    assert m1["rows_total"] == 5 and m1["null_versions"] == 0

    with open(drop / "batch-001.jsonl", "w") as fh:
        fh.write(json.dumps({
            "user_id": 3, "name": "user3-renamed",
            "updated_at": "2024-01-02 10:00:00", "v": 2,
        }) + "\n")
    m2 = sync(spark, str(drop), table)
    assert m2["rows_total"] == 5  # still 5 rows: id 3 replaced, not added

    from etl_job_applify_spark.sinks.versioned import list_versions, read_table

    final = {r["id"]: (r["name"], r["version"])
             for r in read_table(spark, table).collect()}
    assert list_versions(spark, table) == [1, 2]  # both syncs time-travelable
    assert final[3] == ("user3-renamed", 2)
    assert final[0] == ("user0", 1)


def test_incremental_rollup_example_runs(spark, capsys):
    """The lakehouse-loop example must run end to end; its printed audit
    section shows the incremental view equal to the full recompute (the
    example prints both — equality is asserted structurally by q151's
    oracle; here we pin that the demo executes and vacuums)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "incremental_rollup", "/root/repo/examples/incremental_rollup.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.run(spark, "/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "snapshots_removed" in out


def test_metrics_observability_example_runs(spark, capsys):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "metrics_observability", "/root/repo/examples/metrics_observability.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from conftest import SF_SMOKE

    mod.run(spark, SF_SMOKE)
    out = capsys.readouterr().out
    assert "grid points:" in out
    assert "batch anomalies:" in out
    assert "point lookup event" in out


def test_retrieval_pipeline_example(spark):
    """BM25 shortlist → phrase confirmation → cosine rerank: the anchor
    document must rerank itself to the top with cosine ~1, and every
    returned doc must actually contain the phrase."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "retrieval_pipeline", "/root/repo/examples/retrieval_pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = mod.search(spark, "/root/testdata/sf0.001", "sort merge").collect()
    assert rows, "no phrase-confirmed results"
    assert abs(rows[0]["cosine"] - 1.0) < 1e-9  # anchor reranks itself first
    from etl_job_applify_spark.queries._util import tbl

    texts = {
        r["doc_id"]: r["text"]
        for r in tbl(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in rows]))
        .collect()
    }
    assert all("sort merge" in texts[r["doc_id"]] for r in rows)


def test_retrieval_pipeline_indexed_matches_direct(spark, tmp_path):
    """search_indexed (persisted-inverted-index serving) returns the
    BIT-IDENTICAL rows the corpus-recompute search returns."""
    import importlib.util

    from etl_job_applify_spark.functions.text_index import text_index_build
    from etl_job_applify_spark.queries._util import tbl

    spec = importlib.util.spec_from_file_location(
        "retrieval_pipeline", "/root/repo/examples/retrieval_pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "idx")
    text_index_build(tbl(spark, sf, "documents"), idx)
    direct = [tuple(r) for r in mod.search(spark, sf).collect()]
    served = [
        tuple(r) for r in mod.search_indexed(spark, sf, idx).collect()
    ]
    assert served == direct and direct


def test_gdpr_erasure_example(spark):
    """The erasure runbook must leave the erased ids absent from all
    three serving surfaces (corpus snapshot, dedup candidates,
    retrieval results)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gdpr_erasure", "/root/repo/examples/gdpr_erasure.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.main(spark, "/root/testdata/sf0.001")
    assert report["n_erased"] > 0
    assert report["left_in_corpus"] == 0
    assert report["dedup_candidates_of_erased"] == 0
    assert report["retrieval_hits_of_erased"] == 0


def test_vector_search_pipeline_example(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vector_search_pipeline",
        "/root/repo/examples/vector_search_pipeline.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.main(spark, "/root/testdata/sf0.001")
    assert report["stages_verified"] == 8
    assert report["n_indexed"] == 500
    assert report["results_per_query"] == 5
    assert report["hybrid_rows"] == 20  # 2 queries x top-10 fused
