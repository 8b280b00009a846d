"""Semantic checks for the training-data pipeline operators (q81-q85):
invariants the oracle's hash compare can't express — redaction actually
removes the PII, packing offsets are contiguous per shard, quantization
honors its error bound structurally."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_job_applify_spark.queries import pipelineops

from conftest import SF_SMOKE


def test_pii_redaction_scrubs_everything(spark):
    rows = pipelineops.q81_pii_redaction(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] >= 1 and r["n_phones"] >= 1
        assert "<EMAIL>" in r["clean"] and "<PHONE>" in r["clean"]
        assert "@" not in r["clean"].replace("<EMAIL>", "")
        assert not re.search(r"\+\d{1,2} \d{3}-\d{3}-\d{4}", r["clean"])


def test_repetition_ratio_bounds(spark):
    rows = pipelineops.q82_repetition(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_unique"] <= r["n_shingles"]
        if r["n_shingles"] > 0:
            assert 0.0 <= r["rep_ratio"] <= 1.0
        else:
            assert r["rep_ratio"] is None


def test_contamination_excludes_benchmark_docs(spark):
    rows = pipelineops.q83_contamination(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["doc_id"] % 17 != 0
        assert 1 <= r["n_shared"] <= r["n_grams"]
        assert 0.0 < r["contamination"] <= 1.0


def test_packing_offsets_contiguous_per_shard(spark):
    df = pipelineops.q84_packing(spark, SF_SMOKE)
    rows = df.orderBy("source", "doc_id").collect()
    assert rows
    by_src: dict[str, int] = {}
    for r in rows:
        expected = by_src.get(r["source"], 0)
        assert r["start_off"] == expected, (
            f"gap in shard {r['source']} at doc {r['doc_id']}"
        )
        by_src[r["source"]] = expected + r["tok"]
        assert r["first_chunk"] == r["start_off"] // 512
        assert r["last_chunk"] == (r["start_off"] + r["tok"] - 1) // 512
        assert r["first_chunk"] <= r["last_chunk"]


def test_quantization_error_bound(spark):
    rows = pipelineops.q85_quantize(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["scale"] > 0
        assert r["within_bound"] is True
        assert r["max_abs_err"] <= r["scale"] * 0.5000001


def test_ivf_query_returns_full_topk(spark):
    from etl_job_applify_spark.queries.analytics import q86_ann_ivf

    rows = q86_ann_ivf(spark, SF_SMOKE).collect()
    per_query: dict[int, int] = {}
    for r in rows:
        per_query[r["query_id"]] = per_query.get(r["query_id"], 0) + 1
    assert set(per_query) == {0, 1, 2, 3, 4}
    assert all(v == 5 for v in per_query.values())


def test_split_repair_eliminates_all_leaks(spark):
    """After q228's reassignment, no near-dup pair may straddle a split
    (both endpoints share a component, hence a split) — and the repair
    must touch only documents that appear in near-dup clusters."""
    from etl_job_applify_spark.dedup import ngram_jaccard_pairs
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.queries.pipelineops2 import (
        _Q155_THRESHOLD,
        q228_split_repair,
    )
    from etl_job_applify_spark.transform.sampling import content_hash_split
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    moves = q228_split_repair(spark, sf)
    docs = tbl(spark, sf, "documents")
    # the repaired assignment = original splits overridden by the moves
    repaired = (
        content_hash_split(docs)
        .select("doc_id", "split")
        .join(moves.select("doc_id", "new_split"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("new_split", "split").alias("split")
        )
    )
    pairs = ngram_jaccard_pairs(
        docs, n=3, threshold=_Q155_THRESHOLD, max_doc_freq=50
    ).select("a", "b")
    ra = repaired.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    rb = repaired.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    leaks = (
        pairs.join(ra, "a").join(rb, "b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaks == 0
    # at least one genuine move on the fixture (the audit finds leaks)
    assert moves.filter("moved").count() > 0
