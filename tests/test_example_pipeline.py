"""The showcase curation pipeline must run end-to-end and actually dedup."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/examples")

from llm_corpus_pipeline import curate

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
