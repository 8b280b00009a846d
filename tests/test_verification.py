"""Property-check companions (q76-q80): the quality flags must actually
hold at smoke scale — these are the queries that make the approximate
operators (LSH, SimHash, HLL, GK) gate-verifiable."""

from __future__ import annotations

import pytest

from etl_job_applify_spark.queries import verification

from conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(verification.QUERIES))
def test_property_flags_hold(spark, name):
    rows = verification.QUERIES[name](spark, SF_SMOKE).collect()
    assert rows, f"{name} returned no rows"
    flag_cols = [c for c in rows[0].asDict() if c.endswith("_ok")]
    assert flag_cols, f"{name} has no *_ok property column"
    for r in rows:
        for c in flag_cols:
            assert r[c] is True, f"{name}.{c} failed: {r.asDict()}"


def test_multi_table_lsh_beats_single_table(spark):
    """The AND-OR construction exists because one table cannot reach
    recall at mid-cosine targets: 16×8 multi-probe must dominate a single
    8-bit table on the same data."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.similarity import ann_topk_lsh, cosine_topk

    emb = tbl(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.filter(F.col("vec_id") >= 5)
    exact = cosine_topk(c, q, k=5).select("query_id", "neighbor")

    def recall(approx):
        hit = exact.join(
            approx.select("query_id", "neighbor"),
            ["query_id", "neighbor"],
            "left_semi",
        ).count()
        return hit / exact.count()

    multi = recall(ann_topk_lsh(c, q, k=5, num_planes=8, num_tables=16))
    single = recall(
        ann_topk_lsh(c, q, k=5, num_planes=8, num_tables=1, multi_probe=False)
    )
    assert multi >= 0.8
    assert multi > single
