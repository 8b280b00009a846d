"""Bucketed tables: co-located joins without a shuffle — the layout that
makes repeated fact-fact joins cheap at 100 TB (pay the shuffle once at
write time, never again at read time)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_job_applify_spark.plans import explain_str
from etl_job_applify_spark.queries._util import tbl

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    import os
    import shutil

    orders = tbl(spark, SF_SMOKE, "orders")
    lineitem = tbl(spark, SF_SMOKE, "lineitem")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a stale warehouse dir from a previous session isn't in this
        # session's catalog, so DROP won't clear it — remove the path too
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    return spark.table("b_orders"), spark.table("b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    b_orders, b_lineitem = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = b_lineitem.join(
            b_orders, b_lineitem.l_orderkey == b_orders.o_orderkey
        ).groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        text = explain_str(joined, "simple")
        # sort-merge join straight off the bucketed layout: the only
        # exchange allowed is the one for the final aggregation
        assert "SortMergeJoin" in text
        join_part = text.split("SortMergeJoin")[1]
        assert "Exchange" not in join_part, join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")


def test_bucketed_join_matches_plain(spark, bucketed):
    b_orders, b_lineitem = bucketed
    plain = (
        tbl(spark, SF_SMOKE, "lineitem")
        .join(tbl(spark, SF_SMOKE, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert b_lineitem.join(
        b_orders, b_lineitem.l_orderkey == b_orders.o_orderkey
    ).count() == plain


def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    """No hint given: AQE discovers the filtered side is tiny at runtime
    and switches the sort-merge join to broadcast — the safety net when
    static size estimates are wrong (the normal state at 100 TB)."""
    orders = tbl(spark, SF_SMOKE, "orders")
    tiny = orders.filter(F.col("o_orderkey") % 1000 == 0)  # a few rows
    li = tbl(spark, SF_SMOKE, "lineitem")
    joined = li.join(tiny, li.l_orderkey == tiny.o_orderkey).agg(
        F.count("*").alias("n")
    )
    joined.collect()
    assert "BroadcastHashJoin" in explain_str(joined, "simple")
