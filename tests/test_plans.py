"""Plan-shape regression tests: pushdown, broadcast, shuffle counts.

These encode the 100 TB discipline — if a change stops a filter reaching
the parquet scan or turns a broadcast join into a sort-merge join, these
fail locally instead of melting a cluster."""

from __future__ import annotations

from etl_job_applify_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    shuffle_count,
)
from etl_job_applify_spark.queries.relational import (
    q01_pricing_summary,
    q02_filter_project,
    q03_join_broadcast,
    q04_multiway_join,
)

from conftest import SF_SMOKE


def test_filters_push_into_parquet_scan(spark):
    df = q02_filter_project(spark, SF_SMOKE)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f or "l_discount" in f for f in pf), pf


def test_projection_prunes_scan_columns(spark):
    df = q02_filter_project(spark, SF_SMOKE)
    text = explain_str(df)
    # ReadSchema must not include columns the query never touches
    assert "l_comment" not in text and "l_returnflag" not in text.split("ReadSchema")[1][:400]


def test_dimension_join_broadcasts(spark):
    assert has_broadcast_join(q03_join_broadcast(spark, SF_SMOKE))
    assert has_broadcast_join(q04_multiway_join(spark, SF_SMOKE))


def test_q01_single_shuffle(spark):
    # scan → partial agg → ONE exchange → final agg (+ sort exchange)
    assert shuffle_count(q01_pricing_summary(spark, SF_SMOKE)) <= 2


def test_whole_stage_codegen_covers_agg(spark):
    df = q01_pricing_summary(spark, SF_SMOKE)
    df.collect()  # AQE shows codegen spans only in the executed (final) plan
    # '*' prefixes mark operators inside a WholeStageCodegen span
    text = explain_str(df)
    assert "* HashAggregate" in text and "* Sort" in text
