"""Semantic checks for the OLAP/product-analytics queries (q94-q97):
structural invariants beyond the oracle's value hashes."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_applify_spark.queries import analytics2

from conftest import SF_SMOKE


def test_histogram_partitions_all_orders(spark):
    from etl_job_applify_spark.queries._util import tbl

    hist = analytics2.q94_histogram(spark, SF_SMOKE)
    total = hist.agg(F.sum("n_orders")).first()[0]
    n_orders = tbl(spark, SF_SMOKE, "orders").count()
    assert total == n_orders
    for r in hist.collect():
        assert r["bin_lo"] == r["bin"] * 50_000
        assert r["bin_hi"] - r["bin_lo"] == 50_000


def test_mom_growth_first_month_null(spark):
    rows = (
        analytics2.q95_mom_growth(spark, SF_SMOKE).orderBy("month").collect()
    )
    assert rows[0]["prev_revenue"] is None and rows[0]["mom_growth"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["prev_revenue"] == prev["revenue"]


def test_cohort_offsets_start_at_zero(spark):
    rows = analytics2.q96_cohort_retention(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["week_offset"] >= 0
    assert any(r["week_offset"] == 0 for r in rows)


def test_funnel_is_monotone(spark):
    r = analytics2.q97_event_funnel(spark, SF_SMOKE).first()
    assert (
        r["n_users"]
        >= r["did_signup"]
        >= r["then_viewed"]
        >= r["then_clicked"]
        >= r["then_purchased"]
    )
    assert r["then_viewed"] > 0
