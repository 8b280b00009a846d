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


def test_lpa_matches_python_reference(spark):
    """q205's synchronous LPA rounds must agree with a direct Python
    simulation (mode with highest-count-then-smallest-label tie-break)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    # python reference: 4 synchronous rounds
    import collections

    nbrs = collections.defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    labels = {v: v for v in nbrs}
    for _ in range(4):
        new = {}
        for v in nbrs:
            cnt = collections.Counter(labels[u] for u in nbrs[v])
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        labels = new
    want = collections.Counter(
        collections.Counter(labels.values()).values()
    )

    # spark: the q205 kernel on the same edge list
    edf = spark.createDataFrame(edges, "a int, b int")
    und = edf.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        edf.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    lbl = und.select("v").distinct().select("v", F.col("v").alias("lbl"))
    w = Window.partitionBy("v").orderBy(F.desc("cnt"), "lbl")
    for _ in range(4):
        counts = (
            und.join(lbl.select(F.col("v").alias("u"), "lbl"), "u")
            .groupBy("v", "lbl")
            .agg(F.count("*").alias("cnt"))
        )
        lbl = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "lbl")
            .localCheckpoint()
        )
    got = collections.Counter(
        r["n"] for r in
        lbl.groupBy("lbl").agg(F.count("*").alias("n")).collect()
    )
    assert got == want


def test_dema_trend_correction_on_linear_series(spark):
    """On a perfectly linear series the EWMA lags by a constant and DEMA
    must recover the true value exactly once the 8-row window is full
    (the defining property of double smoothing)."""
    from etl_job_applify_spark.queries.timeseries import q206_dema
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), 7, float(i))
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    import etl_job_applify_spark.queries.timeseries as ts_mod
    from etl_job_applify_spark.queries import _util

    orig = _util.tbl
    try:
        ts_mod.tbl = lambda spark, sf_dir, name: df
        out = {r["event_id"]: r for r in q206_dema(spark, "ignored").collect()}
    finally:
        ts_mod.tbl = orig
    # after both windows fill (rows >= 14), lag is constant:
    # ewma lags by c, ewma2 lags by 2c -> dema = 2*ewma - ewma2 = value
    for i in range(14, 20):
        assert abs(out[i]["dema"] - float(i)) < 1e-9
        assert out[i]["trend"] > 0  # rising series: positive trend estimate
