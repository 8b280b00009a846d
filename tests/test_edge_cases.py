"""Degenerate-input behavior of the operator library: empty relations,
single rows, and null keys must produce empty/identity results — never
exceptions. At 100 TB these cases are not hypothetical: a filter chain
routinely empties a partition's worth of input, and null keys are the
default state of real foreign keys."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_like(spark, ddl: str):
    return spark.createDataFrame([], ddl)


def test_asof_join_empty_build_side(spark):
    from etl_job_applify_spark.operators.asof import asof_join

    trades = spark.createDataFrame(
        [(1, 100, 10.0)], "sym bigint, t bigint, px double"
    )
    quotes = _empty_like(spark, "sym bigint, t bigint, bid double")
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t"
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["bid"] is None


def test_upsert_empty_updates_is_identity(spark):
    from etl_job_applify_spark.sinks.upsert import upsert

    target = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    updates = _empty_like(spark, "id bigint, v string")
    got = {(r["id"], r["v"]) for r in upsert(target, updates, ["id"]).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_connected_components_empty_edges(spark):
    from etl_job_applify_spark.operators.components import connected_components

    edges = _empty_like(spark, "a bigint, b bigint")
    assert connected_components(edges).count() == 0


def test_exact_dedup_all_null_subset(spark):
    from etl_job_applify_spark.transform.dedup import exact_dedup

    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), (1, "z")], "k string, v string"
    )
    # nulls compare equal for dedup purposes (one null-key row survives)
    assert exact_dedup(df.select("k"), subset=["k"]).count() == 2


def test_sessionize_single_event(spark):
    from etl_job_applify_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [(1, 1000)], "user_id bigint, ts_s bigint"
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
    out = sessionize(
        df, keys=["user_id"], ts_col="ts", gap_seconds=1800
    ).collect()
    assert len(out) == 1 and out[0]["session_id"] is not None


def test_minhash_empty_corpus(spark):
    from etl_job_applify_spark.dedup.minhash import minhash_lsh_pairs

    docs = _empty_like(spark, "doc_id bigint, text string")
    assert minhash_lsh_pairs(docs).count() == 0


def test_jaccard_single_doc_no_pairs(spark):
    from etl_job_applify_spark.dedup.jaccard import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "one lonely document here")], "doc_id bigint, text string"
    )
    assert ngram_jaccard_pairs(docs).count() == 0


def test_incremental_rollup_empty_increment(spark):
    from etl_job_applify_spark.operators.incremental import (
        aggregate_increment,
        merge_rollup,
    )

    base = spark.createDataFrame([("A", 1.0)], "k string, x double")
    measures = {"x": "x"}
    r = aggregate_increment(base, ["k"], measures)
    empty = aggregate_increment(
        _empty_like(spark, "k string, x double"), ["k"], measures
    )
    merged = merge_rollup(r, empty, ["k"], measures)
    rows = merged.collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 1


def test_scd2_apply_empty_batch_keeps_dim(spark):
    from etl_job_applify_spark.operators import scd2_apply

    u1 = spark.createDataFrame([(1, 5.0)], "k long, v double")
    dim = scd2_apply(None, u1, ["k"], ["v"], "2020-01-01")
    empty = spark.createDataFrame([], "k long, v double")
    out = scd2_apply(dim, empty, ["k"], ["v"], "2021-01-01")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["is_current"] and rows[0]["v"] == 5.0


def test_triangle_stats_empty_and_single_edge(spark):
    from etl_job_applify_spark.operators import triangle_stats

    empty = spark.createDataFrame([], "a long, b long")
    assert triangle_stats(empty) == (0, 0, 0, 0)
    one = spark.createDataFrame([(1, 2)], "a long, b long")
    st = triangle_stats(one)
    assert (st.n_edges, st.n_triangles, st.n_wedges) == (1, 0, 0)


def test_profile_table_empty_input(spark):
    from etl_job_applify_spark.transform.profile import profile_table

    empty = spark.createDataFrame([], "a bigint, s string")
    rows = {r["column"]: r for r in profile_table(empty).collect()}
    assert set(rows) == {"a", "s"}
    assert rows["a"]["n_rows"] == 0 and rows["a"]["n_distinct"] == 0
    assert rows["a"]["min_numeric"] is None and rows["s"]["min_text"] is None


def test_interpolation_single_observation_has_no_gaps(spark):
    """One observed hour → spine is that single point; no interpolation
    rows, the observed value echoes through."""
    import datetime as dt

    from etl_job_applify_spark.queries import timeseries as ts

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1, 5), 42.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    df.createOrReplaceTempView("_edge_interp")
    orig = ts.tbl
    ts.tbl = lambda s, d, n: spark.table("_edge_interp")
    try:
        rows = ts.q162_resample_interpolate(spark, "x").collect()
    finally:
        ts.tbl = orig
    assert len(rows) == 1
    assert rows[0]["observed"] and rows[0]["interp"] == 42.0


def test_ewma_single_row_equals_value(spark):
    import datetime as dt

    from etl_job_applify_spark.queries import timeseries as ts

    df = spark.createDataFrame(
        [(7, 3, dt.datetime(2024, 1, 1), 13.5)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    df.createOrReplaceTempView("_edge_ewma")
    orig = ts.tbl
    ts.tbl = lambda s, d, n: spark.table("_edge_ewma")
    try:
        rows = ts.q164_ewma(spark, "x").collect()
    finally:
        ts.tbl = orig
    assert len(rows) == 1 and rows[0]["ewma"] == 13.5


def test_bloom_probe_on_empty_equals_dict(spark, tmp_path):
    """equals={} must not prune (no covered columns -> full scan)."""
    from etl_job_applify_spark.sinks import snapshot_files, write_version

    path = str(tmp_path / "t")
    write_version(spark.range(100), path, bloom_columns=("id",))
    kept, total = snapshot_files(spark, path, equals={})
    assert len(kept) == total
