"""SCD2, connected components, sampling operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_job_applify_spark.operators.components import connected_components
from etl_job_applify_spark.operators.scd2 import scd2_intervals
from etl_job_applify_spark.transform.sampling import (
    hash_sample,
    systematic_stratified_sample,
)


def test_scd2_intervals(spark):
    changes = spark.createDataFrame(
        [("k1", dt.datetime(2024, 1, 1), "v1"),
         ("k1", dt.datetime(2024, 2, 1), "v2"),
         ("k2", dt.datetime(2024, 1, 15), "w1")],
        "k string, ts timestamp, val string",
    )
    out = {(r["k"], r["val"]): (r["valid_to"], r["is_current"])
           for r in scd2_intervals(changes, ["k"], "ts").collect()}
    assert out[("k1", "v1")] == (dt.datetime(2024, 2, 1), False)
    assert out[("k1", "v2")] == (None, True)
    assert out[("k2", "w1")] == (None, True)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3, pair 10-11, self-contained triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "a bigint, b bigint",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_systematic_sample_is_deterministic_and_stratified(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)], "id int, s string"
    )
    out1 = sorted(r["id"] for r in
                  systematic_stratified_sample(df, ["s"], ["id"], 5).collect())
    out2 = sorted(r["id"] for r in
                  systematic_stratified_sample(df, ["s"], ["id"], 5).collect())
    assert out1 == out2
    assert len(out1) == 20  # 10 per stratum


def test_hash_sample_fraction_and_stability(spark):
    df = spark.range(10_000)
    s1 = {r["id"] for r in hash_sample(df, ["id"], 0.1).collect()}
    s2 = {r["id"] for r in hash_sample(df.repartition(13), ["id"], 0.1).collect()}
    assert s1 == s2  # stable under repartitioning
    assert 700 < len(s1) < 1300  # ~10%


def test_weighted_hash_sample(spark):
    from pyspark.sql import functions as F

    from etl_job_applify_spark.transform.sampling import weighted_hash_sample

    # two weight classes: heavy rows must dominate the sample
    df = spark.range(2000).withColumn(
        "w", F.when(F.col("id") < 200, 100.0).otherwise(0.5)
    )
    s1 = sorted(r["id"] for r in weighted_hash_sample(df, ["id"], "w", 100).collect())
    s2 = sorted(r["id"] for r in
                weighted_hash_sample(df.repartition(7), ["id"], "w", 100).collect())
    assert s1 == s2  # deterministic under repartitioning
    heavy = sum(1 for i in s1 if i < 200)
    assert heavy > 60  # heavy class (10% of rows, 200x weight) dominates


def test_normalize_text_expr(spark):
    from etl_job_applify_spark.functions.text import normalize_text_expr

    df = spark.createDataFrame([("  Hello   WORLD \t x ",)], "t string")
    assert df.select(normalize_text_expr("t")).first()[0] == "hello world x"


def test_jaccard_containment(spark):
    from etl_job_applify_spark.dedup import ngram_jaccard_pairs

    # b contains all of a's shingles plus more → containment_a = 1
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w extra tokens here")],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(
        df, threshold=0.0, include_containment=True
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["containment_a"] == 1.0 and r["containment_b"] < 1.0


def test_weighted_sample_excludes_bad_weights(spark):
    from pyspark.sql import functions as F

    from etl_job_applify_spark.transform.sampling import weighted_hash_sample

    df = spark.range(100).withColumn(
        "w", F.when(F.col("id") < 5, -1.0).otherwise(1.0)
    )
    got = {r["id"] for r in weighted_hash_sample(df, ["id"], "w", 50).collect()}
    assert not (got & set(range(5)))  # negative-weight rows never sampled


def test_scd2_apply_change_insert_noop(spark):
    from etl_job_applify_spark.operators.scd2 import scd2_apply

    u1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None)], "k long, name string, price double"
    )
    dim = scd2_apply(None, u1, ["k"], ["name", "price"], "2020-01-01")
    # change k1, add k3; k2 absent (untouched)
    u2 = spark.createDataFrame(
        [(1, "a", 11.0), (3, "c", 30.0)], "k long, name string, price double"
    )
    dim = scd2_apply(dim, u2, ["k"], ["name", "price"], "2021-01-01")
    # no-op redelivery, incl. the null-attr row (null-safe compare)
    u3 = spark.createDataFrame(
        [(1, "a", 11.0), (2, "b", None)], "k long, name string, price double"
    )
    dim = scd2_apply(dim, u3, ["k"], ["name", "price"], "2022-01-01")
    rows = {
        (r["k"], r["is_current"]): (r["price"], r["valid_from"].year,
                                    r["valid_to"].year if r["valid_to"] else None)
        for r in dim.collect()
    }
    assert len(rows) == 4
    assert rows[(1, False)] == (10.0, 2020, 2021)
    assert rows[(1, True)] == (11.0, 2021, None)
    assert rows[(2, True)] == (None, 2020, None)  # never versioned
    assert rows[(3, True)] == (30.0, 2021, None)


def test_scd2_apply_null_to_value_is_a_change(spark):
    from etl_job_applify_spark.operators.scd2 import scd2_apply

    u1 = spark.createDataFrame([(1, None)], "k long, v double")
    dim = scd2_apply(None, u1, ["k"], ["v"], "2020-01-01")
    u2 = spark.createDataFrame([(1, 5.0)], "k long, v double")
    dim = scd2_apply(dim, u2, ["k"], ["v"], "2021-01-01")
    cur = dim.filter("is_current").collect()
    assert len(cur) == 1 and cur[0]["v"] == 5.0
    assert dim.filter("NOT is_current").count() == 1
