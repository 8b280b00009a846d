"""Salting operators must be result-equivalent to their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_applify_spark.operators.salting import salted_agg_sum, salted_join


def _skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", i, float(i % 7)) for i in range(900)]
    rows += [(f"k{i % 10}", i, float(i % 5)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, id int, v double")


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): r["s"]
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        (r["k"]): r["sum_v"]
        for r in salted_agg_sum(df, ["k"], ["v"], salt_from=["id"]).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert abs(salted[k] - plain[k]) < 1e-9


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, tag string"
    )
    plain = sorted(
        (r["id"], r["tag"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["id"], r["tag"])
        for r in salted_join(big, small, ["k"], salt_from=["id"]).collect()
    )
    assert salted == plain


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest

    big = _skewed(spark)
    small = spark.createDataFrame([("hot", "H")], "k string, tag string")
    with _pytest.raises(ValueError, match="inner"):
        salted_join(big, small, ["k"], salt_from=["id"], how="full")


def test_hot_keys_finds_the_celebrity(spark):
    from pyspark.sql import functions as F

    from etl_job_applify_spark.operators import hot_keys

    # key 7 carries ~50% of rows; everything else is uniform noise
    df = spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, 7)
        .otherwise(F.pmod(F.col("id"), 1000))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    hot = {r["k"] for r in hot_keys(df, ["k"], threshold_share=0.05).collect()}
    assert hot == {7}
    exact = {r["k"] for r in hot_keys(
        df, ["k"], threshold_share=0.05, sample_fraction=None).collect()}
    assert exact == {7}


def test_differential_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from etl_job_applify_spark.operators import differential_salted_join

    big = spark.range(30000).select(
        F.when(F.col("id") % 3 != 0, 42)
        .otherwise(F.pmod(F.col("id"), 500))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    got = differential_salted_join(
        big, small, ["k"], salt_from=["payload"], sample_fraction=None
    )
    want = big.join(small, "k", "inner")
    assert got.count() == want.count()
    g = got.agg(F.sum("payload"), F.sum("attr")).first()
    w = want.agg(F.sum("payload"), F.sum("attr")).first()
    assert g == w


def test_profile_join_keys_exact_shares(spark):
    from etl_job_applify_spark.operators import profile_join_keys

    df = spark.createDataFrame(
        [("a", i) for i in range(90)] + [("b", i) for i in range(9)]
        + [("c", 0)],
        "k string, v long",
    )
    row = {r["key_col"]: r for r in profile_join_keys(df, ["k"]).collect()}["k"]
    assert row["n_rows"] == 100 and row["n_distinct"] == 3
    assert abs(row["top1_share"] - 0.9) < 1e-12
    assert abs(row["top10_share"] - 1.0) < 1e-12  # only 3 keys: all in top10
