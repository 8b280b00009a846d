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
