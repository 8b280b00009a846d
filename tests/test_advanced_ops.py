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
