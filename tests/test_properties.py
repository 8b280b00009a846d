"""Property-based operator tests (hypothesis): the custom assemblies must
agree with an independent reference implementation on arbitrary inputs,
not just the fixtures."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etl_job_applify_spark.operators import asof_join
from etl_job_applify_spark.sinks.upsert import upsert

_ts = st.integers(min_value=0, max_value=10_000)
_key = st.sampled_from(["a", "b", "c"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=8),
    right=st.lists(st.tuples(_key, _ts, st.integers(0, 100)),
                   min_size=1, max_size=8, unique_by=lambda r: (r[0], r[1])),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, t int, lid int"
    ).withColumn("t", F.timestamp_seconds("t"))
    rdf = spark.createDataFrame(right, "k string, rt int, payload int") \
        .withColumn("rt", F.timestamp_seconds("rt"))
    got = {
        r["lid"]: r["payload"]
        for r in asof_join(ldf, rdf, on=["k"], left_ts="t", right_ts="rt",
                           payload=["payload"]).collect()
    }
    lp = pd.DataFrame(
        [(k, dt.datetime.utcfromtimestamp(t), i) for i, (k, t) in enumerate(left)],
        columns=["k", "t", "lid"],
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(
        [(k, dt.datetime.utcfromtimestamp(t), p) for k, t, p in right],
        columns=["k", "rt", "payload"],
    ).sort_values("rt", kind="stable")
    want_df = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k")
    want = {
        int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
        for r in want_df.itertuples()
    }
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    target=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 9)),
                    min_size=0, max_size=10, unique_by=lambda r: r[0]),
    updates=st.lists(st.tuples(st.integers(0, 20), st.integers(10, 19),
                               st.integers(0, 5)),
                     min_size=0, max_size=10),
)
def test_upsert_matches_dict_semantics(spark, target, updates):
    tdf = spark.createDataFrame(target, "id int, v int") if target else \
        spark.createDataFrame([], "id int, v int")
    udf_ = spark.createDataFrame(updates, "id int, v int, ver int") if updates else \
        spark.createDataFrame([], "id int, v int, ver int")
    out = {
        r["id"]: r["v"]
        for r in upsert(tdf, udf_.select("id", "v", "ver"),
                        keys=["id"], version_col="ver").collect()
    }
    want = {k: v for k, v in target}
    best: dict[int, tuple[int, int]] = {}
    for (k, v, ver) in updates:
        # dedup_keep_first orders by version DESC with row_number → the
        # max version wins; ties broken arbitrarily, so make value depend
        # only on (k, ver) to keep the property deterministic
        if k not in best or ver > best[k][0]:
            best[k] = (ver, v)
    for k, (ver, v) in best.items():
        want[k] = v
    # tie versions: any of the tied values is acceptable
    for k in want:
        if k in best:
            tied = {v for (kk, v, ver) in updates if kk == k and ver == best[k][0]}
            assert out[k] in tied
        else:
            assert out[k] == want[k]
    assert out.keys() == want.keys()
