"""Count-min sketch kernel (functions/cms.py): exactness under pinned
hashes, the over-estimate guarantee under forced collisions, and
mergeability (the property that makes it the per-shard sketch shape).
"""

import pytest
from pyspark.sql import functions as F

from etl_job_applify_spark.functions.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from etl_job_applify_spark.functions.text import rolling_hash_expr


def _wc(spark):
    words = (
        ["alpha"] * 7 + ["beta"] * 5 + ["gamma"] * 3 + ["delta"] * 2
        + ["eps", "zeta", "eta", "theta"]
    )
    return (
        spark.createDataFrame([(w,) for w in words], "word string")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn("key", rolling_hash_expr("word"))
    )


def test_cms_estimates_exact_without_collisions(spark):
    wc = _wc(spark)
    sk = cms_build(wc, "key", weight_col="cnt", depth=4, width=512)
    est = cms_estimate(
        sk, wc.select("word", "cnt", "key"), "key", depth=4, width=512
    )
    rows = {r["word"]: (r["cnt"], r["cms_est"]) for r in est.collect()}
    # width 512 over 8 distinct keys: no collision survives all 4 rows
    assert all(e == t for t, e in rows.values()), rows


def test_cms_overestimates_never_under(spark):
    """width=2 forces heavy collisions: estimates may exceed the truth
    but can NEVER be below it — the one-sided CMS guarantee."""
    wc = _wc(spark)
    sk = cms_build(wc, "key", weight_col="cnt", depth=2, width=2)
    est = cms_estimate(
        sk, wc.select("word", "cnt", "key"), "key", depth=2, width=2
    )
    rows = [(r["cnt"], r["cms_est"]) for r in est.collect()]
    assert all(e >= t for t, e in rows)
    assert any(e > t for t, e in rows)  # collisions really happened


def test_cms_merge_equals_whole(spark):
    """Sketching two disjoint shards and merging equals sketching the
    union — bucket-wise additivity, the 100 TB per-partition shape."""
    wc = _wc(spark)
    whole = cms_build(wc, "key", weight_col="cnt", depth=4, width=64)
    h1 = cms_build(
        wc.filter(F.col("word") < "g"), "key", "cnt", depth=4, width=64
    )
    h2 = cms_build(
        wc.filter(F.col("word") >= "g"), "key", "cnt", depth=4, width=64
    )
    merged = cms_merge(h1, h2)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_depth_bounds(spark):
    wc = _wc(spark)
    with pytest.raises(ValueError, match="depth"):
        cms_build(wc, "key", depth=9)


def test_cms_sketch_stream_exactly_once(spark, tmp_path):
    """Streamed sketch maintenance: per-epoch increments CAS-append with
    epoch marks; the merged log equals the one-shot batch sketch over
    the union of all batches, and a full replay (epoch ids restart)
    commits nothing — the sketch is replay-invariant."""
    from etl_job_applify_spark.functions.cms import cms_read
    from etl_job_applify_spark.sinks.versioned import list_versions
    from etl_job_applify_spark.streaming import run_cms_sketch_stream

    items = spark.createDataFrame(
        [(i % 13 + 1,) for i in range(60)], "key long"
    )
    src = tmp_path / "cms_src"
    src.mkdir()
    # deterministic batch split by value range
    for b in range(6):
        items.filter(
            (F.col("key") % 6) == b
        ).coalesce(1).write.parquet(str(src / f"b{b}.parquet"))
    sketch_dir = str(tmp_path / "cms_log")

    def run():
        stream = (
            spark.readStream.schema("key long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_cms_sketch_stream(
            stream, sketch_dir, "key", depth=3, width=32
        )

    run()
    whole = cms_build(items, "key", depth=3, width=32)
    streamed = cms_read(spark, sketch_dir)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, whole.collect())
    )
    n_snaps = len(list_versions(spark, sketch_dir))
    run()  # fresh stream, epoch ids restart at 0: every batch is fenced
    assert len(list_versions(spark, sketch_dir)) == n_snaps
    assert sorted(map(tuple, cms_read(spark, sketch_dir).collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_estimate_broadcasts_sketch_side(spark):
    """Point queries compile to a broadcast join with the SKETCH as the
    broadcast side (≤ depth×width rows) — the probe relation stays
    distributed, which is what makes corpus-sized point-query batches
    one pass."""
    from etl_job_applify_spark.plans.explain import explain_str

    wc = _wc(spark)
    sk = cms_build(wc, "key", weight_col="cnt", depth=4, width=64)
    est = cms_estimate(
        sk, wc.select("word", "cnt", "key"), "key", depth=4, width=64
    )
    fmt = explain_str(est, "formatted")
    assert "BroadcastHashJoin" in fmt or "BroadcastExchange" in fmt


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    counts=st.lists(
        st.tuples(st.integers(0, 2**31 - 2), st.integers(1, 50)),
        min_size=1, max_size=20, unique_by=lambda t: t[0],
    ),
    width=st.sampled_from([2, 8, 64]),
)
def test_cms_guarantee_property(spark, counts, width):
    """For ANY weighted key multiset and width: every point estimate is
    >= the true count (one-sided guarantee), and the sketch total mass
    per row equals the input mass (nothing lost or invented)."""
    df = spark.createDataFrame(counts, "key long, cnt long")
    sk = cms_build(df, "key", weight_col="cnt", depth=3, width=width)
    est = cms_estimate(
        sk, df.select("key", "cnt"), "key", depth=3, width=width
    )
    assert all(
        r["cms_est"] >= r["cnt"] for r in est.collect()
    )
    total = sum(c for _, c in counts)
    per_row = {
        r["row"]: r["s"]
        for r in sk.groupBy("row").agg(
            F.sum("cnt").alias("s")
        ).collect()
    }
    assert all(v == total for v in per_row.values())


def test_cms_estimate_preserves_duplicate_probe_rows(spark):
    """Cardinality contract: one output row per probe row — identical
    probe rows (repeated point queries with the same payload) must NOT
    collapse through the depth-explode regroup."""
    wc = _wc(spark)
    sk = cms_build(wc, "key", weight_col="cnt", depth=4, width=512)
    one = wc.filter(F.col("word") == "alpha").select("word", "key")
    probes = one.unionAll(one).unionAll(one)  # 3 identical rows
    est = cms_estimate(sk, probes, "key", depth=4, width=512)
    rows = est.collect()
    assert len(rows) == 3
    assert all(r["cms_est"] == 7 for r in rows)
