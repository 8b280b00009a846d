"""Custom operator assemblies: as-of join, top-k, sessionize, range join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_job_applify_spark.operators import (
    asof_join,
    range_join,
    sessionize,
    top_k_per_group,
)
from etl_job_applify_spark.operators.range_join import range_join_bucketed


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward(spark):
    trades = spark.createDataFrame(
        [("A", ts("2024-01-01 10:00:05"), 1),
         ("A", ts("2024-01-01 10:00:00"), 2),
         ("B", ts("2024-01-01 09:00:00"), 3)],
        "sym string, t timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [("A", ts("2024-01-01 10:00:00"), 100.0),
         ("A", ts("2024-01-01 10:00:03"), 101.0),
         ("B", ts("2024-01-01 09:30:00"), 50.0)],
        "sym string, qt timestamp, px double",
    )
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt",
                    payload=["px"])
    got = {(r["sym"], r["trade_id"]): r["px"] for r in out.collect()}
    # equal timestamps are inclusive; B's quote is later than its trade → null
    assert got == {("A", 1): 101.0, ("A", 2): 100.0, ("B", 3): None}


def test_asof_null_payload_field_not_backfilled(spark):
    # The matched (most recent) quote has px=NULL: the probe row must get
    # NULL for px, not a back-fill from the OLDER quote's non-null px, and
    # the other payload field must still come from the matched row.
    trades = spark.createDataFrame(
        [("A", ts("2024-01-01 10:00:05"), 1)],
        "sym string, t timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [("A", ts("2024-01-01 10:00:00"), 100.0, "old"),
         ("A", ts("2024-01-01 10:00:03"), None, "new")],
        "sym string, qt timestamp, px double, src string",
    )
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt",
                    payload=["px", "src"])
    row = out.first()
    assert row["px"] is None and row["src"] == "new"


def test_asof_forward(spark):
    left = spark.createDataFrame([("A", 1)], "k string, t int") \
        .withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame([("A", 5, "x"), ("A", 0, "y")],
                                  "k string, rt int, v string") \
        .withColumn("rt", F.timestamp_seconds("rt"))
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                    payload=["v"], how="forward")
    assert out.first()["v"] == "x"  # earliest right at-or-after t=1 is rt=5


def test_asof_nearest_and_tolerance(spark):
    """merge_asof parity: nearest picks the closer side, exact ties
    prefer backward, and tolerance nulls out far matches per side
    (numeric, date, and timestamp distance units)."""
    left = spark.createDataFrame(
        [("A", 10, 1), ("A", 14, 2), ("A", 100, 3)],
        "k string, t long, pid int",
    )
    right = spark.createDataFrame(
        [("A", 8, "b8"), ("A", 13, "b13"), ("A", 16, "f16")],
        "k string, rt long, v string",
    )

    def run(**kw):
        out = asof_join(left, right, on=["k"], left_ts="t",
                        right_ts="rt", payload=["v"], **kw)
        return {r["pid"]: r["v"] for r in out.collect()}

    # t=10: backward 8 (d=2) vs forward 13 (d=3) -> 8; t=14: 13 (d=1)
    # vs 16 (d=2) -> 13; t=100: only backward 16
    assert run(how="nearest") == {1: "b8", 2: "b13", 3: "f16"}
    # tolerance kills t=100's distant match but keeps the close ones
    assert run(how="nearest", tolerance=5) == {1: "b8", 2: "b13", 3: None}
    assert run(how="backward", tolerance=1) == {1: None, 2: "b13", 3: None}
    # exact tie prefers backward: t=12 vs {8(d=4)...} make a tie case
    l2 = spark.createDataFrame([("A", 12, 9)], "k string, t long, pid int")
    r2 = spark.createDataFrame(
        [("A", 10, "back"), ("A", 14, "fwd")], "k string, rt long, v string"
    )
    out = asof_join(l2, r2, on=["k"], left_ts="t", right_ts="rt",
                    payload=["v"], how="nearest")
    assert out.first()["v"] == "back"
    # date typed: tolerance counted in DAYS
    ld = spark.createDataFrame(
        [("A", "2024-01-10", 1)], "k string, t string, pid int"
    ).withColumn("t", F.col("t").cast("date"))
    rd = spark.createDataFrame(
        [("A", "2024-01-01", "jan1")], "k string, rt string, v string"
    ).withColumn("rt", F.col("rt").cast("date"))
    god = asof_join(ld, rd, on=["k"], left_ts="t", right_ts="rt",
                    payload=["v"], how="nearest", tolerance=9)
    assert god.first()["v"] == "jan1"
    god2 = asof_join(ld, rd, on=["k"], left_ts="t", right_ts="rt",
                     payload=["v"], how="nearest", tolerance=8)
    assert god2.first()["v"] is None


def test_asof_nearest_subsecond_precision(spark):
    """Timestamp distance runs in exact integer MICROSECONDS: with
    sub-second timestamps the old whole-second truncation tied both
    neighbors at distance 0 and wrongly preferred backward, and
    tolerance gated off by up to 1 s. Tolerance stays in (fractional)
    seconds."""
    lt = spark.createDataFrame([("A", 10.4, 1)], "k string, t double, pid int") \
        .withColumn("t", F.timestamp_seconds("t"))
    rt = spark.createDataFrame(
        [("A", 10.0, "back"), ("A", 10.7, "fwd")],
        "k string, rt double, v string",
    ).withColumn("rt", F.timestamp_seconds("rt"))

    def run(**kw):
        out = asof_join(lt, rt, on=["k"], left_ts="t", right_ts="rt",
                        payload=["v"], how="nearest", **kw)
        return out.first()["v"]

    assert run() == "fwd"                 # 0.3 s beats 0.4 s
    assert run(tolerance=0.35) == "fwd"   # only the forward survives
    assert run(tolerance=0.2) is None     # both gated out
    # pandas merge_asof agreement on the same frame
    import pandas as pd

    lp = lt.toPandas().sort_values("t")
    rp = rt.toPandas().sort_values("rt")
    want = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k",
        direction="nearest", tolerance=pd.Timedelta(seconds=0.35),
    )["v"].iloc[0]
    assert want == "fwd"


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i) for i in range(10)] + [("g2", i) for i in range(3)],
        "g string, v int",
    )
    out = top_k_per_group(df, ["g"], [F.desc("v")], k=2, rank_col="r")
    got = {(r["g"], r["v"], r["r"]) for r in out.collect()}
    assert got == {("g1", 9, 1), ("g1", 8, 2), ("g2", 2, 1), ("g2", 1, 2)}


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 2000), (2, 0)], "uid int, t int"
    ).withColumn("t", F.timestamp_seconds("t"))
    out = sessionize(df, ["uid"], "t", gap_seconds=1800)
    sess = {(r["uid"], r["t"].second + r["t"].minute * 60 + r["t"].hour * 3600):
            r["session_id"] for r in out.collect()}
    assert sess[(1, 0)] == 1 and sess[(1, 100)] == 1
    assert sess[(1, 2000)] == 2 and sess[(2, 0)] == 1


def test_range_join_broadcast(spark):
    facts = spark.createDataFrame([(5.0,), (15.0,), (25.0,)], "x double")
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 20.0)], "band string, lo double, hi double"
    )
    cond = (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    out = range_join(facts, bands, cond)
    assert {(r["x"], r["band"]) for r in out.collect()} == {(5.0, "lo"), (15.0, "hi")}


def test_range_join_bucketed_matches_naive(spark):
    left = spark.createDataFrame([(float(i),) for i in range(50)], "p double")
    right = spark.createDataFrame(
        [(float(i), float(i + 7), i) for i in range(0, 50, 5)],
        "lo double, hi double, rid int",
    )
    fast = range_join_bucketed(left, right, "p", "lo", "hi", bucket_width=8.0)
    naive = left.join(
        right, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi"))
    )
    assert (
        {(r["p"], r["rid"]) for r in fast.collect()}
        == {(r["p"], r["rid"]) for r in naive.collect()}
    )


def test_operators_on_empty_input(spark):
    """Every custom assembly must be total: empty in → empty out, not an
    error (at 100 TB some partition/day/group is always empty)."""
    from etl_job_applify_spark.operators import connected_components, scd2_intervals

    empty_ev = spark.createDataFrame([], "k string, t timestamp, v double")
    assert sessionize(empty_ev, ["k"], "t", 60).count() == 0
    assert top_k_per_group(empty_ev, ["k"], [F.desc("v")], 3).count() == 0
    assert scd2_intervals(empty_ev, ["k"], "t").count() == 0

    empty_edges = spark.createDataFrame([], "a bigint, b bigint")
    assert connected_components(empty_edges).count() == 0

    right = spark.createDataFrame([("a", 1, 1.0)], "k string, rt int, px double") \
        .withColumn("rt", F.timestamp_seconds("rt"))
    out = asof_join(
        spark.createDataFrame([], "k string, t timestamp"),
        right, on=["k"], left_ts="t", right_ts="rt", payload=["px"],
    )
    assert out.count() == 0


def test_range_join_bucketed_left_outer(spark):
    left = spark.createDataFrame([(5.0,), (99.0,)], "p double")
    right = spark.createDataFrame([(0.0, 10.0, 1)], "lo double, hi double, rid int")
    out = range_join_bucketed(left, right, "p", "lo", "hi",
                              bucket_width=10.0, how="left")
    got = {r["p"]: r["rid"] for r in out.collect()}
    # unmatched left row survives null-extended (a post-join filter would
    # have dropped it)
    assert got == {5.0: 1, 99.0: None}


def test_range_join_bucketed_rejects_outer(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(5.0,)], "p double")
    right = spark.createDataFrame([(0.0, 10.0)], "lo double, hi double")
    with _pytest.raises(ValueError, match="inner"):
        range_join_bucketed(left, right, "p", "lo", "hi", 10.0, how="full")


def test_asof_payload_collision_rejected(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("a", 1, 1.0)], "k string, t int, px double") \
        .withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame([("a", 1, 2.0)], "k string, rt int, px double") \
        .withColumn("rt", F.timestamp_seconds("rt"))
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                  payload=["px"])


def test_components_nonconvergence_raises(spark):
    import pytest as _pytest

    from etl_job_applify_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a bigint, b bigint"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=2)
    # label propagation needs diameter rounds: a short chain converges
    short = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "a bigint, b bigint"
    )
    ok = connected_components(short, max_iter=10)
    assert {r["component"] for r in ok.collect()} == {0}


def test_components_converging_at_max_iter_is_ok(spark):
    from etl_job_applify_spark.operators.components import connected_components

    # chain 0-1-2: labels settle on round 2; max_iter=2 must SUCCEED
    # (the confirming round proves convergence instead of raising)
    chain = spark.createDataFrame([(0, 1), (1, 2)], "a bigint, b bigint")
    out = connected_components(chain, max_iter=2)
    assert {r["component"] for r in out.collect()} == {0}


def test_incremental_rollup_equals_full_recompute(spark):
    """A rollup maintained from three date-sliced increments must be
    BIT-identical to the full recompute (decimal states are associative),
    and the readout must expose totals/averages."""
    from etl_job_applify_spark.operators.incremental import (
        aggregate_increment,
        merge_rollup,
        rollup_readout,
    )
    from etl_job_applify_spark.queries._util import tbl

    li = tbl(spark, "/root/testdata/sf0.001", "lineitem")
    keys = ["l_returnflag"]
    measures = {"qty": "l_quantity",
                "rev": "l_extendedprice * (1 - l_discount)"}

    slices = [
        li.filter("l_shipdate <  TIMESTAMP '1997-01-01'"),
        li.filter("l_shipdate >= TIMESTAMP '1997-01-01' "
                  "AND l_shipdate < TIMESTAMP '1999-01-01'"),
        li.filter("l_shipdate >= TIMESTAMP '1999-01-01'"),
    ]
    rollup = None
    for s in slices:
        rollup = merge_rollup(
            rollup, aggregate_increment(s, keys, measures), keys, measures
        )
    full = aggregate_increment(li, keys, measures)

    got = {r["l_returnflag"]: (r["qty_sum"], r["rev_sum"], r["n_rows"])
           for r in rollup.collect()}
    want = {r["l_returnflag"]: (r["qty_sum"], r["rev_sum"], r["n_rows"])
            for r in full.collect()}
    assert got == want  # exact decimal equality, not approximate

    view = rollup_readout(rollup, measures).collect()[0]
    assert view["qty_avg"] > 0 and "qty_sum" not in view.asDict()


def test_changes_increment_handles_updates_deletes_and_group_moves(spark, tmp_path):
    """CDF-folded rollup == full recompute of the new version, including
    a row whose GROUP KEY changes (debits the old group, credits the
    new) and a group whose membership falls to zero (pruned)."""
    from etl_job_applify_spark.operators.incremental import (
        aggregate_increment,
        changes_increment,
        merge_rollup,
        prune_empty_groups,
    )
    from etl_job_applify_spark.sinks import table_changes, write_version

    keys, measures = ["grp"], {"amt": "amount"}
    v1 = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)]
    # id2 amount updated, id3 MOVES b->a, id4 deleted (killing group c),
    # id5 inserted
    v2 = [(1, "a", 10.0), (2, "a", 25.0), (3, "a", 30.0), (5, "b", 50.0)]
    path = str(tmp_path / "t")
    schema = "id long, grp string, amount double"
    write_version(spark.createDataFrame(v1, schema), path)
    write_version(spark.createDataFrame(v2, schema), path)

    rollup = aggregate_increment(spark.createDataFrame(v1, schema), keys, measures)
    delta = changes_increment(
        table_changes(spark, path, 1, 2, keys=["id"]), keys, measures
    )
    updated = prune_empty_groups(merge_rollup(rollup, delta, keys, measures))
    full = aggregate_increment(spark.createDataFrame(v2, schema), keys, measures)

    got = {r["grp"]: (r["amt_sum"], r["n_rows"]) for r in updated.collect()}
    want = {r["grp"]: (r["amt_sum"], r["n_rows"]) for r in full.collect()}
    assert got == want
    assert "c" not in got  # zero-membership group pruned


def test_triangle_stats_matches_brute_force_and_caps(spark):
    from etl_job_applify_spark.operators import triangle_stats
    import pyspark.sql.functions as F

    # K4 plus a pendant: C(4,3)=4 triangles, wedges = sum C(d,2)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    st = triangle_stats(pairs)
    assert (st.n_edges, st.n_triangles) == (7, 4)
    assert st.n_wedges == 3 + 3 + 3 + 6 + 0  # degrees 3,3,3,4,1
    assert st.n_capped_nodes == 0

    # cap at degree 3: node 4 (degree 4) drops; remaining K3 on {1,2,3}
    st2 = triangle_stats(pairs, max_degree=3)
    assert st2.n_capped_nodes == 1
    assert (st2.n_edges, st2.n_triangles) == (3, 1)


def test_triangle_stats_shuffled_closing_same_counts(spark):
    from etl_job_applify_spark.operators import triangle_stats

    edges = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 2) % 20) for i in range(20)]
    pairs = (
        spark.createDataFrame(edges, "x long, y long")
        .selectExpr("least(x,y) AS a", "greatest(x,y) AS b")
        .distinct()
    )
    a = triangle_stats(pairs, broadcast_closing=True)
    b = triangle_stats(pairs, broadcast_closing=False)
    assert a == b and a.n_triangles == 20  # each i,i+1,i+2 closes


def test_approx_triangle_stats_deterministic_and_scaled(spark):
    from etl_job_applify_spark.operators import (
        approx_triangle_stats,
        triangle_stats,
    )
    import pyspark.sql.functions as F

    # ~60-clique union: dense enough that a p=0.5 sample still holds
    # triangles; the estimate must be exactly 8x the sampled count and
    # identical across invocations (the sampler is a pure hash)
    edges = [
        (base + i, base + j)
        for base in (100, 200, 300)
        for i in range(12)
        for j in range(i + 1, 12)
    ]
    pairs = spark.createDataFrame(edges, "a long, b long")
    exact = triangle_stats(pairs)
    ap1 = approx_triangle_stats(pairs, p=0.5)
    ap2 = approx_triangle_stats(pairs, p=0.5)
    assert ap1 == ap2  # deterministic sample
    assert ap1.n_triangles_est == ap1.n_triangles_sampled * 8
    assert 0 < ap1.n_sampled_edges < exact.n_edges
    # p=1 keeps every edge: the "estimate" IS the exact count
    full = approx_triangle_stats(pairs, p=1.0)
    assert full.n_sampled_edges == exact.n_edges
    assert full.n_triangles_est == exact.n_triangles


def test_triangle_kernel_no_unconditional_broadcast(spark):
    # broadcast_closing=False must leave NO broadcast hint anywhere in
    # the kernel's joins (AQE may still pick broadcast from runtime
    # sizes; the contract is that the OPERATOR doesn't force it past
    # the caller's stated budget). Pin by inspecting the logical plan
    # of the oriented-edge relation the kernel builds.
    from pyspark.sql import functions as F

    edges = [(1, 2), (1, 3), (2, 3), (3, 4)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    for hinted, expect in ((True, True), (False, False)):
        hint = F.broadcast if hinted else (lambda df: df)
        e = pairs.join(
            hint(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da")),
            "a",
        )
        plan = e._jdf.queryExecution().logical().toString()
        assert ("UnresolvedHint broadcast" in plan or "ResolvedHint" in plan) is expect


def test_triangle_methods_agree(spark):
    """The intersect (edge-iterator) and wedge kernels count the SAME
    oriented graph — identical TriangleStats on a graph with hubs,
    multi-triangle edges, and capping."""
    import random

    from etl_job_applify_spark.operators import triangle_stats

    rng = random.Random(7)
    edges = {(1, v) for v in range(2, 12)}  # hub 1
    edges |= {(v, v + 1) for v in range(2, 11)}  # fan triangles
    for _ in range(60):
        x, y = rng.randrange(2, 30), rng.randrange(2, 30)
        if x != y:
            edges.add((min(x, y), max(x, y)))
    pairs = spark.createDataFrame(sorted(edges), "a long, b long")
    wedge = triangle_stats(pairs, method="wedge")
    inter = triangle_stats(pairs, method="intersect")
    assert inter == wedge and inter.n_triangles > 0
    # under capping too (cap changes the graph identically for both)
    assert triangle_stats(pairs, max_degree=5, method="wedge") == (
        triangle_stats(pairs, max_degree=5, method="intersect")
    )
    import pytest

    with pytest.raises(ValueError, match="unknown method"):
        triangle_stats(pairs, method="bloom")


def test_cc_update_equals_recompute(spark):
    """Incremental CC maintenance: updating old-edge labels with a
    batch of new edges is bit-identical to recomputing from scratch —
    including a bridge batch that MERGES two existing clusters (the
    min label must flood the higher-labeled cluster), a brand-new
    node, and a no-op redelivery."""
    from etl_job_applify_spark.operators.components import (
        cc_update,
        connected_components,
    )

    old = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (20, 21)],
        "a long, b long",
    )
    # bridge 3-10 merges {1,2,3} with {10,11,12}; 30-31 adds new nodes
    new = spark.createDataFrame([(3, 10), (30, 31)], "a long, b long")
    alle = old.unionByName(new)
    base = connected_components(old)
    got = {tuple(r) for r in cc_update(alle, new, base).collect()}
    want = {tuple(r) for r in connected_components(alle).collect()}
    assert got == want
    assert (12, 1) in got  # the flood reached the far end
    # no-op redelivery: same batch again changes nothing
    relabeled = spark.createDataFrame(sorted(got), "node long, component long")
    again = {tuple(r) for r in cc_update(alle, new, relabeled).collect()}
    assert again == want


def test_streaming_components_batch_parity(spark, tmp_path):
    """run_components_stream over time-split pair batches: the
    persisted label head equals the one-shot kernel over all pairs —
    the dedup-cluster steady state (pairs stream in, canonical ids
    follow)."""
    import time

    from etl_job_applify_spark.operators.components import (
        connected_components,
    )
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_components_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    ).coalesce(1).write.parquet(str(src_dir / "b0.parquet"))
    time.sleep(1.1)
    spark.createDataFrame(
        [(3, 10), (20, 21)], "a long, b long"
    ).coalesce(1).write.parquet(str(src_dir / "b1.parquet"))

    stream = (
        spark.readStream.schema("a long, b long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*.parquet")
    )
    run_components_stream(stream, state)

    got = {
        tuple(r) for r in read_table(spark, state + "/labels").collect()
    }
    allp = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 10), (20, 21)], "a long, b long"
    )
    want = {tuple(r) for r in connected_components(allp).collect()}
    assert got == want
    assert (11, 1) in got


def test_streaming_components_replay_invariance(spark, tmp_path):
    """Re-running the components stream over the SAME source (a fresh
    query restarts epoch ids, so every batch re-delivers with its
    original epoch) must leave both persisted tables bit-identical —
    the epoch fence makes redelivery a no-op per table."""
    import time

    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_components_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, 2), (2, 3)], "a long, b long"
    ).coalesce(1).write.parquet(str(src_dir / "b0.parquet"))
    time.sleep(1.1)
    spark.createDataFrame(
        [(3, 10)], "a long, b long"
    ).coalesce(1).write.parquet(str(src_dir / "b1.parquet"))

    def run():
        stream = (
            spark.readStream.schema("a long, b long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*.parquet")
        )
        run_components_stream(stream, state)

    run()
    labels1 = sorted(
        tuple(r) for r in read_table(spark, state + "/labels").collect()
    )
    edges1 = sorted(
        tuple(r) for r in read_table(spark, state + "/edges").collect()
    )
    run()  # full redelivery: epochs 0 and 1 again
    labels2 = sorted(
        tuple(r) for r in read_table(spark, state + "/labels").collect()
    )
    edges2 = sorted(
        tuple(r) for r in read_table(spark, state + "/edges").collect()
    )
    assert labels1 == labels2 == [(1, 1), (2, 1), (3, 1), (10, 1)]
    assert edges1 == edges2


def test_triangle_update_equals_recompute(spark):
    """Incremental triangle/wedge maintenance: updating prior counts
    with a batch of new edges is bit-identical to recomputing from
    scratch — across every freshness shape (new triangles with 1, 2,
    and 3 new edges, new nodes, duplicate batch rows), plus founding
    from empty prior and the non-disjoint-batch guard."""
    import pyspark.sql.functions as F
    import pytest

    from etl_job_applify_spark.operators.triangles import (
        TriangleCounts,
        triangle_stats,
        triangle_update,
    )

    old = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (6, 7), (8, 9)]
    # batch shapes: (2,4) closes 1-2-4 and 2-3?-no (1 new edge,
    # 2 old); (5,6)+(5,7) with old (6,7) -> triangle with 2 new edges;
    # (10,11),(10,12),(11,12) -> all-new triangle on new nodes;
    # (9,9)-free, (8,9) dup of old is EXCLUDED (guard tested apart);
    # duplicate batch row (2,4) twice normalizes away
    new = [(2, 4), (2, 4), (5, 6), (5, 7), (10, 11), (10, 12), (11, 12)]
    old_df = spark.createDataFrame(old, "a long, b long")
    new_df = spark.createDataFrame(new, "a long, b long")
    all_df = old_df.unionByName(new_df).distinct()

    prior_st = triangle_stats(old_df)
    prior = TriangleCounts(
        prior_st.n_edges, prior_st.n_triangles, prior_st.n_wedges
    )
    got = triangle_update(all_df, new_df, prior)
    want = triangle_stats(all_df)
    assert got == TriangleCounts(
        want.n_edges, want.n_triangles, want.n_wedges
    )
    assert got.n_triangles > prior.n_triangles  # the batch added some

    # founding: empty prior + the whole edge set through the same path
    founded = triangle_update(
        all_df, all_df, TriangleCounts(0, 0, 0)
    )
    assert founded == got

    # reversed-orientation batch rows normalize (least/greatest)
    rev = new_df.select(F.col("b").alias("a"), F.col("a").alias("b"))
    assert triangle_update(all_df, rev, prior) == got

    # disjointness contract enforced: a batch edge already counted in
    # prior makes prior.n_edges + |batch| exceed |all| and raises
    bad_prior = TriangleCounts(
        want.n_edges, want.n_triangles, want.n_wedges
    )
    with pytest.raises(ValueError, match="already counted"):
        triangle_update(
            all_df,
            spark.createDataFrame([(5, 6)], "a long, b long"),
            bad_prior,
        )


def test_k_core_fixpoint_matches_brute(spark):
    """k_core peels to the fixpoint: K4 plus a tail — the 3-core is
    exactly the K4 (tail peels away in a cascade), the 5-core is
    empty; a cycle's 2-core is the whole cycle."""
    from etl_job_applify_spark.operators.kcore import k_core

    edges = spark.createDataFrame(
        # K4 on 1-4, tail 4-5-6 (cascade: 6 then 5 peel at k=2... at
        # k=3 both peel), pendant 7 on 1
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (1, 7)],
        "a long, b long",
    )
    assert {r["node"] for r in k_core(edges, 3).collect()} == {1, 2, 3, 4}
    assert k_core(edges, 5).count() == 0
    cyc = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 10)], "a long, b long"
    )
    assert {r["node"] for r in k_core(cyc, 2).collect()} == {10, 11, 12, 13}


def test_k_core_update_equals_recompute(spark):
    """Incremental k-core: updating the stored members with an edge
    batch is bit-identical to recomputing — including a batch that
    CASCADES membership through old nodes (the new edge raises one
    degree, which keeps a neighbor, which keeps ITS neighbor), a
    batch of duplicate/already-present edges (no-op), and one that
    only touches the existing core."""
    from etl_job_applify_spark.operators.kcore import k_core, k_core_update

    # old graph: K4 on 1-4; chain 4-5, 5-6, 6-2, plus 5-2: at k=3 the
    # old core is just the K4 (5 has deg 3 but neighbors 4,6,2: 6 has
    # deg 2 -> 6 peels -> 5 drops to 2 -> peels)
    old = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (6, 2), (5, 2)],
        "a long, b long",
    )
    base = k_core(old, 3)
    assert {r["node"] for r in base.collect()} == {1, 2, 3, 4}
    # batch: 6-4 raises 6 to degree 3 (neighbors 5, 2, 4) — now 5 and
    # 6 BOTH survive at k=3 (5: 4,6,2; 6: 5,2,4): a two-node cascade
    new = spark.createDataFrame([(6, 4)], "a long, b long")
    alle = old.unionByName(new)
    got = {r["node"] for r in k_core_update(alle, new, base, 3).collect()}
    want = {r["node"] for r in k_core(alle, 3).collect()}
    assert got == want
    assert got == {1, 2, 3, 4, 5, 6}

    # replayed/duplicate batch: already-present edges are a no-op
    relabeled = spark.createDataFrame(
        sorted((n,) for n in got), "node long"
    )
    again = {
        r["node"]
        for r in k_core_update(alle, new, relabeled, 3).collect()
    }
    assert again == want

    # a batch entirely inside the core changes nothing at k=3... and
    # a batch to a brand-new low-degree node neither
    iso = spark.createDataFrame([(1, 99)], "a long, b long")
    got2 = {
        r["node"]
        for r in k_core_update(
            alle.unionByName(iso), iso, relabeled, 3
        ).collect()
    }
    assert got2 == want


def test_streaming_triangles_batch_parity_and_replay(spark, tmp_path):
    """run_triangle_stream over time-split edge batches: the persisted
    counts head equals triangle_stats over all edges (batch parity),
    a cross-epoch REDELIVERED edge is first-epoch-deduped (not
    double-counted), and a whole-source replay leaves both tables
    bit-identical (replay invariance)."""
    import time

    from etl_job_applify_spark.operators.triangles import triangle_stats
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_triangle_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    # b0: K3 {1,2,3}; b1 re-delivers (1,2) (cross-epoch dup) and
    # closes two more triangles via 4; b2 adds an all-new K3 {7,8,9}
    b0 = [(1, 2), (1, 3), (2, 3)]
    b1 = [(1, 2), (1, 4), (2, 4), (3, 4)]
    b2 = [(7, 8), (7, 9), (8, 9)]
    for i, rows in enumerate([b0, b1, b2]):
        if i:
            time.sleep(1.1)
        spark.createDataFrame(rows, "a long, b long").coalesce(
            1
        ).write.parquet(str(src_dir / f"b{i}.parquet"))

    def run():
        stream = (
            spark.readStream.schema("a long, b long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*.parquet")
        )
        run_triangle_stream(stream, state)

    run()
    got = read_table(spark, state + "/counts").first()
    alle = spark.createDataFrame(
        sorted(set(b0 + b1 + b2)), "a long, b long"
    )
    want = triangle_stats(alle)
    assert (
        got["n_edges"], got["n_triangles"], got["n_wedges"]
    ) == (want.n_edges, want.n_triangles, want.n_wedges)
    assert got["n_triangles"] == 5  # K4 holds 4, plus the new K3
    edges1 = sorted(
        tuple(r) for r in read_table(spark, state + "/edges").collect()
    )
    # the cross-epoch dup kept its FIRST epoch tag
    assert (1, 2, 0) in edges1 and (1, 4, 1) in edges1

    run()  # whole-source replay: epochs 0..2 again
    got2 = read_table(spark, state + "/counts").first()
    assert tuple(got2) == tuple(got)
    edges2 = sorted(
        tuple(r) for r in read_table(spark, state + "/edges").collect()
    )
    assert edges1 == edges2


def test_streaming_kcore_batch_parity_and_replay(spark, tmp_path):
    """run_kcore_stream over time-split edge batches: the persisted
    member head equals k_core over all edges — including a batch that
    cascades old nodes INTO the core — and a whole-source replay is a
    no-op per table."""
    import time

    from etl_job_applify_spark.operators.kcore import k_core
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_kcore_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    # b0: K4 on 1-4 plus the 4-5-6-2/5-2 tail (3-core = K4 only);
    # b1: 6-4 cascades 5 AND 6 into the 3-core
    b0 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
          (4, 5), (5, 6), (6, 2), (5, 2)]
    b1 = [(6, 4)]
    for i, rows in enumerate([b0, b1]):
        if i:
            time.sleep(1.1)
        spark.createDataFrame(rows, "a long, b long").coalesce(
            1
        ).write.parquet(str(src_dir / f"b{i}.parquet"))

    def run():
        stream = (
            spark.readStream.schema("a long, b long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*.parquet")
        )
        run_kcore_stream(stream, state, k=3)

    run()
    got = sorted(
        r["node"] for r in read_table(spark, state + "/core").collect()
    )
    alle = spark.createDataFrame(sorted(set(b0 + b1)), "a long, b long")
    want = sorted(r["node"] for r in k_core(alle, 3).collect())
    assert got == want == [1, 2, 3, 4, 5, 6]

    run()  # whole-source replay
    got2 = sorted(
        r["node"] for r in read_table(spark, state + "/core").collect()
    )
    assert got2 == got


def test_streaming_triangles_crash_between_folds_replays_clean(
    spark, tmp_path
):
    """The crash window the epoch-tag design exists for: epoch 1's EDGE
    fold committed (rows tagged first_epoch=1) but the COUNTS fold was
    lost. On redelivery the edge fold finds its fence and skips; the
    counts merge derives its batch as `first_epoch == 1` from the
    already-committed head — final counts equal the crash-free run."""
    import time

    import pyspark.sql.functions as F

    from etl_job_applify_spark.operators.triangles import triangle_stats
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_triangle_stream
    from etl_job_applify_spark.streaming.jobs import _fold_with_fence

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "a long, b long"
    )
    b1 = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4)], "a long, b long"
    )
    b0.coalesce(1).write.parquet(str(src_dir / "b0.parquet"))
    time.sleep(1.1)
    b1.coalesce(1).write.parquet(str(src_dir / "b1.parquet"))

    # crash simulation: both EDGE epochs committed (with the stream's
    # writer id and first-delivery tags), only epoch 0's COUNTS fold
    def tag(df, e):
        return df.withColumn(
            "first_epoch", F.lit(e).cast("bigint")
        )

    _fold_with_fence(
        spark, state + "/edges", "tri_edges", 0, lambda base: tag(b0, 0)
    )
    _fold_with_fence(
        spark, state + "/edges", "tri_edges", 1,
        lambda base: base.unionByName(
            tag(b1, 1).join(base.select("a", "b"), ["a", "b"], "left_anti")
        ),
    )
    st0 = triangle_stats(b0)
    _fold_with_fence(
        spark, state + "/counts", "tri", 0,
        lambda base: spark.createDataFrame(
            [(st0.n_edges, st0.n_triangles, st0.n_wedges)],
            "n_edges bigint, n_triangles bigint, n_wedges bigint",
        ),
    )

    stream = (
        spark.readStream.schema("a long, b long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*.parquet")
    )
    run_triangle_stream(stream, state)
    got = read_table(spark, state + "/counts").first()
    want = triangle_stats(b0.unionByName(b1))
    assert (
        got["n_edges"], got["n_triangles"], got["n_wedges"]
    ) == (want.n_edges, want.n_triangles, want.n_wedges)
    assert got["n_triangles"] == 4  # K4


def _rand_undirected(seed, n_nodes=36, n_draws=260):
    import random as _r

    rng = _r.Random(seed)
    return sorted({
        (min(a, b), max(a, b))
        for _ in range(n_draws)
        for a, b in [(rng.randint(1, n_nodes), rng.randint(1, n_nodes))]
        if a != b
    })


def test_triangle_delete_update_equals_recompute(spark):
    """Decremental twin: counts after removing a batch must equal the
    one-shot kernel on the remaining edges (both methods); removing a
    non-edge is a no-op; a wrong prior raises."""
    import pytest as _pt

    from etl_job_applify_spark.operators.triangles import (
        TriangleCounts,
        triangle_delete_update,
        triangle_stats,
    )

    edges = _rand_undirected(5)
    rm = [e for e in edges if (e[0] + e[1]) % 3 == 0]
    remain = [e for e in edges if (e[0] + e[1]) % 3 != 0]
    df = spark.createDataFrame(edges, "a long, b long")
    rm_df = spark.createDataFrame(rm, "a long, b long")
    rem_df = spark.createDataFrame(remain, "a long, b long")
    full = triangle_stats(df)
    prior = TriangleCounts(full.n_edges, full.n_triangles, full.n_wedges)
    want = triangle_stats(rem_df)
    want_t = TriangleCounts(want.n_edges, want.n_triangles, want.n_wedges)
    for m in ("intersect", "wedge"):
        assert triangle_delete_update(df, rm_df, prior, method=m) == want_t
    noop = spark.createDataFrame([(900, 901)], "a long, b long")
    assert triangle_delete_update(df, noop, prior) == prior
    with _pt.raises(ValueError, match="contract"):
        triangle_delete_update(
            df, rm_df, TriangleCounts(prior.n_edges - 1,
                                      prior.n_triangles, prior.n_wedges)
        )


def test_k_core_delete_update_equals_recompute(spark):
    """Reverse-peel cascade: membership after removing a batch must
    equal k_core on the remaining edges, including cascading drops and
    nodes that lose every core neighbor."""
    from etl_job_applify_spark.operators.kcore import (
        k_core,
        k_core_delete_update,
    )

    for seed, K in ((11, 3), (12, 4), (13, 3)):
        edges = _rand_undirected(seed, n_nodes=30, n_draws=170)
        rm = [e for e in edges if (e[0] * 7 + e[1]) % 4 == 0]
        remain = [e for e in edges if (e[0] * 7 + e[1]) % 4 != 0]
        old_df = spark.createDataFrame(edges, "a long, b long")
        rm_df = spark.createDataFrame(rm, "a long, b long")
        rem_df = spark.createDataFrame(remain, "a long, b long")
        C = k_core(old_df, K)
        got = sorted(
            r["node"]
            for r in k_core_delete_update(rem_df, rm_df, C, K).collect()
        )
        want = sorted(r["node"] for r in k_core(rem_df, K).collect())
        assert got == want, (seed, K)


def test_cc_delete_update_equals_recompute(spark):
    """Affected-component relabel: labels after removing a batch must
    equal the one-shot kernel over the remaining edges — splits land,
    untouched components copy through, vanished nodes drop."""
    from etl_job_applify_spark.operators.components import (
        cc_delete_update,
        connected_components,
    )

    for seed in (3, 4):
        edges = _rand_undirected(seed, n_nodes=60, n_draws=70)
        rm = [e for e in edges if (e[0] + 3 * e[1]) % 5 == 0]
        remain = [e for e in edges if (e[0] + 3 * e[1]) % 5 != 0]
        old_df = spark.createDataFrame(edges, "a long, b long")
        labels = connected_components(old_df)
        got = sorted(
            (r["node"], r["component"])
            for r in cc_delete_update(
                spark.createDataFrame(remain, "a long, b long"),
                spark.createDataFrame(rm, "a long, b long"),
                labels,
            ).collect()
        )
        want = sorted(
            (r["node"], r["component"])
            for r in connected_components(
                spark.createDataFrame(remain, "a long, b long")
            ).collect()
        )
        assert got == want, seed


def test_scc_delete_update_equals_recompute(spark):
    """Per-affected-SCC recompute: labels after removing a directed
    batch must equal the one-shot FB kernel over the remaining edges —
    splits, singleton demotions, and vanished nodes all land."""
    import random as _r

    from etl_job_applify_spark.operators.scc import (
        scc_delete_update,
        strongly_connected_components,
    )

    for seed in (17, 18):
        rng = _r.Random(seed)
        edges = sorted({
            (rng.randint(1, 25), rng.randint(1, 25)) for _ in range(90)
        })
        edges = [(a, b) for a, b in edges if a != b]
        rm = [e for e in edges if (2 * e[0] + e[1]) % 4 == 0]
        remain = [e for e in edges if (2 * e[0] + e[1]) % 4 != 0]
        labels = strongly_connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        )
        got = sorted(
            (r["node"], r["scc"])
            for r in scc_delete_update(
                spark.createDataFrame(remain, "src long, dst long"),
                spark.createDataFrame(rm, "src long, dst long"),
                labels,
            ).collect()
        )
        want = sorted(
            (r["node"], r["scc"])
            for r in strongly_connected_components(
                spark.createDataFrame(remain, "src long, dst long")
            ).collect()
        )
        assert got == want, seed


def test_streaming_graph_cdc_parity_and_replay(spark, tmp_path):
    """CDC mode on the undirected graph streams (op_col): batches mix
    edge adds and deletes; after every run the persisted state equals
    the one-shot kernel over the LIVE edge set (delete+re-add across
    epochs resurrects; delete wins within a batch), and a whole-source
    replay is a no-op. Covers components, k-core, and triangle-count
    streams over the same feed."""
    import time

    from etl_job_applify_spark.operators.components import (
        connected_components,
    )
    from etl_job_applify_spark.operators.kcore import k_core
    from etl_job_applify_spark.operators.triangles import triangle_stats
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import (
        run_components_stream,
        run_kcore_stream,
        run_triangle_stream,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    # b0: K4 on 1-4 plus tail 4-5, 5-6; b1: deletes 3-4 (breaks the
    # K4), adds 6-2 and 5-2, re-adds 1-2 (no-op), and in-batch
    # add+delete of 9-10 (delete wins — never lands)
    b0 = [(1, 2, "add"), (1, 3, "add"), (1, 4, "add"), (2, 3, "add"),
          (2, 4, "add"), (3, 4, "add"), (4, 5, "add"), (5, 6, "add")]
    b1 = [(3, 4, "delete"), (6, 2, "add"), (5, 2, "add"),
          (1, 2, "add"), (9, 10, "add"), (9, 10, "delete")]
    for i, rows in enumerate([b0, b1]):
        if i:
            time.sleep(1.1)
        spark.createDataFrame(rows, "a long, b long, op string") \
            .coalesce(1).write.parquet(str(src_dir / f"b{i}.parquet"))

    live = sorted(
        (set((a, b) for a, b, _ in b0)
         | {(6, 2), (5, 2)}) - {(3, 4)}
    )
    live_df = spark.createDataFrame(live, "a long, b long")

    def run(fn, state, **kw):
        stream = (
            spark.readStream.schema("a long, b long, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*.parquet")
        )
        fn(stream, state, op_col="op", **kw)

    cc_state = str(tmp_path / "cc")
    run(run_components_stream, cc_state)
    got_cc = sorted(
        (r["node"], r["component"])
        for r in read_table(spark, cc_state + "/labels").collect()
    )
    want_cc = sorted(
        (r["node"], r["component"])
        for r in connected_components(live_df).collect()
    )
    assert got_cc == want_cc
    assert all(n not in (9, 10) for n, _ in got_cc)

    kc_state = str(tmp_path / "kc")
    run(run_kcore_stream, kc_state, k=3)
    got_core = sorted(
        r["node"] for r in read_table(spark, kc_state + "/core").collect()
    )
    want_core = sorted(r["node"] for r in k_core(live_df, 3).collect())
    assert got_core == want_core

    tri_state = str(tmp_path / "tri")
    run(run_triangle_stream, tri_state)
    row = read_table(spark, tri_state + "/counts").first()
    st = triangle_stats(live_df)
    assert (row["n_edges"], row["n_triangles"], row["n_wedges"]) == (
        st.n_edges, st.n_triangles, st.n_wedges
    )

    # whole-source replay: every table no-ops
    run(run_components_stream, cc_state)
    run(run_kcore_stream, kc_state, k=3)
    run(run_triangle_stream, tri_state)
    assert sorted(
        (r["node"], r["component"])
        for r in read_table(spark, cc_state + "/labels").collect()
    ) == got_cc
    assert sorted(
        r["node"] for r in read_table(spark, kc_state + "/core").collect()
    ) == got_core
    row2 = read_table(spark, tri_state + "/counts").first()
    assert tuple(row2) == tuple(row)


def test_assume_canonical_debug_guard(spark, monkeypatch):
    """SPARK_GRAFT_DEBUG_CANONICAL=1 arms a per-row (a < b) assertion
    under assume_canonical — a violated promise raises instead of
    silently overcounting degrees; with the flag off (default), the
    same input is taken on faith (documented knob semantics)."""
    import pytest

    from etl_job_applify_spark.operators.kcore import k_core

    ok = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "a bigint, b bigint"
    )
    bad = spark.createDataFrame(
        [(1, 2), (3, 1), (2, 3)], "a bigint, b bigint"  # (3,1) misordered
    )
    monkeypatch.setenv("SPARK_GRAFT_DEBUG_CANONICAL", "1")
    assert k_core(ok, 2, assume_canonical=True).count() == 3
    with pytest.raises(Exception, match="assume_canonical violated"):
        k_core(bad, 2, assume_canonical=True).count()
    monkeypatch.delenv("SPARK_GRAFT_DEBUG_CANONICAL")
    # flag off: the promise is taken on faith (no raise)
    k_core(bad, 2, assume_canonical=True).count()
