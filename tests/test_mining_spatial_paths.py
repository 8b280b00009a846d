"""Unit tests for the round-8 operators: grid radius join, sorted-
neighborhood dedup, BFS/walk kernels, and the mining queries'
hand-checkable semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# --- grid_radius_join ------------------------------------------------------


def _brute_pairs(spark, left_pts, right_pts, r):
    out = set()
    for li, (lx, ly) in enumerate(left_pts):
        for ri, (rx, ry) in enumerate(right_pts):
            if (lx - rx) ** 2 + (ly - ry) ** 2 <= r * r:
                out.add((li, ri))
    return out


def test_grid_radius_join_equals_brute_force(spark):
    """Grid blocking must be a pure optimization: same pair set as the
    cross product, including exact-boundary distances and pairs that
    straddle cell borders."""
    from etl_job_applify_spark.operators.spatial import grid_radius_join

    left_pts = [
        (0.0, 0.0),
        (1.99, 0.0),     # cell neighbor, inside r=2
        (2.0, 0.0),      # exactly r away from origin — boundary included
        (3.9, 3.9),
        (50.0, 50.0),
        (49.0, 51.0),
        (97.0, 97.0),
    ]
    right_pts = [
        (0.0, 0.0),
        (4.0, 0.0),      # exactly 2.0 from (2,0) across a cell border
        (2.1, 3.9),
        (51.5, 49.5),
        (98.5, 98.4),
    ]
    left = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(left_pts)], "lid int, x double, y double"
    )
    right = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(right_pts)], "rid int, x double, y double"
    )
    got = {
        (r.lid, r.rid)
        for r in grid_radius_join(left, right, radius=2.0).collect()
    }
    assert got == _brute_pairs(spark, left_pts, right_pts, 2.0)


def test_grid_radius_join_no_duplicate_candidates(spark):
    """Each qualifying pair must appear exactly once (the 9 build-side
    replicas carry distinct cells)."""
    from etl_job_applify_spark.operators.spatial import grid_radius_join

    left = spark.createDataFrame([(1, 5.0, 5.0)], "lid int, x double, y double")
    right = spark.createDataFrame([(1, 5.5, 5.5)], "rid int, x double, y double")
    rows = grid_radius_join(left, right, radius=2.0).collect()
    assert len(rows) == 1


# --- snm_candidate_pairs ---------------------------------------------------


def test_snm_multi_pass_recovers_prefix_disagreement(spark):
    """Two near-dup records whose FIRST key disagrees in its first chars
    (different block) must still pair through the second pass key."""
    from etl_job_applify_spark.dedup.snm import snm_candidate_pairs

    rows = [
        # ids 1/2: same-length first words differ (pass-1 blocks 'aa' vs
        # 'zz' can never see them together) but the tail aligns from
        # char 9 on, so the offset-21 pass-2 keys are identical
        (1, "aardvark apple banana cherry date elderberry fig grape"),
        (2, "zzzzzzzz apple banana cherry date elderberry fig grape"),
        # filler rows in distinct blocks
        (3, "mango melon kiwi lime papaya"),
        (4, "nectar orange peach plum quince"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cand = snm_candidate_pairs(
        df,
        "doc_id",
        ["substring(text, 1, 40)", "substring(text, 21, 40)"],
        window=2,
        block_len=2,
    )
    pairs = {(r.a, r.b) for r in cand.collect()}
    assert (1, 2) in pairs


def test_snm_candidate_fanout_is_linear(spark):
    """Candidate count ≤ n × window × n_passes — the linear-fanout
    guarantee that distinguishes SNM from posting-join blocking."""
    from etl_job_applify_spark.dedup.snm import snm_candidate_pairs
    from etl_job_applify_spark.queries._util import tbl

    docs = tbl(spark, SF_SMOKE, "documents")
    n = docs.count()
    cand = snm_candidate_pairs(
        docs,
        "doc_id",
        ["substring(text, 1, 40)", "substring(text, 21, 40)"],
        window=4,
        block_len=2,
    )
    assert cand.count() <= n * 4 * 2


def test_snm_verified_pairs_subset_of_exhaustive_jaccard(spark):
    """Every pair q219 verifies must appear in the exhaustive q31-style
    pair set with the SAME jaccard (SNM changes candidate generation,
    never scoring), and recall on the fixture's planted near-dups must
    clear a floor."""
    from etl_job_applify_spark.queries.mining import q219_snm_dedup
    from etl_job_applify_spark.dedup import ngram_jaccard_pairs
    from etl_job_applify_spark.queries._util import tbl

    snm = {
        (r.a, r.b): r.jaccard
        for r in q219_snm_dedup(spark, SF_SMOKE).collect()
    }
    # uncapped exhaustive set = ground truth at smoke scale
    full = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(
            tbl(spark, SF_SMOKE, "documents"), threshold=0.5,
            max_doc_freq=None,
        ).select("a", "b", "jaccard").collect()
    }
    assert set(snm) <= set(full)
    for k, v in snm.items():
        assert v == pytest.approx(full[k], abs=1e-12)
    # multi-pass SNM should recover a solid share of true near-dups here
    assert len(snm) >= 0.5 * len(full)


# --- bfs_hops / deterministic_walks ---------------------------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def test_bfs_hops_path_graph(spark):
    """Path 1-2-3-4-5 from node 1: hop k reaches exactly node k+1."""
    from etl_job_applify_spark.operators.paths import bfs_hops, undirect

    edges = undirect(_edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    src = spark.createDataFrame([(1,)], "node bigint")
    got = {
        (r.node, r.hop) for r in bfs_hops(edges, src, max_hops=3).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2), (4, 3)}


def test_bfs_hops_star_graph(spark):
    """Star centered on 0: every leaf is hop 1, nothing at hop 2."""
    from etl_job_applify_spark.operators.paths import bfs_hops, undirect

    edges = undirect(_edges_df(spark, [(0, i) for i in range(1, 6)]))
    src = spark.createDataFrame([(0,)], "node bigint")
    rows = bfs_hops(edges, src, max_hops=2).collect()
    by_hop = {}
    for r in rows:
        by_hop.setdefault(r.hop, set()).add(r.node)
    assert by_hop[0] == {0}
    assert by_hop[1] == {1, 2, 3, 4, 5}
    assert 2 not in by_hop


def test_walks_follow_edges_and_are_partition_invariant(spark):
    """Every consecutive (step, step+1) pair must be a graph edge, and
    the walk must be identical under a different input partitioning
    (the determinism contract that makes walks reproducible training
    data)."""
    from etl_job_applify_spark.operators.paths import (
        deterministic_walks,
        undirect,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4), (4, 5)]
    edges = undirect(_edges_df(spark, pairs))
    starts = spark.createDataFrame([(1,), (4,)], "node bigint")

    def run(e):
        return sorted(
            (r.walk_id, r.step, r.node)
            for r in deterministic_walks(e, starts, n_steps=3).collect()
        )

    w1 = run(edges)
    w2 = run(edges.repartition(7))
    assert w1 == w2
    edge_set = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    walks = {}
    for wid, step, node in w1:
        walks.setdefault(wid, {})[step] = node
    for wid, steps in walks.items():
        assert steps[0] == wid
        for s in range(3):
            assert (steps[s], steps[s + 1]) in edge_set


# --- mining query semantics ------------------------------------------------


def test_association_rules_hand_checked(spark, tmp_path):
    """Three-basket toy: {x,y}, {x,y}, {x} → conf(x→y)=2/3, conf(y→x)=1,
    lift = 3·2/(3·2) = 1 for x→y and 2·3/(2·3)=... hand-derived below."""
    # build a miniature sf_dir with just lineitem + part
    import pyspark.sql.functions as F  # noqa: F811

    li = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101), (2, 102), (3, 101)],
        "l_orderkey bigint, l_partkey bigint",
    )
    pt = spark.createDataFrame(
        [(101, "BX"), (102, "BY")], "p_partkey bigint, p_brand string"
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    pt.write.parquet(str(tmp_path / "part.parquet"))

    from etl_job_applify_spark.queries.mining import q215_association_rules

    rows = {
        (r.antecedent, r.consequent): r
        for r in q215_association_rules(spark, str(tmp_path)).collect()
    }
    # n=3 baskets; BX in 3, BY in 2, pair in 2
    assert rows[("BX", "BY")].pair_cnt == 2
    assert rows[("BX", "BY")].confidence == pytest.approx(2 / 3)
    assert rows[("BX", "BY")].lift == pytest.approx(2 * 3 / (3 * 2))
    assert rows[("BY", "BX")].confidence == pytest.approx(1.0)


def test_ks_statistic_identical_and_disjoint(spark, tmp_path):
    """Identical distributions → D = 0; disjoint supports → D = 1."""
    from etl_job_applify_spark.queries.mining import q217_ks_statistic

    same = [(i, "F" if i % 2 == 0 else "O", float(v)) for i, v in
            enumerate([10, 10, 20, 20, 30, 30, 40, 40])]
    df = spark.createDataFrame(
        [(i, g, v) for i, g, v in same],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    df.write.parquet(str(tmp_path / "same" / "orders.parquet"))
    got = q217_ks_statistic(spark, str(tmp_path / "same")).collect()[0]
    assert got.d_stat == pytest.approx(0.0)

    disj = [(0, "F", 1.0), (1, "F", 2.0), (2, "O", 100.0), (3, "O", 200.0)]
    df2 = spark.createDataFrame(
        disj, "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )
    df2.write.parquet(str(tmp_path / "disj" / "orders.parquet"))
    got2 = q217_ks_statistic(spark, str(tmp_path / "disj")).collect()[0]
    assert got2.d_stat == pytest.approx(1.0)
    assert (got2.n_f, got2.n_o) == (2, 2)


def test_drift_bins_identical_splits_zero_contrib(spark, tmp_path):
    """A split that mirrors itself exactly must report zero drift in
    every bin."""
    from etl_job_applify_spark.queries.mining import q216_drift_bins

    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for v in [10.0, 60.0, 110.0, 480.0, 499.0]:
        for uid in (0, 1):  # same values on both sides of user_id % 2
            rows.append((eid, uid, v, ts))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, value double, ts timestamp"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = q216_drift_bins(spark, str(tmp_path)).collect()
    assert out, "expected occupied bins"
    for r in out:
        assert r.cnt_a == r.cnt_b
        assert r.drift_contrib == pytest.approx(0.0)


# --- streaming drift view ----------------------------------------------------


def test_streaming_drift_view_matches_batch_query(spark, tmp_path):
    """Fold the events fixture through the exactly-once rollup stream in
    micro-batches; the drift readout over the maintained view must be
    BIT-identical to the batch q216 over the same rows (both evaluate
    drift_from_counts), and a replayed epoch must be a no-op."""
    from etl_job_applify_spark.queries.mining import (
        DRIFT_BIN_EXPR,
        DRIFT_SPLIT_EXPR,
        q216_drift_bins,
    )
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.sinks import read_table
    from etl_job_applify_spark.streaming.jobs import (
        drift_view_readout,
        fold_rollup_batch,
    )

    # stage a streamable copy of the fixture's (user_id, value) columns
    src = tmp_path / "drift_src"
    tbl(spark, SF_SMOKE, "events").select("user_id", "value").coalesce(
        1
    ).write.parquet(str(src))
    view = str(tmp_path / "drift_view")
    keys = ["bin", "s"]

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .select(
            F.expr(DRIFT_BIN_EXPR).alias("bin"),
            F.expr(DRIFT_SPLIT_EXPR).alias("s"),
        )
    )
    q = stream.writeStream.foreachBatch(
        lambda df, eid: fold_rollup_batch(df, eid, view, keys, {})
    ).option("checkpointLocation", str(tmp_path / "cp")).start()
    q.processAllAvailable()
    q.stop()

    got = {
        r.bin: (r.cnt_a, r.cnt_b, r.p_a, r.p_b, r.drift_contrib)
        for r in drift_view_readout(read_table(spark, view)).collect()
    }
    want = {
        r.bin: (r.cnt_a, r.cnt_b, r.p_a, r.p_b, r.drift_contrib)
        for r in q216_drift_bins(spark, SF_SMOKE).collect()
    }
    assert got == want  # exact, including the double formula bits

    # replaying epoch 0 must not advance the view
    replay = spark.createDataFrame([(0, 0)], "bin int, s bigint")
    assert fold_rollup_batch(replay, 0, view, keys, {}) is False
    got2 = {
        r.bin: (r.cnt_a, r.cnt_b, r.p_a, r.p_b, r.drift_contrib)
        for r in drift_view_readout(read_table(spark, view)).collect()
    }
    assert got2 == want


# --- WAND-style pruned BM25 top-k -------------------------------------------


def test_pruned_topk_equals_exhaustive_and_prunes(spark):
    """The pruned kernel must return exactly the exhaustive top-k (the
    lossless contract) while actually shrinking the exact-scoring
    candidate set on a fat query."""
    from pyspark.sql import Window

    from etl_job_applify_spark.functions.retrieval import (
        bm25_scores,
        bm25_topk_pruned,
        doc_tokens,
    )
    from etl_job_applify_spark.queries._util import tbl

    docs = tbl(spark, SF_SMOKE, "documents").select("doc_id", "text")
    qterms = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "window"), (2, "sort"), (2, "merge")],
        "qid int, word string",
    )
    toks = doc_tokens(docs)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    pruned = {
        (r.qid, r.doc_id, r.rnk, r.score)
        for r in bm25_topk_pruned(
            tf, dl, dfreq, stats, qterms, k=5
        ).collect()
    }
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    exhaustive = {
        (r.qid, r.doc_id, r.rnk, r.score)
        for r in bm25_scores(docs, qterms)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    assert pruned == exhaustive

    # the threshold must actually prune: fewer docs reach exact scoring
    # than match any query term (the fixture vocabulary is common, so
    # matches are nearly corpus-sized while top-5 survivors are not)
    n_matching = (
        tf.join(qterms, "word").select("qid", "doc_id").distinct().count()
    )
    scored_rows = bm25_scores(docs, qterms).count()
    assert scored_rows == n_matching  # sanity: exhaustive scores all
    assert len(pruned) == 10  # 2 queries x top-5


def test_pruned_topk_fewer_seeds_than_k(spark):
    """A query whose rarest-term posting has fewer than k docs gets no
    threshold and must fall back to exhaustive scoring unpruned."""
    from etl_job_applify_spark.functions.retrieval import (
        bm25_scores,
        bm25_topk_pruned,
        doc_tokens,
    )
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma alpha beta")],
        "doc_id bigint, text string",
    )
    qterms = spark.createDataFrame(
        [(1, "alpha"), (1, "gamma")], "qid int, word string"
    )
    toks = doc_tokens(docs)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    got = {
        (r.qid, r.doc_id, r.rnk)
        for r in bm25_topk_pruned(tf, dl, dfreq, stats, qterms, k=5).collect()
    }
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    want = {
        (r.qid, r.doc_id, r.rnk)
        for r in bm25_scores(docs, qterms)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    assert got == want and len(got) == 3


# --- resumable iterative rounds ---------------------------------------------


def _lpa_setup(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "a bigint, b bigint",
    )
    und = edges.select(
        F.col("a").alias("v"), F.col("b").alias("u")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("u")))

    def init():
        return und.select("v").distinct().select("v", F.col("v").alias("lbl"))

    def step(labels):
        from pyspark.sql.window import Window

        w = Window.partitionBy("v").orderBy(F.desc("cnt"), "lbl")
        nbr = und.join(
            labels.select(F.col("v").alias("u"), "lbl"), "u"
        ).select("v", "lbl")
        counts = nbr.groupBy("v", "lbl").agg(F.count("*").alias("cnt"))
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "lbl")
        )

    return init, step


def test_resumable_rounds_resume_equals_one_shot(spark, tmp_path):
    """Running 2 rounds, then resuming to 4, must produce exactly the
    state of an uninterrupted 4-round run; re-running a finished job is
    a pure read (no new snapshot)."""
    from etl_job_applify_spark.operators.resumable import (
        completed_rounds,
        run_resumable_rounds,
    )
    from etl_job_applify_spark.sinks.versioned import list_versions

    init, step = _lpa_setup(spark)

    split = str(tmp_path / "split")
    run_resumable_rounds(spark, split, init, step, n_rounds=2)
    assert completed_rounds(spark, split) == 2
    got = {
        (r.v, r.lbl)
        for r in run_resumable_rounds(
            spark, split, init, step, n_rounds=4
        ).collect()
    }
    assert completed_rounds(spark, split) == 4

    oneshot = str(tmp_path / "oneshot")
    want = {
        (r.v, r.lbl)
        for r in run_resumable_rounds(
            spark, oneshot, init, step, n_rounds=4
        ).collect()
    }
    assert got == want

    # finished job: same result, no new version committed
    before = list_versions(spark, split)[-1]
    again = {
        (r.v, r.lbl)
        for r in run_resumable_rounds(
            spark, split, init, step, n_rounds=4
        ).collect()
    }
    assert again == got
    assert list_versions(spark, split)[-1] == before


# --- duration-capped sessionization -----------------------------------------


def test_capped_sessions_hand_example(spark):
    """Events every 20 min, gap 30 min, cap 60 min: the gap never
    triggers, the cap splits after every 4th event (strictly-greater
    boundary: the event AT 60 min stays in its session)."""
    import datetime

    from etl_job_applify_spark.operators.sessionize import capped_sessions

    rows = [
        (1, i, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=20 * i))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts timestamp")
    out = capped_sessions(
        df, ["user_id"], "ts", 1800, 3600, order_tiebreak=["event_id"]
    )
    got = sorted((r.event_id, r.session_id) for r in out.collect())
    assert got == [(0, 1), (1, 1), (2, 1), (3, 1), (4, 2), (5, 2),
                   (6, 2), (7, 2), (8, 3), (9, 3)]


def test_capped_sessions_cap_actually_bites_on_fixture(spark):
    """On the fixture, the duration cap must create strictly more
    sessions than pure-gap sessionization with the same gap — otherwise
    q226 would silently degenerate to q52's semantics."""
    from etl_job_applify_spark.operators.sessionize import (
        capped_sessions,
        sessionize,
    )
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.queries.temporal import (
        _Q226_CAP_S,
        _Q226_GAP_S,
    )

    events = tbl(spark, SF_SMOKE, "events").select("user_id", "event_id", "ts")
    capped = capped_sessions(
        events, ["user_id"], "ts", _Q226_GAP_S, _Q226_CAP_S,
        order_tiebreak=["event_id"],
    ).select("user_id", "session_id").distinct().count()
    gap_only = sessionize(
        events, ["user_id"], "ts", _Q226_GAP_S,
        order_tiebreak=["event_id"],
    ).select("user_id", "session_id").distinct().count()
    assert capped > gap_only


def test_round8_input_guards(spark):
    """Invalid-argument guards fail loudly instead of returning wrong or
    empty results silently."""
    import pytest as _pytest

    from etl_job_applify_spark.dedup.snm import snm_candidate_pairs
    from etl_job_applify_spark.operators.spatial import grid_radius_join

    pts = spark.createDataFrame([(1, 1.0, 1.0)], "i int, x double, y double")
    with _pytest.raises(ValueError, match="radius"):
        grid_radius_join(pts, pts, radius=0.0)
    with _pytest.raises(ValueError, match="radius"):
        grid_radius_join(pts, pts, radius=-1.5)

    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with _pytest.raises(ValueError, match="window"):
        snm_candidate_pairs(docs, "doc_id", ["text"], window=0)
    with _pytest.raises(ValueError, match="key expression"):
        snm_candidate_pairs(docs, "doc_id", [], window=2)


def test_capped_sessions_rejects_null_ts(spark):
    import datetime

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError  # noqa: F401

    from etl_job_applify_spark.operators.sessionize import capped_sessions

    df = spark.createDataFrame(
        [(1, 1, datetime.datetime(2024, 1, 1)), (1, 2, None)],
        "user_id bigint, event_id bigint, ts timestamp",
    )
    out = capped_sessions(df, ["user_id"], "ts", 10, 20)
    with _pytest.raises(Exception, match="null ts"):
        out.collect()


def test_snm_duplicate_ids_emit_no_self_pairs(spark):
    """Duplicate ids in the input (a re-crawled doc landing twice in one
    batch) must not surface as degenerate (id, id) candidates — lead()
    pairs the twin rows and least/greatest would collapse them."""
    from etl_job_applify_spark.dedup.snm import snm_candidate_pairs

    rows = [
        (1, "apple banana cherry date elderberry"),
        (1, "apple banana cherry date elderberry"),
        (2, "apple banana cherry date elderflower"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cand = snm_candidate_pairs(
        df, "doc_id", ["substring(text, 1, 40)"], window=2, block_len=2
    )
    pairs = {(r.a, r.b) for r in cand.collect()}
    assert (1, 1) not in pairs
    assert (1, 2) in pairs


def test_scc_fixed_cases(spark):
    """SCC kernel (operators/scc.py): cycles collapse, chains and
    trimmed singletons stay trivial, self-loops are their own SCC, and
    the undirected components kernel would disagree everywhere a
    one-way edge exists (the reason the directed twin exists)."""
    from etl_job_applify_spark.operators import (
        connected_components,
        strongly_connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 4), (6, 1), (7, 7)],
        "src long, dst long",
    )
    got = sorted(
        map(tuple, strongly_connected_components(edges).collect())
    )
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6), (7, 7)
    ]
    # the undirected kernel sees one giant component 1-6: directedness
    # is the entire difference
    und = connected_components(edges, src="src", dst="dst")
    assert und.filter("component = 1").count() == 6
    # two disjoint 2-cycles + a bridge: bridge endpoints stay separate
    edges2 = spark.createDataFrame(
        [(10, 11), (11, 10), (12, 13), (13, 12), (11, 12)],
        "src long, dst long",
    )
    got2 = sorted(
        map(tuple, strongly_connected_components(edges2).collect())
    )
    assert got2 == [(10, 10), (11, 10), (12, 12), (13, 12)]
    # empty edges -> empty result
    empty = spark.createDataFrame([], "src long, dst long")
    assert strongly_connected_components(empty).count() == 0


def test_weighted_sssp_known_graph(spark):
    """Bellman-Ford rounds: known distances on a weighted digraph; the
    hop horizon is semantic — a cheaper path with more legs than the
    horizon must NOT win until the horizon admits it."""
    from etl_job_applify_spark.operators.paths import weighted_sssp

    # 1->2 (10), 1->3 (1), 3->4 (1), 4->2 (1): cheapest 1->2 is 3 via
    # three legs; the direct edge costs 10 in one leg
    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 4, 1), (4, 2, 1)],
        "src long, dst long, w long",
    )
    source = spark.createDataFrame([(1,)], "node long")

    def dists(h):
        return {
            r["node"]: r["cost"]
            for r in weighted_sssp(edges, source, max_rounds=h).collect()
        }

    assert dists(1) == {1: 0, 2: 10, 3: 1}
    assert dists(2) == {1: 0, 2: 10, 3: 1, 4: 2}
    assert dists(3) == {1: 0, 2: 3, 3: 1, 4: 2}
    assert dists(9) == {1: 0, 2: 3, 3: 1, 4: 2}  # early-stop fixpoint


def test_weighted_sssp_passthrough_materialize(spark):
    """The convergence check must not depend on materialize truncating
    lineage: with a PASS-THROUGH materialize (identity — the relaxed
    relation keeps dist in its lineage) the early-stop flag still
    derives from fresh aggregate attributes, so results and the
    fixpoint are identical to the localCheckpoint default."""
    from etl_job_applify_spark.operators.paths import weighted_sssp

    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 4, 1), (4, 2, 1)],
        "src long, dst long, w long",
    )
    source = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in weighted_sssp(
            edges, source, max_rounds=9, materialize=lambda df: df
        ).collect()
    }
    assert got == {1: 0, 2: 3, 3: 1, 4: 2}


def test_scc_many_disconnected_small_sccs_parallel(spark):
    """The many-small-SCCs stress shape the sequential pivot peel could
    not meet: 200 disconnected 2-cycles decompose via the WCC partition
    init in ONE pivot phase (max_phases=3 would need 200 under a
    one-SCC-per-phase peel)."""
    from etl_job_applify_spark.operators.scc import (
        strongly_connected_components,
    )

    rows = []
    for i in range(200):
        a, b = 2 * i, 2 * i + 1
        rows += [(a, b), (b, a)]
    edges = spark.createDataFrame(rows, "src long, dst long").coalesce(1)
    got = {
        (r["node"], r["scc"])
        for r in strongly_connected_components(
            edges, max_phases=3
        ).collect()
    }
    want = set()
    for i in range(200):
        want |= {(2 * i, 2 * i), (2 * i + 1, 2 * i)}
    assert got == want


def test_scc_chain_of_sccs_splits_logarithmically(spark):
    """A directed chain of 12 2-cycles (bridged one-way) is ONE weak
    component, so the WCC init cannot parallelize it — the three-way
    split with hash pivots must: parts multiply each phase, so
    max_phases=8 suffices where the sequential peel needs 12."""
    from etl_job_applify_spark.operators.scc import (
        strongly_connected_components,
    )

    rows = []
    for i in range(12):
        a, b = 2 * i, 2 * i + 1
        rows += [(a, b), (b, a)]
        if i:
            rows.append((2 * (i - 1) + 1, a))  # one-way bridge
    edges = spark.createDataFrame(rows, "src long, dst long").coalesce(1)
    got = {
        (r["node"], r["scc"])
        for r in strongly_connected_components(
            edges, max_phases=8
        ).collect()
    }
    want = set()
    for i in range(12):
        want |= {(2 * i, 2 * i), (2 * i + 1, 2 * i)}
    assert got == want


def test_scc_bfs_budget_exhaustion_raises(spark):
    """An exhausted reachability budget with a non-empty frontier must
    RAISE, never return a partial reach (which would silently split the
    long cycle into several scc labels)."""
    import pytest as _pytest

    from etl_job_applify_spark.operators.scc import (
        strongly_connected_components,
    )

    n = 12
    rows = [(i, (i + 1) % n) for i in range(n)]
    edges = spark.createDataFrame(rows, "src long, dst long").coalesce(1)
    with _pytest.raises(RuntimeError, match="BFS rounds"):
        strongly_connected_components(
            edges, max_bfs_rounds=3, max_wcc_iter=32
        )
    got = {
        (r["node"], r["scc"])
        for r in strongly_connected_components(
            edges, max_bfs_rounds=16, max_wcc_iter=32
        ).collect()
    }
    assert got == {(i, 0) for i in range(n)}


def _sssp_graph(spark):
    # 1->2 (10), 1->3 (1), 3->4 (1), 4->2 (1): cheapest 1->2 is 3 via
    # three legs; plus 2->5 (1) to give the cascade a downstream node
    return spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 4, 1), (4, 2, 1), (2, 5, 1)],
        "src long, dst long, w long",
    )


def test_sssp_profile_levels_match_weighted_sssp(spark):
    """sssp_profile: every h level equals weighted_sssp at that
    horizon — the profile IS the per-round Bellman-Ford trajectory."""
    from etl_job_applify_spark.operators.paths import (
        sssp_profile,
        weighted_sssp,
    )

    edges = _sssp_graph(spark)
    source = spark.createDataFrame([(1,)], "node long")
    prof = sssp_profile(edges, source, horizon=4)
    for h in range(5):
        level = {
            r["node"]: r["cost"]
            for r in prof.filter(F.col("h") == h).collect()
        }
        want = {
            r["node"]: r["cost"]
            for r in weighted_sssp(edges, source, max_rounds=h).collect()
        }
        assert level == want, h


def test_sssp_profile_update_equals_recompute(spark):
    """Incremental maintenance: updating the old-edge profile with a
    batch of new edges is bit-identical to recomputing the profile
    over the union — including a new cheap lane that SHORTENS existing
    costs and cascades downstream, and a no-op batch."""
    from etl_job_applify_spark.operators.paths import (
        sssp_profile,
        sssp_profile_update,
    )

    all_edges = _sssp_graph(spark)
    # batch 2 carries the cheap detour (3->4, 4->2) that rewrites the
    # 1->2 cost from 10 to 3 and cascades to 5
    old = all_edges.filter(~F.expr("(src = 3) or (src = 4)"))
    new = all_edges.filter(F.expr("(src = 3) or (src = 4)"))
    source = spark.createDataFrame([(1,)], "node long")
    base = sssp_profile(old, source, horizon=4)
    got = sssp_profile_update(all_edges, new, base, source, horizon=4)
    want = sssp_profile(all_edges, source, horizon=4)
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(got) == as_set(want)
    # no-op batch: re-delivering already-known edges changes nothing
    again = sssp_profile_update(
        all_edges, new, got, source, horizon=4
    )
    assert as_set(again) == as_set(want)


def test_streaming_sssp_batch_parity(spark, tmp_path):
    """run_sssp_stream over time-split edge batches: the persisted
    profile head equals the one-shot batch kernel over the full edge
    set — streamed incremental ≡ batch, the q223 property extended to
    weighted paths."""
    import time

    from etl_job_applify_spark.operators.paths import weighted_sssp
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_sssp_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    all_edges = _sssp_graph(spark)
    all_edges.filter(~F.expr("(src = 3) or (src = 4)")).coalesce(
        1
    ).write.parquet(str(src_dir / "b0.parquet"))
    time.sleep(1.1)
    all_edges.filter(F.expr("(src = 3) or (src = 4)")).coalesce(
        1
    ).write.parquet(str(src_dir / "b1.parquet"))

    stream = (
        spark.readStream.schema("src long, dst long, w long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*.parquet")
    )
    run_sssp_stream(stream, state, source_nodes=[1], horizon=4)

    prof = read_table(spark, state + "/profile")
    got = {
        r["node"]: r["cost"]
        for r in prof.filter(F.col("h") == 4).collect()
    }
    source = spark.createDataFrame([(1,)], "node long")
    want = {
        r["node"]: r["cost"]
        for r in weighted_sssp(all_edges, source, max_rounds=4).collect()
    }
    assert got == want == {1: 0, 2: 3, 3: 1, 4: 2, 5: 4}


def test_streaming_sssp_replay_invariance(spark, tmp_path):
    """Re-running the SSSP stream over the same source re-delivers
    every epoch; the per-table fences must leave the persisted edge
    set and horizon profile bit-identical."""
    import time

    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_sssp_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    all_edges = _sssp_graph(spark)
    all_edges.filter("src <> 3 and src <> 4").coalesce(1).write.parquet(
        str(src_dir / "b0.parquet")
    )
    time.sleep(1.1)
    all_edges.filter("src = 3 or src = 4").coalesce(1).write.parquet(
        str(src_dir / "b1.parquet")
    )

    def run():
        stream = (
            spark.readStream.schema("src long, dst long, w long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*.parquet")
        )
        run_sssp_stream(stream, state, source_nodes=[1], horizon=4)

    run()
    prof1 = sorted(
        tuple(r) for r in read_table(spark, state + "/profile").collect()
    )
    run()
    prof2 = sorted(
        tuple(r) for r in read_table(spark, state + "/profile").collect()
    )
    assert prof1 == prof2
    final = {(n, c) for n, h, c in prof2 if h == 4}
    assert final == {(1, 0), (2, 3), (3, 1), (4, 2), (5, 4)}


def test_streaming_sssp_crash_between_folds_replays_clean(spark, tmp_path):
    """The documented crash window: the batch's EDGE fold committed but
    the PROFILE fold did not (simulated by pre-folding the epoch-1
    edges with the stream's writer id before the stream runs). On
    delivery the edge fold finds its fence and skips; the profile fold
    proceeds against the already-committed edge head — final state
    equals the crash-free run."""
    import time

    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_sssp_stream
    from etl_job_applify_spark.streaming.jobs import _fold_with_fence

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    all_edges = _sssp_graph(spark)
    b0 = all_edges.filter("src <> 3 and src <> 4")
    b1 = all_edges.filter("src = 3 or src = 4")
    b0.coalesce(1).write.parquet(str(src_dir / "b0.parquet"))
    time.sleep(1.1)
    b1.coalesce(1).write.parquet(str(src_dir / "b1.parquet"))

    # crash simulation: epoch 0 fully committed, epoch 1's EDGE fold
    # committed, profile fold lost. Pre-commit both edge epochs with
    # the stream's writer id; commit only epoch 0's profile.
    from etl_job_applify_spark.operators.paths import sssp_profile

    source = spark.createDataFrame([(1,)], "node long")
    _fold_with_fence(
        spark, state + "/edges", "sssp_edges", 0, lambda base: b0
    )
    _fold_with_fence(
        spark, state + "/edges", "sssp_edges", 1,
        lambda base: base.unionByName(b1).distinct(),
    )
    _fold_with_fence(
        spark, state + "/profile", "sssp", 0,
        lambda base: sssp_profile(b0, source, 4),
    )

    def run():
        stream = (
            spark.readStream.schema("src long, dst long, w long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*.parquet")
        )
        run_sssp_stream(stream, state, source_nodes=[1], horizon=4)

    run()  # replay: epoch 0 skips both; epoch 1 skips edges, folds profile
    prof = read_table(spark, state + "/profile")
    final = {
        (r["node"], r["cost"])
        for r in prof.filter("h = 4").collect()
    }
    assert final == {(1, 0), (2, 3), (3, 1), (4, 2), (5, 4)}


def test_scc_update_equals_recompute(spark):
    """Incremental SCC (operators/scc.py scc_update): insert-only
    batches relabel to EXACTLY the from-scratch answer — chain-of-SCCs
    merges, fresh nodes, intra-SCC no-ops, and duplicate batch edges."""
    from etl_job_applify_spark.operators.scc import (
        scc_update,
        strongly_connected_components,
    )

    # cycle {1,2,3} -> 4 -> cycle {5,6}; batch closes 6->1 (merging the
    # whole condensation path) and adds a fresh disconnected edge
    old = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5)],
        "src long, dst long",
    )
    batch = spark.createDataFrame(
        [(6, 1), (10, 11)], "src long, dst long"
    )
    alle = old.unionByName(batch)
    base = strongly_connected_components(old)
    got = sorted(map(tuple, scc_update(alle, batch, base).collect()))
    want = sorted(
        map(tuple, strongly_connected_components(alle).collect())
    )
    assert got == want
    assert (6, 1) in set(got) and (4, 1) in set(got)  # path merged

    # intra-SCC batch is a no-op (returns the same labels)
    intra = spark.createDataFrame([(2, 1)], "src long, dst long")
    got2 = sorted(
        map(
            tuple,
            scc_update(old.unionByName(intra), intra, base).collect(),
        )
    )
    assert got2 == sorted(map(tuple, base.collect()))

    # a DAG batch edge (no new cycle) must merge nothing
    dag = spark.createDataFrame([(1, 10), (10, 11)], "src long, dst long")
    alle3 = old.unionByName(dag)
    got3 = sorted(map(tuple, scc_update(alle3, dag, base).collect()))
    want3 = sorted(
        map(tuple, strongly_connected_components(alle3).collect())
    )
    assert got3 == want3

    # duplicate batch edges (already present in old) are harmless
    dup = spark.createDataFrame(
        [(6, 1), (6, 1), (3, 4)], "src long, dst long"
    )
    alle4 = old.unionByName(dup)
    got4 = sorted(map(tuple, scc_update(alle4, dup, base).collect()))
    want4 = sorted(
        map(tuple, strongly_connected_components(alle4).collect())
    )
    assert got4 == want4


def test_scc_update_randomized_parity(spark):
    """Seeded random digraphs, random time-splits: incremental ≡
    recompute on every draw (the cc_update discipline applied to the
    directed kernel)."""
    import random

    from etl_job_applify_spark.operators.scc import (
        scc_update,
        strongly_connected_components,
    )

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n = 14
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(40)
                if True
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        rng.shuffle(edges)
        cut = len(edges) * 2 // 3
        old_e, new_e = edges[:cut], edges[cut:]
        if not old_e or not new_e:
            continue
        old = spark.createDataFrame(old_e, "src long, dst long")
        batch = spark.createDataFrame(new_e, "src long, dst long")
        alle = spark.createDataFrame(edges, "src long, dst long")
        base = strongly_connected_components(old)
        got = sorted(
            map(tuple, scc_update(alle, batch, base).collect())
        )
        want = sorted(
            map(tuple, strongly_connected_components(alle).collect())
        )
        assert got == want, f"seed {seed}: {got} != {want}"


def test_streaming_scc_batch_parity_and_replay(spark, tmp_path):
    """run_scc_stream over time-split directed edge batches: the
    persisted label head equals the one-shot kernel over all edges,
    and a full redelivery (fresh query, same source) leaves both
    persisted tables bit-identical — the epoch fence makes replay a
    no-op per table."""
    import time

    from etl_job_applify_spark.operators.scc import (
        strongly_connected_components,
    )
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_scc_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    b0 = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5)]
    b1 = [(6, 1), (20, 21)]
    spark.createDataFrame(b0, "src long, dst long").coalesce(1).write.parquet(
        str(src_dir / "b0.parquet")
    )
    time.sleep(1.1)
    spark.createDataFrame(b1, "src long, dst long").coalesce(1).write.parquet(
        str(src_dir / "b1.parquet")
    )

    def run():
        stream = (
            spark.readStream.schema("src long, dst long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*.parquet")
        )
        run_scc_stream(stream, state)

    run()
    labels1 = sorted(
        tuple(r) for r in read_table(spark, state + "/labels").collect()
    )
    edges1 = sorted(
        tuple(r) for r in read_table(spark, state + "/edges").collect()
    )
    allp = spark.createDataFrame(b0 + b1, "src long, dst long")
    want = sorted(
        map(tuple, strongly_connected_components(allp).collect())
    )
    assert labels1 == want
    assert (6, 1) in set(labels1)  # the late edge merged the path
    run()  # full redelivery: epochs 0 and 1 again
    labels2 = sorted(
        tuple(r) for r in read_table(spark, state + "/labels").collect()
    )
    edges2 = sorted(
        tuple(r) for r in read_table(spark, state + "/edges").collect()
    )
    assert labels1 == labels2
    assert edges1 == edges2


def test_scc_update_maintained_condensation_parity(spark):
    """The Θ(change) steady state: carrying the condensation forward
    across a batch SEQUENCE (condensed=..., return_condensed=True)
    yields, after every batch, labels identical to the from-scratch
    kernel AND a condensation identical to deriving it fresh from the
    full edge relation."""
    import random

    from etl_job_applify_spark.operators.scc import (
        scc_condense,
        scc_update,
        strongly_connected_components,
    )

    rng = random.Random(41)
    n = 12
    edges = [
        (u, v)
        for u, v in sorted(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(36)}
        )
        if u != v
    ]
    rng.shuffle(edges)
    cuts = [len(edges) // 3, 2 * len(edges) // 3, len(edges)]
    founding = edges[: cuts[0]]
    old = spark.createDataFrame(founding, "src long, dst long")
    lab = strongly_connected_components(old)
    cond = scc_condense(old, lab)
    seen = list(founding)
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        batch_e = edges[lo:hi]
        seen = seen + batch_e
        alle = spark.createDataFrame(seen, "src long, dst long")
        batch = spark.createDataFrame(batch_e, "src long, dst long")
        lab, cond = scc_update(
            alle, batch, lab, condensed=cond, return_condensed=True
        )
        want_lab = sorted(
            map(tuple, strongly_connected_components(alle).collect())
        )
        assert sorted(map(tuple, lab.collect())) == want_lab
        want_cond = sorted(
            map(tuple, scc_condense(alle, lab).collect())
        )
        assert sorted(map(tuple, cond.collect())) == want_cond


def test_streaming_scc_crash_between_folds_replays_clean(spark, tmp_path):
    """The documented crash window: epoch 1's EDGE fold committed but
    the LABEL fold did not. On redelivery the edge fold finds its
    fence and skips; the label fold proceeds against the committed
    edge head — final state equals the crash-free run."""
    import time

    from etl_job_applify_spark.operators.scc import (
        strongly_connected_components,
    )
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_scc_stream
    from etl_job_applify_spark.streaming.jobs import _fold_with_fence

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    b0 = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5)]
    b1 = [(6, 1), (20, 21)]
    df0 = spark.createDataFrame(b0, "src long, dst long")
    df1 = spark.createDataFrame(b1, "src long, dst long")
    df0.coalesce(1).write.parquet(str(src_dir / "b0.parquet"))
    time.sleep(1.1)
    df1.coalesce(1).write.parquet(str(src_dir / "b1.parquet"))

    # crash simulation: epoch 0 fully committed; epoch 1's edge fold
    # committed, label fold lost.
    _fold_with_fence(spark, state + "/edges", "scc_edges", 0,
                     lambda base: df0)
    _fold_with_fence(spark, state + "/edges", "scc_edges", 1,
                     lambda base: base.unionByName(df1).distinct())
    _fold_with_fence(
        spark, state + "/labels", "scc", 0,
        lambda base: strongly_connected_components(df0),
    )

    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*.parquet")
    )
    run_scc_stream(stream, state)
    got = sorted(
        tuple(r) for r in read_table(spark, state + "/labels").collect()
    )
    allp = spark.createDataFrame(b0 + b1, "src long, dst long")
    want = sorted(
        map(tuple, strongly_connected_components(allp).collect())
    )
    assert got == want


def test_streaming_scc_cdc_parity_replay_and_resurrect(spark, tmp_path):
    """run_scc_stream(op_col=...): directed CDC batches — a delete
    splits an SCC (the delete kernel re-decomposes only that SCC), a
    later re-add of the same edge RESURRECTS it and re-merges, and a
    whole-source replay is a no-op. After every run the labels equal
    the one-shot FB kernel over the live edges."""
    import time

    from etl_job_applify_spark.operators.scc import (
        strongly_connected_components,
    )
    from etl_job_applify_spark.sinks.versioned import read_table
    from etl_job_applify_spark.streaming import run_scc_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    # b0: 3-cycle 1→2→3→1 plus tail 3→4; b1: delete 2→3 (splits the
    # SCC into singletons), add 4→5; b2: re-add 2→3 (re-merges 1,2,3)
    b0 = [(1, 2, "add"), (2, 3, "add"), (3, 1, "add"), (3, 4, "add")]
    b1 = [(2, 3, "delete"), (4, 5, "add")]
    b2 = [(2, 3, "add")]
    for i, rows in enumerate([b0, b1, b2]):
        if i:
            time.sleep(1.1)
        spark.createDataFrame(rows, "src long, dst long, op string") \
            .coalesce(1).write.parquet(str(src_dir / f"b{i}.parquet"))

    state = str(tmp_path / "scc")

    def run():
        stream = (
            spark.readStream.schema("src long, dst long, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*.parquet")
        )
        run_scc_stream(stream, state, op_col="op")

    run()
    live = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], "src long, dst long"
    )
    got = sorted(
        (r["node"], r["scc"])
        for r in read_table(spark, state + "/labels").collect()
    )
    want = sorted(
        (r["node"], r["scc"])
        for r in strongly_connected_components(live).collect()
    )
    assert got == want
    assert dict(got)[2] == 1 and dict(got)[3] == 1  # re-merged SCC

    run()  # whole-source replay: no-op
    assert sorted(
        (r["node"], r["scc"])
        for r in read_table(spark, state + "/labels").collect()
    ) == got


def test_scc_delete_update_maintained_condensation_parity(spark):
    """scc_delete_update(condensed=..., return_condensed=True): the
    carried condensation survives DELETE batches — splits re-route
    affected cond edges through the new labels, a pair that lost one
    supporting inter-SCC edge survives iff other support remains, and
    the result equals scc_condense over the remaining edges. Also the
    aff-empty path (inter-SCC removals only): memberships unchanged,
    condensation still thins correctly."""
    import random as _r

    from etl_job_applify_spark.operators.scc import (
        scc_condense,
        scc_delete_update,
        strongly_connected_components,
    )

    for seed in (17, 21):
        rng = _r.Random(seed)
        edges = sorted({
            (rng.randint(1, 25), rng.randint(1, 25)) for _ in range(90)
        })
        edges = [(a, b) for a, b in edges if a != b]
        rm = [e for e in edges if (2 * e[0] + e[1]) % 4 == 0]
        remain = [e for e in edges if (2 * e[0] + e[1]) % 4 != 0]
        old_df = spark.createDataFrame(edges, "src long, dst long")
        labels = strongly_connected_components(old_df)
        cond0 = scc_condense(old_df, labels)
        rem_df = spark.createDataFrame(remain, "src long, dst long")
        lab2, cond2 = scc_delete_update(
            rem_df,
            spark.createDataFrame(rm, "src long, dst long"),
            labels, condensed=cond0, return_condensed=True,
        )
        want_lab = strongly_connected_components(rem_df)
        assert sorted(
            (r["node"], r["scc"]) for r in lab2.collect()
        ) == sorted((r["node"], r["scc"]) for r in want_lab.collect())
        assert sorted(
            (r["cu"], r["cv"]) for r in cond2.collect()
        ) == sorted(
            (r["cu"], r["cv"])
            for r in scc_condense(rem_df, want_lab, "src", "dst").collect()
        )

    # inter-SCC-only removal: 1↔2 is an SCC, two parallel routes to 3;
    # removing ONE of them keeps the cond edge, removing the other
    # drops it — memberships never change (aff-empty path)
    e0 = [(1, 2), (2, 1), (1, 3), (2, 3), (3, 4)]
    df0 = spark.createDataFrame(e0, "src long, dst long")
    lab = strongly_connected_components(df0)
    cond = scc_condense(df0, lab)
    rem1 = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4)], "src long, dst long"
    )
    lab1, cond1 = scc_delete_update(
        rem1, spark.createDataFrame([(1, 3)], "src long, dst long"),
        lab, condensed=cond, return_condensed=True,
    )
    assert sorted((r["cu"], r["cv"]) for r in cond1.collect()) == [
        (1, 3), (3, 4)
    ]  # other support keeps the pair
    rem2 = spark.createDataFrame([(1, 2), (2, 1), (3, 4)],
                                 "src long, dst long")
    lab2b, cond2b = scc_delete_update(
        rem2, spark.createDataFrame([(2, 3)], "src long, dst long"),
        lab1, condensed=cond1, return_condensed=True,
    )
    assert sorted((r["cu"], r["cv"]) for r in cond2b.collect()) == [
        (3, 4)
    ]  # last support gone -> pair dropped; memberships unchanged
    assert sorted(
        (r["node"], r["scc"]) for r in lab2b.collect()
    ) == sorted((r["node"], r["scc"]) for r in lab1.collect())
