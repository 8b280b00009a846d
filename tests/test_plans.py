"""Plan-shape regression tests: pushdown, broadcast, shuffle counts.

These encode the 100 TB discipline — if a change stops a filter reaching
the parquet scan or turns a broadcast join into a sort-merge join, these
fail locally instead of melting a cluster."""

from __future__ import annotations

from etl_job_applify_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    shuffle_count,
)
from etl_job_applify_spark.queries.relational import (
    q01_pricing_summary,
    q02_filter_project,
    q03_join_broadcast,
    q04_multiway_join,
)

from conftest import SF_SMOKE


def test_filters_push_into_parquet_scan(spark):
    df = q02_filter_project(spark, SF_SMOKE)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f or "l_discount" in f for f in pf), pf


def test_projection_prunes_scan_columns(spark):
    df = q02_filter_project(spark, SF_SMOKE)
    text = explain_str(df)
    # ReadSchema must not include columns the query never touches
    assert "l_comment" not in text and "l_returnflag" not in text.split("ReadSchema")[1][:400]


def test_dimension_join_broadcasts(spark):
    assert has_broadcast_join(q03_join_broadcast(spark, SF_SMOKE))
    assert has_broadcast_join(q04_multiway_join(spark, SF_SMOKE))


def test_q01_single_shuffle(spark):
    # scan → partial agg → ONE exchange → final agg (+ sort exchange)
    assert shuffle_count(q01_pricing_summary(spark, SF_SMOKE)) <= 2


def test_whole_stage_codegen_covers_agg(spark):
    df = q01_pricing_summary(spark, SF_SMOKE)
    df.collect()  # AQE shows codegen spans only in the executed (final) plan
    # '*' prefixes mark operators inside a WholeStageCodegen span
    text = explain_str(df)
    assert "* HashAggregate" in text and "* Sort" in text


def test_asof_join_is_single_shuffle(spark):
    from etl_job_applify_spark.queries.temporal import q53_asof_join

    df = q53_asof_join(spark, SF_SMOKE)
    # union + window assembly: one hash exchange on the key for the window
    # sort (+1 for the dedup window on orders) — and NO join operator at all
    text = explain_str(df, "simple")
    assert "Join" not in text or "SortMergeJoin" not in text
    assert shuffle_count(df) <= 3


def test_global_topk_uses_heap_not_sort(spark):
    from etl_job_applify_spark.queries.relational import q16_topk

    assert "TakeOrderedAndProject" in explain_str(
        q16_topk(spark, SF_SMOKE), "simple"
    )


def test_q31_shares_postings_exchange_without_cache(spark):
    """The capped jaccard path must NOT persist (a cache whose plan
    matches across invocations gets silently REUSED by CacheManager,
    which falsified repeat timings — BENCHNOTES.md round 5) and must
    instead share the postings groupBy shuffle between its two consumers
    via ReusedExchange, with the dimension-sized size relation broadcast
    into the scoring joins."""
    from etl_job_applify_spark.queries.analytics import q31_ngram_jaccard

    # other tests may legitimately cache frames whose plans overlap q31's
    # scan; CacheManager would substitute them and trip the no-cache assert
    spark.catalog.clearCache()
    df = q31_ngram_jaccard(spark, SF_SMOKE)
    df.collect()  # AQE final plan
    text = explain_str(df, "simple")
    assert "InMemoryRelation" not in text, "capped path persisted again"
    assert "ReusedExchange" in text, "postings shuffle not shared"
    assert "BroadcastHashJoin" in text, "size joins stopped broadcasting"


def test_registry_wide_plan_audit(spark):
    """Every registered query must stay on the JVM fast path:
    - no row-at-a-time Python UDFs (BatchEvalPython) anywhere;
    - Arrow-batched Python (mapInPandas/applyInPandas) only where the
      operator is deliberately Python (UDAF, multimodal);
    - cartesian products only in the explicitly gated exact-similarity
      queries.
    """
    from etl_job_applify_spark import queries as registry

    # q35/q78: LSH signature matmul is the deliberate Arrow-batched
    # exception (see similarity/lsh.py docstring — inlined literal planes
    # measured 10× slower via Catalyst compile + HOF interpretation)
    PYTHON_OK = {
        "q39_multimodal_features",
        "q57_pandas_udaf",
        "q35_ann_lsh",
        "q78_ann_recall",
        # PPM/WAV/PVS codecs run in Arrow batches by design (multimodal/)
        "q137_ppm_decode",
        "q138_ppm_resize",
        "q143_wav_decode",
        "q148_audio_frames",
        "q169_video_frames",
        "q192_image_ahash_near_dup",
        "q204_scene_cuts",
        "q221_audio_gain_near_dup",
        # duration-capped sessionization is state-dependent (no window
        # rewrite exists) — the documented applyInPandas kernel
        "q226_capped_sessions",
    }
    # q101 is the one deliberate row-at-a-time Python UDTF — it exists to
    # exercise the @udtf + LATERAL API (see queries/sketches.py) and is
    # documented as the slow path, kept off the bench
    UDTF_OK = {"q101_udtf_chunks"}
    # q78/q87 embed the gated brute-force ground truth to measure recall;
    # q99/q102 cross-join two single-row aggregate branches (1×1 BNLJ)
    # q146: cluster assignment is a K-row broadcast nested loop (every
    # vector scores all K anchors — that IS the operator, K is
    # dimension-sized by construction; see dedup/semantic.py)
    # q152: the ADC scan is deliberately every-query × m-byte-codes
    # (that IS the compressed-domain operator) + it embeds the exact
    # ground truth like q78/q87
    # q186 joins three single-row aggregate branches (1x1 BNLJ, like
    # q99/q102)
    # q184: hot_keys joins the one-row total-count aggregate back onto
    # the per-key counts (1×N broadcast BNLJ) — the fix for the
    # unpartitioned-window total that funneled the count relation
    # through one task (operators/salting.py)
    # q190: the one-row corpus stats (N, avgdl) broadcast onto the
    # scored relation, same 1-row BNLJ shape as q99/q102/q186
    # q200: both inherited shapes — the q34 cosine leg's broadcast-
    # queries crossJoin (3 anchor rows) AND the q190 stats 1-row BNLJ
    # q215/q216/q217: the 1-row global-total aggregate (basket count /
    # split totals / group sizes) broadcast onto the scored relation —
    # the same 1-row BNLJ shape as q99/q102/q186/q190
    # q168: the 1-row corpus-scalars aggregate (n_raw/n_tgt/v) broadcast
    # onto the vocabulary-sized stats relation — replaced the
    # unpartitioned-window form that funneled the vocabulary through
    # one task (same 1×N shape as q184)
    CARTESIAN_OK = {"q34_cosine_topk", "q36_embedding_near_dup",
                    "q78_ann_recall", "q87_ivf_recall",
                    "q99_sketch_rollup", "q102_theta_ops",
                    "q146_semantic_dedup", "q152_pq_recall",
                    "q153_ivfpq_recall", "q186_hll_union",
                    "q187_timeboxed_funnel", "q184_skew_join",
                    "q190_bm25_retrieval", "q200_hybrid_rrf",
                    "q215_association_rules", "q216_drift_bins",
                    "q217_ks_statistic", "q168_dsir_weights",
                    # q220 inherits q190's one-row corpus-stats BNLJ,
                    # as do the log-idf variants q230/q231
                    "q220_pruned_bm25_topk", "q230_bm25_log_idf",
                    "q231_log_idf_pruned_topk",
                    # q236: the 10-row broadcast bucket-range join (the
                    # documented fact-scale decile idiom — build side is
                    # exactly 10 rows by construction)
                    "q236_fact_scale_deciles",
                    # q255: NB scoring broadcasts the class-stats
                    # relation (rows = #classes, control-plane few by
                    # construction) across the exploded test tokens;
                    # q256 inherits q190's one-row corpus-stats BNLJ
                    # through bm25_scores; q261 inherits q255's
                    # class-stats broadcast through nb_score
                    "q255_naive_bayes", "q256_ir_metrics",
                    "q261_nb_evaluation"}
    from etl_job_applify_spark.plans import lint_errors

    offenders = []
    for name, fn in registry.queries().items():
        allow = set()
        if name in UDTF_OK:
            allow.add("row-python")
        if name in PYTHON_OK:
            allow.add("python-stage")
        if name in CARTESIAN_OK or "q08" in name:
            allow.add("cartesian")
        for f in lint_errors(fn(spark, SF_SMOKE), allow=allow):
            offenders.append((name, f.code))
    assert not offenders, offenders


def test_join_strategy_hints_are_honored(spark):
    """The engine exposes all four join-strategy hints; each must reach
    the physical plan (the knob a 100 TB job reaches for when AQE's
    choice is wrong for a known workload)."""
    from etl_job_applify_spark.queries._util import tbl

    li = tbl(spark, SF_SMOKE, "lineitem")
    orders = tbl(spark, SF_SMOKE, "orders")

    merge = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    assert "SortMergeJoin" in explain_str(merge, "simple")

    shuffle_hash = li.hint("shuffle_hash").join(
        orders, li.l_orderkey == orders.o_orderkey
    )
    assert "ShuffledHashJoin" in explain_str(shuffle_hash, "simple")

    bcast = orders.hint("broadcast").join(
        li, li.l_orderkey == orders.o_orderkey
    )
    assert "BroadcastHashJoin" in explain_str(bcast, "simple")


def test_jaccard_postings_exchange_reused(spark):
    """q31 feeds the postings relation into four plan branches; the
    persisted relation (or reused exchange) must keep that from becoming
    four full shingle recomputations."""
    from etl_job_applify_spark.queries.analytics import q31_ngram_jaccard

    df = q31_ngram_jaccard(spark, SF_SMOKE)
    df.collect()
    text = explain_str(df, "simple")
    # the cached postings appear as InMemoryTableScan branches (the
    # persist in dedup/jaccard.py); a regression would show repeated
    # full Project/Generate pipelines instead
    assert "InMemoryTableScan" in text or "ReusedExchange" in text


def test_bm25_plan_broadcasts_dimensions_no_merge_join(spark):
    """q190's only corpus-sized exchange is the token tf aggregation;
    query terms, document frequencies, and corpus stats must reach the
    score join as broadcasts (no SortMergeJoin anywhere — a regression
    would shuffle the tf relation once per dimension join)."""
    from etl_job_applify_spark.queries.textops import q190_bm25_retrieval

    text = explain_str(q190_bm25_retrieval(spark, SF_SMOKE), "simple")
    assert "SortMergeJoin" not in text
    assert text.count("BroadcastHashJoin") >= 3


def test_ivfpq_replaces_cross_join_with_cell_equi_join(spark):
    """Composing PQ inside IVF upgrades the plan shape: the pure-PQ ADC
    scan is a gated cross join, the composed index joins on the probed
    cell — no CartesianProduct / BroadcastNestedLoopJoin anywhere in
    the standalone operator's plan."""
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.queries.verification import _ann_split
    from etl_job_applify_spark.similarity import ann_topk_ivfpq

    corpus, queries = _ann_split(spark, SF_SMOKE)
    text = explain_str(
        ann_topk_ivfpq(corpus, queries, k=3, nprobe=4, shortlist=16),
        "simple",
    )
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert "BroadcastHashJoin" in text  # probed-cell equi-join broadcasts


def test_lint_plan_flags_and_clears(spark):
    """The lint API itself: a row-Python UDF and a cross join must flag
    as errors; a clean aggregation must produce no error findings."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from etl_job_applify_spark.plans import lint_errors, lint_plan
    from etl_job_applify_spark.queries._util import tbl

    orders = tbl(spark, SF_SMOKE, "orders")
    clean = orders.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    assert lint_errors(clean) == []

    slow_udf = F.udf(lambda x: x + 1, LongType())
    bad = orders.select(slow_udf("o_orderkey"))
    assert any(f.code == "row-python" for f in lint_errors(bad))

    cart = orders.limit(3).crossJoin(orders.limit(3))
    assert any(f.code == "cartesian" for f in lint_errors(cart))

    # info severity: global sort + limit that DID collapse is clean
    topk = orders.orderBy(F.desc("o_totalprice")).limit(5)
    assert all(f.code != "sort-for-limit" for f in lint_plan(topk))


def test_dynamic_partition_pruning_triggers(spark, tmp_path):
    """A partitioned fact joined to a selectively-filtered dim must scan
    only the dim-selected partitions (DPP): the fact scan's partition
    filters carry a dynamicpruning subquery. This is the optimizer
    feature that turns a 100 TB partitioned-fact star join into a
    few-partition read — pin that the engine's session defaults keep it
    ON and that it actually fires on this plan shape."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.queries._util import tbl

    fact_path = str(tmp_path / "fact_part")
    orders = tbl(spark, SF_SMOKE, "orders")
    orders.withColumn(
        "status_part", F.col("o_orderstatus")
    ).write.partitionBy("status_part").parquet(fact_path)

    dim_path = str(tmp_path / "dim_dpp")
    spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "status_part string, label string",
    ).write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    # DPP requires a SELECTIVE predicate on the dim side — that filter
    # is what the pruning subquery pushes into the fact's partition scan
    dim = spark.read.parquet(dim_path).filter(F.col("label") == "finished")
    joined = fact.join(F.broadcast(dim), "status_part").groupBy("label").agg(
        F.count("*").alias("n")
    )
    plan = explain_str(joined, "formatted")
    assert "dynamicpruning" in plan.lower(), plan


def test_runtime_bloom_filter_join_triggers(spark, tmp_path):
    """Spark's runtime bloom-filter injection (the shuffle-side row
    pre-filter for selective joins over non-partition keys) must still
    be available and fire when thresholds allow — the knob a 100 TB
    selective fact-dim join reaches for when DPP can't apply. Thresholds
    are lowered for fixture scale and restored after."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.queries._util import tbl

    # bloom injection only considers scans with runtime stats: write the
    # filtered dim and fact as files
    li = tbl(spark, SF_SMOKE, "lineitem")
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    li.write.parquet(fact_path)
    li.select("l_orderkey").distinct().limit(20).write.parquet(dim_path)

    conf = spark.conf
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    saved = {}
    for k, v in keys.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    try:
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).filter(F.col("l_orderkey") > 0)
        joined = fact.join(dim, "l_orderkey").groupBy().count()
        plan = explain_str(joined, "formatted").lower()
        assert "bloomfilter" in plan or "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_q262_selection_window_is_bucketed_not_per_domain(spark):
    """The mixing selection prefix sum must NOT run a window over the
    doc relation partitioned by the domain alone (a domain is the
    skewed key at 100 TB — one language can be 80 % of a corpus). The
    bucketed form's only doc-ordered window is keyed by
    (domain, __bkt); the domain-alone window that remains operates on
    the bucket relation (ordered by __bkt, rows = #buckets)."""
    import re

    from etl_job_applify_spark.queries.pipelineops2 import (
        q262_domain_mixing,
    )

    df = q262_domain_mixing(spark, SF_SMOKE)
    text = explain_str(df, "extended")
    specs = re.findall(
        r"windowspecdefinition\((.*?)specifiedwindowframe", text
    )
    assert specs, "no window specs found in q262 plan"
    doc_ordered = [s for s in specs if "doc_id" in s]
    assert doc_ordered, "expected a doc_id-ordered in-bucket window"
    for s in doc_ordered:
        assert "__bkt" in s, (
            "doc_id-ordered window not partitioned by bucket "
            "(per-domain single-task funnel regressed): " + s
        )
