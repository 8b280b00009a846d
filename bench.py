"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end into the noop sink (full plan runs, nothing
materializes on the driver) — the honest way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_job_applify_spark import queries as registry
from etl_job_applify_spark.session import get_spark_session
from etl_job_applify_spark.sources.local import local_relation
from etl_job_applify_spark.functions.rrf import rrf_fused

#: headline set: one per operator family (scan/agg, multiway join, window,
#: top-k, JSON, fuzzy dedup, ANN, text, temporal windows, sessionization;
#: round 2 added the TPC-H Q7 join shape and two corpus-curation ops —
#: totals across rounds therefore cover MORE work, compare per-query)
HEADLINE = [
    "q01_pricing_summary",
    "q04_multiway_join",
    "q13_window_rank",
    "q16_topk",
    "q22_json_extract",
    "q31_ngram_jaccard",
    "q34_cosine_topk",
    "q43_fingerprints",
    "q50_tumbling_window",
    "q52_sessions",
    "q108_nation_volume",
    "q117_gopher_rules",
    "q120_rare_word_score",
    # round 5: semantic dedup (SemDeDup shape) and exact span dedup —
    # the two corpus-curation ops added this round
    "q146_semantic_dedup",
    "q147_span_dedup",
    # round 5 continuation: the graph kernel (wedge-join triangle
    # counting) and the time-series resample path
    "q167_triangle_count",
    "q162_resample_interpolate",
    # round 6: the scale-safe Doulion approximate triangle twin (the
    # entry a 100 TB graph runs; q167's exact kernel stays for parity)
    "q188_triangle_approx",
    # round 7: retrieval served from the persisted inverted index
    # (build + probe, the steady-state serving shape) and the full
    # coreness histogram (ascending-threshold peel)
    "q194_bm25_index_probe",
    "q197_coreness",
    # round 7 continuation: tokenizer training (6 relational merge
    # rounds over the weighted vocabulary) and label-propagation
    # communities over the thresholded co-purchase graph
    "q203_bpe_merges",
    "q205_lpa_communities",
    # round 8: BFS hop profile (Pregel-superstep shape), Apriori
    # association rules, and multi-pass sorted-neighborhood dedup —
    # the round's heavier operators
    "q213_bfs_hops",
    "q215_association_rules",
    "q219_snm_dedup",
    # round 15: the weighted-quantile scale twin (portable sample +
    # exact integer kernel + in-query rank-error bound) and the
    # mixture→packing trainer hand-off (budgeted selection composed
    # with bucketed-cumsum packing); the delete-side and BFS steady
    # states ride the INCREMENTAL update-only entries
    "q279_sampled_weighted_percentiles",
    "q281_mixture_packing",
]
# q235_hybrid_rrf_indexed is deliberately NOT a headline entry: the
# registered query builds BOTH persisted indexes inside itself (the
# gate needs self-contained lifecycles), so its wall time is ~80% index
# BUILD — an amortized one-time cost misread as per-query serving cost.
# Instead, round 11 adds SERVE-ONLY twins (below): the indexes are
# built once in bench setup (untimed, like a production ingest job) and
# the measured entries are the probe-only paths — the steady-state
# serving numbers. q194_bm25_index_probe stays for cross-round
# comparability; its serve-only twin q194_bm25_serve_only isolates the
# probe.
SERVE_ONLY = [
    "q194_bm25_serve_only",
    "q235_hybrid_rrf_serve_only",
    # round 12: the PQ serving path (ADC shortlist + exact refine) —
    # added when the refine fetch was re-pointed at the probe-pruned
    # cells scan, so the steady-state cost of the compressed path is a
    # measured headline number rather than a q234-gate inference
    "q234_pq_serve_only",
    # round 12: the faceted hybrid (where= on BOTH index legs, q246's
    # shape) — the filtered-serving premium over q235 measured directly
    "q246_faceted_serve_only",
]


def _build_serve_indexes(spark, sf_dir: str, idx_root: str):
    """One-time (untimed) index builds + the serve-only callables.
    Mirrors q194's probe and q235's fusion exactly, but against
    PRE-BUILT indexes — the steady-state serving shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_job_applify_spark.functions.text_index import (
        text_index_bm25,
        text_index_build,
    )
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.queries.textops import _Q190_QUERIES
    from etl_job_applify_spark.similarity import (
        vector_index_build,
        vector_index_probe,
    )

    def _lang(col):
        return F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col(col) % 3 + 1).cast("int"),
        ).alias("lang")

    # lang meta cols ride both indexes so the faceted twin can filter;
    # the unfiltered twins are unaffected (meta cols are additive)
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "text", _lang("doc_id")
    )
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _lang("vec_id")
    )
    tpath, vpath = f"{idx_root}/text", f"{idx_root}/vec"
    text_index_build(docs, tpath, layout="flat", meta_cols=["lang"])
    # m=8 trains PQ codebooks at founding so the same index serves both
    # the exact-cosine probe (q235's leg) and the ADC use_codes path
    # (q234's serve-only twin)
    vector_index_build(
        emb, vpath, num_cells=16, m=8, k_codes=32, meta_cols=["lang"]
    )
    qterms_rows = [(qid, w) for qid, ws in _Q190_QUERIES for w in ws]
    anchor_ids = [qid for qid, _ in _Q190_QUERIES]

    def q194_serve(spark_, _sf_dir):
        qterms = local_relation(spark_, qterms_rows, "qid int, word string")
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            text_index_bm25(spark_, tpath, qterms)
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("qid", "doc_id", "rnk", "score")
        )

    def q235_serve(spark_, sf_dir_):
        K_TOP, LEG_L = 10, 20
        qterms = local_relation(spark_, qterms_rows, "qid int, word string")
        anchors = tbl(spark_, sf_dir_, "embeddings").filter(
            F.col("vec_id").isin(anchor_ids)
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        w_lex = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        lex = (
            text_index_bm25(spark_, tpath, qterms)
            .withColumn("lex_rank", F.row_number().over(w_lex))
            .filter(F.col("lex_rank") <= LEG_L)
            .select("qid", "doc_id", "lex_rank")
        )
        vec = vector_index_probe(
            spark_, vpath, anchors, k=LEG_L, nprobe=999
        ).select(
            F.col("query_id").cast("int").alias("qid"),
            F.col("neighbor").alias("doc_id"),
            F.col("rank").cast("int").alias("vec_rank"),
        )
        fused = rrf_fused(lex, vec)  # union+agg == full-outer (functions/rrf.py)
        w_f = Window.partitionBy("qid").orderBy(
            F.desc("rrf_score"), F.asc("doc_id")
        )
        return (
            fused.withColumn("rrf_rank", F.row_number().over(w_f))
            .filter(F.col("rrf_rank") <= K_TOP)
            .select("qid", "doc_id", "rrf_rank", "rrf_score",
                    "lex_rank", "vec_rank")
        )

    def q234_serve(spark_, sf_dir_):
        anchors = tbl(spark_, sf_dir_, "embeddings").filter(
            F.col("vec_id").isin(anchor_ids)
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        return vector_index_probe(
            spark_, vpath, anchors, k=10, nprobe=4,
            use_codes=True, shortlist=64,
        )

    def q246_serve(spark_, sf_dir_):
        K_TOP, LEG_L = 10, 20
        qterms = local_relation(spark_, qterms_rows, "qid int, word string")
        anchors = tbl(spark_, sf_dir_, "embeddings").filter(
            F.col("vec_id").isin(anchor_ids)
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        w_lex = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        lex = (
            text_index_bm25(spark_, tpath, qterms, where="lang = 'en'")
            .withColumn("lex_rank", F.row_number().over(w_lex))
            .filter(F.col("lex_rank") <= LEG_L)
            .select("qid", "doc_id", "lex_rank")
        )
        vec = vector_index_probe(
            spark_, vpath, anchors, k=LEG_L, nprobe=999,
            where="lang = 'en'",
        ).select(
            F.col("query_id").cast("int").alias("qid"),
            F.col("neighbor").alias("doc_id"),
            F.col("rank").cast("int").alias("vec_rank"),
        )
        fused = rrf_fused(lex, vec)  # union+agg == full-outer (functions/rrf.py)
        w_f = Window.partitionBy("qid").orderBy(
            F.desc("rrf_score"), F.asc("doc_id")
        )
        return (
            fused.withColumn("rrf_rank", F.row_number().over(w_f))
            .filter(F.col("rrf_rank") <= K_TOP)
            .select("qid", "doc_id", "rrf_rank", "rrf_score",
                    "lex_rank", "vec_rank")
        )

    return {
        "q194_bm25_serve_only": q194_serve,
        "q235_hybrid_rrf_serve_only": q235_serve,
        "q234_pq_serve_only": q234_serve,
        "q246_faceted_serve_only": q246_serve,
    }


#: round 14: steady-state incremental graph maintenance — the gate
#: queries (q258/q259) time-split the graph IN HALF so the oracle can
#: replay them, which makes their wall time mostly the founding
#: recompute; these twins measure what the 100 TB steady state
#: actually pays per batch: prior state is computed once in setup
#: (untimed, like the index builds above) and the measured entry is
#: the UPDATE against a ~1.6% deterministic edge batch.
INCREMENTAL = [
    "q258_triangle_update_only",
    "q259_kcore_update_only",
    "q280_bfs_update_only",
    "q274_triangle_delete_only",
]


def _build_incremental_state(spark, sf_dir: str):
    """Untimed prior state for the incremental twins: the co-purchase
    graph is split by a deterministic edge hash (~1/64 = the batch);
    counts/core over the remainder are the stored steady state."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.operators.kcore import k_core, k_core_update
    from etl_job_applify_spark.operators.triangles import (
        TriangleCounts,
        triangle_stats,
        triangle_update,
    )
    from etl_job_applify_spark.queries.graphmatch import _copurchase_pairs

    from etl_job_applify_spark.operators.paths import (
        sssp_profile,
        sssp_profile_update,
        undirect,
    )
    from etl_job_applify_spark.operators.triangles import (
        triangle_delete_update,
    )

    pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint()
    is_batch = F.pmod(F.xxhash64("a", "b"), F.lit(64)) == 0
    batch = pairs.filter(is_batch).localCheckpoint()
    old = pairs.filter(~is_batch).localCheckpoint()
    st = triangle_stats(old)
    prior = TriangleCounts(st.n_edges, st.n_triangles, st.n_wedges)
    core = k_core(old, 3, assume_canonical=True).localCheckpoint()
    # BFS steady state: the stored unit-weight horizon profile (q280)
    unit = F.lit(1).cast("bigint")
    source = pairs.agg(F.min("a").alias("node")).localCheckpoint()
    prof = sssp_profile(
        undirect(old).withColumn("w", unit), source, 4
    ).localCheckpoint()
    # delete steady state: counts over the FULL graph, batch removed
    st_full = triangle_stats(pairs)
    prior_full = TriangleCounts(
        st_full.n_edges, st_full.n_triangles, st_full.n_wedges
    )

    def tri_update(spark_, _sf_dir):
        got = triangle_update(pairs, batch, prior, assume_canonical=True)
        return local_relation(spark_, 
            [tuple(got)],
            "n_edges bigint, n_triangles bigint, n_wedges bigint",
        )

    def kcore_update(spark_, _sf_dir):
        return k_core_update(pairs, batch, core, 3, assume_canonical=True)

    def bfs_update(spark_, _sf_dir):
        out = sssp_profile_update(
            undirect(pairs).withColumn("w", unit),
            undirect(batch).withColumn("w", unit),
            prof, source, 4,
        )
        return out.filter(F.col("h") == 4).groupBy(
            F.col("cost").cast("int").alias("hop")
        ).agg(F.count("*").alias("n_nodes"))

    def tri_delete(spark_, _sf_dir):
        got = triangle_delete_update(
            pairs, batch, prior_full, assume_canonical=True
        )
        return local_relation(spark_, 
            [tuple(got)],
            "n_edges bigint, n_triangles bigint, n_wedges bigint",
        )

    return {
        "q258_triangle_update_only": tri_update,
        "q259_kcore_update_only": kcore_update,
        "q280_bfs_update_only": bfs_update,
        "q274_triangle_delete_only": tri_delete,
    }

#: measured passes per query. Single-run snapshots kept recording ±20%
#: machine-noise swings as phantom regressions (BENCHNOTES round-4/5);
#: the official number is now the per-query MEDIAN of RUNS passes.
RUNS = 3


def _sentinel(spark, sf_dir: str) -> float:
    """Fixed-cost load sentinel: one tiny-table parquet scan + count —
    workload-independent, so its wall time measures MACHINE conditions
    (scheduler load, page cache, JVM pressure), not the engine. One
    sample is taken per measurement pass and reported in the JSON
    (``sentinel`` median + per-pass samples): a bench artifact whose
    sentinel runs hot relative to other rounds identifies a hot leg
    from the artifact itself, without re-running noise studies
    (BENCHNOTES round-12 adjudication; VERDICT r12 next-item 6)."""
    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark_session("bench")
    qs = dict(registry.queries())

    # serve-only twins: build the persisted indexes ONCE at the bench SF
    # (untimed setup — the production ingest job), measure the probes
    import shutil
    import tempfile

    idx_root = tempfile.mkdtemp(prefix="bench_idx_")
    try:
        qs.update(_build_serve_indexes(spark, sf_dir, idx_root))
        qs.update(_build_incremental_state(spark, sf_dir))
        measured = HEADLINE + SERVE_ONLY + INCREMENTAL

        # warm every headline plan once at the small SF so JVM/codegen/
        # JIT startup isn't billed to the measured runs (steady-state
        # numbers are what a long-running cluster job sees); fall back
        # to the bench dir when the small fixture isn't present on this
        # host. The serve-only twins warm at the BENCH dir — their
        # indexes are built there.
        warm_dir = "/root/testdata/sf0.01"
        if not os.path.isdir(warm_dir):
            warm_dir = sf_dir
        for name in HEADLINE:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        for name in SERVE_ONLY + INCREMENTAL:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        # RUNS full passes, interleaved by pass (not back-to-back per
        # query, so a transient machine-load spike dents one PASS, not
        # one query's entire sample); per-query median is the reported
        # number
        samples: dict[str, list[float]] = {name: [] for name in measured}
        _sentinel(spark, sf_dir)  # warm the sentinel plan, like the rest
        sentinel_samples: list[float] = []
        for _ in range(RUNS):
            sentinel_samples.append(_sentinel(spark, sf_dir))
            for name in measured:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[name].append(time.perf_counter() - t0)
    finally:
        # an exception mid-measurement must not leak the temp indexes
        shutil.rmtree(idx_root, ignore_errors=True)

    times = {
        name: round(sorted(ts)[len(ts) // 2], 3)
        for name, ts in samples.items()
    }
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "runs": RUNS,
                "aggregation": "per-query median of interleaved passes",
                "sentinel": round(
                    sorted(sentinel_samples)[len(sentinel_samples) // 2], 4
                ),
                "sentinel_samples": [
                    round(t, 4) for t in sentinel_samples
                ],
                "samples": {
                    name: [round(t, 3) for t in ts]
                    for name, ts in samples.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
