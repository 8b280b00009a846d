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
]
# q235_hybrid_rrf_indexed is deliberately NOT a headline entry: the
# registered query builds BOTH persisted indexes inside itself (the
# gate needs self-contained lifecycles), so its wall time is ~80% index
# BUILD — an amortized one-time cost misread as per-query serving cost.
# The serve-side split is measured in BENCHNOTES round 10.

#: measured passes per query. Single-run snapshots kept recording ±20%
#: machine-noise swings as phantom regressions (BENCHNOTES round-4/5);
#: the official number is now the per-query MEDIAN of RUNS passes.
RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark_session("bench")
    qs = registry.queries()

    # warm every headline plan once at the small SF so JVM/codegen/JIT
    # startup isn't billed to the measured runs (steady-state numbers are
    # what a long-running cluster job sees); fall back to the bench dir
    # when the small fixture isn't present on this host
    warm_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    # RUNS full passes, interleaved by pass (not back-to-back per query,
    # so a transient machine-load spike dents one PASS, not one query's
    # entire sample); per-query median is the reported number
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(RUNS):
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)

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
