"""Oracled property checks for the approximate operators.

The sketch/LSH operators (q32 minhash, q33 simhash, q35 ANN, q38 HLL,
q68 approx quantiles) are rows-only in the correctness gate: their raw
outputs depend on engine-specific hashing (xxhash64, HLL, GK sketches)
that has no DuckDB twin. These companions close that gap with a stronger
contract than a row count: Spark computes the approximate result AND its
exact ground truth, derives the quality property (recall, precision,
relative error), and emits it as stable scalar columns the oracle can
pin — ``n_exact``-style counts the oracle recomputes exactly, plus
boolean ``*_ok`` flags the oracle asserts as ``true``.

All inputs are deterministic (seeded hyperplanes, fixed xxhash64 seeds,
deterministic sketch merges), so each property either always holds at a
given scale factor or never does — a boolean here is a real regression
gate, not a flaky assertion. Verified to hold at sf0.001/0.01/0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation

from ._util import tbl
from ..dedup import minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_pairs
from ..similarity import (
    ann_topk_ivf,
    ann_topk_ivfpq,
    ann_topk_lsh,
    ann_topk_pq,
    cosine_topk,
)


def _recall_row(exact_pairs: DataFrame, approx_pairs: DataFrame,
                min_recall: float) -> DataFrame:
    """One row (n_exact, recall_ok): share of exact ground-truth pairs the
    approximate method recovered. Empty ground truth counts as recalled."""
    hits = approx_pairs.select("a", "b").withColumn("__hit", F.lit(1))
    joined = exact_pairs.select("a", "b").join(hits, ["a", "b"], "left")
    return joined.agg(
        F.count("*").alias("n_exact"),
        F.coalesce(
            (F.count("__hit") / F.count("*")) >= min_recall, F.lit(True)
        ).alias("recall_ok"),
    )


# --- q76: MinHash-LSH recall vs exact Jaccard ground truth ---------------
# Ground truth: exact 3-gram Jaccard >= 0.8 (the high-similarity band LSH
# must not miss: with 16 bands of 4 rows, P(candidate | j=0.8) > 0.9995).
# The q32 pipeline (same parameters) must recover >= 90% of those pairs;
# its precision is exact by construction (verify=True re-checks Jaccard).

def q76_minhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(docs, threshold=0.8)
    lsh = minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.5, verify=True,
        max_bucket_size=64,
    )
    return _recall_row(exact, lsh, min_recall=0.9)


def _jaccard_count_sql(
    n: int,
    threshold: float,
    max_doc_freq: int | None = None,
    extra_where: str = "",
) -> str:
    gram = ", ".join(f"t[i+{j}]" for j in range(n))
    prune = (
        f"""raw AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - {n - 1}, 0) + 1),
                i -> concat_ws(' ', {gram}))) AS sh
  FROM tok WHERE len(t) >= {n}
),
sh AS (
  SELECT doc_id, sh FROM raw
  WHERE sh IN (SELECT sh FROM raw GROUP BY sh HAVING COUNT(*) <= {max_doc_freq})
)"""
        if max_doc_freq is not None
        else f"""sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - {n - 1}, 0) + 1),
                i -> concat_ws(' ', {gram}))) AS sh
  FROM tok WHERE len(t) >= {n}
)"""
    )
    return f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
{prune},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, true AS recall_ok
FROM common
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE common / (sa.sz + sb.sz - common) >= {threshold}{extra_where}
"""


_Q76_SQL = _jaccard_count_sql(n=3, threshold=0.8)


# --- q142: incremental dedup — new batch probed against a persisted -----
# MinHash index of the history. Split: doc_id % 10 == 0 is "today's
# crawl", the rest is the already-indexed corpus. The index is built
# once from history (dedup/incremental.py), the batch's bucket keys are
# broadcast against it, candidates are exact-verified — and the query
# reports recall against the exact cross-corpus ground truth (jaccard
# >= 0.8 pairs with exactly one side in the batch), which the oracle
# recomputes relationally. Same parameters as q32/q76, so the >= 0.9
# recall floor carries over.

def q142_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..dedup import minhash_index_build, minhash_index_probe

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    history = docs.filter(F.col("doc_id") % 10 != 0)
    path = tempfile.mkdtemp(prefix="q142_idx_")
    try:
        minhash_index_build(
            history, path, num_hashes=64, bands=16, layout="flat"
        )
        found = minhash_index_probe(
            spark, path, batch, history, threshold=0.5, max_bucket_size=64
        )
        cross = F.expr("(a % 10 = 0) <> (b % 10 = 0)")
        exact = ngram_jaccard_pairs(docs, threshold=0.8).filter(cross)
        row = _recall_row(exact, found.filter(cross), min_recall=0.9)
        # one-row result: materialize, then drop the temp index dir
        rows = row.collect()
        schema = row.schema
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


# --- q198: the q142 lifecycle on the VERSIONED index layout --------------
# Same split, same probe, same recall contract — but the index is the
# round-7 log-structured CAS layout (dedup/incremental.py versioned
# section): history founds snapshot 1, the first half of the batch is
# CAS-APPENDED as snapshot 2 with an epoch-fence mark, a replayed
# append of the same mark is skipped, and the index is COMPACTED
# (watermark publish + prune) before the probe. The oracle is q142's
# relational ground truth over raw text, so any layout bug — lost
# appends, double-committed replays, a compaction that drops or
# duplicates entries — shows up as a recall/hash mismatch against the
# exact pair count.

def q198_versioned_index_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..dedup import (
        minhash_index_build,
        minhash_index_probe,
        optimize_index,
        versioned_index_append,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    history = docs.filter(F.col("doc_id") % 10 != 0)
    # exercise the append path inside the indexed side: history docs
    # ending in 5 arrive as a second CAS-committed generation
    gen1 = history.filter(F.col("doc_id") % 10 != 5)
    gen2 = history.filter(F.col("doc_id") % 10 == 5)
    path = tempfile.mkdtemp(prefix="q198_idx_") + "/idx"
    try:
        minhash_index_build(
            gen1, path, num_hashes=64, bands=16, layout="versioned"
        )
        versioned_index_append(gen2, path, epoch_mark="_epoch_q198_1")
        # replay of the same epoch must be a fenced no-op
        versioned_index_append(gen2, path, epoch_mark="_epoch_q198_1")
        optimize_index(spark, path)  # CAS compaction before serving
        found = minhash_index_probe(
            spark, path, batch, history, threshold=0.5, max_bucket_size=64
        )
        cross = F.expr("(a % 10 = 0) <> (b % 10 = 0)")
        exact = ngram_jaccard_pairs(docs, threshold=0.8).filter(cross)
        row = _recall_row(exact, found.filter(cross), min_recall=0.9)
        rows = row.collect()
        schema = row.schema
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q142_SQL = _jaccard_count_sql(
    n=3,
    threshold=0.8,
    extra_where="\n  AND ((a % 10 = 0) <> (b % 10 = 0))",
)



# --- q242: dedup-index observability (DESCRIBE INDEX) ---------------------
# minhash_index_stats over a versioned lifecycle (found -> CAS append
# -> version-scoped delete): n_docs and the n_entries == n_docs * bands
# invariant are relational over the surviving corpus, so the oracle
# recomputes them from the documents table — a double-ingest (the bug
# the epoch fence prevents), a tombstone leak, or a counter drift
# breaks the hash. Operational fields (layout, snapshots, pending
# tombstones, bucket pressure) are asserted in-query.

def q242_dedup_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..dedup import (
        minhash_index_build,
        minhash_index_delete,
        minhash_index_stats,
        versioned_index_append,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    gen1 = docs.filter(F.col("doc_id") % 10 != 5)
    gen2 = docs.filter(F.col("doc_id") % 10 == 5)
    doomed = docs.filter(F.col("doc_id") % 9 == 0).select(
        F.col("doc_id").alias("doc")
    )
    n_doomed = doomed.count()
    path = tempfile.mkdtemp(prefix="q242_idx_") + "/idx"
    try:
        minhash_index_build(
            gen1, path, num_hashes=64, bands=16, layout="versioned"
        )
        versioned_index_append(gen2, path)
        minhash_index_delete(spark, path, doomed)
        st = minhash_index_stats(spark, path)
        ok = (
            st["layout"] == "versioned"
            and st["live_snapshots"] == 3
            and st["n_pending_tombstones"] == n_doomed
            and st["n_entries"] == st["n_docs"] * st["bands"]
            and st["num_hashes"] == 64
            and st["max_bucket"] >= 1
            and st["data_files"] >= 1
        )
        out = local_relation(spark, 
            [(st["n_docs"], st["n_entries"], st["bands"], bool(ok))],
            "n_docs bigint, n_entries bigint, bands int,"
            " invariants_ok boolean",
        )
        if not ok:
            raise AssertionError(f"stats invariants failed: {st}")
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q242_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) * 16 AS BIGINT) AS n_entries,
       CAST(16 AS INT) AS bands,
       true AS invariants_ok
FROM documents WHERE doc_id % 9 <> 0
"""


# --- q77: SimHash recall vs exact Jaccard ground truth -------------------
# Ground truth: exact 3-gram Jaccard >= 0.9 — near-identical documents.
# (3-gram, not 2-gram: 2-gram stop-shingles like "of the" occur in most
# documents, making the exact self-join quadratic at scale, and pruning
# them distorts small shingle sets; the 3-gram index is the same pipeline
# q31/q76 already run at every SF.) Near-identical pairs share almost all
# shingles, so their 2-gram fingerprints sit inside Hamming radius 8; the
# q33 pipeline must recover >= 90% of them.

def q77_simhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(docs, n=3, threshold=0.9)
    cand = simhash_near_pairs(docs, n=2, max_hamming=8)
    return _recall_row(exact, cand, min_recall=0.9)


_Q77_SQL = _jaccard_count_sql(n=3, threshold=0.9)


# --- q78: hyperplane-LSH ANN recall@5 vs brute-force cosine --------------
# Same corpus split and parameters as q34 (exact) / q35 (approximate:
# 16 tables × 8 planes, multi-probe). Macro recall over the query batch
# must reach 0.8 — the standard ANN quality gate.

def _recall_at_k_row(
    exact: DataFrame, approx: DataFrame, min_recall: float
) -> DataFrame:
    """One row (n_queries, recall_ok): share of exact top-k
    (query_id, neighbor) pairs the approximate index recovered, macro
    over the query batch. Empty ground truth counts as recalled."""
    hits = approx.select("query_id", "neighbor").withColumn(
        "__hit", F.lit(1)
    )
    joined = exact.select("query_id", "neighbor").join(
        hits, ["query_id", "neighbor"], "left"
    )
    return joined.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.coalesce(
            (F.count("__hit") / F.count("*")) >= min_recall, F.lit(True)
        ).alias("recall_ok"),
    )


def _ann_split(spark: SparkSession, sf_dir: str):
    """The shared q34/q35/q86 corpus split: vec_id < 5 are the queries."""
    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return corpus, queries


def q78_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _ann_split(spark, sf_dir)
    exact = cosine_topk(corpus, queries, k=5)
    approx = ann_topk_lsh(corpus, queries, k=5)
    return _recall_at_k_row(exact, approx, min_recall=0.8)


_Q78_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""


# --- q87: IVF ANN recall@5 vs brute-force cosine -------------------------
# Same corpus split as q34/q86 (16 cells, nprobe=8). The fixture
# embeddings are RANDOM unit vectors — no cluster structure, the
# adversarial case for IVF — so the gate is 0.6 against measured
# 0.76 (sf0.1) / 0.88 (sf0.01, sf0.001); deterministic for the fixed
# seed + data, so this is a regression gate on the quantizer + probe
# path, not a probabilistic assertion.

def q87_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _ann_split(spark, sf_dir)
    exact = cosine_topk(corpus, queries, k=5)
    approx = ann_topk_ivf(corpus, queries, k=5, num_cells=16, nprobe=8)
    return _recall_at_k_row(exact, approx, min_recall=0.6)


_Q87_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""


# --- q79: HLL approx-distinct relative error vs exact --------------------
# rsd=0.02 sketches must land within 5% of the exact distinct count
# (2.5 standard deviations; measured max error at sf0.1 is 1.0% — and
# deterministic for fixed data, so this is a regression gate on the
# sketch path, not a probabilistic assertion). rsd=0.01 was measured 12×
# slower at sf0.1 — the register array outgrows the dense HLL sweet spot.

def q79_hll_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("__approx"),
    )
    return per_group.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("__approx") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.05
        ).alias("approx_ok"),
    )


_Q79_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       true AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


# --- q80: approximate-quantile relative error vs exact percentile --------
# percentile_approx at accuracy 10000 bounds rank error to n/10000; the
# value-space check asserts the median lands within 1% of the exact one.

def q80_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("__exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("__approx"),
    )
    return per_group.select(
        "l_returnflag",
        "n",
        (
            F.abs(F.col("__approx") - F.col("__exact")) / F.col("__exact")
            <= 0.01
        ).alias("approx_ok"),
    )


_Q80_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, true AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


# --- q152: PQ/ADC recall vs exact ground truth ---------------------------
# Product quantization (similarity/pq.py): ADC over 8-byte codes
# shortlists 128 candidates, exact refine re-ranks them. Measured
# recall@5: 0.92 at sf0.01, 0.76 at sf0.1 (deterministic for fixed
# data) — the 0.6 floor is the regression gate, not a probabilistic
# claim. Rows-only is avoided the usual way: the oracle recomputes the
# query count and pins the boolean.


def q152_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _ann_split(spark, sf_dir)
    exact = cosine_topk(corpus, queries, k=5)
    approx = ann_topk_pq(
        corpus, queries, k=5, m=8, k_codes=16, shortlist=128
    )
    return _recall_at_k_row(exact, approx, min_recall=0.6)


_Q152_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""


# --- q153: IVF x PQ composition recall ------------------------------------
# The composed FAISS index (similarity/pq.py ann_topk_ivfpq): coarse
# cells bound which vectors are scanned, PQ codes bound the per-vector
# scan cost, exact refine restores ranking quality. Composition also
# upgrades the PLAN: the probed-cell equi-join replaces pure-PQ's gated
# cross join (pinned in tests/test_plans.py). Measured recall@5: 0.88
# sf0.01 / 0.68 sf0.1 (deterministic); 0.6 is the regression floor.


def q153_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _ann_split(spark, sf_dir)
    exact = cosine_topk(corpus, queries, k=5)
    approx = ann_topk_ivfpq(
        corpus, queries, k=5, num_cells=16, nprobe=8, m=8, k_codes=16,
        shortlist=128,
    )
    return _recall_at_k_row(exact, approx, min_recall=0.6)


_Q153_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""


# --- q189: Doulion triangle-estimate relative error vs exact kernel ------
# The q188 approximate counter must land within 10% of q167's exact
# count. Both sides are deterministic (hash-sampled edges, exact count
# on the sample), so the bound is a regression gate, not a flaky
# assertion; measured error is 6.1% / 0.3% / 0.1% at sf0.001/0.01/0.1
# (small-SF error is dominated by basket-clique co-variance, not the
# independent-triangle Doulion bound). FULLY oracled: the sampling hash
# is portable integer arithmetic, so the oracle re-derives the sample,
# recounts both graphs with the id-ordered three-way join, and evaluates
# the same bound.

def q189_triangle_approx_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import approx_triangle_stats, triangle_stats
    from .graphmatch import _copurchase_pairs

    ex = triangle_stats(_copurchase_pairs(spark, sf_dir))
    ap = approx_triangle_stats(_copurchase_pairs(spark, sf_dir), p=0.5)
    err_ok = (
        abs(ap.n_triangles_est - ex.n_triangles)
        <= 0.1 * max(ex.n_triangles, 1)
    )
    return local_relation(spark, 
        [(ex.n_triangles, ap.n_triangles_est, bool(err_ok))],
        "n_exact bigint, n_est bigint, err_ok boolean",
    )


_Q189_SQL = """
WITH small_orders AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) <= 7
),
mem AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM small_orders)
),
edges AS (
  SELECT DISTINCT m1.l_partkey AS a, m2.l_partkey AS b
  FROM mem m1 JOIN mem m2
    ON m1.l_orderkey = m2.l_orderkey AND m1.l_partkey < m2.l_partkey
),
sedges AS (
  SELECT a, b FROM edges
  WHERE ((((CAST(a AS BIGINT) % 2147483648) * (CAST(a AS BIGINT) % 2147483648)
           % 2147483648) * 1220703125) % 2147483648
       + (((CAST(b AS BIGINT) % 2147483648) * (CAST(b AS BIGINT) % 2147483648)
           % 2147483648) * 1864987861) % 2147483648
       + (((CAST(a AS BIGINT) % 2147483648) * (CAST(b AS BIGINT) % 2147483648)
           % 2147483648) * 987654323) % 2147483648)
       % 2147483648 < 1073741824
),
ex AS (
  SELECT COUNT(*) AS t
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
ap AS (
  SELECT COUNT(*) * 8 AS est
  FROM sedges e1
  JOIN sedges e2 ON e1.b = e2.a
  JOIN sedges e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT CAST(t AS BIGINT) AS n_exact,
       CAST(est AS BIGINT) AS n_est,
       ABS(est - t) <= 0.1 * GREATEST(t, 1) AS err_ok
FROM ex, ap
"""


QUERIES = {
    "q142_incremental_dedup": q142_incremental_dedup,
    "q198_versioned_index_dedup": q198_versioned_index_dedup,
    "q242_dedup_index_stats": q242_dedup_index_stats,
    "q189_triangle_approx_error": q189_triangle_approx_error,
    "q76_minhash_verify": q76_minhash_verify,
    "q77_simhash_verify": q77_simhash_verify,
    "q78_ann_recall": q78_ann_recall,
    "q87_ivf_recall": q87_ivf_recall,
    "q152_pq_recall": q152_pq_recall,
    "q153_ivfpq_recall": q153_ivfpq_recall,
    "q79_hll_error": q79_hll_error,
    "q80_quantile_error": q80_quantile_error,
}

ORACLE = {
    "q142_incremental_dedup": _Q142_SQL,
    "q198_versioned_index_dedup": _Q142_SQL,  # same relational ground truth
    # counters + the entries == docs x bands invariant recomputed
    # relationally; operational fields asserted in-query
    "q242_dedup_index_stats": _Q242_SQL,
    "q189_triangle_approx_error": _Q189_SQL,
    "q76_minhash_verify": _Q76_SQL,
    "q77_simhash_verify": _Q77_SQL,
    "q78_ann_recall": _Q78_SQL,
    "q87_ivf_recall": _Q87_SQL,
    "q152_pq_recall": _Q152_SQL,
    "q153_ivfpq_recall": _Q153_SQL,
    "q79_hll_error": _Q79_SQL,
    "q80_quantile_error": _Q80_SQL,
}


# --- q186: mergeable HLL sketches (the MAU-from-daily-sketches workflow) --
# The datasketches capability (Spark 3.5+ hll_sketch_agg /
# hll_union_agg): build one HLL sketch PER DAY of the event stream —
# the pre-aggregated artifact a warehouse stores — then compute monthly
# uniques by UNIONING the daily sketches, never rescanning events. The
# oracle pins the exact distinct count per day and the bounded-error
# boolean for the merged estimate (q79's oracled-property pattern:
# sketch bytes are engine-specific, sketch QUALITY is not). At 100 TB
# this is the incremental-distinct design: day partitions aggregate
# once; every later rollup (weekly, monthly, all-time) merges
# KB-sized sketches.

def q186_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").cast("bigint").alias("exact_daily"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
    )
    exact_total = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_total")
    )
    summary = (
        daily.agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("exact_daily").cast("bigint").alias("sum_daily_uniques"),
        )
        .join(F.broadcast(exact_total))
        .join(F.broadcast(merged))
    )
    return summary.select(
        "n_days",
        "sum_daily_uniques",
        "exact_total",
        (
            F.abs(F.col("est_total") - F.col("exact_total"))
            / F.col("exact_total")
            <= 0.05
        ).alias("merged_estimate_ok"),
    )


_Q186_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(DISTINCT user_id) AS exact_daily
  FROM events GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(exact_daily) AS BIGINT) AS sum_daily_uniques,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
         AS exact_total,
       true AS merged_estimate_ok
FROM daily
"""


QUERIES["q186_hll_union"] = q186_hll_union
ORACLE["q186_hll_union"] = _Q186_SQL


# --- q273: the q198 lifecycle through ONE atomic CDC snapshot --------------
# The dedup-index CDC twin (dedup/incremental.py
# minhash_index_apply_cdc — the third family to gain the one-snapshot
# adds+tombstones contract, after the text and vector indexes): gen2
# arrives TOGETHER with a takedown of every history doc ending in 3 as
# one CDC batch, the replayed epoch is a fenced no-op, compaction
# purges, and the probe's recall is measured against the exact-jaccard
# pairs over the FINAL live corpus — a tombstone leak (a deleted doc
# surfacing as a candidate) is additionally asserted in-query.

def q273_dedup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..dedup import (
        minhash_index_apply_cdc,
        minhash_index_build,
        minhash_index_probe,
        optimize_index,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    history = docs.filter(F.col("doc_id") % 10 != 0)
    gen1 = history.filter(F.col("doc_id") % 10 != 5)
    gen2 = history.filter(F.col("doc_id") % 10 == 5)
    doomed = history.filter(F.col("doc_id") % 10 == 3)
    live_history = history.filter(F.col("doc_id") % 10 != 3)
    cdc = gen2.withColumn("op", F.lit("add")).unionByName(
        doomed.select(
            "doc_id", F.lit(None).cast("string").alias("text"),
            F.lit("delete").alias("op"),
        )
    )
    path = tempfile.mkdtemp(prefix="q273_idx_") + "/idx"
    try:
        minhash_index_build(
            gen1, path, num_hashes=64, bands=16, layout="versioned"
        )
        out = minhash_index_apply_cdc(cdc, path, epoch_mark="_epoch_q273_1")
        if out is None or out["n_tombstoned"] == 0:
            raise AssertionError(f"CDC apply did not land: {out}")
        # replay of the same epoch must be a fenced whole-batch no-op
        if minhash_index_apply_cdc(
            cdc, path, epoch_mark="_epoch_q273_1"
        ) is not None:
            raise AssertionError("replayed CDC epoch was not fenced")
        optimize_index(spark, path)  # CAS compaction before serving
        found = minhash_index_probe(
            spark, path, batch, live_history, threshold=0.5,
            max_bucket_size=64,
        )
        # tombstone leak check: no deleted doc on either endpoint
        leaks = (
            found.select(F.col("a").alias("doc"))
            .unionByName(found.select(F.col("b").alias("doc")))
            .filter((F.col("doc") % 10 == 3) & (F.col("doc") % 10 != 0))
            .count()
        )
        if leaks:
            raise AssertionError(f"{leaks} tombstoned docs served")
        cross = F.expr("(a % 10 = 0) <> (b % 10 = 0)")
        live = F.expr("a % 10 <> 3 AND b % 10 <> 3")
        exact = ngram_jaccard_pairs(docs, threshold=0.8).filter(
            cross & live
        )
        row = _recall_row(exact, found.filter(cross), min_recall=0.9)
        rows = row.collect()
        schema = row.schema
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q273_SQL = _jaccard_count_sql(
    n=3,
    threshold=0.8,
    extra_where=(
        "\n  AND ((a % 10 = 0) <> (b % 10 = 0))"
        "\n  AND a % 10 <> 3 AND b % 10 <> 3"
    ),
)


QUERIES["q273_dedup_cdc"] = q273_dedup_cdc
ORACLE["q273_dedup_cdc"] = _Q273_SQL
