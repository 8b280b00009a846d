"""Pattern-mining, distribution-monitoring, and record-linkage queries:
association rules (market baskets), binned population-drift, a
two-sample KS statistic, and sorted-neighborhood dedup (single-pass
q219 + the components-closed E2E q222).

Why these matter at 100 TB: association rules are the classic
frequent-itemset workload (the Apriori candidate-prune shape — frequent
singletons first, pairs only from frequent items — is what keeps the
self-join fanout bounded); drift/KS are the monitoring primitives every
production training-data pipeline runs between snapshots ("did this
week's crawl shift the length/score distribution?"); SNM is the
linear-fanout blocking strategy for corpora whose hot shingles melt
posting joins (dedup/snm.py). All are pure relational kernels: exact
integer counts plus deterministic double ratios, so every query here is
fully DuckDB-oracled bit-for-bit.

Determinism rules (see queries/__init__.py): all counts are exact
integers; ratios are single divisions of int-derived doubles (correctly
rounded, engine-independent); no transcendentals — classic PSI's
``ln(p/q)`` is replaced by the rational triangular discrimination
``2(p−q)²/(p+q)`` (same zero-point, same monotone-in-divergence reading,
bit-stable across engines).

Reference parity: the reference has no aggregation surface at all
(SURVEY.md §2b "aggregations" — ABSENT beyond dropDuplicates,
services/transformer.py:15); this family extends the north-star
analytics layered on its post-processing stub
(services/post_processing.py:5-8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import tbl


# --- q215: association rules over order→brand baskets --------------------
# Basket = order, item = part brand (25 brands → ≤ C(25,2) = 300 pairs;
# the per-order fanout is C(items_per_order, 2), bounded by the basket
# width, NOT the corpus). Scale shape: one distinct on (order, brand) —
# part is a broadcast dimension — then a self-equi-join on the basket
# key whose fanout is the squared basket width, then a groupBy on the
# pair. Item counts (25 rows) and the basket total (1 row) are
# broadcast back onto the pair relation. Support threshold is the
# integer predicate 500·pair_cnt ≥ n (pair support ≥ 0.2%), evaluated
# before the rule math so infrequent pairs never reach the join.
# Confidence/lift are single-rounding double ratios of exact counts —
# identical text in both engines, so the lift-ordered top-20 is stable.

def q215_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    pt = tbl(spark, sf_dir, "part")
    # four consumers (basket total, item counts, both self-join sides)
    # would each re-run the join+distinct — materialize it once
    # (guide §1.2 / the triangle-kernel checkpoint discipline)
    baskets = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint()
    )
    n_df = baskets.agg(F.countDistinct("l_orderkey").alias("n"))
    items = baskets.groupBy("p_brand").agg(F.count("*").alias("ic"))
    # pair generation by per-basket array expansion (the
    # _copurchase_pairs idiom) instead of the basket self-join: one
    # groupBy exchange on the order key replaces the join's two
    # exchange reads + sort/probe, and the sorted-array
    # following-combination emits exactly the (pa < pb) multiset the
    # self-join produced (baskets is distinct per order, so brand
    # lists are sets). Per-order fanout is C(basket, 2) either way.
    pairs = (
        baskets.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("p_brand")).alias("brands"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(brands, (x, i) ->"
                    " transform(slice(brands, i + 2, size(brands)), y ->"
                    " struct(x AS pa, y AS pb))))"
                )
            ).alias("e")
        )
        .groupBy(F.col("e.pa").alias("pa"), F.col("e.pb").alias("pb"))
        .agg(F.count("*").alias("pc"))
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        F.col("pc"),
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            F.col("pc"),
        )
    )
    ia = items.select(
        F.col("p_brand").alias("antecedent"), F.col("ic").alias("ac")
    )
    ib = items.select(
        F.col("p_brand").alias("consequent"), F.col("ic").alias("cc")
    )
    return (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ib), "consequent")
        .crossJoin(F.broadcast(n_df))
        .filter(F.expr("500 * pc >= n"))
        .select(
            "antecedent",
            "consequent",
            F.col("pc").cast("bigint").alias("pair_cnt"),
            F.expr(
                "CAST(pc AS DOUBLE) / CAST(ac AS DOUBLE)"
            ).alias("confidence"),
            F.expr(
                "(CAST(pc AS DOUBLE) * CAST(n AS DOUBLE))"
                " / (CAST(ac AS DOUBLE) * CAST(cc AS DOUBLE))"
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(20)
    )


_Q215_SQL = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
nn AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets),
items AS (SELECT p_brand, COUNT(*) AS ic FROM baskets GROUP BY p_brand),
pairs AS (
  SELECT x.p_brand AS pa, y.p_brand AS pb, COUNT(*) AS pc
  FROM baskets x JOIN baskets y
    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
  GROUP BY x.p_brand, y.p_brand
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, pc FROM pairs
  UNION ALL
  SELECT pb AS antecedent, pa AS consequent, pc FROM pairs
)
SELECT r.antecedent, r.consequent,
       CAST(r.pc AS BIGINT) AS pair_cnt,
       CAST(r.pc AS DOUBLE) / CAST(ia.ic AS DOUBLE) AS confidence,
       (CAST(r.pc AS DOUBLE) * CAST(nn.n AS DOUBLE))
         / (CAST(ia.ic AS DOUBLE) * CAST(ib.ic AS DOUBLE)) AS lift
FROM rules r
JOIN items ia ON ia.p_brand = r.antecedent
JOIN items ib ON ib.p_brand = r.consequent
CROSS JOIN nn
WHERE 500 * r.pc >= nn.n
ORDER BY lift DESC, r.antecedent, r.consequent
LIMIT 20
"""


# --- q216: binned population drift (rational PSI surrogate) --------------
# Split = user_id % 2 (a deterministic A/B of the fixture), metric =
# events.value binned into 10 fixed-width buckets. Per-bin output: exact
# counts, the two proportions, and the triangular-discrimination
# contribution 2(p−q)²/(p+q) — the rational stand-in for PSI's
# (p−q)·ln(p/q) (transcendental-free, see module docstring). One
# conditional-aggregate pass over the fact table + a broadcast 1-row
# totals join; at 100 TB this is a single partial+final hash aggregate
# per snapshot, and snapshots compare by merging their tiny bin tables.

#: the fixture binning, shared with the streaming drift view
#: (streaming/jobs.drift_view_readout): 10 fixed-width buckets over
#: events.value, split = user_id parity
DRIFT_BIN_EXPR = "LEAST(9, CAST(FLOOR(value / 50.0) AS INTEGER))"
DRIFT_SPLIT_EXPR = "user_id % 2"


def drift_from_counts(counts: DataFrame) -> DataFrame:
    """The drift formulas over a (bin, ca, cb) count relation — the one
    definition both the batch query (q216) and the streaming-maintained
    view readout evaluate, so their outputs are bit-identical by
    construction."""
    totals = counts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            F.col("ca").cast("bigint").alias("cnt_a"),
            F.col("cb").cast("bigint").alias("cnt_b"),
            F.expr("CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)").alias("p_a"),
            F.expr("CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)").alias("p_b"),
            F.expr(
                "2.0 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
                " - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
                " * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
                " - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
                " / (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
                " + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
            ).alias("drift_contrib"),
        )
    )


def q216_drift_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    binned = ev.select(
        F.expr(DRIFT_BIN_EXPR).alias("bin"),
        F.expr(DRIFT_SPLIT_EXPR).alias("s"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("cb"),
    )
    return drift_from_counts(counts)


_Q216_SQL = """
WITH e AS (
  SELECT LEAST(9, CAST(FLOOR(value / 50.0) AS INTEGER)) AS bin,
         user_id % 2 AS s
  FROM events
),
c AS (
  SELECT bin,
         SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
  FROM e GROUP BY bin
),
t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM c)
SELECT bin,
       CAST(ca AS BIGINT) AS cnt_a,
       CAST(cb AS BIGINT) AS cnt_b,
       CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS p_a,
       CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS p_b,
       2.0 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
              - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
           * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
              - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
           / (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
              + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) AS drift_contrib
FROM c CROSS JOIN t
"""


# --- q217: two-sample Kolmogorov–Smirnov statistic ------------------------
# D = max_v |F1(v) − F2(v)| between o_totalprice of 'F' vs 'O' orders.
# The Spark side builds the ECDF the DISTRIBUTED way: per-value counts,
# then a two-level cumulative sum — coarse range buckets whose totals
# prefix-sum in a tiny unpartitioned window (O(buckets) rows), plus a
# within-bucket window partitioned BY bucket — so no global
# single-partition sort ever materializes the fact table. The oracle
# computes the same ECDF with one flat window (value-equal; the oracle
# needn't be scale-shaped). max() over identically-rounded doubles is
# order-independent, so D matches bit-for-bit.

def q217_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = tbl(spark, sf_dir, "orders")
    vals = orders.filter(
        F.col("o_orderstatus").isin("F", "O")
    ).select(
        F.col("o_totalprice").alias("v"), F.col("o_orderstatus").alias("g")
    )
    per_v = vals.groupBy("v").agg(
        F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).alias("cf"),
        F.sum(F.when(F.col("g") == "O", 1).otherwise(0)).alias("co"),
    ).withColumn(
        "bucket", F.expr("CAST(FLOOR(v / 50000.0) AS INTEGER)")
    )
    # coarse prefix: one row per bucket, offsets = totals of all prior
    # buckets (tiny relation — the only unpartitioned window, O(10) rows)
    w_bucket = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        per_v.groupBy("bucket")
        .agg(F.sum("cf").alias("bf"), F.sum("co").alias("bo"))
        .select(
            "bucket",
            F.coalesce(F.sum("bf").over(w_bucket), F.lit(0)).alias("off_f"),
            F.coalesce(F.sum("bo").over(w_bucket), F.lit(0)).alias("off_o"),
        )
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        per_v.join(F.broadcast(offsets), "bucket")
        .select(
            (F.col("off_f") + F.sum("cf").over(w_in)).alias("c1"),
            (F.col("off_o") + F.sum("co").over(w_in)).alias("c2"),
        )
    )
    totals = vals.agg(
        F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("g") == "O", 1).otherwise(0)).alias("n_o"),
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.col("n_f"),
            F.col("n_o"),
            F.expr(
                "ABS(CAST(c1 AS DOUBLE) / CAST(n_f AS DOUBLE)"
                " - CAST(c2 AS DOUBLE) / CAST(n_o AS DOUBLE))"
            ).alias("d"),
        )
        .groupBy()
        .agg(
            F.max(F.col("n_f").cast("bigint")).alias("n_f"),
            F.max(F.col("n_o").cast("bigint")).alias("n_o"),
            F.max("d").alias("d_stat"),
        )
    )


_Q217_SQL = """
WITH vals AS (
  SELECT o_totalprice AS v, o_orderstatus AS g
  FROM orders WHERE o_orderstatus IN ('F', 'O')
),
per_v AS (
  SELECT v,
         SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS cf,
         SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS co
  FROM vals GROUP BY v
),
cum AS (
  SELECT SUM(cf) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         SUM(co) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
  FROM per_v
),
t AS (
  SELECT SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS n_f,
         SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS n_o
  FROM vals
)
SELECT CAST(MAX(t.n_f) AS BIGINT) AS n_f,
       CAST(MAX(t.n_o) AS BIGINT) AS n_o,
       MAX(ABS(CAST(c1 AS DOUBLE) / CAST(t.n_f AS DOUBLE)
               - CAST(c2 AS DOUBLE) / CAST(t.n_o AS DOUBLE))) AS d_stat
FROM cum CROSS JOIN t
"""


# --- q219: sorted-neighborhood dedup (multi-pass merge/purge) ------------
# The Hernández–Stolfo alternative to the q31 inverted index and the
# q32/q33 LSH families: block on a short key prefix, sort within blocks,
# compare each doc to its 4 in-block successors, two passes with
# independent keys (text[1:40], text[21:60]) to recover block-boundary
# misses. Candidate fanout is window × passes per document — LINEAR in
# the corpus, immune to hot-shingle quadratic fanout — at the price of
# recall bounded by the passes' key agreement (tests pin recall against
# the exhaustive q31 pair set). Verification = the same trigram-shingle
# Jaccard ≥ 0.5 as q31, computed per candidate with one array_intersect.
# Kernel: dedup/snm.py (scale notes there).

def q219_snm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.snm import snm_candidate_pairs
    from ..dedup.shingles import with_shingles

    docs = tbl(spark, sf_dir, "documents")
    cand = snm_candidate_pairs(
        docs,
        "doc_id",
        ["substring(text, 1, 40)", "substring(text, 21, 40)"],
        window=4,
        block_len=2,
    )
    # both verification sides (sa, sb) consume the shingle relation —
    # materialize the compute-heavy shingling once instead of twice
    sh = (
        with_shingles(docs, "text", 3)
        .select("doc_id", "shingles")
        .localCheckpoint()
    )
    sa = sh.select(
        F.col("doc_id").alias("a"), F.col("shingles").alias("sha")
    )
    sb = sh.select(
        F.col("doc_id").alias("b"), F.col("shingles").alias("shb")
    )
    # the verification compute (array_intersect over shingle arrays)
    # lands in the stage AFTER the candidate⋈shingles joins, whose
    # byte-sized output AQE coalesces to one partition — serializing
    # ~0.9 s of intersection work on one core (the q162 pattern: AQE
    # targets bytes, not compute density). An explicit repartition at
    # the session's parallelism is never re-coalesced and spreads the
    # intersections; measured 2.82 -> 2.32 s (q222 inherits via reuse).
    joined = (
        cand.join(sa, "a")
        .join(sb, "b")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return (
        joined
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sha", "shb")).alias("common"),
            F.size("sha").alias("sza"),
            F.size("shb").alias("szb"),
        )
        .filter((F.col("sza") >= 1) & (F.col("szb") >= 1))
        .select(
            "a",
            "b",
            F.expr(
                "CAST(common AS DOUBLE)"
                " / CAST(sza + szb - common AS DOUBLE)"
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


def _snm_cte_prefix(window: int = 4) -> str:
    """The shared SNM CTE chain through ``vp`` (verified pairs) — q219
    selects vp directly; q222 closes it transitively into components."""
    cands = []
    for p in ("p1", "p2"):
        for k in range(1, window + 1):
            cands.append(
                f"SELECT doc_id AS x, lead(doc_id, {k}) OVER"
                f" (PARTITION BY blk ORDER BY k, doc_id) AS y FROM {p}"
            )
    c0 = "\n  UNION ALL\n  ".join(cands)
    return f"""p1 AS (
  SELECT doc_id, substr(text, 1, 40) AS k,
         substr(substr(text, 1, 40), 1, 2) AS blk
  FROM documents
),
p2 AS (
  SELECT doc_id, substr(text, 21, 40) AS k,
         substr(substr(text, 21, 40), 1, 2) AS blk
  FROM documents
),
c0 AS (
  {c0}
),
cand AS (
  SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
  FROM c0 WHERE y IS NOT NULL AND x <> y
),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM tok WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT c.a, c.b, COUNT(*) AS common
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.a
  JOIN sh s2 ON s2.doc_id = c.b AND s2.sh = s1.sh
  GROUP BY c.a, c.b
),
vp AS (
  SELECT co.a, co.b,
         CAST(co.common AS DOUBLE)
           / CAST(sa.sz + sb.sz - co.common AS DOUBLE) AS jaccard
  FROM common co
  JOIN sizes sa ON sa.doc_id = co.a
  JOIN sizes sb ON sb.doc_id = co.b
  WHERE CAST(co.common AS DOUBLE)
          / CAST(sa.sz + sb.sz - co.common AS DOUBLE) >= 0.5
)"""


_Q219_SQL = "WITH " + _snm_cte_prefix() + "\nSELECT a, b, jaccard FROM vp"


# --- q222: SNM-routed corpus dedup E2E ------------------------------------
# The full merge/purge pipeline: linear-fanout SNM candidates → shingle
# verification (the shared vp relation) → transitive closure into
# canonical components (operators/components.py label propagation with
# lineage checkpointing, the q60 kernel). Same E2E shape as q60/q69 but
# routed through the blocking strategy whose candidate volume is
# window × passes per document — the variant a 100 TB corpus with hot
# shingles runs. Oracle: the q219 CTE chain closed by the same
# recursive min-label reachability as q60's.

def q222_snm_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    pairs = q219_snm_dedup(spark, sf_dir).select("a", "b")
    return connected_components(pairs).orderBy("node")


_Q222_SQL = (
    "WITH RECURSIVE "
    + _snm_cte_prefix()
    + """,
edges AS (SELECT a AS u, b AS v FROM vp UNION SELECT b, a FROM vp),
reach AS (
  SELECT u AS node, v AS r FROM edges
  UNION
  SELECT reach.node, edges.v FROM reach JOIN edges ON reach.r = edges.u
)
SELECT node, LEAST(node, MIN(r)) AS component
FROM reach
GROUP BY node
ORDER BY node
"""
)


QUERIES = {
    "q215_association_rules": q215_association_rules,
    "q216_drift_bins": q216_drift_bins,
    "q217_ks_statistic": q217_ks_statistic,
    "q219_snm_dedup": q219_snm_dedup,
    "q222_snm_corpus_dedup": q222_snm_corpus_dedup,
}

ORACLE = {
    "q215_association_rules": _Q215_SQL,
    "q216_drift_bins": _Q216_SQL,
    "q217_ks_statistic": _Q217_SQL,
    "q219_snm_dedup": _Q219_SQL,
    "q222_snm_corpus_dedup": _Q222_SQL,
}


# --- q229: SNM recall vs the exhaustive jaccard ground truth ---------------
# The q76/q77 pattern for the sorted-neighborhood family — but STRONGER:
# because SNM is fully SQL-expressible, the oracle re-derives BOTH sides
# (exhaustive uncapped pairs AND the SNM-verified pairs) and evaluates
# the recall predicate itself, instead of pinning `true`. Ground truth:
# exact trigram jaccard >= 0.5, uncapped. The two-pass SNM must recover
# at least half of it on this corpus (window/passes are the recall
# knobs; dedup/snm.py documents the trade).

def q229_snm_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup import ngram_jaccard_pairs

    docs = tbl(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(
        docs, threshold=0.5, max_doc_freq=None
    ).select("a", "b")
    snm = q219_snm_dedup(spark, sf_dir).select("a", "b")
    hits = snm.withColumn("__hit", F.lit(1))
    joined = exact.join(hits, ["a", "b"], "left")
    return joined.agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.coalesce(
            (F.count("__hit") / F.count("*")) >= 0.5, F.lit(True)
        ).alias("recall_ok"),
    )


_Q229_SQL = (
    "WITH "
    + _snm_cte_prefix()
    + """,
etok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
esh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM etok WHERE len(t) >= 3
),
esizes AS (SELECT doc_id, COUNT(*) AS sz FROM esh GROUP BY doc_id),
exact AS (
  SELECT a, b FROM (
    SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS common
    FROM esh s1 JOIN esh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
    GROUP BY 1, 2
  ) c
  JOIN esizes sa ON sa.doc_id = a
  JOIN esizes sb ON sb.doc_id = b
  WHERE common / (sa.sz + sb.sz - common) >= 0.5
),
hits AS (SELECT a, b, 1 AS hit FROM vp)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
       COALESCE(COUNT(h.hit) / COUNT(*) >= 0.5, true) AS recall_ok
FROM exact e
LEFT JOIN hits h ON h.a = e.a AND h.b = e.b
"""
)

QUERIES["q229_snm_recall"] = q229_snm_recall
ORACLE["q229_snm_recall"] = _Q229_SQL
