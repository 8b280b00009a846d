"""Mergeable sketches, approximate top-k, exact regression, and a Python
UDTF — round-2 additions on top of the q38/q68 approximate aggregates.

Why sketches matter at 100 TB: a re-aggregatable sketch (HLL, theta) lets
the engine pre-aggregate per partition / per day and answer rollup
queries by MERGING the small sketch states instead of rescanning raw
data — the same partial+final shape Spark already uses for SUM, but for
distinct-counting and set algebra. ``hll_union_agg`` / ``theta_union``
are the merge operators; per-group state is a few KB regardless of input
size, so the final merge is a broadcast-sized problem even when the scan
was 100 TB.

Oracle strategy: sketch estimates have no DuckDB twin, so (as with
q76-q80) the queries emit the EXACT ground-truth counts (oracled
bit-for-bit) plus boolean ``*_ok`` error-bound flags the oracle pins as
``true``. Deterministic: Spark's HLL/theta implementations are seeded
xxhash-family hashes, so a bound either always holds at a given SF or
never does. Verified at sf0.001/0.01/0.1.

Reference parity: the reference has no sketches (SURVEY.md §2b
"aggregations" row — ABSENT beyond dropDuplicates,
services/transformer.py:15); this family is part of the north-star
analytics surface (BASELINE.json) layered on the reference's
post-processing stub (services/post_processing.py:5-8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import DSUM_PINNED, tbl


# --- q99: mergeable HLL rollup (per-group sketches → merged global) ------
# Per-returnflag HLL sketches of l_partkey are merged with hll_union_agg
# to answer the global distinct WITHOUT rescanning lineitem — the rollup
# path a 100 TB pre-aggregated cube takes. Exact counts ride along only
# to verify the ±5% bound (default lgConfigK=12 → ~1.6% RSE).

def q99_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    li = tbl(spark, sf_dir, "lineitem")
    # feeds two plan branches (per-group rows + merged-global row):
    # persist so the scan + HLL/exact aggregation runs once (tiny: one
    # row per group). ContextCleaner unpersists when the plan is GC'd.
    per = li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_agg(l_partkey)").alias("__sk"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    per_rows = per.select(
        F.col("l_returnflag").alias("scope"),
        "exact_parts",
        (
            F.abs(F.expr("hll_sketch_estimate(__sk)") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.05
        ).alias("est_ok"),
    )
    merged = per.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(__sk))").alias("__est")
    )
    global_exact = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    all_row = global_exact.crossJoin(merged).select(
        F.lit("ALL").alias("scope"),
        "exact_parts",
        (
            F.abs(F.col("__est") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.05
        ).alias("est_ok"),
    )
    return per_rows.unionByName(all_row)


_Q99_SQL = """
SELECT l_returnflag AS scope,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       true AS est_ok
FROM lineitem
GROUP BY l_returnflag
UNION ALL
SELECT 'ALL' AS scope,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       true AS est_ok
FROM lineitem
"""


# --- q100: exact linear regression from decimal moment sums --------------
# Same trick as q89 (relational3.py): one partial+final hash aggregate
# collects exact DECIMAL power sums; slope/intercept/R² are closed-form
# double arithmetic on those sums, evaluated from IDENTICAL SQL text by
# both engines → bit-exact at any parallelism. Native regr_slope()
# merges double co-moments in partition order and cannot be pinned.

_dsum_exact = DSUM_PINNED

_Q100_SQL = f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {_dsum_exact('l_quantity')} AS sx,
         {_dsum_exact('l_extendedprice')} AS sy,
         {_dsum_exact('l_quantity * l_quantity')} AS sxx,
         {_dsum_exact('l_extendedprice * l_extendedprice')} AS syy,
         {_dsum_exact('l_quantity * l_extendedprice')} AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM s
"""


def q100_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame formulation (oracle keeps the CTE text): one power-sum
    # aggregate + closed-form OLS projection, expression shapes mirrored
    # for bit-identity (see q89 for the idiom)
    s = tbl(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(_dsum_exact("l_quantity")).alias("sx"),
        F.expr(_dsum_exact("l_extendedprice")).alias("sy"),
        F.expr(_dsum_exact("l_quantity * l_quantity")).alias("sxx"),
        F.expr(_dsum_exact("l_extendedprice * l_extendedprice")).alias("syy"),
        F.expr(_dsum_exact("l_quantity * l_extendedprice")).alias("sxy"),
    )
    return s.select(
        "l_returnflag",
        F.expr("CAST(n AS BIGINT)").alias("n"),
        F.expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)").alias("slope"),
        F.expr(
            "(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n"
        ).alias("intercept"),
        F.expr(
            "((n * sxy - sx * sy) * (n * sxy - sx * sy))"
            " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"
        ).alias("r2"),
    )


# --- q101: Python UDTF — document chunking as a table function -----------
# The one deliberate row-at-a-time Python UDTF in the inventory (the
# UDTF capability row in SURVEY.md §2b; every other 1→N expansion uses
# JVM posexplode, see q58). Chunking into fixed 32-token windows is the
# LLM-context-packing shape; q84 does the same job JVM-side with
# concat-then-chunk — this variant exists to exercise the
# `@udtf` + LATERAL join API, and stays off the bench (Python
# per-row is the documented slow path).

_CHUNK = 32


def q101_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_tokens int, head string")
    class ChunkDoc:
        def eval(self, text):
            if text is None:
                return
            toks = text.split(" ")  # matches string_split(text, ' ')
            for i in range(0, len(toks), _CHUNK):
                piece = toks[i : i + _CHUNK]
                yield (i // _CHUNK, len(piece), piece[0])

    spark.udtf.register("chunk_doc", ChunkDoc)
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.head
        FROM documents d, LATERAL chunk_doc(d.text) c
        """
    )


_Q101_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
c AS (
  SELECT doc_id,
         CAST(i AS INT) AS chunk_id,
         tk[i * {_CHUNK} + 1 : i * {_CHUNK} + {_CHUNK}] AS ch
  FROM t, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(tk) / {_CHUNK}.0) AS BIGINT))) AS i
  )
)
SELECT doc_id, chunk_id, CAST(len(ch) AS INT) AS n_tokens, ch[1] AS head
FROM c
"""


# --- q102: theta-sketch set algebra (union / intersection estimates) -----
# Theta sketches support set INTERSECTION and DIFFERENCE, which HLL
# cannot — the dedup-overlap question ("how many parts appear both in
# returned ('R') and accepted ('A') line items?") answered from two
# mergeable per-subset sketch states. Exact counts ride along for the
# bound check (theta default lgK=12 → exact below 4096 entries, ~1.6%
# RSE above; intersection error is relative to the union, so its bound
# is looser).

def q102_theta_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    both = li.filter(F.col("l_returnflag").isin("A", "R"))
    flags = both.groupBy("l_partkey").agg(
        F.max((F.col("l_returnflag") == "A").cast("int")).alias("in_a"),
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("in_b"),
    )
    exact = flags.agg(
        F.sum("in_a").cast("bigint").alias("exact_a"),
        F.sum("in_b").cast("bigint").alias("exact_b"),
        F.count("*").cast("bigint").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("exact_inter"),
    )
    sk = li.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN l_returnflag = 'A' THEN l_partkey END)"
        ).alias("__ska"),
        F.expr(
            "theta_sketch_agg(CASE WHEN l_returnflag = 'R' THEN l_partkey END)"
        ).alias("__skb"),
    )
    est = sk.select(
        F.expr("theta_sketch_estimate(theta_union(__ska, __skb))").alias(
            "__est_union"
        ),
        F.expr(
            "theta_sketch_estimate(theta_intersection(__ska, __skb))"
        ).alias("__est_inter"),
    )
    return exact.crossJoin(est).select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_inter",
        (
            F.abs(F.col("__est_union") - F.col("exact_union"))
            / F.col("exact_union")
            <= 0.05
        ).alias("union_ok"),
        (
            F.abs(F.col("__est_inter") - F.col("exact_inter"))
            / F.col("exact_inter")
            <= 0.15
        ).alias("inter_ok"),
    )


_Q102_SQL = """
WITH f AS (
  SELECT l_partkey,
         MAX(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS in_b
  FROM lineitem
  WHERE l_returnflag IN ('A', 'R')
  GROUP BY l_partkey
)
SELECT CAST(SUM(in_a) AS BIGINT) AS exact_a,
       CAST(SUM(in_b) AS BIGINT) AS exact_b,
       CAST(COUNT(*) AS BIGINT) AS exact_union,
       CAST(SUM(in_a * in_b) AS BIGINT) AS exact_inter,
       true AS union_ok,
       true AS inter_ok
FROM f
"""


# --- q103: approximate heavy hitters (approx_top_k) ----------------------
# approx_top_k tracks a bounded item→count map; at o_orderpriority's
# cardinality (5 < maxItemsTracked) the counts are EXACT, so this one is
# fully hash-oracled, not bound-checked: k=5 covers every priority,
# making the output tie-proof (the fixtures DO have a tied pair of
# priorities — covering all values makes rank irrelevant). At 100 TB
# the same call over a high-cardinality column degrades gracefully to
# approximate counts with the same plan shape (partial+final object
# hash aggregate).

def q103_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.agg(F.expr("approx_top_k(o_orderpriority, 5)").alias("__tk"))
        .select(F.explode("__tk").alias("__e"))
        .select(
            F.col("__e.item").alias("o_orderpriority"),
            F.col("__e.count").cast("bigint").alias("cnt"),
        )
    )


_Q103_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt
FROM orders
GROUP BY o_orderpriority
"""


# --- q247: count-min sketch heavy hitters (EXACT oracle) ------------------
# The mergeable sketch the built-in approx_top_k (q103) is not: the CMS
# is a (row, bucket, cnt) RELATION built with pinned universal-family
# hashes ((a·k + b) mod 2^31−1 mod width) over the portable rolling-
# hash key — pure int64 arithmetic, so DuckDB replays the ENTIRE sketch
# and the top-10 point-query estimates bit-for-bit (not just within the
# ε·N bound). lower_bounded pins the CMS guarantee (estimate ≥ truth,
# always) as an oracled column. Sketching runs over the DISTINCT-word
# relation with the count as weight — one pass, map-side combined, and
# the sketch is depth×width rows whatever the corpus size.

_Q247_DEPTH, _Q247_WIDTH = 4, 256


def q247_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cms import cms_build, cms_estimate
    from ..functions.text import rolling_hash_expr

    docs = tbl(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("true_cnt"))
        .withColumn("key", rolling_hash_expr("word"))
    )
    sketch = cms_build(
        wc, "key", weight_col="true_cnt",
        depth=_Q247_DEPTH, width=_Q247_WIDTH,
    )
    top = wc.orderBy(F.desc("true_cnt"), F.asc("word")).limit(10)
    est = cms_estimate(
        sketch, top.select("word", "true_cnt", "key"), "key",
        depth=_Q247_DEPTH, width=_Q247_WIDTH,
    )
    return est.select(
        "word",
        "true_cnt",
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") >= F.col("true_cnt")).alias("lower_bounded"),
    )


_Q247_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM toks WHERE length(word) >= 2 GROUP BY word
),
keyed AS (
  SELECT word, true_cnt,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(word) + 1),
                            i -> ascii(word[i]))),
           (acc, c) -> (acc * 31 + c) % 1000000007) AS key
  FROM wc
),
hrows(r, a, b) AS (VALUES
  (0, 1103515245, 12345), (1, 69069, 362437),
  (2, 1664525, 1013904223), (3, 22695477, 7777)
),
cms AS (
  SELECT r, ((a * key + b) % 2147483647) % {_Q247_WIDTH} AS bucket,
         CAST(SUM(true_cnt) AS BIGINT) AS cnt
  FROM keyed CROSS JOIN hrows
  GROUP BY r, ((a * key + b) % 2147483647) % {_Q247_WIDTH}
),
top AS (
  SELECT word, true_cnt, key FROM keyed
  ORDER BY true_cnt DESC, word LIMIT 10
)
SELECT t.word, t.true_cnt,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
       MIN(c.cnt) >= t.true_cnt AS lower_bounded
FROM top t
CROSS JOIN hrows h
JOIN cms c
  ON c.r = h.r
 AND c.bucket = ((h.a * t.key + h.b) % 2147483647) % {_Q247_WIDTH}
GROUP BY t.word, t.true_cnt
"""


QUERIES = {
    "q99_sketch_rollup": q99_sketch_rollup,
    "q100_regression": q100_regression,
    "q101_udtf_chunks": q101_udtf_chunks,
    "q102_theta_ops": q102_theta_ops,
    "q103_approx_topk": q103_approx_topk,
    "q247_cms_heavy_hitters": q247_cms_heavy_hitters,
}

ORACLE = {
    "q99_sketch_rollup": _Q99_SQL,
    "q100_regression": _Q100_SQL,
    "q101_udtf_chunks": _Q101_SQL,
    "q102_theta_ops": _Q102_SQL,
    "q103_approx_topk": _Q103_SQL,
    "q247_cms_heavy_hitters": _Q247_SQL,
}
