"""Relational depth, round 2: correlated EXISTS, exact moment statistics,
argmin/argmax aggregation, date-spine gap fill, exact median, and a
staged quality-filter funnel.

Determinism notes (same contract as the rest of the inventory):
- moment sums (q89) accumulate in DECIMAL and derive corr/covar/stddev
  from the exact sums with plain double arithmetic — the TEXTUALLY SAME
  formula runs on both engines, so results match bit-for-bit at any
  parallelism (native corr()/covar_pop() merge partial co-moments in
  nondeterministic order and would drift in the last ulp);
- argmin/argmax (q90) rides values verified tie-free in the fixtures —
  on tied data Spark's max_by picks an arbitrary row, so production use
  belongs behind the deterministic window form (q17);
- exact median (q92) selects middle ROWS by row_number, so duplicate
  values cannot make the picked value ambiguous.

Reference scope note: the reference has no analytics surface at all
(services/post_processing.py:5-8 is `pass`); these extend SURVEY §2b's
ABSENT rows (subqueries, aggregations, windows) the same way q26/q27 did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import DSUM_PINNED, tbl


# --- q88: correlated EXISTS / NOT EXISTS ---------------------------------
# Orders from 1995 that had a returned line item but never a deep
# discount. The DuckDB oracle keeps the EXISTS/NOT EXISTS form (the
# surface being covered); the Spark side writes out the decorrelated
# plan by hand — a left-semi and a left-anti hash join on l_orderkey —
# an independent formulation of what Catalyst's decorrelation rule
# produces (SURVEY §4), so a same-text bug cannot cancel in the hash
# compare. One shuffle per join, no per-row subquery execution; the
# pushed date filter shrinks the probe side before either join.

_Q88_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o.o_orderkey
                    AND l2.l_discount > 0.08)
GROUP BY o_orderpriority
"""


def q88_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    lineitem = tbl(spark, sf_dir, "lineitem")
    in_1995 = orders.filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1995-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-01-01'"))
    )
    returned_keys = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    discounted_keys = lineitem.filter(F.col("l_discount") > 0.08).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        in_1995.join(returned_keys, "o_orderkey", "left_semi")
        .join(discounted_keys, "o_orderkey", "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


# --- q89: exact moment statistics (corr / covar / stddev) ----------------
# One aggregation pass collects the five exact power sums; the moments
# come from closed-form double arithmetic on those sums. At 100 TB this
# is the same single partial+final hash aggregate as any SUM — the
# DECIMAL accumulators just make the merge order irrelevant.
#
# The power sums go decimal → STRING → double (the squared-price sum
# scaled by 10^6 exceeds 2^53): see _util.DSUM_PINNED for the rationale.

_dsum_exact = DSUM_PINNED


_Q89_SQL = f"""
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
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
       (n * sxy - sx * sy) / (n * n) AS covar_pop_qty_price,
       sqrt(n * sxx - sx * sx) / n AS stddev_pop_qty,
       sqrt(n * syy - sy * sy) / n AS stddev_pop_price
FROM s
"""


def q89_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame formulation (independent of the oracle's CTE text): one
    # groupBy collects the five pinned power sums, then a closed-form
    # projection — each aggregate/arithmetic expression reuses the
    # oracle's exact shape so the moments match bit-for-bit
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
        F.expr(
            "(n * sxy - sx * sy)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        ).alias("corr_qty_price"),
        F.expr("(n * sxy - sx * sy) / (n * n)").alias("covar_pop_qty_price"),
        F.expr("sqrt(n * sxx - sx * sx) / n").alias("stddev_pop_qty"),
        F.expr("sqrt(n * syy - sy * sy) / n").alias("stddev_pop_price"),
    )


# --- q90: argmin/argmax aggregation (min_by / max_by) --------------------
# Richest and poorest customer per nation in one hash aggregate — no
# join-back, no window. DuckDB twin: arg_max/arg_min. The acctbal values
# are tie-free in the fixtures (verified sf0.001-0.1); tied data needs
# the windowed top-k form (q17) for determinism.

def q90_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    agg = cust.groupBy("c_nationkey").agg(
        F.expr("max_by(c_name, c_acctbal)").alias("richest"),
        F.expr("min_by(c_name, c_acctbal)").alias("poorest"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
    )
    return (
        agg.join(F.broadcast(nation), agg.c_nationkey == nation.n_nationkey)
        .select("n_name", "richest", "poorest", "max_bal", "min_bal")
    )


_Q90_SQL = """
SELECT n_name,
       arg_max(c_name, c_acctbal) AS richest,
       arg_min(c_name, c_acctbal) AS poorest,
       MAX(c_acctbal) AS max_bal,
       MIN(c_acctbal) AS min_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- q91: date-spine gap fill --------------------------------------------
# Generator expression (sequence/generate_series) builds the calendar
# spine; a left join fills silent days with zero. The spine is a literal
# 90-row relation — broadcast, never shuffled; the aggregate side is the
# usual partial+final count.

_SPINE_START, _SPINE_END = "1995-01-01", "1995-03-31"


def q91_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    spine = spark.sql(
        f"SELECT explode(sequence(DATE'{_SPINE_START}', DATE'{_SPINE_END}',"
        " interval 1 day)) AS day"
    )
    daily = (
        orders.select(F.col("o_orderdate").cast("date").alias("day"))
        .groupBy("day")
        .count()
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("count", F.lit(0)).cast("bigint").alias("n_orders")
    )


_Q91_SQL = f"""
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '{_SPINE_START}',
                                     DATE '{_SPINE_END}',
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT spine.day, CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
FROM spine LEFT JOIN daily USING (day)
"""


# --- q92: exact median by middle-row selection ---------------------------
# The exact-percentile shape that scales: ONE sort per group partition
# (the window), then the middle row(s) by position — duplicate values
# cannot bias it, and even-n groups interpolate the two middle rows.
# Contrast q68/q80, the sketch path for when one exact sort is too much.

def q92_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    mid = ranked.filter(F.expr("rn = (n + 1) div 2 OR rn = (n + 2) div 2"))
    return mid.groupBy("l_returnflag").agg(
        F.first("n").alias("n"),
        ((F.min("l_extendedprice") + F.max("l_extendedprice")) / 2).alias(
            "median_price"
        ),
    )


_Q92_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey,
                                     l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       CAST(MIN(n) AS BIGINT) AS n,
       (MIN(l_extendedprice) + MAX(l_extendedprice)) / 2 AS median_price
FROM ranked
WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
GROUP BY l_returnflag
"""


# --- q93: staged quality-filter funnel -----------------------------------
# The pipeline-health view every corpus-cleaning job needs: how many
# documents survive each cumulative filter stage. One scan computes all
# stage flags; conditional sums produce the funnel — no repeated passes
# over the corpus, no self-joins.

_N_TOK = "size(split(text, ' '))"
_DRATIO = f"CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) / {_N_TOK}"
_QSCORE = f"least({_N_TOK} / 100.0D, 1.0D) * ({_DRATIO})"


def q93_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    flagged = docs.select(
        F.expr("lang = 'en'").alias("f1"),
        F.expr(f"{_N_TOK} BETWEEN 20 AND 400").alias("len_ok"),
        F.expr(f"{_DRATIO} >= 0.4D").alias("dr_ok"),
        F.expr(f"{_QSCORE} >= 0.15D").alias("q_ok"),
    ).select(
        "f1",
        F.expr("f1 AND len_ok").alias("f2"),
        F.expr("f1 AND len_ok AND dr_ok").alias("f3"),
        F.expr("f1 AND len_ok AND dr_ok AND q_ok").alias("f4"),
    )
    counts = flagged.agg(
        F.count("*").alias("n0"),
        F.count_if("f1").alias("n1"),
        F.count_if("f2").alias("n2"),
        F.count_if("f3").alias("n3"),
        F.count_if("f4").alias("n4"),
    )
    return counts.selectExpr(
        "stack(5,"
        " 0, 'total', n0,"
        " 1, 'lang_en', n1,"
        " 2, 'length_20_400', n2,"
        " 3, 'distinct_ratio', n3,"
        " 4, 'quality_score', n4"
        ") AS (stage_idx, stage, kept)"
    )


_Q93_SQL = """
WITH f AS (
  SELECT lang = 'en' AS f1,
         len(string_split(text, ' ')) BETWEEN 20 AND 400 AS len_ok,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) >= 0.4 AS dr_ok,
         least(len(string_split(text, ' ')) / 100.0, 1.0)
           * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' '))) >= 0.15 AS q_ok
  FROM documents
),
c AS (
  SELECT COUNT(*) AS n0,
         COUNT(*) FILTER (f1) AS n1,
         COUNT(*) FILTER (f1 AND len_ok) AS n2,
         COUNT(*) FILTER (f1 AND len_ok AND dr_ok) AS n3,
         COUNT(*) FILTER (f1 AND len_ok AND dr_ok AND q_ok) AS n4
  FROM f
)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'total' AS stage, CAST(n0 AS BIGINT) AS kept FROM c
  UNION ALL SELECT 1, 'lang_en', CAST(n1 AS BIGINT) FROM c
  UNION ALL SELECT 2, 'length_20_400', CAST(n2 AS BIGINT) FROM c
  UNION ALL SELECT 3, 'distinct_ratio', CAST(n3 AS BIGINT) FROM c
  UNION ALL SELECT 4, 'quality_score', CAST(n4 AS BIGINT) FROM c
)
"""


QUERIES = {
    "q88_exists_subquery": q88_exists_subquery,
    "q89_stats_moments": q89_stats_moments,
    "q90_argminmax": q90_argminmax,
    "q91_date_spine": q91_date_spine,
    "q92_exact_median": q92_exact_median,
    "q93_quality_funnel": q93_quality_funnel,
}

ORACLE = {
    "q88_exists_subquery": _Q88_SQL,
    "q89_stats_moments": _Q89_SQL,
    "q90_argminmax": _Q90_SQL,
    "q91_date_spine": _Q91_SQL,
    "q92_exact_median": _Q92_SQL,
    "q93_quality_funnel": _Q93_SQL,
}


# --- q270: exact grouped WEIGHTED percentiles ------------------------------
# q92's exact-percentile discipline extended to weighted data — the
# shape a token-weighted corpus statistic needs (e.g. "the document
# length below which half the TOKENS live", not half the documents).
# One sorted window per group computes the running weight; the
# weighted p-quantile (lower flavor) is the FIRST row whose cumulative
# weight reaches p·W, and because qualifying rows form a suffix of the
# sort order, that boundary row's value is simply MIN(value) over the
# qualifying rows — one window pass + one aggregate, no second sort,
# all comparisons in exact integer arithmetic (weights are bigint,
# p·W tests are cross-multiplied: 2·cum ≥ W, 10·cum ≥ 9·W).

def q270_weighted_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wc = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(F.col("l_quantity").cast("bigint")).over(wo).alias("cum"),
        F.sum(F.col("l_quantity").cast("bigint")).over(wc).alias("tw"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.max("tw").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cum") >= F.col("tw"), F.col("l_extendedprice"))
        ).alias("w_median"),
        F.min(
            F.when(
                10 * F.col("cum") >= 9 * F.col("tw"),
                F.col("l_extendedprice"),
            )
        ).alias("w_p90"),
    )


_Q270_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       CAST(MAX(tw) AS BIGINT) AS total_weight,
       MIN(CASE WHEN 2 * cum >= tw THEN l_extendedprice END) AS w_median,
       MIN(CASE WHEN 10 * cum >= 9 * tw THEN l_extendedprice END) AS w_p90
FROM ranked
GROUP BY l_returnflag
"""


QUERIES["q270_weighted_percentiles"] = q270_weighted_percentiles
ORACLE["q270_weighted_percentiles"] = _Q270_SQL


# --- q279: SAMPLED grouped weighted percentiles + error bound ---------------
# q270's scale twin, built the way q265 twinned q92: the exact weighted
# kernel is a per-group sorted window — inherent to the exact statistic
# and documented as small-group-only — so the 100 TB path runs the SAME
# integer-exact kernel over the deterministic portable hash sample
# (transform/sampling.py sampled_weighted_quantiles; key = the unique
# integer 8·l_orderkey + l_linenumber, p = 1/4). Quantiles are weight
# PROPORTIONS, so the sampled estimate needs no 1/p correction — the
# thresholds just test against the sample's own total weight. The q189
# discipline pins the accuracy as part of the gate: each estimate's
# TRUE cumulative-weight rank in the FULL relation must sit within
# ±0.08 of its target (cross-multiplied integer comparison — no
# floating point anywhere), so the oracle replays sample, estimate,
# AND error bound bit-for-bit.

def q279_sampled_weighted_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..transform.sampling import sampled_weighted_quantiles

    li = tbl(spark, sf_dir, "lineitem").withColumn(
        "__key", F.expr("l_orderkey * 8 + l_linenumber")
    )
    est = sampled_weighted_quantiles(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity",
        "__key", p=0.25, quantiles=[0.5, 0.9],
    )
    w = F.col("l_quantity").cast("bigint")
    ranks = (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(w).alias("W"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("wq_05"), w)
                .otherwise(F.lit(0))
            ).alias("cum05"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("wq_09"), w)
                .otherwise(F.lit(0))
            ).alias("cum09"),
        )
    )
    return (
        est.join(ranks, "l_returnflag")
        .select(
            "l_returnflag", "n_sampled", "sampled_weight",
            "wq_05", "wq_09",
            (
                F.abs(100 * F.col("cum05") - 50 * F.col("W"))
                <= 8 * F.col("W")
            ).alias("median_rank_ok"),
            (
                F.abs(100 * F.col("cum09") - 90 * F.col("W"))
                <= 8 * F.col("W")
            ).alias("p90_rank_ok"),
        )
        .orderBy("l_returnflag")
    )


_Q279_SQL = """
WITH s AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(l_quantity AS BIGINT) AS w,
         l_orderkey * 8 + l_linenumber AS k
  FROM lineitem
  WHERE ((((((l_orderkey * 8 + l_linenumber) % 2147483648)
            * ((l_orderkey * 8 + l_linenumber) % 2147483648))
           % 2147483648) * 1220703125) % 2147483648
         + (((l_orderkey * 8 + l_linenumber) % 2147483648) * 987654323)
           % 2147483648) % 2147483648
        < 536870912
),
ranked AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(w) OVER (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice, k
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM s
),
est AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_sampled,
         CAST(MAX(tw) AS BIGINT) AS sampled_weight,
         MIN(CASE WHEN 2 * cum >= tw THEN l_extendedprice END) AS wq_05,
         MIN(CASE WHEN 10 * cum >= 9 * tw THEN l_extendedprice END)
           AS wq_09
  FROM ranked GROUP BY l_returnflag
),
fw AS (
  SELECT l.l_returnflag,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS W,
         CAST(SUM(CASE WHEN l.l_extendedprice <= e.wq_05
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
              AS BIGINT) AS cum05,
         CAST(SUM(CASE WHEN l.l_extendedprice <= e.wq_09
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
              AS BIGINT) AS cum09
  FROM lineitem l JOIN est e ON e.l_returnflag = l.l_returnflag
  GROUP BY 1
)
SELECT e.l_returnflag, e.n_sampled, e.sampled_weight, e.wq_05, e.wq_09,
       abs(100 * f.cum05 - 50 * f.W) <= 8 * f.W AS median_rank_ok,
       abs(100 * f.cum09 - 90 * f.W) <= 8 * f.W AS p90_rank_ok
FROM est e JOIN fw f ON f.l_returnflag = e.l_returnflag
ORDER BY e.l_returnflag
"""

QUERIES["q279_sampled_weighted_percentiles"] = (
    q279_sampled_weighted_percentiles
)
ORACLE["q279_sampled_weighted_percentiles"] = _Q279_SQL
