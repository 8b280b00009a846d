"""Classic OLAP/product-analytics workloads: histogram binning,
period-over-period growth, cohort retention, and multi-step funnels.

These are the dashboard queries a warehouse on this engine serves daily;
each lowers to scans + one or two hash aggregates + (for the windowed
ones) a single partition-key shuffle — no self-joins, no driver loops.

Reference scope note: the reference's analytics surface is an empty stub
(services/post_processing.py:5-8); these extend SURVEY §2b's aggregation
and window rows the same way q10-q17 did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.local import local_relation

from ._util import DSUM, tbl


# --- q94: fixed-width histogram ------------------------------------------
# Bin id by integer arithmetic on the value — the binning that scales:
# no per-row width_bucket table lookup, no pre-pass for min/max, one
# hash aggregate. (Data-dependent bounds would add one tiny scalar
# subquery, computed once.)

_BIN = 50_000


def q94_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.select(
            F.floor(F.col("o_totalprice") / F.lit(float(_BIN)))
            .cast("int")
            .alias("bin"),
            "o_totalprice",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(DSUM("o_totalprice")).alias("bin_revenue"),
        )
        .select(
            "bin",
            (F.col("bin") * _BIN).cast("double").alias("bin_lo"),
            ((F.col("bin") + 1) * _BIN).cast("double").alias("bin_hi"),
            "n_orders",
            "bin_revenue",
        )
    )


_Q94_SQL = f"""
SELECT bin,
       CAST(bin * {_BIN} AS DOUBLE) AS bin_lo,
       CAST((bin + 1) * {_BIN} AS DOUBLE) AS bin_hi,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {DSUM('o_totalprice')} AS bin_revenue
FROM (SELECT CAST(FLOOR(o_totalprice / {_BIN}.0) AS INT) AS bin, o_totalprice
      FROM orders)
GROUP BY bin
"""


# --- q95: month-over-month revenue growth --------------------------------
# Two-level: monthly hash aggregate (shuffles |months| rows), then lag()
# over the tiny monthly series. The growth division runs on the exact
# DECIMAL-accumulated sums → bit-stable across engines.

def q95_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            "o_totalprice",
        )
        .groupBy("month")
        .agg(F.expr(DSUM("o_totalprice")).alias("revenue"))
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (
            (F.col("revenue") - F.lag("revenue").over(w))
            / F.lag("revenue").over(w)
        ).alias("mom_growth"),
    )


_Q95_SQL = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         {DSUM('o_totalprice')} AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       lag(revenue) OVER (ORDER BY month) AS prev_revenue,
       (revenue - lag(revenue) OVER (ORDER BY month))
         / lag(revenue) OVER (ORDER BY month) AS mom_growth
FROM monthly
"""


# --- q96: weekly cohort retention ----------------------------------------
# Cohort = ISO week of the user's first event; retention = distinct
# users from that cohort active k weeks later. Two aggregates and one
# broadcast-back of the (tiny) per-user cohort map — the corpus-side
# event scan shuffles once on user_id.

def q96_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    acts = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("act_week")
    ).distinct()
    return (
        acts.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


_Q96_SQL = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
acts AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
)
SELECT cohort_week,
       CAST(FLOOR(datediff('day', cohort_week, act_week) / 7.0) AS INT)
         AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM acts JOIN firsts USING (user_id)
GROUP BY 1, 2
"""


# --- q97: ordered multi-step event funnel --------------------------------
# signup → view → click → purchase, each step's first occurrence
# strictly after the previous step's. ONE conditional-min aggregate per
# user computes all step timestamps in a single pass (no per-step
# self-joins — at 100 TB a 4-step funnel as self-joins is 4 shuffles of
# the full event log; this is one).

def q97_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count_if(F.col("t_signup").isNotNull()).alias("did_signup"),
        F.count_if(F.col("t_view") > F.col("t_signup")).alias(
            "then_viewed"
        ),
        F.count_if(
            (F.col("t_view") > F.col("t_signup"))
            & (F.col("t_click") > F.col("t_view"))
        ).alias("then_clicked"),
        F.count_if(
            (F.col("t_view") > F.col("t_signup"))
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_purchase") > F.col("t_click"))
        ).alias("then_purchased"),
    )


_Q97_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(ts) FILTER (event_type = 'signup') AS t_signup,
         MIN(ts) FILTER (event_type = 'view') AS t_view,
         MIN(ts) FILTER (event_type = 'click') AS t_click,
         MIN(ts) FILTER (event_type = 'purchase') AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(*) FILTER (t_signup IS NOT NULL) AS BIGINT) AS did_signup,
       CAST(COUNT(*) FILTER (t_view > t_signup) AS BIGINT) AS then_viewed,
       CAST(COUNT(*) FILTER (t_view > t_signup AND t_click > t_view)
            AS BIGINT) AS then_clicked,
       CAST(COUNT(*) FILTER (t_view > t_signup AND t_click > t_view
                             AND t_purchase > t_click)
            AS BIGINT) AS then_purchased
FROM per_user
"""



# --- q98: first/last/nth value windows -----------------------------------
# The order-position analytics family (first_value/last_value/nth_value)
# with the full-partition frame; one row per order via DISTINCT over the
# windowed projection — one shuffle on l_orderkey. The fixture's
# l_linenumber is NOT unique within an order, so the ordering carries
# the full payload tiebreak (any remaining tie is a bit-identical row
# and cannot change the selected values).

def q98_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame formulation (Window API with an explicit unbounded
    frame); the SQL below runs only in DuckDB — independent twins."""
    li = tbl(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice",
            "l_quantity",
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w).alias("last_price"),
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
        F.count("*").over(w).alias("n_lines"),
    ).distinct()


_Q98_SQL = """
SELECT DISTINCT l_orderkey,
       first_value(l_extendedprice) OVER w AS first_price,
       last_value(l_extendedprice) OVER w AS last_price,
       nth_value(l_extendedprice, 2) OVER w AS second_price,
       COUNT(*) OVER w AS n_lines
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice,
                      l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- q104: decile banding (ntile) ----------------------------------------
# Global ntile needs a total order, which plans as a single-partition
# window sort — fine for |customer|-sized dims; at fact-table scale the
# scalable variant is approx-quantile cutpoints + a broadcast bucket
# join (the q68/q80 sketch path). Tiebreak on c_custkey makes the
# banding deterministic under any parallelism.

def q104_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            F.ntile(10).over(w).alias("decile"), "c_acctbal"
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.expr(DSUM("c_acctbal")).alias("sum_bal"),
        )
    )


_Q104_SQL = f"""
WITH d AS (
  SELECT NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile,
         c_acctbal
  FROM customer
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       {DSUM('c_acctbal')} AS sum_bal
FROM d
GROUP BY decile
"""


# --- q236: decile banding at FACT-TABLE scale ----------------------------
# q104's global ntile plans as a single-partition window sort — the
# right shape for dim tables, a scale-killer on facts. This is the
# documented scalable variant (q104 header): approx-quantile CUTPOINTS
# (one sketch aggregate, rank error <= n/accuracy) collected as a
# 9-value control-plane row, then a 10-row broadcast bucket-range join
# bands every fact row map-side — no global sort, no single-partition
# window, one pass over the fact table. The banding is approximate at
# the decile BOUNDARIES only (sketch rank error), so the oracle is a
# property gate, q79/q80-style: exactly 10 bands in order, every
# band's share within 2% of 10% (accuracy=10000 bounds rank error to
# 0.01%; 2% is generous slack), exact total row count.

def q236_fact_scale_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    qs = [i / 10.0 for i in range(1, 10)]
    cuts = li.agg(
        F.percentile_approx("l_extendedprice", qs, 10000).alias("c")
    ).first()["c"]
    lo = [float("-inf")] + [float(c) for c in cuts]
    hi = [float(c) for c in cuts] + [float("inf")]
    buckets = local_relation(spark, 
        [(d + 1, lo[d], hi[d]) for d in range(10)],
        "decile int, lo double, hi double",
    )
    banded = li.join(
        F.broadcast(buckets),
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") < F.col("hi")),
    )
    per = banded.groupBy("decile").agg(
        F.count("*").alias("__n"),
        F.min("l_extendedprice").alias("__min"),
        F.max("l_extendedprice").alias("__max"),
    )
    total = li.count()
    return (
        per.select(
            "decile",
            F.lit(total).cast("bigint").alias("n_rows_total"),
            (
                F.abs(F.col("__n").cast("double") / F.lit(total) - 0.1)
                <= 0.02
            ).alias("share_ok"),
            (F.col("__min") <= F.col("__max")).alias("ordered_ok"),
        )
        .orderBy("decile")
    )


_Q236_SQL = """
SELECT CAST(r AS INT) AS decile,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows_total,
       true AS share_ok,
       true AS ordered_ok
FROM range(1, 11) t(r)
ORDER BY 1
"""


# --- q105: gaps and islands (consecutive-day activity streaks) -----------
# The classic islands trick: day minus row_number is constant within a
# consecutive run, so one distinct + one per-user window sort + two hash
# aggregates find every streak — no self-join, no iteration. Shuffles
# once on user_id; at 100 TB the distinct-days pre-aggregate collapses
# the data to |users|×|days| rows before the window.

def q105_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    streaks = (
        days.select(
            "user_id",
            F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
        )
        .groupBy("user_id", "anchor")
        .agg(F.count("*").alias("len"))
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.count("*").alias("n_streaks"),
    )


_Q105_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
i AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INT) AS anchor
  FROM days
),
g AS (SELECT user_id, anchor, COUNT(*) AS len FROM i GROUP BY 1, 2)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS max_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM g
GROUP BY user_id
"""


# --- q106: VARIANT ingestion (Spark 4 semi-structured type) --------------
# parse_json once into a VARIANT, typed variant_get extraction after —
# the Spark 4 path for semi-structured columns (vs q22's per-field
# get_json_object string re-parse). VARIANT keeps a binary-encoded tree,
# so N field extractions parse the document once, not N times — at
# 100 TB of event payloads that's the difference between one decode and
# N. DuckDB twin: json_extract_string + CAST.

def q106_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        events.select(
            "event_type",
            # floor-then-cast in BOTH engines: a bare CAST(double AS INT)
            # truncates in Spark but rounds in DuckDB
            F.floor(k / F.lit(10)).cast("int").alias("k_bucket"),
            "value",
        )
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.expr(DSUM("value")).alias("total_value"),
        )
    )


_Q106_SQL = f"""
SELECT event_type,
       CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INT) / 10.0)
            AS INT) AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       {DSUM('value')} AS total_value
FROM events
GROUP BY event_type, k_bucket
"""


# --- q171: cumulative distinct users (the DAU / cumulative-uniques view) --
# Spark (like every engine) refuses COUNT(DISTINCT) over a running
# window — the classic rewrite is FIRST-OCCURRENCE FLAGGING: a user's
# first active day contributes 1 to "new users" there, and the running
# sum of new users IS the cumulative distinct count (each unique user
# counted exactly once, at first sight). DAU rides along from a daily
# distinct aggregate.
# Plan: two aggregates off one scan — (type, user) min-day, and
# (type, day, user) distinct — joined at day grain (output-sized, tiny);
# the running sum is a window over |types|×|days| rows. At 100 TB both
# aggregates are single-shuffle partial+final; nothing at row grain
# survives past the first exchange.

def q171_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events").select(
        "event_type", "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    first_day = (
        ev.groupBy("event_type", "user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("new_users"))
    )
    dau = ev.distinct().groupBy("event_type", "day").agg(
        F.count("*").alias("dau")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dau.join(first_day, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
        )
        .withColumn(
            "cum_unique_users", F.sum("new_users").over(w).cast("bigint")
        )
    )


_Q171_SQL = """
WITH ev AS (
  SELECT event_type, user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
first_day AS (
  SELECT event_type, day, COUNT(*) AS new_users FROM (
    SELECT event_type, user_id, MIN(day) AS day
    FROM ev GROUP BY event_type, user_id
  ) GROUP BY event_type, day
),
dau AS (
  SELECT event_type, day, COUNT(*) AS dau
  FROM (SELECT DISTINCT event_type, user_id, day FROM ev)
  GROUP BY event_type, day
)
SELECT d.event_type, d.day,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(COALESCE(f.new_users, 0) AS BIGINT) AS new_users,
       CAST(SUM(COALESCE(f.new_users, 0)) OVER (
         PARTITION BY d.event_type ORDER BY d.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_unique_users
FROM dau d LEFT JOIN first_day f
  ON d.event_type = f.event_type AND d.day = f.day
"""


# --- q172: median absolute deviation + robust outlier counts --------------
# The robust alternative to q163's z-score: MAD ignores the outliers
# themselves (mean/stddev don't), so one corrupt batch can't widen its
# own acceptance band. Two exact medians via the q92 middle-row idiom
# (unique tiebreaks; no engine-specific interpolation), then a
# conservative 3×MAD outlier gate.
# Plan: two window sorts on the same (event_type)-partitioned data —
# medians at 100 TB would come from the sketch path (q68) instead, with
# this exact form as the verification twin on samples.

def q172_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events").select("event_type", "event_id", "value")

    def exact_median(df, val, out):
        w = Window.partitionBy("event_type").orderBy(val, "event_id")
        wc = Window.partitionBy("event_type")
        ranked = df.select(
            "event_type",
            "event_id",
            F.col(val),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n"),
        )
        mid = ranked.filter(F.expr("rn = (n + 1) div 2 OR rn = (n + 2) div 2"))
        return mid.groupBy("event_type").agg(
            ((F.min(val) + F.max(val)) / 2).alias(out)
        )

    med = exact_median(ev, "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "value",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
        "med",
    )
    mad = exact_median(dev, "dev", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.first("med").alias("median_value"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > 3.0 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_Q172_SQL = """
WITH med AS (
  SELECT event_type, (MIN(value) + MAX(value)) / 2 AS med
  FROM (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
  )
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value,
         ABS(e.value - m.med) AS dev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, (MIN(dev) + MAX(dev)) / 2 AS mad
  FROM (
    SELECT event_type, dev,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY dev, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM dev
  )
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(d.med) AS median_value,
       MIN(a.mad) AS mad,
       CAST(SUM(CASE WHEN d.dev > 3.0 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad a ON d.event_type = a.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


# --- q174: first/last-touch purchase attribution --------------------------
# For every purchase, which engagement event (view/click) most recently
# preceded it (last touch) and which opened the journey (first touch)?
# ONE window pass with a frame ending at 1 PRECEDING computes both —
# no per-purchase self-join against the event history (which at 100 TB
# would shuffle the full log once per touch model).
# Plan: one window exchange on user_id; the final rollup is
# |touch-type|² rows.

def q174_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin("view", "click"), F.col("event_type"))
    tagged = ev.select(
        "user_id",
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.expr(DSUM("value")).alias("attributed_value"),
        )
        .orderBy("first_touch", "last_touch")
    )


_Q174_SQL = f"""
WITH tagged AS (
  SELECT user_id, event_type, value,
    LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                    THEN event_type END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
    FIRST_VALUE(CASE WHEN event_type IN ('view', 'click')
                     THEN event_type END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
  FROM events
)
SELECT COALESCE(first_touch, 'none') AS first_touch,
       COALESCE(last_touch, 'none') AS last_touch,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       {DSUM('value')} AS attributed_value
FROM tagged
WHERE event_type = 'purchase'
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "q94_histogram": q94_histogram,
    "q98_window_firstlast": q98_window_firstlast,
    "q95_mom_growth": q95_mom_growth,
    "q96_cohort_retention": q96_cohort_retention,
    "q97_event_funnel": q97_event_funnel,
    "q104_ntile_deciles": q104_ntile_deciles,
    "q236_fact_scale_deciles": q236_fact_scale_deciles,
    "q105_gaps_islands": q105_gaps_islands,
    "q106_variant_json": q106_variant_json,
    "q171_cumulative_distinct": q171_cumulative_distinct,
    "q172_mad_outliers": q172_mad_outliers,
    "q174_attribution": q174_attribution,
}

ORACLE = {
    "q94_histogram": _Q94_SQL,
    "q98_window_firstlast": _Q98_SQL,
    "q95_mom_growth": _Q95_SQL,
    "q96_cohort_retention": _Q96_SQL,
    "q97_event_funnel": _Q97_SQL,
    "q104_ntile_deciles": _Q104_SQL,
    "q236_fact_scale_deciles": _Q236_SQL,
    "q105_gaps_islands": _Q105_SQL,
    "q106_variant_json": _Q106_SQL,
    "q171_cumulative_distinct": _Q171_SQL,
    "q172_mad_outliers": _Q172_SQL,
    "q174_attribution": _Q174_SQL,
}



# --- q178: A/B experiment readout (two-sample z statistic) ----------------
# The experimentation query: deterministic hash-based arm assignment
# (q119's content-hash idiom — reproducible, engine-identical, never
# rand()), then per-(metric, arm) moment aggregates and the pooled
# two-sample z = (mean_t - mean_c) / sqrt(var_c/n_c + var_t/n_t).
# Moments go through DECIMAL accumulation; sqrt is IEEE-exact — the
# whole readout is bit-stable with no transcendentals.
# Plan: one hash aggregate over (event_type, arm) then a 5-row pivot via
# conditional aggregation — scan-bound at any scale.

def q178_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    arm = F.expr(
        "instr('0123456789abcdef',"
        " substring(md5(CAST(user_id AS STRING)), 1, 1)) % 2"
    )
    tagged = ev.select("event_type", "value", arm.alias("arm"))
    per = tagged.groupBy("event_type", "arm").agg(
        F.count("*").alias("n"),
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)"
            " / COUNT(value)"
        ).alias("mean"),
        F.expr(
            "CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)"
            " / COUNT(value)"
        ).alias("sq"),
    )
    per = per.withColumn(
        "var", F.greatest(F.lit(0.0), F.col("sq") - F.col("mean") * F.col("mean"))
    )
    c = lambda col, a: F.min(F.when(F.col("arm") == a, F.col(col)))  # noqa: E731
    wide = per.groupBy("event_type").agg(
        c("n", 0).cast("bigint").alias("n_control"),
        c("n", 1).cast("bigint").alias("n_treat"),
        c("mean", 0).alias("mean_control"),
        c("mean", 1).alias("mean_treat"),
        c("var", 0).alias("var_control"),
        c("var", 1).alias("var_treat"),
    )
    se = F.sqrt(
        F.col("var_control") / F.col("n_control")
        + F.col("var_treat") / F.col("n_treat")
    )
    return wide.select(
        "*",
        (F.col("mean_treat") - F.col("mean_control")).alias("lift"),
        F.when(
            se > 0.0, (F.col("mean_treat") - F.col("mean_control")) / se
        ).alias("z"),
    ).orderBy("event_type")


_Q178_SQL = """
WITH tagged AS (
  SELECT event_type, value,
         strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS arm
  FROM events
),
per AS (
  SELECT event_type, arm,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value)
           AS mean,
         CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
           / COUNT(value) AS sq
  FROM tagged GROUP BY 1, 2
),
v AS (
  SELECT *, GREATEST(0.0, sq - mean * mean) AS var FROM per
),
wide AS (
  SELECT event_type,
         CAST(MIN(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_control,
         CAST(MIN(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_treat,
         MIN(CASE WHEN arm = 0 THEN mean END) AS mean_control,
         MIN(CASE WHEN arm = 1 THEN mean END) AS mean_treat,
         MIN(CASE WHEN arm = 0 THEN var END) AS var_control,
         MIN(CASE WHEN arm = 1 THEN var END) AS var_treat
  FROM v GROUP BY event_type
)
SELECT *,
       mean_treat - mean_control AS lift,
       CASE WHEN sqrt(var_control / n_control + var_treat / n_treat) > 0.0
            THEN (mean_treat - mean_control)
                 / sqrt(var_control / n_control + var_treat / n_treat)
       END AS z
FROM wide
ORDER BY event_type
"""


QUERIES["q178_ab_test"] = q178_ab_test
ORACLE["q178_ab_test"] = _Q178_SQL


# --- q187: time-boxed conversion funnel -----------------------------------
# q97 measures ordered funnels with no deadline; real conversion
# metrics are time-boxed — "purchased within 24 h of first click".
# Two passes: per-user first-click times (one aggregate), then a join
# back onto the purchase stream with the window predicate and a
# per-user min. Deterministic: timestamps are exact micros; the
# hours-to-convert average divides exact DECIMAL-summed second counts.
# Plan: both aggregates shuffle on user_id; the first-click relation is
# |users| rows (broadcastable at fixture scale, co-partitioned shuffle
# at 100 TB — same key, so AQE reuses the exchange).

def q187_timeboxed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.min("ts").alias("t_click")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("t_buy")
    )
    conv = (
        purchases.join(clicks, "user_id")
        .filter(
            (F.col("t_buy") > F.col("t_click"))
            & (F.col("t_buy") <= F.col("t_click") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("t_buy").alias("t_conv"), F.first("t_click").alias("t_click"))
    )
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    n_clicked = clicks.agg(F.count("*").cast("bigint").alias("n_clicked"))
    conv_agg = conv.agg(
        F.count("*").cast("bigint").alias("n_converted_24h"),
        F.expr(
            "CAST(SUM(CAST(unix_micros(t_conv) - unix_micros(t_click)"
            " AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) / 3600000000.0"
        ).alias("avg_hours_to_convert"),
    )
    return (
        n_users.join(F.broadcast(n_clicked)).join(F.broadcast(conv_agg))
    )


_Q187_SQL = """
WITH clicks AS (
  SELECT user_id, MIN(ts) AS t_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
conv AS (
  SELECT p.user_id, MIN(p.ts) AS t_conv, MIN(c.t_click) AS t_click
  FROM events p JOIN clicks c ON p.user_id = c.user_id
  WHERE p.event_type = 'purchase'
    AND p.ts > c.t_click
    AND p.ts <= c.t_click + INTERVAL 24 HOURS
  GROUP BY p.user_id
)
SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
         AS n_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM clicks) AS n_clicked,
       CAST(COUNT(*) AS BIGINT) AS n_converted_24h,
       CAST(SUM(CAST(epoch_us(t_conv) - epoch_us(t_click) AS DECIMAL(28,6)))
            AS DOUBLE) / COUNT(*) / 3600000000.0 AS avg_hours_to_convert
FROM conv
"""


QUERIES["q187_timeboxed_funnel"] = q187_timeboxed_funnel
ORACLE["q187_timeboxed_funnel"] = _Q187_SQL


# --- q209: CUPED variance-reduced A/B readout -----------------------------
# The production upgrade of q178's raw readout (Deng et al., WSDM'13 —
# standard at every experimentation platform): per user, Y = total value
# in the experiment period (Jan 15+), X = total value in the pre-period
# (before Jan 15, unaffected by treatment BY CONSTRUCTION). theta =
# cov(X,Y)/var(X) pooled over all users; the adjusted metric
# Y' = Y - theta*(X - mean(X)) has the same expected lift but variance
# shrunk by the squared X-Y correlation. Everything derives from SIX
# decimal-accumulated moments (n, Sx, Sy, Sxy, Sxx, Syy — the q183
# idiom), per arm and pooled; theta and the adjusted means/variances are
# then deterministic double arithmetic, and the reported doubles are
# ROUND(•,9) (mid-pipeline double→DECIMAL casts can drift an ulp
# cross-engine; q181 precedent). Users with no pre-period events carry
# X = 0 — a value, not a null, so they stay in the adjustment.
# Plan: ONE scan of events (conditional sums split the periods), one
# per-user aggregate, one global + one per-arm moment aggregate over
# the user-level relation; everything after the user rollup is
# arm-cardinality-sized. Scan-bound at any scale.
# Honest fixture note: the synthetic stream's pre/post user totals are
# nearly independent (theta ~ 0.07), so the variance reduction here is
# small — on real metrics (retention-heavy, correlated across weeks)
# theta is 0.5-0.9 and the reduction is the method's entire point. The
# readout still pins the full moment/theta/adjustment arithmetic.

def q209_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    cutoff = "TIMESTAMP '2024-01-15 00:00:00'"
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN ts < {cutoff} THEN"
                " CAST(value AS DECIMAL(28,6)) ELSE CAST(0 AS"
                " DECIMAL(28,6)) END) AS DOUBLE)"
            ).alias("x"),
            F.expr(
                f"CAST(SUM(CASE WHEN ts >= {cutoff} THEN"
                " CAST(value AS DECIMAL(28,6)) ELSE CAST(0 AS"
                " DECIMAL(28,6)) END) AS DOUBLE)"
            ).alias("y"),
        )
        .select(
            "x",
            "y",
            F.expr(
                "instr('0123456789abcdef',"
                " substring(md5(CAST(user_id AS STRING)), 1, 1)) % 2"
            ).alias("arm"),
        )
    )
    M = lambda e: (  # noqa: E731
        f"CAST(CAST(SUM(CAST(({e}) AS DECIMAL(28,6))) AS STRING) AS DOUBLE)"
    )
    pooled = per_user.agg(
        F.count("*").alias("n"),
        F.expr(M("x")).alias("sx"),
        F.expr(M("y")).alias("sy"),
        F.expr(M("x * y")).alias("sxy"),
        F.expr(M("x * x")).alias("sxx"),
    ).collect()[0]  # O(1) driver scalars (control plane, q126 precedent)
    n = pooled["n"]
    mean_x = pooled["sx"] / n
    var_x = pooled["sxx"] / n - mean_x * mean_x
    cov_xy = pooled["sxy"] / n - mean_x * (pooled["sy"] / n)
    theta = cov_xy / var_x
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.expr(M("x")).alias("sx"),
        F.expr(M("y")).alias("sy"),
        F.expr(M("x * y")).alias("sxy"),
        F.expr(M("x * x")).alias("sxx"),
        F.expr(M("y * y")).alias("syy"),
    )
    na = F.col("n_users").cast("double")
    mx, my = F.col("sx") / na, F.col("sy") / na
    var_y = F.col("syy") / na - my * my
    var_xa = F.col("sxx") / na - mx * mx
    cov_a = F.col("sxy") / na - mx * my
    var_adj = (
        var_y
        - F.lit(2.0) * F.lit(theta) * cov_a
        + F.lit(theta) * F.lit(theta) * var_xa
    )
    return arms.select(
        F.col("arm").cast("int").alias("arm"),
        "n_users",
        F.round(my, 9).alias("mean_raw"),
        F.round(
            my - F.lit(theta) * (mx - F.lit(mean_x)), 9
        ).alias("mean_cuped"),
        F.round(var_y, 9).alias("var_raw"),
        F.round(var_adj, 9).alias("var_cuped"),
        F.round(F.lit(theta), 9).alias("theta"),
    ).orderBy("arm")


_Q209_SQL = """
WITH per_user AS (
  SELECT
    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN
      CAST(value AS DECIMAL(28,6)) ELSE CAST(0 AS DECIMAL(28,6)) END)
      AS DOUBLE) AS x,
    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN
      CAST(value AS DECIMAL(28,6)) ELSE CAST(0 AS DECIMAL(28,6)) END)
      AS DOUBLE) AS y,
    strpos('0123456789abcdef',
           substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS arm
  FROM events GROUP BY user_id
),
pooled AS (
  SELECT COUNT(*) AS n,
    CAST(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sx,
    CAST(CAST(SUM(CAST(y AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sxy,
    CAST(CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sxx
  FROM per_user
),
g AS (
  SELECT sx / n AS mean_x,
         (sxy / n - (sx / n) * (sy / n))
           / (sxx / n - (sx / n) * (sx / n)) AS theta
  FROM pooled
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sx,
    CAST(CAST(SUM(CAST(y AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sxy,
    CAST(CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sxx,
    CAST(CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS syy
  FROM per_user GROUP BY arm
)
SELECT CAST(arm AS INT) AS arm,
       n_users,
       ROUND(sy / n_users, 9) AS mean_raw,
       ROUND(sy / n_users
             - g.theta * (sx / n_users - g.mean_x), 9) AS mean_cuped,
       ROUND(syy / n_users - (sy / n_users) * (sy / n_users), 9)
         AS var_raw,
       ROUND(syy / n_users - (sy / n_users) * (sy / n_users)
             - 2 * g.theta * (sxy / n_users
                              - (sx / n_users) * (sy / n_users))
             + g.theta * g.theta
               * (sxx / n_users - (sx / n_users) * (sx / n_users)), 9)
         AS var_cuped,
       ROUND(g.theta, 9) AS theta
FROM arms, g
ORDER BY arm
"""

QUERIES["q209_cuped"] = q209_cuped
ORACLE["q209_cuped"] = _Q209_SQL


# --- q211: time-decay multi-touch attribution -----------------------------
# The decay-weighted middle ground between q174's first/last-touch
# models: every purchase distributes its value over ALL preceding
# touchpoints (view/click/signup) in a 72 h lookback, weighted
# 2^-floor(hours/12) — half-life 12 h as EXACT binary scalings
# (1 / (1 << k), k in 0..5; no pow(), no libm). Every weight is a
# multiple of 2^-6, so the per-purchase normalizer is an EXACT double
# sum regardless of addition order (no decimal detour needed until the
# final per-type credit sums, which ride the string hop).
# Plan: the purchase-to-touch relation is a per-user interval join
# (equi-join on user_id + time-band residual — the q08/q54b shape, AQE
# splits hot users); the normalizer is one window sum over the credit
# relation; unattributed purchases surface as an explicit 'none' row
# via anti-join, so the credited total reconciles to total purchase
# value by construction.

def q211_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    t = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    joined = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (
            (F.col("t_ts") < F.col("p_ts"))
            | (
                (F.col("t_ts") == F.col("p_ts"))
                & (F.col("t_id") < F.col("p_id"))
            )
        )
        & (
            F.expr("unix_micros(p_ts) - unix_micros(t_ts)")
            <= 72 * 3600 * 1000000
        ),
    ).withColumn(
        "w",
        F.expr(
            "CAST(1 AS DOUBLE) / CAST(shiftleft(1, CAST("
            "floor((unix_micros(p_ts) - unix_micros(t_ts))"
            " / (12.0 * 3600 * 1000000)) AS INT)) AS DOUBLE)"
        ),
    )
    wsum = Window.partitionBy("p_id")
    credits = joined.withColumn(
        "credit", F.col("p_value") * F.col("w") / F.sum("w").over(wsum)
    )
    attributed = credits.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("n_credits"),
        F.expr(
            "CAST(CAST(SUM(CAST(credit AS DECIMAL(28,6))) AS STRING)"
            " AS DOUBLE)"
        ).alias("credited_value"),
    )
    none_row = (
        p.join(
            credits.select("p_id").distinct(), "p_id", "left_anti"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_credits"),
            F.expr(
                "CAST(CAST(SUM(CAST(p_value AS DECIMAL(28,6))) AS STRING)"
                " AS DOUBLE)"
            ).alias("credited_value"),
        )
        .select(F.lit("none").alias("touch_type"), "n_credits",
                "credited_value")
    )
    return attributed.unionByName(none_row).orderBy("touch_type")


_Q211_SQL = """
WITH p AS (
  SELECT user_id AS p_user, event_id AS p_id, ts AS p_ts,
         value AS p_value
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id AS t_user, event_id AS t_id, ts AS t_ts,
         event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click', 'signup')
),
joined AS (
  SELECT p.*, t.touch_type,
         CAST(1 AS DOUBLE) / CAST(1 << CAST(
           floor((epoch_us(p_ts) - epoch_us(t_ts))
                 / (12.0 * 3600 * 1000000)) AS INT) AS DOUBLE) AS w
  FROM p JOIN t ON p_user = t_user
   AND (t_ts < p_ts OR (t_ts = p_ts AND t_id < p_id))
   AND epoch_us(p_ts) - epoch_us(t_ts) <= CAST(72 AS BIGINT) * 3600 * 1000000
),
credits AS (
  SELECT touch_type, p_id,
         p_value * w / SUM(w) OVER (PARTITION BY p_id) AS credit
  FROM joined
),
attributed AS (
  SELECT touch_type,
         CAST(COUNT(*) AS BIGINT) AS n_credits,
         CAST(CAST(SUM(CAST(credit AS DECIMAL(28,6))) AS STRING)
              AS DOUBLE) AS credited_value
  FROM credits GROUP BY touch_type
),
none_row AS (
  SELECT 'none' AS touch_type,
         CAST(COUNT(*) AS BIGINT) AS n_credits,
         CAST(CAST(SUM(CAST(p_value AS DECIMAL(28,6))) AS STRING)
              AS DOUBLE) AS credited_value
  FROM p WHERE p_id NOT IN (SELECT DISTINCT p_id FROM credits)
)
SELECT * FROM attributed
UNION ALL SELECT * FROM none_row
ORDER BY touch_type
"""

QUERIES["q211_time_decay_attribution"] = q211_time_decay_attribution
ORACLE["q211_time_decay_attribution"] = _Q211_SQL
