"""Relational inventory, part 2: subqueries, pivot/unpivot, ordered string
aggregation, TPC-H classic shapes, window distribution functions,
conditional aggregation, bitwise/epoch scalar surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import DAVG, DSUM, davg, dsum, tbl


# --- q26: correlated scalar subquery -------------------------------------
# The DuckDB oracle keeps the correlated-subquery FORM (that is the
# surface being covered); the Spark side is the decorrelated plan written
# out by hand — per-priority aggregate, broadcast join-back, filter —
# i.e. exactly what Catalyst's decorrelation rule produces, but as an
# independent formulation so a same-text bug cannot cancel in the hash
# compare. The threshold average goes through the DECIMAL-accumulate
# idiom (_util.DAVG) in BOTH formulations: a plain double AVG is
# order-dependent, and a last-ulp disagreement on the threshold could
# flip boundary rows between engines.
# Scale: the per-priority aggregate is a handful of rows → broadcast;
# the big side is scanned once, no shuffle.

_Q26_SQL = f"""
SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
  SELECT {DAVG('i.o_totalprice')} FROM orders i
  WHERE i.o_orderpriority = o.o_orderpriority
)
"""


def q26_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    thresholds = orders.groupBy("o_orderpriority").agg(
        davg("o_totalprice", "avg_price")
    )
    return (
        orders.join(F.broadcast(thresholds), "o_orderpriority")
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )


# --- q27: IN subquery -----------------------------------------------------
# Oracle keeps the IN-subquery form; Spark side is the join rewrite:
# brand counts → total via a window over the tiny aggregate (~25 rows, no
# second scan of part and no driver scalar) → left-semi join back.
# Integer counts make the HAVING threshold exact in both engines.

_Q27_SQL = """
SELECT p_partkey, p_brand, p_retailprice
FROM part
WHERE p_brand IN (
  SELECT p_brand FROM part GROUP BY p_brand
  HAVING COUNT(*) > (SELECT COUNT(*) FROM part) / 25.0
)
"""


def q27_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tbl(spark, sf_dir, "part")
    brand_counts = part.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    hot_brands = (
        brand_counts.withColumn(
            "total", F.sum("cnt").over(Window.partitionBy())
        )
        .filter(F.col("cnt") > F.col("total") / 25.0)
        .select("p_brand")
    )
    return part.join(F.broadcast(hot_brands), "p_brand", "left_semi").select(
        "p_partkey", "p_brand", "p_retailprice"
    )


# --- q28: pivot -----------------------------------------------------------
# Explicit pivot values → no extra distinct-collection job at scale.

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q28_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.date_trunc("day", "ts").cast("date"))
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
        .orderBy("day")
    )


_Q28_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'error') AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY 1
ORDER BY 1
"""


# --- q29: unpivot (stack) -------------------------------------------------

def q29_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    wide = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("double").alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )
    return wide.selectExpr(
        "n_name",
        "stack(2, 'n_customers', n_customers, 'total_acctbal', total_acctbal)"
        " AS (metric, value)",
    )


_Q29_SQL = f"""
WITH wide AS (
  SELECT n_name, CAST(COUNT(*) AS DOUBLE) AS n_customers,
         {DSUM('c_acctbal')} AS total_acctbal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT n_name, 'total_acctbal' AS metric, total_acctbal AS value FROM wide
"""


# --- q44: ordered string aggregation -------------------------------------
# collect_list order is nondeterministic under parallelism → sort the
# array before joining; identical to an ORDER BY inside string_agg.

def q44_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


_Q44_SQL = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# --- q45: CASE / null-handling scalar surface ----------------------------

def q45_case_null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.expr(
            "CASE WHEN c_acctbal < 0 THEN 'debt' "
            "WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END"
        ).alias("bal_bucket"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).alias("pos_bal"),
        F.isnull(F.nullif("c_mktsegment", F.lit("BUILDING"))).alias("is_building"),
    )


_Q45_SQL = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_bucket,
       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
       CASE WHEN c_acctbal > 0 THEN c_acctbal END AS pos_bal,
       NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_building
FROM customer
"""


# --- q46: epoch/unix-time conversions ------------------------------------

def q46_unixtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        (F.col("ts").cast("double")).alias("epoch_frac"),
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts_floor_s"),
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
    )


_Q46_SQL = """
SELECT event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       epoch(ts) AS epoch_frac,
       CAST(to_timestamp(floor(epoch(ts))) AS TIMESTAMP) AS ts_floor_s,
       CAST(hour(ts) AS INT) AS hr,
       CAST(minute(ts) AS INT) AS mi
FROM events
"""


# --- q47: TPC-H Q3 shape (shipping-priority top 10) ----------------------

def q47_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP '1998-03-15'")
    )
    lineitem = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP '1998-03-15'")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q47_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --- q48: TPC-H Q10 shape (returned-item customer ranking) ---------------

def q48_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-07-01'"))
    )
    lineitem = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = tbl(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q48_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- q49: array function surface -----------------------------------------

def q49_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tbl(spark, sf_dir, "part")
    toks = F.split("p_type", " ")
    return part.select(
        "p_partkey",
        F.size(toks).alias("n_words"),
        F.array_contains(toks, "STANDARD").alias("has_standard"),
        F.array_join(F.array_sort(toks), "_").alias("sorted_words"),
        F.element_at(F.slice(toks, 1, 2), -1).alias("second_word"),
        # Scalars only in oracle-checked outputs: the driver's pandas-based
        # canonicalizer cannot hash list cells (round-1 q49 crash), so the
        # array is serialized — same rule hof.py applies to maps.
        # (sorted: DuckDB's list_distinct does not preserve element order)
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias(
            "distinct_words"
        ),
    )


_Q49_SQL = """
SELECT p_partkey,
       CAST(len(string_split(p_type, ' ')) AS INT) AS n_words,
       list_contains(string_split(p_type, ' '), 'STANDARD') AS has_standard,
       array_to_string(list_sort(string_split(p_type, ' ')), '_') AS sorted_words,
       list_extract(list_slice(string_split(p_type, ' '), 1, 2), -1) AS second_word,
       array_to_string(list_sort(list_distinct(string_split(p_type, ' '))), ',') AS distinct_words
FROM part
"""


# --- q54: bitwise scalar surface -----------------------------------------

def q54_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey & 255").alias("low_byte"),
        F.expr("l_orderkey | 1").alias("with_low_bit"),
        F.expr("shiftright(l_orderkey, 4)").alias("shifted"),
        F.expr("l_orderkey ^ l_partkey").alias("xored"),
        F.bit_count("l_orderkey").alias("popcount"),
    )


_Q54_SQL = """
SELECT l_orderkey, l_linenumber,
       l_orderkey & 255 AS low_byte,
       l_orderkey | 1 AS with_low_bit,
       l_orderkey >> 4 AS shifted,
       xor(l_orderkey, l_partkey) AS xored,
       CAST(bit_count(l_orderkey) AS INT) AS popcount
FROM lineitem
"""


# --- q55: conditional aggregation ----------------------------------------

def q55_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END",
                 "urgent_total"),
            davg("CASE WHEN o_totalprice > 100000 THEN o_totalprice END",
                 "avg_big"),
        )
        .orderBy("o_orderstatus")
    )


_Q55_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
       {DSUM("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END")}
         AS urgent_total,
       {DAVG('CASE WHEN o_totalprice > 100000 THEN o_totalprice END')} AS avg_big
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- q56: window distribution functions ----------------------------------

def q56_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = tbl(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("s_suppkey").over(w).alias("poorest_in_nation"),
    )


_Q56_SQL = """
SELECT s_suppkey, s_nationkey, s_acctbal,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cdist,
       FIRST_VALUE(s_suppkey) OVER w AS poorest_in_nation
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
"""


QUERIES = {
    "q26_scalar_subquery": q26_scalar_subquery,
    "q27_in_subquery": q27_in_subquery,
    "q28_pivot": q28_pivot,
    "q29_unpivot": q29_unpivot,
    "q44_string_agg": q44_string_agg,
    "q45_case_null_fns": q45_case_null_fns,
    "q46_unixtime": q46_unixtime,
    "q47_shipping_priority": q47_shipping_priority,
    "q48_returned_items": q48_returned_items,
    "q49_array_fns": q49_array_fns,
    "q54_bitwise": q54_bitwise,
    "q55_conditional_agg": q55_conditional_agg,
    "q56_window_distribution": q56_window_distribution,
}

ORACLE = {
    "q26_scalar_subquery": _Q26_SQL,
    "q27_in_subquery": _Q27_SQL,
    "q28_pivot": _Q28_SQL,
    "q29_unpivot": _Q29_SQL,
    "q44_string_agg": _Q44_SQL,
    "q45_case_null_fns": _Q45_SQL,
    "q46_unixtime": _Q46_SQL,
    "q47_shipping_priority": _Q47_SQL,
    "q48_returned_items": _Q48_SQL,
    "q49_array_fns": _Q49_SQL,
    "q54_bitwise": _Q54_SQL,
    "q55_conditional_agg": _Q55_SQL,
    "q56_window_distribution": _Q56_SQL,
}


# --- q66: TPC-H Q14 shape (conditional revenue share) --------------------
# Numerator and denominator in ONE aggregation pass (conditional agg),
# not two scans.

def q66_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-02-01'"))
    )
    part = tbl(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            dsum(
                "CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
                "promo_revenue",
            ),
            dsum("l_extendedprice * (1 - l_discount)", "total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (F.col("promo_revenue") / F.col("total_revenue") * 100).alias("promo_pct"),
        )
    )


_Q66_SQL = f"""
SELECT promo_revenue, total_revenue,
       promo_revenue / total_revenue * 100 AS promo_pct
FROM (
  SELECT {DSUM("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
           AS promo_revenue,
         {DSUM('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-02-01'
)
"""


# --- q67: TPC-H Q19 shape (disjunctive multi-predicate join filter) ------
# OR-of-ANDs predicates exercise CNF conversion + partial pushdown.

def q67_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 21))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity") >= 15) & (F.col("l_quantity") <= 35))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity") >= 25) & (F.col("l_quantity") <= 50))
    )
    return joined.filter(cond).agg(
        dsum("l_extendedprice * (1 - l_discount)", "revenue"),
        F.count("*").alias("n_items"),
    )


_Q67_SQL = f"""
SELECT {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 15 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 25 AND 50)
"""


QUERIES["q66_promo_revenue"] = q66_promo_revenue
QUERIES["q67_disjunctive_filter"] = q67_disjunctive_filter
ORACLE["q66_promo_revenue"] = _Q66_SQL
ORACLE["q67_disjunctive_filter"] = _Q67_SQL


# --- q70: LATERAL (correlated table) subquery ----------------------------
# The oracle keeps the LATERAL form (the surface being covered); the
# Spark side is the grouped-top-k WINDOW form (q17's idiom) — the
# single-pass shape a correlated per-row LIMIT decorrelates to at scale,
# and an independent formulation for the hash compare: one aggregation
# over nation⋈customer, rank within region, keep 2, broadcast-join the
# region names.

_Q70_SQL = """
SELECT r.r_name, t.n_name, t.n_cust
FROM region r,
LATERAL (
  SELECT n_name, COUNT(c_custkey) AS n_cust
  FROM nation JOIN customer ON c_nationkey = n_nationkey
  WHERE n_regionkey = r.r_regionkey
  GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 2
) t
"""


def q70_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = tbl(spark, sf_dir, "region")
    nation = tbl(spark, sf_dir, "nation")
    customer = tbl(spark, sf_dir, "customer")
    counts = (
        nation.join(customer, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.count("c_custkey").alias("n_cust"))
    )
    w = Window.partitionBy("n_regionkey").orderBy(
        F.desc("n_cust"), F.col("n_name")
    )
    top2 = counts.withColumn("rn", F.row_number().over(w)).filter("rn <= 2")
    return (
        top2.join(
            F.broadcast(region), top2.n_regionkey == region.r_regionkey
        )
        .select("r_name", "n_name", "n_cust")
    )


QUERIES["q70_lateral_topn"] = q70_lateral_topn
ORACLE["q70_lateral_topn"] = _Q70_SQL.replace(
    "COUNT(c_custkey) AS n_cust", "CAST(COUNT(c_custkey) AS BIGINT) AS n_cust"
)


# --- q71: string function surface, part 2 --------------------------------

def q71_string_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.lpad("c_mktsegment", 12, ".").alias("seg_lpad"),
        F.rpad(F.col("c_name"), 24, "_").alias("name_rpad"),
        F.instr("c_name", "1").alias("pos_one"),
        F.repeat(F.lit("ab"), 3).alias("abab"),
    )


_Q71_SQL = """
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
       -- DuckDB lacks translate(): chained replace mirrors the 5 vowels
       replace(replace(replace(replace(replace(c_mktsegment,
         'A','a'),'E','e'),'I','i'),'O','o'),'U','u') AS seg_translated,
       reverse(c_mktsegment) AS seg_rev,
       lpad(c_mktsegment, 12, '.') AS seg_lpad,
       rpad(c_name, 24, '_') AS name_rpad,
       CAST(strpos(c_name, '1') AS INT) AS pos_one,
       repeat('ab', 3) AS abab
FROM customer
"""


# --- q72: date arithmetic, part 2 ----------------------------------------

def q72_date_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3m"),
        F.date_sub(d, 7).alias("minus_7d"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        F.weekofyear(d).alias("week_num"),
        F.dayofyear(d).alias("doy"),
    )


_Q72_SQL = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       CAST(o_orderdate AS DATE) - 7 AS minus_7d,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS week_num,
       CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT) AS doy
FROM orders
"""


# --- q73: set operations with ALL (bag) semantics ------------------------

def q73_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    h1 = orders.filter(F.col("o_orderdate") < F.expr("TIMESTAMP '1997-01-01'")) \
        .select("o_custkey")
    h2 = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        h1.intersectAll(h2)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("multiplicity"))
    )


_Q73_SQL = """
WITH i AS (
  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
SELECT o_custkey, COUNT(*) AS multiplicity FROM i GROUP BY o_custkey
"""


QUERIES["q71_string_fns2"] = q71_string_fns2
QUERIES["q72_date_fns2"] = q72_date_fns2
QUERIES["q73_set_ops_all"] = q73_set_ops_all
ORACLE["q71_string_fns2"] = _Q71_SQL
ORACLE["q72_date_fns2"] = _Q72_SQL
ORACLE["q73_set_ops_all"] = _Q73_SQL
