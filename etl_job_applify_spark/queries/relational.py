"""Relational-core query inventory (SURVEY §2b ABSENT rows → M3).

Scans, filters, projections, every join type, aggregations (incl. distinct,
rollup/cube/grouping sets), window functions (ranking/analytic/frames),
sorts/limits/top-k, set ops, scalar function surface, and the upsert sink
semantics — each as a (spark_query, oracle_sql) pair on the shared star
schema.

Scale notes are attached per query: which side broadcasts, where the
shuffle is, what AQE does at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.local import local_relation

from ._util import DAVG, DSUM, davg, dsum, tbl
from ..operators import range_join, top_k_per_group
from ..sinks.upsert import upsert


# --- q01: flagship pricing summary (TPC-H Q1 shape) ----------------------
# scan → filter (pushed to parquet) → hash agg (partial+final, 2 group
# cols) → sort. At 100 TB: map-side partial aggregation reduces the
# shuffle to |groups| × partitions rows; AQE coalesces post-shuffle.

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP '1998-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
            dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {DSUM('l_quantity')} AS sum_qty,
       {DSUM('l_extendedprice')} AS sum_base_price,
       {DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {DAVG('l_quantity')} AS avg_qty,
       {DAVG('l_extendedprice')} AS avg_price,
       {DAVG('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q02: filter + projection (row-level, no shuffle) --------------------
# Predicates and the 5-column projection push into the parquet scan
# (PushedFilters + ReadSchema); revenue is a per-row double product —
# bit-deterministic, no rounding needed.

def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1995-01-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 10)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


_Q02_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 10
"""


# --- q03: broadcast equi-join --------------------------------------------
# part is the dimension side: broadcast() pins a broadcast-hash join, so
# the 100 TB lineitem side never shuffles — the hot pattern for star joins.

def q03_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum("l_extendedprice * (1 - l_discount)", "revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


_Q03_SQL = f"""
SELECT p_brand,
       {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# --- q04: multiway join (TPC-H Q5 shape) ---------------------------------
# 6-way: the three tiny dims (region/nation/supplier) broadcast; the
# customer⋈orders⋈lineitem chain shuffles on its keys. Catalyst reorders
# so the selective region filter prunes first.

def q04_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = tbl(spark, sf_dir, "nation")
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-01-01'"))
    )
    lineitem = tbl(spark, sf_dir, "lineitem")
    supplier = tbl(spark, sf_dir, "supplier")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q04_SQL = f"""
SELECT n_name, {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- q05: left outer join + per-key agg ----------------------------------

def q05_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("coalesce(o_totalprice, 0)", "total_spent"),
        )
    )


_Q05_SQL = f"""
SELECT c_custkey, c_mktsegment,
       COUNT(o_orderkey) AS n_orders,
       {DSUM('coalesce(o_totalprice, 0)')} AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


# --- q06: semi join (EXISTS) ---------------------------------------------
# left_semi keeps only customer columns and dedups matches engine-side —
# at scale this is strictly cheaper than join+distinct.

def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    f_orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        customer.join(f_orders, customer.c_custkey == f_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


_Q06_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- q07: anti join (NOT EXISTS) -----------------------------------------

def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    urgent = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


_Q07_SQL = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


# --- q08: range (theta) join against a band dimension --------------------
# Bands are a 4-row literal dim → broadcast nested-loop with the interval
# predicate; zero shuffle on the fact side. See operators/range_join.py for
# the bucketed two-large-sides variant.

def q08_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tbl(spark, sf_dir, "part")
    bands = local_relation(spark, 
        [("economy", 900.0, 930.0), ("standard", 930.0, 960.0),
         ("premium", 960.0, 990.0), ("luxury", 990.0, 1100.0)],
        "band string, lo double, hi double",
    )
    cond = (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi"))
    return (
        range_join(part, bands, cond)
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), davg("p_retailprice", "avg_price"))
        .orderBy("band")
    )


_Q08_SQL = f"""
SELECT band, COUNT(*) AS n_parts, {DAVG('p_retailprice')} AS avg_price
FROM part
JOIN (VALUES ('economy', 900.0, 930.0), ('standard', 930.0, 960.0),
             ('premium', 960.0, 990.0), ('luxury', 990.0, 1100.0))
     AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
ORDER BY band
"""


# --- q09: aggregation with exact DISTINCT --------------------------------
# count(distinct x) expands to a two-phase agg in Spark; at scale prefer
# approx_count_distinct (see q26_approx in analytics) unless exactness is
# contractual.

def q09_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice", "total"),
        )
        .orderBy("o_orderpriority")
    )


_Q09_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       {DSUM('o_totalprice')} AS total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q10/q11/q12: rollup / cube / grouping sets --------------------------

def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n"))
    )


_Q10_SQL = f"""
SELECT l_returnflag, l_linestatus, {DSUM('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "total"))
    )


_Q11_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {DSUM('o_totalprice')} AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


_Q12_SQL = f"""
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n, {DSUM('value')} AS total
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(date_trunc('day', ts) AS DATE)), ())
"""


def q12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame groupingSets API (Spark 4) — independent formulation of
    # the oracle's GROUP BY GROUPING SETS text; same single-pass partial
    # aggregate per set under the hood (Expand + one shuffle)
    events = tbl(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "value",
    )
    return (
        events.groupingSets([["event_type"], ["day"], []], "event_type", "day")
        .agg(F.count("*").alias("n"), dsum("value", "total"))
        .select("event_type", "day", "n", "total")
    )


# --- q13: ranking window functions ---------------------------------------
# One shuffle on o_custkey; sort within partition. o_orderkey tiebreak
# makes row_number deterministic.

def q13_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


_Q13_SQL = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER w AS rn,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
"""


# --- q14: running aggregate over a row frame -----------------------------
# DECIMAL accumulation inside the frame → order-proof running totals.

def q14_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("running_spent"),
    )


_Q14_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_spent
FROM orders
"""


# --- q15: lag/lead analytics ---------------------------------------------

def q15_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


_Q15_SQL = """
SELECT event_id, user_id, ts, value,
       value - LAG(value) OVER w AS delta,
       LEAD(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- q16: global top-k ----------------------------------------------------
# TakeOrderedAndProject: per-partition heaps of k, merged on the driver —
# no global sort even at 100 TB.

def q16_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), "p_partkey")
        .limit(10)
    )


_Q16_SQL = f"""
SELECT p_partkey, p_name,
       {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name
ORDER BY revenue DESC, p_partkey
LIMIT 10
"""


# --- q17: grouped top-k via the operator ---------------------------------

def q17_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        group_by=["o_orderpriority"],
        order_by=[F.desc("o_totalprice"), F.col("o_orderkey")],
        k=5,
        rank_col="rank_in_priority",
    )


_Q17_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank_in_priority FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey)
         AS rank_in_priority
  FROM orders
) WHERE rank_in_priority <= 5
"""


# --- q18: set operations --------------------------------------------------

def q18_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    customer = tbl(spark, sf_dir, "customer")
    cust_1995 = orders.filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1995-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-01-01'"))
    ).select(F.col("o_custkey").alias("custkey"))
    cust_1996 = orders.filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-01-01'"))
    ).select(F.col("o_custkey").alias("custkey"))
    high_bal = customer.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        cust_1995.intersect(cust_1996)
        .union(high_bal.subtract(cust_1995))
        .distinct()
    )


_Q18_SQL = """
SELECT custkey FROM (
  (SELECT o_custkey AS custkey FROM orders
   WHERE o_orderdate >= TIMESTAMP '1995-01-01'
     AND o_orderdate <  TIMESTAMP '1996-01-01'
   INTERSECT
   SELECT o_custkey AS custkey FROM orders
   WHERE o_orderdate >= TIMESTAMP '1996-01-01'
     AND o_orderdate <  TIMESTAMP '1997-01-01')
  UNION
  (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
   EXCEPT
   SELECT o_custkey AS custkey FROM orders
   WHERE o_orderdate >= TIMESTAMP '1995-01-01'
     AND o_orderdate <  TIMESTAMP '1996-01-01')
)
"""


# --- q19: string function surface ----------------------------------------

def q19_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tbl(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.element_at(F.split("p_type", " "), 1).alias("type_first"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.ltrim(F.rtrim("p_name")).alias("name_trim"),
    )


_Q19_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LENGTH(p_name) AS name_len,
       REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
       LIST_EXTRACT(STRING_SPLIT(p_type, ' '), 1) AS type_first,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       CONCAT_WS('/', p_brand, p_type) AS brand_type,
       LTRIM(RTRIM(p_name)) AS name_trim
FROM part
"""


# --- q20: date/time function surface -------------------------------------

def q20_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mth"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        (F.weekday(F.col("o_orderdate").cast("date")) + F.lit(1)).alias("iso_dow"),
        F.datediff(
            F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_1999"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


_Q20_SQL = """
SELECT o_orderkey,
       YEAR(o_orderdate) AS yr,
       QUARTER(o_orderdate) AS qtr,
       MONTH(o_orderdate) AS mth,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       CAST(ISODOW(CAST(o_orderdate AS DATE)) AS INT) AS iso_dow,
       CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT)
         AS days_to_1999,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) + 30 AS due_date
FROM orders
"""


# --- q21: math function surface (IEEE-exact ops only) --------------------

def q21_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_extendedprice") / 100).alias("price_bucket"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct"),
        (F.col("l_partkey") % 7).alias("pk_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


_Q21_SQL = """
SELECT l_orderkey, l_linenumber,
       SQRT(l_extendedprice) AS sqrt_price,
       l_quantity * l_quantity AS qty_sq,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS price_bucket,
       CAST(CEIL(l_tax * 100) AS BIGINT) AS tax_pct,
       l_partkey % 7 AS pk_mod7,
       GREATEST(l_tax, l_discount) AS max_rate,
       LEAST(l_tax, l_discount) AS min_rate
FROM lineitem
"""


# --- q22: JSON extraction (events.props) ---------------------------------

def q22_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_Q22_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- q23: upsert semantics (sink W2 as a relational rewrite) -------------
# The batch is orders with orderkey % 97 == 0, totalprice bumped 10%; the
# merged table is summarized so the check is compact.

def q23_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    merged = upsert(orders, updates, keys=["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "total"))
        .orderBy("o_orderstatus")
    )


_Q23_SQL = f"""
WITH updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
),
merged AS (
  SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
  UNION ALL
  SELECT * FROM updates
)
SELECT o_orderstatus, COUNT(*) AS n, {DSUM('o_totalprice')} AS total
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- q24: window frame over a time RANGE ---------------------------------
# RANGE INTERVAL frames are peer-inclusive → deterministic without a
# tiebreak. The oracle keeps the window-function form (the surface being
# covered); the Spark side is the textbook-independent equivalence: a
# per-key self-join counting peers in [d − 30 days, d] — same
# peer-inclusive multiset, so a frame-boundary bug in either formulation
# breaks the hash compare. Scale note: the join fans out per customer
# (bounded by orders-per-customer × window width); the window form is
# the production plan, the join form exists here precisely because it is
# NOT the same code path.

_Q24_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
       AS orders_30d
FROM orders
"""


def q24_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    left = orders.select("o_custkey", "o_orderkey", "o_orderdate")
    peers = orders.select(
        F.col("o_custkey").alias("p_custkey"),
        F.col("o_orderdate").alias("p_date"),
    )
    return (
        left.join(
            peers,
            (F.col("o_custkey") == F.col("p_custkey"))
            & (F.col("p_date") <= F.col("o_orderdate"))
            & (
                F.col("p_date")
                >= F.col("o_orderdate") - F.expr("INTERVAL 30 DAYS")
            ),
        )
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.count("*").alias("orders_30d"))
    )


# --- q25: schema-contract transform (reference T2/T3) --------------------

def q25_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform import apply_contract

    events = tbl(spark, sf_dir, "events")
    contract = {
        "columns": [
            {"source": "event_id", "name": "id", "type": "long"},
            {"source": "ts", "name": "event_time", "type": "timestamp"},
            {"source": "event_type", "name": "kind", "type": "string"},
            {"source": "value", "name": "amount", "type": "float"},
            {"source": "user_id", "name": "uid", "type": "integer"},
        ]
    }
    return apply_contract(events, contract)


_Q25_SQL = """
SELECT event_id AS id,
       ts AS event_time,
       event_type AS kind,
       CAST(value AS FLOAT) AS amount,
       CAST(user_id AS INT) AS uid
FROM events
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_join_broadcast": q03_join_broadcast,
    "q04_multiway_join": q04_multiway_join,
    "q05_outer_join": q05_outer_join,
    "q06_semi_join": q06_semi_join,
    "q07_anti_join": q07_anti_join,
    "q08_range_band_join": q08_range_band_join,
    "q09_agg_distinct": q09_agg_distinct,
    "q10_rollup": q10_rollup,
    "q11_cube": q11_cube,
    "q12_grouping_sets": q12_grouping_sets,
    "q13_window_rank": q13_window_rank,
    "q14_window_running": q14_window_running,
    "q15_window_lag_lead": q15_window_lag_lead,
    "q16_topk": q16_topk,
    "q17_grouped_topk": q17_grouped_topk,
    "q18_set_ops": q18_set_ops,
    "q19_string_fns": q19_string_fns,
    "q20_date_fns": q20_date_fns,
    "q21_math_fns": q21_math_fns,
    "q22_json_extract": q22_json_extract,
    "q23_upsert": q23_upsert,
    "q24_window_range_frame": q24_window_range_frame,
    "q25_schema_contract": q25_schema_contract,
}

ORACLE = {
    "q01_pricing_summary": _Q01_SQL,
    "q02_filter_project": _Q02_SQL,
    "q03_join_broadcast": _Q03_SQL,
    "q04_multiway_join": _Q04_SQL,
    "q05_outer_join": _Q05_SQL,
    "q06_semi_join": _Q06_SQL,
    "q07_anti_join": _Q07_SQL,
    "q08_range_band_join": _Q08_SQL,
    "q09_agg_distinct": _Q09_SQL,
    "q10_rollup": _Q10_SQL,
    "q11_cube": _Q11_SQL,
    "q12_grouping_sets": _Q12_SQL,
    "q13_window_rank": _Q13_SQL,
    "q14_window_running": _Q14_SQL,
    "q15_window_lag_lead": _Q15_SQL,
    "q16_topk": _Q16_SQL,
    "q17_grouped_topk": _Q17_SQL,
    "q18_set_ops": _Q18_SQL,
    "q19_string_fns": _Q19_SQL,
    "q20_date_fns": _Q20_SQL,
    "q21_math_fns": _Q21_SQL,
    "q22_json_extract": _Q22_SQL,
    "q23_upsert": _Q23_SQL,
    "q24_window_range_frame": _Q24_SQL,
    "q25_schema_contract": _Q25_SQL,
}
