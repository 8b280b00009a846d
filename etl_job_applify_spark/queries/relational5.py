"""TPC-H shape completions: the six query shapes (Q4, Q6, Q12, Q16,
Q20, Q21) that rounds 1-5 had not yet demonstrated, closing out all 22
TPC-H query shapes against the fixture schema.

The fixture lacks ``l_commitdate``/``l_receiptdate``/``l_shipmode`` and
the ``partsupp`` table, so — as with q107-q116 — each query keeps the
reference shape (the join/subquery/aggregation structure that exercises
the optimizer) while adapting predicates to the columns that exist:
"late" is ``l_shipdate`` more than N days after ``o_orderdate``, the
ship mode is a deterministic derivation from ``l_linenumber``, and
``partsupp`` is the distinct ``(l_partkey, l_suppkey)`` projection.

Reference parity: the reference engine (C++ scaffold, see SURVEY.md §1)
ships none of these; they are demanded by SURVEY.md §2b "joins /
aggregations / subqueries" and graded as relational completeness.

Determinism: counts are exact integers; revenue goes through the
DECIMAL-accumulate idiom (queries/_util.py); ``l_quantity`` is
integer-valued (1..50) so double sums of it are exact and
order-independent, but sums still use DSUM for uniformity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation

from ._util import DSUM, dsum, tbl


# --- q156: order-priority checking (TPC-H Q4 shape) ----------------------
# How many orders per priority in one quarter had at least one late
# line (shipped >60 days after the order date)? EXISTS realized as a
# LEFT SEMI join carrying the non-equi lateness predicate alongside the
# orderkey equality — still a hash/sort-merge equi-join with a residual
# condition, never a nested loop.
# Plan: orders is filtered to one quarter BEFORE the join (predicate
# pushed to the scan), so the semi-join's build side is ~1/26th of
# orders; lineitem streams past it on the orderkey shuffle. At 100 TB,
# bucket both on orderkey to make this shuffle-free.

def q156_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-04-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-07-01'"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    late_orders = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.datediff(li.l_shipdate, orders.o_orderdate) > 60),
        "left_semi",
    )
    return (
        late_orders.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q156_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-04-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND datediff('day', o_orderdate, l_shipdate) > 60
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q157: forecasting revenue change (TPC-H Q6 shape) -------------------
# The canonical scan-and-aggregate: one table, three pushed predicates,
# one global sum — no join, no groupBy shuffle beyond the single-row
# final agg. The plan to demand: PushedFilters on shipdate/discount/
# quantity, two-column ReadSchema, partial+final agg.

def q157_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01'"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(dsum("l_extendedprice * l_discount", "revenue"))
    )


_Q157_SQL = f"""
SELECT {DSUM('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- q158: shipping modes and order priority (TPC-H Q12 shape) -----------
# Per derived ship mode, how many late 1997 lines carried urgent vs
# non-urgent orders — the conditional-count (CASE-inside-SUM) aggregate
# over a large-large join. Mode derives deterministically from
# l_linenumber so both engines compute identical buckets.
# Plan: ONE shuffle (lineitem ⋈ orders on orderkey); the mode CASE and
# priority CASE are codegen'd expressions; final 3-row agg is a
# broadcast-scale exchange.

def q158_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "AIR")
        .when(F.col("l_linenumber") % 3 == 1, "RAIL")
        .otherwise("TRUCK")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01'"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
        .groupBy(mode.alias("ship_mode"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


_Q158_SQL = """
SELECT CASE WHEN l_linenumber % 3 = 0 THEN 'AIR'
            WHEN l_linenumber % 3 = 1 THEN 'RAIL'
            ELSE 'TRUCK' END AS ship_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND datediff('day', o_orderdate, l_shipdate) > 90
GROUP BY ship_mode
ORDER BY ship_mode
"""


# --- q159: parts/supplier relationship (TPC-H Q16 shape) -----------------
# Distinct-supplier counts per (brand, type, size) for qualifying parts,
# excluding a "complaints" supplier set via NOT IN — realized as a
# LEFT ANTI join against the (broadcast, dimension-sized) exclusion set.
# partsupp is derived as the distinct (l_partkey, l_suppkey) projection.
# Plan: the distinct projection is the only lineitem-sized shuffle; part
# and the exclusion set broadcast; COUNT(DISTINCT) re-shuffles only the
# already-reduced pair relation.

def q159_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    complaints = tbl(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") % 7 == 0
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(
            F.broadcast(complaints),
            ps.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q159_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- q160: potential part promotion (TPC-H Q20 shape) --------------------
# Which suppliers have a repeat-shipment part (≥2 lines) whose entire
# shipped quantity falls inside 1997? The Q20 nesting — IN (parts) +
# correlated scalar-agg threshold per (part, supplier) — realized as a
# pair-grained aggregate with conditional sums, a semi-join against the
# part filter, and a final semi-join into supplier. (The textbook
# "qty97 > 0.5 * total" threshold is vacuous on this fixture — most
# pairs are single-line so every supplier qualifies; the all-in-1997
# repeat-pair form keeps the identical nesting while actually
# discriminating at every SF.)
# Plan: one (partkey, suppkey) shuffle builds the line count and both
# sums in a single pass (conditional aggregation instead of two scans);
# part broadcast; supplier output is dimension-sized.
# l_quantity is integer-valued so the double sums are exact.

def q160_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(F.col("p_name").startswith("large"))
    supplier = tbl(spark, sf_dir, "supplier")
    in97 = (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01'")) & (
        F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01'")
    )
    pairs = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(in97, F.col("l_quantity")).otherwise(0.0)).alias("qty97"),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter((F.col("n_lines") >= 2) & (F.col("qty97") == F.col("qty_all")))
    )
    return (
        supplier.join(
            pairs, supplier.s_suppkey == pairs.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


_Q160_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
  GROUP BY l_partkey, l_suppkey
  HAVING COUNT(*) >= 2
     AND SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate <  TIMESTAMP '1998-01-01'
                  THEN l_quantity ELSE 0 END) = SUM(l_quantity)
)
ORDER BY s_suppkey
"""


# --- q161: suppliers who kept orders waiting (TPC-H Q21 shape) -----------
# For finished multi-supplier orders, count the late lines of the
# UNIQUE late supplier (some other supplier contributed, no other
# supplier was late). The oracle keeps Q21's EXISTS / NOT EXISTS text;
# the DataFrame side is a genuinely different formulation — one
# per-order aggregate computing (#distinct suppliers, #distinct late
# suppliers, the late supplier, its late-line count) — so a same-text
# bug cannot cancel in the hash compare.
# Plan: one lineitem ⋈ orders shuffle on orderkey, then ONE per-order
# aggregate replaces Q21's two correlated subqueries (each of which
# would be its own join); supplier broadcasts onto the order-grained
# result. This is the textbook "decorrelate EXISTS into a group-by"
# rewrite, and it is strictly fewer shuffles than the literal plan.

def q161_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = tbl(spark, sf_dir, "supplier")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias(
                "n_late_supp"
            ),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
            F.sum(F.when(late, 1).otherwise(0)).alias("late_lines"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(
            F.broadcast(supplier),
            per_order.late_supp == supplier.s_suppkey,
        )
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


_Q161_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND datediff('day', o_orderdate, l1.l_shipdate) > 90
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND datediff('day', o_orderdate, l3.l_shipdate) > 90
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


QUERIES = {
    "q156_order_priority": q156_order_priority,
    "q157_forecast_revenue": q157_forecast_revenue,
    "q158_shipmode_priority": q158_shipmode_priority,
    "q159_supplier_part_counts": q159_supplier_part_counts,
    "q160_part_promotion": q160_part_promotion,
    "q161_waiting_orders": q161_waiting_orders,
}
ORACLE = {
    "q156_order_priority": _Q156_SQL,
    "q157_forecast_revenue": _Q157_SQL,
    "q158_shipmode_priority": _Q158_SQL,
    "q159_supplier_part_counts": _Q159_SQL,
    "q160_part_promotion": _Q160_SQL,
    "q161_waiting_orders": _Q161_SQL,
}


# --- q179: native recursive CTE (Spark 4 WITH RECURSIVE) ------------------
# q121 demonstrates recursion as an independent DataFrame frontier loop
# (its oracle is DuckDB's WITH RECURSIVE); this query pins Spark 4's
# NATIVE recursive-CTE machinery itself: every sampled customer key
# walks its ancestor chain k → k div 2 to the root, and the per-depth
# rollup is compared against DuckDB running its own recursion. The two
# engines share semantics but not text (Spark uses `div`, DuckDB `//`),
# and Spark's recursion executes as iterative union steps — depth bounds
# the stage count, data size does not grow per step.

def q179_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE up(start, node, steps) AS (
          SELECT c_custkey, c_custkey, 0
          FROM customer WHERE c_custkey % 100 = 0
          UNION ALL
          SELECT start, node div 2, steps + 1 FROM up WHERE node > 1
        )
        SELECT steps,
               CAST(COUNT(*) AS BIGINT) AS n_chains,
               CAST(SUM(node) AS BIGINT) AS node_sum
        FROM up GROUP BY steps ORDER BY steps
        """
    )


_Q179_SQL = """
WITH RECURSIVE up(start, node, steps) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey % 100 = 0
  UNION ALL
  SELECT start, node // 2, steps + 1 FROM up WHERE node > 1
)
SELECT steps,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(SUM(node) AS BIGINT) AS node_sum
FROM up GROUP BY steps ORDER BY steps
"""


QUERIES["q179_recursive_cte"] = q179_recursive_cte
ORACLE["q179_recursive_cte"] = _Q179_SQL


# --- q180: skyline / Pareto frontier --------------------------------------
# The not-dominated set over (price ↓ better, size ↑ better): a part is
# on the frontier iff no other part is at-most-as-expensive AND
# at-least-as-big with one strict. The naive form is the O(n²)
# NOT EXISTS self-join — which stays as the ORACLE text; the engine-side
# formulation is the 2-D sweep: collapse to one row per distinct price
# (its max size), then one ordered window pass keeps prices whose max
# size strictly exceeds every cheaper price's running max — O(n log n),
# one sort, no self-join. Equal-(price, size) duplicates survive
# together (no strict edge between them).
# Plan: one aggregate on price + one unpartitioned window over the
# |distinct prices| relation + a broadcast semi join back — at 100 TB
# the sweep relation is the distinct-price set, not the table.

def q180_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = tbl(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("pmax")
    )
    w = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_prices = (
        per_price.withColumn("prev_max", F.max("pmax").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("pmax") > F.col("prev_max")))
        .select("p_retailprice", "pmax")
    )
    return (
        part.join(
            F.broadcast(frontier_prices),
            (part.p_retailprice == frontier_prices.p_retailprice)
            & (part.p_size == frontier_prices.pmax),
            "left_semi",
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


_Q180_SQL = """
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p_retailprice, p_partkey
"""


QUERIES["q180_skyline"] = q180_skyline
ORACLE["q180_skyline"] = _Q180_SQL


# --- q184: differential (hot-key-only) salted skew join -------------------
# The operator under gate: a deliberately skewed fact relation (every
# third event remapped to one celebrity user) joined to a per-user
# dimension through operators/salting.py differential_salted_join —
# hot keys detected exactly (sample_fraction=None keeps the query
# deterministic for the oracle; production uses the sampled path),
# salted 16 ways; cold keys take the plain single-copy join. The oracle
# is the PLAIN join — the whole point is that the skew machinery must
# be value-invisible.

def q184_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.salting import differential_salted_join

    ev = tbl(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 3 == 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "event_id",
        "value",
    )
    dim = (
        tbl(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("user_events"))
    )
    joined = differential_salted_join(
        ev,
        dim,
        ["user_id"],
        salt_from=["event_id"],
        num_salts=16,
        threshold_share=0.05,
        sample_fraction=None,
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.expr(DSUM("value")).alias("total_value"),
            F.first("user_events").alias("user_events"),
        )
        .orderBy("user_id")
    )


_Q184_SQL = f"""
WITH ev AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN 1 ELSE user_id END AS user_id,
         event_id, value
  FROM events
),
dim AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS user_events
  FROM events GROUP BY user_id
)
SELECT e.user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       {DSUM('value')} AS total_value,
       MIN(d.user_events) AS user_events
FROM ev e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.user_id
ORDER BY e.user_id
"""


# --- q185: RESTORE, oracle-checked end to end -----------------------------
# Drives the rollback path (sinks/versioned.py restore_table): publish a
# good snapshot, clobber it with a bad one, RESTORE, and summarize the
# live table + its preserved history. The oracle recomputes the good
# state straight from the raw table, so the hard-linked republish must
# be value-faithful; `n_versions` pins that history survived (restore
# is a new commit, never an erase).

def q185_restore_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sinks import list_versions, read_table, restore_table, write_version

    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="q185_restore_")
    try:
        write_version(orders.filter(F.col("o_orderkey") % 5 == 0), path)
        write_version(orders.filter(F.col("o_orderkey") % 25 == 0), path)
        restore_table(spark, path, 1)
        agg = (
            read_table(spark, path)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.expr(DSUM("o_totalprice")).alias("total"),
            )
            .withColumn(
                "n_versions", F.lit(len(list_versions(spark, path)))
            )
            .orderBy("o_orderstatus")
        )
        rows = agg.collect()
        schema = agg.schema
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q185_SQL = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {DSUM('o_totalprice')} AS total,
       3 AS n_versions
FROM orders
WHERE o_orderkey % 5 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES["q184_skew_join"] = q184_skew_join
QUERIES["q185_restore_lineage"] = q185_restore_lineage
ORACLE["q184_skew_join"] = _Q184_SQL
ORACLE["q185_restore_lineage"] = _Q185_SQL


# --- q212: join-key skew profile ------------------------------------------
# The diagnostic that chooses the join strategy at 100 TB: per
# prospective key column, exact cardinality and the row share of the
# heaviest key / heaviest 10 (operators/salting.py profile_join_keys).
# top1_share >> 1/n_distinct is the salting signal; the three lineitem
# join keys profile differently by construction (orders have few lines,
# parts and suppliers recur corpus-wide). Exact integer ratios; top-10
# boundary ties are share-invariant, so no tie-break is needed.

def q212_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import profile_join_keys

    li = tbl(spark, sf_dir, "lineitem")
    return profile_join_keys(li, ["l_orderkey", "l_partkey", "l_suppkey"])


def _skew_profile_sql() -> str:
    parts = []
    for c in ("l_orderkey", "l_partkey", "l_suppkey"):
        parts.append(f"""
SELECT '{c}' AS key_col,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top1_share,
       (SELECT CAST(SUM(n) AS DOUBLE) FROM (
          SELECT n FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY {c})
          ORDER BY n DESC LIMIT 10))
         / CAST(SUM(n) AS DOUBLE) AS top10_share
FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY {c})""")
    return "\nUNION ALL\n".join(parts)


_Q212_SQL = _skew_profile_sql()

QUERIES["q212_skew_profile"] = q212_skew_profile
ORACLE["q212_skew_profile"] = _Q212_SQL
