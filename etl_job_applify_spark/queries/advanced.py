"""Advanced inventory: Python UDAF/UDTF-shaped paths, SCD2 history,
iterative connected components (dedup canonicalization), stratified
sampling, BPE-ish token counting.
"""

from __future__ import annotations


import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import DSUM, tbl
from ..dedup import ngram_jaccard_pairs
from ..functions.text import bpe_token_count_expr, n_tokens_expr
from ..operators.components import connected_components
from ..operators.scd2 import scd2_intervals
from ..transform.dedup import dedup_keep_first
from ..transform.sampling import systematic_stratified_sample


# --- q57: custom UDAF via applyInPandas ----------------------------------
# Grouped pandas aggregation — the engine's UDAF path. The aggregate is
# integer-exact (counts/min/max/sum over json ints) so arbitrary batch
# order can't drift the result; floating-point UDAFs must either use the
# decimal idiom or accept rows-only checks.

def q57_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    with_k = events.select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "k_sum": [int(pdf["k"].sum())],
                "k_min": [int(pdf["k"].min())],
                "k_max": [int(pdf["k"].max())],
            }
        )

    return (
        with_k.groupBy("event_type")
        .applyInPandas(
            agg, schema="event_type string, n bigint, k_sum bigint, k_min bigint, k_max bigint"
        )
        .orderBy("event_type")
    )


_Q57_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- q58: table-generating projection (posexplode) -----------------------
# The UDTF shape done the JVM way: one row in → N (pos, token) rows out.
# A Python @udtf could do the same 100× slower; posexplode stays in
# codegen. Restricted to one source to bound output size.

def q58_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


_Q58_SQL = """
SELECT doc_id, CAST(i - 1 AS INT) AS pos, string_split(text, ' ')[i] AS token
FROM documents, unnest(range(1, len(string_split(text, ' ')) + 1)) AS u(i)
WHERE source = 'src0'
"""


# --- q59: SCD2 dimension history -----------------------------------------

def q59_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    changes = dedup_keep_first(
        orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        keys=["o_custkey", "o_orderdate"],
        order_by=["o_orderkey"],
        ascending=False,
    )
    return scd2_intervals(changes, keys=["o_custkey"], ts_col="o_orderdate").select(
        "o_custkey", "o_orderkey", "valid_from", "valid_to", "is_current"
    )


_Q59_SQL = """
WITH changes AS (
  SELECT o_custkey, o_orderdate, o_orderkey FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT o_custkey, o_orderkey,
       o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER w AS valid_to,
       LEAD(o_orderdate) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
"""


# --- q60: dedup canonicalization via connected components ----------------
# Near-dup pairs → clusters → canonical id (min doc per cluster). The
# Spark side iterates distributed label propagation; the oracle computes
# the same fixpoint with a recursive CTE (pair sets are small after
# thresholding, so closure is cheap oracle-side).

def q60_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    return connected_components(pairs).orderBy("node")


_Q60_SQL = """
WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM tok WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS c
  FROM sh s1 JOIN sh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a, b FROM common
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE c / (sa.sz + sb.sz - c) >= 0.5
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
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


# --- q61: stratified systematic sampling ---------------------------------

def q61_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return systematic_stratified_sample(
        docs.select("doc_id", "lang", "source", "n_chars"),
        strata=["lang"],
        order_by=["doc_id"],
        every_k=10,
    )


_Q61_SQL = """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
) WHERE (rn - 1) % 10 = 0
"""


# --- q62: BPE-ish token accounting ---------------------------------------

def q62_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            n_tokens_expr("text").alias("ws_tokens"),
            bpe_token_count_expr("text").alias("bpe_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
        )
        .orderBy("lang")
    )


_Q62_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)))
            AS BIGINT) AS total_bpe_tokens
FROM documents
GROUP BY lang
ORDER BY lang
"""


# --- q253: INCREMENTAL dedup clustering ≡ one-shot ------------------------
# q60's exact semantics maintained incrementally (operators/components
# cc_update — the kernel behind streaming/jobs.py
# run_components_stream): the near-dup pairs are time-split by a
# deterministic predicate (the "pairs found later" batch), labels are
# founded on the first half and UPDATED with the second, and the
# result must equal q60's uninterrupted answer — the oracle IS q60's
# SQL, so the gate proves incremental ≡ one-shot bit-for-bit. The
# update relaxes only the improvement frontier the new pairs induce,
# never the full label table per round — the dedup-cluster steady
# state (pairs stream in; canonical ids follow without recompute).

def q253_incremental_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.components import cc_update

    docs = tbl(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select(
        "a", "b"
    ).localCheckpoint()
    first = pairs.filter((F.col("a") + F.col("b")) % 2 == 0)
    second = pairs.filter((F.col("a") + F.col("b")) % 2 == 1)
    base = connected_components(first)
    return cc_update(pairs, second, base).orderBy("node")


QUERIES = {
    "q57_pandas_udaf": q57_pandas_udaf,
    "q58_posexplode_tokens": q58_posexplode_tokens,
    "q59_scd2_history": q59_scd2_history,
    "q60_dedup_components": q60_dedup_components,
    "q61_stratified_sample": q61_stratified_sample,
    "q62_bpe_tokens": q62_bpe_tokens,
    "q253_incremental_components": q253_incremental_components,
}

ORACLE = {
    "q57_pandas_udaf": _Q57_SQL,
    "q58_posexplode_tokens": _Q58_SQL,
    "q59_scd2_history": _Q59_SQL,
    "q60_dedup_components": _Q60_SQL,
    "q61_stratified_sample": _Q61_SQL,
    "q62_bpe_tokens": _Q62_SQL,
    # incremental ≡ one-shot: the oracle is q60's uninterrupted SQL
    "q253_incremental_components": _Q60_SQL,
}


# --- q69: end-to-end corpus dedup (the flagship LLM-pipeline op) ---------
# pairs → components → drop every non-canonical member: the corpus with
# near-duplicates collapsed to one representative each. Composition of
# q31 (exact pairs) and q60 (components) + one anti join.

def q69_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = docs.join(losers, "doc_id", "left_anti")
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


_Q69_SQL = """
WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM tok WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS c
  FROM sh s1 JOIN sh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a, b FROM common
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE c / (sa.sz + sb.sz - c) >= 0.5
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach AS (
  SELECT u AS node, v AS r FROM edges
  UNION
  SELECT reach.node, edges.v FROM reach JOIN edges ON reach.r = edges.u
),
comp AS (SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node),
losers AS (SELECT node AS doc_id FROM comp WHERE node != component),
kept AS (SELECT * FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM losers))
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM kept
GROUP BY lang
ORDER BY lang
"""


QUERIES["q69_dedup_corpus"] = q69_dedup_corpus
ORACLE["q69_dedup_corpus"] = _Q69_SQL


# --- q74: data profiling (the ETL preflight) -----------------------------
# Per-column null/distinct/min/max accounting in ONE pass (no per-column
# jobs): the profile every ingest pipeline runs before trusting a feed.

def q74_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    prof = cust.agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("c_name").isNull()).alias("null_name"),
        F.countDistinct("c_nationkey").alias("distinct_nations"),
        F.countDistinct("c_mktsegment").alias("distinct_segments"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )
    return prof


_Q74_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(count_if(c_name IS NULL) AS BIGINT) AS null_name,
       COUNT(DISTINCT c_nationkey) AS distinct_nations,
       COUNT(DISTINCT c_mktsegment) AS distinct_segments,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       MIN(c_custkey) AS min_key,
       MAX(c_custkey) AS max_key
FROM customer
"""


# --- q75: data-quality constraint checks ---------------------------------
# Key uniqueness + referential integrity as aggregates — violations are
# counted, not crashed on, so the report lands in monitoring.

def q75_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    lineitem = tbl(spark, sf_dir, "lineitem")
    customer = tbl(spark, sf_dir, "customer")
    dup_orders = (
        orders.groupBy("o_orderkey").count().filter(F.col("count") > 1)
        .agg(F.count("*").alias("v")).select(F.col("v"))
    )
    orphan_lineitems = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("v"))
    )
    orphan_orders = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count("*").alias("v"))
    )
    checks = (
        dup_orders.select(F.lit("duplicate_order_keys").alias("check"), "v")
        .unionByName(
            orphan_lineitems.select(F.lit("orphan_lineitems").alias("check"), "v")
        )
        .unionByName(
            orphan_orders.select(F.lit("orphan_orders").alias("check"), "v")
        )
    )
    return checks.withColumn("passed", F.col("v") == 0).orderBy("check")


_Q75_SQL = """
WITH checks AS (
  SELECT 'duplicate_order_keys' AS check, COUNT(*) AS v FROM (
    SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'orphan_lineitems', COUNT(*) FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
  UNION ALL
  SELECT 'orphan_orders', COUNT(*) FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
)
SELECT "check", v, v = 0 AS passed FROM checks ORDER BY "check"
"""


QUERIES["q74_profile"] = q74_profile
QUERIES["q75_dq_checks"] = q75_dq_checks
ORACLE["q74_profile"] = _Q74_SQL
ORACLE["q75_dq_checks"] = _Q75_SQL


# --- q175: incremental SCD2 batch apply, oracle-checked end to end --------
# Three nightly batches merge into a type-2 dimension with
# operators/scd2.scd2_apply (bootstrap → change half the keys → change a
# quarter again; the third batch also redelivers unchanged rows, so
# no-op idempotence is on the hashes too). The oracle derives the SAME
# final dimension state purely relationally from the residue algebra —
# so close/insert/skip decisions, interval stamps, and the null-safe
# attr compare are all value-checked.

_SCD_T1, _SCD_T2, _SCD_T3 = "1996-01-01", "1998-01-01", "2000-01-01"


def q175_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import scd2_apply

    orders = tbl(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    dim = scd2_apply(None, base, ["k"], ["status", "price"], _SCD_T1)
    b2 = base.filter(F.col("k") % 20 == 0).withColumn(
        "price", F.col("price") * 1.1
    )
    dim = scd2_apply(dim, b2, ["k"], ["status", "price"], _SCD_T2)
    # batch 3 redelivers every %20 key: %40 keys change again, the rest
    # repeat their current values (must be skipped as no-ops)
    b3 = base.filter(F.col("k") % 20 == 0).withColumn(
        "price",
        F.when(F.col("k") % 40 == 0, F.col("price") * 1.2).otherwise(
            F.col("price") * 1.1
        ),
    )
    dim = scd2_apply(dim, b3, ["k"], ["status", "price"], _SCD_T3)
    return (
        dim.groupBy("is_current")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("key_sum"),
            F.expr(DSUM("price")).alias("price_total"),
            F.sum(F.year("valid_from")).cast("bigint").alias("vf_year_sum"),
            F.sum(F.year("valid_to")).cast("bigint").alias("vt_year_sum"),
        )
        .orderBy("is_current")
    )


_Q175_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS price
  FROM orders WHERE o_orderkey % 10 = 0
),
rows_ AS (
  -- closed version 1: every %20 key (changed at T2)
  SELECT k, price, 1996 AS vf, 1998 AS vt, false AS is_current
  FROM base WHERE k % 20 = 0
  UNION ALL
  -- closed version 2: every %40 key (changed again at T3)
  SELECT k, price * 1.1, 1998, 2000, false FROM base WHERE k % 40 = 0
  UNION ALL
  -- current rows
  SELECT k, price * 1.2, 2000, NULL, true FROM base WHERE k % 40 = 0
  UNION ALL
  SELECT k, price * 1.1, 1998, NULL, true
  FROM base WHERE k % 20 = 0 AND k % 40 <> 0
  UNION ALL
  SELECT k, price, 1996, NULL, true
  FROM base WHERE k % 10 = 0 AND k % 20 <> 0
)
SELECT is_current,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS key_sum,
       {DSUM('price')} AS price_total,
       CAST(SUM(vf) AS BIGINT) AS vf_year_sum,
       CAST(SUM(vt) AS BIGINT) AS vt_year_sum
FROM rows_
GROUP BY is_current
ORDER BY is_current
"""


# --- q176: point-in-time dimension lookup ---------------------------------
# The join SCD2 exists FOR: enrich each fact row with the dimension
# version valid AT ITS OWN timestamp — key equality + validity-interval
# residual, never a per-fact sort or a latest-only shortcut. The oracle
# replays the version choice as residue×date CASE logic, so interval
# boundary semantics (inclusive from, exclusive to) are value-checked.
# Plan: ONE equi-join on the key with the interval predicate as a
# residual filter; the dimension's few versions per key make the
# residual cheap. At 100 TB both sides bucket on the key.

def q176_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import scd2_apply

    orders = tbl(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    dim = scd2_apply(None, base, ["k"], ["status", "price"], _SCD_T1)
    dim = scd2_apply(
        dim,
        base.filter(F.col("k") % 20 == 0).withColumn(
            "price", F.col("price") * 1.1
        ),
        ["k"],
        ["status", "price"],
        _SCD_T2,
    )
    dim = scd2_apply(
        dim,
        base.filter(F.col("k") % 40 == 0).withColumn(
            "price", F.col("price") * 1.2
        ),
        ["k"],
        ["status", "price"],
        _SCD_T3,
    )
    fact = orders.select("o_orderkey", "o_orderdate")
    pit = fact.join(
        dim,
        (fact.o_orderkey == dim.k)
        & (dim.valid_from <= fact.o_orderdate)
        & (dim.valid_to.isNull() | (fact.o_orderdate < dim.valid_to)),
    )
    return (
        pit.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_matched"),
            F.expr(DSUM("price")).alias("pit_price_total"),
        )
        .orderBy("order_year")
    )


_Q176_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k, o_totalprice AS price
  FROM orders WHERE o_orderkey % 10 = 0
),
pit AS (
  SELECT f.o_orderdate,
         CASE
           WHEN f.o_orderdate >= TIMESTAMP '{_SCD_T3}' AND b.k % 40 = 0
             THEN b.price * 1.2
           WHEN f.o_orderdate >= TIMESTAMP '{_SCD_T2}' AND b.k % 20 = 0
             THEN b.price * 1.1
           ELSE b.price
         END AS price
  FROM orders f JOIN base b ON f.o_orderkey = b.k
  WHERE f.o_orderdate >= TIMESTAMP '{_SCD_T1}'
)
SELECT CAST(date_part('year', o_orderdate) AS INT) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_matched,
       {DSUM('price')} AS pit_price_total
FROM pit
GROUP BY 1
ORDER BY 1
"""


QUERIES["q175_scd2_apply"] = q175_scd2_apply
QUERIES["q176_pit_lookup"] = q176_pit_lookup
ORACLE["q175_scd2_apply"] = _Q175_SQL
ORACLE["q176_pit_lookup"] = _Q176_SQL


# --- q276: DELETE-side incremental dedup clustering ≡ one-shot --------------
# q253's lifecycle counterpart: when documents are FORGOTTEN (q267),
# their near-dup pairs must leave the maintained clusters. A
# deterministic predicate marks the removed pairs ((a + 2b) % 5 = 0);
# labels are founded on the FULL pair set and the batch is removed with
# cc_delete_update (operators/components — relabel ONLY the components
# that lost a pair; deletion can only split, and splits are confined to
# the component that lost an edge). The result must equal q60's
# uninterrupted answer on the remaining pairs — the oracle is q60's SQL
# with the same predicate filtering the pair CTE, so the gate proves
# decremental ≡ one-shot bit-for-bit. Nodes whose last pair was removed
# drop out, exactly as the one-shot kernel over the remaining set.

def q276_components_delete(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.components import cc_delete_update

    docs = tbl(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select(
        "a", "b"
    ).localCheckpoint()
    pred = (F.col("a") + 2 * F.col("b")) % 5 == 0
    labels = connected_components(pairs)
    return cc_delete_update(
        pairs.filter(~pred), pairs.filter(pred), labels
    ).orderBy("node")


_Q276_SQL = _Q60_SQL.replace(
    "edges AS (SELECT a AS u, b AS v FROM pairs"
    " UNION SELECT b, a FROM pairs)",
    "pairs_r AS (\n"
    "  SELECT a, b FROM pairs WHERE NOT ((a + 2 * b) % 5 = 0)\n"
    "),\n"
    "edges AS (SELECT a AS u, b AS v FROM pairs_r"
    " UNION SELECT b, a FROM pairs_r)",
)
assert _Q276_SQL != _Q60_SQL  # the CTE surgery must have landed

QUERIES["q276_components_delete"] = q276_components_delete
ORACLE["q276_components_delete"] = _Q276_SQL
