"""Temporal query inventory over ``events``: tumbling/sliding windows,
gap sessionization, as-of join — the batch twins of the streaming jobs in
streaming/jobs.py (same logical windows, so streaming correctness is
anchored to these oracle-checked results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import DSUM, dsum, tbl
from ..operators import asof_join, sessionize
from ..transform.dedup import dedup_keep_first


# --- q50: tumbling window aggregation ------------------------------------
# Spark's window() aligns to the epoch, exactly like DuckDB's time_bucket.

def q50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum("value", "total"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total"
        )
        .orderBy("window_start", "event_type")
    )


_Q50_SQL = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n, {DSUM('value')} AS total
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- q51: sliding window (10 min size, 5 min slide) ----------------------
# Each event belongs to exactly size/slide = 2 windows; the oracle unnests
# the two bucket starts explicitly.

def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value", "total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
        .orderBy("window_start")
    )


_Q51_SQL = f"""
WITH assigned AS (
  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
           AS window_start,
         value
  FROM events
)
SELECT window_start, COUNT(*) AS n, {DSUM('value')} AS total
FROM assigned
GROUP BY 1
ORDER BY 1
"""


# --- q52: gap-based sessionization ---------------------------------------

def q52_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    sess = sessionize(
        events,
        keys=["user_id"],
        ts_col="ts",
        gap_seconds=1800,
        order_tiebreak=["event_id"],
    )
    return (
        sess.groupBy("user_id", F.col("session_id").cast("int").alias("session_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value", "total_value"),
        )
    )


_Q52_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       {DSUM('value')} AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


# --- q53: as-of join (events ← most recent order per user) ---------------
# Orders are deduped to one per (custkey, orderdate) first so the as-of
# match is unambiguous in both engines.

def q53_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    orders = tbl(spark, sf_dir, "orders")
    right = dedup_keep_first(
        orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        keys=["o_custkey", "o_orderdate"],
        order_by=["o_orderkey"],
        ascending=False,
    ).withColumnRenamed("o_custkey", "user_id")
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        right,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
    )
    return out.select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")


_Q53_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


QUERIES = {
    "q50_tumbling_window": q50_tumbling_window,
    "q51_sliding_window": q51_sliding_window,
    "q52_sessions": q52_sessions,
    "q53_asof_join": q53_asof_join,
}

ORACLE = {
    "q50_tumbling_window": _Q50_SQL,
    "q51_sliding_window": _Q51_SQL,
    "q52_sessions": _Q52_SQL,
    "q53_asof_join": _Q53_SQL,
}


# --- q54: interval (event-to-event) join — batch twin of the
# stream-stream interval join in streaming/jobs.py -------------------------
# Purchase attributed to every view by the same user within the
# preceding 30 minutes. Equality on user + time-range predicate: Catalyst
# runs equi-join on user with the range as residual — at 100 TB the
# bucketed variant (operators/range_join.py) grids the time axis instead.

def q54_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    return purchases.join(
        views,
        F.expr(
            "p_user = v_user AND v_ts >= p_ts - INTERVAL 30 MINUTES AND v_ts <= p_ts"
        ),
    ).select("purchase_id", "view_id", "p_user", "p_ts", "v_ts")


_Q54B_SQL = """
SELECT p.event_id AS purchase_id, v.event_id AS view_id,
       p.user_id AS p_user, p.ts AS p_ts, v.ts AS v_ts
FROM events p
JOIN events v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts <= p.ts
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
"""


QUERIES["q54b_interval_join"] = q54_interval_join
ORACLE["q54b_interval_join"] = _Q54B_SQL


# --- q226: duration-capped sessionization ---------------------------------
# q52's gap semantics PLUS a hard session-duration cap — the assignment
# becomes state-dependent (whether a row opens a session depends on
# where the current session started, which depends on every prior
# decision), so no lag/cumsum window rewrite exists. The Spark side is
# the documented applyInPandas kernel (operators/sessionize.py
# capped_sessions: one Arrow-batched linear scan per user, O(rows/user)
# state); the oracle replays the same recursion with a RECURSIVE CTE
# advancing every user in rank lockstep. Gap = 1 day, cap = 2 days —
# chosen so the cap actually BITES on the fixture (multi-day event
# chains split mid-chain; a pure-gap sessionization yields fewer
# sessions, asserted in tests).

_Q226_GAP_S = 86_400
_Q226_CAP_S = 172_800


def q226_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import capped_sessions

    events = tbl(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    sess = capped_sessions(
        events,
        keys=["user_id"],
        ts_col="ts",
        gap_seconds=_Q226_GAP_S,
        max_duration_seconds=_Q226_CAP_S,
        order_tiebreak=["event_id"],
    )
    return sess.groupBy(
        "user_id", F.col("session_id").cast("bigint").alias("session_id")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        (
            F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
        ).cast("bigint").alias("duration_us"),
    )


_Q226_SQL = f"""
WITH RECURSIVE e AS (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
rec AS (
  SELECT user_id, rn, ts, 1 AS sid, ts AS sstart
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.ts,
         CASE WHEN epoch_us(e.ts) - epoch_us(r.ts) > {_Q226_GAP_S * 1_000_000}
                OR epoch_us(e.ts) - epoch_us(r.sstart)
                     > {_Q226_CAP_S * 1_000_000}
              THEN r.sid + 1 ELSE r.sid END,
         CASE WHEN epoch_us(e.ts) - epoch_us(r.ts) > {_Q226_GAP_S * 1_000_000}
                OR epoch_us(e.ts) - epoch_us(r.sstart)
                     > {_Q226_CAP_S * 1_000_000}
              THEN e.ts ELSE r.sstart END
  FROM rec r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT user_id,
       CAST(sid AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
FROM rec
GROUP BY user_id, sid
"""

QUERIES["q226_capped_sessions"] = q226_capped_sessions
ORACLE["q226_capped_sessions"] = _Q226_SQL


# --- q269: nearest as-of with tolerance (merge_asof parity) ----------------
# q53's backward as-of extended to the full pandas merge_asof surface:
# for each event attach the CLOSEST order (backward or forward) of the
# same customer, but only within a 30-day tolerance window — ties
# prefer the backward match. Timestamps ride as epoch seconds (pure
# integer arithmetic in both engines); the operator still costs ONE
# keyed shuffle (both directional carries share the exchange —
# operators/asof.py). The oracle enumerates tolerance-window
# candidates and picks per event by (distance, backward-first) — the
# exact nearest contract, replayed relationally.

def q269_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    orders = tbl(spark, sf_dir, "orders")
    right = dedup_keep_first(
        orders.select("o_custkey", "o_orderdate", "o_orderkey",
                      "o_totalprice"),
        keys=["o_custkey", "o_orderdate"],
        order_by=["o_orderkey"],
        ascending=False,
    ).select(
        F.col("o_custkey").alias("user_id"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
        .alias("ots"),
        "o_orderkey",
        "o_totalprice",
    )
    left = events.select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ets")
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ets", right_ts="ots",
        payload=["o_orderkey", "o_totalprice"],
        how="nearest", tolerance=30 * 86400,
    )
    return out.select(
        "event_id", "user_id", "ets", "o_orderkey", "o_totalprice"
    )


_Q269_SQL = """
WITH o AS (
  SELECT o_custkey AS user_id,
         CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS ots,
         o_orderkey, o_totalprice FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
),
e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ets FROM events
),
cand AS (
  SELECT e.event_id, e.user_id, e.ets, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY abs(o.ots - e.ets),
                    CASE WHEN o.ots <= e.ets THEN 0 ELSE 1 END
         ) AS rn
  FROM e JOIN o ON o.user_id = e.user_id
                AND abs(o.ots - e.ets) <= 30 * 86400
)
SELECT e.event_id, e.user_id, e.ets, c.o_orderkey, c.o_totalprice
FROM e LEFT JOIN cand c ON c.event_id = e.event_id AND c.rn = 1
"""


QUERIES["q269_asof_nearest"] = q269_asof_nearest
ORACLE["q269_asof_nearest"] = _Q269_SQL
