"""Time-series operators over the events table: regular-grid resampling
with linear interpolation, rolling anomaly scores, exponential smoothing,
deterministic weighted sampling, and seasonal baselining.

The reference engine has no time-series surface; these close the gap a
metrics/observability user of any analytics engine expects (SURVEY.md
§2b windows/temporal) on top of the existing q50-q54 window suite.

Cross-engine determinism: every windowed sum goes through the
DECIMAL-accumulate idiom; interpolation/smoothing arithmetic is plain
IEEE +,-,*,/ written in the same association order on both engines
(each individual FP op is correctly rounded, so identical shapes give
identical bits); weights are powers of two (exact scaling); orderings
always carry a unique tiebreaker (event_id / doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import DAVG, davg, tbl


# --- q162: resample to an hourly grid + linear interpolation -------------
# Downsample each user's event stream to hourly means, then fill grid
# gaps by linear interpolation between the surrounding observed hours
# (edges stay NULL — extrapolation is a modeling choice, not a gap
# fill). The spine is generated per user from aggregated bounds with
# sequence()+explode — fully distributed, never a driver loop.
# Plan: one (user, hour) aggregate; the spine build reuses its output
# (dimension-sized after aggregation); prev/next scaffolding is two
# window passes over the same (user, hour) sort — Spark runs both in
# one Window exchange. At 100 TB the grid is |users|x|hours|, which is
# orders of magnitude smaller than the raw stream: resampling is the
# compaction step, so the expensive relation is read once.

def q162_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(davg("value", "obs"))
    # next-observation scaffolds come from LEAD over the compact hourly
    # relation (observed hours only), forward-propagated over the SAME
    # ascending grid window as prev — ONE sort of the expanded grid
    # instead of asc+desc two. History of this shape: the naive
    # unbounded-FOLLOWING frame is Spark's per-row-rescan O(rows²) trap
    # (12.6 s cold at sf0.1); asc+desc running frames fixed that
    # (5.7 s); lead-then-propagate drops the second grid sort (~8%
    # further, bit-identical — a gap row's last non-null nxt_v IS the
    # next observation's value).
    wl = Window.partitionBy("user_id").orderBy("hour")
    # two consumers (the spine bounds and the grid join) would each
    # re-run the events aggregate + window — materialize the compact
    # hourly relation once; the raw stream is then read exactly once
    hourly = hourly.select(
        "user_id",
        "hour",
        "obs",
        F.lead("obs").over(wl).alias("nxt_v"),
        F.lead("hour").over(wl).alias("nxt_t"),
    ).localCheckpoint()
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    g = spine.join(hourly, ["user_id", "hour"], "left")
    # pin the propagation window's input partitioning at the session's
    # parallelism: AQE coalesces by BYTES (the compact grid is a few
    # MB, so it lands in ONE post-shuffle partition and the whole
    # window + interpolation runs as a single serial task — measured
    # 1.2 s of the query's 2.2 s). An explicit keyed repartition is
    # never re-coalesced by AQE; defaultParallelism scales with the
    # cluster, so this is latency-vs-bytes, not a local-mode constant.
    g = g.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_hour = F.when(F.col("obs").isNotNull(), F.col("hour"))
    g = g.select(
        "user_id",
        "hour",
        "obs",
        F.last("obs", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(wp).alias("pt"),
        F.last("nxt_v", ignorenulls=True).over(wp).alias("nv"),
        F.last("nxt_t", ignorenulls=True).over(wp).alias("nt"),
    )
    frac = F.expr(
        "CAST(timestampdiff(HOUR, pt, hour) AS DOUBLE)"
        " / CAST(timestampdiff(HOUR, pt, nt) AS DOUBLE)"
    )
    return g.select(
        "user_id",
        "hour",
        F.col("obs").isNotNull().alias("observed"),
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .alias("interp"),
    )


_Q162_SQL = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, {DAVG('value')} AS obs
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
),
g AS (
  SELECT s.user_id, s.hour, h.obs
  FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
),
f AS (
  SELECT user_id, hour, obs,
    LAST_VALUE(obs IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN obs IS NOT NULL THEN hour END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    FIRST_VALUE(obs IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN obs IS NOT NULL THEN hour END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM g
)
SELECT user_id, hour, obs IS NOT NULL AS observed,
       CASE WHEN obs IS NOT NULL THEN obs
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              pv + (nv - pv) *
                (CAST(date_diff('hour', pt, hour) AS DOUBLE)
                 / CAST(date_diff('hour', pt, nt) AS DOUBLE))
       END AS interp
FROM f
"""


# --- q163: rolling z-score anomaly detection -----------------------------
# Per user, a 6-row trailing window (5 preceding + current) supplies the
# local mean/std; the z-score of the current value against that local
# distribution flags outliers. The moment sums are DECIMAL-exact so the
# frame aggregation order (incremental vs recompute, segment-tree vs
# naive) cannot shift bits between engines; sqrt is IEEE-exact.
# Plan: one window exchange on user_id; everything else is codegen.
# At 100 TB this is the streaming-friendly anomaly shape: a bounded
# ROWS frame keeps state O(frame) per key, and the same expression runs
# under Structured Streaming with applyInPandasWithState if needed.

def q163_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)"
    )
    mean = (
        f"CAST(SUM(CAST(value AS DECIMAL(28,6))) {over} AS DOUBLE)"
        f" / COUNT(value) {over}"
    )
    sq = (
        f"CAST(SUM(CAST(value * value AS DECIMAL(28,6))) {over} AS DOUBLE)"
        f" / COUNT(value) {over}"
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.expr(mean).alias("roll_mean"),
            F.expr(sq).alias("roll_sq"),
        )
        .withColumn(
            "roll_var",
            F.greatest(
                F.lit(0.0),
                F.col("roll_sq") - F.col("roll_mean") * F.col("roll_mean"),
            ),
        )
        .withColumn(
            "z",
            F.when(
                F.col("roll_var") > 0.0,
                (F.col("value") - F.col("roll_mean"))
                / F.sqrt(F.col("roll_var")),
            ),
        )
        .select(
            "user_id",
            "event_id",
            "value",
            "roll_mean",
            "z",
            (F.abs(F.col("z")) > 2.0).alias("anomaly"),
        )
    )


_Q163_OVER = """OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)"""

_Q163_SQL = f"""
WITH w AS (
  SELECT user_id, event_id, value,
    CAST(SUM(CAST(value AS DECIMAL(28,6))) {_Q163_OVER} AS DOUBLE)
      / COUNT(value) {_Q163_OVER} AS roll_mean,
    CAST(SUM(CAST(value * value AS DECIMAL(28,6))) {_Q163_OVER} AS DOUBLE)
      / COUNT(value) {_Q163_OVER} AS roll_sq
  FROM events
),
v AS (
  SELECT user_id, event_id, value, roll_mean,
         GREATEST(0.0, roll_sq - roll_mean * roll_mean) AS roll_var
  FROM w
)
SELECT user_id, event_id, value, roll_mean,
       CASE WHEN roll_var > 0.0
            THEN (value - roll_mean) / sqrt(roll_var) END AS z,
       ABS(CASE WHEN roll_var > 0.0
            THEN (value - roll_mean) / sqrt(roll_var) END) > 2.0 AS anomaly
FROM v
"""


# --- q164: exponentially weighted moving average -------------------------
# EWMA with half-life = 1 step over the trailing 8 rows, normalized over
# the weights actually present (partial windows at partition heads).
# Weights 2^-k are exact binary scalings, terms are added smallest-last
# in a fixed chain, and the normalizer divides once — bit-identical
# across engines without any decimal detour.
# Plan: 8 LAGs share ONE window sort; the arithmetic is codegen. The
# truncated-tail EWMA (vs the recursive infinite-tail form) is the
# distributed-friendly variant: it needs a bounded frame, not a serial
# scan, so it parallelizes per key at any scale.

def q164_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", k).over(w).alias(f"x{k}") for k in range(1, 8)]
    g = ev.select("user_id", "event_id", "ts", "value", *lags)
    num = F.coalesce(F.col("value"), F.lit(0.0)) * 1.0
    den = F.when(F.col("value").isNotNull(), 1.0).otherwise(0.0)
    for k in range(1, 8):
        wt = 2.0 ** -k
        num = num + F.coalesce(F.col(f"x{k}"), F.lit(0.0)) * wt
        den = den + F.when(F.col(f"x{k}").isNotNull(), wt).otherwise(0.0)
    return g.select(
        "user_id", "event_id", "value", (num / den).alias("ewma")
    )


def _q164_sql() -> str:
    lag_cols = ",\n    ".join(
        f"LAG(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS x{k}"
        for k in range(1, 8)
    )
    num = "COALESCE(value, 0.0) * 1.0"
    den = "CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END"
    for k in range(1, 8):
        wt = repr(2.0 ** -k)
        num += f" + COALESCE(x{k}, 0.0) * {wt}"
        den += f" + CASE WHEN x{k} IS NOT NULL THEN {wt} ELSE 0.0 END"
    return f"""
WITH l AS (
  SELECT user_id, event_id, value,
    {lag_cols}
  FROM events
)
SELECT user_id, event_id, value, ({num}) / ({den}) AS ewma
FROM l
"""


# --- q165: deterministic weighted sampling -------------------------------
# Priority sampling with reproducible keys: priority = H(text) / weight
# where H is the portable rolling hash and weight = n_chars, so longer
# documents are proportionally more likely to make the per-language
# top-20. Deterministic (no RNG state) → the sample is reproducible
# across runs, engines, and cluster sizes — the property training-data
# sampling needs (same idiom family as q141's content-hash buckets).
# Plan: the priority is a map-side expression; per-language top-20 is a
# rank over a window — at 100 TB replace with the grouped top-k
# operator (operators/topk.py) to avoid sorting whole partitions.

def q165_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import rolling_hash_expr

    docs = tbl(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        (
            rolling_hash_expr("text").cast("double")
            / F.col("n_chars").cast("double")
        ).alias("priority"),
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", "n_chars", "priority")
    )


_Q165_SQL = """
WITH scored AS (
  SELECT lang, doc_id, n_chars,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(text) + 1),
                               i -> ascii(text[i]))),
              (acc, c) -> (acc * 31 + c) % 1000000007) AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS priority
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, n_chars, priority,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rk
  FROM scored
)
SELECT lang, doc_id, n_chars, priority FROM ranked WHERE rk <= 20
"""


# --- q166: seasonal baseline + residual outliers -------------------------
# Hour-of-day baseline per event type (the simplest seasonal profile),
# residual = value − baseline, top-50 absolute residuals. The
# deseasonalization shape behind every "is this metric unusual for
# 3 AM?" alert.
# Plan: the baseline relation is |event_types| × 24 rows → broadcast
# back onto the stream (no second big shuffle); top-50 is
# TakeOrderedAndProject, never a full sort.

def q166_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    keyed = ev.withColumn("hod", F.hour("ts"))
    baseline = keyed.groupBy("event_type", "hod").agg(
        davg("value", "baseline")
    )
    return (
        keyed.join(F.broadcast(baseline), ["event_type", "hod"])
        .select(
            "event_type",
            "hod",
            "event_id",
            "value",
            "baseline",
            (F.col("value") - F.col("baseline")).alias("residual"),
        )
        .orderBy(F.abs(F.col("residual")).desc(), "event_id")
        .limit(50)
    )


_Q166_SQL = f"""
WITH keyed AS (
  SELECT event_type, CAST(date_part('hour', ts) AS INT) AS hod, event_id, value
  FROM events
),
baseline AS (
  SELECT event_type, hod, {DAVG('value')} AS baseline
  FROM keyed GROUP BY 1, 2
)
SELECT k.event_type, k.hod, k.event_id, k.value, b.baseline,
       k.value - b.baseline AS residual
FROM keyed k JOIN baseline b ON k.event_type = b.event_type AND k.hod = b.hod
ORDER BY ABS(k.value - b.baseline) DESC, k.event_id
LIMIT 50
"""


# --- q206: DEMA — double exponential smoothing with trend correction -----
# q164's EWMA lags behind a trending series by construction; DEMA
# (Mulloy '94) removes first-order lag by smoothing the smoothed series
# and extrapolating: DEMA = 2*EWMA - EWMA(EWMA), with the residual
# EWMA - EWMA(EWMA) as the per-step trend estimate — the truncated,
# bounded-frame cousin of Holt's linear method (whose recursive
# level/trend state needs a serial scan; this form needs two window
# passes and parallelizes per key at any scale). Same 8-term
# power-of-two weight chain as q164 on BOTH passes — exact binary
# scalings, fixed-order additions, one division per pass — so the
# result is bit-identical across engines with no decimal detour.
# Plan: two window sorts over the same (user_id, ts, event_id) key;
# at scale a repartitionByRange on the key makes the second sort a
# partition-local re-sort of the first's output.

def _ewma_chain(col: str, prefix: str):
    num = F.coalesce(F.col(col), F.lit(0.0)) * 1.0
    den = F.when(F.col(col).isNotNull(), 1.0).otherwise(0.0)
    for k in range(1, 8):
        wt = 2.0 ** -k
        num = num + F.coalesce(F.col(f"{prefix}{k}"), F.lit(0.0)) * wt
        den = den + F.when(
            F.col(f"{prefix}{k}").isNotNull(), wt
        ).otherwise(0.0)
    return num / den


def q206_dema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags1 = [F.lag("value", k).over(w).alias(f"x{k}") for k in range(1, 8)]
    e1 = ev.select("user_id", "event_id", "ts", "value", *lags1).select(
        "user_id", "event_id", "ts", "value",
        _ewma_chain("value", "x").alias("ewma"),
    )
    lags2 = [F.lag("ewma", k).over(w).alias(f"y{k}") for k in range(1, 8)]
    e2 = e1.select("user_id", "event_id", "ts", "value", "ewma", *lags2)
    ewma2 = _ewma_chain("ewma", "y")
    return e2.select(
        "user_id",
        "event_id",
        "value",
        "ewma",
        (F.lit(2.0) * F.col("ewma") - ewma2).alias("dema"),
        (F.col("ewma") - ewma2).alias("trend"),
    )


def _q206_sql() -> str:
    def chain(col: str, prefix: str) -> str:
        num = f"COALESCE({col}, 0.0) * 1.0"
        den = f"CASE WHEN {col} IS NOT NULL THEN 1.0 ELSE 0.0 END"
        for k in range(1, 8):
            wt = repr(2.0 ** -k)
            num += f" + COALESCE({prefix}{k}, 0.0) * {wt}"
            den += f" + CASE WHEN {prefix}{k} IS NOT NULL THEN {wt} ELSE 0.0 END"
        return f"({num}) / ({den})"

    lag1 = ",\n    ".join(
        f"LAG(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS x{k}"
        for k in range(1, 8)
    )
    lag2 = ",\n    ".join(
        f"LAG(ewma, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS y{k}"
        for k in range(1, 8)
    )
    return f"""
WITH l1 AS (
  SELECT user_id, event_id, ts, value,
    {lag1}
  FROM events
),
e1 AS (
  SELECT user_id, event_id, ts, value, {chain('value', 'x')} AS ewma
  FROM l1
),
l2 AS (
  SELECT user_id, event_id, ts, value, ewma,
    {lag2}
  FROM e1
)
SELECT user_id, event_id, value, ewma,
       2.0 * ewma - {chain('ewma', 'y')} AS dema,
       ewma - {chain('ewma', 'y')} AS trend
FROM l2
"""


QUERIES = {
    "q162_resample_interpolate": q162_resample_interpolate,
    "q163_rolling_zscore": q163_rolling_zscore,
    "q164_ewma": q164_ewma,
    "q165_weighted_sample": q165_weighted_sample,
    "q166_seasonal_baseline": q166_seasonal_baseline,
    "q206_dema": q206_dema,
}
ORACLE = {
    "q162_resample_interpolate": _Q162_SQL,
    "q163_rolling_zscore": _Q163_SQL,
    "q164_ewma": _q164_sql(),
    "q165_weighted_sample": _Q165_SQL,
    "q166_seasonal_baseline": _Q166_SQL,
    "q206_dema": _q206_sql(),
}
