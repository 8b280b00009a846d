"""Distributed classical-ML primitives as dataflow (q181-q183).

The iterative-linear-algebra companion to q129's k-means: a power
iteration for the corpus's top principal direction, the hashing trick
for text features, and closed-form group-wise OLS — each expressed as
joins/aggregations over exploded relations with DECIMAL-exact
accumulation, so distributed training math is REPRODUCIBLE (bit-equal
at any parallelism) and DuckDB-verifiable.

Scale notes are per-query below; the common pattern is that model state
(a 64-vector, a hash table of 32 buckets, five regression moments) is
dimension-sized and rides relations or broadcasts — never driver loops
over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import tbl

#: DECIMAL(28,18)-exact sum of a computed-double term, surfaced as
#: DOUBLE via the string hop (same rationale as q129's _SQDIST)
def _PSUM(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,18)))"
        " AS STRING) AS DOUBLE)"
    )


def _PSUM_OVER(expr: str) -> str:
    """Windowed (unpartitioned) variant: OVER binds to the SUM."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,18))) OVER ()"
        " AS STRING) AS DOUBLE)"
    )


_DIMS = 64


# --- q181: power iteration for the top principal direction ----------------
# Two unrolled iterations of v ← Xᵀ(Xv) / ‖Xᵀ(Xv)‖ over the UNCENTERED
# embedding matrix (the Gram top singular direction — the memory-light
# PCA variant; centering adds one mean-vector join and nothing else).
# All matrix-vector products are joins over the exploded (vec, d, x)
# relation with DECIMAL-exact sums; the normalizer rides an
# unpartitioned window over the 64-row direction relation (never a
# 1-row cross join). Iterations unroll as stages — no driver state.
# At 100 TB: each iteration is one broadcast of the 64-row direction +
# two aggregations; the vector count never materializes anywhere.
# Final loadings are ROUND(•, 9) (computed doubles: the engines'
# double→DECIMAL casts can differ in the last ulp mid-pipeline — q129's
# precedent — and rounding the REPORTED values absorbs that while
# remaining a real regression tripwire).

def q181_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    )

    def iterate(v: DataFrame) -> DataFrame:
        dot = (
            pts.join(F.broadcast(v), "d")
            .groupBy("vec_id")
            .agg(F.expr(_PSUM("x * v")).alias("dot"))
        )
        s = (
            pts.join(dot, "vec_id")
            .groupBy("d")
            .agg(F.expr(_PSUM("x * dot")).alias("s"))
        )
        return s.select(
            "d",
            (F.col("s") / F.sqrt(F.expr(_PSUM_OVER("s * s")))).alias("v"),
            F.sqrt(F.expr(_PSUM_OVER("s * s"))).alias("growth"),
        )

    v0 = spark.range(_DIMS).select(
        F.col("id").cast("int").alias("d"), F.lit(0.125).alias("v")
    )
    v1 = iterate(v0).select("d", "v")
    v2 = iterate(v1)
    return v2.select(
        "d",
        F.round("v", 9).alias("loading"),
        F.round("growth", 6).alias("eigenvalue_estimate"),
    ).orderBy("d")


_Q181_SQL = f"""
WITH pts AS (
  SELECT vec_id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, {_DIMS + 1})) AS i) dims
),
dot1 AS (
  SELECT vec_id, {_PSUM('x * 0.125')} AS dot
  FROM pts GROUP BY vec_id
),
s1 AS (
  SELECT p.d, {_PSUM('p.x * dot1.dot')} AS s
  FROM pts p JOIN dot1 ON p.vec_id = dot1.vec_id
  GROUP BY p.d
),
v1 AS (
  SELECT d, s / sqrt({_PSUM_OVER('s * s')}) AS v FROM s1
),
dot2 AS (
  SELECT p.vec_id, {_PSUM('p.x * v1.v')} AS dot
  FROM pts p JOIN v1 ON p.d = v1.d
  GROUP BY p.vec_id
),
s2 AS (
  SELECT p.d, {_PSUM('p.x * dot2.dot')} AS s
  FROM pts p JOIN dot2 ON p.vec_id = dot2.vec_id
  GROUP BY p.d
)
SELECT d,
       ROUND(s / sqrt({_PSUM_OVER('s * s')}), 9) AS loading,
       ROUND(sqrt({_PSUM_OVER('s * s')}), 6) AS eigenvalue_estimate
FROM s2
ORDER BY d
"""


# --- q182: the hashing trick (feature hashing for text) -------------------
# Fixed-width text features without a vocabulary pass: every token maps
# to bucket = polynomial_hash(token) % 32 (the portable rolling hash, so
# both engines bucket identically), and a document's feature vector is
# its per-bucket token counts — the Vowpal-Wabbit / scikit
# HashingVectorizer idiom, collision-lossy BY DESIGN (documented trade:
# no vocabulary state at 100 TB, collisions average out in linear
# models). Output is the sparse (doc, bucket, tf) relation plus the
# bucket's corpus-wide document frequency.
# Plan: pure map-side hashing + ONE (doc, bucket) aggregate; the bucket
# DF relation is 32 rows, joined back broadcast.

_B = 32


def q182_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("split(text, ' ')")).alias("word"),
    )
    bucket = F.expr(
        "CAST(aggregate(split(word, ''), 0L,"
        f" (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007) % {_B} AS INT)"
    )
    sparse = (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    bucket_df = sparse.groupBy("bucket").agg(
        F.countDistinct("doc_id").cast("bigint").alias("bucket_df")
    )
    return sparse.join(F.broadcast(bucket_df), "bucket").select(
        "doc_id", "bucket", "tf", "bucket_df"
    )


_Q182_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(word) + 1),
                               i -> ascii(word[i]))),
              (acc, c) -> (acc * 31 + c) % 1000000007) % {_B} AS INT)
           AS bucket
  FROM toks
),
sparse AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf
  FROM hashed GROUP BY doc_id, bucket
),
bucket_df AS (
  SELECT bucket, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS bucket_df
  FROM sparse GROUP BY bucket
)
SELECT doc_id, s.bucket, tf, bucket_df
FROM sparse s JOIN bucket_df b ON s.bucket = b.bucket
"""


# --- q183: group-wise OLS (closed-form slope/intercept per key) -----------
# Per event type, the least-squares trend of value over time from the
# five classical moments (n, Σx, Σy, Σxy, Σx²) — one aggregate pass,
# exact DECIMAL accumulation (x is integer hours since a fixed origin,
# so xy/x² are exact-integer-valued products), then the closed form in
# deterministic double arithmetic. The reason NOT to use the built-in
# regr_slope: its internal accumulation is order-dependent double — the
# moment form is the distributed-reproducible formulation.
# Plan: one partial+final hash aggregate; scan-bound at any scale.

def q183_groupwise_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    g = ev.select(
        "event_type",
        F.expr(
            "CAST(timestampdiff(HOUR, TIMESTAMP '2024-01-01', ts) AS DOUBLE)"
        ).alias("x"),
        F.col("value").alias("y"),
    )
    m = g.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.expr(_PSUM("x")).alias("sx"),
        F.expr(_PSUM("y")).alias("sy"),
        F.expr(_PSUM("x * y")).alias("sxy"),
        F.expr(_PSUM("x * x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    ).orderBy("event_type")


_Q183_SQL = f"""
WITH g AS (
  SELECT event_type,
         CAST(date_diff('hour', TIMESTAMP '2024-01-01', ts) AS DOUBLE) AS x,
         value AS y
  FROM events
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {_PSUM('x')} AS sx,
         {_PSUM('y')} AS sy,
         {_PSUM('x * y')} AS sxy,
         {_PSUM('x * x')} AS sxx
  FROM g GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
         AS intercept
FROM m
ORDER BY event_type
"""


# --- q202: bigram-LM scoring for target-corpus data selection -------------
# The n-gram upgrade of q168's DSIR unigram weights: train an add-one-
# smoothed BIGRAM language model on the target slice (lang='en') and
# score every document by its average conditional probability
# avg over bigrams of p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V) — the
# Moore-Lewis / CCNet-style "does this look like my target corpus"
# selection signal, kept transcendental-free: textbook perplexity takes
# logs, but log is not bit-stable cross-engine (the q190 lesson), and
# the AVERAGE conditional probability is a monotone-equivalent ranking
# for fixed-length comparisons while staying exact — every p is a ratio
# of integers (deterministic double division) and the per-doc sum goes
# through the DECIMAL string-hop.
# Scale: the model (bigram + context counts) is vocab-bounded — orders
# smaller than the corpus — so the two scoring joins broadcast in
# practice (AQE sizes them; no unconditional hint). Everything else is
# one explode + one aggregation per side. V is an O(1) driver scalar
# (control plane, the q126 node-count precedent).

def q202_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.langmodel import bigram_lm_scores

    docs = tbl(spark, sf_dir, "documents")
    scores = bigram_lm_scores(
        docs, docs.filter(F.col("lang") == "en"),
        id_cols=("doc_id", "lang"),
    )
    return (
        scores.select(
            "doc_id",
            "lang",
            "n_bigrams",
            # ROUND(•, 9): the per-row double→DECIMAL(28,18) casts inside
            # the accumulate can drift a final ulp cross-engine (the
            # q181/q129 precedent); rounding the REPORTED score absorbs
            # it (scores are ~1e-4, so 9 frac digits still separate docs)
            F.round("avg_cond_prob", 9).alias("avg_cond_prob"),
        )
        .orderBy(F.desc("avg_cond_prob"), "doc_id")
        .limit(40)
    )


_Q202_SQL = f"""
WITH tgt_bg AS MATERIALIZED (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT string_split(text, ' ') AS toks
        FROM documents WHERE lang = 'en'),
       unnest(range(1, len(toks))) AS u(i)
),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM tgt_bg GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
       FROM tgt_bg GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w) AS v FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE lang = 'en')),
all_bg AS (
  SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
        FROM documents),
       unnest(range(1, len(toks))) AS u(i)
),
scored AS (
  SELECT b.doc_id, b.lang,
         CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE)
           / CAST(COALESCE(c1.c1, 0) + (SELECT v FROM v) AS DOUBLE) AS p
  FROM all_bg b
  LEFT JOIN c1 ON c1.w1 = b.w1
  LEFT JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
)
SELECT doc_id, lang,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND({_PSUM('p')} / COUNT(*), 9) AS avg_cond_prob
FROM scored
GROUP BY doc_id, lang
ORDER BY avg_cond_prob DESC, doc_id
LIMIT 40
"""



# --- q210: nearest-centroid classifier evaluation -------------------------
# The supervised twin of q129's k-means: per-label centroids from a
# deterministic train split (vec_id % 4 != 0), every held-out vector
# classified by squared-euclidean argmin against the centroids, readout
# = per-label accuracy. Centroid means are exact-sum / count divisions;
# distances reuse q129's DECIMAL string-hop accumulate; the argmin
# tie-breaks on label. This is the eval loop of a classical classifier
# expressed as dataflow — at 100 TB the exploded (vec, d, x) relation
# is traded for the array fold exactly as q129's scale note describes,
# and the centroid relation (labels x 64 dims) broadcasts.
# Honest fixture note: the synthetic embeddings are label-independent,
# so accuracy sits at chance (~1/|labels|) — the gate pins the
# centroid/distance/argmin arithmetic, not a modeling claim.

def q210_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("d", "x")
    )
    train = pts.filter(F.col("vec_id") % 4 != 0)
    test = pts.filter(F.col("vec_id") % 4 == 0)
    cent = train.groupBy(F.col("label").alias("cl"), "d").agg(
        (F.expr(_PSUM("x")) / F.count("*")).alias("c")
    )
    dist = (
        test.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "label", "cl")
        .agg(F.expr(_PSUM("(x - c) * (x - c)")).alias("dist"))
    )
    pred = dist.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy("dist", "cl")
        ),
    ).filter(F.col("rn") == 1)
    return (
        pred.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(
                (F.col("cl") == F.col("label")).cast("int")
            ).cast("bigint").alias("n_correct"),
        )
        .select(
            "label",
            "n_test",
            "n_correct",
            (
                F.col("n_correct").cast("double")
                / F.col("n_test").cast("double")
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


_Q210_SQL = f"""
WITH pts AS (
  SELECT vec_id, label, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, {_DIMS + 1})) AS i) dims
),
cent AS (
  SELECT label AS cl, d, {_PSUM('x')} / COUNT(*) AS c
  FROM pts WHERE vec_id % 4 != 0 GROUP BY label, d
),
dist AS (
  SELECT p.vec_id, p.label, cent.cl,
         {_PSUM('(p.x - cent.c) * (p.x - cent.c)')} AS dist
  FROM pts p JOIN cent ON p.d = cent.d
  WHERE p.vec_id % 4 = 0
  GROUP BY p.vec_id, p.label, cent.cl
),
pred AS (
  SELECT vec_id, label, cl FROM (
    SELECT vec_id, label, cl,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cl) AS rn
    FROM dist
  ) WHERE rn = 1
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN cl = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN cl = label THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM pred
GROUP BY label
ORDER BY label
"""


QUERIES = {
    "q181_power_iteration": q181_power_iteration,
    "q182_feature_hashing": q182_feature_hashing,
    "q183_groupwise_regression": q183_groupwise_regression,
    "q202_bigram_lm": q202_bigram_lm,
    "q210_nearest_centroid": q210_nearest_centroid,
}
ORACLE = {
    "q181_power_iteration": _Q181_SQL,
    "q182_feature_hashing": _Q182_SQL,
    "q183_groupwise_regression": _Q183_SQL,
    "q202_bigram_lm": _Q202_SQL,
    "q210_nearest_centroid": _Q210_SQL,
}


# --- q255: multinomial Naive Bayes language classifier ---------------------
# The supervised member of the model-adjacent family (q181/q183/q202/
# q210 are all unsupervised or closed-form): train add-one-smoothed
# multinomial NB on the held-in documents' (lang, text) pairs
# (doc_id % 3 != 0), predict lang for the held-out third — the
# fasttext-style quality/language filter of an LLM curation pass, as
# exact relational arithmetic (transform/nbayes.py: the model is two
# count relations; scoring is explode → broadcast class join → left
# join → exact DECIMAL-accumulated log-likelihood sum, ln per-term
# quantized to the DECIMAL(28,6) grid — the q230/_idf_expr contract).
# The oracle replays train + score + argmax (min-label tie-break)
# bit-for-bit.

def q255_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.nbayes import nb_predict, nb_score, nb_train

    docs = tbl(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    test = docs.filter(F.col("doc_id") % 3 == 0)
    wc, cs, vocab, n = nb_train(train, "lang")
    pred = nb_predict(nb_score(test, wc, cs, vocab, n))
    return (
        pred.join(
            test.select("doc_id", F.col("lang").alias("truth")), "doc_id"
        )
        .select(
            "doc_id",
            "pred",
            "truth",
            (F.col("pred") == F.col("truth")).alias("correct"),
            "score",
        )
        .orderBy("doc_id")
    )


# the train → score → argmax CTE chain shared by q255 (per-doc
# predictions) and q261 (per-class evaluation harness)
_NB_CTE = """
WITH train AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
test AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
toks AS (
  SELECT lang AS label, unnest(string_split(text, ' ')) AS word
  FROM train
),
wc AS (SELECT label, word, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2),
cs AS (
  SELECT t.label, t.n_tokens, d.n_docs FROM
    (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_tokens
     FROM toks GROUP BY 1) t
  JOIN (SELECT lang AS label, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM train GROUP BY 1) d USING (label)
),
v AS (SELECT COUNT(DISTINCT word) AS v FROM toks),
n AS (SELECT COUNT(*) AS n FROM train),
ttoks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM test
),
scores AS (
  SELECT p.doc_id, p.label,
         CAST(
           SUM(CAST(ln((COALESCE(wc.c, 0) + 1)
                       / CAST(p.n_tokens + (SELECT v FROM v) AS DOUBLE))
                    AS DECIMAL(28,6)))
           + FIRST(CAST(ln(CAST(p.n_docs AS DOUBLE)
                           / (SELECT n FROM n)) AS DECIMAL(28,6)))
         AS DOUBLE) AS score
  FROM (SELECT t.doc_id, t.word, c.label, c.n_tokens, c.n_docs
        FROM ttoks t CROSS JOIN cs c) p
  LEFT JOIN wc ON wc.label = p.label AND wc.word = p.word
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, MAX(score) AS score FROM scores GROUP BY 1
),
pred AS (
  SELECT b.doc_id, b.score, MIN(s.label) AS pred
  FROM best b JOIN scores s ON s.doc_id = b.doc_id AND s.score = b.score
  GROUP BY 1, 2
)
"""

_Q255_SQL = _NB_CTE + """
SELECT p.doc_id, p.pred, t.lang AS truth,
       p.pred = t.lang AS correct, p.score
FROM pred p JOIN test t ON t.doc_id = p.doc_id
ORDER BY p.doc_id
"""

QUERIES["q255_naive_bayes"] = q255_naive_bayes
ORACLE["q255_naive_bayes"] = _Q255_SQL


# --- q261: NB evaluation harness (precision / recall / F1) -----------------
# q255 composed with q256's measurement discipline: the held-out
# predictions meet their gold labels, and the per-class confusion
# margins (tp / fp / fn, exact integers) derive precision, recall and
# F1 (single IEEE divisions of those integers — deterministic in any
# engine, so the oracle replays the whole chain trivially). The
# scikit-learn zero_division=0 conventions: precision 0 when a class
# was never predicted, recall 0 when it never appears in gold. Closes
# the classifier loop the way q256 closed retrieval
# (transform/nbayes.py nb_evaluate / nb_confusion).

def q261_nb_evaluation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.nbayes import (
        nb_evaluate,
        nb_predict,
        nb_score,
        nb_train,
    )

    docs = tbl(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    test = docs.filter(F.col("doc_id") % 3 == 0)
    wc, cs, vocab, n = nb_train(train, "lang")
    pred = nb_predict(nb_score(test, wc, cs, vocab, n))
    gold = test.select("doc_id", F.col("lang").alias("label"))
    return nb_evaluate(pred, gold).orderBy("label")


_Q261_SQL = _NB_CTE + """
, judged AS (
  SELECT p.pred, t.lang AS gold
  FROM pred p JOIN test t ON t.doc_id = p.doc_id
),
bg AS (
  SELECT gold AS label, CAST(COUNT(*) AS BIGINT) AS n_gold,
         CAST(SUM(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT)
           AS tp
  FROM judged GROUP BY 1
),
bp AS (
  SELECT pred AS label, CAST(COUNT(*) AS BIGINT) AS n_pred
  FROM judged GROUP BY 1
),
m AS (
  SELECT COALESCE(bg.label, bp.label) AS label,
         CAST(COALESCE(bg.n_gold, 0) AS BIGINT) AS n_gold,
         CAST(COALESCE(bp.n_pred, 0) AS BIGINT) AS n_pred,
         CAST(COALESCE(bg.tp, 0) AS BIGINT) AS tp
  FROM bg FULL OUTER JOIN bp ON bg.label = bp.label
),
r AS (
  SELECT label, n_gold, n_pred, tp,
         CAST(n_pred - tp AS BIGINT) AS fp,
         CAST(n_gold - tp AS BIGINT) AS fn,
         CASE WHEN n_pred > 0
              THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)
              ELSE 0.0 END AS precision,
         CASE WHEN n_gold > 0
              THEN CAST(tp AS DOUBLE) / CAST(n_gold AS DOUBLE)
              ELSE 0.0 END AS recall
  FROM m
)
SELECT label, n_gold, n_pred, tp, fp, fn, precision, recall,
       CASE WHEN precision + recall > 0
            THEN 2.0 * precision * recall / (precision + recall)
            ELSE 0.0 END AS f1
FROM r
ORDER BY label
"""

QUERIES["q261_nb_evaluation"] = q261_nb_evaluation
ORACLE["q261_nb_evaluation"] = _Q261_SQL
