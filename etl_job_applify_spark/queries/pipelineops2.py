"""Training-data pipeline operators, round 2: corpus-curation steps a
100 TB pretraining pipeline runs between raw ingest and tokenization.

- q117 Gopher-style quality rule gate (length / mean-word-length /
        stopword / repetition rules as one codegen'd projection);
- q118 source mixing weights (per-domain token accounting + temperature
        reweighting — the "data mixing" step of corpus assembly);
- q119 deterministic train/val/test split (content-hash bucketing via
        md5, reproducible across engines and runs — never random());
- q120 rare-word score (two-pass global document-frequency join — the
        cheap unigram stand-in for perplexity-based quality filters).

All JVM built-ins (no Python stages); every query has a DuckDB oracle.
The reference has no analytics surface (services/post_processing.py:5-8
is `pass`); these extend the BASELINE.json north-star pipeline rows the
same way q81-q85 did.

Determinism notes: ratios divide exact integer counts (or DECIMAL sums)
inside each row — no cross-row float accumulation anywhere; sqrt is
IEEE-correctly-rounded in both engines (unlike log/exp, which stay
banned from checked outputs); md5 of identical UTF-8 text is identical
everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import tbl


# --- q117: Gopher-style quality rule gate --------------------------------
# The four classic rule families from the Gopher/MassiveText cleaning
# recipe, adapted to the fixture corpus's scale: word count bounds, mean
# word length bounds, a stopword-evidence gate, and a repetition gate
# (distinct-token ratio). One narrow projection, fully codegen'd — at
# 100 TB this runs at parquet-scan speed with zero shuffles, which is
# exactly why rule-based gates run FIRST in real pipelines (they shed
# volume before any expensive pairwise/dedup stage).

_T = "split(text, ' ')"

def q117_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"CAST(size({_T}) AS INT)").alias("n_words"),
        F.expr(
            f"CAST((length(text) - size({_T}) + 1) / size({_T}) AS DOUBLE)"
        ).alias("mean_word_len"),
        F.expr(
            f"CAST(size(filter({_T}, t -> t IN ('the','a','of','and','to')))"
            " AS INT)"
        ).alias("stop_hits"),
        F.expr(
            f"CAST(size(array_distinct({_T})) AS DOUBLE)"
            f" / CAST(size({_T}) AS DOUBLE)"
        ).alias("distinct_ratio"),
    ).select(
        "*",
        (
            F.col("n_words").between(30, 10000)
            & F.col("mean_word_len").between(3.0, 10.0)
            & (F.col("stop_hits") >= 1)
            & (F.col("distinct_ratio") >= 0.3)
        ).alias("passes"),
    )


_Q117_SQL = """
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         CAST((length(text) - len(string_split(text, ' ')) + 1)
              / len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
         CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','and','to'))) AS INT)
           AS stop_hits,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio
  FROM documents
)
SELECT *,
       (n_words BETWEEN 30 AND 10000
        AND mean_word_len BETWEEN 3.0 AND 10.0
        AND stop_hits >= 1
        AND distinct_ratio >= 0.3) AS passes
FROM m
"""


# --- q118: source mixing weights -----------------------------------------
# Per-source token accounting and temperature-0.5 reweighting: the data-
# mixing step that turns raw domain sizes into sampling weights
# (upweighting small high-quality domains, downweighting bulk crawl).
# temp_weight = share^0.5 (relative weight before normalization) and
# upsample_factor = temp_weight / share = share^-0.5 — both per-row
# functions of exact integer counts, so no cross-row float accumulation.
# Plan: one partial+final agg on source, then a window over the agg
# output for the exact integer total — at 100 TB that output is
# |domains| rows, so the unpartitioned window is free.

def q118_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr(f"size({_T})")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(w).cast("double")
        ).alias("token_share"),
    ).select(
        "*",
        F.sqrt(F.col("token_share")).alias("temp_weight"),
        (F.sqrt(F.col("token_share")) / F.col("token_share")).alias(
            "upsample_factor"
        ),
    )


_Q118_SQL = """
WITH per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
shared AS (
  SELECT *,
         CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE)
           AS token_share
  FROM per_src
)
SELECT *,
       sqrt(token_share) AS temp_weight,
       sqrt(token_share) / token_share AS upsample_factor
FROM shared
"""


# --- q119: deterministic content-hash train/val/test split ---------------
# Reproducible corpus splitting: bucket = first hex nibble of md5(text)
# (16 buckets), train = 0-12, val = 13-14, test = 15. Content-addressed
# (not doc_id-addressed) so exact duplicates always land in the same
# split — the property that prevents train/test leakage through dup
# pairs. Pure projection: scan-speed at any scale, trivially resumable,
# and identical on every engine (vs. rand(), which is none of these).

def q119_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.sampling import content_hash_split

    docs = tbl(spark, sf_dir, "documents")
    bucket = "instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1"
    return content_hash_split(docs).select(
        "doc_id",
        F.expr(f"CAST({bucket} AS INT)").alias("bucket"),
        "split",
    )


_Q119_SQL = """
SELECT doc_id,
       CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS INT)
         AS bucket,
       CASE WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 13
            THEN 'train'
            WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 15
            THEN 'val' ELSE 'test' END AS split
FROM documents
"""


# --- q120: rare-word score (global document-frequency join) --------------
# Two-pass unigram statistic: (1) distinct (doc, word) postings → global
# document frequency per word; (2) join DF back to postings and average
# per doc. Low mean/min DF flags jargon-heavy or garbled docs — the
# no-model stand-in for perplexity filters. All counts exact integers;
# the single division happens per output row.
# Plan: postings shuffle once on word for the DF agg; the DF table is
# |vocabulary| rows → broadcast back to the postings side (no second
# big shuffle); final agg shuffles on doc_id over postings. At 100 TB
# the vocabulary stays small (Heaps' law) so the broadcast holds.

def q120_rare_word_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id", F.explode(F.expr(f"array_distinct({_T})")).alias("word")
    )
    df_tbl = postings.groupBy("word").agg(F.count("*").alias("df"))
    return (
        postings.join(F.broadcast(df_tbl), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct_words"),
            (
                F.sum("df").cast("double") / F.count("*").cast("double")
            ).alias("mean_word_df"),
            F.min("df").alias("min_word_df"),
        )
    )


_Q120_SQL = """
WITH postings AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
),
dfreq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY word
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       CAST(SUM(df) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_word_df,
       MIN(df) AS min_word_df
FROM postings JOIN dfreq USING (word)
GROUP BY doc_id
"""


# --- q140: vocabulary build + OOV coverage -------------------------------
# The tokenizer-prep statistic: build the top-K global vocabulary by
# frequency (total order: count DESC, token ASC — deterministic at any
# parallelism) and measure per-language OOV occurrence rate against it.
# High OOV for a language = the vocab under-serves it (the practical
# signal behind vocab-size / language-mix decisions).
# Plan: one shuffle for token counts; the vocab is top-K of that (tiny,
# TakeOrdered) and broadcasts back to the token stream — the coverage
# pass is map-side + one final agg on lang. Heaps' law keeps the count
# table ≪ corpus at 100 TB; K is fixed.

_VOCAB_K = 1000


def q140_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(F.expr(_T)).alias("t"))
    counts = toks.groupBy("t").agg(F.count("*").alias("c"))
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(_VOCAB_K)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            (F.count("*") - F.count("in_vocab")).cast("bigint").alias("n_oov"),
            (
                (F.count("*") - F.count("in_vocab")).cast("double")
                / F.count("*").cast("double")
            ).alias("oov_rate"),
        )
    )


_Q140_SQL = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
),
counts AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
vocab AS (SELECT t FROM counts ORDER BY c DESC, t ASC LIMIT {_VOCAB_K})
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM tok LEFT JOIN vocab v USING (t)
GROUP BY lang
"""


# --- q141: deterministic stratified sampling -----------------------------
# Reproducible per-stratum downsampling without RNG state: keep a doc iff
# its content rolling-hash bucket falls under the stratum's rate (en is
# over-represented in the fixture mix → sampled at 10%, others at 20%).
# Content-keyed (not doc_id-keyed) so re-ingested/re-keyed corpora sample
# identically — and the same doc text always lands in the same side of
# the cut, the property training reproducibility needs.
# Plan: the decision is a pure map-side expression (zero shuffle); only
# the audit aggregate shuffles on lang. At 100 TB this is the sampling
# pattern that never materializes an intermediate.

def q141_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import rolling_hash_expr

    docs = tbl(spark, sf_dir, "documents")
    tagged = docs.select(
        "lang",
        "doc_id",
        (rolling_hash_expr("text") % 100).alias("bucket"),
        F.when(F.col("lang") == "en", F.lit(10))
        .otherwise(F.lit(20))
        .alias("rate"),
    )
    kept = F.col("bucket") < F.col("rate")
    return tagged.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("doc_id"))).cast("bigint").alias("kept_id_sum"),
    )


_Q141_SQL = """
WITH tagged AS (
  SELECT lang, doc_id,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(text) + 1),
                               i -> ascii(text[i]))),
              (acc, c) -> (acc * 31 + c) % 1000000007) AS BIGINT) % 100
           AS bucket,
         CASE WHEN lang = 'en' THEN 10 ELSE 20 END AS rate
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN bucket < rate THEN doc_id END) AS BIGINT)
         AS kept_id_sum
FROM tagged
GROUP BY lang
"""


# --- q149: the curation funnel, end to end --------------------------------
# What a user actually runs before tokenization, as ONE oracled query:
#   1. exact dedup   — collapse byte-identical texts to the lowest id
#                      (the 10x-scale lesson in SCALING.md: collapse
#                      copies BEFORE any pairwise stage);
#   2. span dedup    — drop the higher id of every pair sharing >= 3
#                      verbatim 6-token runs (dedup/spans.py);
#   3. quality gate  — the q117 Gopher rules;
#   4. split         — deterministic content-hash train/val/test.
# Output is the final per-doc roster (id, lang, split, n_words): the
# hash compare pins every stage's membership decision at once, and any
# stage-ordering or off-by-one drift between engines breaks it.
# Plan: stages 1/3/4 are scan-speed (one window, two projections);
# stage 2 reuses the capped postings shape — the funnel's total shuffle
# budget is the span stage's plus one window, nothing else.

def q149_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup import shared_span_pairs
    from ..transform.dedup import dedup_keep_first
    from ..transform.sampling import content_hash_split

    docs = tbl(spark, sf_dir, "documents")
    canon = dedup_keep_first(
        docs.select("doc_id", "text", "lang"),
        keys=["text"],
        order_by=["doc_id"],
    )
    removed = (
        shared_span_pairs(canon, n=6, max_doc_freq=50, min_shared=3)
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    kept = canon.join(removed, "doc_id", "left_anti")
    gated = kept.select(
        "doc_id",
        "lang",
        "text",
        F.expr(f"CAST(size({_T}) AS INT)").alias("n_words"),
        F.expr(
            f"CAST((length(text) - size({_T}) + 1) / size({_T}) AS DOUBLE)"
        ).alias("mwl"),
        F.expr(
            f"CAST(size(filter({_T}, t -> t IN ('the','a','of','and','to')))"
            " AS INT)"
        ).alias("stop_hits"),
        F.expr(
            f"CAST(size(array_distinct({_T})) AS DOUBLE)"
            f" / CAST(size({_T}) AS DOUBLE)"
        ).alias("dr"),
    ).filter(
        F.col("n_words").between(30, 10000)
        & F.col("mwl").between(3.0, 10.0)
        & (F.col("stop_hits") >= 1)
        & (F.col("dr") >= 0.3)
    )
    return content_hash_split(gated).select(
        "doc_id", "lang", "split", "n_words"
    )


_Q149_SQL = """
WITH canon AS (
  SELECT doc_id, text, lang FROM (
    SELECT doc_id, text, lang,
           ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM canon),
spans AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+5], ' ') AS span
  FROM toks, (SELECT unnest(range(1, 100000)) AS i) ix
  WHERE i + 5 <= len(t)
),
capped AS (
  SELECT span FROM spans GROUP BY span HAVING COUNT(*) <= 50
),
cspans AS (SELECT s.doc_id, s.span FROM spans s JOIN capped c USING (span)),
removed AS (
  SELECT DISTINCT b FROM (
    SELECT s2.doc_id AS b
    FROM cspans s1 JOIN cspans s2
      ON s1.span = s2.span AND s1.doc_id < s2.doc_id
    GROUP BY s1.doc_id, s2.doc_id HAVING COUNT(*) >= 3
  )
),
kept AS (
  SELECT * FROM canon WHERE doc_id NOT IN (SELECT b FROM removed)
),
gated AS (
  SELECT doc_id, lang, text,
         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         CAST((length(text) - len(string_split(text, ' ')) + 1)
              / len(string_split(text, ' ')) AS DOUBLE) AS mwl,
         CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','and','to'))) AS INT)
           AS stop_hits,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS dr
  FROM kept
)
SELECT doc_id, lang,
       CASE WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 13
            THEN 'train'
            WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 15
            THEN 'val' ELSE 'test' END AS split,
       n_words
FROM gated
WHERE n_words BETWEEN 30 AND 10000
  AND mwl BETWEEN 3.0 AND 10.0
  AND stop_hits >= 1
  AND dr >= 0.3
"""


# --- q154: declarative data-quality suite (Deequ-style, one scan) --------
# transform/quality.py compiles the rule list to ONE aggregate pass —
# completeness, uniqueness, bounds-compliance, pattern and membership
# fractions all ride a single scan, then stack() to a row per rule.
# The oracle recomputes each metric relationally, so the compiled
# aggregate must be value-faithful rule by rule.

_Q154_RULES = [
    {"type": "completeness", "column": "o_orderstatus", "min": 1.0},
    {"type": "uniqueness", "column": "o_orderkey", "min": 1.0},
    {"type": "bounds", "column": "o_totalprice", "lo": 0, "hi": 300000},
    {"type": "pattern", "column": "o_orderpriority", "regex": "^[1-5]-",
     "min": 1.0},
    {"type": "member", "column": "o_orderstatus", "allowed": ["F", "O", "P"],
     "min": 1.0},
]


def q154_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.quality import check_rules

    return check_rules(tbl(spark, sf_dir, "orders"), _Q154_RULES)


_Q154_SQL = """
SELECT 'completeness(o_orderstatus)' AS rule, 'o_orderstatus' AS "column",
       CAST(COUNT(o_orderstatus) AS DOUBLE) / COUNT(*) AS metric,
       CAST(COUNT(o_orderstatus) AS DOUBLE) / COUNT(*) >= 1.0 AS passed
FROM orders
UNION ALL
SELECT 'uniqueness(o_orderkey)', 'o_orderkey',
       CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(o_orderkey),
       CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(o_orderkey) >= 1.0
FROM orders
UNION ALL
SELECT 'bounds(o_totalprice)', 'o_totalprice',
       CAST(SUM(CASE WHEN o_totalprice BETWEEN 0 AND 300000
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(o_totalprice),
       CAST(SUM(CASE WHEN o_totalprice BETWEEN 0 AND 300000
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(o_totalprice)
         >= 1.0
FROM orders
UNION ALL
SELECT 'pattern(o_orderpriority)', 'o_orderpriority',
       CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(o_orderpriority),
       CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(o_orderpriority) >= 1.0
FROM orders
UNION ALL
SELECT 'member(o_orderstatus)', 'o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(o_orderstatus),
       CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(o_orderstatus)
         >= 1.0
FROM orders
"""


# --- q155: train/test leakage audit ---------------------------------------
# The QA step after splitting: content-hash splitting (q119) makes
# EXACT-dup leakage structurally impossible (identical text → identical
# hash → same split), but NEAR-dups can still straddle a boundary — a
# model evaluated on a test doc whose 0.9-jaccard twin sat in train is
# contaminated. This audit joins the capped near-dup pairs (q31's exact
# pipeline) with the split assignment and reports, per split pair, how
# many near-dup edges cross it (diagonal rows = safe same-split dups).
# At scale this is the dedup pass's cost plus one broadcast-sized join —
# it reuses the postings machinery, adding no new shuffle class.

_Q155_THRESHOLD = 0.5


def q155_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup import ngram_jaccard_pairs
    from ..transform.sampling import content_hash_split

    docs = tbl(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, n=3, threshold=_Q155_THRESHOLD, max_doc_freq=50
    )
    splits = content_hash_split(docs).select("doc_id", "split")
    sa = splits.select(
        F.col("doc_id").alias("a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .groupBy("split_a", "split_b")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum((F.col("split_a") != F.col("split_b")).cast("long"))
            .cast("bigint")
            .alias("n_leaks"),
        )
        .orderBy("split_a", "split_b")
    )


_Q155_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM tok WHERE len(t) >= 3
),
keep AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 50),
sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN keep USING (sh)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a, b FROM (
    SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS common
    FROM sh s1 JOIN sh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
    GROUP BY 1, 2
  ) c
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE common / (sa.sz + sb.sz - common) >= 0.5
),
splits AS (
  SELECT doc_id,
         CASE WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 13
              THEN 'train'
              WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 15
              THEN 'val' ELSE 'test' END AS split
  FROM documents
)
SELECT za.split AS split_a, zb.split AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN za.split <> zb.split THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaks
FROM pairs
JOIN splits za ON za.doc_id = a
JOIN splits zb ON zb.doc_id = b
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- q168: DSIR-style importance weights for data selection --------------
# Data Selection via Importance Resampling (Xie et al., 2023, public):
# weight each raw document by how target-like its token distribution is
# — here the target corpus is the English partition, the raw corpus is
# everything, and the feature space is add-one-smoothed unigrams (the
# paper's hashed n-grams reduce to this at n=1). The per-token
# importance ratio is
#     r(w) = p_target(w) / p_raw(w)
#          = ((ct_t + 1) * (N_raw + V)) / ((ct_r + 1) * (N_tgt + V))
# and the document weight is the mean ratio over its token occurrences.
# Docs with weight > 1 look more target-like than average → the
# selection set. All counts are exact integers; each ratio is one
# double division (deterministic), DECIMAL-accumulated per doc.
# Plan: one postings shuffle on word builds both frequency tables in a
# single pass (conditional agg); the word-stat relation is
# vocabulary-sized → broadcast back onto the postings (Heaps' law keeps
# the vocabulary broadcastable at 100 TB, same argument as q120); the
# three corpus scalars are a ONE-ROW aggregate broadcast back onto the
# stats relation (the q99/q190 idiom — a 1×N broadcast BNLJ, registry-
# allowlisted). An unpartitioned window over the stats relation would
# compute the same scalars but funnel the entire vocabulary — Heaps-law
# tail plus junk tokens at web scale — through ONE task; the 1-row
# aggregate keeps the scalar reduction partial+final and the stats scan
# fully parallel. This is importance WEIGHTING; resampling = feed the
# weight column to q165's deterministic weighted sampler.

def q168_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.expr(_T)).alias("word")
    )
    counts = toks.groupBy("word").agg(
        F.count("*").alias("ct_r"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct_t"),
    )
    scalars = counts.agg(
        F.sum("ct_r").alias("n_raw"),
        F.sum("ct_t").alias("n_tgt"),
        F.count("*").alias("v"),
    )
    # the scalar branch recomputes counts' aggregate, but its shuffle is
    # a ReusedExchange of the counts branch's — one tokens exchange total
    stats = counts.crossJoin(F.broadcast(scalars))
    ratio = (
        "(CAST(ct_t + 1 AS DOUBLE) * CAST(n_raw + v AS DOUBLE))"
        " / (CAST(ct_r + 1 AS DOUBLE) * CAST(n_tgt + v AS DOUBLE))"
    )
    return (
        toks.join(F.broadcast(stats), "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.expr(
                f"CAST(SUM(CAST(({ratio}) AS DECIMAL(28,6))) AS DOUBLE)"
                f" / COUNT(*)"
            ).alias("weight"),
        )
        .withColumn("selected", F.col("weight") > 1.0)
    )


_Q168_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS word
  FROM documents
),
stats AS (
  SELECT word, COUNT(*) AS ct_r,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct_t
  FROM toks GROUP BY word
),
scalars AS (
  SELECT SUM(ct_r) AS n_raw, SUM(ct_t) AS n_tgt, COUNT(*) AS v FROM stats
),
ratios AS (
  SELECT t.doc_id, t.lang,
         (CAST(ct_t + 1 AS DOUBLE) * CAST(n_raw + v AS DOUBLE))
           / (CAST(ct_r + 1 AS DOUBLE) * CAST(n_tgt + v AS DOUBLE)) AS r
  FROM toks t JOIN stats USING (word) CROSS JOIN scalars
)
SELECT doc_id, lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS weight,
       CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) > 1.0
         AS selected
FROM ratios
GROUP BY doc_id, lang
"""


# --- q173: one-pass table profiling ---------------------------------------
# The "what is in this feed" summary (dbt/Deequ profile): per-column
# null count, exact distinct count, and typed extremes — numerics as
# DOUBLE, strings as text, timestamps as epoch micros (never
# engine-formatted strings, whose float/timestamp printers drift).
# ONE aggregate over one scan computes every column's metrics
# (transform/profile.py), then an |columns|-row unpivot.
# Plan: single partial+final agg; the multi-COUNT(DISTINCT) expands the
# input (Spark's Expand) — at 100 TB flip exact_distinct=False for the
# HLL-sketch form, same shape.

def q173_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.profile import profile_table

    orders = tbl(spark, sf_dir, "orders")
    return profile_table(
        orders,
        ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    ).orderBy("column")


def _q173_col_sql(col: str, kind: str) -> str:
    if kind == "num":
        lo, hi = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
        ts, te = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    elif kind == "text":
        lo, hi = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        ts, te = f"MIN({col})", f"MAX({col})"
    else:  # timestamp
        lo = f"CAST(MIN(epoch_us({col})) AS DOUBLE)"
        hi = f"CAST(MAX(epoch_us({col})) AS DOUBLE)"
        ts, te = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    return f"""
  SELECT '{col}' AS "column",
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
         CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
         {lo} AS min_numeric, {hi} AS max_numeric,
         {ts} AS min_text, {te} AS max_text
  FROM orders"""


_Q173_SQL = (
    _q173_col_sql("o_orderkey", "num")
    + "\nUNION ALL\n"
    + _q173_col_sql("o_orderstatus", "text")
    + "\nUNION ALL\n"
    + _q173_col_sql("o_totalprice", "num")
    + "\nUNION ALL\n"
    + _q173_col_sql("o_orderdate", "ts")
    + '\nORDER BY "column"'
)


QUERIES = {
    "q117_gopher_rules": q117_gopher_rules,
    "q149_curation_funnel": q149_curation_funnel,
    "q154_data_quality": q154_data_quality,
    "q155_leakage_audit": q155_leakage_audit,
    "q118_mix_weights": q118_mix_weights,
    "q119_hash_split": q119_hash_split,
    "q120_rare_word_score": q120_rare_word_score,
    "q140_vocab_coverage": q140_vocab_coverage,
    "q141_stratified_sample": q141_stratified_sample,
    "q168_dsir_weights": q168_dsir_weights,
    "q173_profile_orders": q173_profile_orders,
}

ORACLE = {
    "q117_gopher_rules": _Q117_SQL,
    "q149_curation_funnel": _Q149_SQL,
    "q154_data_quality": _Q154_SQL,
    "q155_leakage_audit": _Q155_SQL,
    "q118_mix_weights": _Q118_SQL,
    "q119_hash_split": _Q119_SQL,
    "q120_rare_word_score": _Q120_SQL,
    "q140_vocab_coverage": _Q140_SQL,
    "q141_stratified_sample": _Q141_SQL,
    "q168_dsir_weights": _Q168_SQL,
    "q173_profile_orders": _Q173_SQL,
}


# --- q228: leakage REPAIR — move near-dup components into one split -------
# q155 finds cross-split near-dup pairs; this is the fix: close the
# near-dup pairs into components (q60's label-propagation kernel) and
# reassign EVERY member to the split of its component's minimum doc id —
# a deterministic canonical that needs no coordination. After the
# repair, no near-dup pair can straddle a split by construction (both
# endpoints share a component, hence a split) — tests pin the post-
# repair leak count at 0. Output = one row per near-dup-cluster member
# (singletons keep their split and are not emitted — the repair touches
# only what the audit implicates). Shape: the q155 pair join + the q60
# component rounds + two split-map joins; the canonical-split relation
# is component-count-sized (no hint — AQE sizes it; a 100 TB corpus can
# carry millions of clusters).

def q228_split_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup import ngram_jaccard_pairs
    from ..operators.components import connected_components
    from ..transform.sampling import content_hash_split

    docs = tbl(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, n=3, threshold=_Q155_THRESHOLD, max_doc_freq=50
    ).select("a", "b")
    comp = connected_components(pairs)
    splits = content_hash_split(docs).select("doc_id", "split")
    canon = comp.filter(F.col("node") == F.col("component")).join(
        splits, F.col("node") == F.col("doc_id")
    ).select("component", F.col("split").alias("new_split"))
    return (
        comp.join(splits, comp["node"] == splits["doc_id"])
        .join(canon, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("split").alias("old_split"),
            "new_split",
            (F.col("split") != F.col("new_split")).alias("moved"),
        )
    )


_Q228_SQL = """
WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM tok WHERE len(t) >= 3
),
keep AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 50),
sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN keep USING (sh)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a, b FROM (
    SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS common
    FROM sh s1 JOIN sh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
    GROUP BY 1, 2
  ) c
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE common / (sa.sz + sb.sz - common) >= 0.5
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach AS (
  SELECT u AS node, v AS r FROM edges
  UNION
  SELECT reach.node, edges.v FROM reach JOIN edges ON reach.r = edges.u
),
comp AS (
  SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node
),
splits AS (
  SELECT doc_id,
         CASE WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 13
              THEN 'train'
              WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 15
              THEN 'val' ELSE 'test' END AS split
  FROM documents
),
canon AS (
  SELECT c.component, s.split AS new_split
  FROM comp c JOIN splits s ON s.doc_id = c.node
  WHERE c.node = c.component
)
SELECT c.node AS doc_id,
       s.split AS old_split,
       canon.new_split,
       s.split <> canon.new_split AS moved
FROM comp c
JOIN splits s ON s.doc_id = c.node
JOIN canon ON canon.component = c.component
"""

QUERIES["q228_split_repair"] = q228_split_repair
ORACLE["q228_split_repair"] = _Q228_SQL


# --- q254: sequence packing (concat-and-chunk for the trainer) -------------
# The batching step between curation and training: documents
# concatenate in doc_id order and the token stream is cut every 2048
# tokens (transform/packing.py — the standard zero-padding "concat
# then chunk"). The Spark kernel computes the global exclusive prefix
# sum WITHOUT a single-task global window (bucketed two-pass cumsum:
# per-bucket offsets through one #buckets-row window, per-row finish
# partitioned by bucket); the oracle replays the packing with a plain
# global window — identical integer arithmetic, so the per-sequence
# roll-up (docs per sequence + boundary straddlers, the
# attention-mask breakpoints) pins bit-for-bit.

_Q254_CAP = 2048


def q254_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.packing import pack_sequences, packed_sequence_stats

    docs = tbl(spark, sf_dir, "documents")
    spans = pack_sequences(docs, capacity=_Q254_CAP)
    return packed_sequence_stats(spans).select(
        F.col("seq").cast("bigint").alias("seq"),
        "n_docs",
        "n_boundary_docs",
    )


_Q254_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
off AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS start_off
  FROM d
),
spans AS (
  SELECT doc_id, n_tokens,
         CAST(start_off // {_Q254_CAP} AS BIGINT) AS start_seq,
         CAST(GREATEST(start_off, start_off + n_tokens - 1)
              // {_Q254_CAP} AS BIGINT) AS end_seq
  FROM off
)
SELECT seq,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN end_seq > start_seq THEN 1 ELSE 0 END)
            AS BIGINT) AS n_boundary_docs
FROM (
  SELECT unnest(range(start_seq, end_seq + 1)) AS seq,
         start_seq, end_seq
  FROM spans
)
GROUP BY seq
"""

QUERIES["q254_sequence_packing"] = q254_sequence_packing
ORACLE["q254_sequence_packing"] = _Q254_SQL


# --- q257: robust anomaly flags (median / MAD modified z-score) ------------
# The outlier filter a curation/metrics pipeline gates on: per
# event-type, flag values whose Iglewicz–Hoaglin modified z-score
# |0.6745 · (x − median) / MAD| exceeds 3.5 — median and MAD have a 50%
# breakdown point, so the heavy tail being flagged cannot drag the
# threshold the way mean/stddev lets it (transform/quality.py
# robust_outliers). Both medians are EXACT (window-rank middle
# selection, lower+upper middle averaged with one deterministic double
# division — approx_percentile sketches are not engine-portable and
# their error is the wrong trade for a filter threshold), and every
# later step is deterministic IEEE arithmetic, so the oracle replays
# the flag set bit-for-bit — no rounding anywhere.

def q257_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.quality import robust_outliers

    ev = tbl(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return robust_outliers(
        ev, "event_type", "value", "event_id", z_threshold=3.5
    ).orderBy("event_id")


_Q257_SQL = """
WITH d AS (SELECT event_id, event_type, value FROM events),
r AS (
  SELECT d.*,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
med AS (
  SELECT event_type, SUM(value) / COUNT(*) AS med
  FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY 1
),
r2 AS (
  SELECT d.event_type, abs(d.value - m.med) AS av,
         ROW_NUMBER() OVER (PARTITION BY d.event_type
                            ORDER BY abs(d.value - m.med)) AS rn,
         COUNT(*) OVER (PARTITION BY d.event_type) AS n
  FROM d JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, SUM(av) / COUNT(*) AS mad
  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY 1
)
SELECT d.event_id, d.event_type, d.value, m.med, md.mad,
       0.6745e0 * (d.value - m.med) / md.mad AS z
FROM d
JOIN med m USING (event_type)
JOIN mad md USING (event_type)
WHERE md.mad > 0
  AND abs(0.6745e0 * (d.value - m.med) / md.mad) > 3.5e0
ORDER BY d.event_id
"""

QUERIES["q257_robust_anomalies"] = q257_robust_anomalies
ORACLE["q257_robust_anomalies"] = _Q257_SQL


# --- q260: packed-sequence slice relation (the trainer hand-off) -----------
# q254 assigns docs to packed-sequence SPANS; the trainer also needs
# exactly WHERE inside each sequence every document's tokens sit — the
# (seq, doc, start_in_seq, n_tokens_in_seq) relation whose slice
# boundaries are the attention-mask breakpoints
# (transform/packing.py packed_sequence_slices). Pure integer interval
# arithmetic over the same bucketed cumsum, so the DuckDB oracle
# (q254's CTE extended one level) replays it bit-for-bit; invariants
# the relation carries: per-seq slices sum to capacity except the
# final partial sequence, per-doc slices sum to n_tokens.

def q260_sequence_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.packing import pack_sequences, packed_sequence_slices

    docs = tbl(spark, sf_dir, "documents")
    spans = pack_sequences(docs, capacity=_Q254_CAP)
    return packed_sequence_slices(spans, _Q254_CAP).select(
        "seq",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "start_in_seq",
        "n_tokens_in_seq",
    )


_Q260_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
off AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS start_off
  FROM d
),
spans AS (
  SELECT doc_id, n_tokens, start_off,
         CAST(start_off // {_Q254_CAP} AS BIGINT) AS start_seq,
         CAST(GREATEST(start_off, start_off + n_tokens - 1)
              // {_Q254_CAP} AS BIGINT) AS end_seq
  FROM off
),
ex AS (
  SELECT doc_id, n_tokens, start_off,
         unnest(range(start_seq, end_seq + 1)) AS seq
  FROM spans
)
SELECT CAST(seq AS BIGINT) AS seq,
       doc_id,
       CAST(GREATEST(start_off, seq * {_Q254_CAP})
            - seq * {_Q254_CAP} AS BIGINT) AS start_in_seq,
       CAST(LEAST(start_off + n_tokens, (seq + 1) * {_Q254_CAP})
            - GREATEST(start_off, seq * {_Q254_CAP})
            AS BIGINT) AS n_tokens_in_seq
FROM ex
"""

QUERIES["q260_sequence_slices"] = q260_sequence_slices
ORACLE["q260_sequence_slices"] = _Q260_SQL


# --- q262: training-mixture composition (budgeted domain mixing) -----------
# The data-mixing step between curation and packing: allocate a token
# budget across languages under a max-share cap (two-round capped
# proportional split — exact integer arithmetic, driver-side over the
# control-plane domain relation, SQL-replayable), then select documents
# per domain in doc_id order while the inclusive token prefix sum fits
# (transform/mixing.py). Distinct from q61 (rate-based stratified
# sampling): mixture configs specify BUDGETS, and the cap is what stops
# one dominant domain from eating the run. Invariants the oracle pins:
# tokens_taken <= allocation <= min(avail, cap), per-domain windows
# only (no global window).

_Q262_BUDGET = 10_000
_Q262_SHARE = 0.35  # cap = 3500 tokens per language


def q262_domain_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.mixing import domain_mix_summary

    docs = tbl(spark, sf_dir, "documents")
    return domain_mix_summary(
        docs, budget=_Q262_BUDGET, max_share=_Q262_SHARE
    ).orderBy("lang")


_Q262_CAP = int(_Q262_SHARE * _Q262_BUDGET)

_Q262_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
avail AS (
  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS avail_tokens
  FROM d GROUP BY 1
),
t AS (SELECT SUM(avail_tokens) AS total FROM avail),
a1 AS (
  SELECT lang, avail_tokens,
         LEAST(CAST({_Q262_BUDGET} * avail_tokens
                    // (SELECT total FROM t) AS BIGINT),
               {_Q262_CAP}, avail_tokens) AS alloc1
  FROM avail
),
l AS (SELECT {_Q262_BUDGET} - SUM(alloc1) AS leftv FROM a1),
h AS (
  SELECT lang, avail_tokens, alloc1,
         LEAST(avail_tokens, {_Q262_CAP}) - alloc1 AS head
  FROM a1
),
ht AS (SELECT SUM(head) AS htot FROM h),
alloc AS (
  SELECT lang, avail_tokens,
         CAST(alloc1 + CASE
           WHEN (SELECT leftv FROM l) > 0 AND (SELECT htot FROM ht) > 0
           THEN LEAST(head, (SELECT leftv FROM l) * head
                            // (SELECT htot FROM ht))
           ELSE 0 END AS BIGINT) AS allocation
  FROM h
),
sel AS (
  SELECT d.lang, d.n_tokens, a.allocation,
         SUM(d.n_tokens) OVER (
           PARTITION BY d.lang ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d JOIN alloc a USING (lang)
),
taken AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_taken
  FROM sel WHERE cum <= allocation GROUP BY 1
)
SELECT a.lang, a.avail_tokens, a.allocation,
       CAST(COALESCE(tk.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(tk.tokens_taken, 0) AS BIGINT) AS tokens_taken
FROM alloc a LEFT JOIN taken tk USING (lang)
ORDER BY a.lang
"""

QUERIES["q262_domain_mixing"] = q262_domain_mixing
ORACLE["q262_domain_mixing"] = _Q262_SQL


# --- q281: mixture → packing composition (curation to trainer, one pass) ----
# The end-to-end hand-off the round-14 VERDICT asked to pin: q262
# SELECTS documents under per-domain token budgets, q254/q260 PACK a
# document stream into fixed-capacity training sequences — this query
# composes them: select under budget, pack exactly the selection
# (doc_id order, the same bucketed-cumsum kernel), and report the
# trainer-facing per-sequence summary (docs per sequence, boundary
# docs whose tokens straddle a cut, and how many LANGUAGES each
# sequence mixes — the knob a mixture audit actually reads, since
# packing after mixing is what interleaves domains within a batch).
# Everything is integer arithmetic over the composed relations, so the
# oracle replays q262's allocation CTEs feeding q254/q260's packing
# CTEs bit-for-bit.

def q281_mixture_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.mixing import domain_mix_select
    from ..transform.packing import (
        pack_sequences,
        packed_sequence_slices,
    )

    docs = tbl(spark, sf_dir, "documents")
    # narrow BEFORE the checkpoint: packing and the per-sequence report
    # consume only (doc_id, lang, n_tokens) — checkpointing the text
    # payload would materialize it for nothing, and the projection lets
    # the select's doc join-back prune the text column from its scan
    sel = domain_mix_select(
        docs, budget=_Q262_BUDGET, max_share=_Q262_SHARE
    ).select("doc_id", "lang", "n_tokens").localCheckpoint()
    spans = pack_sequences(
        sel, capacity=_Q254_CAP, tokens_col="n_tokens"
    )
    slices = packed_sequence_slices(spans, _Q254_CAP)
    return (
        slices.join(
            F.broadcast(sel.select("doc_id", "lang", "n_tokens")),
            "doc_id",
        )
        .groupBy("seq")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("n_tokens_in_seq") < F.col("n_tokens"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_boundary_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum("n_tokens_in_seq").cast("bigint").alias("seq_tokens"),
        )
        .orderBy("seq")
    )


_Q281_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
avail AS (
  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS avail_tokens
  FROM d GROUP BY 1
),
t AS (SELECT SUM(avail_tokens) AS total FROM avail),
a1 AS (
  SELECT lang, avail_tokens,
         LEAST(CAST({_Q262_BUDGET} * avail_tokens
                    // (SELECT total FROM t) AS BIGINT),
               {_Q262_CAP}, avail_tokens) AS alloc1
  FROM avail
),
l AS (SELECT {_Q262_BUDGET} - SUM(alloc1) AS leftv FROM a1),
h AS (
  SELECT lang, avail_tokens, alloc1,
         LEAST(avail_tokens, {_Q262_CAP}) - alloc1 AS head
  FROM a1
),
ht AS (SELECT SUM(head) AS htot FROM h),
alloc AS (
  SELECT lang,
         CAST(alloc1 + CASE
           WHEN (SELECT leftv FROM l) > 0 AND (SELECT htot FROM ht) > 0
           THEN LEAST(head, (SELECT leftv FROM l) * head
                            // (SELECT htot FROM ht))
           ELSE 0 END AS BIGINT) AS allocation
  FROM h
),
cum AS (
  SELECT d.doc_id, d.lang, d.n_tokens, a.allocation,
         SUM(d.n_tokens) OVER (
           PARTITION BY d.lang ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM d JOIN alloc a USING (lang)
),
sel AS (
  SELECT doc_id, lang, n_tokens FROM cum WHERE c <= allocation
),
off AS (
  SELECT doc_id, lang, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS start_off
  FROM sel
),
spans AS (
  SELECT doc_id, lang, n_tokens, start_off,
         CAST(start_off // {_Q254_CAP} AS BIGINT) AS start_seq,
         CAST(GREATEST(start_off, start_off + n_tokens - 1)
              // {_Q254_CAP} AS BIGINT) AS end_seq
  FROM off
),
ex AS (
  SELECT doc_id, lang, n_tokens, start_off,
         unnest(range(start_seq, end_seq + 1)) AS seq
  FROM spans
),
slices AS (
  SELECT CAST(seq AS BIGINT) AS seq, doc_id, lang, n_tokens,
         CAST(LEAST(start_off + n_tokens, (seq + 1) * {_Q254_CAP})
              - GREATEST(start_off, seq * {_Q254_CAP})
              AS BIGINT) AS n_tokens_in_seq
  FROM ex
)
SELECT seq,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_tokens_in_seq < n_tokens THEN 1 ELSE 0 END)
            AS BIGINT) AS n_boundary_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_tokens_in_seq) AS BIGINT) AS seq_tokens
FROM slices
GROUP BY seq
ORDER BY seq
"""

QUERIES["q281_mixture_packing"] = q281_mixture_packing
ORACLE["q281_mixture_packing"] = _Q281_SQL
