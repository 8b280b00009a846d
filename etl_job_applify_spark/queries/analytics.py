"""Analytics query inventory: dedup, similarity search, quantiles,
approximate aggregates, multimodal plumbing (SURVEY §2b north-star rows).

DuckDB-oracle notes: the vector math oracles mirror Spark's left-fold
``aggregate`` with ``list_reduce`` over a 0-prepended list so the FP
addition sequence is identical; window ranks are CAST to INT because
DuckDB's ROW_NUMBER is BIGINT while Spark's is INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import tbl
from ..dedup import (
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    semantic_dedup_kept,
    shared_span_pairs,
    simhash_near_pairs,
)
from ..multimodal import attach_fake_media, media_char_features
from ..similarity import ann_topk_ivf, ann_topk_lsh, cosine_topk
from ..transform.dedup import dedup_keep_first


# --- q30: deterministic exact dedup --------------------------------------

def q30_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return dedup_keep_first(
        docs.select("doc_id", "lang", "source"),
        keys=["lang", "source"],
        order_by=["doc_id"],
    )


_Q30_SQL = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


# --- q31: exact n-gram Jaccard near-dup pairs ----------------------------
# Relational shingle inverted index — identical SQL shape runs in DuckDB,
# making fuzzy dedup oracle-checkable (rare: most engines hide this behind
# hashes). The corpus plants ~25 pairs with jaccard ≥ 0.85.
#
# The flagship path runs CAPPED (max_doc_freq=50): shingles shared by more
# than 50 documents are boilerplate, carry no pair signal, and fan out
# quadratically in the self-join — the uncapped form is the scale-killer a
# 100 TB corpus would hit on its first hot shingle. The oracle mirrors the
# cap (HAVING COUNT(*) <= 50, with sizes computed AFTER the cap, exactly
# like ngram_jaccard_pairs), so the hash compare still pins semantics.

_Q31_MAX_DOC_FREQ = 50


def q31_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    # broadcast_sizes: the per-doc size relation is one (id, int) row per
    # document — dimension-sized next to the pair aggregate at every
    # fixture SF, so ship it to the scoring joins instead of shuffling
    # the pairs twice (a billion-document corpus would leave this False
    # and let AQE decide from measured sizes)
    out = ngram_jaccard_pairs(
        docs, threshold=0.5, max_doc_freq=_Q31_MAX_DOC_FREQ,
        broadcast_sizes=True,
    )
    return out.select("a", "b", "jaccard")


_Q31_SQL = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM tok WHERE len(t) >= 3
),
keep AS (
  SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= {_Q31_MAX_DOC_FREQ}
),
sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN keep USING (sh)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS common
  FROM sh s1 JOIN sh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
)
SELECT a, b, common / (sa.sz + sb.sz - common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE common / (sa.sz + sb.sz - common) >= 0.5
"""


# --- q207: prefix-filtered exact jaccard (PPJoin candidate generation) ----
# Same SEMANTICS as q31 (threshold 0.5, cap 50 — the oracle IS q31's SQL,
# so the gate pins value equality between the two formulations); different
# candidate-generation shape: rarest-first canonical prefixes are indexed
# instead of full posting lists, and candidates verify with one
# array_intersect. See dedup/jaccard.py prefix_filtered_jaccard_pairs for
# the lemma and the trade (one extra df aggregation + array-carrying
# verify join vs the posting join's df-squared fanout); two exact
# formulations checking each other is the same discipline as
# q167-vs-oracle's two triangle kernels.

def q207_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup import prefix_filtered_jaccard_pairs

    docs = tbl(spark, sf_dir, "documents")
    return prefix_filtered_jaccard_pairs(
        docs, threshold=0.5, max_doc_freq=_Q31_MAX_DOC_FREQ
    )


# --- q32: MinHash LSH near-dup pairs (rows-only: xxhash64 has no DuckDB
# twin; exact-verification output is jaccard pairs like q31 with
# LSH-bounded recall) ------------------------------------------------------

def q32_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bucket cap = 64: boilerplate-driven buckets are skipped before the
    # quadratic pair fanout (skew-safe at corpus scale; recall on genuine
    # near-dup pairs pinned by q76 with the same parameters)
    docs = tbl(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.5, verify=True,
        max_bucket_size=64,
    )


# --- q33: SimHash near-dup pairs (rows-only) ------------------------------

def q33_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, n=2, max_hamming=8)


# --- q34: brute-force cosine top-k (the exact ANN baseline) --------------

def q34_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    out = cosine_topk(corpus, queries, k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


_VEC_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(range(1, len({a}) + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _VEC_DOT.format(a=a, b=b)
    na = "sqrt(" + _VEC_DOT.format(a=a, b=a) + ")"
    nb = "sqrt(" + _VEC_DOT.format(a=b, b=b) + ")"
    return f"({dot}) / (({na}) * ({nb}))"


_Q34_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor, embedding AS cv FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT query_id, neighbor, {_cos_sql('qv', 'cv')} AS cosine FROM c, q
)
SELECT query_id, neighbor, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor) AS rank
  FROM scored
) WHERE rank <= 5
"""


# --- q35: LSH approximate top-k (rows-only: approximate by design) -------

def q35_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return ann_topk_lsh(corpus, queries, k=5)


# --- q86: IVF approximate top-k (rows-only: approximate by design) -------
# The FAISS-style scale path (similarity/ivf.py): k-means cells trained on
# a driver-side sample, corpus partitioned by cell, queries probe the
# nprobe nearest cells. nprobe=8 of 16 cells: on this corpus of RANDOM
# unit vectors (within-label cosine ≈ cross-label ≈ 0, the adversarial
# case for any ANN) that buys 2× pruning at recall 0.76-0.88 — real
# clustered embeddings are what the cells/nprobe ratio is for. Recall is
# gate-checked by q87 against brute force.

def q86_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return ann_topk_ivf(corpus, queries, k=5, num_cells=16, nprobe=8)


# --- q36: embedding-cosine near-dup pairs (exact all-pairs form) ---------
# num_planes=0 → exact; the LSH-bucketed scale path is exercised in tests.

def q36_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.45, num_planes=0).select(
        "a", "b", "cosine"
    )


_Q36_SQL = f"""
WITH v AS (SELECT vec_id, embedding FROM embeddings)
SELECT v1.vec_id AS a, v2.vec_id AS b,
       {_cos_sql('v1.embedding', 'v2.embedding')} AS cosine
FROM v v1, v v2
WHERE v1.vec_id < v2.vec_id
  AND {_cos_sql('v1.embedding', 'v2.embedding')} >= 0.45
"""


# --- q146: semantic dedup (SemDeDup-style, anchor-clustered) -------------
# Cluster by broadcast-argmax cosine to K anchor vectors, then keep the
# lowest id of every within-cluster high-cosine group (dedup/semantic.py
# for the scale rationale). Fully oracled: the anchor choice is
# deterministic (K lowest ids), the cosine fold is the shared left-fold
# idiom, so DuckDB reproduces assignment, pairing and pruning exactly.

# 16 anchors: cluster count IS the quadratic stage's budget knob (see
# dedup/semantic.py) — 16 keeps per-cluster pair blocks small at bench
# scale while the oracle stays an exact mirror (LIMIT 16)
_Q146_ANCHORS = 16
_Q146_THRESHOLD = 0.45


def q146_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    return semantic_dedup_kept(
        emb, num_anchors=_Q146_ANCHORS, threshold=_Q146_THRESHOLD
    )


_Q146_SQL = f"""
WITH base AS (SELECT vec_id, embedding FROM embeddings),
anchors AS (
  SELECT vec_id AS aid, embedding AS av FROM base ORDER BY vec_id LIMIT {_Q146_ANCHORS}
),
assign AS (
  SELECT vec_id, aid AS cluster FROM (
    SELECT b.vec_id, a.aid,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
                              ORDER BY {_cos_sql('b.embedding', 'a.av')} DESC,
                                       a.aid) AS rn
    FROM base b, anchors a
  ) WHERE rn = 1
),
removed AS (
  SELECT DISTINCT y.vec_id AS vec_id
  FROM assign ax
  JOIN assign ay ON ax.cluster = ay.cluster AND ax.vec_id < ay.vec_id
  JOIN base x ON x.vec_id = ax.vec_id
  JOIN base y ON y.vec_id = ay.vec_id
  WHERE {_cos_sql('x.embedding', 'y.embedding')} >= {_Q146_THRESHOLD}
)
SELECT s.cluster, s.vec_id
FROM assign s
WHERE s.vec_id NOT IN (SELECT vec_id FROM removed)
"""


# --- q147: exact-substring span dedup (Lee et al. style) -----------------
# Docs sharing verbatim 6-token runs via a sliding-window inverted index
# (dedup/spans.py — suffix-array semantics, distributed shape). Oracle
# mirrors the window generation with list slicing and the cap as HAVING;
# Spark groups on xxhash64(span), DuckDB on the span string — identical
# groups, 8-byte shuffle keys on the Spark side.

_Q147_N = 6
_Q147_MAX_DF = 50
_Q147_MIN_SHARED = 3


def q147_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return shared_span_pairs(
        docs,
        n=_Q147_N,
        max_doc_freq=_Q147_MAX_DF,
        min_shared=_Q147_MIN_SHARED,
    )


_Q147_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
spans AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{_Q147_N - 1}], ' ') AS span
  FROM toks, (SELECT unnest(range(1, 100000)) AS i) ix
  WHERE i + {_Q147_N - 1} <= len(t)
),
capped AS (
  SELECT span, COUNT(*) AS df FROM spans
  GROUP BY span HAVING COUNT(*) <= {_Q147_MAX_DF}
),
cspans AS (SELECT s.doc_id, s.span FROM spans s JOIN capped c USING (span)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM cspans GROUP BY doc_id),
shared AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS shared_spans
  FROM cspans s1 JOIN cspans s2
    ON s1.span = s2.span AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {_Q147_MIN_SHARED}
)
SELECT a, b, shared_spans,
       shared_spans / CAST(za.sz AS DOUBLE) AS containment_a,
       shared_spans / CAST(zb.sz AS DOUBLE) AS containment_b
FROM shared
JOIN sizes za ON za.doc_id = a
JOIN sizes zb ON zb.doc_id = b
"""


# --- q37: exact quantiles -------------------------------------------------

def q37_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


_Q37_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- q38: approximate distinct (rows-only: HLL sketches differ across
# engines by construction; at 100 TB this replaces exact distinct) --------

def q38_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


# --- q39: multimodal byte-feature extraction -----------------------------
# Real mapInPandas plumbing (binary column in, Arrow batches, typed schema
# out) with a deterministic byte-level "decode" so the whole path is
# oracle-checkable; the image/audio decode stubs live in multimodal/media.py.

def q39_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    return media_char_features(media)


_Q39_SQL = """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CASE WHEN length(text) > 0 THEN CAST(ascii(text[1]) AS INT) END AS first_cp,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(text) + 1), i -> ascii(text[i]))),
            (a, c) -> (a + c) % 65536) AS BIGINT) AS cp_checksum
FROM documents
"""


QUERIES = {
    "q30_dedup_exact": q30_dedup_exact,
    "q31_ngram_jaccard": q31_ngram_jaccard,
    "q207_prefix_jaccard": q207_prefix_jaccard,
    "q32_minhash_lsh": q32_minhash_lsh,
    "q33_simhash": q33_simhash,
    "q34_cosine_topk": q34_cosine_topk,
    "q35_ann_lsh": q35_ann_lsh,
    "q36_embedding_near_dup": q36_embedding_near_dup,
    "q37_quantiles": q37_quantiles,
    "q146_semantic_dedup": q146_semantic_dedup,
    "q147_span_dedup": q147_span_dedup,
    "q38_approx_distinct": q38_approx_distinct,
    "q39_multimodal_features": q39_multimodal_features,
}

ORACLE = {
    "q30_dedup_exact": _Q30_SQL,
    "q31_ngram_jaccard": _Q31_SQL,
    "q207_prefix_jaccard": _Q31_SQL,
    "q34_cosine_topk": _Q34_SQL,
    "q36_embedding_near_dup": _Q36_SQL,
    "q37_quantiles": _Q37_SQL,
    "q146_semantic_dedup": _Q146_SQL,
    "q147_span_dedup": _Q147_SQL,
    "q39_multimodal_features": _Q39_SQL,
}


# --- q68: approximate quantiles (rows-only: t-digest/GK sketches are
# engine-specific; at 100 TB this replaces exact percentile the same way
# HLL replaces exact distinct) --------------------------------------------

def q68_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000)
            .alias("approx_pcts"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


QUERIES["q68_approx_quantiles"] = q68_approx_quantiles
QUERIES["q86_ann_ivf"] = q86_ann_ivf


# --- q263: benchmark decontamination (cross-set n-gram audit) --------------
# The OPERATORIZED form of q83's inline contamination check: q83 was a
# query-local assembly (inline 4-gram explode, UNCONDITIONAL broadcast
# of the eval gram set); contamination_spans (dedup/spans.py) is the
# reusable dedup-family member — the q147 shingle machinery (lambda-
# bound anti-retokenization, xxhash64 window keys) pointed CROSS-SET,
# no broadcast hint (AQE sizes the eval side, which stays correct even
# when the "eval set" is itself corpus-sized, e.g. decontaminating
# against a previous training run). One equi-join of train window
# postings against the DISTINCT eval window set — no pair generation,
# no cap. Deterministic split (doc_id % 11), n=6 (q147's window
# length), so the oracle replays it exactly.

_Q263_N = 6


def q263_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.spans import contamination_spans

    docs = tbl(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 11 != 0)
    ev = docs.filter(F.col("doc_id") % 11 == 0)
    return contamination_spans(train, ev, n=_Q263_N).orderBy("doc")


_Q263_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
spans AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{_Q263_N - 1}], ' ') AS span
  FROM toks, (SELECT unnest(range(1, 100000)) AS i) ix
  WHERE i + {_Q263_N - 1} <= len(t)
),
train AS (SELECT * FROM spans WHERE doc_id % 11 <> 0),
ev AS (SELECT DISTINCT span FROM spans WHERE doc_id % 11 = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_spans FROM train GROUP BY 1),
hits AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_spans
  FROM train t JOIN ev USING (span) GROUP BY 1
)
SELECT h.doc_id AS doc, h.n_contaminated_spans,
       CAST(s.n_spans AS BIGINT) AS n_spans,
       h.n_contaminated_spans / CAST(s.n_spans AS DOUBLE)
         AS contamination
FROM hits h JOIN sizes s USING (doc_id)
ORDER BY doc
"""

QUERIES["q263_decontamination"] = q263_decontamination
ORACLE["q263_decontamination"] = _Q263_SQL


# --- q265: portable hash-sampled quantiles (the oracle-able approx) --------
# q68's approx_count/percentile sketches are engine-private (rows-only
# checkable: error bounds and layouts differ per engine). This is the
# approximate-quantile design that KEEPS the exact-oracle contract: a
# deterministic multiply-mod hash sample (the Doulion sampler's
# portable arithmetic, transform/sampling.py portable_sample_predicate)
# + EXACT interpolated percentiles over the sample — bit-replayable in
# DuckDB, mergeable across shards/epochs for free (hash sample of a
# union = union of hash samples), classical ±O(1/sqrt(p*n)) rank error.
# p=0.25 on events.value per event type, p50/p90 at the q37 rounding
# discipline.

def q265_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transform.sampling import sampled_quantiles

    ev = tbl(spark, sf_dir, "events")
    return sampled_quantiles(
        ev, ["event_type"], "value", "event_id",
        p=0.25, quantiles=[0.5, 0.9],
    ).orderBy("event_type")


_Q265_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       round(quantile_cont(value, 0.5), 4) AS q_05,
       round(quantile_cont(value, 0.9), 4) AS q_09
FROM events
WHERE (((((event_id % 2147483648) * (event_id % 2147483648))
         % 2147483648) * 1220703125)
       % 2147483648
       + ((event_id % 2147483648) * 987654323) % 2147483648) % 2147483648
      < 536870912
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["q265_sampled_quantiles"] = q265_sampled_quantiles
ORACLE["q265_sampled_quantiles"] = _Q265_SQL
