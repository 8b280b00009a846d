"""Text-analysis query inventory over ``documents`` (north-star: language
ID, quality scoring, token counting, fingerprinting).

All expressions are JVM-side built-ins (functions/text.py); the DuckDB
oracles mirror them with list functions, including the modular-arithmetic
fingerprint folds (engine-portable by construction, unlike xxhash64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation
from ..functions.rrf import rrf_fused

from ._util import tbl
from ..functions.text import (
    STOPWORDS,
    avg_token_len_expr,
    distinct_ratio_expr,
    lang_id_expr,
    min_shingle_fingerprint_expr,
    n_tokens_expr,
    quality_score_expr,
    rolling_hash_expr,
)


# --- q40: per-document quality stats -------------------------------------

def q40_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens_expr("text").alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        distinct_ratio_expr("text").alias("distinct_ratio"),
        avg_token_len_expr("text").alias("avg_token_len"),
        quality_score_expr("text").alias("quality_score"),
    )


_Q40_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars_measured,
       len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' '))
         AS distinct_ratio,
       (length(text) - len(string_split(text, ' ')) + 1)
         / len(string_split(text, ' ')) AS avg_token_len,
       least(len(string_split(text, ' ')) / 100.0, 1.0)
         * (len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')))
         AS quality_score
FROM documents
"""


# --- q41: heuristic language identification ------------------------------

def q41_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", lang_id_expr("text").alias("lang_pred")
    )


def _hits_sql(words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({in_list})))"


_LANGS = list(STOPWORDS)
_Q41_SQL = (
    "SELECT doc_id, lang, CASE "
    + " ".join(
        f"WHEN h_{l} > 0 AND h_{l} = greatest({', '.join('h_' + x for x in _LANGS)})"
        f" THEN '{l}'"
        for l in _LANGS
    )
    + " ELSE 'und' END AS lang_pred FROM (SELECT doc_id, lang, "
    + ", ".join(f"{_hits_sql(STOPWORDS[l])} AS h_{l}" for l in _LANGS)
    + " FROM documents)"
)


# --- q42: corpus token accounting per source -----------------------------

def q42_token_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    nt = n_tokens_expr("text")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(nt).alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum(nt).cast("double") / F.count("*")).alias("avg_tokens_per_doc"),
        )
        .orderBy("source")
    )


_Q42_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)
         AS avg_tokens_per_doc
FROM documents
GROUP BY source
ORDER BY source
"""


# --- q43: document fingerprints (modular rolling hashes) -----------------

def q43_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # compute-bound on a byte-small table: spread rows across cores first
    # (a single small parquet file arrives as ONE input split)
    docs = tbl(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        "doc_id",
        rolling_hash_expr("text").alias("content_hash"),
        min_shingle_fingerprint_expr("text", n=3).alias("shingle_fp"),
    )


_Q43_SQL = """
SELECT doc_id,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(text) + 1), i -> ascii(text[i]))),
            (acc, c) -> (acc * 31 + c) % 1000000007) AS BIGINT) AS content_hash,
       CAST(list_min(list_transform(
              range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
              i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, length(concat_ws(' ',
                         string_split(text, ' ')[i],
                         string_split(text, ' ')[i+1],
                         string_split(text, ' ')[i+2])) + 1),
                       p -> ascii(concat_ws(' ',
                         string_split(text, ' ')[i],
                         string_split(text, ' ')[i+1],
                         string_split(text, ' ')[i+2])[p]))),
                   (acc, c) -> (acc * 31 + c) % 1000000007)))
            AS BIGINT) AS shingle_fp
FROM documents
"""


# --- q130: URL normalization (web-corpus curation) ------------------------
# URL hygiene before URL-level dedup: lowercase scheme/host, strip
# tracking query parameters and fragments, drop trailing slashes, then
# count per registrable domain. URLs are synthesized deterministically
# from the fixtures (the corpus has no URL column); the OPERATIONS are
# the real surface: regexp_replace normalization is pure codegen — at
# 100 TB this runs scan-speed ahead of the URL-key dedup shuffle.

_URL = (
    "concat('HTTPS://', upper(source), '.Example.COM/docs/', "
    "CAST(doc_id AS STRING), "
    "CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&ref=x' "
    "     WHEN doc_id % 3 = 1 THEN '/' ELSE '' END)"
)


def q130_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    raw = F.expr(_URL)
    norm = F.expr(
        # lowercase → strip query/fragment → strip trailing slash
        f"regexp_replace(regexp_replace(lower({_URL}), "
        "'[?#].*$', ''), '/+$', '')"
    )
    return docs.select(
        "doc_id",
        raw.alias("raw_url"),
        norm.alias("url"),
        F.expr(
            f"regexp_extract(lower({_URL}), '^https?://([^/]+)', 1)"
        ).alias("host"),
    )


_Q130_SQL = f"""
SELECT doc_id,
       {_URL} AS raw_url,
       regexp_replace(regexp_replace(lower({_URL}), '[?#].*$', ''),
                      '/+$', '') AS url,
       regexp_extract(lower({_URL}), '^https?://([^/]+)', 1) AS host
FROM documents
"""


# --- q131: byte vs character length semantics -----------------------------
# The encoding-accounting pass: CJK text is ~3 bytes/char in UTF-8, so
# storage budgeting and chunk sizing must use OCTET_LENGTH while token
# rules use character length. Both are O(1) metadata lookups per row in
# both engines (no decode pass).

def q131_byte_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(F.octet_length("text")).alias("total_bytes"),
        )
        .withColumn(
            "bytes_per_char",
            F.col("total_bytes").cast("double")
            / F.col("total_chars").cast("double"),
        )
    )


_Q131_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(SUM(strlen(text)) AS DOUBLE)
         / CAST(SUM(length(text)) AS DOUBLE) AS bytes_per_char
FROM documents
GROUP BY lang
"""


# --- q190: BM25 keyword retrieval (top-5 docs per query) -----------------
# The retrieval baseline of a data/RAG pipeline: score documents for a
# fixed set of keyword queries with BM25 (k1=1.2, b=0.75) and return
# each query's top-5 by score. IDF is the RATIONAL Robertson odds
# (N - df + 0.5)/(df + 0.5) WITHOUT the log: ln() is not bit-stable
# across engines (Spark's Math.log vs DuckDB's libm disagree in the
# last ulp on ~90% of arguments — measured), while +,-,*,/ on identical
# doubles are IEEE-deterministic everywhere. CAVEAT (this is a real
# semantic deviation, not just presentation): dropping the log is
# monotone PER TERM only — the document score is a SUM of idf-weighted
# terms, so rational odds re-weights terms relative to each other
# (rare terms count more than log-idf BM25 would) and multi-term
# top-k rankings CAN differ from textbook BM25. Both engines compute
# the same deviation, so the cross-engine gate is exact; callers who
# need textbook log-idf rankings should apply ln() to the odds and
# accept engine-local (non-oracle-able) floats. The per-(query, doc)
# sum goes through the DECIMAL-accumulate idiom so term order can't
# shift bits.
# Plan: one token-explode shuffle for tf (doc, word); df aggregates from
# tf (not the raw stream); corpus stats are a one-row broadcast; the
# query term list is a literal broadcast; top-5 per query is a
# rank-filter over |queries| partitions. At 100 TB the tf relation is
# the only big exchange, df is vocabulary-sized (Heaps' law), and the
# score join is map-side after broadcasts.

_Q190_QUERIES = [
    (1, ["hash", "join"]),
    (2, ["window", "sort", "merge"]),
    (3, ["stream", "batch", "spark"]),
]


def q190_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.retrieval import bm25_scores

    docs = tbl(spark, sf_dir, "documents")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws], "qid int, word string"
    )
    scored = bm25_scores(docs, qterms)  # functions/retrieval.py kernel
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "doc_id", "rnk", "score")
    )


_Q190_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, word
),
dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
dfreq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
q(qid, word) AS (VALUES
  (1, 'hash'), (1, 'join'),
  (2, 'window'), (2, 'sort'), (2, 'merge'),
  (3, 'stream'), (3, 'batch'), (3, 'spark')
),
scored AS (
  SELECT q.qid, tf.doc_id,
    CAST(SUM(CAST(
      ((n - df + 5e-1) / (df + 5e-1))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl))
    AS DECIMAL(28,6))) AS DOUBLE) AS score
  FROM q
  JOIN tf USING (word)
  JOIN dfreq USING (word)
  JOIN dl USING (doc_id), stats
  GROUP BY q.qid, tf.doc_id
)
SELECT CAST(qid AS INT) AS qid, doc_id, CAST(rnk AS INT) AS rnk, score
FROM (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id
         ) AS rnk
  FROM scored
)
WHERE rnk <= 5
"""


# --- q191: phrase search via positional postings -------------------------
# Exact multi-word phrase matching with the positional-inverted-index
# join: tokens carry their position; a phrase of words w0..wk matches
# where per-word posting lists chain on (doc, pos - offset). The
# per-word filters push into the posting scan, so each join leg reads
# only that word's postings — the classic search-engine phrase plan,
# never a regex scan of the corpus. Occurrence counting is exact and
# overlap-aware (every start position counts). Per phrase: matched doc
# count, total occurrences, and the top document (ties broken by lowest
# doc_id). Positions are 1-based to share arithmetic with the oracle's
# generate_subscripts.

_Q191_PHRASES = [
    (1, "sort merge"),
    (2, "batch batch batch"),
    (3, "window window"),
]


def q191_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.retrieval import phrase_hits, token_positions

    docs = tbl(spark, sf_dir, "documents")
    toks = token_positions(docs)  # functions/retrieval.py kernel

    per_phrase = []
    for pid, phrase in _Q191_PHRASES:
        hits = phrase_hits(toks, phrase.split(" "))
        per_doc = hits.groupBy("doc_id").agg(F.count("*").alias("cnt"))
        per_phrase.append(
            per_doc.agg(
                F.lit(pid).alias("phrase_id"),
                F.lit(phrase).alias("phrase"),
                F.count("*").cast("bigint").alias("n_docs"),
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias(
                    "n_occurrences"
                ),
                F.expr("max_by(doc_id, struct(cnt, -doc_id))").alias(
                    "top_doc"
                ),
                F.coalesce(F.max("cnt"), F.lit(0)).cast("bigint").alias(
                    "top_doc_count"
                ),
            )
        )
    out = per_phrase[0]
    for p in per_phrase[1:]:
        out = out.unionByName(p)
    return out


_Q191_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
phrases(phrase_id, phrase) AS (VALUES
  (1, 'sort merge'), (2, 'batch batch batch'), (3, 'window window')
),
hits AS (
  SELECT 1 AS phrase_id, t0.doc_id
  FROM toks t0 JOIN toks t1
    ON t0.doc_id = t1.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.word = 'sort' AND t1.word = 'merge'
  UNION ALL
  SELECT 2, t0.doc_id
  FROM toks t0
  JOIN toks t1 ON t0.doc_id = t1.doc_id AND t1.pos = t0.pos + 1
  JOIN toks t2 ON t0.doc_id = t2.doc_id AND t2.pos = t0.pos + 2
  WHERE t0.word = 'batch' AND t1.word = 'batch' AND t2.word = 'batch'
  UNION ALL
  SELECT 3, t0.doc_id
  FROM toks t0 JOIN toks t1
    ON t0.doc_id = t1.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.word = 'window' AND t1.word = 'window'
),
per_doc AS (
  SELECT phrase_id, doc_id, COUNT(*) AS cnt
  FROM hits GROUP BY phrase_id, doc_id
),
ranked AS (
  SELECT phrase_id, doc_id, cnt,
         ROW_NUMBER() OVER (
           PARTITION BY phrase_id ORDER BY cnt DESC, doc_id
         ) AS rn
  FROM per_doc
)
SELECT p.phrase_id, p.phrase,
       CAST(COALESCE(s.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(s.n_occurrences, 0) AS BIGINT) AS n_occurrences,
       r.doc_id AS top_doc,
       CAST(COALESCE(r.cnt, 0) AS BIGINT) AS top_doc_count
FROM phrases p
LEFT JOIN (
  SELECT phrase_id, COUNT(*) AS n_docs, SUM(cnt) AS n_occurrences
  FROM per_doc GROUP BY phrase_id
) s USING (phrase_id)
LEFT JOIN (SELECT phrase_id, doc_id, cnt FROM ranked WHERE rn = 1) r
  USING (phrase_id)
"""


# --- q194/q195/q196: retrieval served from the PERSISTED inverted ------
# index (functions/text_index.py). q190/q191 recompute the corpus
# tf/positions relation per query batch — the right one-shot analytics
# shape, the wrong steady-state serving shape at 100 TB. These queries
# prove the index path relationally: build (q194: whole corpus; q196:
# 90% history then APPEND the 10% batch — the ingest lifecycle), then
# serve the same query batches through pruned per-term posting scans,
# while the DuckDB oracle recomputes from RAW TEXT with the q190/q191
# SQL. Equal hashes mean index-served == corpus-recomputed, bit-exact
# (shared scoring join, exact integer stats in the index meta).
# Temp-index pattern as q142: build, probe, materialize, drop the dir.

def _with_temp_text_index(spark, builds, probe):
    """build the index in a temp dir via builds(path), return the
    materialized result of probe(path) after cleanup."""
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="qtext_idx_")
    try:
        builds(path)
        out = probe(path)
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


def q194_bm25_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text_index import text_index_bm25, text_index_build

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )

    def probe(path):
        scored = text_index_bm25(spark, path, qterms)
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("qid", "doc_id", "rnk", "score")
        )

    return _with_temp_text_index(
        spark, lambda path: text_index_build(docs, path, layout="flat"),
        probe
    )


def q220_pruned_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q194's retrieval task served through the WAND-style bound-pruned
    kernel (functions/retrieval.bm25_topk_pruned via
    text_index_bm25_topk): rarest-term seed threshold, exact-decimal
    term-upper-bound pruning, exact scoring only for survivors. The
    oracle is q194's exhaustive-scoring SQL — pruning must be lossless
    down to the last bit, or the hash compare fails."""
    from ..functions.text_index import text_index_bm25_topk, text_index_build

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )

    def probe(path):
        return text_index_bm25_topk(spark, path, qterms, k=5).select(
            "qid", "doc_id", "rnk", "score"
        )

    return _with_temp_text_index(
        spark, lambda path: text_index_build(docs, path, layout="flat"),
        probe
    )


def q224_bm25_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion lifecycle of the persisted index: build on the FULL
    corpus, tombstone every doc_id % 10 = 3 (text_index_delete — the
    GDPR path: served results change immediately, space reclaims at
    compaction), then serve q194's top-5. While tombstones exist the
    probe derives exact corpus stats from the filtered doclens, so the
    oracle is the q190 recompute SQL over ONLY the surviving documents —
    any leak of a tombstoned doc's postings, doclen, or stats
    contribution breaks the hash. The probe runs twice, before and
    after ``optimize_text_index`` (the purge), and both must agree."""
    from ..functions.text_index import (
        optimize_text_index,
        text_index_build,
        text_index_delete,
        text_index_bm25,
    )
    from pyspark.sql import Window

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )
    doomed = docs.select(
        F.col("doc_id").alias("doc")
    ).filter(F.expr("doc % 10 = 3"))

    def probe(path):
        text_index_delete(spark, path, doomed)
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )

        def topk():
            return (
                text_index_bm25(spark, path, qterms)
                .withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= 5)
                .select("qid", "doc_id", "rnk", "score")
            )

        before = topk().collect()
        optimize_text_index(spark, path)  # purge tombstones
        after = topk()
        if sorted(map(tuple, before)) != sorted(map(tuple, after.collect())):
            raise AssertionError(
                "post-compaction probe diverged from tombstone-filtered"
                " probe"
            )
        return after

    return _with_temp_text_index(
        spark, lambda path: text_index_build(docs, path, layout="flat"),
        probe
    )


# the q190 recompute SQL over only the surviving documents — a
# tombstoned doc must vanish from tf, df, dl, AND the corpus stats
_Q224_SQL = _Q190_SQL.replace(
    "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents",
    "SELECT doc_id, unnest(string_split(text, ' ')) AS word"
    " FROM documents WHERE doc_id % 10 <> 3",
)


def q225_versioned_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q224's deletion lifecycle on the VERSIONED (object-store) layout:
    the delete is ONE CAS snapshot carrying the tombstone set and the
    negative stats increment atomically, so the counter fast path stays
    exact with no crash window. Lifecycle under the gate: found → delete
    → CAS compaction (tombstone purge + snapshot prune) → probe; the
    pre-compaction probe must equal the post-compaction probe, and both
    must equal the survivor-corpus recompute SQL."""
    from ..functions.text_index import (
        optimize_text_index,
        text_index_build,
        text_index_delete,
        text_index_bm25,
    )
    from pyspark.sql import Window

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )
    doomed = docs.select(
        F.col("doc_id").alias("doc")
    ).filter(F.expr("doc % 10 = 3"))

    def probe(path):
        text_index_delete(spark, path, doomed)
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )

        def topk():
            return (
                text_index_bm25(spark, path, qterms)
                .withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= 5)
                .select("qid", "doc_id", "rnk", "score")
            )

        before = topk().collect()
        optimize_text_index(spark, path)
        after = topk()
        if sorted(map(tuple, before)) != sorted(map(tuple, after.collect())):
            raise AssertionError(
                "versioned post-compaction probe diverged from"
                " tombstone-filtered probe"
            )
        return after

    return _with_temp_text_index(
        spark,
        lambda path: text_index_build(docs, path, layout="versioned"),
        probe,
    )


def q195_phrase_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text_index import (
        text_index_build,
        text_index_phrase_hits,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")

    def probe(path):
        per_phrase = []
        for pid, phrase in _Q191_PHRASES:
            hits = text_index_phrase_hits(spark, path, phrase.split(" "))
            per_doc = hits.groupBy("doc_id").agg(F.count("*").alias("cnt"))
            per_phrase.append(
                per_doc.agg(
                    F.lit(pid).alias("phrase_id"),
                    F.lit(phrase).alias("phrase"),
                    F.count("*").cast("bigint").alias("n_docs"),
                    F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias(
                        "n_occurrences"
                    ),
                    F.expr("max_by(doc_id, struct(cnt, -doc_id))").alias(
                        "top_doc"
                    ),
                    F.coalesce(F.max("cnt"), F.lit(0)).cast("bigint").alias(
                        "top_doc_count"
                    ),
                )
            )
        out = per_phrase[0]
        for p in per_phrase[1:]:
            out = out.unionByName(p)
        return out

    return _with_temp_text_index(
        spark, lambda path: text_index_build(docs, path, layout="flat"),
        probe
    )


def q196_bm25_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest lifecycle: index 90% of the corpus, APPEND the
    doc_id%10 batch (postings + doclens + exact stats increments), then
    serve — the oracle recomputes over ALL documents from raw text, so
    a drifted df/dl/avgdl after append would hash-mismatch."""
    from pyspark.sql import Window

    from ..functions.text_index import text_index_bm25, text_index_build

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    history = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q196_QUERIES for w in ws],
        "qid int, word string",
    )

    def build(path):
        text_index_build(history, path, layout="flat")
        text_index_build(batch, path, mode="append")

    def probe(path):
        scored = text_index_bm25(spark, path, qterms)
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("qid", "doc_id", "rnk", "score")
        )

    return _with_temp_text_index(spark, build, probe)


def q199_bm25_versioned_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q196's append lifecycle on the VERSIONED text-index layout
    (functions/text_index.py versioned section): 90% founds snapshot 1,
    the 10% batch is CAS-appended with an epoch-fence mark, the SAME
    append is re-fired (must be a fenced no-op — a double commit would
    double tf/df and shift every score), the index is compacted through
    the CAS watermark publish, then served. The oracle recomputes over
    ALL documents from raw text (q196's SQL), so any layout bug —
    lost append, double-committed replay, lossy compaction, mis-summed
    snapshot stats — hash-mismatches."""
    from pyspark.sql import Window

    from ..functions.text_index import (
        optimize_text_index,
        text_index_bm25,
        text_index_build,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    history = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q196_QUERIES for w in ws],
        "qid int, word string",
    )

    def build(path):
        text_index_build(history, path, layout="versioned")
        text_index_build(
            batch, path, mode="append", epoch_mark="_epoch_q199_1"
        )
        # replay of the committed epoch: fenced no-op
        text_index_build(
            batch, path, mode="append", epoch_mark="_epoch_q199_1"
        )
        optimize_text_index(spark, path)  # CAS compaction before serving

    def probe(path):
        scored = text_index_bm25(spark, path, qterms)
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("qid", "doc_id", "rnk", "score")
        )

    return _with_temp_text_index(spark, build, probe)


_Q196_QUERIES = [
    (1, ["scan", "filter", "column"]),
    (2, ["vector", "agg"]),
    (3, ["query", "table", "fast", "slow"]),
]

_Q196_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, word
),
dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
dfreq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
q(qid, word) AS (VALUES
  (1, 'scan'), (1, 'filter'), (1, 'column'),
  (2, 'vector'), (2, 'agg'),
  (3, 'query'), (3, 'table'), (3, 'fast'), (3, 'slow')
),
scored AS (
  SELECT q.qid, tf.doc_id,
    CAST(SUM(CAST(
      ((n - df + 5e-1) / (df + 5e-1))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl))
    AS DECIMAL(28,6))) AS DOUBLE) AS score
  FROM q
  JOIN tf USING (word)
  JOIN dfreq USING (word)
  JOIN dl USING (doc_id), stats
  GROUP BY q.qid, tf.doc_id
)
SELECT CAST(qid AS INT) AS qid, doc_id, CAST(rnk AS INT) AS rnk, score
FROM (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id
         ) AS rnk
  FROM scored
)
WHERE rnk <= 5
"""


# --- q200: hybrid retrieval via reciprocal rank fusion (RRF) -------------
# The standard way to combine lexical and vector retrieval without
# score calibration (Cormack, Clarke & Buettcher, SIGIR'09): each leg
# contributes 1/(K + rank) for the documents in its top-L, and the
# fused top-k is ranked by the sum. Ranks — not raw scores — are fused,
# so the legs' incomparable score scales never meet. Legs here: the
# q190 BM25 kernel (top-20 per keyword query) and the q34 exact-cosine
# kernel (top-20 against a per-query anchor embedding, vec_id = qid).
# K=60, the paper's constant. Bit-stability: both legs' rankings are
# already oracle-proven deterministic (q190/q34), and the fused score
# is a FIXED-ORDER sum of two e-notation double terms — no SUM() over
# rows whose order could differ between engines.
# Scale: each leg is its own proven plan; the fusion joins two
# (|queries| x 20)-row relations — driver-trivial at any corpus size.

def q200_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.retrieval import bm25_scores
    from ..similarity import cosine_topk

    K_TOP, LEG_L = 10, 20
    docs = tbl(spark, sf_dir, "documents")
    emb = tbl(spark, sf_dir, "embeddings")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )
    w_lex = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    lex = (
        bm25_scores(docs, qterms)
        .withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= LEG_L)
        .select("qid", "doc_id", "lex_rank")
    )
    anchors = emb.filter(
        F.col("vec_id").isin([qid for qid, _ in _Q190_QUERIES])
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    vec = cosine_topk(emb, anchors, k=LEG_L).select(
        F.col("query_id").cast("int").alias("qid"),
        F.col("neighbor").alias("doc_id"),
        F.col("rank").cast("int").alias("vec_rank"),
    )
    fused = rrf_fused(lex, vec)  # union+agg == full-outer (functions/rrf.py)
    w_f = Window.partitionBy("qid").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w_f))
        .filter(F.col("rrf_rank") <= K_TOP)
        .select("qid", "doc_id", "rrf_rank", "rrf_score",
                "lex_rank", "vec_rank")
    )


_Q200_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, word
),
dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
dfreq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
q(qid, word) AS (VALUES
  (1, 'hash'), (1, 'join'),
  (2, 'window'), (2, 'sort'), (2, 'merge'),
  (3, 'stream'), (3, 'batch'), (3, 'spark')
),
scored AS (
  SELECT q.qid, tf.doc_id,
    CAST(SUM(CAST(
      ((n - df + 5e-1) / (df + 5e-1))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl))
    AS DECIMAL(28,6))) AS DOUBLE) AS score
  FROM q
  JOIN tf USING (word)
  JOIN dfreq USING (word)
  JOIN dl USING (doc_id), stats
  GROUP BY q.qid, tf.doc_id
),
lex AS (
  SELECT qid, doc_id, CAST(rnk AS INT) AS lex_rank FROM (
    SELECT qid, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY score DESC, doc_id
           ) AS rnk
    FROM scored
  ) WHERE rnk <= 20
),
anchors AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings
  WHERE vec_id IN (1, 2, 3)
),
cos AS (
  SELECT a.qid, e.vec_id AS doc_id,
         (list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (x, y) -> x + y)) / ((sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))), (x, y) -> x + y))) * (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(e.embedding) + 1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (x, y) -> x + y)))) AS cosine
  FROM embeddings e, anchors a
),
vec AS (
  SELECT CAST(qid AS INT) AS qid, doc_id, CAST(rnk AS INT) AS vec_rank
  FROM (
    SELECT qid, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY cosine DESC, doc_id
           ) AS rnk
    FROM cos
  ) WHERE rnk <= 20
),
fused AS (
  SELECT COALESCE(lex.qid, vec.qid) AS qid,
         COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         lex.lex_rank, vec.vec_rank,
         coalesce(1e0 / (60 + lex.lex_rank), 0e0)
           + coalesce(1e0 / (60 + vec.vec_rank), 0e0) AS rrf_score
  FROM lex FULL OUTER JOIN vec
    ON lex.qid = vec.qid AND lex.doc_id = vec.doc_id
)
SELECT qid, doc_id, CAST(rrf_rank AS INT) AS rrf_rank, rrf_score,
       lex_rank, vec_rank
FROM (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY rrf_score DESC, doc_id
         ) AS rrf_rank
  FROM fused
)
WHERE rrf_rank <= 10
"""


# --- q230/q231: textbook log-idf BM25 ------------------------------------
# q190's rational Robertson-odds idf is the bit-exact oracle default,
# but it re-weights terms against each other (rare terms weigh more
# than textbook BM25; documented at q190). scoring="log" restores
# Robertson's ln((N - df + 0.5)/(df + 0.5)) — the Lucene/Elasticsearch-
# comparable ranking (modulo Lucene's ln(1+odds) floor). ln() is
# transcendental, so the oracle contract weakens from bit-exact to
# sig-digit: the gate's default 12-significant-digit float compare (and
# the per-term DECIMAL(28,6) quantization, which absorbs sub-1e-6 libm
# ulp drift unless a value straddles a grid boundary) — the documented
# trade for textbook rankings. Same plan as q190: one tf exchange,
# broadcast stats, rank-filter top-5.

def q230_bm25_log_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.retrieval import bm25_scores

    docs = tbl(spark, sf_dir, "documents")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )
    scored = bm25_scores(docs, qterms, scoring="log")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "doc_id", "rnk", "score")
    )


_Q230_SQL = _Q190_SQL.replace(
    "((n - df + 5e-1) / (df + 5e-1))",
    "ln((n - df + 5e-1) / (df + 5e-1))",
)


def q231_log_idf_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q230's log-idf retrieval served from the PERSISTED index through
    the WAND bound-pruned kernel — the bound dominance (per-term max ≥
    per-term actual) is sign-agnostic, so pruning stays LOSSLESS under
    log weights where idf can go negative (df > N/2 stopwords). The
    oracle is q230's exhaustive-scoring SQL: a pruning loss or an
    index/scoring drift under the log variant breaks the compare."""
    from ..functions.text_index import text_index_bm25_topk, text_index_build

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )

    def probe(path):
        return text_index_bm25_topk(
            spark, path, qterms, k=5, scoring="log"
        ).select("qid", "doc_id", "rnk", "score")

    return _with_temp_text_index(
        spark, lambda path: text_index_build(docs, path, layout="flat"),
        probe,
    )



# --- q241: text-index observability (DESCRIBE INDEX) ----------------------
# text_index_stats over a versioned index with version-scoped deletes
# (found documents, tombstone doc_id % 7 == 0): the corpus-shape
# numbers (n_docs, total_dl, n_postings, n_terms, max_df) are pure
# relational arithmetic over the surviving corpus, so the oracle
# recomputes them from raw text with the shared whitespace tokenizer —
# a counter drift, tombstone leak, or double-counted posting breaks
# the hash. Operational invariants (live counters == live rows,
# pending tombstones == deleted set, snapshot count, bucket skew >= 1)
# are asserted in-query.

def q241_text_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text_index import (
        text_index_build,
        text_index_delete,
        text_index_stats,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    doomed = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("doc")
    )
    n_doomed = doomed.count()

    def build(path):
        text_index_build(docs, f"{path}/idx")  # versioned default
        text_index_delete(spark, f"{path}/idx", doomed)

    def probe(path):
        st = text_index_stats(spark, f"{path}/idx")
        ok = (
            st["layout"] == "versioned"
            and st["live_snapshots"] == 2
            and st["n_docs"] == st["n_docs_live"]
            and st["n_pending_tombstones"] == n_doomed
            and st["bucket_skew"] >= 1.0
            and st["avgdl"] == st["total_dl"] / st["n_docs"]
        )
        if not ok:
            raise AssertionError(f"stats invariants failed: {st}")
        return local_relation(spark, 
            [(
                st["n_docs"], st["total_dl"], st["n_postings"],
                st["n_terms"], st["max_df"],
            )],
            "n_docs bigint, total_dl bigint, n_postings bigint,"
            " n_terms bigint, max_df bigint",
        )

    return _with_temp_text_index(spark, build, probe)


_Q241_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id % 7 <> 0
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word
),
dfreq AS (
  SELECT word, COUNT(*) AS df FROM tf GROUP BY word
)
SELECT
  (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM tf) AS n_docs,
  (SELECT CAST(SUM(tf) AS BIGINT) FROM tf) AS total_dl,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM tf) AS n_postings,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM dfreq) AS n_terms,
  (SELECT CAST(MAX(df) AS BIGINT) FROM dfreq) AS max_df
"""



# --- q243: FILTERED (faceted) BM25 top-k from the persisted index ---------
# The lexical twin of q238's filtered ANN: documents carry a lang
# metadata column (doc_id % 3 -> en/de/fr) stored on the index's
# doclens at founding (meta_cols), and the probe serves top-5 WHERE
# lang='en' through the WAND bound-pruned kernel. Faceted-search
# semantics: corpus statistics (n, avgdl, df) stay corpus-wide — a
# document's score is identical with or without the facet; the facet
# only decides whether it competes — and the predicate applies BEFORE
# ranking, so the full k survivors come back. Losslessness of the
# pruned kernel WITHIN the facet is asserted in-query against the
# exhaustive filtered ranking; the oracle recomputes that ranking
# relationally (corpus-wide stats + the facet on scored docs), so a
# stats leak into the facet, a meta-column loss across the append, or
# a lossy prune all break the hash.

def q243_bm25_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text_index import (
        text_index_bm25,
        text_index_bm25_topk,
        text_index_build,
    )

    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    ).alias("lang")
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text", lang)
    gen1 = docs.filter(F.col("doc_id") % 10 != 0)
    gen2 = docs.filter(F.col("doc_id") % 10 == 0)
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )

    def build(path):
        text_index_build(docs=gen1, index_path=f"{path}/idx",
                         meta_cols=["lang"])
        text_index_build(docs=gen2, index_path=f"{path}/idx",
                         mode="append")

    def probe(path):
        pruned = text_index_bm25_topk(
            spark, f"{path}/idx", qterms, k=5, where="lang = 'en'"
        ).select("qid", "doc_id", "rnk", "score")
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        exhaustive = (
            text_index_bm25(
                spark, f"{path}/idx", qterms, where="lang = 'en'"
            )
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("qid", "doc_id", "rnk", "score")
        )
        if sorted(map(tuple, pruned.collect())) != sorted(
            map(tuple, exhaustive.collect())
        ):
            raise AssertionError(
                "faceted WAND top-k diverged from the exhaustive "
                "filtered ranking — pruning went lossy under the facet"
            )
        return pruned

    return _with_temp_text_index(spark, build, probe)


_Q243_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, word
),
dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
dfreq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
q(qid, word) AS (VALUES
  (1, 'hash'), (1, 'join'),
  (2, 'window'), (2, 'sort'), (2, 'merge'),
  (3, 'stream'), (3, 'batch'), (3, 'spark')
),
scored AS (
  SELECT q.qid, tf.doc_id,
    CAST(SUM(CAST(
      ((n - df + 5e-1) / (df + 5e-1))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl))
    AS DECIMAL(28,6))) AS DOUBLE) AS score
  FROM q
  JOIN tf ON tf.word = q.word
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN dfreq ON dfreq.word = q.word
  CROSS JOIN stats
  WHERE tf.doc_id % 3 = 0  -- lang = 'en': the facet, NOT the stats
  GROUP BY q.qid, tf.doc_id
)
SELECT qid, doc_id, CAST(rnk AS INT) AS rnk, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY score DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= 5
"""


# --- q248: facet-SCOPED BM25 (sub-corpus statistics) ----------------------
# q243's facet with the OTHER standard semantics: stats_scope="facet"
# recomputes n/avgdl/df over the predicate survivors — BM25 over the
# sub-corpus as if it were the whole index (search WITHIN a language:
# rare-in-facet terms regain their discriminative idf). The oracle
# computes every statistic from the filtered sub-corpus; an
# implementation that leaks any corpus-wide statistic (the q243
# default) into the facet scope hash-mismatches, and vice versa.

def q248_bm25_facet_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text_index import text_index_bm25, text_index_build

    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    ).alias("lang")
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text", lang)
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )

    def build(path):
        text_index_build(
            docs=docs, index_path=f"{path}/idx", meta_cols=["lang"]
        )

    def probe(path):
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            text_index_bm25(
                spark, f"{path}/idx", qterms,
                where="lang = 'en'", stats_scope="facet",
            )
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("qid", "doc_id", "rnk", "score")
        )

    return _with_temp_text_index(spark, build, probe)


_Q248_SQL = """
WITH sub AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM sub
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, word
),
dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
dfreq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
q(qid, word) AS (VALUES
  (1, 'hash'), (1, 'join'),
  (2, 'window'), (2, 'sort'), (2, 'merge'),
  (3, 'stream'), (3, 'batch'), (3, 'spark')
),
scored AS (
  SELECT q.qid, tf.doc_id,
    CAST(SUM(CAST(
      ((n - df + 5e-1) / (df + 5e-1))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl))
    AS DECIMAL(28,6))) AS DOUBLE) AS score
  FROM q
  JOIN tf ON tf.word = q.word
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN dfreq ON dfreq.word = q.word
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
)
SELECT qid, doc_id, CAST(rnk AS INT) AS rnk, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY score DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= 5
"""


QUERIES = {
    "q40_text_stats": q40_text_stats,
    "q41_lang_id": q41_lang_id,
    "q42_token_agg": q42_token_agg,
    "q43_fingerprints": q43_fingerprints,
    "q130_url_normalize": q130_url_normalize,
    "q131_byte_lengths": q131_byte_lengths,
    "q190_bm25_retrieval": q190_bm25_retrieval,
    "q191_phrase_search": q191_phrase_search,
    "q194_bm25_index_probe": q194_bm25_index_probe,
    "q195_phrase_index_probe": q195_phrase_index_probe,
    "q196_bm25_index_append": q196_bm25_index_append,
    "q199_bm25_versioned_index": q199_bm25_versioned_index,
    "q200_hybrid_rrf": q200_hybrid_rrf,
    "q220_pruned_bm25_topk": q220_pruned_bm25_topk,
    "q224_bm25_index_delete": q224_bm25_index_delete,
    "q225_versioned_index_delete": q225_versioned_index_delete,
    "q230_bm25_log_idf": q230_bm25_log_idf,
    "q231_log_idf_pruned_topk": q231_log_idf_pruned_topk,
    "q241_text_index_stats": q241_text_index_stats,
    "q243_bm25_filtered_topk": q243_bm25_filtered_topk,
    "q248_bm25_facet_stats": q248_bm25_facet_stats,
}

ORACLE = {
    "q40_text_stats": _Q40_SQL,
    "q41_lang_id": _Q41_SQL,
    "q42_token_agg": _Q42_SQL,
    "q43_fingerprints": _Q43_SQL,
    "q130_url_normalize": _Q130_SQL,
    "q131_byte_lengths": _Q131_SQL,
    "q190_bm25_retrieval": _Q190_SQL,
    "q191_phrase_search": _Q191_SQL,
    # index-served results must equal raw-text recomputation: the
    # oracles ARE the recompute SQL
    "q194_bm25_index_probe": _Q190_SQL,
    "q195_phrase_index_probe": _Q191_SQL,
    "q196_bm25_index_append": _Q196_SQL,
    # versioned layout must serve the same scores: same recompute oracle
    "q199_bm25_versioned_index": _Q196_SQL,
    "q200_hybrid_rrf": _Q200_SQL,
    # WAND pruning is LOSSLESS: the pruned top-k must equal the
    # exhaustive-scoring top-k bit-for-bit — the oracle IS q194's
    "q220_pruned_bm25_topk": _Q190_SQL,
    # deletion must equal recompute over the surviving corpus
    "q224_bm25_index_delete": _Q224_SQL,
    "q225_versioned_index_delete": _Q224_SQL,
    # textbook log-idf: ln() in both engines, 12-sig-digit gate
    "q230_bm25_log_idf": _Q230_SQL,
    # WAND pruning stays lossless under log weights: oracle IS q230's
    "q231_log_idf_pruned_topk": _Q230_SQL,
    # corpus-shape stats recomputed from raw text with the shared
    # whitespace tokenizer; operational invariants asserted in-query
    "q241_text_index_stats": _Q241_SQL,
    # faceted top-k: corpus-wide stats + the facet on scored docs;
    # WAND losslessness within the facet asserted in-query
    "q243_bm25_filtered_topk": _Q243_SQL,
    "q248_bm25_facet_stats": _Q248_SQL,
}


# --- q256: IR evaluation metrics (MRR / nDCG@10 / recall@10) ---------------
# The measurement member of the retrieval family: q190's BM25 ranking
# (top-10) evaluated against deterministic graded qrels — binary
# relevance "document contains EVERY term of the query" (AND
# semantics, both sides pure relational algebra, so the oracle replays
# ranking + qrels + metrics end to end). MRR is a MAX of exact
# rationals; DCG/IDCG terms quantize to the DECIMAL(28,6) grid before
# the exact decimal sum (log2 is transcendental — the q230/_idf_expr
# contract); nDCG divides two deterministically-derived doubles.
# functions/ireval.py is the reusable kernel.

def q256_ir_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.ireval import ir_metrics
    from ..functions.retrieval import bm25_scores

    docs = tbl(spark, sf_dir, "documents")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )
    scored = bm25_scores(docs, qterms)
    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranking = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "doc_id", "rank")
    )
    nq = qterms.groupBy("qid").agg(
        F.countDistinct("word").alias("__nq")
    )
    dw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    qrels = (
        qterms.join(dw, "word")
        .groupBy("qid", "doc_id")
        .agg(F.countDistinct("word").alias("__nm"))
        .join(nq, "qid")
        .filter(F.col("__nm") == F.col("__nq"))
        .select("qid", "doc_id", F.lit(1).alias("grade"))
    )
    return (
        ir_metrics(ranking, qrels, k=10)
        .select(
            F.col("qid").cast("int").alias("qid"),
            "n_rel",
            "mrr",
            "ndcg",
            "recall",
        )
        .orderBy("qid")
    )


_Q256_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, word
),
dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
dfreq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
q(qid, word) AS (VALUES
  (1, 'hash'), (1, 'join'),
  (2, 'window'), (2, 'sort'), (2, 'merge'),
  (3, 'stream'), (3, 'batch'), (3, 'spark')
),
scored AS (
  SELECT q.qid, tf.doc_id,
    CAST(SUM(CAST(
      ((n - df + 5e-1) / (df + 5e-1))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl))
    AS DECIMAL(28,6))) AS DOUBLE) AS score
  FROM q
  JOIN tf USING (word)
  JOIN dfreq USING (word)
  JOIN dl USING (doc_id), stats
  GROUP BY q.qid, tf.doc_id
),
ranking AS (
  SELECT qid, doc_id, rnk FROM (
    SELECT qid, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY score DESC, doc_id
           ) AS rnk
    FROM scored
  ) WHERE rnk <= 10
),
nq AS (SELECT qid, COUNT(DISTINCT word) AS nq FROM q GROUP BY 1),
dw AS (SELECT DISTINCT doc_id, word FROM toks),
qrels AS (
  SELECT m.qid, m.doc_id, 1 AS grade
  FROM (SELECT q.qid, dw.doc_id, COUNT(DISTINCT q.word) AS nm
        FROM q JOIN dw USING (word) GROUP BY 1, 2) m
  JOIN nq USING (qid) WHERE m.nm = nq.nq
),
hits AS (
  SELECT r.qid, r.doc_id, r.rnk, COALESCE(qr.grade, 0) AS g
  FROM ranking r
  LEFT JOIN qrels qr ON qr.qid = r.qid AND qr.doc_id = r.doc_id
),
perq AS (
  SELECT qid,
         MAX(CASE WHEN g > 0 THEN 1e0 / rnk ELSE 0e0 END) AS mrr,
         CAST(SUM(CAST((pow(2e0, CAST(g AS DOUBLE)) - 1e0)
                       / log2(CAST(rnk AS DOUBLE) + 1e0)
                  AS DECIMAL(28,6))) AS DOUBLE) AS dcg,
         CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS rel_found
  FROM hits GROUP BY 1
),
ideal AS (
  SELECT qid,
         CAST(SUM(CAST((pow(2e0, CAST(grade AS DOUBLE)) - 1e0)
                       / log2(CAST(pos AS DOUBLE) + 1e0)
                  AS DECIMAL(28,6))) AS DOUBLE) AS idcg
  FROM (SELECT qid, grade, doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY qid ORDER BY grade DESC, doc_id
               ) AS pos
        FROM qrels)
  WHERE pos <= 10 GROUP BY 1
),
nrel AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel FROM qrels GROUP BY 1
),
base AS (
  SELECT DISTINCT qid FROM (
    SELECT qid FROM ranking UNION SELECT qid FROM qrels
  )
)
SELECT CAST(b.qid AS INT) AS qid,
       COALESCE(n.n_rel, 0) AS n_rel,
       COALESCE(p.mrr, 0e0) AS mrr,
       CASE WHEN COALESCE(i.idcg, 0e0) > 0
            THEN COALESCE(p.dcg, 0e0) / i.idcg ELSE 0e0 END AS ndcg,
       CASE WHEN COALESCE(n.n_rel, 0) > 0
            THEN CAST(COALESCE(p.rel_found, 0) AS DOUBLE) / n.n_rel
            ELSE 1e0 END AS recall
FROM base b
LEFT JOIN perq p USING (qid)
LEFT JOIN ideal i USING (qid)
LEFT JOIN nrel n USING (qid)
ORDER BY qid
"""

QUERIES["q256_ir_metrics"] = q256_ir_metrics
ORACLE["q256_ir_metrics"] = _Q256_SQL


# --- q271: proximity (within-window) search from the index -----------------
# The retrieval surface between exact phrase (q191/q195, adjacency)
# and bag-of-words BM25 (q190): all terms within a token window,
# unordered — "sort merge spark" within 8 tokens. Served from the
# persisted positional index (pruned per-word posting scans, the
# shared proximity_hits kernel); the oracle recomputes the identical
# relation from raw text (generate_subscripts positions, the q191
# idiom) — spans are pure integer arithmetic, value-exact everywhere.

def q271_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text_index import (
        text_index_build,
        text_index_proximity,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")

    def build(path):
        text_index_build(docs, path)

    def probe(path):
        return text_index_proximity(
            spark, path, ["sort", "merge", "spark"], window=8
        ).orderBy("doc_id")

    return _with_temp_text_index(spark, build, probe)


_Q271_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
h AS (
  SELECT t0.doc_id,
         greatest(t0.pos, t1.pos, t2.pos)
           - least(t0.pos, t1.pos, t2.pos) AS span
  FROM toks t0
  JOIN toks t1 USING (doc_id)
  JOIN toks t2 USING (doc_id)
  WHERE t0.word = 'sort' AND t1.word = 'merge' AND t2.word = 'spark'
    AND greatest(t0.pos, t1.pos, t2.pos)
          - least(t0.pos, t1.pos, t2.pos) <= 7
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(MIN(span) AS BIGINT) AS min_span
FROM h GROUP BY doc_id ORDER BY doc_id
"""


QUERIES["q271_proximity_search"] = q271_proximity_search
ORACLE["q271_proximity_search"] = _Q271_SQL
