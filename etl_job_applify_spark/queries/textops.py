"""Text-analysis query inventory over ``documents`` (north-star: language
ID, quality scoring, token counting, fingerprinting).

All expressions are JVM-side built-ins (functions/text.py); the DuckDB
oracles mirror them with list functions, including the modular-arithmetic
fingerprint folds (engine-portable by construction, unlike xxhash64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


QUERIES = {
    "q40_text_stats": q40_text_stats,
    "q41_lang_id": q41_lang_id,
    "q42_token_agg": q42_token_agg,
    "q43_fingerprints": q43_fingerprints,
    "q130_url_normalize": q130_url_normalize,
    "q131_byte_lengths": q131_byte_lengths,
}

ORACLE = {
    "q40_text_stats": _Q40_SQL,
    "q41_lang_id": _Q41_SQL,
    "q42_token_agg": _Q42_SQL,
    "q43_fingerprints": _Q43_SQL,
    "q130_url_normalize": _Q130_SQL,
    "q131_byte_lengths": _Q131_SQL,
}
