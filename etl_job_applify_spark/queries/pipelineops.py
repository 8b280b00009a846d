"""Training-data pipeline operators over ``documents`` / ``embeddings``.

The ops a 100 TB LLM-pretraining data pipeline runs between raw crawl and
tokenized shards, beyond dedup/similarity (analytics.py) and quality
stats (textops.py):

- PII redaction (q81): regex scrub of emails/phones — per-row regexp,
  embarrassingly parallel, whole-stage codegen.
- intra-document repetition (q82): repeated-5-gram ratio — the standard
  "boilerplate/spam" signal (Gopher/C4-style rep filters). Pure array
  expressions, no explode, no shuffle.
- benchmark contamination (q83): 4-gram overlap between corpus docs and a
  benchmark set — exploded shingle equi-join with the (small) benchmark
  gram set broadcast; at 100 TB the corpus side streams map-side against
  the broadcast hash set, zero shuffle for the probe.
- sequence packing (q84): concat-then-chunk token accounting (the layout
  LLM pretraining actually uses): windowed cumulative sums PARTITIONED BY
  SHARD (``source``), because a single global running sum cannot
  parallelize — per-shard packing is both the scalable plan and the
  physically meaningful one (shards are the unit written to disk).
- embedding quantization (q85): per-vector symmetric int8 — scale =
  max|x|/127, round-half-up, reconstruction-error bound checked in the
  same expression. Element-wise IEEE arithmetic → bit-identical across
  engines and parallelism.

Every query here is fully DuckDB-oracled (scalar outputs only).

Reference scope note: the reference (itsrcx/etl-job-applify) has no
analytics beyond its post-processing stub (services/post_processing.py:5-8);
these realize the north-star training-data surface mandated by
BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import tbl
from ..functions.text import (
    EMAIL_RE as _EMAIL_RE,
    PHONE_RE as _PHONE_RE,
    repeated_ngram_shingles_expr,
)


# --- q81: PII redaction ---------------------------------------------------
# The synthetic corpus contains no PII, so the query *injects*
# deterministic PII (email + phone derived from doc_id) with engine-portable
# string ops, then scrubs it — the redaction regexes (functions/text.py)
# are genuinely exercised on every row and the oracle rebuilds the
# identical input.

_AUGMENT = (
    "concat({text}, ' contact user', CAST(doc_id AS STRING),"
    " '@example.com call +1 555-123-',"
    " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
)


def q81_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    aug = _AUGMENT.format(text="text")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.expr(aug), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("clean"),
        F.regexp_count(F.expr(aug), F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(F.expr(aug), F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
    )


_Q81_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com call +1 555-123-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g'),
         '\+[0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean,
       CAST(len(regexp_extract_all(a,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(a,
         '\+[0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones
FROM aug
"""


# --- q82: intra-document repetition (repeated 5-gram ratio) ---------------
# All-array-expression form: tokens bound as a lambda variable (see
# dedup/shingles.py on why an alias would re-tokenize per position), the
# 5-gram list built with transform over an index sequence, and the ratio
# from size vs size(array_distinct). No explode, no shuffle — a pure map
# stage at any corpus size.

def q82_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    sh = repeated_ngram_shingles_expr("text", n=5)
    return docs.select(
        "doc_id",
        F.expr(f"CAST(size({sh}) AS INT)").alias("n_shingles"),
        F.expr(f"CAST(size(array_distinct({sh})) AS INT)").alias("n_unique"),
        F.expr(
            f"CASE WHEN size({sh}) > 0 THEN "
            f"1.0D - CAST(size(array_distinct({sh})) AS DOUBLE)"
            f" / CAST(size({sh}) AS DOUBLE) END"
        ).alias("rep_ratio"),
    )


_Q82_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5 THEN
           list_transform(range(1, len(t) - 3),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))
         ELSE [] END AS g
  FROM tok
)
SELECT doc_id,
       CAST(len(g) AS INT) AS n_shingles,
       CAST(len(list_distinct(g)) AS INT) AS n_unique,
       CASE WHEN len(g) > 0 THEN
         1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / CAST(len(g) AS DOUBLE)
       END AS rep_ratio
FROM sh
"""


# --- q83: benchmark contamination (4-gram overlap) ------------------------
# Docs with doc_id % 17 = 0 stand in for the held-out benchmark set. A
# corpus document is contaminated in proportion to the distinct 4-grams it
# shares with ANY benchmark doc. (4-gram shingles: the synthetic
# corpus draws from a ~30-word vocabulary, so 4-grams here play the role
# 8-13-grams do on real text.) The benchmark gram set is tiny relative
# to the corpus → broadcast; the corpus side then probes map-side with no
# shuffle, and only matching (doc_id, gram) rows reach the final count
# aggregation. The near-duplicate pairs planted in the corpus make this
# genuinely fire.

def _grams4(df: DataFrame) -> DataFrame:
    # shared shingle construction (dedup/shingles.py) — the lambda-bound
    # tokenization idiom lives there; two references to the alias cost
    # two evaluations, same as the inline form it replaced
    from ..dedup.shingles import with_shingles

    return with_shingles(df, n=4, out="__sh").select(
        "doc_id",
        F.expr("CAST(size(__sh) AS INT)").alias("n_grams"),
        F.explode("__sh").alias("gram"),
    )


def q83_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    grams = _grams4(docs)
    bench = (
        grams.filter(F.col("doc_id") % 17 == 0).select("gram").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % 17 != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").cast("int").alias("n_shared"),
            F.first("n_grams").alias("n_grams"),
        )
        .select(
            "doc_id",
            "n_shared",
            "n_grams",
            (F.col("n_shared").cast("double") / F.col("n_grams")).alias(
                "contamination"
            ),
        )
    )


_Q83_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 2),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3]))) AS gram
  FROM tok WHERE len(t) >= 4
),
ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0)
SELECT g.doc_id,
       CAST(COUNT(*) AS INT) AS n_shared,
       CAST(ng.n_grams AS INT) AS n_grams,
       CAST(COUNT(*) AS DOUBLE) / CAST(ng.n_grams AS INT) AS contamination
FROM g JOIN b USING (gram) JOIN ng ON g.doc_id = ng.doc_id
WHERE g.doc_id % 17 <> 0
GROUP BY g.doc_id, ng.n_grams
"""


# --- q84: sequence packing (concat-then-chunk token accounting) -----------
# Pretraining concatenates each shard's documents and slices fixed
# context windows; this computes, per document, its byte^Wtoken offsets
# and the chunk span it lands in. Cumulative sums are windowed PER SHARD
# (``source``): a global running sum is inherently sequential, while the
# per-shard window distributes — one shuffle on source, then a local sort
# and scan per partition.

_CTX = 512


def q84_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.expr("CAST(size(split(text, ' ')) AS INT)").alias("tok"),
    )
    end = F.sum("tok").over(w).cast("bigint")
    return toks.select(
        "doc_id",
        "source",
        "tok",
        (end - F.col("tok")).alias("start_off"),
        F.floor((end - F.col("tok")) / F.lit(float(_CTX)))
        .cast("int")
        .alias("first_chunk"),
        F.floor((end - 1) / F.lit(float(_CTX))).cast("int").alias("last_chunk"),
    )


_Q84_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS INT) AS tok
  FROM documents
),
c AS (
  SELECT doc_id, source, tok,
         CAST(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS end_off
  FROM t
)
SELECT doc_id, source, tok,
       end_off - tok AS start_off,
       CAST(FLOOR((end_off - tok) / {_CTX}.0) AS INT) AS first_chunk,
       CAST(FLOOR((end_off - 1) / {_CTX}.0) AS INT) AS last_chunk
FROM c
"""


# --- q85: symmetric int8 embedding quantization ---------------------------
# scale = max|x| / 127; q_i = floor(x_i/scale + 0.5) (round-half-up, an
# IEEE-exact op both engines share, unlike engine-native round()); the
# reconstruction error bound max|q_i*scale - x_i| <= scale/2 is checked in
# the same expression. Eight bytes per 64-dim vector instead of 256 —
# the standard first compression step before ANN indexing at scale.

def q85_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    v = "transform(embedding, x -> CAST(x AS DOUBLE))"
    max_abs = f"array_max(transform({v}, x -> abs(x)))"
    scale = f"({max_abs} / 127.0D)"
    err = (
        f"array_max(transform({v},"
        f" x -> abs(floor(x / {scale} + 0.5D) * {scale} - x)))"
    )
    return (
        emb.filter(F.expr(f"{max_abs} > 0"))
        .select(
            "vec_id",
            F.expr(scale).alias("scale"),
            F.expr(err).alias("max_abs_err"),
            F.expr(f"{err} <= {scale} * 0.5000001D").alias("within_bound"),
        )
    )


_Q85_SQL = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
m AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS max_abs
  FROM e
)
SELECT vec_id,
       max_abs / 127.0 AS scale,
       list_max(list_transform(v,
         x -> abs(floor(x / (max_abs / 127.0) + 0.5) * (max_abs / 127.0) - x)))
         AS max_abs_err,
       list_max(list_transform(v,
         x -> abs(floor(x / (max_abs / 127.0) + 0.5) * (max_abs / 127.0) - x)))
         <= (max_abs / 127.0) * 0.5000001 AS within_bound
FROM m WHERE max_abs > 0
"""


QUERIES = {
    "q81_pii_redaction": q81_pii_redaction,
    "q82_repetition": q82_repetition,
    "q83_contamination": q83_contamination,
    "q84_packing": q84_packing,
    "q85_quantize": q85_quantize,
}

ORACLE = {
    "q81_pii_redaction": _Q81_SQL,
    "q82_repetition": _Q82_SQL,
    "q83_contamination": _Q83_SQL,
    "q84_packing": _Q84_SQL,
    "q85_quantize": _Q85_SQL,
}
