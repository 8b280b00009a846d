"""Keyword + vector retrieval over the curated corpus.

The search surface composed end-to-end — the stages a RAG/data-discovery
job runs against a 100 TB lake, each one the library call it would make:

1. lexical recall   BM25 top-k per keyword query (q190's shape:
                    one tf shuffle, broadcast df/stats/query terms,
                    rational-odds idf — no transcendental calls in the
                    scoring expression)
2. phrase filter    exact phrase must appear (positional-postings
                    chain join, per-word pushdown — q191's shape)
3. vector rerank    cosine against the query docs' own embeddings
                    (brute-force over the SHORTLIST only — the gated
                    exact path is fine on dozens of candidates;
                    similarity/ANN indexes are the corpus-wide path)

The output is (qid, doc_id, bm25, cosine) for the phrase-confirmed
shortlist, cosine-desc per query. Run:

    python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def search(
    spark: SparkSession,
    sf_dir: str,
    phrase: str = "sort merge",
    shortlist_k: int = 20,
) -> DataFrame:
    from etl_job_applify_spark.queries._util import tbl

    docs = tbl(spark, sf_dir, "documents")
    emb = tbl(spark, sf_dir, "embeddings")

    # 1: BM25 shortlist for the phrase's terms (rational-odds idf,
    # decimal-accumulated sums — the q190 kernel, parameterized)
    terms = phrase.split(" ")
    toks = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' ')")).alias("word")
    )
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qterms = spark.createDataFrame([(w,) for w in terms], "word string")
    scored = (
        tf.join(F.broadcast(qterms), "word")
        .join(F.broadcast(dfreq.join(F.broadcast(qterms), "word", "left_semi")), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(SUM(CAST(((n - df + 5e-1) / (df + 5e-1))"
                " * (tf * 2.2e0)"
                " / (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl))"
                " AS DECIMAL(28,6))) AS DOUBLE)"
            ).alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(shortlist_k)
    )

    # 2: exact phrase confirmation on the shortlist only — the posting
    # chain runs against shortlist-filtered positions
    pos = (
        docs.join(F.broadcast(scored.select("doc_id")), "doc_id", "left_semi")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("p", "word"),
        )
    )
    hits = pos.filter(F.col("word") == terms[0]).select("doc_id", "p")
    for k, w in enumerate(terms[1:], 1):
        hits = hits.join(
            pos.filter(F.col("word") == w).select(
                "doc_id", (F.col("p") - k).alias("p")
            ),
            ["doc_id", "p"],
        )
    confirmed = scored.join(
        hits.select("doc_id").distinct(), "doc_id", "left_semi"
    )

    # 3: cosine rerank against the top BM25 doc's embedding — exact
    # zip_with/aggregate fold, shortlist-sized so the gated brute path
    # is the right tool (corpus-wide ANN lives in similarity/)
    anchor = (
        emb.join(
            F.broadcast(confirmed.orderBy(F.desc("bm25"), "doc_id").limit(1)),
            emb.vec_id == F.col("doc_id"),
        )
        .select(F.col("embedding").alias("q_vec"))
    )
    dot = "aggregate(zip_with(embedding, q_vec, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    nrm = "sqrt(aggregate(embedding, 0D, (a, x) -> a + x * x))"
    qn = "sqrt(aggregate(q_vec, 0D, (a, x) -> a + x * x))"
    return (
        emb.join(
            F.broadcast(confirmed), emb.vec_id == confirmed.doc_id
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "doc_id",
            "bm25",
            F.expr(f"({dot}) / (({nrm}) * ({qn}))").alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_id")
    )


if __name__ == "__main__":
    from etl_job_applify_spark.session import get_spark_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark_session("retrieval_pipeline")
    search(spark, sf).show(20, truncate=False)
    spark.stop()
