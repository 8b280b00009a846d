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
    from etl_job_applify_spark.functions.retrieval import (
        bm25_scores,
        phrase_hits,
        token_positions,
    )
    from etl_job_applify_spark.queries._util import tbl

    docs = tbl(spark, sf_dir, "documents")
    emb = tbl(spark, sf_dir, "embeddings")

    # 1: BM25 shortlist for the phrase's terms — the SAME kernel the
    # registered q190 runs (functions/retrieval.py), called with a
    # bare word list instead of a (qid, word) query set
    terms = phrase.split(" ")
    qterms = spark.createDataFrame([(w,) for w in terms], "word string")
    scored = (
        bm25_scores(docs, qterms)
        .withColumnRenamed("score", "bm25")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(shortlist_k)
    )

    # 2: exact phrase confirmation on the shortlist only — the q191
    # posting chain over shortlist-filtered positions
    pos = token_positions(
        docs.join(F.broadcast(scored.select("doc_id")), "doc_id", "left_semi")
    )
    confirmed = scored.join(
        phrase_hits(pos, terms).select("doc_id").distinct(),
        "doc_id",
        "left_semi",
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


def search_indexed(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    phrase: str = "sort merge",
    shortlist_k: int = 20,
    where=None,
) -> DataFrame:
    """The same three stages served from the PERSISTED inverted index
    (functions/text_index.py) — the steady-state shape: the corpus was
    tokenized once at ingest, so stages 1-2 are per-term pruned posting
    scans instead of corpus passes. Scores are bit-identical to
    ``search`` (shared scoring kernel), which the __main__ run
    asserts.

    ``where``: faceted search over the index's stored ``meta_cols``
    (e.g. ``"lang = 'en'"``) — candidates filter inside the index scan,
    scores stay corpus-statistic-identical (the q243 contract), so the
    faceted shortlist is exactly the unfaceted one intersected with the
    facet (also asserted in __main__)."""
    from etl_job_applify_spark.functions.text_index import (
        text_index_bm25,
        text_index_phrase_hits,
    )
    from etl_job_applify_spark.queries._util import tbl

    emb = tbl(spark, sf_dir, "embeddings")
    terms = phrase.split(" ")
    qterms = spark.createDataFrame([(w,) for w in terms], "word string")
    scored = (
        text_index_bm25(spark, index_path, qterms, where=where)
        .withColumnRenamed("score", "bm25")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(shortlist_k)
    )
    confirmed = scored.join(
        text_index_phrase_hits(spark, index_path, terms)
        .select("doc_id")
        .distinct(),
        "doc_id",
        "left_semi",
    )
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
        emb.join(F.broadcast(confirmed), emb.vec_id == confirmed.doc_id)
        .crossJoin(F.broadcast(anchor))
        .select(
            "doc_id",
            "bm25",
            F.expr(f"({dot}) / (({nrm}) * ({qn}))").alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_id")
    )


if __name__ == "__main__":
    import tempfile

    from etl_job_applify_spark.functions.text_index import text_index_build
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.session import get_spark_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark_session("retrieval_pipeline")
    direct = search(spark, sf)
    direct.show(20, truncate=False)
    # steady-state serving: tokenize once, then serve from the index —
    # results must be BIT-IDENTICAL to the corpus recompute above
    idx = tempfile.mkdtemp(prefix="retrieval_idx_") + "/idx"
    text_index_build(tbl(spark, sf, "documents"), idx)
    served = search_indexed(spark, sf, idx)
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in direct.collect()
    ], "index-served results diverged from recompute"
    print("index-served == recomputed (bit-exact)")
    # faceted serving: a lang facet stored at founding filters
    # candidates without touching scores — the faceted shortlist is the
    # unfaceted full scoring post-filtered to the facet
    docs_meta = tbl(spark, sf, "documents").withColumn(
        "lang",
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    )
    fidx = tempfile.mkdtemp(prefix="retrieval_fidx_") + "/idx"
    text_index_build(docs_meta, fidx, meta_cols=["lang"])
    from etl_job_applify_spark.functions.text_index import text_index_bm25

    qterms = spark.createDataFrame(
        [(w,) for w in "sort merge".split()], "word string"
    )
    faceted = {
        (r["doc_id"], r["score"])
        for r in text_index_bm25(
            spark, fidx, qterms, where="lang = 'en'"
        ).collect()
    }
    unfaceted = {
        (r["doc_id"], r["score"])
        for r in text_index_bm25(spark, fidx, qterms).collect()
    }
    assert faceted == {
        (d, s) for d, s in unfaceted if d % 3 == 0
    } and faceted, "faceted serving diverged from post-filtered scores"
    print(f"faceted serving verified ({len(faceted)} en docs scored)")
    spark.stop()
