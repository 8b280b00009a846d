"""Embedding-search serving runbook: the persisted vector index through
its whole operational life (similarity/vector_index.py).

The deployment story a 100 TB embedding store actually runs, end to
end, with every stage self-verifying:

1. FOUND       one-time: train the coarse quantizer, assign + lay the
               corpus out partitioned by cell (the expensive pass, paid
               once — probes never re-assign anything)
2. SERVE       per query batch: probe cells become a static partition
               filter; exact cosine inside the probed cells. Verified
               bit-identical to the recompute kernel pinned to the
               recorded centroids.
3. APPEND      today's embeddings CAS-append, assigned with the
               FOUNDING quantizer (epoch-fenced — a replayed batch
               commits nothing)
4. DRIFT       after enough appends the founding quantizer no longer
               matches the corpus: `reindex_vector_index` retrains on
               the index's OWN vectors, re-assigns every live row, and
               publishes as one CAS snapshot (also purges tombstones).
               Verified: post-reindex serving equals a recompute pinned
               to the NEW centroids over the full live corpus.
5. FILTER      filtered serving — "top-k WHERE lang='en'": the index
               stores metadata columns (meta_cols at founding, carried
               through append and reindex), and the probe's `where=`
               predicate applies INSIDE the probed cells before top-k,
               so the full k survivors come back (post-filtering the
               top-k would silently return fewer). Verified equal to a
               recompute over the pre-filtered corpus.
6. HYBRID      RAG-style retrieval served ENTIRELY from persisted
               state: the inverted text index answers the BM25 lexical
               leg, the vector index answers the cosine leg
               (nprobe >= cells: the degenerate-exact probe), fused by
               reciprocal-rank fusion. Verified equal to the raw
               recompute of both legs — zero corpus-sized work at
               query time beyond the pruned index reads.
7. ESCALATE    under-return contract for selective facets: queries
               whose filtered result under-fills k re-probe with
               nprobe doubled until full-k or total coverage (then a
               short answer is the maximal one). Verified equal to
               brute filtered cosine under a full-coverage facet.
8. BULK        offline corpus-vs-index kNN (`vector_index_knn_join`):
               cell-keyed shuffle join, no driver collect, no
               query-side broadcast. Verified bit-identical to the
               probe on the same query set.
9. RETENTION   compaction + explicit vacuum for tables whose cadence
               stopped (grace-window collapse); serving unchanged.

Run:

    python examples/vector_search_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str) -> dict:
    import numpy as np

    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.similarity import (
        ann_topk_ivf,
        reindex_vector_index,
        vector_index_build,
        vector_index_probe,
    )
    from etl_job_applify_spark.similarity.vector_index import _live_cells

    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.col("vec_id") % 3 + 1).cast("int"),
    ).alias("lang")
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", lang
    )
    history = emb.filter(F.col("vec_id") % 10 != 0)
    todays = emb.filter(F.col("vec_id") % 10 == 0)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = tempfile.mkdtemp(prefix="vecsearch_") + "/idx"

    def served():
        return sorted(
            map(
                tuple,
                vector_index_probe(
                    spark, idx, queries, k=5, nprobe=4
                ).collect(),
            )
        )

    def recomputed(corpus):
        cents = _live_cells(spark, idx)[1]  # the RECORDED quantizer
        return sorted(
            map(
                tuple,
                ann_topk_ivf(
                    corpus, queries, k=5,
                    num_cells=int(len(cents)), nprobe=4,
                    centroids=np.asarray(cents),
                ).collect(),
            )
        )

    # 1. FOUND on the history (trained quantizer, versioned layout,
    #    lang stored per vector so probes can filter on it)
    vector_index_build(history, idx, num_cells=16, meta_cols=["lang"])
    # 2. SERVE — and prove index-served == recompute with the recorded
    #    quantizer, bit for bit
    assert served() == recomputed(history), "serve diverged post-found"

    # 3. APPEND today's batch, epoch-fenced; replay must commit nothing
    vector_index_build(todays, idx, mode="append", epoch_mark="_epoch_d1")
    vector_index_build(todays, idx, mode="append", epoch_mark="_epoch_d1")
    after_append = served()
    assert after_append == recomputed(emb), "serve diverged post-append"

    # 4. DRIFT maintenance: retrain from the index's own vectors,
    #    re-shape to 8 cells, one CAS publish — serving follows the new
    #    geometry immediately
    meta = reindex_vector_index(spark, idx, num_cells=8)
    assert meta["num_cells"] == 8
    after_reindex = served()
    assert after_reindex == recomputed(emb), "serve diverged post-reindex"

    # 5. FILTERED serve: the predicate applies inside the probed cells
    #    (meta_cols survived the append AND the reindex) — equal to a
    #    recompute over the pre-filtered corpus, full k per query
    filtered = sorted(
        map(
            tuple,
            vector_index_probe(
                spark, idx, queries, k=5, nprobe=999, where="lang = 'en'"
            ).collect(),
        )
    )
    from etl_job_applify_spark.similarity import cosine_topk

    assert filtered == sorted(
        map(
            tuple,
            cosine_topk(
                emb.filter(F.col("lang") == "en"), queries, k=5
            ).collect(),
        )
    ), "filtered serve diverged from brute filtered cosine"
    assert len(filtered) == 5 * queries.count(), "filtered probe short"

    # 6. HYBRID RRF served from BOTH persisted indexes (the q235/q200
    #    contract): indexed BM25 leg + indexed cosine leg, fused — and
    #    verified against the raw recompute of both legs
    hybrid_rows = _hybrid_stage(spark, sf_dir, idx)

    # 7. ESCALATE: a selective facet can leave fewer than k predicate
    #    survivors in the probed cells — the plain probe returns short;
    #    escalate=True doubles nprobe for under-filled queries until
    #    they fill or coverage is total (the maximal answer). Verified:
    #    the escalated result under a facet so rare it forces full
    #    coverage equals brute filtered cosine.
    #    (facet "vid < 4": fewer survivors than k at ANY corpus size,
    #    so escalation provably reaches full coverage and the result is
    #    exactly brute filtered cosine — the maximal short answer)
    rare = vector_index_probe(
        spark, idx, queries, k=5, nprobe=1,
        where="vid < 4", escalate=True,
    )
    rare_rows = sorted(map(tuple, rare.collect()))
    assert rare_rows == sorted(
        map(
            tuple,
            cosine_topk(
                emb.filter(F.col("vec_id") < 4), queries, k=5
            ).collect(),
        )
    ), "escalated filtered serve diverged from brute filtered cosine"

    # 8. BULK kNN JOIN: the offline corpus-vs-index shape (semantic-
    #    dedup feeder) — cell-keyed shuffle join, no driver collect, no
    #    query-side broadcast. Verified bit-identical to the probe on
    #    the same queries.
    from etl_job_applify_spark.similarity import vector_index_knn_join

    bulk = sorted(
        map(
            tuple,
            vector_index_knn_join(
                spark, idx, queries, k=5, nprobe=4
            ).collect(),
        )
    )
    assert bulk == served(), "bulk kNN join diverged from the probe"

    # 9. RETENTION: compaction keeps one grace cycle of folded
    #    snapshots for in-flight probes; a table that stops compacting
    #    vacuums explicitly (quiesce probes first). Serving unchanged.
    from etl_job_applify_spark.similarity import (
        optimize_vector_index,
        vacuum_vector_index,
    )

    before_vacuum = served()
    optimize_vector_index(spark, idx)
    vacuum_vector_index(spark, idx)
    assert served() == before_vacuum, "serve diverged post-vacuum"

    return {
        "n_indexed": meta["n_vecs"],
        "results_per_query": len(after_reindex) // queries.count(),
        "hybrid_rows": hybrid_rows,
        "stages_verified": 8,
    }


def _hybrid_stage(spark: SparkSession, sf_dir: str, vec_idx: str) -> int:
    """Indexed-RRF serving, self-verified against the recompute legs."""
    from pyspark.sql import Window

    from etl_job_applify_spark.functions.retrieval import bm25_scores
    from etl_job_applify_spark.functions.text_index import (
        text_index_bm25,
        text_index_build,
    )
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.similarity import (
        cosine_topk,
        vector_index_probe,
    )

    K_TOP, LEG_L = 10, 20
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    emb = tbl(spark, sf_dir, "embeddings")
    qdefs = [(1, ["hash", "join"]), (2, ["sort", "merge", "scan"])]
    qterms = spark.createDataFrame(
        [(qid, w) for qid, ws in qdefs for w in ws], "qid int, word string"
    )
    anchors = emb.filter(
        F.col("vec_id").isin([qid for qid, _ in qdefs])
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    tdir = tempfile.mkdtemp(prefix="vecsearch_text_")

    def fuse(lex_scored, vec_ranked):
        w_lex = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        lex = (
            lex_scored.withColumn("lex_rank", F.row_number().over(w_lex))
            .filter(F.col("lex_rank") <= LEG_L)
            .select("qid", "doc_id", "lex_rank")
        )
        fused = lex.join(
            vec_ranked, ["qid", "doc_id"], "full_outer"
        ).withColumn(
            "rrf_score",
            F.expr(
                "coalesce(1e0 / (60 + lex_rank), 0e0)"
                " + coalesce(1e0 / (60 + vec_rank), 0e0)"
            ),
        )
        w_f = Window.partitionBy("qid").orderBy(
            F.desc("rrf_score"), F.asc("doc_id")
        )
        return sorted(
            map(
                tuple,
                fused.withColumn("rrf_rank", F.row_number().over(w_f))
                .filter(F.col("rrf_rank") <= K_TOP)
                .select("qid", "doc_id", "rrf_rank", "rrf_score")
                .collect(),
            )
        )

    def vec_leg(df):
        return df.select(
            F.col("query_id").cast("int").alias("qid"),
            F.col("neighbor").alias("doc_id"),
            F.col("rank").cast("int").alias("vec_rank"),
        )

    try:
        text_index_build(docs, f"{tdir}/text")  # versioned default
        served = fuse(
            text_index_bm25(spark, f"{tdir}/text", qterms),
            vec_leg(
                vector_index_probe(
                    spark, vec_idx, anchors, k=LEG_L, nprobe=999
                )
            ),
        )
        recomputed = fuse(
            bm25_scores(docs, qterms),
            vec_leg(cosine_topk(emb, anchors, k=LEG_L)),
        )
    finally:
        import shutil

        shutil.rmtree(tdir, ignore_errors=True)
    assert served == recomputed, "indexed hybrid RRF diverged from recompute"
    assert len(served) > 0
    return len(served)


if __name__ == "__main__":
    from etl_job_applify_spark.session import get_spark_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark_session("vector-search-pipeline")
    print(main(spark, sf))
