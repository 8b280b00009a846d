"""Right-to-erasure runbook: remove documents from EVERY serving surface.

A takedown/GDPR request arrives as a set of document ids. In a lakehouse
deployment those documents live in (at least) three places, each with
its own lifecycle, and all three must stop serving the content NOW —
physical space reclaim can follow at the next maintenance window:

1. the corpus table      versioned parquet — rewrite-on-delete published
                         as a new snapshot (old versions remain for time
                         travel until VACUUM retires them; run vacuum
                         with a short retention for true erasure)
2. the dedup index       one `lifecycle.forget_documents` sweep — tombstones
                         at the next probe; `optimize_index` purges
3. the text index        same sweep — same contract; while
                         tombstones exist, corpus stats derive from the
                         filtered doclens so served BM25 scores are
                         exactly what a survivor-only rebuild would give
4. the vector index      same sweep — the documents'
                         embeddings stop surfacing as ANN neighbors at
                         the next probe; `optimize_vector_index` purges

Each step verifies itself: the erased ids must be absent from the new
corpus snapshot, produce no dedup candidates, score in no retrieval
result, and appear as no ANN neighbor. Run:

    python examples/gdpr_erasure.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


ERASE_PRED = "doc_id % 50 = 7"  # the request: a deterministic id set


def main(spark: SparkSession, sf_dir: str) -> dict:
    from etl_job_applify_spark.dedup import (
        minhash_index_build,
        minhash_index_probe,
    )
    from etl_job_applify_spark.functions.text_index import (
        text_index_bm25,
        text_index_build,
    )
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.similarity import (
        vector_index_build,
        vector_index_probe,
    )
    from etl_job_applify_spark.sinks import read_table, write_version

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    erase = docs.filter(F.expr(ERASE_PRED)).select(
        F.col("doc_id").alias("doc")
    )
    n_erase = erase.count()

    work = tempfile.mkdtemp(prefix="gdpr_")
    corpus_tbl = f"{work}/corpus"
    dedup_idx = f"{work}/dedup_idx"
    text_idx = f"{work}/text_idx"
    vec_idx = f"{work}/vec_idx"

    # ---- standing state: the surfaces as a production deployment has them
    write_version(docs, corpus_tbl)
    minhash_index_build(docs, dedup_idx, num_hashes=64, bands=16)
    text_index_build(docs, text_idx)
    emb = tbl(spark, sf_dir, "embeddings")
    vector_index_build(emb, vec_idx, num_cells=8)

    # ---- 1. corpus table: rewrite-on-delete, published as a snapshot
    current = read_table(spark, corpus_tbl)
    write_version(
        current.join(erase, current["doc_id"] == erase["doc"], "left_anti"),
        corpus_tbl,
    )
    left_in_corpus = (
        read_table(spark, corpus_tbl)
        .filter(F.expr(ERASE_PRED))
        .count()
    )

    # ---- 2-4. the index families: ONE sweep tombstones the erased ids
    # out of all three at once (lifecycle.forget_documents — idempotent
    # per family, so a crash mid-sweep is healed by re-running it);
    # serving changes now, space reclaims at the optimize sweep below
    from etl_job_applify_spark.lifecycle import forget_documents

    swept = forget_documents(
        spark, erase,
        text_index=text_idx, dedup_index=dedup_idx, vector_index=vec_idx,
    )
    assert swept["dedup"] == n_erase  # dedup counts the full id set

    # ---- 2. dedup index: erased ids stop surfacing as candidates
    history = read_table(spark, corpus_tbl)
    probe = minhash_index_probe(
        spark, dedup_idx, docs.limit(50), history, threshold=0.5
    )
    # pairs are normalized a < b: an erased id can surface on EITHER
    # endpoint, so the self-check must cover both projections
    probe_ids = probe.select(F.col("a").alias("doc")).unionByName(
        probe.select(F.col("b").alias("doc"))
    )
    dedup_hits = probe_ids.join(erase, "doc", "left_semi").count()

    # ---- 3. text index: exact filtered stats while tombstones pend
    qterms = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "stream")], "qid int, word string"
    )
    scored = text_index_bm25(spark, text_idx, qterms)
    text_hits = scored.join(
        erase, scored["doc_id"] == erase["doc"], "left_semi"
    ).count()

    # ---- 4. vector index: the erased docs' embeddings leave ANN results
    # (doc ids double as vec ids in the fixtures — a deployment keys the
    # embedding table on the same document id)
    neighbors = vector_index_probe(
        spark, vec_idx,
        emb.limit(20).select(F.col("vec_id").alias("query_id"), "embedding"),
        k=10, nprobe=8,
    )
    ann_hits = neighbors.join(
        erase, neighbors["neighbor"] == erase["doc"], "left_semi"
    ).count()

    # ---- 5. maintained graph state: the erased docs' co-occurrence
    # edges leave the steady-state dedup clusters and triangle counts
    # (lifecycle.graph_forget — the delete-aware kernels, each
    # change-bounded and ≡ a one-shot recompute on the remaining graph)
    from etl_job_applify_spark.dedup.jaccard import ngram_jaccard_pairs
    from etl_job_applify_spark.lifecycle import graph_forget
    from etl_job_applify_spark.operators.components import (
        connected_components,
    )
    from etl_job_applify_spark.operators.triangles import (
        TriangleCounts,
        triangle_stats,
    )

    pairs = ngram_jaccard_pairs(
        tbl(spark, sf_dir, "documents"), threshold=0.5
    ).select("a", "b").localCheckpoint()
    cc = connected_components(pairs)
    st = triangle_stats(pairs)
    gf = graph_forget(
        pairs, erase,
        triangle_prior=TriangleCounts(
            st.n_edges, st.n_triangles, st.n_wedges
        ),
        cc_labels=cc,
    )
    graph_hits = gf["cc_labels"].join(
        erase.withColumnRenamed("doc", "node"), "node", "left_semi"
    ).count()

    # ---- reclaim: the second sweep tombstones nothing (idempotence)
    # and compacts every family (physical purge, serve-invariant)
    swept2 = forget_documents(
        spark, erase,
        text_index=text_idx, dedup_index=dedup_idx, vector_index=vec_idx,
        optimize=True,
    )
    assert not any(swept2.values())

    report = {
        "n_erased": n_erase,
        "left_in_corpus": left_in_corpus,
        "dedup_candidates_of_erased": dedup_hits,
        "retrieval_hits_of_erased": text_hits,
        "ann_neighbors_of_erased": ann_hits,
        "graph_labels_of_erased": graph_hits,
    }
    assert left_in_corpus == 0
    assert dedup_hits == 0
    assert text_hits == 0
    assert ann_hits == 0
    assert graph_hits == 0
    return report


if __name__ == "__main__":
    from etl_job_applify_spark.session import get_spark_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark_session("gdpr-erasure")
    print(main(spark, sf))
