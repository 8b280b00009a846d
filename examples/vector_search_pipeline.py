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

    emb = tbl(spark, sf_dir, "embeddings")
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

    # 1. FOUND on the history (trained quantizer, versioned layout)
    vector_index_build(history, idx, num_cells=16)
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

    return {
        "n_indexed": meta["n_vecs"],
        "results_per_query": len(after_reindex) // queries.count(),
        "stages_verified": 3,
    }


if __name__ == "__main__":
    from etl_job_applify_spark.session import get_spark_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark_session("vector-search-pipeline")
    print(main(spark, sf))
