"""Cross-family forget sweep (etl_job_applify_spark/lifecycle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta token{i} "
            f"word{i % 3} filler{i % 5} common text body")
        for i in range(1, 31)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _emb(spark):
    rows = [
        (i, [float(i % 7), float(i % 5), 1.0, float(i % 3)])
        for i in range(1, 31)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_forget_sweep_idempotent_and_recoverable(spark, tmp_path):
    """First sweep tombstones everywhere; a replayed sweep is a no-op;
    a sweep interrupted between families (simulated by forgetting in
    one family only) is healed by the ordinary re-run — the completed
    family no-ops, the missed ones catch up."""
    from etl_job_applify_spark.dedup.incremental import minhash_index_build
    from etl_job_applify_spark.functions.text_index import (
        text_index_build,
        text_index_stats,
    )
    from etl_job_applify_spark.lifecycle import forget_documents
    from etl_job_applify_spark.similarity.vector_index import (
        vector_index_build,
        vector_index_stats,
    )

    docs, emb = _docs(spark), _emb(spark)
    tp, dp, vp = (
        str(tmp_path / "text"), str(tmp_path / "dedup"),
        str(tmp_path / "vec"),
    )
    text_index_build(docs, tp)
    minhash_index_build(docs, dp)
    cents = [r["embedding"] for r in emb.orderBy("vec_id").limit(2).collect()]
    vector_index_build(emb, vp, num_cells=2, centroids=cents)

    doomed = [3, 6, 9]
    # crash window: only the text family's delete landed
    partial = forget_documents(spark, doomed, text_index=tp)
    assert partial == {"text": 3}
    # recovery = re-run the full sweep: text no-ops, others catch up
    s1 = forget_documents(
        spark, doomed, text_index=tp, dedup_index=dp, vector_index=vp
    )
    assert s1 == {"text": 0, "dedup": 3, "vector": 3}
    # replayed full sweep: all no-op
    s2 = forget_documents(
        spark, doomed, text_index=tp, dedup_index=dp, vector_index=vp
    )
    assert s2 == {"text": 0, "dedup": 0, "vector": 0}
    assert text_index_stats(spark, tp)["n_docs"] == 27
    assert vector_index_stats(spark, vp)["n_vecs"] == 27

    # ids unknown to a family are harmless (the sweep can carry the
    # union of every family's id space)
    s3 = forget_documents(
        spark, [999], text_index=tp, dedup_index=dp, vector_index=vp
    )
    assert s3["text"] == 0 and s3["vector"] == 0

    # optimize sweep reclaims space without changing live counts
    forget_documents(
        spark, doomed, text_index=tp, dedup_index=dp, vector_index=vp,
        optimize=True,
    )
    t, v = text_index_stats(spark, tp), vector_index_stats(spark, vp)
    assert t["n_docs"] == 27 and v["n_vecs"] == 27
    assert t["n_pending_tombstones"] == 0
    assert v["n_pending_tombstones"] == 0


def test_forget_accepts_dataframe_ids(spark, tmp_path):
    """The forget set arrives as a DataFrame (domain-sized at scale —
    no driver materialization); first column is the id whatever its
    name."""
    from etl_job_applify_spark.functions.text_index import (
        text_index_build,
        text_index_stats,
    )
    from etl_job_applify_spark.lifecycle import forget_documents

    docs = _docs(spark)
    tp = str(tmp_path / "text")
    text_index_build(docs, tp)
    ids = docs.filter(F.col("doc_id") % 10 == 1).select(
        F.col("doc_id").alias("whatever")
    )
    out = forget_documents(spark, ids, text_index=tp)
    assert out == {"text": 3}
    assert text_index_stats(spark, tp)["n_docs"] == 27
