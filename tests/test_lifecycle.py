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


def test_graph_forget_updates_every_maintained_stat(spark):
    """A forgotten document's co-occurrence edges must leave EVERY
    maintained graph state — triangle counts, CC labels, k-core
    membership, SCC labels — each bit-identical to a one-shot
    recompute over the remaining edges, and a replayed forget must be
    a no-op (the forget-sweep idempotence contract on the graph
    side)."""
    from etl_job_applify_spark.lifecycle import graph_forget
    from etl_job_applify_spark.operators.components import (
        connected_components,
    )
    from etl_job_applify_spark.operators.kcore import k_core
    from etl_job_applify_spark.operators.scc import (
        strongly_connected_components,
    )
    from etl_job_applify_spark.operators.triangles import (
        TriangleCounts,
        triangle_stats,
    )

    import random as _r

    rng = _r.Random(23)
    und = sorted({
        (min(a, b), max(a, b))
        for _ in range(200)
        for a, b in [(rng.randint(1, 30), rng.randint(1, 30))]
        if a != b
    })
    edges = spark.createDataFrame(und, "a long, b long")
    st = triangle_stats(edges)
    prior = TriangleCounts(st.n_edges, st.n_triangles, st.n_wedges)
    labels = connected_components(edges)
    K = 3
    core = k_core(edges, K)
    dedges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und if b % 2],
        "a long, b long",
    )
    scc = strongly_connected_components(dedges, "a", "b")

    forget = [7, 12]  # doc ids whose every incident edge must leave
    out = graph_forget(
        edges, forget,
        triangle_prior=prior, cc_labels=labels,
        core_nodes=core, core_k=K,
    )
    remain = [(a, b) for a, b in und if a not in forget and b not in forget]
    rem_df = spark.createDataFrame(remain, "a long, b long")
    want_tri = triangle_stats(rem_df)
    assert out["triangles"] == TriangleCounts(
        want_tri.n_edges, want_tri.n_triangles, want_tri.n_wedges
    )
    got_cc = sorted(
        (r["node"], r["component"]) for r in out["cc_labels"].collect()
    )
    want_cc = sorted(
        (r["node"], r["component"])
        for r in connected_components(rem_df).collect()
    )
    assert got_cc == want_cc
    assert all(n not in forget for n, _ in got_cc)
    got_core = sorted(r["node"] for r in out["core_nodes"].collect())
    want_core = sorted(r["node"] for r in k_core(rem_df, K).collect())
    assert got_core == want_core and not set(forget) & set(got_core)

    # directed twin: SCC labels through the same sweep entry point
    out_d = graph_forget(dedges, forget, scc_labels=scc)
    drem = [(a, b) for a, b in dedges.collect()
            if a not in forget and b not in forget]
    want_scc = sorted(
        (r["node"], r["scc"])
        for r in strongly_connected_components(
            spark.createDataFrame(drem, "a long, b long"), "a", "b"
        ).collect()
    )
    got_scc = sorted(
        (r["node"], r["scc"]) for r in out_d["scc_labels"].collect()
    )
    assert got_scc == want_scc
    assert all(n not in forget for n, _ in got_scc)

    # replayed forget: every kernel sees an empty removed set → no-op
    out2 = graph_forget(
        out["remaining_edges"], forget,
        triangle_prior=out["triangles"],
        cc_labels=out["cc_labels"],
        core_nodes=out["core_nodes"], core_k=K,
    )
    assert out2["triangles"] == out["triangles"]
    assert sorted(
        (r["node"], r["component"]) for r in out2["cc_labels"].collect()
    ) == got_cc
    assert sorted(
        r["node"] for r in out2["core_nodes"].collect()
    ) == got_core


def test_one_feed_cdc_crash_between_families_replays_clean(
    spark, tmp_path
):
    """apply_cdc_documents: one op_col feed, one epoch mark, three
    families. A crash AFTER the text family committed but before
    dedup/vector (simulated by applying to text only) is healed by
    redelivering the epoch to all three: text fences the replay out
    whole (None), the missed families catch up, and a third full
    redelivery is a complete no-op — end state identical to one clean
    apply."""
    from etl_job_applify_spark.dedup.incremental import (
        minhash_index_build,
        minhash_index_stats,
    )
    from etl_job_applify_spark.functions.text_index import (
        text_index_build,
        text_index_stats,
    )
    from etl_job_applify_spark.lifecycle import apply_cdc_documents
    from etl_job_applify_spark.similarity.vector_index import (
        vector_index_build,
        vector_index_stats,
    )

    docs = _docs(spark)
    emb = _emb(spark)
    v0 = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        "doc_id",
    )
    tp = str(tmp_path / "text")
    dp = str(tmp_path / "dedup")
    vp = str(tmp_path / "vec")
    text_index_build(v0.select("doc_id", "text"), tp)
    minhash_index_build(v0.select("doc_id", "text"), dp)
    cents = [
        r["embedding"] for r in v0.orderBy("doc_id").limit(4).collect()
    ]
    vector_index_build(
        v0.select("doc_id", "embedding"), vp,
        id_col="doc_id", num_cells=4, centroids=cents,
    )

    feed = spark.createDataFrame(
        [
            (3, None, None, "delete"),
            (7, None, None, "delete"),
            (31, "entirely new text alpha beta", [1.0, 2.0, 3.0, 4.0],
             "add"),
            (5, "rewritten body of five", [0.5, 0.5, 0.5, 0.5], "add"),
        ],
        "doc_id long, text string, embedding array<double>, op string",
    )

    # crash window: only the text family saw the epoch
    first = apply_cdc_documents(
        feed, text_index=tp, epoch_mark="_e1"
    )
    assert first["text"] is not None

    # redelivery to ALL families: text fences, the others catch up
    second = apply_cdc_documents(
        feed, text_index=tp, dedup_index=dp, vector_index=vp,
        epoch_mark="_e1",
    )
    assert second["text"] is None
    assert second["dedup"] is not None and second["vector"] is not None

    # third full redelivery: every family fences
    third = apply_cdc_documents(
        feed, text_index=tp, dedup_index=dp, vector_index=vp,
        epoch_mark="_e1",
    )
    assert all(v is None for v in third.values())

    # end state: 30 - 2 deleted + 1 insert (5 was an upsert) in every
    # family
    assert text_index_stats(spark, tp)["n_docs"] == 29
    assert minhash_index_stats(spark, dp)["n_docs"] == 29
    assert vector_index_stats(spark, vp)["n_vecs"] == 29


def test_streaming_forget_sweep_replay_and_partial_heal(spark, tmp_path):
    """run_forget_stream: a takedown feed tombstones each batch's ids
    out of every family; a FULL redelivery (fresh query, same source)
    leaves identical state (tombstone-set idempotence is the fence);
    a partial sweep (one family missing from the first run) is healed
    by rerunning the stream over all families."""
    import time

    from etl_job_applify_spark.dedup.incremental import (
        minhash_index_build,
        minhash_index_stats,
    )
    from etl_job_applify_spark.functions.text_index import (
        text_index_build,
        text_index_stats,
    )
    from etl_job_applify_spark.similarity.vector_index import (
        vector_index_build,
        vector_index_stats,
    )
    from etl_job_applify_spark.streaming import run_forget_stream

    docs = _docs(spark)
    emb = _emb(spark)
    tp = str(tmp_path / "text")
    dp = str(tmp_path / "dedup")
    vp = str(tmp_path / "vec")
    text_index_build(docs, tp)
    minhash_index_build(docs, dp)
    cents = [r["embedding"] for r in emb.orderBy("vec_id").limit(4).collect()]
    vector_index_build(emb, vp, num_cells=4, centroids=cents)

    src = tmp_path / "takedowns"
    src.mkdir()
    spark.createDataFrame([(3,), (7,)], "doc_id long").coalesce(1) \
        .write.parquet(str(src / "b0.parquet"))
    time.sleep(1.1)
    spark.createDataFrame([(12,), (7,)], "doc_id long").coalesce(1) \
        .write.parquet(str(src / "b1.parquet"))

    def run(**families):
        stream = (
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        run_forget_stream(stream, **families)

    # crash window: the first consumption misses the vector family
    run(text_index=tp, dedup_index=dp)
    assert text_index_stats(spark, tp)["n_docs"] == 27
    assert vector_index_stats(spark, vp)["n_vecs"] == 30  # not yet swept

    # heal: rerun over ALL families — text/dedup no-op, vector catches up
    run(text_index=tp, dedup_index=dp, vector_index=vp)
    st = (
        text_index_stats(spark, tp)["n_docs"],
        minhash_index_stats(spark, dp)["n_docs"],
        vector_index_stats(spark, vp)["n_vecs"],
    )
    assert st == (27, 27, 27)

    # full redelivery: identical state
    run(text_index=tp, dedup_index=dp, vector_index=vp)
    assert (
        text_index_stats(spark, tp)["n_docs"],
        minhash_index_stats(spark, dp)["n_docs"],
        vector_index_stats(spark, vp)["n_vecs"],
    ) == (27, 27, 27)
