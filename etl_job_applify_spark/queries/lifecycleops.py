"""Cross-family lifecycle queries: the forget sweep (q267).

The reference has no index surface at all (SURVEY.md §2; reference
core is an EL job, ``services/*.py``); the three persisted index
families are this engine's north-star serving layer, and this module
gates the one lifecycle operation that must span ALL of them at once:
removing a document everywhere (takedown / opt-out / contamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation

from ._util import tbl

QUERIES: dict = {}
ORACLE: dict = {}


# --- q267: the cross-family forget sweep -----------------------------------
# Build all three index families over the same corpus, forget the
# doomed id set ONCE through lifecycle.forget_documents, and prove the
# whole contract with exact integers:
#   - per-family tombstone counts on the first sweep (= the doomed
#     docs each family actually held),
#   - ZERO on the second sweep (idempotence — the crash-recovery
#     re-run must be a no-op),
#   - live counts from each family's DESCRIBE-INDEX stats after the
#     sweep (text/dedup: corpus minus doomed; vector: embeddings
#     minus doomed — the vector family legitimately holds a subset
#     of the id space at some SFs),
#   - a served probe per family with ZERO doomed ids surfacing
#     (BM25 top-5, exhaustive-nprobe ANN top-5, MinHash near-dup
#     candidates from live probe docs),
#   - stats unchanged by the optimize (compaction) sweep — space
#     reclaim must not change what is served.
# Every output column is replayable by the oracle from documents /
# embeddings alone, so the gate pins the sweep end to end.

def q267_forget_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..dedup.incremental import (
        minhash_index_build,
        minhash_index_probe,
        minhash_index_stats,
    )
    from ..functions.text_index import (
        text_index_bm25,
        text_index_build,
        text_index_stats,
    )
    from ..lifecycle import forget_documents
    from ..similarity.vector_index import (
        vector_index_build,
        vector_index_probe,
        vector_index_stats,
    )
    from .textops import _Q190_QUERIES

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    emb = tbl(spark, sf_dir, "embeddings")
    doomed = docs.filter(F.col("doc_id") % 7 == 2).select(
        F.col("doc_id").cast("bigint").alias("doc")
    )
    root = tempfile.mkdtemp(prefix="q267_forget_")
    tp, dp, vp = f"{root}/text", f"{root}/dedup", f"{root}/vec"
    try:
        text_index_build(docs, tp)
        minhash_index_build(docs, dp)
        cents = [
            r["embedding"]
            for r in emb.orderBy("vec_id").limit(8).collect()
        ]
        vector_index_build(emb, vp, num_cells=8, centroids=cents)

        sweep1 = forget_documents(
            spark, doomed, text_index=tp, dedup_index=dp, vector_index=vp
        )
        # idempotence: the crash-recovery re-run tombstones nothing new
        sweep2 = forget_documents(
            spark, doomed, text_index=tp, dedup_index=dp, vector_index=vp
        )
        if any(sweep2.values()):
            raise AssertionError(f"forget sweep not idempotent: {sweep2}")

        # --- served probes: no family may surface a doomed id -------
        qterms = local_relation(spark, 
            [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
            "qid int, word string",
        )
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        text_served = (
            text_index_bm25(spark, tp, qterms)
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select(F.col("doc_id").cast("bigint").alias("id"))
        )
        vec_queries = emb.filter(
            F.col("vec_id").isin([1, 8, 15])
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        # nprobe == num_cells: exhaustive over the live corpus — the
        # strictest serve (any tombstone leak anywhere would surface)
        vec_served = vector_index_probe(
            spark, vp, vec_queries, k=5, nprobe=8
        ).select(F.col("neighbor").cast("bigint").alias("id"))
        probe_docs = docs.filter(
            (F.col("doc_id") % 11 == 5) & (F.col("doc_id") % 7 != 2)
        )
        dd_pairs = minhash_index_probe(
            spark, dp, probe_docs, history=docs
        )
        dd_served = dd_pairs.select(
            F.col("a").cast("bigint").alias("id")
        ).union(dd_pairs.select(F.col("b").cast("bigint").alias("id")))
        served = (
            text_served.union(vec_served).union(dd_served)
        )
        doomed_served = served.join(
            doomed.withColumnRenamed("doc", "id"), "id", "semi"
        ).count()

        t_stats = text_index_stats(spark, tp)
        d_stats = minhash_index_stats(spark, dp)
        v_stats = vector_index_stats(spark, vp)

        # space reclaim (compaction across all three families) must
        # not change live counts — or what is served
        forget_documents(
            spark,
            doomed,
            text_index=tp,
            dedup_index=dp,
            vector_index=vp,
            optimize=True,
        )
        t2 = text_index_stats(spark, tp)
        d2 = minhash_index_stats(spark, dp)
        v2 = vector_index_stats(spark, vp)
        if (t2["n_docs"], d2["n_docs"], v2["n_vecs"]) != (
            t_stats["n_docs"], d_stats["n_docs"], v_stats["n_vecs"]
        ):
            raise AssertionError("compaction changed live counts")
        if (
            t2["n_pending_tombstones"]
            or d2["n_pending_tombstones"]
            or v2["n_pending_tombstones"]
        ):
            raise AssertionError("compaction left tombstones pending")

        return local_relation(spark, 
            [(
                sweep1["text"], sweep1["dedup"], sweep1["vector"],
                sweep2["text"], sweep2["dedup"], sweep2["vector"],
                int(t_stats["n_docs"]), int(d_stats["n_docs"]),
                int(v_stats["n_vecs"]), doomed_served,
            )],
            "text_tomb bigint, dedup_tomb bigint, vec_tomb bigint,"
            " text_retomb bigint, dedup_retomb bigint,"
            " vec_retomb bigint, text_live bigint, dedup_live bigint,"
            " vec_live bigint, doomed_served bigint",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_Q267_SQL = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
    WHERE doc_id % 7 = 2) AS text_tomb,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
    WHERE doc_id % 7 = 2) AS dedup_tomb,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
    WHERE vec_id % 7 = 2) AS vec_tomb,
  CAST(0 AS BIGINT) AS text_retomb,
  CAST(0 AS BIGINT) AS dedup_retomb,
  CAST(0 AS BIGINT) AS vec_retomb,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
    WHERE doc_id % 7 <> 2) AS text_live,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
    WHERE doc_id % 7 <> 2) AS dedup_live,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
    WHERE vec_id % 7 <> 2) AS vec_live,
  CAST(0 AS BIGINT) AS doomed_served
"""


QUERIES["q267_forget_sweep"] = q267_forget_sweep
ORACLE["q267_forget_sweep"] = _Q267_SQL


# --- q268: quality-aware canonical selection ------------------------------
# The dedup-cluster policy a real training pipeline runs: within each
# near-dup cluster keep the HIGHEST-QUALITY member, not the min id.
# q60/q69 fixed the canonical as the min doc_id (the label the CC
# kernel computes anyway); here the canonical is argmax of the q40
# composite quality score (quality DESC, doc_id ASC tiebreak — the
# score arithmetic is single IEEE divisions/multiplies, bit-equal
# cross-engine, the q40 precedent). Output: one row per non-trivial
# cluster with its min-id label, its chosen canonical, the member
# count, and whether the policy diverged from min-id — all exactly
# replayable by the oracle (q60's recursive-CTE clustering + the q40
# score + the same window).

def q268_canonical_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..dedup.jaccard import ngram_jaccard_pairs
    from ..functions.text import quality_score_expr
    from ..operators.components import connected_components

    docs = tbl(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("a", "b")
    comp = connected_components(pairs)
    scored = docs.select(
        F.col("doc_id").alias("node"),
        quality_score_expr("text").alias("q"),
    )
    m = comp.join(scored, "node")
    w = Window.partitionBy("component").orderBy(
        F.desc("q"), F.asc("node")
    )
    best = (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("node").alias("canon_doc"),
            F.col("q").alias("canon_quality"),
        )
    )
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    return (
        best.join(sizes, "component")
        .select(
            F.col("component").cast("bigint").alias("component"),
            F.col("canon_doc").cast("bigint").alias("canon_doc"),
            "canon_quality",
            "n_members",
            (F.col("canon_doc") != F.col("component")).alias(
                "diverged_from_min_id"
            ),
        )
        .orderBy("component")
    )


_Q268_SQL = """
WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM tok WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS c
  FROM sh s1 JOIN sh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a, b FROM common
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE c / (sa.sz + sb.sz - c) >= 0.5
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach AS (
  SELECT u AS node, v AS r FROM edges
  UNION
  SELECT reach.node, edges.v FROM reach JOIN edges ON reach.r = edges.u
),
comp AS (
  SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node
),
scored AS (
  SELECT doc_id AS node,
         least(len(string_split(text, ' ')) / 100.0, 1.0)
           * (len(list_distinct(string_split(text, ' ')))
              / len(string_split(text, ' '))) AS q
  FROM documents
),
ranked AS (
  SELECT c.component, c.node, s.q,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY s.q DESC, c.node ASC) AS rn
  FROM comp c JOIN scored s ON s.node = c.node
),
sz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
       FROM comp GROUP BY component)
SELECT CAST(r.component AS BIGINT) AS component,
       CAST(r.node AS BIGINT) AS canon_doc,
       r.q AS canon_quality,
       sz.n_members,
       r.node <> r.component AS diverged_from_min_id
FROM ranked r JOIN sz ON sz.component = r.component
WHERE r.rn = 1
ORDER BY component
"""


QUERIES["q268_canonical_selection"] = q268_canonical_selection
ORACLE["q268_canonical_selection"] = _Q268_SQL


# --- q278: ONE change feed drives all three index families ------------------
# The composition SCALING.md promised and nothing previously pinned:
# the three *_apply_cdc operators share one CDC contract (adds are
# upserts, deletes tombstone, one fenced CAS snapshot per family), so
# a SINGLE op_col change relation — here the versioned corpus table's
# own change feed (sinks/changes.py table_changes →
# changes_to_cdc) — applies to text, dedup, AND vector serving in one
# call under ONE epoch mark (lifecycle.apply_cdc_documents). The
# scenario: corpus v0 founds all three families; v1 inserts the
# held-out docs, deletes a takedown set, and rewrites a revision set;
# the diff of the two snapshots IS the feed. Updates need no special
# op — this round's upsert semantics make an add of a live id replace
# it, so an update is exactly its postimage add. Pinned invariants:
# feed op counts, per-family live counts after ONE apply, a full
# replay of the same epoch fenced out whole (every family returns
# None), and zero deleted ids served by BM25. Every output column is
# replayable by the oracle from documents/embeddings alone.

def q278_cdc_one_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..dedup.incremental import (
        minhash_index_build,
        minhash_index_stats,
    )
    from ..functions.text_index import (
        text_index_bm25,
        text_index_build,
        text_index_stats,
    )
    from ..lifecycle import apply_cdc_documents
    from ..similarity.vector_index import (
        vector_index_build,
        vector_index_stats,
    )
    from ..sinks.changes import changes_to_cdc, table_changes
    from ..sinks.versioned import write_version

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    emb = tbl(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    full = docs.join(emb, "doc_id", "left")
    v0 = full.filter(F.col("doc_id") % 4 != 3)
    v1 = full.filter(F.col("doc_id") % 7 != 2).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 9 == 4, F.concat("text", F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    root = tempfile.mkdtemp(prefix="q278_cdc_")
    corpus, tp, dp, vp = (
        f"{root}/corpus", f"{root}/text", f"{root}/dedup", f"{root}/vec"
    )
    try:
        write_version(v0, corpus)                      # version 1
        text_index_build(v0.select("doc_id", "text"), tp)
        minhash_index_build(v0.select("doc_id", "text"), dp)
        vec0 = v0.filter(F.col("embedding").isNotNull()).select(
            "doc_id", "embedding"
        )
        cents = [
            r["embedding"]
            for r in vec0.orderBy("doc_id").limit(8).collect()
        ]
        vector_index_build(
            vec0, vp, id_col="doc_id", num_cells=8, centroids=cents
        )
        write_version(v1, corpus)                      # version 2

        feed = changes_to_cdc(
            table_changes(spark, corpus, 1, 2, keys=["doc_id"])
        ).localCheckpoint()
        n_adds = feed.filter(F.col("op") == "add").count()
        n_deletes = feed.filter(F.col("op") == "delete").count()

        res = apply_cdc_documents(
            feed, text_index=tp, dedup_index=dp, vector_index=vp,
            epoch_mark="_epoch_feed_1",
        )
        if any(v is None for v in res.values()):
            raise AssertionError(f"first apply unexpectedly fenced: {res}")
        # full redelivery of the same epoch: every family fences whole
        res2 = apply_cdc_documents(
            feed, text_index=tp, dedup_index=dp, vector_index=vp,
            epoch_mark="_epoch_feed_1",
        )
        replay_fenced = all(v is None for v in res2.values())

        # no deleted id may serve (BM25 over every corpus word —
        # exhaustive in the deleted docs' own tokens)
        deleted = v0.join(v1, "doc_id", "left_anti").select(
            F.col("doc_id").alias("doc")
        )
        qterms = local_relation(spark, 
            [(1, "alpha"), (1, "beta"), (2, "common")],
            "qid int, word string",
        ).union(
            deleted.join(
                docs, deleted["doc"] == docs["doc_id"]
            ).select(
                F.lit(3).alias("qid"),
                F.explode(F.split("text", " ")).alias("word"),
            ).distinct().limit(50)
        )
        scored = text_index_bm25(spark, tp, qterms)
        deleted_served = scored.join(
            deleted, scored["doc_id"] == deleted["doc"], "left_semi"
        ).count()

        return local_relation(spark, 
            [(
                n_adds, n_deletes,
                int(text_index_stats(spark, tp)["n_docs"]),
                int(minhash_index_stats(spark, dp)["n_docs"]),
                int(vector_index_stats(spark, vp)["n_vecs"]),
                deleted_served, bool(replay_fenced),
            )],
            "n_adds bigint, n_deletes bigint, text_live bigint,"
            " dedup_live bigint, vec_live bigint,"
            " deleted_served bigint, replay_fenced boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_Q278_SQL = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
    WHERE doc_id % 7 <> 2
      AND (doc_id % 4 = 3 OR doc_id % 9 = 4)) AS n_adds,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
    WHERE doc_id % 4 <> 3 AND doc_id % 7 = 2) AS n_deletes,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
    WHERE doc_id % 7 <> 2) AS text_live,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
    WHERE doc_id % 7 <> 2) AS dedup_live,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id
    WHERE d.doc_id % 7 <> 2) AS vec_live,
  CAST(0 AS BIGINT) AS deleted_served,
  TRUE AS replay_fenced
"""

QUERIES["q278_cdc_one_feed"] = q278_cdc_one_feed
ORACLE["q278_cdc_one_feed"] = _Q278_SQL
