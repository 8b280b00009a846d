"""Persisted vector-index query family (similarity/vector_index.py):
the ANN serving lifecycle under the correctness gate.

q232 is the flagship: the FULL lifecycle (found → CAS-append with an
epoch fence → replayed append (fenced no-op) → delete → CAS compaction
→ probe) with an EXACT DuckDB oracle — possible because the coarse
quantizer is pinned to deterministic anchors (the num_cells lowest
vec_ids of the founding corpus, the q146 trick), so cell assignment,
cell probing and the in-cell cosine top-k are all reproducible
relational arithmetic in both engines (shared left-fold dot products).
q233/q234 gate the TRAINED-quantizer paths (exact-cosine and PQ/ADC
serving) with in-query probe ≡ recompute parity assertions plus the
q87/q152 recall harness. q235 re-serves q200's hybrid RRF entirely
from the two persisted indexes (text + vector) under q200's own
oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation
from ..functions.rrf import rrf_fused

from ._util import tbl
from .analytics import _cos_sql
from ..similarity import (
    ann_topk_ivf,
    ann_topk_ivfpq,
    cosine_topk,
    optimize_vector_index,
    vector_index_build,
    vector_index_delete,
    vector_index_probe,
)


def _with_temp_index(spark, builds, probe):
    """Temp-dir lifecycle pattern (q142/q194): build, probe,
    materialize, drop the dir."""
    path = tempfile.mkdtemp(prefix="qvec_idx_") + "/idx"
    try:
        builds(path)
        out = probe(path)
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return local_relation(spark, rows, schema)


def _assert_same(a: DataFrame, b_rows, what: str) -> None:
    if sorted(map(tuple, a.collect())) != sorted(map(tuple, b_rows)):
        raise AssertionError(what)


# --- q232: the exact-oracled vector-index lifecycle ----------------------
# Split: vec_id % 10 != 0 founds the index, % 10 == 0 is the appended
# batch (epoch-fenced, replay re-fired as a no-op), % 10 == 3 is
# GDPR-deleted, queries are vec_ids 1/2/5. Quantizer = the 8 lowest
# founding vec_ids' embeddings, passed explicitly — what makes the
# oracle able to reproduce the cell geometry exactly. nprobe=3 of 8:
# the result is genuinely approximate (cells prune real candidates),
# and the oracle reproduces the approximation bit-for-bit. The probe
# runs before AND after CAS compaction and both must agree.

_Q232_CELLS = 8
_Q232_NPROBE = 3
_Q232_QUERY_IDS = [1, 2, 5]


def q232_vector_index_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    history = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    doomed = emb.filter(F.col("vec_id") % 10 == 3).select(
        F.col("vec_id").alias("vid")
    )
    queries = emb.filter(F.col("vec_id").isin(_Q232_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = [
        r["embedding"]
        for r in history.orderBy("vec_id").limit(_Q232_CELLS).collect()
    ]

    def build(path):
        vector_index_build(
            history, path, num_cells=_Q232_CELLS, centroids=cents
        )
        vector_index_build(
            batch, path, mode="append", epoch_mark="_epoch_q232_1"
        )
        # replay of the committed epoch: fenced no-op
        vector_index_build(
            batch, path, mode="append", epoch_mark="_epoch_q232_1"
        )
        vector_index_delete(spark, path, doomed)

    def probe(path):
        def topk():
            return vector_index_probe(
                spark, path, queries, k=5, nprobe=_Q232_NPROBE
            ).withColumn("rank", F.col("rank").cast("int"))

        before = topk().collect()
        optimize_vector_index(spark, path)  # CAS compaction + prune
        after = topk()
        _assert_same(
            after, before,
            "post-compaction probe diverged from pre-compaction probe",
        )
        return after

    return _with_temp_index(spark, build, probe)


_L2_SQL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(range(1, len({a}) + 1),"
    " i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),"
    " (x, y) -> x + y)"
)

_Q232_SQL = f"""
WITH live AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 3
),
anchors AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS av
  FROM embeddings WHERE vec_id % 10 <> 0
  ORDER BY vec_id LIMIT {_Q232_CELLS}
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT v.vec_id, v.embedding, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_L2_SQL.format(a='v.embedding', b='a.av')}, a.cell
           ) AS rn
    FROM live v CROSS JOIN anchors a
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, _Q232_QUERY_IDS))})
),
qprobe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_L2_SQL.format(a='q.qv', b='a.av')}, a.cell
           ) AS rn
    FROM queries q CROSS JOIN anchors a
  ) WHERE rn <= {_Q232_NPROBE}
),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor,
         {_cos_sql('q.qv', 's.embedding')} AS cosine
  FROM queries q
  JOIN qprobe p ON p.query_id = q.query_id
  JOIN assigned s ON s.cell = p.cell
)
SELECT query_id, neighbor, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor) AS rank
  FROM scored
) WHERE rank <= 5
"""


# --- q238: FILTERED probe under the exact oracle --------------------------
# q232's lifecycle (found with deterministic anchors → epoch-fenced
# append → delete) with a metadata column (lang := vec_id % 3 mapped to
# en/de/fr) stored as a meta_col at founding and a probe filtered with
# where="lang = 'en'". The predicate applies INSIDE the probed cells
# BEFORE top-k (the serving shape of "top-k WHERE lang='en'"), so the
# oracle reproduces it as a WHERE on the scored candidates — a
# post-filter implementation (which returns fewer than k survivors)
# hash-mismatches, as does any meta-column loss across append/delete.

def q238_vector_index_filtered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.col("vec_id") % 3 + 1).cast("int"),
    ).alias("lang")
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", lang
    )
    history = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    doomed = emb.filter(F.col("vec_id") % 10 == 3).select(
        F.col("vec_id").alias("vid")
    )
    queries = emb.filter(F.col("vec_id").isin(_Q232_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = [
        r["embedding"]
        for r in history.orderBy("vec_id").limit(_Q232_CELLS).collect()
    ]

    def build(path):
        vector_index_build(
            history, path, num_cells=_Q232_CELLS, centroids=cents,
            meta_cols=["lang"],
        )
        vector_index_build(batch, path, mode="append")
        vector_index_delete(spark, path, doomed)

    def probe(path):
        return vector_index_probe(
            spark, path, queries, k=5, nprobe=_Q232_NPROBE,
            where="lang = 'en'",
        ).withColumn("rank", F.col("rank").cast("int"))

    return _with_temp_index(spark, build, probe)


_Q238_SQL = f"""
WITH live AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 3
),
anchors AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS av
  FROM embeddings WHERE vec_id % 10 <> 0
  ORDER BY vec_id LIMIT {_Q232_CELLS}
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT v.vec_id, v.embedding, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_L2_SQL.format(a='v.embedding', b='a.av')}, a.cell
           ) AS rn
    FROM live v CROSS JOIN anchors a
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, _Q232_QUERY_IDS))})
),
qprobe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_L2_SQL.format(a='q.qv', b='a.av')}, a.cell
           ) AS rn
    FROM queries q CROSS JOIN anchors a
  ) WHERE rn <= {_Q232_NPROBE}
),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor,
         {_cos_sql('q.qv', 's.embedding')} AS cosine
  FROM queries q
  JOIN qprobe p ON p.query_id = q.query_id
  JOIN assigned s ON s.cell = p.cell
  WHERE s.vec_id % 3 = 0  -- lang = 'en': the predicate INSIDE the cells
)
SELECT query_id, neighbor, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor) AS rank
  FROM scored
) WHERE rank <= 5
"""


# --- q244: ESCALATING filtered probe under the exact oracle ---------------
# The under-return contract: a selective facet (vid % 37 = 5, ~3% of
# the corpus) under-fills k=10 at the base nprobe=1, so
# vector_index_probe(escalate=True) re-probes under-filled queries with
# nprobe doubled (1 → 2 → 4 → 8=full) until they fill or coverage is
# total. The oracle replays the ENTIRE doubling schedule relationally:
# per-stage top-k over the cells ranked <= stage, each query's chosen
# stage = the smallest stage whose result fills k (full coverage if
# none does). A probe that silently returns short (no escalation), or
# one that re-reads already-filled queries at the wrong stage,
# hash-mismatches. Found-only index (escalation is the subject; the
# lifecycle is q232/q238's).

_Q244_STAGES = [1, 2, 4, 8]
_Q244_K = 10


def q244_vector_index_escalated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", (F.col("vec_id") % 37).alias("facet")
    )
    queries = emb.filter(F.col("vec_id").isin(_Q232_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = [
        r["embedding"]
        for r in emb.orderBy("vec_id").limit(_Q232_CELLS).collect()
    ]

    def build(path):
        vector_index_build(
            emb, path, num_cells=_Q232_CELLS, centroids=cents,
            meta_cols=["facet"],
        )

    def probe(path):
        return vector_index_probe(
            spark, path, queries, k=_Q244_K, nprobe=1,
            where="facet = 5", escalate=True,
        ).withColumn("rank", F.col("rank").cast("int"))

    return _with_temp_index(spark, build, probe)


_Q244_SQL = f"""
WITH anchors AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS av
  FROM embeddings ORDER BY vec_id LIMIT {_Q232_CELLS}
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT v.vec_id, v.embedding, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_L2_SQL.format(a='v.embedding', b='a.av')}, a.cell
           ) AS rn
    FROM embeddings v CROSS JOIN anchors a
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, _Q232_QUERY_IDS))})
),
qcells AS (
  SELECT query_id, cell, rn FROM (
    SELECT q.query_id, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_L2_SQL.format(a='q.qv', b='a.av')}, a.cell
           ) AS rn
    FROM queries q CROSS JOIN anchors a
  )
),
stages AS (
  SELECT UNNEST([{", ".join(map(str, _Q244_STAGES))}]) AS stage
),
-- per-stage top-k: the probe's result had escalation stopped there
staged AS (
  SELECT stage, query_id, neighbor, cosine,
         ROW_NUMBER() OVER (PARTITION BY stage, query_id
                            ORDER BY cosine DESC, neighbor) AS rank
  FROM (
    SELECT st.stage, q.query_id, s.vec_id AS neighbor,
           {_cos_sql('q.qv', 's.embedding')} AS cosine
    FROM stages st
    JOIN qcells p ON p.rn <= st.stage
    JOIN queries q ON q.query_id = p.query_id
    JOIN assigned s ON s.cell = p.cell
    WHERE s.vec_id % 37 = 5
  )
),
counts AS (
  SELECT stage, query_id, COUNT(*) AS n FROM staged
  WHERE rank <= {_Q244_K} GROUP BY stage, query_id
),
-- each query stops at the first stage that fills k (full scan if none)
chosen AS (
  SELECT q.query_id,
         COALESCE(
           (SELECT MIN(c.stage) FROM counts c
            WHERE c.query_id = q.query_id AND c.n >= {_Q244_K}),
           {_Q244_STAGES[-1]}
         ) AS stage
  FROM queries q
)
SELECT t.query_id, t.neighbor, t.cosine, CAST(t.rank AS INT) AS rank
FROM staged t JOIN chosen f
  ON t.stage = f.stage AND t.query_id = f.query_id
WHERE t.rank <= {_Q244_K}
"""


# --- q245: bulk kNN JOIN under the exact oracle ----------------------------
# The corpus-vs-index shape (the semantic-dedup feeder): EVERY corpus
# vector queries the index for its 3 nearest OTHER vectors through
# vector_index_knn_join — the cell-keyed shuffle-join path with no
# driver collect of probe cells and no query-side broadcast (the two
# moves vector_index_probe makes that invert at a 100 TB query
# relation). Pinned anchors make cell assignment, per-query probe
# cells, self-exclusion and the in-cell cosine top-k exact relational
# arithmetic, so the oracle replays the whole join bit-for-bit.

_Q245_K = 3
_Q245_NPROBE = 2


def q245_vector_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..similarity import vector_index_knn_join

    emb = tbl(spark, sf_dir, "embeddings")
    cents = [
        r["embedding"]
        for r in emb.orderBy("vec_id").limit(_Q232_CELLS).collect()
    ]

    def build(path):
        vector_index_build(
            emb, path, num_cells=_Q232_CELLS, centroids=cents
        )

    def probe(path):
        return vector_index_knn_join(
            spark, path,
            emb.select(F.col("vec_id").alias("query_id"), "embedding"),
            k=_Q245_K, nprobe=_Q245_NPROBE, exclude_self=True,
        ).withColumn("rank", F.col("rank").cast("int"))

    return _with_temp_index(spark, build, probe)


_Q245_SQL = f"""
WITH anchors AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS av
  FROM embeddings ORDER BY vec_id LIMIT {_Q232_CELLS}
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT v.vec_id, v.embedding, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_L2_SQL.format(a='v.embedding', b='a.av')}, a.cell
           ) AS rn
    FROM embeddings v CROSS JOIN anchors a
  ) WHERE rn = 1
),
qprobe AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qv, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_L2_SQL.format(a='q.embedding', b='a.av')}, a.cell
           ) AS rn
    FROM embeddings q CROSS JOIN anchors a
  ) WHERE rn <= {_Q245_NPROBE}
),
scored AS (
  SELECT p.query_id, s.vec_id AS neighbor,
         {_cos_sql('p.qv', 's.embedding')} AS cosine
  FROM qprobe p
  JOIN assigned s ON s.cell = p.cell
  WHERE s.vec_id <> p.query_id  -- exclude_self: before ranking
)
SELECT query_id, neighbor, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor) AS rank
  FROM scored
) WHERE rank <= {_Q245_K}
"""


# --- q251: bulk kNN join on the COMPRESSED path (ADC/PQ) ------------------
# q245's corpus×corpus shape with use_codes=True: per-(query, probed
# cell) ADC LUTs computed relationally on the exploded query side, a
# cell-keyed shuffle join over STORED CODES (m bytes/vector instead of
# d doubles — the shuffle-bytes cut that makes the semantic-dedup
# feeder compressed end-to-end, SCALING.md), ADC shortlist, exact
# refine over shortlist rows only. Two in-query gates: (1) the bulk
# compressed path is BIT-IDENTICAL to vector_index_probe(use_codes=
# True) on a control-plane query subset (shared LUT/ADC/refine
# expressions, different physical plan); (2) the q87-shaped recall
# floor vs the full-coverage exact join over the whole corpus. The
# oracle pins the verdict row.

_Q251_K = 3


def q251_knn_join_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..similarity import vector_index_knn_join
    from .verification import _recall_at_k_row

    emb = tbl(spark, sf_dir, "embeddings")
    qall = emb.select(F.col("vec_id").alias("query_id"), "embedding")

    def build(path):
        vector_index_build(emb, path, num_cells=16, m=8, k_codes=16)

    def probe(path):
        served = vector_index_knn_join(
            spark, path, qall, k=_Q251_K, nprobe=8,
            use_codes=True, shortlist=64, exclude_self=True,
        )
        sub = qall.filter(F.col("query_id") < 8)
        bulk_sub = vector_index_knn_join(
            spark, path, sub, k=_Q251_K, nprobe=8,
            use_codes=True, shortlist=64,
        )
        probe_sub = vector_index_probe(
            spark, path, sub, k=_Q251_K, nprobe=8,
            use_codes=True, shortlist=64,
        )
        _assert_same(
            bulk_sub, probe_sub.collect(),
            "bulk compressed kNN join diverged from the ADC probe on "
            "the same live index",
        )
        exact = vector_index_knn_join(
            spark, path, qall, k=_Q251_K, nprobe=16, exclude_self=True,
        )
        return _recall_at_k_row(exact, served, min_recall=0.5)

    return _with_temp_index(spark, build, probe)


_Q251_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
FROM embeddings
"""


# --- q240: index observability (DESCRIBE INDEX) under the exact oracle ----
# The ops surface: vector_index_cell_histogram over q232's
# deterministic lifecycle state (pinned anchors, epoch-fenced append,
# tombstoned deletes). The per-cell live-count histogram is pure
# relational arithmetic under pinned anchors, so the oracle replays it
# exactly — any assignment drift, tombstone leak, or meta-column loss
# shifts a count and breaks the hash. vector_index_stats invariants
# (exact logical counter == live rows == histogram total; pending
# tombstones == deleted set; snapshot count == found+append+delete;
# skew >= 1) are asserted in-query.

def q240_vector_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..similarity import (
        vector_index_cell_histogram,
        vector_index_stats,
    )

    emb = tbl(spark, sf_dir, "embeddings")
    history = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    doomed = emb.filter(F.col("vec_id") % 10 == 3).select(
        F.col("vec_id").alias("vid")
    )
    cents = [
        r["embedding"]
        for r in history.orderBy("vec_id").limit(_Q232_CELLS).collect()
    ]
    n_live_expect = emb.filter(F.col("vec_id") % 10 != 3).count()
    n_doomed = doomed.count()

    def build(path):
        vector_index_build(
            history, path, num_cells=_Q232_CELLS, centroids=cents
        )
        vector_index_build(batch, path, mode="append")
        vector_index_delete(spark, path, doomed)

    def probe(path):
        stats = vector_index_stats(spark, path)
        hist = vector_index_cell_histogram(spark, path)
        total = hist.agg(F.sum("n_live")).first()[0]
        ok = (
            stats["n_vecs"] == stats["n_live_rows"] == total
            == n_live_expect
            and stats["n_pending_tombstones"] == n_doomed
            and stats["layout"] == "versioned"
            and stats["live_snapshots"] == 3
            and stats["num_cells"] == _Q232_CELLS
            and stats["cell_skew"] >= 1.0
            and stats["max_cell"]
            == hist.agg(F.max("n_live")).first()[0]
        )
        if not ok:
            raise AssertionError(f"stats invariants failed: {stats}")
        return hist.select(
            F.col("cell").cast("int").alias("cell"),
            F.col("n_live").cast("bigint").alias("n_live"),
        )

    return _with_temp_index(spark, build, probe)


_Q240_SQL = f"""
WITH live AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 3
),
anchors AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS av
  FROM embeddings WHERE vec_id % 10 <> 0
  ORDER BY vec_id LIMIT {_Q232_CELLS}
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_L2_SQL.format(a='v.embedding', b='a.av')}, a.cell
           ) AS rn
    FROM live v CROSS JOIN anchors a
  ) WHERE rn = 1
)
SELECT CAST(cell AS INT) AS cell, CAST(COUNT(*) AS BIGINT) AS n_live
FROM assigned GROUP BY cell
"""


# --- q237: quantizer-drift reindex under the exact oracle -----------------
# q232's lifecycle continued into maintenance: after found + append +
# delete, the index is REINDEXED in place — new deterministic anchors
# (the 6 lowest LIVE vec_ids, a different count than the founding 8,
# so the cell geometry genuinely re-shapes), every live vector
# re-assigned, tombstones purged, one CAS publish. The oracle
# reproduces the POST-reindex geometry relationally: any stale
# assignment, unpurged tombstone, or quantizer round-trip drift
# hash-mismatches.

_Q237_CELLS = 6
_Q237_NPROBE = 2


def q237_vector_index_reindex(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..similarity import reindex_vector_index

    emb = tbl(spark, sf_dir, "embeddings")
    history = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    doomed = emb.filter(F.col("vec_id") % 10 == 3).select(
        F.col("vec_id").alias("vid")
    )
    live = emb.filter(F.col("vec_id") % 10 != 3)
    queries = emb.filter(F.col("vec_id").isin(_Q232_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    founding_cents = [
        r["embedding"]
        for r in history.orderBy("vec_id").limit(_Q232_CELLS).collect()
    ]
    new_cents = [
        r["embedding"]
        for r in live.orderBy("vec_id").limit(_Q237_CELLS).collect()
    ]

    def build(path):
        vector_index_build(
            history, path, num_cells=_Q232_CELLS, centroids=founding_cents
        )
        vector_index_build(batch, path, mode="append")
        vector_index_delete(spark, path, doomed)
        meta = reindex_vector_index(
            spark, path, num_cells=_Q237_CELLS, centroids=new_cents
        )
        if meta["num_cells"] != _Q237_CELLS:
            raise AssertionError("reindex did not re-shape the cells")

    def probe(path):
        return vector_index_probe(
            spark, path, queries, k=5, nprobe=_Q237_NPROBE
        ).withColumn("rank", F.col("rank").cast("int"))

    return _with_temp_index(spark, build, probe)


_Q237_SQL = f"""
WITH live AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 3
),
anchors AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS av
  FROM embeddings WHERE vec_id % 10 <> 3
  ORDER BY vec_id LIMIT {_Q237_CELLS}
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT v.vec_id, v.embedding, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_L2_SQL.format(a='v.embedding', b='a.av')}, a.cell
           ) AS rn
    FROM live v CROSS JOIN anchors a
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, _Q232_QUERY_IDS))})
),
qprobe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, a.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_L2_SQL.format(a='q.qv', b='a.av')}, a.cell
           ) AS rn
    FROM queries q CROSS JOIN anchors a
  ) WHERE rn <= {_Q237_NPROBE}
),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor,
         {_cos_sql('q.qv', 's.embedding')} AS cosine
  FROM queries q
  JOIN qprobe p ON p.query_id = q.query_id
  JOIN assigned s ON s.cell = p.cell
)
SELECT query_id, neighbor, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor) AS rank
  FROM scored
) WHERE rank <= 5
"""


# --- q233: trained-quantizer serving — parity + recall gate ---------------
# The q86/q87 shapes on the PERSISTED index: same corpus split
# (vec_id < 5 are the queries), trained centroids recorded at founding.
# The probe must equal ann_topk_ivf pinned to the RECORDED centroids
# bit-for-bit (asserted in-query — a drifted quantizer round-trip or a
# broken cell read breaks the run), and macro recall@5 vs brute force
# must clear the q87 floor (0.6 on adversarial random vectors; the
# returned row is what the oracle pins).

def _ann_split(spark: SparkSession, sf_dir: str):
    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return corpus, queries


def q233_vector_index_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .verification import _recall_at_k_row
    from ..similarity.vector_index import _live_cells

    corpus, queries = _ann_split(spark, sf_dir)

    def build(path):
        vector_index_build(corpus, path, num_cells=16)

    def probe(path):
        served = vector_index_probe(spark, path, queries, k=5, nprobe=8)
        cents = _live_cells(spark, path)[1]  # the RECORDED quantizer
        recompute = ann_topk_ivf(
            corpus, queries, k=5, num_cells=16, nprobe=8, centroids=cents
        )
        _assert_same(
            served, recompute.collect(),
            "index-served IVF top-k diverged from recompute with the"
            " recorded centroids",
        )
        exact = cosine_topk(corpus, queries, k=5)
        return _recall_at_k_row(exact, served, min_recall=0.6)

    return _with_temp_index(spark, build, probe)


_Q233_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""


# --- q234: PQ/ADC serving from stored codes — parity + recall gate -------
# The q152/q153 shapes on the persisted index: m=8 codes stored at
# ingest, the probe scans the compressed domain (ADC over stored codes
# inside probed cells) and exact-refines the shortlist. Must equal
# ann_topk_ivfpq pinned to the recorded quantizer, and clear the 0.6
# recall floor.

def q234_vector_index_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .verification import _recall_at_k_row
    from ..similarity.vector_index import _live_cells

    corpus, queries = _ann_split(spark, sf_dir)

    def build(path):
        vector_index_build(corpus, path, num_cells=16, m=8, k_codes=16)

    def probe(path):
        served = vector_index_probe(
            spark, path, queries, k=5, nprobe=8,
            use_codes=True, shortlist=128,
        )
        _, cents, books, _offs, _ = _live_cells(spark, path)
        recompute = ann_topk_ivfpq(
            corpus, queries, k=5, num_cells=16, nprobe=8, m=8,
            k_codes=16, shortlist=128, centroids=cents, codebooks=books,
        )
        _assert_same(
            served, recompute.collect(),
            "index-served IVFxPQ top-k diverged from recompute with the"
            " recorded quantizer",
        )
        exact = cosine_topk(corpus, queries, k=5)
        return _recall_at_k_row(exact, served, min_recall=0.6)

    return _with_temp_index(spark, build, probe)


_Q234_SQL = _Q233_SQL


# --- q239: RESIDUAL PQ serving — parity + error + recall gates ------------
# q234's task with pq_encoding="residual" (FAISS IVFADC, mean-offset
# variant): codes quantize each vector's residual from its cell's
# offset, the recorded offsets ride the centroids relation, and the
# probe computes one ADC LUT per (query, probed cell). Three in-query
# gates: (1) index-served ADC top-k equals the recompute kernel pinned
# to the recorded (centroids, codebooks, offsets); (2) the POINT of the
# encoding — mean squared quantization error strictly below plain
# encoding at equal m/k, computed JVM-side (per-row error is
# sum_j min_c LUT[j][c], i.e. each subvector's distance to its nearest
# code); (3) the q87 recall floor, over a 20-query batch (100 pairs --
# the 5-query batch's per-pair noise straddles the floor at sf0.1 with
# nprobe pruning in play). The fixed-shortlist recall IMPROVEMENT
# property is pinned at the fixture SF in tests/test_similarity.py,
# where the margin is wide (0.64 vs 0.40 at shortlist=32); on
# pure-random vectors the recall delta is distribution-dependent, so
# the gate here pins the error reduction (which always holds) rather
# than a knife-edge recall comparison. The oracle pins the verdict
# row.

def q239_pq_residual_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import with_norm
    from ..similarity.ivf import _centroid_assign_expr
    from ..similarity.pq import (
        _adc_lut_expr,
        adc_lut_raw_expr,
        residual_col,
        train_pq_codebooks,
    )
    from ..similarity.vector_index import _live_cells
    from .verification import _recall_at_k_row

    emb = tbl(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 20)
    _ERR = "aggregate(transform(__lut, r -> array_min(r)), 0D, (a, v) -> a + v)"

    def build(path):
        vector_index_build(
            corpus, path, num_cells=16, m=8, k_codes=16,
            pq_encoding="residual",
        )

    def probe(path):
        served = vector_index_probe(
            spark, path, queries, k=5, nprobe=16,
            use_codes=True, shortlist=128,
        )
        _, cents, books_r, offs, _ = _live_cells(spark, path)
        recompute = ann_topk_ivfpq(
            corpus, queries, k=5, num_cells=16, nprobe=16, m=8,
            k_codes=16, shortlist=128, centroids=cents,
            codebooks=books_r, encoding="residual", offsets=offs,
        )
        _assert_same(
            served, recompute.collect(),
            "index-served residual-ADC top-k diverged from recompute"
            " with the recorded quantizer",
        )
        # quantization error at equal m/k: residual must beat plain
        books_p = train_pq_codebooks(corpus, m=8, k=16)
        base = with_norm(corpus.select("embedding"), "embedding")
        err_plain = (
            base.select(_adc_lut_expr("embedding", books_p).alias("__lut"))
            .select(F.expr(_ERR).alias("e"))
            .agg(F.avg("e"))
            .first()[0]
        )
        err_resid = (
            base.withColumn(
                "cell", _centroid_assign_expr("embedding", cents)
            )
            .withColumn("__resid", residual_col("embedding", "cell", offs))
            .select(adc_lut_raw_expr("__resid", books_r).alias("__lut"))
            .select(F.expr(_ERR).alias("e"))
            .agg(F.avg("e"))
            .first()[0]
        )
        if not err_resid < err_plain:
            raise AssertionError(
                f"residual encoding did not cut quantization error: "
                f"residual={err_resid} vs plain={err_plain}"
            )
        exact = cosine_topk(corpus, queries, k=5)
        return _recall_at_k_row(exact, served, min_recall=0.6).withColumn(
            "residual_beats_plain", F.lit(True)
        )

    return _with_temp_index(spark, build, probe)


_Q239_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok,
       true AS residual_beats_plain
FROM embeddings WHERE vec_id < 20
"""


# --- q235: hybrid RRF served from BOTH persisted indexes ------------------
# q200's task — BM25 lexical leg fused with an exact-cosine vector leg
# by reciprocal-rank fusion — re-served entirely from persisted state:
# the text index answers the BM25 leg (bit-identical to the recompute
# kernel, q194's contract) and the vector index answers the cosine leg
# with nprobe >= num_cells (the degenerate-exact probe — equal to
# cosine_topk, tests/test_vector_index.py). The oracle is q200's OWN
# raw-recompute SQL, so any index-side drift in either leg breaks the
# hash. The steady-state RAG serving shape: zero corpus-sized work at
# query time beyond the pruned index reads.

def q235_hybrid_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text_index import text_index_bm25, text_index_build
    from .textops import _Q190_QUERIES

    K_TOP, LEG_L = 10, 20
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    emb = tbl(spark, sf_dir, "embeddings")
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )
    anchors = emb.filter(
        F.col("vec_id").isin([qid for qid, _ in _Q190_QUERIES])
    ).select(F.col("vec_id").alias("query_id"), "embedding")

    tdir = tempfile.mkdtemp(prefix="qrrf_idx_")
    try:
        tpath, vpath = f"{tdir}/text", f"{tdir}/vec"
        text_index_build(docs, tpath)          # versioned default
        vector_index_build(emb, vpath, num_cells=16)
        w_lex = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        lex = (
            text_index_bm25(spark, tpath, qterms)
            .withColumn("lex_rank", F.row_number().over(w_lex))
            .filter(F.col("lex_rank") <= LEG_L)
            .select("qid", "doc_id", "lex_rank")
        )
        vec = vector_index_probe(
            spark, vpath, anchors, k=LEG_L, nprobe=999
        ).select(
            F.col("query_id").cast("int").alias("qid"),
            F.col("neighbor").alias("doc_id"),
            F.col("rank").cast("int").alias("vec_rank"),
        )
        fused = rrf_fused(lex, vec)  # union+agg == full-outer (functions/rrf.py)
        w_f = Window.partitionBy("qid").orderBy(
            F.desc("rrf_score"), F.asc("doc_id")
        )
        out = (
            fused.withColumn("rrf_rank", F.row_number().over(w_f))
            .filter(F.col("rrf_rank") <= K_TOP)
            .select("qid", "doc_id", "rrf_rank", "rrf_score",
                    "lex_rank", "vec_rank")
        )
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return local_relation(spark, rows, schema)


# --- q246: FACETED hybrid RRF served from BOTH persisted indexes ----------
# q235's fusion with q243's facet on the text leg AND q238's facet on
# the vector leg: both indexes are built with meta_cols=["lang"] and
# both probes carry where="lang = 'en'" (lang := id % 3 mapped to
# en/de/fr on each table, so the facet is the same logical predicate
# across the two id domains). The lexical leg keeps corpus-wide BM25
# stats (faceted-search semantics, q243's contract); the vector leg
# runs full-coverage (nprobe=999) so the filtered probe equals exact
# filtered cosine — which is what makes the whole fused result exactly
# SQL-expressible. The oracle replays the facet on both legs; a
# post-filter on either leg (short lists before fusion) reshuffles RRF
# ranks and hash-mismatches.

def q246_hybrid_rrf_faceted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text_index import text_index_bm25, text_index_build
    from .textops import _Q190_QUERIES

    K_TOP, LEG_L = 10, 20

    def _lang(col):
        return F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col(col) % 3 + 1).cast("int"),
        ).alias("lang")

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "text", _lang("doc_id")
    )
    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _lang("vec_id")
    )
    qterms = local_relation(spark, 
        [(qid, w) for qid, ws in _Q190_QUERIES for w in ws],
        "qid int, word string",
    )
    anchors = emb.filter(
        F.col("vec_id").isin([qid for qid, _ in _Q190_QUERIES])
    ).select(F.col("vec_id").alias("query_id"), "embedding")

    tdir = tempfile.mkdtemp(prefix="qrrf_facet_")
    try:
        tpath, vpath = f"{tdir}/text", f"{tdir}/vec"
        text_index_build(docs, tpath, meta_cols=["lang"])
        vector_index_build(
            emb, vpath, num_cells=16, meta_cols=["lang"]
        )
        w_lex = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        lex = (
            text_index_bm25(spark, tpath, qterms, where="lang = 'en'")
            .withColumn("lex_rank", F.row_number().over(w_lex))
            .filter(F.col("lex_rank") <= LEG_L)
            .select("qid", "doc_id", "lex_rank")
        )
        vec = vector_index_probe(
            spark, vpath, anchors, k=LEG_L, nprobe=999,
            where="lang = 'en'",
        ).select(
            F.col("query_id").cast("int").alias("qid"),
            F.col("neighbor").alias("doc_id"),
            F.col("rank").cast("int").alias("vec_rank"),
        )
        fused = rrf_fused(lex, vec)  # union+agg == full-outer (functions/rrf.py)
        w_f = Window.partitionBy("qid").orderBy(
            F.desc("rrf_score"), F.asc("doc_id")
        )
        out = (
            fused.withColumn("rrf_rank", F.row_number().over(w_f))
            .filter(F.col("rrf_rank") <= K_TOP)
            .select("qid", "doc_id", "rrf_rank", "rrf_score",
                    "lex_rank", "vec_rank")
        )
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q246_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, word
),
dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
dfreq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
q(qid, word) AS (VALUES
  (1, 'hash'), (1, 'join'),
  (2, 'window'), (2, 'sort'), (2, 'merge'),
  (3, 'stream'), (3, 'batch'), (3, 'spark')
),
scored AS (
  SELECT q.qid, tf.doc_id,
    CAST(SUM(CAST(
      ((n - df + 5e-1) / (df + 5e-1))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl))
    AS DECIMAL(28,6))) AS DOUBLE) AS score
  FROM q
  JOIN tf USING (word)
  JOIN dfreq USING (word)
  JOIN dl USING (doc_id), stats
  WHERE tf.doc_id % 3 = 0  -- lang = 'en' facet; stats stay corpus-wide
  GROUP BY q.qid, tf.doc_id
),
lex AS (
  SELECT qid, doc_id, CAST(rnk AS INT) AS lex_rank FROM (
    SELECT qid, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY score DESC, doc_id
           ) AS rnk
    FROM scored
  ) WHERE rnk <= 20
),
anchors AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings
  WHERE vec_id IN (1, 2, 3)
),
cos AS (
  SELECT a.qid, e.vec_id AS doc_id,
         (list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (x, y) -> x + y)) / ((sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))), (x, y) -> x + y))) * (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len(e.embedding) + 1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (x, y) -> x + y)))) AS cosine
  FROM embeddings e, anchors a
  WHERE e.vec_id % 3 = 0  -- lang = 'en' facet on the vector leg
),
vec AS (
  SELECT CAST(qid AS INT) AS qid, doc_id, CAST(rnk AS INT) AS vec_rank
  FROM (
    SELECT qid, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY cosine DESC, doc_id
           ) AS rnk
    FROM cos
  ) WHERE rnk <= 20
),
fused AS (
  SELECT COALESCE(lex.qid, vec.qid) AS qid,
         COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         lex.lex_rank, vec.vec_rank,
         coalesce(1e0 / (60 + lex.lex_rank), 0e0)
           + coalesce(1e0 / (60 + vec.vec_rank), 0e0) AS rrf_score
  FROM lex FULL OUTER JOIN vec
    ON lex.qid = vec.qid AND lex.doc_id = vec.doc_id
)
SELECT qid, doc_id, CAST(rrf_rank AS INT) AS rrf_rank, rrf_score,
       lex_rank, vec_rank
FROM (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY rrf_score DESC, doc_id
         ) AS rrf_rank
  FROM fused
)
WHERE rrf_rank <= 10
"""


QUERIES = {
    "q232_vector_index_lifecycle": q232_vector_index_lifecycle,
    "q233_vector_index_recall": q233_vector_index_recall,
    "q234_vector_index_pq": q234_vector_index_pq,
    "q235_hybrid_rrf_indexed": q235_hybrid_rrf_indexed,
    "q237_vector_index_reindex": q237_vector_index_reindex,
    "q238_vector_index_filtered": q238_vector_index_filtered,
    "q239_pq_residual_serving": q239_pq_residual_serving,
    "q240_vector_index_stats": q240_vector_index_stats,
    "q244_vector_index_escalated": q244_vector_index_escalated,
    "q245_vector_knn_join": q245_vector_knn_join,
    "q251_knn_join_adc": q251_knn_join_adc,
    "q246_hybrid_rrf_faceted": q246_hybrid_rrf_faceted,
}


def _q200_sql():
    from .textops import _Q200_SQL

    return _Q200_SQL


ORACLE = {
    # the lifecycle is EXACTLY reproducible: deterministic anchors make
    # assignment, probing and in-cell top-k pure relational arithmetic
    "q232_vector_index_lifecycle": _Q232_SQL,
    # the post-reindex geometry is exactly reproducible the same way
    "q237_vector_index_reindex": _Q237_SQL,
    # the filtered probe is the q232 arithmetic plus a WHERE inside the
    # probed cells (lang derives from vec_id, so SQL replays it exactly)
    "q238_vector_index_filtered": _Q238_SQL,
    # parity is asserted in-query; the oracle pins the recall row
    "q233_vector_index_recall": _Q233_SQL,
    "q234_vector_index_pq": _Q234_SQL,
    # parity + quantization-error + recall asserted in-query; the
    # oracle pins the verdict row
    "q239_pq_residual_serving": _Q239_SQL,
    # the cell histogram is exact relational arithmetic under pinned
    # anchors; stats invariants asserted in-query
    "q240_vector_index_stats": _Q240_SQL,
    "q244_vector_index_escalated": _Q244_SQL,
    "q245_vector_knn_join": _Q245_SQL,
    "q251_knn_join_adc": _Q251_SQL,
    # both faceted legs replayed in SQL (facet inside each leg, stats
    # corpus-wide on the lexical leg, full-coverage exact vector leg)
    "q246_hybrid_rrf_faceted": _Q246_SQL,
    # both legs served from persisted indexes must equal the raw
    # recompute: the oracle IS q200's
    "q235_hybrid_rrf_indexed": _q200_sql(),
}


# --- q272: CDC apply on the vector index ≡ q232's lifecycle ----------------
# q232's found → append → delete lifecycle replayed through ONE atomic
# CDC snapshot (similarity/vector_index.py vector_index_apply_cdc —
# adds + tombstones + net count + epoch fence in one CAS commit, the
# text index's q-CDC contract on the embedding family): the oracle is
# q232's exact SQL, so the gate proves the CDC path reaches the
# identical served state; the in-query asserts pin whole-batch replay
# invariance (the same epoch applied twice is a fenced no-op with a
# bit-identical probe).

def q272_vector_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..similarity import vector_index_apply_cdc

    emb = tbl(spark, sf_dir, "embeddings")
    history = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id").isin(_Q232_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = [
        r["embedding"]
        for r in history.orderBy("vec_id").limit(_Q232_CELLS).collect()
    ]
    cdc = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", "embedding", F.lit("add").alias("op"))
        .unionByName(
            emb.filter(F.col("vec_id") % 10 == 3).select(
                "vec_id",
                F.lit(None).cast(emb.schema["embedding"].dataType)
                .alias("embedding"),
                F.lit("delete").alias("op"),
            )
        )
    )

    def build(path):
        vector_index_build(
            history, path, num_cells=_Q232_CELLS, centroids=cents
        )
        vector_index_apply_cdc(cdc, path, epoch_mark="_epoch_q272_1")

    def probe(path):
        def topk():
            return vector_index_probe(
                spark, path, queries, k=5, nprobe=_Q232_NPROBE
            ).withColumn("rank", F.col("rank").cast("int"))

        before = topk().collect()
        # whole-batch replay: fenced no-op, probe bit-identical
        if vector_index_apply_cdc(
            cdc, path, epoch_mark="_epoch_q272_1"
        ) is not None:
            raise AssertionError("replayed CDC epoch was not fenced")
        after = topk()
        _assert_same(
            after, before,
            "post-replay probe diverged from pre-replay probe",
        )
        return after

    return _with_temp_index(spark, build, probe)


QUERIES["q272_vector_cdc"] = q272_vector_cdc
# CDC path ≡ lifecycle path: the oracle is q232's exact SQL
ORACLE["q272_vector_cdc"] = _Q232_SQL
