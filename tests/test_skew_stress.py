"""Skew stress: the dedup stack vs a boilerplate-polluted corpus.

The 100 TB failure mode for fuzzy dedup is not volume, it's SKEW: one
boilerplate fragment (cookie banner, license header, template footer)
shared by a large slice of the corpus turns shingle/bucket joins
quadratic. These tests INJECT that pathology — a fixed 12-token
boilerplate appended to 10% of the sf0.1 documents (~500 docs sharing
~10 hot shingles) — and assert the capped paths complete within a wall
budget AND still find the genuine near-dup pairs.

Without the caps the hot shingle alone contributes ~500²/2 ≈ 125k join
rows per shingle (~1.2M extra pairs); with them the hot groups are
dropped before any pair is generated, so runtime stays proportional to
the clean corpus. Timing notes live in SCALING.md.
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from etl_job_applify_spark.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from etl_job_applify_spark.queries._util import tbl

SF_DIR = "/root/testdata/sf0.1"

#: generous wall budgets (local[4] CI box, cold plans); the point is
#: "linear-ish", not microbenchmarks — the uncapped quadratic path blows
#: far past these on the same box
JACCARD_BUDGET_S = 90.0
MINHASH_BUDGET_S = 150.0

BOILERPLATE = (
    " this document is provided as is without warranty of any kind"
    " please review the attached terms carefully"
)


def _skewed_docs(spark):
    docs = tbl(spark, SF_DIR, "documents").select("doc_id", "text")
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(BOILERPLATE))
        ).otherwise(F.col("text")),
    )


@pytest.fixture(scope="module")
def clean_pairs(spark):
    """Ground truth on the CLEAN corpus: the planted near-dup pairs."""
    rows = (
        ngram_jaccard_pairs(
            tbl(spark, SF_DIR, "documents"), threshold=0.8, max_doc_freq=50
        )
        .select("a", "b")
        .collect()
    )
    return {(r.a, r.b) for r in rows}


def test_capped_jaccard_survives_boilerplate_skew(spark, clean_pairs):
    skewed = _skewed_docs(spark)
    t0 = time.perf_counter()
    pairs = {
        (r.a, r.b)
        for r in ngram_jaccard_pairs(skewed, threshold=0.8, max_doc_freq=50)
        .select("a", "b")
        .collect()
    }
    elapsed = time.perf_counter() - t0
    assert elapsed < JACCARD_BUDGET_S, f"capped jaccard took {elapsed:.1f}s"
    # the boilerplate's hot shingles are dropped by the cap on BOTH the
    # clean and skewed runs, so the planted high-jaccard pairs survive.
    # (Appending 12 tokens to a member of a pair shifts its jaccard
    # slightly — allow a small recall slack for pairs near the 0.8 line.)
    assert clean_pairs, "fixture corpus should contain planted pairs"
    recovered = len(clean_pairs & pairs) / len(clean_pairs)
    assert recovered >= 0.8, f"recall vs clean ground truth {recovered:.2f}"


def test_capped_minhash_survives_boilerplate_skew(spark, clean_pairs):
    skewed = _skewed_docs(spark)
    t0 = time.perf_counter()
    pairs = {
        (r.a, r.b)
        for r in minhash_lsh_pairs(
            skewed,
            num_hashes=64,
            bands=16,
            threshold=0.8,
            verify=True,
            max_bucket_size=64,
        )
        .select("a", "b")
        .collect()
    }
    elapsed = time.perf_counter() - t0
    assert elapsed < MINHASH_BUDGET_S, f"capped minhash took {elapsed:.1f}s"
    recovered = len(clean_pairs & pairs) / len(clean_pairs)
    # LSH recall (q76 pins >= 0.9 clean) minus boilerplate jitter
    assert recovered >= 0.7, f"recall vs clean ground truth {recovered:.2f}"


def test_bucket_cap_drops_hot_buckets_only(spark):
    """Structural check at sf0.001 (fast): when boilerplate DOMINATES
    every doc (a template corpus: 3 unique tokens + the shared footer),
    uncapped banding produces a near-quadratic candidate set while the
    capped path collapses it by orders of magnitude."""
    docs = tbl(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        F.concat(
            F.array_join(F.slice(F.split("text", " "), 1, 3), " "),
            F.lit(BOILERPLATE),
        ).alias("text"),
    )
    n_docs = docs.count()
    uncapped = minhash_lsh_pairs(
        docs, num_hashes=16, bands=4, verify=False
    ).count()
    capped = minhash_lsh_pairs(
        docs, num_hashes=16, bands=4, verify=False, max_bucket_size=8
    ).count()
    # boilerplate dominates short docs' signatures: near-quadratic blowup
    assert uncapped > n_docs * 5
    assert capped < uncapped / 10


def test_triangle_orientation_neutralizes_hub_fanout(spark):
    """q167's degree-ordered orientation under a hub: a node connected
    to EVERYONE must end up with (near-)zero out-degree — every edge
    points INTO the highest-(degree, id) endpoint — so the wedge join's
    per-key fanout stays bounded by the sqrt(|E|) spokes, not by the
    hub's degree. An id-ordered orientation (a < b) would instead give
    a low-id hub out-degree = |V| and a quadratic wedge blow-up."""
    n = 400
    hub = 0
    # hub ↔ everyone, plus a sparse ring among the spokes
    edges = [(hub, v) for v in range(1, n)] + [
        (v, v % (n - 1) + 1) for v in range(1, n)
    ]
    pairs = (
        spark.createDataFrame(edges, "x long, y long")
        .selectExpr("least(x, y) AS a", "greatest(x, y) AS b")
        .filter("a <> b")
        .distinct()
    )
    deg = (
        pairs.selectExpr("a AS v")
        .unionAll(pairs.selectExpr("b AS v"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    e = (
        pairs.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
        .selectExpr(
            "CASE WHEN da < db OR (da = db AND a < b)"
            " THEN named_struct('src', a, 'dst', b)"
            " ELSE named_struct('src', b, 'dst', a) END AS e"
        )
        .select("e.src", "e.dst")
    )
    out_deg = {r["src"]: r["n"] for r in e.groupBy("src").agg(
        F.count("*").alias("n")).collect()}
    # the hub has the max degree -> receives every one of its edges
    assert out_deg.get(hub, 0) == 0
    # and no node's wedge fanout is hub-sized
    assert max(out_deg.values()) <= 5


def test_knn_join_hot_cell_completes_and_is_correct(spark):
    """Bulk kNN join vs a pathologically hot cell: 90% of the corpus
    collapses into ONE quantizer cell (drifted corpus, frozen founding
    quantizer — the worst case the auto-reindex policy exists to fix).
    The cell-keyed shuffle join must still complete inside a wall
    budget AND return results bit-identical to the per-query probe on
    the same index (the parity contract is skew-independent)."""
    from etl_job_applify_spark.similarity import (
        vector_index_build,
        vector_index_knn_join,
        vector_index_probe,
    )
    import tempfile

    dim = 8
    # 900 vectors tightly clustered (one hot cell) + 100 spread
    rows = []
    for i in range(900):
        rows.append(
            (i, [5.0 + float((i * 3 + j) % 7) / 100.0 for j in range(dim)])
        )
    for i in range(900, 1000):
        rows.append(
            (i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(dim)])
        )
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    # anchors from the SPREAD region only: the hot cluster has no
    # nearby centroid, so it all lands in one cell
    cents = [r["embedding"] for r in corpus.filter(
        F.col("vec_id") >= 900
    ).orderBy("vec_id").limit(4).collect()]
    idx = tempfile.mkdtemp(prefix="knnj_skew_") + "/idx"
    vector_index_build(corpus, idx, num_cells=4, centroids=cents)
    queries = corpus.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.time()
    got = sorted(
        map(
            tuple,
            vector_index_knn_join(
                spark, idx, queries, k=3, nprobe=1
            ).collect(),
        )
    )
    elapsed = time.time() - t0
    assert elapsed < 120.0, f"hot-cell kNN join took {elapsed:.1f}s"
    want = sorted(
        map(
            tuple,
            vector_index_probe(
                spark, idx, queries, k=3, nprobe=1
            ).collect(),
        )
    )
    assert got == want
