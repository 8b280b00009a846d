"""Fuzzy dedup: MinHash LSH recall vs exact Jaccard, SimHash, embedding
near-dup bucketing vs exact."""

from __future__ import annotations

from etl_job_applify_spark.dedup import (
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from etl_job_applify_spark.queries._util import tbl

from conftest import SF_SMOKE


def _docs(spark):
    return tbl(spark, SF_SMOKE, "documents")


def test_exact_jaccard_finds_planted_pairs(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    assert len(pairs) > 0
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in pairs)
    assert all(r["a"] < r["b"] for r in pairs)


def test_minhash_lsh_recall_vs_exact(spark):
    docs = _docs(spark)
    exact = {(r["a"], r["b"])
             for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()}
    lsh = {(r["a"], r["b"])
           for r in minhash_lsh_pairs(docs, num_hashes=64, bands=16,
                                      threshold=0.7).collect()}
    assert exact, "fixture should contain near-dup pairs"
    # high-similarity pairs collide in ≥1 of 16 bands w.h.p.
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9
    assert lsh <= exact  # verification keeps precision exact


def test_minhash_candidates_only(spark):
    cands = minhash_lsh_pairs(_docs(spark), num_hashes=32, bands=8,
                              verify=False)
    assert cands.columns == ["a", "b"]
    assert cands.count() > 0


def test_simhash_pairs_sane(spark):
    out = simhash_near_pairs(_docs(spark), n=2, max_hamming=10).collect()
    assert all(r["hamming"] <= 10 for r in out)
    assert all(r["a"] < r["b"] for r in out)


def test_embedding_near_dup_lsh_vs_exact(spark):
    emb = tbl(spark, SF_SMOKE, "embeddings")
    exact = {(r["a"], r["b"])
             for r in embedding_near_dup_pairs(emb, threshold=0.4,
                                               num_planes=0).collect()}
    bucketed = {(r["a"], r["b"])
                for r in embedding_near_dup_pairs(emb, threshold=0.4,
                                                  num_planes=8).collect()}
    assert bucketed <= exact  # bucketing only prunes, never invents pairs


def test_simhash_block_join_matches_brute_force(spark):
    """The pigeonhole block join must find EXACTLY the pairs a brute-force
    hamming comparison finds, for a radius larger than the old fixed
    4-block scheme could guarantee."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.dedup.simhash import (
        _hamming,
        simhash_fingerprints,
    )

    docs = _docs(spark)
    fp = simhash_fingerprints(docs, n=2)
    a = fp.select(F.col("doc").alias("a"), F.col("simhash").alias("sa"))
    b = fp.select(F.col("doc").alias("b"), F.col("simhash").alias("sb"))
    brute = {
        (r["a"], r["b"])
        for r in a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn("h", _hamming(F.col("sa"), F.col("sb")))
        .filter(F.col("h") <= 8)
        .collect()
    }
    blocked = {(r["a"], r["b"])
               for r in simhash_near_pairs(docs, n=2, max_hamming=8).collect()}
    assert blocked == brute


def test_simhash_radius_too_large_rejected(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(_docs(spark), max_hamming=20)


def test_min_shingle_fingerprint_null_for_short_docs(spark):
    from etl_job_applify_spark.functions.text import min_shingle_fingerprint_expr

    df = spark.createDataFrame([("a b",), ("one two three",)], "text string")
    out = [r[0] for r in df.select(min_shingle_fingerprint_expr("text", n=3)).collect()]
    assert out[0] is None       # < n tokens → no shingle → NULL
    assert out[1] is not None


def test_simhash_exact_match_radius_zero(spark):
    out = simhash_near_pairs(_docs(spark), n=2, max_hamming=0).collect()
    assert all(r["hamming"] == 0 for r in out)  # exact-fingerprint dups only
