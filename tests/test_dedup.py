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


# --- semantic dedup (SemDeDup-style, dedup/semantic.py) -------------------

def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.98, 0.02, 0.0]),   # near-dup of anchor 0
        (3, [0.0, 0.97, 0.03]),   # near-dup of anchor 1
        (4, [0.0, 0.0, 1.0]),     # own direction, no dup
        (5, [0.97, 0.03, 0.0]),   # second near-dup of anchor 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_assigns_nearest_anchor(spark):
    from etl_job_applify_spark.dedup import assign_clusters

    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(_emb(spark), num_anchors=2).collect()
    }
    assert got[2] == 0 and got[5] == 0 and got[3] == 1
    # vec 4 is orthogonal to both anchors (cos 0 vs both) → tie broken
    # by lowest anchor id
    assert got[4] == 0


def test_semantic_dedup_keeps_lowest_id_per_group(spark):
    from etl_job_applify_spark.dedup import semantic_dedup_kept

    kept = {
        r["vec_id"]
        for r in semantic_dedup_kept(
            _emb(spark), num_anchors=2, threshold=0.9
        ).collect()
    }
    # 2 and 5 collapse into anchor 0 (cos ≈ .98); 3 collapses into anchor 1
    assert kept == {0, 1, 4}


def test_semantic_dedup_high_threshold_keeps_all(spark):
    from etl_job_applify_spark.dedup import semantic_dedup_kept

    kept = semantic_dedup_kept(_emb(spark), num_anchors=2, threshold=1.01)
    assert kept.count() == 6


# --- exact span dedup (dedup/spans.py) ------------------------------------

def test_shared_span_pairs_finds_verbatim_run(spark):
    from etl_job_applify_spark.dedup import shared_span_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta unrelated tail words"),
        (2, "prefix words alpha beta gamma delta epsilon zeta other"),
        (3, "completely different content with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = shared_span_pairs(df, n=6, min_shared=1).collect()
    # docs 1/2 share exactly one 6-token run: "alpha beta gamma delta
    # epsilon zeta"
    assert [(r["a"], r["b"], r["shared_spans"]) for r in out] == [(1, 2, 1)]


def test_shared_span_pairs_cap_drops_boilerplate(spark):
    from etl_job_applify_spark.dedup import shared_span_pairs

    boiler = "same header line repeated across every doc"
    rows = [(i, f"{boiler} unique{i} a b c d e") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the header windows occur in all 5 docs; cap at 4 removes them and
    # nothing else is shared → no pairs survive
    assert shared_span_pairs(df, n=6, max_doc_freq=4).count() == 0
    # uncapped, the header makes every pair a match (10 pairs)
    assert shared_span_pairs(df, n=6, max_doc_freq=5).count() == 10


def test_prefix_filtered_jaccard_equals_inverted_index(spark):
    """The PPJoin prefix-filter formulation must produce EXACTLY the
    pairs of the posting-join formulation at several thresholds — the
    prefix lemma (canonically-smallest common shingle lies in both
    prefixes when J >= t) must hold on adversarial tiny docs, not just
    the fixture corpus."""
    from etl_job_applify_spark.dedup import (
        ngram_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = []
    # every 4-token sequence over a 6-word vocabulary with stride 3 —
    # dense near-dup structure with many exact-threshold ties
    import itertools

    for i, combo in enumerate(itertools.islice(
        itertools.permutations(words, 4), 0, 60, 3
    )):
        docs.append((i, " ".join(combo)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        base = {
            (r["a"], r["b"]): round(r["jaccard"], 12)
            for r in ngram_jaccard_pairs(
                df, n=2, threshold=t, max_doc_freq=30
            ).collect()
        }
        pref = {
            (r["a"], r["b"]): round(r["jaccard"], 12)
            for r in prefix_filtered_jaccard_pairs(
                df, n=2, threshold=t, max_doc_freq=30
            ).collect()
        }
        assert pref == base, (t, len(pref), len(base))
    # uncapped variant too
    base = {
        (r["a"], r["b"]) for r in
        ngram_jaccard_pairs(df, n=2, threshold=0.5).collect()
    }
    pref = {
        (r["a"], r["b"]) for r in
        prefix_filtered_jaccard_pairs(df, n=2, threshold=0.5).collect()
    }
    assert pref == base


def test_contamination_spans_cross_set(spark):
    """Decontamination audit: a train doc embedding an eval doc's
    6-token run flags with the exact window count; clean docs are
    absent; the fraction uses the doc's own distinct window count."""
    from etl_job_applify_spark.dedup.spans import contamination_spans

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six"),
            (3, "totally unrelated words nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),
         (101, "x one two three four five six y")],
        "doc_id long, text string",
    )
    got = {
        r["doc"]: (
            r["n_contaminated_spans"], r["n_spans"], r["contamination"]
        )
        for r in contamination_spans(train, ev, n=6).collect()
    }
    # doc 1 (8 tokens -> 3 windows) shares its first window with eval
    # 100; doc 2's single window sits verbatim inside eval 101
    assert got == {1: (1, 3, 1.0 / 3.0), 2: (1, 1, 1.0)}
