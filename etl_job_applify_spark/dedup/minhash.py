"""MinHash + LSH banding near-duplicate candidate generation.

Pure DataFrame assembly (no MLlib, no UDFs): ``xxhash64(shingle, seed_i)``
is a JVM-side 64-bit hash, so k independent min-hashes are k aggregations
over the exploded postings — computed in ONE pass via groupBy with k
``min(xxhash64(sh, i))`` aggregates (map-side partial min, cheap shuffle).

Banding: the k signatures split into b bands of r rows (k = b·r); docs
agreeing on all r hashes of any band land in the same bucket → candidate
pair. P(candidate) = 1 − (1 − j^r)^b, the classic S-curve: with k=128,
b=32, r=4 the curve crosses ~0.5 at j ≈ 0.42.

Scale: shuffle postings once for signatures, shuffle b bucket keys per
doc for banding. Candidates are verified with exact Jaccard
(jaccard.py) — LSH is recall-lossy by design; the verification keeps
precision exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jaccard import ngram_jaccard_pairs
from .shingles import with_shingles


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """(doc, sig: array<bigint>[num_hashes]) — one row per document."""
    sh = with_shingles(docs.select(id_col, text_col), text_col, n)
    postings = sh.select(
        F.col(id_col).alias("doc"), F.explode("shingles").alias("sh")
    )
    mins = postings.groupBy("doc").agg(
        *[
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    verify: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs (a, b[, jaccard]) via banded MinHash.

    ``verify=True`` re-checks every candidate with exact shingle Jaccard
    and filters by ``threshold`` (exact precision, LSH-bounded recall).
    ``verify=False`` returns raw candidates (a, b).

    ``max_bucket_size``: skip LSH buckets holding more than this many
    docs. A bucket's pair fanout is quadratic in its size, and oversized
    buckets are boilerplate-driven (a band of min-hashes dominated by a
    template shared corpus-wide), not near-dup signal — the banding twin
    of Jaccard's ``max_doc_freq`` stop-shingle cap, and the knob that
    keeps a skewed 100 TB corpus from melting one reducer. Genuine
    near-dup CLUSTERS of size ≤ cap are unaffected.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, n, num_hashes)

    band_entries = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")

    if max_bucket_size is not None:
        # group each bucket once; the size cap is a free filter and pairs
        # are emitted by in-group combination of the sorted doc list
        # (same shape as jaccard.py's capped path — one shuffle, fanout
        # bounded by cap² per bucket)
        grouped = (
            band_entries.groupBy("band", "bucket")
            .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
            .filter((F.size("docs") >= 2) & (F.size("docs") <= max_bucket_size))
        )
        pair_structs = (
            "flatten(transform(docs, (x, i) -> "
            "transform(slice(docs, i + 2, size(docs)), "
            "y -> struct(x AS a, y AS b))))"
        )
        candidates = (
            grouped.select(F.explode(F.expr(pair_structs)).alias("p"))
            .select("p.a", "p.b")
            .distinct()
        )
    else:
        left = band_entries.select("band", "bucket", F.col("doc").alias("a"))
        right = band_entries.select("band", "bucket", F.col("doc").alias("b"))
        candidates = (
            left.join(right, ["band", "bucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
    if not verify:
        return candidates
    # candidates feed three plan branches below (two id-union branches +
    # the final semi join) — persist so the signature/banding pipeline
    # runs once, not three times (ContextCleaner reclaims on GC)
    from pyspark import StorageLevel

    candidates = candidates.persist(StorageLevel.MEMORY_AND_DISK)

    # exact verification restricted to CANDIDATE DOCUMENTS: first shrink
    # the corpus to docs appearing in any candidate pair, then run the
    # relational Jaccard on that subset and keep candidate pairs. Running
    # the exact pass over the full corpus would cost the quadratic join
    # LSH exists to avoid. Per-doc shingle sets are unchanged by the
    # subset, so jaccard values are identical to full-corpus ones.
    cand_ids = (
        candidates.select(F.col("a").alias(id_col))
        .union(candidates.select(F.col("b").alias(id_col)))
        .distinct()
    )
    cand_docs = docs.join(cand_ids, id_col, "left_semi")
    exact = ngram_jaccard_pairs(
        cand_docs, id_col, text_col, n, threshold, max_doc_freq=None
    )
    return exact.join(candidates, ["a", "b"], "left_semi")
