"""SimHash fingerprints + near-duplicate pairs by Hamming distance.

SimHash folds a document's shingle set into one 64-bit fingerprint whose
Hamming distance tracks cosine similarity of the underlying feature sets.
Computed entirely JVM-side: per (doc, shingle) posting, xxhash64 gives 64
bits; each bit votes ±1; the per-doc sign vector re-packs into a BIGINT.

The bit-majority aggregation is expressed as 64 conditional sums in one
groupBy — one shuffle, map-side partials, no UDF.

Pairing: the 64-bit fingerprint splits into ``max_hamming + 1`` blocks;
two docs within the radius must agree on at least one whole block
(pigeonhole), so candidates are block-equality joins — index-style,
never all-pairs. Block width shrinks as the radius grows (HmSearch
trade-off: looser radius → more candidates per bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .shingles import with_shingles


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """(doc, simhash: bigint)"""
    sh = with_shingles(docs.select(id_col, text_col), text_col, n)
    postings = sh.select(
        F.col(id_col).alias("doc"), F.explode("shingles").alias("sh")
    ).withColumn("h", F.xxhash64("sh"))
    votes = postings.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    packed = votes.select(
        "doc",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (1 << b)).otherwise(0)
                for b in range(63)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),  # bit 63 dropped to stay in positive bigint range
    )
    return packed


def _hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs (a, b, hamming) with hamming <= max_hamming, via block
    candidate joins (no cross product).

    Recall guarantee comes from the pigeonhole principle: the 64 bits are
    split into ``max_hamming + 1`` blocks, so two fingerprints within the
    radius MUST agree on at least one whole block. Block count scales
    with the radius (the HmSearch trade-off: larger radius → narrower
    blocks → more candidates per bucket).
    """
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    nblocks = max_hamming + 1
    if nblocks > 16:
        raise ValueError(
            "max_hamming > 15 would need blocks under 4 bits — candidate "
            "buckets degenerate; use MinHash/Jaccard for loose thresholds"
        )
    widths = [64 // nblocks + (1 if i < 64 % nblocks else 0) for i in range(nblocks)]
    offsets = [sum(widths[:i]) for i in range(nblocks)]

    def _block(i: int):
        # width 64 (max_hamming=0, one block = whole fingerprint): the
        # (1<<64)-1 mask would overflow a long — the shift alone suffices
        shifted = F.shiftright(F.col("simhash"), offsets[i])
        if widths[i] >= 64:
            return shifted.alias(f"blk{i}")
        return shifted.bitwiseAND(F.lit((1 << widths[i]) - 1)).alias(f"blk{i}")

    fp = simhash_fingerprints(docs, id_col, text_col, n)
    blocks = fp.select("doc", "simhash", *[_block(i) for i in range(nblocks)])
    pairs = None
    for i in range(nblocks):
        a = blocks.select(
            F.col("doc").alias("a"), F.col("simhash").alias("sig_a"), F.col(f"blk{i}").alias("blk")
        )
        b = blocks.select(
            F.col("doc").alias("b"), F.col("simhash").alias("sig_b"), F.col(f"blk{i}").alias("blk")
        )
        cand = a.join(b, "blk").filter(F.col("a") < F.col("b")).drop("blk")
        pairs = cand if pairs is None else pairs.unionByName(cand)
    return (
        pairs.distinct()
        .withColumn("hamming", _hamming(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
