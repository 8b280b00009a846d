"""Sorted-neighborhood (merge/purge) candidate generation for dedup.

The Hernández–Stolfo alternative to LSH blocking: sort records by a
discriminating key and compare each record only to its ``window``
successors in sort order. Distributed form used here:

- records are BLOCKED by a short key prefix and sorted WITHIN blocks —
  the window never crosses a block boundary, so no global single-
  partition sort exists anywhere in the plan (each block is an
  independent window partition, shuffled once on the block key);
- the block-boundary pairs that a single pass misses are recovered by
  MULTIPLE PASSES with independent key functions (the standard
  multi-pass SNM remedy — a true dup agreeing with its twin on none of
  the pass keys' prefixes is vanishingly unlikely);
- per-row candidate fanout is exactly ``window × n_passes`` — linear in
  the corpus, immune to the hot-shingle quadratic fanout the inverted-
  index path (dedup/jaccard.py) must cap away.

At 100 TB: the sort key is cheap (a prefix), blocks are bounded
(prefix cardinality × corpus share), and the whole candidate stage is
one exchange per pass on the block key. Verification cost is
``O(corpus × window)`` pair comparisons — the knob a production run
tunes against recall (window up, recall up, cost linear).

Reference parity: the reference's only dedup is dropDuplicates
(services/transformer.py:13-17); SNM extends the north-star fuzzy-dedup
family beside MinHash/SimHash/prefix-filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def snm_candidate_pairs(
    df: DataFrame,
    id_col: str,
    key_exprs: list[str],
    window: int = 4,
    block_len: int = 2,
) -> DataFrame:
    """Normalized distinct candidate pairs (a < b) from multi-pass
    sorted-neighborhood scanning.

    ``key_exprs``: one SQL expression per pass producing that pass's
    sort key; the pass blocks on the key's first ``block_len`` chars
    and compares each record to its ``window`` in-block successors.
    Ordering ties break on ``id_col``, so the candidate set is a pure
    function of the data (engine/partitioning independent — the DuckDB
    oracle re-derives it with the identical window spec).
    """
    if not key_exprs or window < 1 or block_len < 1:
        raise ValueError(
            "snm_candidate_pairs needs >= 1 key expression, window >= 1 "
            f"and block_len >= 1 (got {len(key_exprs)} keys, "
            f"window={window}, block_len={block_len})"
        )
    passes = []
    for expr in key_exprs:
        keyed = df.select(
            F.col(id_col).alias("__id"),
            F.expr(expr).alias("__k"),
        ).withColumn("__blk", F.substring("__k", 1, block_len))
        w = Window.partitionBy("__blk").orderBy("__k", "__id")
        # ALL window successors ride ONE window evaluation per pass:
        # the k lead() offsets share a window spec, so they run in a
        # single WindowExec over one (__blk, __k, __id) sort — the
        # per-offset formulation re-shuffled and re-sorted the keyed
        # relation window times per pass, and block skew makes that
        # sort the serial floor of the whole query (guide §2.4/§2.5)
        leads = keyed.select(
            F.col("__id").alias("x"),
            F.array(
                *[F.lead("__id", k).over(w) for k in range(1, window + 1)]
            ).alias("__ys"),
        )
        passes.append(
            leads.select("x", F.explode("__ys").alias("y")).filter(
                F.col("y").isNotNull()
            )
        )
    cand = passes[0]
    for p in passes[1:]:
        cand = cand.unionByName(p)
    return (
        cand.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        # duplicate ids in the input make lead() pair a row with its own
        # twin; least/greatest collapses that to a degenerate (id, id)
        # self-pair that downstream verification would score 1.0
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
