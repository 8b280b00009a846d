"""BPE subword tokenizer training as reusable corpus operators.

The kernels behind q203/q208 (queries/subword.py documents the
semantics, the run-parity overlap lemma, and the scale analysis), here
as library calls a curation pipeline composes directly:

- ``bpe_merge_round``   one greedy left-to-right pair merge, purely
                        relational (window functions, no regex);
- ``learn_bpe``         the training loop: corpus → weighted vocabulary
                        → N merge rounds → (merge table, tokenized
                        vocabulary relation);
- ``bpe_word_subwords`` per-word subword counts from the tokenized
                        vocabulary — the encode side's join input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bpe_merge_round(seq: DataFrame, s1: str, s2: str) -> DataFrame:
    """Apply one greedy left-to-right merge of (s1, s2) to a
    (wid, f, pos, sym) sequence relation. Overlapping matches (possible
    only when s1 == s2) resolve by run parity — see queries/subword.py
    for the argument."""
    w = Window.partitionBy("wid").orderBy("pos")
    run = Window.partitionBy("wid", "grp")
    marked = (
        seq.withColumn(
            "match",
            F.coalesce(
                (F.col("sym") == F.lit(s1))
                & (F.lead("sym").over(w) == F.lit(s2)),
                F.lit(False),
            ),
        )
        .withColumn(
            "mseq",
            F.sum(F.when(F.col("match"), 1).otherwise(0)).over(w),
        )
        .withColumn("grp", F.col("pos") - F.col("mseq"))
        .withColumn(
            "do_merge",
            F.col("match")
            & (
                (
                    F.col("mseq")
                    - F.min(F.when(F.col("match"), F.col("mseq"))).over(run)
                )
                % 2
                == 0
            ),
        )
        .withColumn(
            "prev_merge",
            F.coalesce(F.lag("do_merge").over(w), F.lit(False)),
        )
    )
    return (
        marked.filter(~F.col("prev_merge"))
        .select(
            "wid",
            "f",
            F.row_number().over(w).alias("pos"),
            F.when(
                F.col("do_merge"), F.concat(F.col("sym"), F.lit(s2))
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 6,
    min_word_len: int = 2,
) -> tuple[list[tuple[int, str, str, int, int]], DataFrame]:
    """Train BPE merges on a corpus; → (merge table rows
    (round, s1, s2, pair_count, corpus_tokens_after), final
    (wid, f, pos, sym) sequence — the tokenizer applied to the
    vocabulary). Vocabulary-level cost: the corpus is scanned once; the
    rounds run over distinct words weighted by frequency."""
    words = (
        docs.select(F.explode(F.split(text_col, " ")).alias("wid"))
        .filter(F.length("wid") >= min_word_len)
        .groupBy("wid")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    seq = (
        words.select(
            "wid",
            "f",
            F.explode(F.expr("sequence(1, length(wid))")).alias("pos"),
        )
        .withColumn("sym", F.expr("substring(wid, pos, 1)"))
        .localCheckpoint()
    )
    w = Window.partitionBy("wid").orderBy("pos")
    merges: list[tuple[int, str, str, int, int]] = []
    for r in range(1, rounds + 1):
        pairs = (
            seq.withColumn("nxt", F.lead("sym").over(w))
            .filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("f").cast("bigint").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.desc("cnt"), "sym", "nxt").limit(1).collect()[0]
        )  # O(1) driver scalar: the round's best pair (control plane)
        seq = bpe_merge_round(seq, top["sym"], top["nxt"]).localCheckpoint()
        tokens_after = seq.agg(F.sum("f")).collect()[0][0]
        merges.append(
            (r, top["sym"], top["nxt"], int(top["cnt"]), int(tokens_after))
        )
    return merges, seq


def bpe_word_subwords(seq: DataFrame) -> DataFrame:
    """(wid, n_sub): per-word subword counts from a tokenized
    vocabulary relation — join corpus tokens against this to encode."""
    return seq.groupBy("wid").agg(
        F.count("*").cast("bigint").alias("n_sub")
    )
