"""Bigram language-model scoring for target-corpus data selection.

The kernel behind q202 (queries/mlops.py documents the semantics and
the transcendental-free design) as a library call: train an add-one-
smoothed bigram model on a target slice and score every document by its
average conditional probability — the Moore-Lewis / CCNet "does this
look like my target corpus" selection signal. Exact arithmetic: every
probability is a ratio of integers (deterministic double division) and
the per-doc sum rides the DECIMAL string hop.

Scale: the model (bigram + context counts) is vocab-bounded, so the two
scoring joins broadcast in practice (AQE sizes them); the corpus is
exploded once and aggregated once. V is an O(1) driver scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PSUM18 = (
    "CAST(CAST(SUM(CAST((p) AS DECIMAL(28,18))) AS STRING) AS DOUBLE)"
)


def _bigram_expr(text_col: str) -> str:
    return (
        f"transform(slice(split({text_col}, ' '), 1,"
        f" size(split({text_col}, ' ')) - 1),"
        f" (w, i) -> struct(w AS w1,"
        f" element_at(split({text_col}, ' '), i + 2) AS w2))"
    )


def bigram_lm_scores(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """→ (id_cols..., n_bigrams, avg_cond_prob): every document in
    ``docs`` scored under an add-one-smoothed bigram model trained on
    ``target``. Documents with fewer than two tokens produce no bigrams
    and drop out. ``avg_cond_prob`` is unrounded — callers that compare
    cross-engine should ROUND(•, 9) the reported value (q202 does)."""
    tgt_bg = target.select(
        F.explode(F.expr(_bigram_expr(text_col))).alias("bg")
    ).select("bg.w1", "bg.w2")
    c12 = tgt_bg.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12")
    )
    c1 = tgt_bg.groupBy("w1").agg(F.count("*").cast("bigint").alias("c1"))
    vocab_v = (
        target.select(F.explode(F.split(text_col, " ")).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    all_bg = docs.select(
        *id_cols, F.explode(F.expr(_bigram_expr(text_col))).alias("bg")
    ).select(*id_cols, "bg.w1", "bg.w2")
    scored = (
        all_bg.join(c1, "w1", "left")
        .join(c12, ["w1", "w2"], "left")
        .withColumn(
            "p",
            (
                (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                / (
                    F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vocab_v)
                ).cast("double")
            ),
        )
    )
    return (
        scored.groupBy(*id_cols)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.expr(_PSUM18).alias("psum"),
        )
        .select(
            *id_cols,
            "n_bigrams",
            (F.col("psum") / F.col("n_bigrams")).alias("avg_cond_prob"),
        )
    )
