"""Multinomial Naive Bayes as exact relational arithmetic — the
supervised text classifier of the curation pipeline (the fasttext-style
quality/language filter every LLM corpus pass runs, in its
transcendental-minimal relational form: the MODEL is two count
relations + two scalars, training is two aggregations, scoring is one
explode + one left join + one aggregation).

Design for Spark (and the correctness gate):

- The model IS a pair of relations: per-class word counts
  ``(label, word, c)`` and per-class token totals ``(label, n_tokens,
  n_docs)``. Training = two ``groupBy`` passes with map-side combine;
  the model is vocab-bounded — orders smaller than the corpus — so the
  scoring join broadcasts in practice (AQE sizes it; no unconditional
  hint).
- Scoring: multinomial log-likelihood with add-one smoothing,
  ``score(d, c) = ln(d_c / N) + Σ_tokens ln((c(w,c)+1) / (n_c+V))``;
  unseen (word, class) pairs coalesce to the smoothed floor. ``V`` and
  ``N`` are O(1) driver scalars (control plane, the q126/q202
  precedent).
- ``ln`` is not bit-stable cross-engine (the q190 lesson), so every
  per-token term quantizes to the exact DECIMAL(28,6) grid before the
  (order-independent, exact) decimal sum — the ``_idf_expr``/DSUM
  discipline — and the argmax breaks score ties by MIN label, so the
  prediction is deterministic in both engines.

Reference parity: the reference has no ML surface (SURVEY.md §2b);
this extends the model-adjacent family (q181 power iteration, q210
nearest centroid, q202 bigram LM) with the supervised member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int, int]:
    """(word_counts, class_stats, vocab_size, n_docs): the multinomial
    NB model over whitespace tokens. ``word_counts`` = (label, word,
    c); ``class_stats`` = (label, n_tokens, n_docs)."""
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(text_col, " ")).alias("word"),
    )
    word_counts = toks.groupBy("label", "word").agg(
        F.count("*").cast("bigint").alias("c")
    )
    class_tokens = toks.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_tokens")
    )
    class_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    class_stats = class_tokens.join(class_docs, "label")
    vocab_size = toks.select("word").distinct().count()
    n_docs = docs.count()
    return word_counts, class_stats, vocab_size, n_docs


def nb_score(
    test_docs: DataFrame,
    word_counts: DataFrame,
    class_stats: DataFrame,
    vocab_size: int,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, label, score) — the per-class log-likelihood of every
    test document under the trained model; one row per (doc, class).
    ``ln`` is transcendental, so each per-token term quantizes to the
    exact DECIMAL(28,6) accumulator grid before summing (the
    ``_idf_expr``/DSUM discipline: the exact decimal sum is
    order-independent, and a 1-ulp libm drift flips a quantized term
    only on a 1e-6 grid boundary). Argmax with ``nb_predict``."""
    toks = test_docs.select(
        id_col, F.explode(F.split(text_col, " ")).alias("word")
    )
    # every token meets every class: classes are control-plane few
    pairs = toks.crossJoin(
        F.broadcast(class_stats.select("label", "n_tokens", "n_docs"))
    )
    scored = pairs.join(word_counts, ["label", "word"], "left")
    return scored.groupBy(id_col, "label").agg(
        F.expr(
            "CAST("
            " SUM(CAST(ln((coalesce(c, 0) + 1)"
            f"            / CAST(n_tokens + {int(vocab_size)} AS DOUBLE))"
            "          AS DECIMAL(28,6)))"
            " + FIRST(CAST(ln(CAST(n_docs AS DOUBLE)"
            f"                 / {float(n_docs)!r}) AS DECIMAL(28,6)))"
            " AS DOUBLE)"
        ).alias("score")
    )


def nb_predict(scores: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_col, pred, score): argmax class per document over the
    ROUNDED scores, ties broken by MIN label — deterministic in any
    engine (max score via aggregate, survivors re-joined, min label
    among exact-score ties)."""
    best = scores.groupBy(id_col).agg(F.max("score").alias("score"))
    return (
        best.join(scores, [id_col, "score"])
        .groupBy(id_col, "score")
        .agg(F.min("label").alias("pred"))
        .select(id_col, "pred", "score")
    )
