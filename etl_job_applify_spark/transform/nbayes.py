"""Multinomial Naive Bayes as exact relational arithmetic — the
supervised text classifier of the curation pipeline (the fasttext-style
quality/language filter every LLM corpus pass runs, in its
transcendental-minimal relational form: the MODEL is two count
relations + two scalars, training is two aggregations, scoring is one
explode + one left join + one aggregation).

Design for Spark (and the correctness gate):

- The model IS a pair of relations: per-class word counts
  ``(label, word, c)`` and per-class token totals ``(label, n_tokens,
  n_docs)``. Training = two ``groupBy`` passes with map-side combine
  (token totals fold over the vocab-bounded counts, not the token
  stream), and the two model scalars (V, N) ride ONE action over the
  union of the model relations — the token relation is scanned once
  per train call. The model is vocab-bounded — orders smaller than
  the corpus — so the scoring join broadcasts in practice (AQE sizes
  it; no unconditional hint).
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
    class_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    # per-class token totals fold over the vocab-bounded word_counts
    # relation, not the token stream — and the two model scalars ride
    # ONE action over the union of the two MODEL-sized relations
    # (vocab_size = distinct words of word_counts, n_docs = sum of
    # class_docs): the token relation is scanned once per train call,
    # never once per scalar (at 100 TB each extra action was a full
    # token-relation scan)
    class_tokens = word_counts.groupBy("label").agg(
        F.sum("c").cast("bigint").alias("n_tokens")
    )
    class_stats = class_tokens.join(class_docs, "label")
    scalars = (
        word_counts.select(
            "word", F.lit(0).cast("bigint").alias("__nd")
        )
        .unionByName(
            class_docs.select(
                F.lit(None).cast("string").alias("word"),
                F.col("n_docs").alias("__nd"),
            )
        )
        .agg(
            F.countDistinct("word").alias("v"),  # NULLs ignored
            F.sum("__nd").alias("n"),
        )
        .first()
    )
    vocab_size = int(scalars["v"])
    n_docs = int(scalars["n"] or 0)
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
    from ..functions.exact import quantize_expr

    lik = quantize_expr(
        "ln((coalesce(c, 0) + 1)"
        f" / CAST(n_tokens + {int(vocab_size)} AS DOUBLE))"
    )
    prior = quantize_expr(
        f"ln(CAST(n_docs AS DOUBLE) / {float(n_docs)!r})"
    )
    scored = pairs.join(word_counts, ["label", "word"], "left")
    return scored.groupBy(id_col, "label").agg(
        F.expr(
            f"CAST(SUM({lik}) + FIRST({prior}) AS DOUBLE)"
        ).alias("score")
    )


def nb_confusion(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred",
    label_col: str = "label",
) -> DataFrame:
    """(gold, pred, n) — the confusion relation over the ids present
    in BOTH inputs (inner join: unscored or unlabeled ids don't
    evaluate). Exact counts; every classifier metric is a margin of
    this relation."""
    return (
        gold.select(id_col, F.col(label_col).alias("gold"))
        .join(pred.select(id_col, F.col(pred_col).alias("pred")), id_col)
        .groupBy("gold", "pred")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def nb_evaluate(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred",
    label_col: str = "label",
) -> DataFrame:
    """Per-class classifier metrics vs gold labels: (label, n_gold,
    n_pred, tp, fp, fn, precision, recall, f1) — the measurement
    harness that closes the classifier loop the way ir_metrics closes
    retrieval (q256). All counts are exact integers (margins of the
    confusion relation), the ratios are single IEEE divisions of those
    integers, and f1 uses the one shared expression — deterministic in
    any engine, so the oracle is trivial. Classes appearing only as
    predictions (or only as gold) still report, with the zero-side
    conventions precision=0 when nothing was predicted and recall=0
    when nothing was relevant (the scikit-learn zero_division=0
    convention)."""
    conf = nb_confusion(pred, gold, id_col, pred_col, label_col)
    by_gold = conf.groupBy(F.col("gold").alias("label")).agg(
        F.sum("n").cast("bigint").alias("n_gold"),
        F.sum(F.when(F.col("pred") == F.col("gold"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("__tp_g"),
    )
    by_pred = conf.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").cast("bigint").alias("n_pred"),
    )
    m = (
        by_gold.join(by_pred, "label", "full_outer")
        .select(
            "label",
            F.coalesce("n_gold", F.lit(0)).cast("bigint").alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
            F.coalesce("__tp_g", F.lit(0)).cast("bigint").alias("tp"),
        )
        .withColumn("fp", (F.col("n_pred") - F.col("tp")).cast("bigint"))
        .withColumn("fn", (F.col("n_gold") - F.col("tp")).cast("bigint"))
    )
    precision = F.when(
        F.col("n_pred") > 0,
        F.col("tp").cast("double") / F.col("n_pred").cast("double"),
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("n_gold") > 0,
        F.col("tp").cast("double") / F.col("n_gold").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        m.withColumn("precision", precision)
        .withColumn("recall", recall)
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                F.lit(2.0)
                * F.col("precision")
                * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
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
