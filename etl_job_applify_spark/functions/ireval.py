"""IR evaluation metrics as exact relational arithmetic — the
measurement member of the retrieval stack (BM25 / WAND / ANN / hybrid
RRF produce rankings; this scores them): per-query MRR, nDCG@k and
recall@k from a ranking relation and a graded qrels relation.

Design for Spark (and the correctness gate):

- Inputs are RELATIONS: ``ranking`` (qid, doc, rank — 1-based, one row
  per retrieved doc) and ``qrels`` (qid, doc, grade > 0). One join +
  two aggregates per metric family; qrels are control-plane small in
  serving evaluations but nothing here requires it (all joins are
  equi-joins on (qid, doc)).
- MRR is a MAX of exact rationals (1/rank — IEEE division is correctly
  rounded in every engine, and max is order-free), so it is bit-exact
  with no decimal machinery.
- DCG terms divide by ``log2(rank+1)`` — transcendental, so each term
  quantizes to the DECIMAL(28,6) accumulator grid before the exact
  (order-independent) decimal sum, the q230/``_idf_expr`` contract; a
  1-ulp libm drift flips a quantized term only on a 1e-6 grid
  boundary. IDCG uses the same quantized grid over the ideal
  (grade-desc, rank 1..k) ordering, so nDCG is a deterministic ratio.
- Queries with NO relevant docs report recall = 1.0 and ndcg = 0.0
  (the scikit-learn convention: nothing to find ⇒ nothing missed,
  but also nothing gained).

Reference parity: the reference has no retrieval surface (SURVEY.md
§2b); this completes the round-7+ retrieval family with its
evaluation harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .exact import decimal_sum_expr

#: one DCG term (quantized by decimal_sum_expr at the aggregation):
#: (2^grade - 1) / log2(pos + 1)
_DCG_RAW = (
    "(pow(2.0D, CAST({g} AS DOUBLE)) - 1.0D)"
    " / log2(CAST({pos} AS DOUBLE) + 1.0D)"
)


def ir_metrics(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    qid: str = "qid",
    doc: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
) -> DataFrame:
    """(qid, n_rel, mrr, ndcg, recall) per query at cutoff ``k``."""
    r = ranking.select(qid, doc, rank_col).filter(F.col(rank_col) <= k)
    q = qrels.select(qid, doc, grade_col).filter(F.col(grade_col) > 0)
    hits = r.join(q, [qid, doc], "left").withColumn(
        "__g", F.coalesce(F.col(grade_col), F.lit(0))
    )
    per_q_hits = hits.groupBy(qid).agg(
        F.max(
            F.when(
                F.col("__g") > 0,
                F.lit(1.0) / F.col(rank_col).cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("mrr"),
        F.expr(
            decimal_sum_expr(_DCG_RAW.format(g="__g", pos=rank_col))
        ).alias("__dcg"),
        F.sum((F.col("__g") > 0).cast("bigint")).alias("__rel_found"),
    )
    w = Window.partitionBy(qid).orderBy(
        F.desc(grade_col), F.asc(doc)
    )
    ideal = (
        q.withColumn("__pos", F.row_number().over(w))
        .filter(F.col("__pos") <= k)
        .groupBy(qid)
        .agg(
            F.expr(
                decimal_sum_expr(
                    _DCG_RAW.format(g=grade_col, pos="__pos")
                )
            ).alias("__idcg")
        )
    )
    n_rel = q.groupBy(qid).agg(F.count("*").cast("bigint").alias("n_rel"))
    # queries that retrieved nothing still evaluate (left base = the
    # union of queries appearing on either side)
    base = (
        ranking.select(qid).union(qrels.select(qid)).distinct()
    )
    return (
        base.join(per_q_hits, qid, "left")
        .join(ideal, qid, "left")
        .join(n_rel, qid, "left")
        .select(
            qid,
            F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
            F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
            F.when(
                F.coalesce("__idcg", F.lit(0.0)) > 0,
                F.coalesce("__dcg", F.lit(0.0)) / F.col("__idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
            F.when(
                F.coalesce("n_rel", F.lit(0)) > 0,
                F.coalesce("__rel_found", F.lit(0)).cast("double")
                / F.col("n_rel").cast("double"),
            )
            .otherwise(F.lit(1.0))
            .alias("recall"),
        )
    )
