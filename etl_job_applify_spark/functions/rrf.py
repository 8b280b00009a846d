"""Reciprocal-rank fusion of two ranked retrieval legs.

The textbook formulation joins the legs FULL OUTER on (qid, doc_id)
and coalesces the ranks. Spark cannot broadcast a full-outer join, so
that shape always plans a SortMergeJoin — two exchanges plus two sorts
— over relations that on the serving paths are only K_TOP × |queries|
rows. Both legs are unique on (qid, doc_id) by construction (each is a
row_number-ranked top-L), which makes the join value-identical to a
UNION + per-key aggregate: one exchange, map-side partial aggregation,
no sort (guide §2.4 — remove shuffles outright). ``max`` over
{rank, NULL} reproduces the join's side-coalescing exactly, including
docs present in only one leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the standard RRF discount constant (Cormack et al., SIGIR'09)
RRF_K = 60


def rrf_fused(lex: DataFrame, vec: DataFrame) -> DataFrame:
    """(qid, doc_id, lex_rank, vec_rank, rrf_score) from a lexical leg
    (qid, doc_id, lex_rank) and a vector leg (qid, doc_id, vec_rank),
    each unique on (qid, doc_id) — the caller's contract (ranked
    row_number output is unique by construction; a duplicated key
    would have cartesian-multiplied in the join formulation and
    collapses here, so the shapes agree only under that contract)."""
    both = lex.select(
        "qid",
        "doc_id",
        "lex_rank",
        F.lit(None).cast("int").alias("vec_rank"),
    ).unionByName(
        vec.select(
            "qid",
            "doc_id",
            F.lit(None).cast("int").alias("lex_rank"),
            "vec_rank",
        )
    )
    return (
        both.groupBy("qid", "doc_id")
        .agg(
            F.max("lex_rank").alias("lex_rank"),
            F.max("vec_rank").alias("vec_rank"),
        )
        .withColumn(
            "rrf_score",
            F.expr(
                f"coalesce(1e0 / ({RRF_K} + lex_rank), 0e0)"
                f" + coalesce(1e0 / ({RRF_K} + vec_rank), 0e0)"
            ),
        )
    )
