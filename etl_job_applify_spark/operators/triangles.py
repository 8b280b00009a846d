"""Distributed triangle counting (degree-ordered orientation).

The q167 kernel as a reusable operator: given an undirected edge list,
count triangles and wedges with the Schank/Wagner orientation (each
edge directed toward its higher-(degree, id) endpoint, bounding
out-degree — and therefore the wedge join's per-key fanout — by
O(√|E|) even on power-law graphs; a hub's edges all point INTO it, so
hubs generate zero wedges).

``max_degree`` is the explicit scale knob for dense graphs: drop nodes
whose degree exceeds the cap BEFORE orientation (both endpoints must
survive). Wedge volume is Θ(Σ d_out²); on graphs where average degree
grows with the data (e.g. a fixed catalog under ever-more baskets) the
exact count eventually outgrows any cluster, and hub-capping is the
standard mitigation (same discipline as the jaccard shingle cap). The
cap CHANGES the counted graph — callers own that semantic choice, and
the operator reports how many nodes the cap removed rather than hiding
it.

``broadcast_closing``: ship the closing-edge set to every task so the
wedge stream is generated and probed within one stage and never
exchanged (measured 1.5-2x at |E| ~ 10⁶). Past the broadcast budget
(|E| ≳ 10⁸) pass False and the wedges shuffle on (u, w).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TriangleStats(NamedTuple):
    n_edges: int
    n_triangles: int
    n_wedges: int          # open+closed wedge count Σ C(d, 2)
    n_capped_nodes: int    # nodes removed by max_degree (0 without cap)


def triangle_stats(
    pairs: DataFrame,
    max_degree: int | None = None,
    broadcast_closing: bool = True,
) -> TriangleStats:
    """Count triangles in the undirected edge list ``pairs`` (columns
    ``a``, ``b``; callers pass a deduplicated, self-loop-free list —
    normalize with least/greatest + distinct upstream)."""
    pairs = pairs.persist()
    try:
        deg = (
            pairs.select(F.col("a").alias("v"))
            .unionAll(pairs.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        n_capped = 0
        if max_degree is not None:
            keep = deg.filter(F.col("d") <= max_degree)
            n_capped = deg.count() - keep.count()
            if n_capped:
                capped = (
                    pairs.join(
                        F.broadcast(keep.select(F.col("v").alias("a"))), "a",
                        "left_semi",
                    )
                    .join(
                        F.broadcast(keep.select(F.col("v").alias("b"))), "b",
                        "left_semi",
                    )
                    .persist()
                )
                pairs.unpersist()
                pairs = capped
                deg = (
                    pairs.select(F.col("a").alias("v"))
                    .unionAll(pairs.select(F.col("b").alias("v")))
                    .groupBy("v")
                    .agg(F.count("*").alias("d"))
                )
        e = (
            pairs.join(
                F.broadcast(
                    deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da")
                ),
                "a",
            )
            .join(
                F.broadcast(
                    deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db")
                ),
                "b",
            )
            .select(
                F.when(
                    (F.col("da") < F.col("db"))
                    | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                )
                .otherwise(
                    F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))
                )
                .alias("e")
            )
            .select("e.src", "e.dst")
            .persist()
        )
        try:
            wedges = (
                e.alias("e1")
                .join(e.alias("e2"), F.col("e1.src") == F.col("e2.src"))
                .filter(F.col("e1.dst") < F.col("e2.dst"))
                .select(
                    F.least("e1.dst", "e2.dst").alias("u"),
                    F.greatest("e1.dst", "e2.dst").alias("w"),
                )
            )
            closing = e.select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("w"),
            )
            if broadcast_closing:
                closing = F.broadcast(closing)
            n_tri = wedges.join(closing, ["u", "w"], "inner").count()
            n_edges = pairs.count()
            n_wedges = int(
                deg.agg(
                    F.sum(F.expr("d * (d - 1) / 2")).cast("bigint")
                ).first()[0]
                or 0
            )
        finally:
            e.unpersist()
        return TriangleStats(n_edges, n_tri, n_wedges, n_capped)
    finally:
        pairs.unpersist()
