"""Connected components by iterative min-label propagation.

The dedup endgame: near-dup PAIRS must become CLUSTERS (a↔b, b↔c ⇒
{a,b,c}) so each group keeps one canonical document. Components are
computed by label propagation: every node starts labeled with itself;
each round takes the min label over itself and its neighbors; converges
in O(component diameter) rounds — near-dup clusters are almost cliques,
so 2-3 rounds in practice.

Scale notes: each round is one join + one aggregation (shuffle on node
id). Iterative plans grow unbounded lineage, so every round materializes
via ``localCheckpoint`` — the same reason GraphX/GraphFrames checkpoint.
The driver-side loop only orchestrates; all data movement is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import fresh_local_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` = min node id in the connected component."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .transform(fresh_local_checkpoint)
    )
    # max_iter label-changing rounds + one confirming round: a graph whose
    # labels settle exactly on round max_iter is converged, and only the
    # extra zero-change round can prove it
    for i in range(max_iter + 1):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
            )
            .transform(fresh_local_checkpoint)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
        if i == max_iter:
            # silent non-convergence would report one real component as
            # several — fail loudly instead (raise max_iter for graphs
            # with diameter beyond it)
            raise RuntimeError(
                f"connected_components did not converge within {max_iter} "
                f"rounds ({changed} labels still changing)"
            )
    return labels
