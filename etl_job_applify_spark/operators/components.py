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


def cc_update(
    all_edges: DataFrame,
    new_edges: DataFrame,
    labels: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """EXACT incremental maintenance of ``connected_components`` under
    edge arrivals: given the stored (node, component) labels over the
    OLD edge set (component = min member) and the batch of
    ``new_edges`` (``all_edges`` = old ∪ new), produce the labels over
    ``all_edges`` — bit-identical to recomputing from scratch (pinned
    by tests), but the propagation starts from exactly the
    improvements the new edges induce and each round relaxes only the
    CHANGED frontier against the full edge set (min-label propagation
    is monotone, so frontier-only relaxation reaches the same
    fixpoint). A batch that merges nothing costs one empty round; a
    batch that merges two clusters costs O(merged-cluster diameter)
    rounds over the improvement frontier — never a full re-propagation
    of every label. This is the dedup-clustering steady state: the
    near-dup PAIRS a streaming dedup emits arrive in batches, and the
    canonical-id clusters must follow without recomputing history
    (``streaming/jobs.py run_components_stream``).

    Duplicate edges in ``new_edges`` are harmless (their candidates
    reproduce stored labels). Raises on non-convergence within
    ``max_iter`` rounds, like the from-scratch kernel."""
    sym_all = (
        all_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(
            all_edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        .transform(fresh_local_checkpoint)
    )
    sym_new = new_edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(
        new_edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # nodes the batch introduces start as their own component
    fresh_nodes = (
        sym_new.select(F.col("u").alias("node"))
        .distinct()
        .join(labels, "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    lab = labels.unionByName(fresh_nodes).transform(
        fresh_local_checkpoint
    )
    # round-0 candidates: neighbor labels across the NEW edges only
    cand = sym_new.join(
        lab.select(
            F.col("node").alias("v"), F.col("component").alias("ncomp")
        ),
        "v",
    ).select(F.col("u").alias("node"), "ncomp")
    for _ in range(max_iter + 1):
        upd = cand.groupBy("node").agg(F.min("ncomp").alias("cand"))
        improved = (
            upd.join(lab, "node")
            .filter(F.col("cand") < F.col("component"))
            .select("node", F.col("cand").alias("component"))
            .transform(fresh_local_checkpoint)
        )
        if improved.isEmpty():
            return lab
        lab = (
            lab.join(
                improved.withColumnRenamed("component", "__new"),
                "node",
                "left",
            )
            .select(
                "node",
                F.coalesce("__new", "component").alias("component"),
            )
            .transform(fresh_local_checkpoint)
        )
        # improvements propagate across ALL edges next round
        cand = sym_all.join(
            improved.select(
                F.col("node").alias("u"),
                F.col("component").alias("ncomp"),
            ),
            "u",
        ).select(F.col("v").alias("node"), "ncomp")
    raise RuntimeError(
        f"cc_update did not converge within {max_iter} rounds"
    )


def cc_delete_update(
    remaining_edges: DataFrame,
    removed_edges: DataFrame,
    labels: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """EXACT incremental maintenance of ``connected_components`` under
    edge REMOVALS: deletion can only SPLIT components (never merge),
    and a split is confined to the component that lost an edge — so
    the kernel relabels ONLY the affected components and copies every
    other label through untouched. Given the stored (node, component)
    labels over remaining ∪ removed and the removed batch, produce
    labels over ``remaining_edges`` — bit-identical to recomputing
    from scratch (test-pinned; the q276 oracle is the one-shot CC SQL
    over the filtered edges).

    Shape: the affected component ids are the labels of the removed
    edges' endpoints (change-sized — one broadcast-able relation);
    the affected REGION is those components' members (bounded by the
    components that actually lost edges, not the graph); the region's
    subgraph is re-propagated with the from-scratch kernel, which
    costs O(region diameter) rounds over region-sized relations.
    Nodes whose every edge was removed disappear from the labels —
    matching ``connected_components`` over the remaining set, which
    only sees nodes with surviving edges. This is the forget-sweep
    story for clusters: a forgotten document's pairs leave the
    maintained clustering with component-bounded work
    (``lifecycle.graph_forget``)."""
    rm_nodes = (
        removed_edges.select(F.col(src).alias("node"))
        .union(removed_edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    aff_comps = (
        labels.join(rm_nodes, "node", "left_semi")
        .select("component")
        .distinct()
        .transform(fresh_local_checkpoint)
    )
    aff_nodes = (
        labels.join(F.broadcast(aff_comps), "component", "left_semi")
        .select("node")
        .transform(fresh_local_checkpoint)
    )
    # the affected region's surviving subgraph: components are closed
    # under edges, so one endpoint in the region implies both
    sub = remaining_edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).join(
        aff_nodes.withColumnRenamed("node", "a"), "a", "left_semi"
    )
    relabeled = connected_components(sub, max_iter=max_iter)
    return (
        labels.join(aff_nodes, "node", "left_anti")
        .unionByName(relabeled)
    )
