"""Strongly connected components of a DIRECTED graph — the missing
directed twin of ``operators/components.py`` (whose min-label
propagation answers the undirected question only).

Algorithm: trimming + forward-backward pivot peeling (Fleischer/
Hendrickson/Pinar's FB, the standard distributed SCC decomposition;
Tarjan is inherently sequential):

1. TRIM — a node with no in-edges or no out-edges inside the remaining
   subgraph is its own (trivial) SCC; remove, repeat to fixpoint. Real
   graphs are mostly trivial SCCs, so trimming does the bulk of the
   work in a handful of degree-filter rounds (each one aggregate + one
   semi-join — no BFS).
2. PIVOT — take the minimum remaining node id, compute its forward
   reachable set F and backward reachable set B (two BFS loops over
   the remaining subgraph, ``localCheckpoint``-truncated lineage like
   ``paths.bfs_hops``); F ∩ B is exactly the pivot's SCC
   (assigned scc = pivot id = min member by construction). Remove and
   repeat from 1.

Driver control flow is one scalar pivot + one emptiness check per
phase (control plane); all set algebra is DataFrame joins. Phases =
number of NON-trivial SCCs (+ trim fixpoints), the known cost shape of
FB without the recursive (F\\B, B\\F, rest) three-way parallel split —
that split parallelizes phases but triples the bookkeeping; at the
"few large SCCs + trivial tail" shape of real graphs the sequential
peel is the same number of BFS rounds. ``max_phases`` bounds the loop
and raises on non-convergence rather than returning a partial answer.

Scale posture: each trim round is a groupBy-degree + semi-join; each
BFS round is frontier⋈edges + anti-join (AQE broadcasts small
frontiers). A graph that is one giant cycle of n nodes costs one phase
with O(n)-round BFS — the same bound as any reachability question on
that graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _reach(edges: DataFrame, pivot_df: DataFrame, max_rounds: int) -> DataFrame:
    """Nodes reachable from the pivot (inclusive) following edge
    direction; ``edges`` is (u, v)."""
    seen = pivot_df.select(F.col("node")).localCheckpoint(eager=True)
    frontier = seen
    for _ in range(max_rounds):
        nxt = (
            edges.join(frontier, edges.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(seen, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return seen


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_phases: int = 64,
    max_bfs_rounds: int = 64,
) -> DataFrame:
    """(node, scc) for every node appearing in ``edges``; ``scc`` = min
    node id in the strongly connected component."""
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).distinct().localCheckpoint(eager=True)
    remaining = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done: list[DataFrame] = []
    for _ in range(max_phases):
        # 1. TRIM to fixpoint: no in- or no out-edge within remaining
        while True:
            sub = (
                e.join(remaining.withColumnRenamed("node", "u"), "u", "semi")
                .join(
                    remaining.withColumnRenamed("node", "v"), "v", "semi"
                )
                .localCheckpoint(eager=True)
            )
            has_out = sub.select(F.col("u").alias("node")).distinct()
            has_in = sub.select(F.col("v").alias("node")).distinct()
            trivial = (
                remaining.join(has_out, "node", "left_anti")
                .union(remaining.join(has_in, "node", "left_anti"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            if trivial.isEmpty():
                break
            done.append(
                trivial.select("node", F.col("node").alias("scc"))
            )
            remaining = remaining.join(
                trivial, "node", "left_anti"
            ).localCheckpoint(eager=True)
        head = remaining.orderBy("node").limit(1).collect()
        if not head:
            break
        # 2. PIVOT: F ∩ B inside the remaining subgraph is its SCC
        pivot_df = remaining.filter(F.col("node") == head[0]["node"])
        fwd = _reach(sub, pivot_df, max_bfs_rounds)
        bwd = _reach(
            sub.select(F.col("v").alias("u"), F.col("u").alias("v")),
            pivot_df,
            max_bfs_rounds,
        )
        comp = fwd.join(bwd, "node", "semi").localCheckpoint(eager=True)
        done.append(
            comp.select("node", F.lit(head[0]["node"]).alias("scc"))
        )
        remaining = remaining.join(
            comp, "node", "left_anti"
        ).localCheckpoint(eager=True)
    else:
        if not remaining.isEmpty():
            raise RuntimeError(
                f"SCC did not converge within {max_phases} phases"
            )
    if not done:  # empty edge relation: no nodes, empty result
        spark = edges.sparkSession
        return spark.createDataFrame([], "node long, scc long")
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out
