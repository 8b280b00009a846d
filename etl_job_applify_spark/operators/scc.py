"""Strongly connected components of a DIRECTED graph — the missing
directed twin of ``operators/components.py`` (whose min-label
propagation answers the undirected question only).

Algorithm: trimming + PARALLEL forward-backward pivot decomposition
(Fleischer/Hendrickson/Pinar's FB with the three-way split, plus the
standard weakly-connected-component pre-decomposition; Tarjan is
inherently sequential). The graph is maintained as a PARTITION of the
remaining nodes — an invariant relation (node, part) where no SCC ever
spans two parts — and every phase advances ALL parts simultaneously:

0. PARTITION INIT — weakly connected components (``components.py``;
   part label = min member). An SCC is connected undirected, so no SCC
   spans WCCs; disconnected regions (e.g. thousands of independent
   small cycles) decompose in parallel from phase 1 instead of one
   pivot peel each.
1. TRIM — within its part, a node with no in-edges or no out-edges is
   its own (trivial) SCC; remove, repeat to fixpoint. Real graphs are
   mostly trivial SCCs, so trimming does the bulk of the work in a few
   degree-filter rounds (each one aggregate + one anti-join — no BFS).
2. PIVOT per part — a DETERMINISTIC-HASH argmin (md5 over the node's
   decimal rendering) picks every part's pivot in one aggregation (no
   scalar rides the driver). A hash pivot lands uniformly inside the
   part, which is what makes the split below halve chains in
   expectation — a min-node pivot at the head of a directed chain
   would put the whole remainder in F\\S and degenerate to the
   sequential peel. Multi-source BFS computes each part's forward set
   F and backward set B in the SAME rounds (frontiers keyed on
   (part, node)); F ∩ B is exactly each pivot's SCC, labeled
   scc = min member (one aggregation per phase).
3. THREE-WAY SPLIT — survivors of each part relabel into F\\S, B\\S
   and rest (no SCC spans the three: any cycle through two sides would
   pass through the peeled SCC), new part label = min node of the
   sub-part (globally unique because parts partition the nodes). Parts
   MULTIPLY each phase — a chain of k small SCCs converges in O(log k)
   phases where the sequential peel needs k.

Driver control flow is a handful of emptiness checks per phase
(control plane); all set algebra is DataFrame joins keyed on the node
(or (part, node)) id. Non-convergence RAISES — ``max_phases`` bounds
the split recursion depth and ``max_bfs_rounds`` bounds each BFS sweep
(a partial reachable set would silently split an SCC, so exhausting
the budget with a non-empty frontier is an error, never a truncation).

Scale posture: each trim round is a groupBy-degree + anti-join; each
BFS round is one frontier⋈edges equi-join on (part, node) + anti-join
(AQE broadcasts small frontiers); the split is one aggregation + one
join. BFS rounds per phase are bounded by the largest remaining
part's DIRECTED diameter, and the WCC init by the UNDIRECTED diameter
— a graph that is one giant n-cycle still needs O(n) rounds for any
reachability question and now raises (raise the budgets) instead of
silently mislabeling.

Reference parity: the reference has no graph surface (SURVEY.md §2b);
this extends the north-star analytics family like triangles/k-core.

INCREMENTAL MAINTENANCE (insert-only) — ``scc_update`` below. CC,
SSSP, triangles, and k-core maintain incrementally (``cc_update``,
``sssp_profile_update``, ``triangle_update``, ``k_core_update``)
because their invariants are monotone or locally repairable under
edge INSERTION. SCC is harder: one inserted edge can merge a chain
of k SCCs into one (the whole condensation path from head to tail
collapses), and the affected region is bounded only by the
condensation DAG's reachability between the new edge's endpoints —
there is no frontier-local bound like the k-core eligibility filter.
The bounded design IS condensation-DAG maintenance under insert-only
edges (round-13 VERDICT stretch item, now implemented): insert-only
batches can only MERGE SCCs, never split them, and every NEW cycle
must traverse at least one new inter-component edge. So the merge
set is confined to {components reachable from some new edge's head}
∩ {components that reach some new edge's tail} over the CONDENSED
graph — one forward + one backward multi-source BFS, usually orders
smaller than the node graph — and the full FB kernel runs only on
that candidate-induced condensed subgraph. That is Θ(condensed
reachable set) per batch, still worst-case O(whole DAG) — the same
floor the literature hits (incremental SCC via sparse topological
maintenance). Edge DELETION stays an explicit non-goal (a delete can
split an SCC, and the repair is a full recompute of the affected
component); the supported steady state for deletes is: recompute on
demand with the one-shot kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import fresh_local_checkpoint


def _reach_parts(
    pe: DataFrame, seeds: DataFrame, max_rounds: int, direction: str
) -> DataFrame:
    """(part, node) reachable from each part's seed following edge
    direction, all parts in the same BFS rounds; ``pe`` is the
    within-part edge relation (part, u, v), ``seeds`` is (part, node).
    Raises when ``max_rounds`` is exhausted with a non-empty frontier —
    a partial reach would silently split an SCC."""
    seen = seeds.select("part", "node").transform(fresh_local_checkpoint)
    frontier = seen
    for _ in range(max_rounds):
        nxt = (
            pe.join(
                frontier.withColumnRenamed("node", "u"), ["part", "u"]
            )
            .select("part", F.col("v").alias("node"))
            .distinct()
            .join(seen, ["part", "node"], "left_anti")
            .transform(fresh_local_checkpoint)
        )
        if nxt.isEmpty():
            return seen
        seen = seen.unionByName(nxt).transform(fresh_local_checkpoint)
        frontier = nxt
    raise RuntimeError(
        f"SCC {direction} reachability did not converge within "
        f"{max_rounds} BFS rounds (frontier still non-empty); raise "
        "max_bfs_rounds — a partial reachable set would mislabel an SCC"
    )


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_phases: int = 64,
    max_bfs_rounds: int = 64,
    max_wcc_iter: int = 64,
) -> DataFrame:
    """(node, scc) for every node appearing in ``edges``; ``scc`` = min
    node id in the strongly connected component.

    ``max_phases`` bounds the three-way-split phase count (splits
    multiply parts, so phases grow ~logarithmically in the number of
    non-trivial SCCs per weak component); ``max_bfs_rounds`` bounds
    each reachability sweep (largest part's directed diameter);
    ``max_wcc_iter`` bounds the undirected pre-decomposition. All
    three RAISE on exhaustion rather than returning a partial answer.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).distinct().transform(fresh_local_checkpoint)
    from .components import connected_components

    # 0. partition init: WCC labels (min member) — no SCC spans WCCs
    parts = (
        connected_components(e, src="u", dst="v", max_iter=max_wcc_iter)
        .select("node", F.col("component").alias("part"))
        .transform(fresh_local_checkpoint)
    )
    done: list[DataFrame] = []
    for _ in range(max_phases):
        if parts.isEmpty():
            break
        # within-part edge view (parts partition the remaining nodes,
        # so each original edge survives in at most one part)
        pe = (
            e.join(
                parts.select(
                    F.col("node").alias("u"), F.col("part").alias("pu")
                ),
                "u",
            )
            .join(
                parts.select(
                    F.col("node").alias("v"), F.col("part").alias("pv")
                ),
                "v",
            )
            .filter(F.col("pu") == F.col("pv"))
            .select(F.col("pu").alias("part"), "u", "v")
            .transform(fresh_local_checkpoint)
        )
        # 1. TRIM to fixpoint: no in- or no out-edge within the part
        while True:
            has_out = pe.select("part", F.col("u").alias("node")).distinct()
            has_in = pe.select("part", F.col("v").alias("node")).distinct()
            trivial = (
                parts.join(has_out, ["part", "node"], "left_anti")
                .union(parts.join(has_in, ["part", "node"], "left_anti"))
                .distinct()
                .transform(fresh_local_checkpoint)
            )
            if trivial.isEmpty():
                break
            done.append(
                trivial.select("node", F.col("node").alias("scc"))
            )
            parts = parts.join(
                trivial.select("node"), "node", "left_anti"
            ).transform(fresh_local_checkpoint)
            pe = (
                pe.join(
                    trivial.select(F.col("node").alias("u")),
                    "u",
                    "left_anti",
                )
                .join(
                    trivial.select(F.col("node").alias("v")),
                    "v",
                    "left_anti",
                )
                .transform(fresh_local_checkpoint)
            )
        if parts.isEmpty():
            break
        # 2. PIVOT per part: deterministic-hash argmin (uniform inside
        # the part — see module docstring); F ∩ B per part is its SCC
        pivots = parts.groupBy("part").agg(
            F.min_by("node", F.md5(F.col("node").cast("string")))
            .alias("node")
        ).transform(fresh_local_checkpoint)
        fwd = _reach_parts(pe, pivots, max_bfs_rounds, "forward")
        bwd = _reach_parts(
            pe.select("part", F.col("v").alias("u"), F.col("u").alias("v")),
            pivots,
            max_bfs_rounds,
            "backward",
        )
        comp = fwd.join(
            bwd, ["part", "node"], "semi"
        ).transform(fresh_local_checkpoint)
        # scc label = min member of the peeled component (the pivot is
        # hash-chosen, so it is NOT necessarily the min)
        comp_min = comp.groupBy("part").agg(F.min("node").alias("scc"))
        done.append(comp.join(comp_min, "part").select("node", "scc"))
        # 3. THREE-WAY SPLIT: F\S, B\S, rest — new label = min node of
        # the sub-part (nodes are globally unique across parts, so the
        # min-member label is too)
        rest = parts.join(comp.select("node"), "node", "left_anti")
        tagged = (
            rest.join(
                fwd.select("node", F.lit(1).alias("__f")), "node", "left"
            )
            .join(
                bwd.select("node", F.lit(1).alias("__b")), "node", "left"
            )
            .withColumn(
                "side",
                F.when(F.col("__f").isNotNull(), F.lit(1))
                .when(F.col("__b").isNotNull(), F.lit(2))
                .otherwise(F.lit(3)),
            )
            .select("node", "part", "side")
        )
        relab = tagged.groupBy("part", "side").agg(
            F.min("node").alias("new_part")
        )
        parts = (
            tagged.join(relab, ["part", "side"])
            .select("node", F.col("new_part").alias("part"))
            .transform(fresh_local_checkpoint)
        )
    else:
        if not parts.isEmpty():
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


def scc_condense(
    edges: DataFrame, labels: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """The condensation-DAG edge relation: each edge mapped to its
    endpoints' SCC labels, self-loops (intra-SCC edges) dropped —
    (cu, cv) distinct.  One map-side pass over ``edges`` joined
    against the (node, scc) label relation; the result is
    component-sized, not node-sized."""
    lab_u = labels.select(F.col("node").alias(src), F.col("scc").alias("cu"))
    lab_v = labels.select(F.col("node").alias(dst), F.col("scc").alias("cv"))
    return (
        edges.join(lab_u, src)
        .join(lab_v, dst)
        .filter(F.col("cu") != F.col("cv"))
        .select("cu", "cv")
        .distinct()
    )


def _reach_cond(
    cond: DataFrame, seeds: DataFrame, max_rounds: int, direction: str
) -> DataFrame:
    """Multi-source BFS over the condensed edge relation (cu, cv) from
    ``seeds`` (single column ``node``); returns the distinct reachable
    component set (seeds included).  Raises when ``max_rounds`` is
    exhausted with a non-empty frontier — a partial reach could miss a
    merge and silently leave two SCCs separate."""
    seen = seeds.select("node").distinct().transform(fresh_local_checkpoint)
    frontier = seen
    for _ in range(max_rounds):
        nxt = (
            cond.join(frontier.withColumnRenamed("node", "cu"), "cu")
            .select(F.col("cv").alias("node"))
            .distinct()
            .join(seen, "node", "left_anti")
            .transform(fresh_local_checkpoint)
        )
        if nxt.isEmpty():
            return seen
        seen = seen.unionByName(nxt).transform(fresh_local_checkpoint)
        frontier = nxt
    raise RuntimeError(
        f"scc_update {direction} condensation reachability did not "
        f"converge within {max_rounds} BFS rounds (frontier still "
        "non-empty); raise max_bfs_rounds — a partial reach would miss "
        "an SCC merge"
    )


def scc_update(
    all_edges: DataFrame,
    new_edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_phases: int = 64,
    max_bfs_rounds: int = 64,
    max_wcc_iter: int = 64,
    condensed: DataFrame | None = None,
    return_condensed: bool = False,
):
    """EXACT incremental maintenance of
    ``strongly_connected_components`` under INSERT-ONLY edge batches:
    given the stored (node, scc) labels over the OLD edge set (scc =
    min member) and the batch of ``new_edges`` (``all_edges`` = old ∪
    new), produce the labels over ``all_edges`` — bit-identical to
    recomputing from scratch (test-pinned), without re-running the FB
    decomposition over the node graph.

    Insert-only means SCCs only MERGE, and every new cycle traverses
    at least one new inter-component edge, so the whole computation
    lives on the CONDENSED graph (module docstring):

    1. nodes the batch introduces found their own trivial SCC;
    2. condense ``all_edges`` through the labels (component-sized);
       batch edges whose endpoints already share an SCC are no-ops;
    3. candidate region = reach(new-edge head components, forward) ∩
       reach(new-edge tail components, backward) over the condensed
       graph — every component of every new cycle is in it, because
       following the cycle forward hits a new edge's tail and
       backward hits a new edge's head;
    4. the one-shot FB kernel runs on the candidate-induced condensed
       subgraph only; its non-trivial components are exactly the
       merge sets (any cycle there is a cycle in the full graph, and
       any new cycle lives entirely inside the candidate region);
    5. relabel: members of a merged set take the min of the merged
       components' labels — which IS the min node of the merged SCC,
       because each old label was already its component's min member.

    A batch that is entirely intra-SCC (or empty) costs two map-side
    joins and one emptiness check.  Duplicate edges are harmless.
    Edge DELETION is out of contract (module docstring) — deletes can
    split SCCs; recompute instead.  Raises on any exhausted bound,
    like the from-scratch kernel.

    ``condensed``: the prior condensation relation (cu, cv) —
    ``scc_condense(old_edges, labels)`` — maintained by the caller.
    When supplied, the per-batch pass over ``all_edges`` is skipped
    entirely and the batch costs Θ(condensation + change), never
    Θ(edges).  ``return_condensed=True`` returns ``(labels, cond)``
    where ``cond`` is the post-batch condensation (merged components
    contracted endpoint-wise — exactly ``scc_condense(all_edges,
    labels)``, test-pinned), so a steady-state maintainer can carry it
    forward without ever re-scanning the edge relation."""
    new = (
        new_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
    )
    # 1. fresh nodes found their own (trivial) SCC
    fresh = (
        new.select(F.col("u").alias("node"))
        .union(new.select(F.col("v").alias("node")))
        .distinct()
        .join(labels, "node", "left_anti")
        .withColumn("scc", F.col("node"))
    )
    lab = labels.unionByName(fresh).transform(fresh_local_checkpoint)
    # 2. condense the batch; intra-SCC edges are no-ops
    new_cond = scc_condense(new, lab, "u", "v").transform(
        fresh_local_checkpoint
    )
    if new_cond.isEmpty():
        if not return_condensed:
            return lab
        if condensed is None:
            condensed = scc_condense(
                all_edges.select(
                    F.col(src).alias("u"), F.col(dst).alias("v")
                ),
                lab, "u", "v",
            )
        return lab, condensed
    # prior condensation, maintained by the caller (Θ(change) batches)
    # or derived here with one map-side pass over the edge relation
    base_cond = (
        condensed
        if condensed is not None
        else scc_condense(
            all_edges.select(
                F.col(src).alias("u"), F.col(dst).alias("v")
            ),
            lab,
            "u",
            "v",
        )
    )
    cond = (
        base_cond.unionByName(new_cond)
        .distinct()
        .transform(fresh_local_checkpoint)
    )
    # 3. bounded candidate region over the condensed graph
    heads = new_cond.select(F.col("cv").alias("node"))
    tails = new_cond.select(F.col("cu").alias("node"))
    fwd = _reach_cond(cond, heads, max_bfs_rounds, "forward")
    bwd = _reach_cond(
        cond.select(F.col("cv").alias("cu"), F.col("cu").alias("cv")),
        tails,
        max_bfs_rounds,
        "backward",
    )
    cand = fwd.join(bwd, "node", "semi").transform(fresh_local_checkpoint)
    sub = (
        cond.join(cand.withColumnRenamed("node", "cu"), "cu", "semi")
        .join(cand.withColumnRenamed("node", "cv"), "cv", "semi")
        .select("cu", "cv")
    )
    if sub.isEmpty():
        return (lab, cond) if return_condensed else lab
    # 4. FB kernel on the candidate-induced condensed subgraph; its
    # non-trivial components are the merge sets
    comp = strongly_connected_components(
        sub,
        "cu",
        "cv",
        max_phases=max_phases,
        max_bfs_rounds=max_bfs_rounds,
        max_wcc_iter=max_wcc_iter,
    )
    sizes = comp.groupBy("scc").agg(F.count("*").alias("__n"))
    merge_map = (
        comp.join(sizes.filter(F.col("__n") > 1).select("scc"), "scc", "semi")
        .select(F.col("node").alias("__old"), F.col("scc").alias("__new"))
        .transform(fresh_local_checkpoint)
    )
    if merge_map.isEmpty():
        return (lab, cond) if return_condensed else lab
    # 5. relabel merged components (old labels are min members, so the
    # min over merged labels is the merged SCC's min member)
    out = (
        lab.join(merge_map, lab["scc"] == merge_map["__old"], "left")
        .select("node", F.coalesce("__new", "scc").alias("scc"))
    )
    if not return_condensed:
        return out
    # remap the condensation through the merges: an inter-component
    # edge whose endpoints merged becomes intra and drops; everything
    # else relabels endpoint-wise — exactly scc_condense(all, out)
    mu = merge_map.withColumnRenamed("__old", "cu").withColumnRenamed(
        "__new", "__nu"
    )
    mv = merge_map.withColumnRenamed("__old", "cv").withColumnRenamed(
        "__new", "__nv"
    )
    cond_out = (
        cond.join(mu, "cu", "left")
        .join(mv, "cv", "left")
        .select(
            F.coalesce("__nu", "cu").alias("cu"),
            F.coalesce("__nv", "cv").alias("cv"),
        )
        .filter(F.col("cu") != F.col("cv"))
        .distinct()
    )
    return out, cond_out


def scc_delete_update(
    remaining_edges: DataFrame,
    removed_edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_phases: int = 64,
    max_bfs_rounds: int = 64,
    max_wcc_iter: int = 64,
    condensed: DataFrame | None = None,
    return_condensed: bool = False,
):
    """EXACT incremental maintenance of
    ``strongly_connected_components`` under edge REMOVALS — the
    delete-side twin ``scc_update``'s contract deferred to recompute,
    now region-bounded: deletion can only SPLIT SCCs (the new graph is
    a subgraph, so every surviving cycle already existed and lay
    inside ONE old SCC — old-SCC maximality confines it there). Hence:

    - a removed edge whose endpoints lie in DIFFERENT old SCCs changes
      no membership at all (it only thins the condensation DAG);
    - a removed INTRA-SCC edge can split exactly its own SCC, and the
      split is decided by that SCC's induced subgraph alone.

    So the kernel recomputes the one-shot FB decomposition ONLY on the
    affected SCCs' induced remaining subgraph (affected = SCCs with a
    removed intra-SCC edge — change-sized), relabels their members
    (kernel labels are min-member, so they match the recompute
    bit-for-bit), demotes affected members with no surviving induced
    edge to singleton SCCs when they still appear in the graph, and
    drops any node whose LAST edge was removed (the one-shot kernel
    only labels nodes with surviving edges). Everything outside the
    affected SCCs copies through untouched — Θ(affected SCCs), plus
    one linear scan of ``remaining_edges`` to find vanished nodes.
    Bit-identical to the from-scratch kernel over the remaining set
    (test-pinned; the q277 oracle is the one-shot recursive-CTE SQL
    over the filtered edges).

    ``condensed`` / ``return_condensed``: the ``scc_update`` carried-
    condensation contract extended across deletions, so the
    Θ(condensation + change) steady state survives CDC batches. The
    maintained condensation changes in exactly three places: (a) cond
    edges incident to an AFFECTED SCC are recomputed edge-wise from
    the affected region's remaining edges through the NEW labels
    (splits re-route them); (b) a cond pair that lost one of its
    supporting inter-SCC edges survives iff another remaining edge
    still connects the same two SCCs — recomputed only for the
    removed edges' OLD (su, sv) pairs, via the source SCCs' members;
    (c) everything else copies through. ``return_condensed=True``
    returns ``(labels, cond)`` with ``cond`` ≡
    ``scc_condense(remaining_edges, new_labels)`` (test-pinned); when
    ``condensed`` is None the condensation is rebuilt from scratch.
    Removed edges absent from the old graph are harmless."""
    rem = (
        remaining_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .transform(fresh_local_checkpoint)
    )
    rm = removed_edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).distinct()
    lab_u = labels.select(F.col("node").alias("u"), F.col("scc").alias("su"))
    lab_v = labels.select(F.col("node").alias("v"), F.col("scc").alias("sv"))
    # affected SCCs: a removed edge with both endpoints in the SAME scc
    aff = (
        rm.join(lab_u, "u")
        .join(lab_v, "v")
        .filter(F.col("su") == F.col("sv"))
        .select(F.col("su").alias("scc"))
        .distinct()
        .transform(fresh_local_checkpoint)
    )
    present = (
        rem.select(F.col("u").alias("node"))
        .union(rem.select(F.col("v").alias("node")))
        .distinct()
        .transform(fresh_local_checkpoint)
    )
    # nodes whose last edge was removed drop out entirely
    gone = (
        rm.select(F.col("u").alias("node"))
        .union(rm.select(F.col("v").alias("node")))
        .distinct()
        .join(present, "node", "left_anti")
    )
    def _cond_out(new_labels, aff_df, aff_nodes_df):
        """Maintained condensation (docstring (a)-(c)); ``aff_df`` /
        ``aff_nodes_df`` may be None when no SCC split."""
        if condensed is None:
            return scc_condense(rem, new_labels, "u", "v")
        # (b) removed inter-SCC edges' old pairs: alive iff another
        # remaining edge still connects the same two (unaffected) SCCs
        cand = (
            rm.join(lab_u, "u")
            .join(lab_v, "v")
            .filter(F.col("su") != F.col("sv"))
            .select("su", "sv")
            .distinct()
            .transform(fresh_local_checkpoint)
        )
        surv = condensed
        if aff_df is not None:
            cand = cand.join(
                F.broadcast(aff_df).withColumnRenamed("scc", "su"),
                "su", "left_anti",
            ).join(
                F.broadcast(aff_df).withColumnRenamed("scc", "sv"),
                "sv", "left_anti",
            )
            surv = surv.join(
                F.broadcast(aff_df).withColumnRenamed("scc", "cu"),
                "cu", "left_anti",
            ).join(
                F.broadcast(aff_df).withColumnRenamed("scc", "cv"),
                "cv", "left_anti",
            )
        surv = surv.join(
            cand.select(
                F.col("su").alias("cu"), F.col("sv").alias("cv")
            ),
            ["cu", "cv"],
            "left_anti",
        )
        src_sccs = cand.select(F.col("su").alias("scc")).distinct()
        mem_u = labels.join(
            F.broadcast(src_sccs), "scc", "left_semi"
        ).select(F.col("node").alias("u"), F.col("scc").alias("su"))
        cand_alive = (
            rem.join(mem_u, "u")
            .join(lab_v, "v")
            .select("su", "sv")
            .join(cand, ["su", "sv"], "left_semi")
            .distinct()
            .select(F.col("su").alias("cu"), F.col("sv").alias("cv"))
        )
        parts = surv.unionByName(cand_alive)
        if aff_nodes_df is not None:
            # (a) affected region re-condensed through the NEW labels
            region_e = (
                rem.join(
                    aff_nodes_df.withColumnRenamed("node", "u"),
                    "u", "left_semi",
                )
                .unionByName(
                    rem.join(
                        aff_nodes_df.withColumnRenamed("node", "v"),
                        "v", "left_semi",
                    )
                )
                .distinct()
            )
            parts = parts.unionByName(
                scc_condense(region_e, new_labels, "u", "v")
            )
        return parts.distinct()

    if aff.isEmpty():
        out = labels.join(gone, "node", "left_anti")
        if not return_condensed:
            return out
        return out, _cond_out(out, None, None)
    aff_nodes = (
        labels.join(F.broadcast(aff), "scc", "left_semi")
        .select("node")
        .transform(fresh_local_checkpoint)
    )
    # induced same-SCC remaining subgraph of the affected SCCs — the
    # only edges that can decide the splits
    sub = (
        rem.join(lab_u, "u")
        .join(lab_v, "v")
        .filter(F.col("su") == F.col("sv"))
        .join(
            F.broadcast(aff).select(F.col("scc").alias("su")),
            "su",
            "left_semi",
        )
        .select("u", "v")
    )
    relab = strongly_connected_components(
        sub, src="u", dst="v",
        max_phases=max_phases,
        max_bfs_rounds=max_bfs_rounds,
        max_wcc_iter=max_wcc_iter,
    ).transform(fresh_local_checkpoint)
    # affected members with no surviving induced edge but still in the
    # graph become their own singleton SCC
    singles = (
        aff_nodes.join(present, "node", "left_semi")
        .join(relab, "node", "left_anti")
        .withColumn("scc", F.col("node"))
    )
    out = (
        labels.join(aff_nodes, "node", "left_anti")
        .join(gone, "node", "left_anti")
        .unionByName(relab)
        .unionByName(singles)
    )
    if not return_condensed:
        return out
    out = out.transform(fresh_local_checkpoint)
    return out, _cond_out(out, aff, aff_nodes)
