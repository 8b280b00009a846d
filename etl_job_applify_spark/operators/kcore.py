"""k-core maintenance: fixpoint peeling + EXACT incremental update
under edge arrivals.

The k-core of an undirected graph is the maximal subgraph in which
every node has degree >= k — computed by iteratively peeling nodes of
degree < k (q193/q197 run the bounded-unroll form so a SQL oracle can
replay them; ``k_core`` here runs the same peel to the FIXPOINT, with
a loud non-convergence guard).

``k_core_update`` is the insertion-only incremental kernel (the
q252/q253 discipline applied to cores): under edge ARRIVALS the k-core
can only GROW (peeling is monotone in the edge set), and every node
that joins it is connected to some new edge through other joining
nodes. Proof sketch (the correctness the tests pin): let C be the old
core and D the joining set; any D-piece with no new edge incident
would have had min degree >= k inside C ∪ piece in the OLD graph
already, contradicting C's maximality. Hence the two-phase shape:

1. GROW — BFS from the batch's endpoints (those outside C) through
   non-core nodes whose FULL degree is >= k (a necessary membership
   condition), collecting the candidate region R ⊇ D;
2. PEEL within R — a node survives iff it keeps >= k neighbors in
   C ∪ survivors; peeling R to its maximal fixpoint yields exactly D
   (any survivor set S: C ∪ S has min degree >= k, so S ⊆ D by core
   maximality; D itself satisfies the condition, so the maximal
   fixpoint contains it).

Both phases join frontier-sized relations against edge sets
pre-restricted to the candidate region (one semi-join each), so the
per-batch cost tracks the affected neighborhood, not the graph — the
steady state never re-peels history. Worst case (a batch that
bridges into a huge near-core region) degenerates toward the full
peel, which is the information-theoretic floor for exact maintenance
(Sariyüce et al., VLDB'13, make the same trade).

Duplicate batch edges (already present in the old set) are harmless:
they only enlarge R, and peel-within-R is exact for ANY R ⊇ D — which
is what lets the streaming twin (``streaming/jobs.py
run_kcore_stream``) fold at-least-once batches without a set
subtraction.

Reference parity: the reference has no graph surface (SURVEY.md §2b);
this extends the north-star graph family (q193/q197) with the
incremental steady state the 100 TB deployment needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import fresh_local_checkpoint


def _canon(
    edges: DataFrame, src: str, dst: str, assume_canonical: bool = False
) -> DataFrame:
    """Normalize to a distinct (a < b) list. ``assume_canonical`` skips
    the normalization SHUFFLE when the caller's relation already
    satisfies the contract (the triangle-kernel knob: graph state held
    by this repo's own kernels/queries is canonical by construction) —
    the caller asserts it; an ordering violation would silently
    overcount degrees, so ``SPARK_GRAFT_DEBUG_CANONICAL=1`` arms a
    per-row ``raise_error`` guard on the (a < b) invariant — one
    comparison expression inside the existing scan, zero extra jobs
    (duplicate rows, the other half of the contract, trip the kernels'
    existing size/disjointness actions)."""
    if assume_canonical:
        a = F.col(src)
        if os.environ.get("SPARK_GRAFT_DEBUG_CANONICAL") == "1":
            a = F.when(F.col(src) < F.col(dst), F.col(src)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "assume_canonical violated: edge not "
                            "(a < b)-ordered: ("
                        ),
                        F.col(src).cast("string"),
                        F.lit(", "),
                        F.col(dst).cast("string"),
                        F.lit(")"),
                    )
                )
            )
        return edges.select(a.alias("a"), F.col(dst).alias("b"))
    return (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _sym(canon: DataFrame) -> DataFrame:
    return canon.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
    assume_canonical: bool = False,
) -> DataFrame:
    """(node) members of the k-core of the undirected ``edges``,
    peeled to the FIXPOINT (empty result when no k-core exists).
    Raises on non-convergence within ``max_iter`` rounds — a silent
    bounded peel would overstate the core.

    Per-round scalars ride the degree HISTOGRAM (the q197 discipline):
    survivor count and the fixpoint test ("does anything sit below
    threshold?") are driver arithmetic over a #distinct-degrees-sized
    collect, so a round costs one degree checkpoint + one histogram
    action — no per-round keep materialization or count jobs. The
    fixpoint fires as soon as no node sits below k (equivalent to the
    classic unchanged-survivor-count test: peeling is monotone)."""
    cur = _canon(edges, src, dst, assume_canonical).transform(
        fresh_local_checkpoint
    )
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("v"))
            .unionAll(cur.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        ).localCheckpoint()
        hist = {
            int(r["d"]): int(r["n"])
            for r in deg.groupBy("d").agg(F.count("*").alias("n")).collect()
        }
        size = sum(n for d, n in hist.items() if d >= k)
        keep = deg.filter(F.col("d") >= k).select("v")
        if size == sum(hist.values()) or size == 0:
            return keep.select(F.col("v").alias("node"))
        cur = (
            cur.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .transform(fresh_local_checkpoint)
        )
    raise RuntimeError(
        f"k_core did not converge within {max_iter} rounds"
    )


def k_core_update(
    all_edges: DataFrame,
    new_edges: DataFrame,
    core_nodes: DataFrame,
    k: int,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
    assume_canonical: bool = False,
) -> DataFrame:
    """EXACT incremental k-core membership under edge arrivals: given
    the stored (node) members of the k-core over the OLD edge set and
    the batch of ``new_edges`` (``all_edges`` = old ∪ new), return the
    members over ``all_edges`` — bit-identical to
    ``k_core(all_edges, k)`` (test-pinned; the q259 oracle is q193's
    one-shot SQL). See the module docstring for the GROW/PEEL shape
    and its correctness argument. Batch edges already present in the
    old set are tolerated (they only enlarge the candidate region).

    Steady-state cost discipline (round 15): batch endpoints are
    checked against the stored core FIRST — a batch-sized anti-join —
    so the common case (every endpoint already in the core) returns
    without touching the full edge set at all; the degree aggregate
    that eligibility needs is computed only when some endpoint sits
    outside the core, and only over NON-CORE adjacency (the anti-join
    runs below the exchange, shrinking the shuffle to the non-core
    region — core nodes' degrees are never consulted). The full-graph
    normalization shuffle is skipped under ``assume_canonical``
    (see ``_canon``)."""
    C = core_nodes.select("node").transform(fresh_local_checkpoint)
    newc = _canon(new_edges, src, dst, assume_canonical)
    # seed candidates: batch endpoints OUTSIDE the stored core — a
    # batch-sized relation; empty means nothing can join (membership
    # additions are connected to the batch through non-core nodes)
    seeds0 = (
        newc.select(F.col("a").alias("node"))
        .unionAll(newc.select(F.col("b").alias("node")))
        .distinct()
        .join(C, "node", "left_anti")
        .transform(fresh_local_checkpoint)
    )
    if seeds0.isEmpty():
        return C  # batch touches only the core
    allc = _canon(all_edges, src, dst, assume_canonical).persist()
    try:
        sym = _sym(allc)
        # eligibility: outside the old core, full degree >= k — a
        # necessary condition for joining, and the GROW filter; the
        # anti-join sits BELOW the degree exchange so only non-core
        # adjacency is shuffled (degrees still count ALL neighbors)
        deg_out = (
            sym.join(C.select(F.col("node").alias("u")), "u", "left_anti")
            .groupBy("u")
            .agg(F.count("*").alias("d"))
        )
        elig = (
            deg_out.filter(F.col("d") >= k)
            .select(F.col("u").alias("node"))
            .transform(fresh_local_checkpoint)
        )
        seeds = seeds0.join(elig, "node", "left_semi").transform(
            fresh_local_checkpoint
        )
        if seeds.isEmpty():
            return C  # endpoints outside the core all sit below k
        # region-restricted adjacency: both ends eligible (candidate
        # paths never leave the eligible set) — ONE pair of semi-joins,
        # every later round scans this region-sized relation only
        sym_elig = (
            sym.join(
                elig.select(F.col("node").alias("u")), "u", "left_semi"
            )
            .join(
                elig.select(F.col("node").alias("v")), "v", "left_semi"
            )
            .transform(fresh_local_checkpoint)
        )
        # GROW: BFS closure of the seeds through eligible nodes
        region = seeds
        frontier = seeds
        for _ in range(max_iter):
            nxt = (
                sym_elig.join(
                    frontier.select(F.col("node").alias("u")),
                    "u",
                    "left_semi",
                )
                .select(F.col("v").alias("node"))
                .distinct()
                .join(region, "node", "left_anti")
                .transform(fresh_local_checkpoint)
            )
            if nxt.isEmpty():
                break
            # lazy union over already-materialized frontiers (the
            # bfs_hops discipline) — re-deriving it per round scans
            # small checkpoints, not recomputed plans
            region = region.unionByName(nxt)
            frontier = nxt
        else:
            raise RuntimeError(
                f"k_core_update grow phase exceeded {max_iter} rounds"
            )
        # support edges for the region: u in region, v anywhere (v's
        # membership is re-checked per round as survivors shrink)
        sym_r = sym.join(
            region.select(F.col("node").alias("u")), "u", "left_semi"
        ).transform(fresh_local_checkpoint)
        # PEEL region to its maximal fixpoint given C support
        surv = region
        n_prev = surv.count()
        for _ in range(max_iter):
            members_v = C.unionByName(surv).select(
                F.col("node").alias("v")
            )
            supp = (
                sym_r.join(
                    surv.select(F.col("node").alias("u")), "u", "left_semi"
                )
                .join(members_v, "v", "left_semi")
                .groupBy("u")
                .agg(F.count("*").alias("s"))
            )
            surv = (
                supp.filter(F.col("s") >= k)
                .select(F.col("u").alias("node"))
                .transform(fresh_local_checkpoint)
            )
            n_now = surv.count()
            if n_now == n_prev:
                return C.unionByName(surv)
            n_prev = n_now
        raise RuntimeError(
            f"k_core_update peel phase exceeded {max_iter} rounds"
        )
    finally:
        allc.unpersist()


def k_core_delete_update(
    remaining_edges: DataFrame,
    removed_edges: DataFrame,
    core_nodes: DataFrame,
    k: int,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
    assume_canonical: bool = False,
) -> DataFrame:
    """EXACT incremental k-core membership under edge REMOVALS — the
    GROW/PEEL machinery run in reverse: deletion can only SHRINK the
    core (peeling is monotone in the edge set), and the new core is
    the maximal S ⊆ C where every node keeps >= k neighbors in S over
    the REMAINING edges. Only nodes reachable from the removed edges'
    endpoints through consecutively-dropping nodes can leave (first
    drops must have lost an incident edge; later drops must have lost
    a surviving neighbor — induction on peel rounds), so the cascade
    is frontier-restricted: each round counts support for the CURRENT
    frontier only, drops the under-k members, and advances to their
    surviving neighbors. Θ(affected neighborhood), never a re-peel of
    history; bit-identical to ``k_core(remaining_edges, k)``
    (test-pinned; the q275 oracle is q193's one-shot SQL over the
    filtered edges).

    ``core_nodes`` is the stored core over remaining ∪ removed;
    removed edges absent from the old graph are harmless (their
    endpoints just verify their support and stay). This closes the
    forget-sweep lifecycle gap for cores: a forgotten document's
    edges leave the maintained membership with change-bounded work
    (``lifecycle.graph_forget``)."""
    C = core_nodes.select("node").transform(fresh_local_checkpoint)
    rmc = _canon(removed_edges, src, dst, assume_canonical)
    # cascade seeds: removed endpoints INSIDE the stored core — a
    # batch-sized relation, checked BEFORE any full-graph work so the
    # common case (removals never touched the core) is free
    frontier = (
        rmc.select(F.col("a").alias("node"))
        .unionAll(rmc.select(F.col("b").alias("node")))
        .distinct()
        .join(C, "node", "left_semi")
        .transform(fresh_local_checkpoint)
    )
    if frontier.isEmpty():
        return C
    allc = _canon(remaining_edges, src, dst, assume_canonical).persist()
    try:
        # adjacency restricted to the old core: support outside C is
        # irrelevant (the new core is a subset of C)
        sym_c = (
            _sym(allc)
            .join(C.select(F.col("node").alias("u")), "u", "left_semi")
            .join(C.select(F.col("node").alias("v")), "v", "left_semi")
            .transform(fresh_local_checkpoint)
        )
        surv = C
        for _ in range(max_iter):
            if frontier.isEmpty():
                return surv
            # support of each frontier node among CURRENT survivors —
            # left join so a node with zero surviving neighbors counts
            # 0 instead of vanishing from the relation
            supp = (
                sym_c.join(
                    surv.select(F.col("node").alias("u")), "u", "left_semi"
                )
                .join(
                    surv.select(F.col("node").alias("v")), "v", "left_semi"
                )
                .groupBy("u")
                .agg(F.count("*").alias("s"))
            )
            drop = (
                frontier.join(
                    supp.withColumnRenamed("u", "node"), "node", "left"
                )
                .filter(F.coalesce(F.col("s"), F.lit(0)) < k)
                .select("node")
                .transform(fresh_local_checkpoint)
            )
            if drop.isEmpty():
                return surv
            surv = surv.join(drop, "node", "left_anti").transform(
                fresh_local_checkpoint
            )
            # next frontier: the dropped nodes' surviving neighbors
            frontier = (
                sym_c.join(
                    drop.select(F.col("node").alias("u")), "u", "left_semi"
                )
                .select(F.col("v").alias("node"))
                .distinct()
                .join(surv, "node", "left_semi")
                .transform(fresh_local_checkpoint)
            )
        raise RuntimeError(
            f"k_core_delete_update cascade exceeded {max_iter} rounds"
        )
    finally:
        allc.unpersist()
