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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import fresh_local_checkpoint


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
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
) -> DataFrame:
    """(node) members of the k-core of the undirected ``edges``,
    peeled to the FIXPOINT (empty result when no k-core exists).
    Raises on non-convergence within ``max_iter`` rounds — a silent
    bounded peel would overstate the core."""
    cur = _canon(edges, src, dst).transform(fresh_local_checkpoint)
    n_prev = None
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("v"))
            .unionAll(cur.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        keep = (
            deg.filter(F.col("d") >= k)
            .select("v")
            .transform(fresh_local_checkpoint)
        )
        n_keep = keep.count()
        if n_prev is not None and n_keep == n_prev:
            # peeling is monotone: an unchanged node count means an
            # unchanged node SET, i.e. the fixpoint
            return keep.select(F.col("v").alias("node"))
        if n_keep == 0:
            return keep.select(F.col("v").alias("node"))
        cur = (
            cur.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .transform(fresh_local_checkpoint)
        )
        n_prev = n_keep
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
) -> DataFrame:
    """EXACT incremental k-core membership under edge arrivals: given
    the stored (node) members of the k-core over the OLD edge set and
    the batch of ``new_edges`` (``all_edges`` = old ∪ new), return the
    members over ``all_edges`` — bit-identical to
    ``k_core(all_edges, k)`` (test-pinned; the q259 oracle is q193's
    one-shot SQL). See the module docstring for the GROW/PEEL shape
    and its correctness argument. Batch edges already present in the
    old set are tolerated (they only enlarge the candidate region)."""
    allc = _canon(all_edges, src, dst).persist()
    try:
        C = core_nodes.select("node").transform(fresh_local_checkpoint)
        sym = _sym(allc)
        deg = sym.groupBy("u").agg(F.count("*").alias("d"))
        # eligibility: outside the old core, full degree >= k — a
        # necessary condition for joining, and the GROW filter
        elig = (
            deg.filter(F.col("d") >= k)
            .select(F.col("u").alias("node"))
            .join(C, "node", "left_anti")
            .transform(fresh_local_checkpoint)
        )
        newc = _canon(new_edges, src, dst)
        seeds = (
            newc.select(F.col("a").alias("node"))
            .unionAll(newc.select(F.col("b").alias("node")))
            .distinct()
            .join(elig, "node", "left_semi")
            .transform(fresh_local_checkpoint)
        )
        if seeds.isEmpty():
            return C  # batch touches only the core / sub-k nodes
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
            region = region.unionByName(nxt).transform(
                fresh_local_checkpoint
            )
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
    allc = _canon(remaining_edges, src, dst).persist()
    try:
        C = core_nodes.select("node").transform(fresh_local_checkpoint)
        # adjacency restricted to the old core: support outside C is
        # irrelevant (the new core is a subset of C)
        sym_c = (
            _sym(allc)
            .join(C.select(F.col("node").alias("u")), "u", "left_semi")
            .join(C.select(F.col("node").alias("v")), "v", "left_semi")
            .transform(fresh_local_checkpoint)
        )
        rmc = _canon(removed_edges, src, dst)
        frontier = (
            rmc.select(F.col("a").alias("node"))
            .unionAll(rmc.select(F.col("b").alias("node")))
            .distinct()
            .join(C, "node", "left_semi")
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
