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
(|E| ≳ 10⁸) pass False and the wedges shuffle on (u, w). The same knob
gates the degree-table hints: deg is O(|V|) ≤ O(|E|) rows, so any graph
too big to broadcast its edge set is also past hinting its degree table
— with the knob off, NO unconditional broadcast remains and AQE picks
broadcast only when the runtime size is under budget.

``approx_triangle_stats`` is the scale-safe twin: Doulion edge sampling
(Tsourakakis et al., KDD'09 — keep each edge with probability p, count
triangles on the sample, scale by 1/p³). Wedge volume shrinks ~p², so
p=0.25 cuts the dominant join ~16x. The sampler is a PORTABLE integer
hash (multiply-mod arithmetic, no engine-specific hash function), so an
external SQL engine can re-derive the exact same sample and estimate —
the property twin in queries/verification.py pins the relative error
against the exact kernel.
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
    method: str = "intersect",
) -> TriangleStats:
    """Count triangles in the undirected edge list ``pairs`` (columns
    ``a``, ``b``; callers pass a deduplicated, self-loop-free list —
    normalize with least/greatest + distinct upstream).

    ``method`` picks the counting join over the SAME oriented edges
    (identical counts, different cost/robustness trade):

    - ``"intersect"`` (default): edge-iterator — build each node's
      sorted IN-neighbor array once, then for every closing edge
      (u, w) count ``|N_in(u) ∩ N_in(w)|`` with ``array_intersect``.
      Work is Σ_edges (d_in(u) + d_in(w)) tight array operations
      instead of Σ C(d_out, 2) materialized wedge ROWS — measured
      8.4 s → 4.8 s (3-pass medians, sf0.1 co-purchase graph).
      Caveat: a hub's in-degree is NOT bounded by the orientation (its
      edges all point into it), so one row carries a d(hub)-sized
      array; on graphs with 10⁷⁺-degree celebrities pass ``max_degree``
      or use ``method="wedge"``.
    - ``"wedge"``: the Schank/Wagner wedge join — generate oriented
      wedges (per-key fanout ≤ O(√|E|) regardless of hubs) and probe
      the closing-edge set. Hub-robust without capping; pays one row
      per wedge.

    Materialization discipline (round-15 measurement, guide §1/§2.4):
    every relation consumed by more than one subtree is
    ``localCheckpoint``-ed ONCE — ``pairs`` (feeds deg, orientation,
    and the edge scalar), ``deg`` (two orientation hints + the
    wedge/edge aggregate), ``e`` (closing + adjacency), ``adj`` (both
    closing-join sides). A lazy ``persist`` here let the broadcast
    subtrees race on uncached partitions and the post-exchange
    aggregates re-run per consumer — the duplicated work was 2-3x the
    kernel's real cost on the bench profile. The three result scalars
    (triangles, edges, wedges) ride ONE action: the triangle aggregate
    crossJoins the degree aggregate (n_edges = Σd div 2 — exact, the
    endpoint-sum identity on a deduplicated self-loop-free list), so
    the kernel runs a fixed five jobs with zero re-derived subtrees.
    """
    pairs = pairs.localCheckpoint()
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
        .localCheckpoint()
    )
    # every hint in this kernel rides the one broadcast-budget knob:
    # deg/keep are O(|V|) rows, within budget whenever the closing
    # edge set (O(|E|)) is — and when the caller says the graph is
    # past budget, no hint is emitted and AQE decides from runtime
    # sizes instead.
    _hint = F.broadcast if broadcast_closing else (lambda df: df)
    n_capped = 0
    if max_degree is not None:
        keep = deg.filter(F.col("d") <= max_degree)
        n_capped = deg.count() - keep.count()
        if n_capped:
            pairs = (
                pairs.join(
                    _hint(keep.select(F.col("v").alias("a"))), "a",
                    "left_semi",
                )
                .join(
                    _hint(keep.select(F.col("v").alias("b"))), "b",
                    "left_semi",
                )
                .localCheckpoint()
            )
            deg = (
                pairs.select(F.col("a").alias("v"))
                .unionAll(pairs.select(F.col("b").alias("v")))
                .groupBy("v")
                .agg(F.count("*").alias("d"))
                .localCheckpoint()
            )
    e = (
        pairs.join(
            _hint(
                deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da")
            ),
            "a",
        )
        .join(
            _hint(
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
        .localCheckpoint()
    )
    closing = e.select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("w"),
    )
    if method == "intersect":
        # closing (u, w) is a triangle with every common
        # IN-neighbor x (x→u and x→w): one adjacency build,
        # two |E|-row joins, the per-edge intersection a tight
        # sorted-array loop — no wedge rows ever materialize
        adj = e.groupBy("dst").agg(
            F.sort_array(F.collect_list("src")).alias("nin")
        ).localCheckpoint()
        # adj is O(|E|) payload like the closing set, so it rides the
        # same broadcast-budget knob: hinted, the closing joins are
        # map-side over the e checkpoint (no exchange of closing)
        tri_agg = (
            closing.join(
                _hint(
                    adj.select(
                        F.col("dst").alias("u"), F.col("nin").alias("nu")
                    )
                ),
                "u",
            )
            .join(
                _hint(
                    adj.select(
                        F.col("dst").alias("w"), F.col("nin").alias("nw")
                    )
                ),
                "w",
            )
            .agg(
                F.sum(
                    F.size(F.array_intersect("nu", "nw")).cast("bigint")
                ).alias("__nt")
            )
        )
    elif method == "wedge":
        wedges = (
            e.alias("e1")
            .join(e.alias("e2"), F.col("e1.src") == F.col("e2.src"))
            .filter(F.col("e1.dst") < F.col("e2.dst"))
            # dst < dst already normalizes the wedge endpoints —
            # (u, w) = (e1.dst, e2.dst), no least/greatest
            .select(
                F.col("e1.dst").alias("u"),
                F.col("e2.dst").alias("w"),
            )
        )
        tri_agg = wedges.join(
            _hint(closing), ["u", "w"], "inner"
        ).agg(F.count("*").alias("__nt"))
    else:
        raise ValueError(f"unknown method {method!r}")
    # ONE action carries all three scalars: triangle count crossJoins
    # the degree aggregate (1-row × 1-row — the q99 scalar-branch idiom)
    scalars = deg.agg(
        F.sum("d").cast("bigint").alias("__d2"),
        F.sum(F.expr("d * (d - 1) / 2")).cast("bigint").alias("__nw"),
    )
    row = tri_agg.crossJoin(scalars).first()
    n_tri = int(row["__nt"] or 0)
    n_edges = int(row["__d2"] or 0) // 2
    n_wedges = int(row["__nw"] or 0)
    return TriangleStats(n_edges, n_tri, n_wedges, n_capped)


class TriangleCounts(NamedTuple):
    n_edges: int
    n_triangles: int
    n_wedges: int


def triangle_update(
    all_edges: DataFrame,
    new_edges: DataFrame,
    prior: TriangleCounts,
    src: str = "a",
    dst: str = "b",
    method: str = "intersect",
    broadcast_frontier: bool = True,
    assume_canonical: bool = False,
) -> TriangleCounts:
    """EXACT incremental maintenance of triangle/wedge counts under
    edge arrivals — the ``cc_update`` discipline applied to the q167
    kernel: given counts over the OLD edge set and the batch of
    ``new_edges`` (``all_edges`` = old ∪ new, old ∩ new = ∅ as SETS —
    an edge already counted must not reappear in a batch; the
    streaming twin subtracts the stored set first), produce counts
    over ``all_edges`` bit-identical to ``triangle_stats(all_edges)``
    (pinned by tests and the q258 oracle = q167's one-shot SQL).

    Delta triangles by per-new-edge common-neighbor counting with
    inclusion–exclusion on edge freshness: a new triangle with exactly
    j new edges is discovered j times, once per new edge, and each
    sighting sees j-1 new edges among the two closing it — so
    sightings bucket by that count (c0, c1, c2) and
    Δ = c0 + c1/2 + c2/3 (both divisions exact by construction).
    Delta wedges from the affected endpoints' degree changes only:
    Σ [C(d,2) − C(d−δ,2)]. The disjointness contract is ENFORCED:
    ``prior.n_edges + |batch|`` must equal ``|all_edges|`` (one count
    on the already-persisted canonical set), so a batch containing an
    already-counted edge raises instead of silently overcounting.

    Scale posture: the kernel never re-enumerates history. The
    adjacency relation is restricted to the batch's endpoint nodes by
    a semi-join (linear scan, frontier-keyed), so the exchange is
    O(Σ_{(u,v)∈B} d(u)+d(v)) — the change's neighborhood, not the
    graph. ``method`` mirrors ``triangle_stats``:

    - ``"intersect"`` (default): per batch endpoint, build SORTED
      old-/new-neighbor arrays once (one groupBy over the restricted
      adjacency), then per new edge count the three freshness buckets
      with four ``array_intersect`` calls — tight array ops instead
      of one shuffled row per common-neighbor sighting (the same
      8.4 s → 4.8 s trade the one-shot kernel measured; same hub
      caveat: one row carries a d(hub)-sized array).
    - ``"wedge"``: hub-robust sighting-row join (one row per common
      neighbor, per-key fanout never exceeds the neighborhood) —
      for graphs whose hubs are past the array budget.

    ``broadcast_frontier`` (the ``broadcast_closing`` twin): hint the
    BATCH-derived relations (endpoint set, batch edges, degree
    deltas) into every join against graph-sized relations — they are
    small by the incremental premise, and the hints collapse what
    would otherwise be a long critical path of tiny shuffle stages
    (at steady state the per-stage floor, not data volume, dominates
    a small batch's wall). Pass ``False`` when a bulk load's batch is
    itself past the broadcast budget — AQE then picks per-join from
    runtime sizes.

    ``assume_canonical``: skip the normalizing ``distinct`` shuffle
    when the caller guarantees ``all_edges`` is ALREADY the canonical
    deduplicated (a < b) relation — true for the persisted steady
    state (``run_triangle_stream`` folds with exactly that distinct).
    A violated promise cannot silently overcount: duplicate rows
    inflate ``|all_edges|`` and trip the disjointness check.

    Self-loop-free input, as for ``triangle_stats``; duplicates
    within the batch are normalized away."""
    allc = all_edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    )
    if not assume_canonical:
        allc = allc.distinct()
    allc = allc.persist()
    # the canonical batch feeds four consumers (contract count,
    # endpoint set, batch adjacency, per-edge join): checkpoint the
    # tiny relation once so its distinct never re-runs. Lifecycle of
    # this (and _batch_delta's) checkpointed blocks: released by the
    # ContextCleaner once the DataFrames are garbage-collected — the
    # kernel returns scalars, so nothing here outlives the call and a
    # long-lived streaming loop's storage is bounded by GC cadence,
    # not the loop length (batch-sized blocks; an explicit unpersist
    # would have to thread handles through _batch_delta for blocks
    # measured in KB per micro-batch).
    newc = new_edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).distinct().localCheckpoint()

    def _check(n_all: int, n_new: int) -> None:
        if prior.n_edges + n_new != n_all:
            raise ValueError(
                "triangle_update disjointness contract violated: "
                f"prior.n_edges ({prior.n_edges}) + batch ({n_new}) "
                f"!= |all_edges| ({n_all}) — a batch edge was already "
                "counted in `prior` (or all_edges is missing old "
                "edges); pass only edges absent from the old set"
            )

    try:
        n_all, n_new, delta_tri, delta_wedges = _batch_delta(
            allc, newc, method, broadcast_frontier, _check, delete=False
        )
        return TriangleCounts(
            prior.n_edges + n_new,
            prior.n_triangles + delta_tri,
            prior.n_wedges + delta_wedges,
        )
    finally:
        allc.unpersist()


def triangle_delete_update(
    all_edges: DataFrame,
    removed_edges: DataFrame,
    prior: TriangleCounts,
    src: str = "a",
    dst: str = "b",
    method: str = "intersect",
    broadcast_frontier: bool = True,
    assume_canonical: bool = False,
) -> TriangleCounts:
    """EXACT decremental twin of ``triangle_update``: given counts
    over ``all_edges`` (the OLD graph) and a batch of
    ``removed_edges``, return counts over ``all_edges`` minus the
    batch — bit-identical to ``triangle_stats`` on the remaining set
    (test-pinned; the q274 oracle is q167's one-shot SQL over the
    filtered edges). Removed edges absent from ``all_edges`` are
    ignored (deleting a non-edge is a no-op — the forget sweep derives
    its edge set from the stored graph, but a redelivered batch must
    not fail).

    The whole insertion machinery is reused with the roles swapped:
    the triangles LOST are exactly the old graph's triangles
    containing >= 1 removed edge, which is the same freshness delta
    ``triangle_update`` computes when "inserting" the removed set into
    the remaining graph — so the kernel is the insertion path plus one
    batch-sized semi-join restricting removals to live edges,
    frontier-restricted to the removed edges' endpoint neighborhoods. This closes the lifecycle gap the forget
    sweep opened: a forgotten document's co-occurrence edges leave the
    maintained counts with Θ(change-neighborhood) work, never a
    recount of history."""
    allc = all_edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    )
    if not assume_canonical:
        allc = allc.distinct()
    allc = allc.persist()
    rmc = removed_edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).distinct()

    def _check(n_all: int, n_rm: int) -> None:
        if prior.n_edges != n_all:
            raise ValueError(
                "triangle_delete_update contract violated: "
                f"prior.n_edges ({prior.n_edges}) != |all_edges| "
                f"({n_all}) — `prior` must be the counts over "
                "`all_edges` (the graph BEFORE the removal)"
            )

    try:
        n_all, n_rm, delta_tri, delta_wedges = _batch_delta(
            allc, rmc, method, broadcast_frontier, _check, delete=True
        )
        return TriangleCounts(
            n_all - n_rm,
            prior.n_triangles - delta_tri,
            prior.n_wedges - delta_wedges,
        )
    finally:
        allc.unpersist()


def _batch_delta(
    allc: DataFrame,
    newc: DataFrame,
    method: str,
    broadcast_frontier: bool,
    check=None,
    delete: bool = False,
):
    """Shared batch-delta kernel behind ``triangle_update`` /
    ``triangle_delete_update``: return ``(n_all, n_batch, delta_tri,
    delta_wedges)`` where the deltas are the triangle/wedge counts of
    canonical ``allc`` minus those of ``allc`` without the batch edges
    (inclusion–exclusion on edge freshness — module docstring).
    ``check(n_all, n_batch)`` runs after the contract action so a
    violation aborts before the delta job.

    Shape discipline (round-15 rework, guide §2.3/§2.4): every
    batch-derived relation — the batch itself, its endpoint set, its
    adjacency — is built from the BATCH relation (tiny by the
    incremental premise), never by re-scanning a graph-sized flagged
    relation; the freshness flag rides the single restricted-adjacency
    pass as a batch-adjacency broadcast lookup. The old shape flagged
    the full graph into a persisted relation and derived everything
    from it: on a dense graph whose batch endpoints touch most nodes
    that cost one graph-sized cache write plus FIVE graph-sized scans
    (three of them inside broadcast builds); this shape scans the
    graph exactly twice on the insert path (contract count + the
    adjacency union) and three times on the delete path (one semi-join
    restricting removals to live edges), with nothing graph-sized ever
    persisted or broadcast. Measured sf0.1 co-purchase (941k edges,
    ~1.6% batch): task time 15.8 → 7.4 s, warm wall 2.4 → 1.5 s,
    outputs bit-identical.

    ``delete``: restrict the batch to edges present in ``allc`` first
    (removals of absent edges are ignored — the idempotent-redelivery
    contract); on the insert path the caller's contract (batch ⊆ all,
    disjoint from prior) makes the batch usable as-is, and violations
    still raise: a single lie trips ``check`` (set sizes no longer
    add up), and compensating lies trip the flagged-edge-sum guard in
    the delta action (Σ per-endpoint new-neighbor degree must equal
    2·n_batch — exact iff every batch edge is live)."""
    _hint = F.broadcast if broadcast_frontier else (lambda df: df)
    if delete:
        # job #1 (delete only): removals restricted to live edges —
        # batch-sized output, checkpointed once for its four consumers
        new = allc.join(
            _hint(newc), ["a", "b"], "left_semi"
        ).localCheckpoint()
    else:
        new = newc
    # contract scalars ride ONE action (two 1-row aggregates
    # crossJoined — the q99 scalar-branch idiom)
    row = (
        allc.agg(F.count("*").alias("n_all"))
        .crossJoin(new.agg(F.count("*").alias("n_new")))
        .first()
    )
    n_all, n_new = int(row["n_all"]), int(row["n_new"] or 0)
    if check is not None:
        check(n_all, n_new)
    endpoints = (
        new.select(F.col("a").alias("node"))
        .unionAll(new.select(F.col("b").alias("node")))
        .distinct()
    )
    # batch adjacency: the freshness flag's lookup side (batch-sized)
    badj = (
        new.select(F.col("a").alias("node"), F.col("b").alias("x"))
        .unionAll(
            new.select(F.col("b").alias("node"), F.col("a").alias("x"))
        )
        .withColumn("__f", F.lit(1))
    )
    adj = allc.select(
        F.col("a").alias("node"), F.col("b").alias("x")
    ).unionAll(
        allc.select(F.col("b").alias("node"), F.col("a").alias("x"))
    )
    # frontier restriction: only batch endpoints' neighborhoods ever
    # leave the scan; the freshness flag is a broadcast lookup against
    # the batch adjacency, fused into the same pass
    adj_e = (
        adj.join(_hint(endpoints), "node", "left_semi")
        .join(_hint(badj), ["node", "x"], "left")
        .select("node", "x", F.coalesce("__f", F.lit(0)).alias("f"))
    )
    if method == "intersect":
        # one sorted old-/new-neighbor array pair per endpoint;
        # per new edge the three freshness buckets are four array
        # intersections — no per-sighting rows ever shuffle.
        # nbrs feeds THREE consumers (the per-edge join's a-side
        # and b-side, and the wedge-delta aggregate): checkpoint
        # it once — exchange reuse only shares the shuffle WRITE,
        # the post-exchange collect_list+sort aggregation re-runs
        # per consumer without the cut (measured 3x the batch
        # neighborhood aggregation on the round-15 bench profile).
        # Still Θ(batch neighborhood) state, one extra bounded job.
        nbrs = adj_e.groupBy("node").agg(
            F.array_sort(
                F.collect_list(F.when(F.col("f") == 0, F.col("x")))
            ).alias("n_old"),
            F.array_sort(
                F.collect_list(F.when(F.col("f") == 1, F.col("x")))
            ).alias("n_new"),
        ).localCheckpoint()
        per_edge = (
            _hint(
                _hint(new).join(
                    nbrs.select(
                        F.col("node").alias("a"),
                        F.col("n_old").alias("uo"),
                        F.col("n_new").alias("un"),
                    ),
                    "a",
                )
            )
            .join(
                nbrs.select(
                    F.col("node").alias("b"),
                    F.col("n_old").alias("vo"),
                    F.col("n_new").alias("vn"),
                ),
                "b",
            )
            .select(
                F.size(F.array_intersect("uo", "vo")).alias("j0"),
                (
                    F.size(F.array_intersect("uo", "vn"))
                    + F.size(F.array_intersect("un", "vo"))
                ).alias("j1"),
                F.size(F.array_intersect("un", "vn")).alias("j2"),
            )
        )
        tri_agg = per_edge.agg(
            F.sum("j0").alias("c0"),
            F.sum("j1").alias("c1"),
            F.sum("j2").alias("c2"),
        )
        # the SAME nbrs aggregate carries the wedge delta: per
        # endpoint d = full degree, delta = new-edge count, so no
        # second pass over the adjacency is ever planned (AQE
        # reuses the one groupBy exchange across both branches).
        # Σ delta doubles as the flagged-edge-sum guard (docstring).
        wedge_agg = nbrs.select(
            (F.size("n_old") + F.size("n_new")).alias("d"),
            F.size("n_new").alias("delta"),
        ).agg(
            F.sum(
                F.expr(
                    "(d * (d - 1) - (d - delta) * (d - delta - 1))"
                    " div 2"
                ).cast("bigint")
            ).alias("dw"),
            F.sum("delta").cast("bigint").alias("__fsum"),
        )
    elif method == "wedge":
        # adj_e feeds three consumers on this path (both sighting
        # sides + the wedge aggregate) — same cut as nbrs above
        adj_e = adj_e.localCheckpoint()
        sightings = (
            _hint(new).join(
                adj_e.select(
                    F.col("node").alias("a"),
                    F.col("x").alias("x"),
                    F.col("f").alias("fu"),
                ),
                "a",
            )
            .filter(F.col("x") != F.col("b"))
            .join(
                adj_e.select(
                    F.col("node").alias("b"),
                    F.col("x").alias("x"),
                    F.col("f").alias("fv"),
                ),
                ["b", "x"],
            )
        )
        j = (F.col("fu") + F.col("fv"))
        tri_agg = sightings.agg(
            F.sum(F.when(j == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(j == 1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(j == 2, 1).otherwise(0)).alias("c2"),
        )
        # wedge delta without arrays (the hub-robust premise): one
        # count/sum aggregate over the restricted adjacency
        wedge_agg = adj_e.groupBy("node").agg(
            F.count("*").alias("d"),
            F.sum("f").alias("delta"),
        ).agg(
            F.sum(
                F.expr(
                    "(d * (d - 1) - (d - delta) * (d - delta - 1))"
                    " div 2"
                ).cast("bigint")
            ).alias("dw"),
            F.sum("delta").cast("bigint").alias("__fsum"),
        )
    else:
        raise ValueError(
            f"unknown method {method!r} (use 'intersect' or 'wedge')"
        )
    # both 1-row aggregates ride ONE action — the crossJoin of two
    # scalar branches, the q99/q102 idiom
    row = tri_agg.crossJoin(wedge_agg).first()
    c0, c1, c2 = (int(row[k] or 0) for k in ("c0", "c1", "c2"))
    delta_wedges = int(row["dw"] or 0)
    if int(row["__fsum"] or 0) != 2 * n_new:
        # insert path only (delete restricts to live edges upfront):
        # a batch edge absent from all_edges — the endpoint-sum
        # identity over the flagged adjacency no longer closes
        raise ValueError(
            "triangle batch-delta contract violated: "
            f"{n_new} batch edges but Σ flagged endpoint degree = "
            f"{int(row['__fsum'] or 0)} (expected {2 * n_new}) — a "
            "batch edge is not present in all_edges"
        )
    if c1 % 2 or c2 % 3:  # cannot happen on normalized input
        raise AssertionError(
            f"non-integral triangle sightings (c1={c1}, c2={c2})"
        )
    delta_tri = c0 + c1 // 2 + c2 // 3
    return n_all, n_new, delta_tri, delta_wedges


class ApproxTriangleStats(NamedTuple):
    n_sampled_edges: int
    n_triangles_sampled: int   # exact count on the sampled subgraph
    n_triangles_est: int       # Doulion estimate: sampled / p^3


#: sampling hash modulus — a QUADRATIC form over the edge key in pure
#: BIGINT arithmetic, so ANY engine re-derives the identical sample (no
#: xxhash64/murmur dependency). A linear hash (a*K1 + b*K2) is WRONG
#: here: a triangle's three edges are affine offsets of each other under
#: it, so "two edges sampled" makes the third far likelier than p and
#: the estimate blows up 2-3x (measured). The a², b², a·b terms break
#: that affinity (err ≤ 1% at p=0.25 on 10⁵+-triangle graphs). The node
#: ids are reduced mod 2^31 BEFORE the quadratic terms (congruent to
#: the unreduced form, but raw ids ≥ ~3.04e9 would overflow int64 in
#: a·a, where Spark wraps and ANSI engines error/diverge), and each
#: term is reduced again before the next multiply — so no intermediate
#: leaves int64 for ANY bigint node id.
SAMPLE_MOD = 2_147_483_648  # 2^31


def edge_sample_predicate(p: float) -> F.Column:
    """Deterministic keep-with-probability-``p`` predicate on edge
    columns (a, b): quadratic-form hash < p·2^31, identical arithmetic
    in Spark SQL and ANSI SQL engines (see SAMPLE_MOD note)."""
    m = SAMPLE_MOD
    ka = f"pmod(cast(a AS BIGINT), {m})"
    kb = f"pmod(cast(b AS BIGINT), {m})"
    return F.expr(
        f"pmod(pmod(pmod({ka} * {ka}, {m}) * 1220703125, {m})"
        f" + pmod(pmod({kb} * {kb}, {m}) * 1864987861, {m})"
        f" + pmod(pmod({ka} * {kb}, {m}) * 987654323, {m}),"
        f" {m}) < {int(p * m)}"
    )


def approx_triangle_stats(
    pairs: DataFrame,
    p: float = 0.5,
    max_degree: int | None = None,
    broadcast_closing: bool = True,
    method: str = "intersect",
) -> ApproxTriangleStats:
    """Doulion approximate triangle count (Tsourakakis et al., KDD'09):
    keep each edge independently with probability ``p`` (deterministic
    hash — the sample is a pure function of the edge list), count
    triangles EXACTLY on the sampled subgraph with the degree-ordered
    kernel, scale by 1/p³. Each surviving edge's endpoints shrink their
    degree ~p, so the dominant Θ(Σ d_out²) wedge join shrinks ~p².
    Default p=0.5 (a ~4x join cut) because basket-derived graphs are
    clique-heavy and triangles sharing an edge co-vary, inflating the
    Doulion variance well past the independent-triangle bound at small
    T; p=0.25 (a ~16x cut) is the right setting once the graph has
    ≥ ~10⁶ triangles. The q189 property twin pins the ≤10% relative
    error at every test SF.

    With p = 1/2^k the scale factor 1/p³ is an exact integer, so the
    estimate is integer arithmetic an external oracle reproduces bit-
    for-bit.
    """
    sampled = pairs.filter(edge_sample_predicate(p))
    st = triangle_stats(
        sampled,
        max_degree=max_degree,
        broadcast_closing=broadcast_closing,
        method=method,
    )
    est = int(round(st.n_triangles / (p ** 3)))
    return ApproxTriangleStats(st.n_edges, st.n_triangles, est)
