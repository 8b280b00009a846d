"""Graph path kernels: frontier BFS and deterministic random walks.

Both operate on an undirected edge list and follow the iterative-graph
discipline established by ``queries/graphmatch.py`` (k-core / coreness /
LPA): every round's frontier is MATERIALIZED (``localCheckpoint``) so the
lineage stays O(1) per round instead of exponentiating, and every
per-round relation is keyed on the node id so the join shuffle reuses one
partitioning across rounds. On a real cluster the localCheckpoint becomes
a reliable ``checkpoint`` against the cluster checkpoint dir — the call
sites take a ``materialize`` hook for exactly that seam.

Reference parity: the reference has no graph surface at all (SURVEY.md
§2b — its only join is an upsert DELETE delegated to Postgres,
services/data_store.py:32-33); these kernels extend the north-star
analytics family (BASELINE.json) like triangles/k-core before them.

Scale notes (100 TB lens):

- BFS: each round is ONE equi-join frontier⋈edges on the node key plus a
  left-anti against the visited set — the textbook Pregel superstep in
  DataFrame form. Frontier size is bounded by the graph's expansion, not
  the input size; the visited relation grows monotonically and is
  re-materialized per round so no round re-derives prior rounds.
- Walks: one equi-join per step, constant rows per walk (n_walks rows
  flow through every step, never the whole graph). The per-step
  "coin flip" is an md5 over (src, step, dst) — a pure function of the
  edge, so the same walk is reproduced on any cluster topology and by
  the DuckDB oracle; no Math.random / non-deterministic sampling.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_checkpoint(df: DataFrame) -> DataFrame:
    from .iterate import fresh_local_checkpoint

    return fresh_local_checkpoint(df)


def undirect(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Symmetrize an (a < b) edge list into (src, dst) both directions."""
    fwd = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionAll(rev)


def bfs_hops(
    edges: DataFrame,
    source: DataFrame,
    max_hops: int,
    materialize: Callable[[DataFrame], DataFrame] = _local_checkpoint,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Single-source BFS: (node, hop) for every node first reached within
    ``max_hops`` supersteps.

    ``edges`` is an undirected (src, dst) relation (see ``undirect``);
    ``source`` is a one-column (node) relation holding the seed set —
    kept as a DataFrame so no scalar ever rides through the driver.

    ``broadcast_frontier`` (the triangles-kernel knob): hint the
    frontier and visited relations into every round's joins. AQE
    reaches the same broadcast join WITHOUT the hint, but only after
    materializing each round's shuffle stage to learn the sizes — a
    full extra stage per join per round, which at steady state is the
    per-round floor (measured 9.4 s → 5.6 s over 4 rounds on the
    sf0.1 co-purchase graph). Pass False on graphs whose reachable set
    outgrows the broadcast budget (small-world hubs): AQE then decides
    per round from runtime sizes.

    Single-action assumption: every round's frontier is materialized
    EXCEPT the final one (it feeds only the output union), so the
    returned relation is built for exactly one consuming action. A
    caller running several actions on it (count then write, say)
    recomputes the last superstep's join+distinct per action — wrap
    the result in ``materialize`` (or cache it) for multi-action use.
    """
    # NOTE on edge partitioning: pre-repartitioning edges by src was
    # measured a net LOSS here (BENCHNOTES round 8) — the frontier is
    # broadcast every round, so the edge relation is scanned from
    # its checkpoint but never reshuffled; the upfront exchange bought
    # nothing. On a cluster where frontiers outgrow the broadcast
    # threshold, materialize(edges.repartition("src")) before calling.
    # Only the FRONTIERS are materialized: each feeds two consumers
    # (the next superstep's probe and the final hop relation), so
    # without a cut its work would run twice. The visited set is a lazy
    # union over those already-materialized pieces — re-deriving it per
    # round costs a scan of small cached frontiers, not a recompute.
    _hint = F.broadcast if broadcast_frontier else (lambda df: df)
    frontier = materialize(source.select("node").distinct())
    frontiers = [frontier.withColumn("hop", F.lit(0).cast("int"))]
    visited = frontier
    for k in range(1, max_hops + 1):
        # anti-join BEFORE distinct: the superstep's join emits dsts
        # WITH multiplicity (wedge volume), and on an expanding graph
        # most of them are already visited — filtering first is a
        # broadcast-hash probe per row that shrinks the distinct's
        # hash-aggregate input (and its exchange) to the unvisited
        # remainder, instead of deduplicating the full neighbor stream
        # and discarding most of it afterwards. Set-equal either way
        # (the anti filter is row-wise). Measured sf0.1 co-purchase:
        # 1.99 -> 1.38 s warm for the 4-round BFS body.
        # The FINAL round's frontier feeds no further superstep — only
        # the output union — so it stays lazy (one consumer, computed
        # inside the caller's action; a checkpoint would add a job and
        # a cache pass for nothing).
        step = (
            _hint(frontier)
            .join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .join(_hint(visited), "node", "left_anti")
            .distinct()
        )
        nxt = materialize(step) if k < max_hops else step
        frontiers.append(nxt.withColumn("hop", F.lit(k).cast("int")))
        visited = visited.unionByName(nxt)
        frontier = nxt
    out = frontiers[0]
    for f in frontiers[1:]:
        out = out.unionByName(f)
    return out


def walk_hash(src, step: int, dst):
    """The deterministic per-transition priority: md5 over the decimal
    renderings of (src, step, dst). Both engines (Spark, DuckDB) render
    integers identically and agree on md5, so the argmin — i.e. the walk
    itself — is engine- and partitioning-independent."""
    return F.md5(
        F.concat_ws(
            ":",
            src.cast("string"),
            F.lit(str(step)),
            dst.cast("string"),
        )
    )


def deterministic_walks(
    edges: DataFrame,
    starts: DataFrame,
    n_steps: int,
    materialize: Callable[[DataFrame], DataFrame] = _local_checkpoint,
) -> DataFrame:
    """Fixed-length walks from ``starts`` (one column ``node``); at each
    step the walker moves to the neighbor minimizing ``walk_hash`` — a
    deterministic stand-in for uniform sampling with the same plan shape
    (equi-join on the position key + per-walk argmin). Returns
    (walk_id, step, node) with walk_id = the start node.

    Dead ends: a walker whose current node has no outgoing edge emits no
    further steps (its walk is shorter than ``n_steps`` — the standard
    random-walk convention, NOT an error). On an undirected graph (see
    ``undirect``) this cannot happen: the arrival edge's reverse always
    exists.
    """
    cur = starts.select(
        F.col("node").alias("walk_id"), F.col("node")
    )
    out = cur.withColumn("step", F.lit(0).cast("int"))
    for s in range(n_steps):
        cur = (
            cur.join(edges, cur["node"] == edges["src"])
            .groupBy("walk_id")
            .agg(
                F.min_by(
                    "dst", walk_hash(F.col("src"), s, F.col("dst"))
                ).alias("node")
            )
        )
        cur = materialize(cur)
        out = out.unionByName(
            cur.withColumn("step", F.lit(s + 1).cast("int"))
        )
    return out.select("walk_id", "step", "node")


def weighted_sssp(
    edges: DataFrame,
    source: DataFrame,
    max_rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    materialize: Callable[[DataFrame], DataFrame] = _local_checkpoint,
) -> DataFrame:
    """Bounded-horizon single-source shortest paths: (node, cost) with
    ``cost`` = minimum total edge weight over DIRECTED paths of at most
    ``max_rounds`` edges from the seed set — the weighted twin of
    ``bfs_hops`` (Bellman-Ford relaxation rounds, the distributed SSSP
    shape).

    The horizon is part of the SEMANTICS, not a convergence kludge:
    "cheapest route within at most H legs" is exact and well-defined on
    any graph (negative-cycle-proof by construction), and with
    ``max_rounds >= |V| - 1`` and non-negative weights it degenerates
    to classic SSSP. Each round relaxes every edge from the full
    current frontier (dist ⋈ edges → min per destination, then
    elementwise min with the previous distances); rounds stop early
    when a relaxation improves nothing. The improvement flag is
    computed from the RELAXED relation against the prior distances
    (relaxed rows whose cost beats — or first reaches — their node),
    never by self-joining the new distance relation against the old
    one: the relaxed aggregate carries fresh attribute ids, so the
    check stays unambiguous even under a pass-through ``materialize``
    that does not truncate lineage. One ``materialize`` per round
    truncates lineage (the bfs_hops discipline) and SHOULD on a real
    cluster (a checkpoint keeps the per-round plan O(1)), but
    correctness no longer depends on it.

    ``source``: one-column (node) relation — seeds enter at cost 0; no
    scalar rides the driver. Weights ride as-is (integer weights keep
    the result bit-exact across engines)."""
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
        F.col(weight).alias("w"),
    )
    dist = materialize(
        source.select(F.col("node")).distinct().withColumn(
            "cost", F.lit(0).cast("bigint")
        )
    )
    for _ in range(max_rounds):
        relaxed = materialize(
            e.join(dist, e.u == dist.node)
            .select(
                F.col("v").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        improved = relaxed.join(
            dist.withColumnRenamed("cost", "__old"), "node", "left"
        ).filter(
            F.col("__old").isNull() | (F.col("cost") < F.col("__old"))
        )
        if improved.isEmpty():
            break
        dist = materialize(
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
    return dist


def sssp_profile(
    edges: DataFrame,
    source: DataFrame,
    horizon: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    materialize: Callable[[DataFrame], DataFrame] = _local_checkpoint,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """The horizon PROFILE of ``weighted_sssp``: (node, h, cost) with
    ``cost`` = min total weight over directed paths of at most ``h``
    edges from the seed set, for EVERY h in 0..``horizon`` — one level
    per Bellman-Ford round, no early stop (converged levels repeat, so
    every level is present and exact). The h=``horizon`` slice equals
    ``weighted_sssp(edges, source, horizon)``.

    The profile is what makes the bounded-horizon semantics
    INCREMENTALLY maintainable under a growing edge set
    (``sssp_profile_update``): dist_h depends only on dist_{h-1} and
    the edges, so a new edge's effect cascades level by level from
    exactly the entries it improves — the state a streaming SSSP keeps
    (``streaming/jobs.py run_sssp_stream``).

    ``broadcast_frontier``: hint the distance relation into each
    round's relax join (AQE reaches the same broadcast only after
    materializing the shuffle stage per round — the bfs_hops
    measurement). The relation is bounded by the REACHED set, not a
    one-hop frontier: pass False on graphs whose reachable set is past
    the broadcast budget and let AQE decide per round.

    Single-action assumption (the bfs_hops note): the FINAL level is
    left lazy — multi-action callers should materialize the result."""
    _hint = F.broadcast if broadcast_frontier else (lambda df: df)
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
        F.col(weight).alias("w"),
    )
    cur = materialize(
        source.select(F.col("node")).distinct().withColumn(
            "cost", F.lit(0).cast("bigint")
        )
    )
    levels = [cur.withColumn("h", F.lit(0).cast("int"))]
    for h in range(1, horizon + 1):
        relaxed = (
            e.join(_hint(cur), e.u == cur.node)
            .select(
                F.col("v").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        # the final level feeds only the output union (no further
        # relax round): leave it lazy — one consumer, no checkpoint
        step = (
            cur.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        cur = materialize(step) if h < horizon else step
        levels.append(cur.withColumn("h", F.lit(h).cast("int")))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("node", "h", "cost")


def sssp_profile_update(
    all_edges: DataFrame,
    new_edges: DataFrame,
    profile: DataFrame,
    source: DataFrame,
    horizon: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    materialize: Callable[[DataFrame], DataFrame] = _local_checkpoint,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """EXACT incremental maintenance of ``sssp_profile`` under edge
    arrivals: given the stored profile over the OLD edge set and the
    batch of ``new_edges`` (``all_edges`` = old ∪ new), produce the
    profile over ``all_edges`` — bit-identical to recomputing
    ``sssp_profile(all_edges, source, horizon)`` from scratch (pinned
    by tests), but each level relaxes only

    - the stored level h-1 against the NEW edges (the batch's direct
      effect), and
    - the IMPROVED h-1 entries (new < stored, or newly reachable)
      against ALL edges (the cascade),

    never the full stored level against the full old edge set — whose
    result the stored level h already contains by the Bellman-Ford
    recurrence. Work per level is proportional to the improvement
    frontier, so a batch that changes nothing costs ``horizon`` empty
    joins, and a batch of new cheap lanes re-relaxes only the paths
    they actually shorten — the 100 TB property (re-running the full
    Bellman-Ford per micro-batch would scan every edge every round).

    Duplicate edges in ``new_edges`` (already in the old set) are
    harmless: their relaxations reproduce stored costs and improve
    nothing. Seeds are fixed; ``source`` must be the founding seed
    relation.

    ``broadcast_frontier``: hint the BATCH-derived relations — the new
    edges and the per-level improvement frontier, both small by the
    incremental premise — into the joins against graph-sized
    relations, collapsing the per-level AQE size-probe stages (the
    triangle_update knob). Pass False for bulk loads whose batch is
    itself past the broadcast budget."""
    _hint = F.broadcast if broadcast_frontier else (lambda df: df)
    e_all = all_edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
        F.col(weight).alias("w"),
    )
    e_new = new_edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
        F.col(weight).alias("w"),
    )
    cur = materialize(
        source.select(F.col("node")).distinct().withColumn(
            "cost", F.lit(0).cast("bigint")
        )
    )
    # h=0 never changes (seeds are fixed); improvements start empty
    improved = cur.filter(F.lit(False))
    levels = [cur.withColumn("h", F.lit(0).cast("int"))]
    for h in range(1, horizon + 1):
        stored_h = profile.filter(F.col("h") == h).select("node", "cost")
        stored_prev = profile.filter(F.col("h") == h - 1).select(
            "node", "cost"
        )
        cand_new = (
            _hint(e_new).join(stored_prev, e_new.u == stored_prev.node)
            .select(
                F.col("v").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        cand_cascade = (
            e_all.join(_hint(improved), e_all.u == improved.node)
            .select(
                F.col("v").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        # Only the IMPROVEMENT FRONTIER is materialized per level —
        # Θ(frontier), the incremental premise — never the full
        # node-sized running level (which the stored profile already
        # holds): the candidate min per node (carried h-1 improvements
        # are themselves level-h candidates — the profile is monotone
        # in h) is compared against the stored level, and only rows
        # that beat it (or first reach their node) survive. The full
        # level is DERIVED lazily as stored ⊕ improvements for the
        # output union, so a no-op batch materializes `horizon` empty
        # relations instead of `horizon` full node sets.
        improved = materialize(
            improved.unionByName(cand_new)
            .unionByName(cand_cascade)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .join(
                stored_h.withColumnRenamed("cost", "__old"),
                "node",
                "left",
            )
            .filter(
                F.col("__old").isNull() | (F.col("cost") < F.col("__old"))
            )
            .select("node", "cost")
        )
        levels.append(
            stored_h.join(_hint(improved), "node", "left_anti")
            .unionByName(improved)
            .withColumn("h", F.lit(h).cast("int"))
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("node", "h", "cost")
