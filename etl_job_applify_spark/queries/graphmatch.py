"""Entity resolution, table auditing, and iterative algorithms.

- q125 blocked fuzzy matching (record linkage): dirty strings resolve to
  canonical records via blocking + edit distance — the ETL step that
  reconciles free-text keys across systems. The blocked join is the
  scale pattern: candidates = block-equijoin (shuffle on block key),
  NEVER the all-pairs cross join; levenshtein runs only inside blocks.
- q126 PageRank over the event-type transition graph, five power
  iterations UNROLLED as chained CTEs — iterative algorithms as plain
  dataflow, the same SQL text on both engines. Per-iteration
  contributions accumulate in DECIMAL (associative) so the result is
  bit-identical at any parallelism; the closed recursion alternative
  stays q60-style label propagation (Spark's recursive CTE bars
  aggregates in the recursive term, as do most engines).
- q127 snapshot diff / changelog generation (added-removed-changed
  audit over a full outer key join).
- q128 CDC apply-changes: change log → final state by last-writer-wins
  with delete filtering (batch twin of the foreachBatch CDC sink).
- q129 distributed k-means, two unrolled Lloyd iterations with
  reproducible (decimal-accumulated) assignments. The exploded
  (vec, dim, x) relation keeps it SQL-oracle-checkable; a 100 TB run
  keeps vectors as arrays and computes distances with the q34-style
  zip_with/aggregate fold against broadcast centroids — same
  arithmetic, |vectors| rows instead of |vectors|×dims.

Reference scope note: the reference has no analytics surface
(services/post_processing.py:5-8 is a `pass` stub); these extend the
demanded-category rows (SURVEY §2b) into the entity-resolution and
graph-scoring territory a warehouse-grade engine is expected to cover.

Determinism: levenshtein is exact integer edit distance (identical in
Spark and DuckDB — verified); ranking tiebreaks on the unique customer
key; PageRank's per-edge products are deterministic double ops and the
cross-row sums go through DECIMAL(28,15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation

from ._util import tbl
from ..operators.iterate import fresh_local_checkpoint


def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        tbl(spark, sf_dir, n).createOrReplaceTempView(n)


# --- q125: blocked fuzzy matching (entity resolution) --------------------
# Probe set = every 7th customer with its name corrupted ('#00' → '#OO',
# the classic OCR/data-entry zero/oh confusion, 2 edits). Blocking key =
# last 4 characters (digits the corruption never touches), so candidate
# pairs are block-local; edit distance ≤ 2 then picks the real match.
# Plan: one shuffle on the block key; block sizes are bounded by the key
# cardinality (10^4 suffixes), so no block degenerates toward the
# quadratic all-pairs the un-blocked form would be. row_number keeps the
# single best (distance, key) candidate per probe.

_Q125_SQL = """
WITH dirty AS (
  SELECT c_custkey AS dirty_id,
         replace(c_name, '#00', '#OO') AS dirty_name,
         right(c_name, 4) AS blk
  FROM customer WHERE c_custkey % 7 = 0
),
cand AS (
  SELECT dirty_id, dirty_name, c_custkey AS matched_id,
         levenshtein(dirty_name, c_name) AS dist
  FROM dirty JOIN customer ON right(c_name, 4) = blk
  WHERE levenshtein(dirty_name, c_name) <= 2
),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_id
                               ORDER BY dist, matched_id) AS rn
  FROM cand
)
SELECT dirty_id, dirty_name, matched_id, dist
FROM best WHERE rn = 1
"""


def q125_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame formulation (blocking equi-join → levenshtein filter →
    window best-pick); the SQL above runs only in DuckDB."""
    from pyspark.sql.window import Window

    customer = tbl(spark, sf_dir, "customer")
    dirty = customer.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        F.replace(
            F.col("c_name"), F.lit("#00"), F.lit("#OO")
        ).alias("dirty_name"),
        F.substring(F.col("c_name"), -4, 4).alias("blk"),
    )
    cand = (
        dirty.join(
            customer, F.substring(F.col("c_name"), -4, 4) == F.col("blk")
        )
        .withColumn(
            "dist", F.levenshtein(F.col("dirty_name"), F.col("c_name"))
        )
        .filter(F.col("dist") <= 2)
        .select(
            "dirty_id", "dirty_name", F.col("c_custkey").alias("matched_id"),
            "dist",
        )
    )
    w = Window.partitionBy("dirty_id").orderBy("dist", "matched_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("dirty_id", "dirty_name", "matched_id", "dist")
    )


# --- q126: PageRank, five unrolled power iterations ----------------------

def _pagerank_sql(iters: int = 5, damp: float = 0.85) -> str:
    base = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst,
         CAST(n AS DOUBLE)
           / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS w
  FROM (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs WHERE src IS NOT NULL GROUP BY 1, 2)
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS (
  SELECT node,
         1.0 / (SELECT CAST(COUNT(*) AS DOUBLE) FROM nodes) AS rank
  FROM nodes
)"""
    step = """,
r{i} AS (
  SELECT n.node,
         {teleport} / (SELECT CAST(COUNT(*) AS DOUBLE) FROM nodes)
         + {damp} * CAST(COALESCE(
             SUM(CAST(r.rank * e.w AS DECIMAL(28,15))), 0) AS DOUBLE)
           AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{prev} r ON r.node = e.src
  GROUP BY n.node
)"""
    out = base
    for i in range(1, iters + 1):
        out += step.format(
            i=i, prev=i - 1, damp=damp, teleport=round(1 - damp, 10)
        )
    return out + f"\nSELECT node, rank FROM r{iters}"


_Q126_SQL = _pagerank_sql(iters=5)


def q126_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five power iterations as a DataFrame loop.

    The ORACLE stays the unrolled-CTE SQL above, run only by DuckDB —
    independent formulations (loop vs textual unrolling), same numbers.
    Per-row arithmetic reuses the oracle's exact expression shapes
    (DECIMAL(28,15) accumulate → DOUBLE, teleport + damp*flow in double)
    so the hash compare pins bits, not just shapes.

    Scale: rank and edge relations shuffle on the node key each
    iteration; a large graph would checkpoint ranks every few iterations
    to cut lineage (operators/components.py does exactly that) and
    pre-partition edges by dst so the per-iteration join is
    co-partitioned. Node count is a one-time driver scalar (control
    plane, like the IVF centroid sample).
    """
    from pyspark.sql.window import Window

    damp = 0.85
    events = tbl(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w_user).alias("src"),
        F.col("event_type").alias("dst"),
    )
    counts = (
        pairs.filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    edges = counts.select(
        "src",
        "dst",
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("src")).cast("double")
        ).alias("w"),
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
    )
    # event-type graph: node count is tiny and needed as a scalar in the
    # rank formula (the SQL oracle's scalar subquery)
    n_nodes = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    # mirror the oracle's literal: round(1-damp, 10) is the double the SQL
    # text "0.15" parses to; bare `1 - damp` is 0.15000000000000002
    teleport_term = round(1 - damp, 10) / n_nodes
    for _ in range(5):
        ranks = (
            nodes.alias("nd")
            .join(edges.alias("e"), F.col("e.dst") == F.col("nd.node"), "left")
            .join(
                ranks.select(
                    F.col("node").alias("r_node"), F.col("rank").alias("r_rank")
                ),
                F.col("e.src") == F.col("r_node"),
                "left",
            )
            .groupBy(F.col("nd.node"))
            .agg(
                F.expr(
                    "CAST(COALESCE(SUM(CAST(r_rank * w AS DECIMAL(28,15))), 0)"
                    " AS DOUBLE)"
                ).alias("flow")
            )
            .select(
                "node",
                (F.lit(teleport_term) + F.lit(damp) * F.col("flow")).alias(
                    "rank"
                ),
            )
        )
    return ranks


# --- q127: snapshot diff (table-diff / changelog generation) -------------
# The ETL audit op: given two snapshots of a table, emit the changelog
# (added / removed / changed / unchanged counts plus the changed keys).
# Snapshots here are the orders table at two order-date cutoffs (the
# driver fixtures are immutable, so time slices stand in for versions).
# Plan: ONE full outer join on the key — at 100 TB both snapshots come
# pre-bucketed by key from the lake (tests/test_bucketing.py), making
# the diff shuffle-free; the CASE classification is free projection.

_Q127_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderdate < TIMESTAMP '1999-01-01'
),
new AS (
  -- the newer snapshot: one more year of orders, every 13th old order
  -- deleted, every 17th order's status updated (simulated mutations —
  -- the fixtures are immutable)
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 17 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM orders
  WHERE o_orderdate < TIMESTAMP '2000-01-01'
    AND NOT (o_orderkey % 13 = 0 AND o_orderdate < TIMESTAMP '1999-01-01')
),
diff AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         CASE
           WHEN old.o_orderkey IS NULL THEN 'added'
           WHEN new.o_orderkey IS NULL THEN 'removed'
           WHEN old.o_orderstatus <> new.o_orderstatus
             OR old.o_totalprice <> new.o_totalprice THEN 'changed'
           ELSE 'unchanged'
         END AS change_type
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_orderkey) AS sample_key
FROM diff GROUP BY change_type
"""


def q127_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame formulation (full outer join + CASE classification);
    the unchanged SQL above runs only in DuckDB — independent twins."""
    orders = tbl(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    old = orders.filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    ).select(*cols)
    new = (
        orders.filter(
            (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
            & ~(
                (F.col("o_orderkey") % 13 == 0)
                & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
            )
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 17 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    o, n_ = old.alias("old"), new.alias("new")
    diff = o.join(
        n_, F.col("old.o_orderkey") == F.col("new.o_orderkey"), "full_outer"
    ).select(
        F.coalesce(F.col("old.o_orderkey"), F.col("new.o_orderkey")).alias(
            "o_orderkey"
        ),
        F.when(F.col("old.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("new.o_orderkey").isNull(), F.lit("removed"))
        .when(
            (F.col("old.o_orderstatus") != F.col("new.o_orderstatus"))
            | (F.col("old.o_totalprice") != F.col("new.o_totalprice")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    return diff.groupBy("change_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("o_orderkey").alias("sample_key"),
    )


# --- q128: CDC apply-changes (change log → final table state) ------------
# The APPLY CHANGES operator: a change log (here the events stream read
# as one: signup/click/view/purchase upsert a user's state, 'error'
# deletes it) collapses to final state by LAST-WRITER-WINS per key with
# delete filtering. One window over (key, ts desc, unique tiebreaker) —
# a single shuffle on the key at any scale; the batch twin of the
# foreachBatch CDC sink (streaming/jobs.py run_foreach_batch_upsert).

def q128_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    events = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = (
        events.select(
            "user_id", "event_type", "value", "ts", "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    return latest.filter("event_type <> 'error'").select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.col("value").alias("last_value"),
        F.col("k").alias("last_k"),
    )


_Q128_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, value,
         CAST(json_extract_string(props, '$.k') AS INT) AS k,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type AS last_op, value AS last_value, k AS last_k
FROM ordered WHERE rn = 1 AND event_type <> 'error'
"""


# --- q129: distributed k-means (two unrolled Lloyd iterations) -----------
# Iterative ML training as dataflow: seed centroids = first k vectors,
# assign → recompute means → reassign, all as joins/aggregations over the
# exploded (vec, dim, value) relation. Cross-row accumulations (squared
# distances, dimension means, the centroid checksum) go through
# DECIMAL(28,18), so cluster assignments and outputs are bit-identical
# at any parallelism — the property that makes distributed training
# REPRODUCIBLE, not just fast. Only the point-extraction CTE differs per
# engine (posexplode vs 1-based list indexing); every arithmetic step is
# the same text. At scale: pts is |vectors|×dims rows, each iteration is
# one join against a k×dims broadcast + one shuffle per aggregation;
# iterations unroll as stages (no driver loop state).

_KMEANS_CORE = """
c0 AS (SELECT vec_id AS cluster, d, x AS c FROM pts WHERE vec_id < 4),
a1 AS (
  SELECT p.vec_id, c0.cluster,
         CAST(CAST(SUM(CAST((p.x - c0.c) * (p.x - c0.c)
                       AS DECIMAL(28,18))) AS STRING) AS DOUBLE) AS dist
  FROM pts p JOIN c0 ON p.d = c0.d
  GROUP BY p.vec_id, c0.cluster
),
asg1 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM a1
  ) ranked WHERE rn = 1
),
c1 AS (
  SELECT asg1.cluster, p.d,
         CAST(CAST(SUM(CAST(p.x AS DECIMAL(28,18))) AS STRING) AS DOUBLE)
           / COUNT(*) AS c
  FROM pts p JOIN asg1 ON p.vec_id = asg1.vec_id
  GROUP BY asg1.cluster, p.d
),
a2 AS (
  SELECT p.vec_id, c1.cluster,
         CAST(CAST(SUM(CAST((p.x - c1.c) * (p.x - c1.c)
                       AS DECIMAL(28,18))) AS STRING) AS DOUBLE) AS dist
  FROM pts p JOIN c1 ON p.d = c1.d
  GROUP BY p.vec_id, c1.cluster
),
asg2 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM a2
  ) ranked WHERE rn = 1
),
csum AS (
  -- ROUND(…, 6): the centroid components are COMPUTED doubles, and the
  -- engines' double→DECIMAL(28,18) casts can disagree in the last ulp
  -- (unlike casts of raw fixture data) — rounding the reported checksum
  -- to 6 decimals absorbs that while staying a real regression tripwire
  SELECT cluster,
         ROUND(CAST(CAST(SUM(CAST(c AS DECIMAL(28,18))) AS STRING)
                    AS DOUBLE), 6) AS centroid_sum
  FROM c1 GROUP BY cluster
)
SELECT asg2.cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
       csum.centroid_sum
FROM asg2 JOIN csum ON asg2.cluster = csum.cluster
GROUP BY asg2.cluster, csum.centroid_sum
"""

_Q129_SQL = (
    "WITH pts AS (SELECT vec_id, i - 1 AS d, "
    "CAST(embedding[i] AS DOUBLE) AS x FROM embeddings "
    "CROSS JOIN (SELECT unnest(range(1, 65)) AS i) dims),\n"
    + _KMEANS_CORE
)

# Oracle-mirrored aggregate shapes (DECIMAL(28,18) accumulate with the
# decimal→STRING→double hop — see _util.DSUM_PINNED for why the string
# hop pins cross-engine bits). Same expression TEXT as _KMEANS_CORE so
# the hash compare pins bits; the surrounding dataflow is an independent
# DataFrame-loop formulation.
_SQDIST = (
    "CAST(CAST(SUM(CAST((x - c) * (x - c) AS DECIMAL(28,18)))"
    " AS STRING) AS DOUBLE)"
)
_DIMMEAN = (
    "CAST(CAST(SUM(CAST(x AS DECIMAL(28,18))) AS STRING) AS DOUBLE)"
    " / COUNT(*)"
)
_CSUM = (
    "ROUND(CAST(CAST(SUM(CAST(c AS DECIMAL(28,18))) AS STRING)"
    " AS DOUBLE), 6)"
)


def q129_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations as a DataFrame loop (the q126 idiom).

    The ORACLE stays the unrolled-CTE SQL above, run only by DuckDB —
    independent formulations (driver loop over assign/recompute vs
    textual CTE unrolling), same numbers. Each per-row/aggregate
    arithmetic step reuses the oracle's exact expression shapes
    (DECIMAL(28,18) accumulate → STRING → DOUBLE) so cluster
    assignments and the centroid checksum are bit-identical at any
    parallelism — distributed training stays REPRODUCIBLE.

    Scale: pts is |vectors|×dims rows; each iteration is one join
    against a k×dims broadcast-sized centroid relation + one shuffle per
    aggregation; iterations unroll as stages with no driver-side data.
    Many iterations would checkpoint the assignment relation to cut
    lineage (operators/components.py does exactly that).
    """
    from pyspark.sql.window import Window

    emb = tbl(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).withColumn("x", F.col("x").cast("double"))
    # seed: the first k=4 vectors are the initial centroids (cluster, d, c)
    centroids = pts.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cluster"), "d", F.col("x").alias("c")
    )
    by_dist = Window.partitionBy("vec_id").orderBy("dist", "cluster")
    assignment = None
    for it in range(2):
        assignment = (
            pts.join(F.broadcast(centroids), "d")
            .groupBy("vec_id", "cluster")
            .agg(F.expr(_SQDIST).alias("dist"))
            .withColumn("rn", F.row_number().over(by_dist))
            .filter("rn = 1")
            .select("vec_id", "cluster")
        )
        if it == 0:  # recompute means once; the final pass only reassigns
            centroids = (
                pts.join(assignment, "vec_id")
                .groupBy("cluster", "d")
                .agg(F.expr(_DIMMEAN).alias("c"))
            )
    checksum = centroids.groupBy("cluster").agg(
        F.expr(_CSUM).alias("centroid_sum")
    )
    return (
        assignment.groupBy("cluster")
        .agg(F.count("*").cast("bigint").alias("n_members"))
        .join(F.broadcast(checksum), "cluster")
        .select("cluster", "n_members", "centroid_sum")
    )


# --- q167: triangle counting on the co-purchase graph --------------------
# Nodes are parts; an edge joins two parts that appear in the same order
# (orders with more than 7 lines are dropped first — the skew cap that
# bounds per-order pair fanout at C(7,2)=21, same discipline as q31's
# shingle cap). Triangle counting is the canonical "join explosion"
# graph kernel; the Spark side uses DEGREE-ORDERED ORIENTATION
# (Schank/Wagner): every undirected edge is directed from its
# lower-(degree, id) endpoint to the higher one, so a node's out-degree
# — and therefore the wedge join's per-key fanout — is bounded by
# O(sqrt(|E|)) even on power-law graphs. The oracle counts the same
# triangles with the plain id-ordered a<b<c three-way self-join, so the
# two formulations check each other.
# Plan: pair enumeration is one groupBy(order) with in-group
# combinations; the wedge join and the closing-edge semi join are
# equi-joins on the oriented edge list. No cartesian anywhere.

def _copurchase_pairs(
    spark: SparkSession, sf_dir: str, sample_p: float | None = None
) -> DataFrame:
    """The co-purchase edge list shared by q167/q188/q189: distinct
    normalized (a < b) part pairs from orders with ≤ 7 distinct parts
    (the C(7,2)=21 per-order fanout cap).

    ``sample_p`` applies the deterministic Doulion edge-sample predicate
    BEFORE the distinct: the predicate is a pure function of (a, b), so
    filtering the raw pair stream yields exactly the same edge set as
    filtering after dedup — but the distinct's exchange shrinks by ~p
    (the dedup shuffle is a fixed cost the approximate twin would
    otherwise pay in full)."""
    li = tbl(spark, sf_dir, "lineitem")
    small_orders = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .filter(F.size("parts") <= 7)
    )
    pairs = (
        small_orders.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)), y ->"
                    " struct(least(x, y) AS a, greatest(x, y) AS b))))"
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .filter(F.col("a") != F.col("b"))
    )
    if sample_p is not None:
        from ..operators.triangles import edge_sample_predicate

        pairs = pairs.filter(edge_sample_predicate(sample_p))
    return pairs.distinct()


def q167_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import triangle_stats

    pairs = _copurchase_pairs(spark, sf_dir)
    st = triangle_stats(pairs)  # operators/triangles.py — the kernel
    out = local_relation(spark, 
        [(st.n_edges, st.n_triangles, st.n_wedges)],
        "n_edges bigint, n_triangles bigint, n_wedges bigint",
    )
    return out.withColumn(
        "global_clustering",
        F.expr(
            "CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)"
        ),
    )


_Q167_SQL = """
WITH small_orders AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) <= 7
),
mem AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM small_orders)
),
edges AS (
  SELECT DISTINCT m1.l_partkey AS a, m2.l_partkey AS b
  FROM mem m1 JOIN mem m2
    ON m1.l_orderkey = m2.l_orderkey AND m1.l_partkey < m2.l_partkey
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  ) GROUP BY v
),
wed AS (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       n_wedges,
       CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
         AS global_clustering
FROM tri, wed
"""


# --- q188: Doulion approximate triangle count (the scale-safe twin) ------
# Same co-purchase graph as q167, but each edge is kept with p=0.5 by a
# DETERMINISTIC quadratic-form hash (portable integer arithmetic — the
# oracle re-derives the identical sample), triangles are counted exactly
# on the sample, and the estimate scales by 1/p³ = 8 (integer-exact).
# The dominant Θ(Σ d_out²) wedge join shrinks ~p² (~4x at p=0.5, ~16x at
# p=0.25 for graphs with ≥10⁶ triangles); this is the entry a 100 TB
# graph runs, with q167's exact kernel as the oracle-side ground truth
# and q189 pinning the ≤10% error bound. A linear sampling hash is a
# correctness trap here — a triangle's edges are affine-related under
# it and the estimate inflates 2-3x (measured; see operators/triangles
# SAMPLE_MOD note).

def q188_triangle_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import approx_triangle_stats

    # sample pushed below the dedup shuffle (see _copurchase_pairs);
    # approx_triangle_stats re-applies the predicate, a no-op filter on
    # the already-sampled stream
    pairs = _copurchase_pairs(spark, sf_dir, sample_p=0.5)
    # wedge method: the p-sampled subgraph is exactly the regime where
    # the broadcast wedge probe wins (wedge volume already cut ~p², and
    # the intersect kernel's two shuffle joins cost more than they save
    # — measured 5.2 s vs 4.9 s at sf0.1); the EXACT kernel (q167)
    # defaults to intersect, where unsampled wedge volume dominates
    st = approx_triangle_stats(pairs, p=0.5, method="wedge")
    return local_relation(spark, 
        [(st.n_sampled_edges, st.n_triangles_sampled, st.n_triangles_est)],
        "n_sampled_edges bigint, n_triangles_sampled bigint,"
        " n_triangles_est bigint",
    ).withColumn("sample_p", F.lit(0.5).cast("double"))


_Q188_SQL = """
WITH small_orders AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) <= 7
),
mem AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM small_orders)
),
edges AS (
  SELECT a, b FROM (
    SELECT DISTINCT m1.l_partkey AS a, m2.l_partkey AS b
    FROM mem m1 JOIN mem m2
      ON m1.l_orderkey = m2.l_orderkey AND m1.l_partkey < m2.l_partkey
  )
  WHERE ((((CAST(a AS BIGINT) % 2147483648) * (CAST(a AS BIGINT) % 2147483648)
           % 2147483648) * 1220703125) % 2147483648
       + (((CAST(b AS BIGINT) % 2147483648) * (CAST(b AS BIGINT) % 2147483648)
           % 2147483648) * 1864987861) % 2147483648
       + (((CAST(a AS BIGINT) % 2147483648) * (CAST(b AS BIGINT) % 2147483648)
           % 2147483648) * 987654323) % 2147483648)
       % 2147483648 < 1073741824
),
tri AS (
  SELECT COUNT(*) AS t
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_sampled_edges,
       CAST(t AS BIGINT) AS n_triangles_sampled,
       CAST(t * 8 AS BIGINT) AS n_triangles_est,
       CAST(0.5 AS DOUBLE) AS sample_p
FROM tri
"""


# --- q193: k-core decomposition (8-round peel) ----------------------------
# The community/quality filter of graph curation: iteratively remove
# nodes with degree < k until none remain (the k-core). Semantics are
# defined as EIGHT peeling rounds — like q126's unrolled PageRank, the
# iteration count IS the contract, so both engines replay identical
# rounds and a non-converged graph is a reported fact (converged flag),
# not an error. Each round is one degree aggregation + two semi-joins
# on the surviving edge list, MATERIALIZED per round (localCheckpoint on
# the Spark side, MATERIALIZED CTEs in the oracle — each round's edge
# list is consumed by multiple downstream references, so a purely lazy
# chain re-derives the whole prefix per reference and the cost doubles
# per round; the q60 components discipline). Peeling is monotone, so
# per-round cost SHRINKS; the basket graph's 3-core stabilizes in a few
# rounds (converged=true pinned by the oracle at every test SF).

def q193_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, ROUNDS = 3, 8
    edges = _copurchase_pairs(spark, sf_dir).localCheckpoint()

    # the q197 degree-histogram discipline: the histogram answers every
    # per-round scalar (survivor count, "did this round peel?",
    # Σd/2 = edge count) in driver arithmetic, so converged rounds cost
    # ZERO jobs and the final edge count needs no extra action
    def _degree_state(e: DataFrame):
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        ).localCheckpoint()
        hist = {
            int(r["d"]): int(r["n"])
            for r in deg.groupBy("d").agg(F.count("*").alias("n")).collect()
        }
        return deg, hist, sum(hist.values())

    deg, hist, n_nodes = _degree_state(edges)
    sizes: list[int] = []  # node count surviving each round
    for _ in range(ROUNDS):
        size = sum(n for d, n in hist.items() if d >= K)
        sizes.append(size)
        # fixed point: nothing below threshold — every remaining round
        # is a no-op (a node below threshold has d >= 1, so dropping it
        # always removes an edge); pad the per-round sizes the full
        # unroll would record and stop peeling
        if size == n_nodes:
            sizes.extend([size] * (ROUNDS - len(sizes)))
            break
        keep = deg.filter(F.col("d") >= K).select("v")
        edges = (
            edges.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
        ).transform(fresh_local_checkpoint)  # loop-carried: reset stats
        deg, hist, n_nodes = _degree_state(edges)
    # endpoint-sum identity on the FINAL edge set: n_edges = Σd div 2
    # (hist is always current at loop exit: the converged path breaks
    # before filtering, the full-unroll path recomputes state after
    # round 8's filter as its last step)
    n_core_edges = sum(d * n for d, n in hist.items()) // 2
    return local_relation(spark,
        [(sizes[-1], n_core_edges, bool(sizes[-2] == sizes[-1]))],
        "n_core_nodes bigint, n_core_edges bigint, converged boolean",
    )


def _kcore_sql(edge_filter: str | None = None) -> str:
    """q193's 8-round peel SQL; ``edge_filter`` (a predicate on a, b)
    drops matching edges from e0 — the q275 delete-twin oracle."""
    drop = f"\n  WHERE NOT ({edge_filter})" if edge_filter else ""
    base = f"""
WITH small_orders AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) <= 7
),
mem AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM small_orders)
),
e0 AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT DISTINCT m1.l_partkey AS a, m2.l_partkey AS b
    FROM mem m1 JOIN mem m2
      ON m1.l_orderkey = m2.l_orderkey AND m1.l_partkey < m2.l_partkey
  ){drop}
)"""
    rounds = []
    for r in range(8):
        rounds.append(f"""
k{r} AS MATERIALIZED (
  SELECT v FROM (
    SELECT v, COUNT(*) AS d FROM (
      SELECT a AS v FROM e{r} UNION ALL SELECT b AS v FROM e{r}
    ) GROUP BY v
  ) WHERE d >= 3
),
e{r + 1} AS MATERIALIZED (
  SELECT a, b FROM e{r}
  WHERE a IN (SELECT v FROM k{r}) AND b IN (SELECT v FROM k{r})
)""")
        # NOTE: node survival after round r is membership in k{r}
    return (
        base + "," + ",".join(rounds)
        + """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM k7) AS n_core_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e8) AS n_core_edges,
       (SELECT COUNT(*) FROM k6) = (SELECT COUNT(*) FROM k7) AS converged
"""
    )


_Q193_SQL = _kcore_sql()


# --- q197: full coreness decomposition ------------------------------------
# q193 answers "who is in the 3-core"; graph curation usually wants the
# whole coreness histogram — per-node core numbers, i.e. the largest k
# whose k-core still contains the node. Same peel kernel, run at
# ASCENDING thresholds k=2..4, each continuing from the previous k's
# core edges (monotone: a higher threshold only removes more), each
# threshold unrolled SIX fixed peeling rounds — the round count IS the
# contract, exactly like q193/q126, so both engines replay identical
# rounds. The histogram falls out by subtraction: #(coreness = k) =
# |k-core| - |(k+1)-core|, and the top bucket reports coreness >= 4
# (we do not peel beyond). Every round is MATERIALIZED on both sides
# (localCheckpoint / MATERIALIZED CTE — the q60 discipline: each
# round's edges feed multiple references, a lazy chain re-derives the
# whole prefix per reference). Per-round cost SHRINKS as peeling is
# monotone; at 100 TB the k=2 rounds dominate and each is one degree
# agg + two semi-joins on the surviving edges.

def q197_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ROUNDS, KMAX = 6, 4
    edges = _copurchase_pairs(spark, sf_dir).localCheckpoint()

    # The degree HISTOGRAM {d: n_nodes} is a pure function of the
    # current edge set, collected once per edge-set change. It answers
    # every per-round scalar in driver arithmetic: |keep at threshold
    # k| = Σ_{d>=k} n_nodes, and the fixed-point test "does this round
    # peel anything?" is Σ_{d>=k} == Σ_all (a node below threshold has
    # d >= 1, so dropping it always removes an edge — peeling changes
    # the edge set iff it drops a node). Converged rounds (the common
    # case: higher thresholds start from an already-peeled core) cost
    # ZERO jobs — previously each paid a keep materialization plus two
    # count actions, ~4 AQE stage-jobs of pure scheduling per round
    # (guide §1.2). The histogram is #distinct-degrees-sized (bounded
    # by the max degree), driver-safe at any corpus scale.
    def _degree_state(
        e: DataFrame,
    ) -> tuple[DataFrame, dict[int, int], int]:
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        ).localCheckpoint()
        hist = {
            int(r["d"]): int(r["n"])
            for r in deg.groupBy("d").agg(F.count("*").alias("n")).collect()
        }
        return deg, hist, sum(hist.values())

    deg, hist, n_nodes = _degree_state(edges)
    # every listed endpoint has degree >= 1
    core_sizes = {1: n_nodes}
    for k in range(2, KMAX + 1):
        size = None
        for _ in range(ROUNDS):
            size = sum(n for d, n in hist.items() if d >= k)
            # fixed point: nothing below threshold — the edge set (and
            # the stored degrees) are unchanged, every remaining round
            # is a no-op, and the identical result the full unroll
            # (and the oracle) computes falls out of the histogram
            if size == n_nodes:
                break
            keep = deg.filter(F.col("d") >= k).select("v")
            edges = (
                edges.join(
                    keep.withColumnRenamed("v", "a"), "a", "left_semi"
                ).join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            ).transform(fresh_local_checkpoint)  # loop-carried
            deg, hist, n_nodes = _degree_state(edges)
        core_sizes[k] = size
    rows = [
        (k, core_sizes[k] - core_sizes[k + 1]) for k in range(1, KMAX)
    ] + [(KMAX, core_sizes[KMAX])]  # top bucket: coreness >= KMAX
    return local_relation(spark, rows, "core_k int, n_nodes bigint")


def _coreness_sql() -> str:
    base = """
WITH small_orders AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) <= 7
),
mem AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM small_orders)
),
e2_0 AS MATERIALIZED (
  SELECT DISTINCT m1.l_partkey AS a, m2.l_partkey AS b
  FROM mem m1 JOIN mem m2
    ON m1.l_orderkey = m2.l_orderkey AND m1.l_partkey < m2.l_partkey
)"""
    rounds = []
    for k in range(2, 5):
        for r in range(6):
            nxt = f"e{k}_{r + 1}" if r < 5 else f"e{k + 1}_0"
            rounds.append(f"""
k{k}_{r} AS MATERIALIZED (
  SELECT v FROM (
    SELECT v, COUNT(*) AS d FROM (
      SELECT a AS v FROM e{k}_{r} UNION ALL SELECT b AS v FROM e{k}_{r}
    ) GROUP BY v
  ) WHERE d >= {k}
),
{nxt} AS MATERIALIZED (
  SELECT a, b FROM e{k}_{r}
  WHERE a IN (SELECT v FROM k{k}_{r}) AND b IN (SELECT v FROM k{k}_{r})
)""")
    return (
        base + "," + ",".join(rounds)
        + """,
sizes(core_k, n) AS (
  SELECT 1, (SELECT COUNT(*) FROM (
    SELECT DISTINCT v FROM (
      SELECT a AS v FROM e2_0 UNION ALL SELECT b AS v FROM e2_0
    )
  ))
  UNION ALL SELECT 2, (SELECT COUNT(*) FROM k2_5)
  UNION ALL SELECT 3, (SELECT COUNT(*) FROM k3_5)
  UNION ALL SELECT 4, (SELECT COUNT(*) FROM k4_5)
)
SELECT CAST(core_k AS INT) AS core_k,
       CAST(n - COALESCE(LEAD(n) OVER (ORDER BY core_k), 0) AS BIGINT)
         AS n_nodes
FROM sizes
"""
    )


_Q197_SQL = _coreness_sql()


QUERIES = {
    "q125_entity_resolution": q125_entity_resolution,
    "q126_pagerank": q126_pagerank,
    "q127_snapshot_diff": q127_snapshot_diff,
    "q128_cdc_apply": q128_cdc_apply,
    "q129_kmeans": q129_kmeans,
    "q167_triangle_count": q167_triangle_count,
    "q188_triangle_approx": q188_triangle_approx,
    "q193_kcore": q193_kcore,
    "q197_coreness": q197_coreness,
}

ORACLE = {
    "q125_entity_resolution": _Q125_SQL,
    "q126_pagerank": _Q126_SQL,
    "q127_snapshot_diff": _Q127_SQL,
    "q128_cdc_apply": _Q128_SQL,
    "q129_kmeans": _Q129_SQL,
    "q167_triangle_count": _Q167_SQL,
    "q188_triangle_approx": _Q188_SQL,
    "q193_kcore": _Q193_SQL,
    "q197_coreness": _Q197_SQL,
}


# --- q177: item-item co-occurrence similarity (recommender kernel) --------
# "Customers who bought X also bought Y": cosine similarity over the
# co-purchase matrix — cooc(a,b) / sqrt(n(a) * n(b)) on order baskets,
# the memory-based collaborative-filtering baseline. Reuses q167's
# capped basket enumeration (≤ C(7,2) pairs per order); per-item counts
# broadcast back onto the pair relation; global top-20 by similarity is
# TakeOrderedAndProject. sqrt of an exact integer product is IEEE-exact
# → identical bits in both engines.

def q177_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    mem = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .filter(F.size("parts") <= 7)
    )
    pairs = (
        mem.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)), y ->"
                    " struct(least(x, y) AS a, greatest(x, y) AS b))))"
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("cooc"))
    )
    item_n = mem.select(F.explode("parts").alias("p")).groupBy("p").agg(
        F.count("*").alias("n")
    )
    na = item_n.select(F.col("p").alias("a"), F.col("n").alias("na"))
    nb = item_n.select(F.col("p").alias("b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .select(
            "a",
            "b",
            F.col("cooc").cast("bigint").alias("cooc"),
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
            (
                F.col("cooc").cast("double")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "a", "b")
        .limit(20)
    )


_Q177_SQL = """
WITH mem AS (
  SELECT l_orderkey, list_distinct(list(l_partkey)) AS parts
  FROM lineitem GROUP BY l_orderkey
  HAVING len(list_distinct(list(l_partkey))) <= 7
),
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           WHERE l_orderkey IN (SELECT l_orderkey FROM mem)),
pairs AS (
  SELECT m1.l_partkey AS a, m2.l_partkey AS b, COUNT(*) AS cooc
  FROM basket m1 JOIN basket m2
    ON m1.l_orderkey = m2.l_orderkey AND m1.l_partkey < m2.l_partkey
  GROUP BY 1, 2
),
item_n AS (SELECT l_partkey AS p, COUNT(*) AS n FROM basket GROUP BY 1)
SELECT a, b,
       CAST(cooc AS BIGINT) AS cooc,
       CAST(na.n AS BIGINT) AS na,
       CAST(nb.n AS BIGINT) AS nb,
       CAST(cooc AS DOUBLE) / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS cosine
FROM pairs
JOIN item_n na ON na.p = a
JOIN item_n nb ON nb.p = b
ORDER BY cosine DESC, a, b
LIMIT 20
"""


QUERIES["q177_item_similarity"] = q177_item_similarity
ORACLE["q177_item_similarity"] = _Q177_SQL


# --- q201: HITS hubs & authorities (Kleinberg JACM'99) --------------------
# The second classic link-analysis scorer next to q126's PageRank: on a
# DIRECTED graph, authority(v) = sum of hub(u) over in-edges (u,v) and
# hub(u) = sum of authority(v) over out-edges (u,v), alternated and
# normalized each half-step. Graph = the event-type transition graph
# (q126's edges, weight = transition count). THREE alternating
# iterations UNROLLED — like q126/q193, the iteration count IS the
# contract, so both engines replay identical arithmetic. Normalization
# is L1 (divide by the score sum) rather than the textbook L2: the sum
# goes through DECIMAL(28,15) accumulation (associative → bit-identical
# at any parallelism) and the per-row division is then a deterministic
# double op; an L2 norm would add a sqrt over a double sum — also
# IEEE-exact, but L1 keeps the oracle SQL to one idiom. Scale: each
# half-step is one shuffle join of the rank relation against edges on
# the node key; a web-scale run pre-partitions edges by dst (authority
# step) and src (hub step) once and reuses both exchanges across
# iterations, and the normalization scalar is an O(1) driver aggregate
# (control plane, the q126 node-count precedent).

def q201_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = tbl(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w_user).alias("src"),
        F.col("event_type").alias("dst"),
    )
    edges = (
        pairs.filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint()  # reused 6x (3 iterations x 2 half-steps)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )

    def _l1_normalize(scores: DataFrame, col: str) -> DataFrame:
        # O(1) driver scalar, mirroring the oracle's scalar subquery;
        # DECIMAL accumulate makes the sum order-independent
        total = scores.agg(
            F.expr(
                f"CAST(CAST(SUM(CAST({col} AS DECIMAL(28,15)))"
                " AS STRING) AS DOUBLE)"
            ).alias("s")
        ).collect()[0]["s"]
        return scores.select(
            "node", (F.col(col) / F.lit(total)).alias(col)
        )

    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(3):
        auth = (
            nodes.alias("nd")
            .join(edges.alias("e"), F.col("e.dst") == F.col("nd.node"), "left")
            .join(
                hub.select(
                    F.col("node").alias("h_node"), F.col("hub").alias("h_val")
                ),
                F.col("e.src") == F.col("h_node"),
                "left",
            )
            .groupBy(F.col("nd.node"))
            .agg(
                F.expr(
                    "CAST(CAST(COALESCE(SUM(CAST(h_val * n"
                    " AS DECIMAL(28,15))), 0) AS STRING) AS DOUBLE)"
                ).alias("authority")
            )
        )
        auth = _l1_normalize(auth, "authority").transform(
            fresh_local_checkpoint
        )
        hub = (
            nodes.alias("nd")
            .join(edges.alias("e"), F.col("e.src") == F.col("nd.node"), "left")
            .join(
                auth.select(
                    F.col("node").alias("a_node"),
                    F.col("authority").alias("a_val"),
                ),
                F.col("e.dst") == F.col("a_node"),
                "left",
            )
            .groupBy(F.col("nd.node"))
            .agg(
                F.expr(
                    "CAST(CAST(COALESCE(SUM(CAST(a_val * n"
                    " AS DECIMAL(28,15))), 0) AS STRING) AS DOUBLE)"
                ).alias("hub")
            )
        )
        hub = _l1_normalize(hub, "hub").transform(
            fresh_local_checkpoint
        )
    # reported scores ROUND(•, 9): the raw-sum magnitudes cross 2^53 at
    # scale 15, where the engines' double<->DECIMAL conversions drift a
    # final ulp (the q181/q129 precedent) — rounding the REPORTED values
    # absorbs that while staying a real regression tripwire
    return (
        hub.join(auth.withColumnRenamed("node", "a_node"),
                 F.col("node") == F.col("a_node"))
        .select(
            "node",
            F.round("hub", 9).alias("hub"),
            F.round("authority", 9).alias("authority"),
        )
    )


def _hits_sql(iters: int = 3) -> str:
    base = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE src IS NOT NULL GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes)"""
    step = """,
a{i}_raw AS MATERIALIZED (
  SELECT nd.node,
         CAST(CAST(COALESCE(SUM(CAST(h.hub * e.n AS DECIMAL(28,15))), 0)
              AS STRING) AS DOUBLE) AS authority
  FROM nodes nd
  LEFT JOIN edges e ON e.dst = nd.node
  LEFT JOIN h{prev} h ON h.node = e.src
  GROUP BY nd.node
),
a{i} AS MATERIALIZED (
  SELECT node,
         authority / (SELECT CAST(CAST(SUM(CAST(authority
                        AS DECIMAL(28,15))) AS STRING) AS DOUBLE)
                      FROM a{i}_raw) AS authority
  FROM a{i}_raw
),
h{i}_raw AS MATERIALIZED (
  SELECT nd.node,
         CAST(CAST(COALESCE(SUM(CAST(a.authority * e.n AS DECIMAL(28,15))), 0)
              AS STRING) AS DOUBLE) AS hub
  FROM nodes nd
  LEFT JOIN edges e ON e.src = nd.node
  LEFT JOIN a{i} a ON a.node = e.dst
  GROUP BY nd.node
),
h{i} AS MATERIALIZED (
  SELECT node,
         hub / (SELECT CAST(CAST(SUM(CAST(hub AS DECIMAL(28,15)))
                  AS STRING) AS DOUBLE) FROM h{i}_raw) AS hub
  FROM h{i}_raw
)"""
    out = base
    for i in range(1, iters + 1):
        out += step.format(i=i, prev=i - 1)
    return out + f"""
SELECT h.node, ROUND(h.hub, 9) AS hub, ROUND(a.authority, 9) AS authority
FROM h{iters} h JOIN a{iters} a ON a.node = h.node
"""


_Q201_SQL = _hits_sql(iters=3)

QUERIES["q201_hits"] = q201_hits
ORACLE["q201_hits"] = _Q201_SQL


# --- q205: label-propagation community detection (LPA) --------------------
# The community-structure companion of q60's connected components and
# q193's k-core: synchronous label propagation (Raghavan et al., PRE'07)
# over the REPEAT co-purchase graph — only pairs bought together in at
# least 2 distinct orders (the raw 1-cooc graph is a near-clique and
# LPA correctly collapses it to one community; thresholding is the
# standard projection-graph densification control). Every node starts labeled with itself;
# each round it adopts the MODE of its neighbors' labels with a
# deterministic tie-break (highest count, then smallest label) — unlike
# components' min-propagation, LPA converges to dense communities, not
# connectivity classes. FOUR synchronous rounds, materialized per round
# (localCheckpoint / MATERIALIZED CTE — the q60/q126 discipline), are
# the contract; both engines replay identical rounds including every
# tie-break. Output is the community-size histogram (size, n_communities)
# — scale-stable and fully pinned.
# Plan per round: neighbor-label relation = the undirected edge list
# joined to labels in both directions (two shuffle joins on the node
# key), one (node, label) count aggregate, one row_number window for
# the deterministic mode. At web scale, pre-partition edges and labels
# by node once and every round's joins are co-partitioned; rounds
# shuffle |E| rows — the same per-round cost as components, with the
# window adding only a per-node sort of its distinct neighbor labels.

def _lpa_und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The thresholded (cooc ≥ 2) co-purchase graph q205/q223 propagate
    over, symmetrized to (v, u)."""
    li = tbl(spark, sf_dir, "lineitem")
    small_orders = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .filter(F.size("parts") <= 7)
    )
    edges = (
        small_orders.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)), y ->"
                    " struct(least(x, y) AS a, greatest(x, y) AS b))))"
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("cooc"))
        .filter(F.col("cooc") >= 2)
        .select("a", "b")
        .localCheckpoint()
    )
    return edges.select(
        F.col("a").alias("v"), F.col("b").alias("u")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("u")))


def _lpa_init(und: DataFrame) -> DataFrame:
    return und.select("v").distinct().select("v", F.col("v").alias("lbl"))


def _lpa_round(
    und: DataFrame, labels: DataFrame, broadcast_labels: bool = True
) -> DataFrame:
    """One synchronous label-propagation round: most-frequent neighbor
    label, ties to the smallest label (deterministic).

    ``broadcast_labels`` (the bfs_hops knob): hint the label relation
    into the neighbor join so the GRAPH is never reshuffled per round —
    without it AQE reaches the same broadcast only after materializing
    the round's shuffle stages to learn sizes (an extra stage per
    round). Labels are node-sized: pass False past the broadcast budget
    and let AQE decide from runtime sizes.

    Plan shape: the (v, lbl) aggregate runs with its MAP-SIDE partial
    aggregation intact (the exchange carries post-partial rows), then
    a per-node ``min_by`` aggregate picks the winner — min over
    (-cnt, lbl) is "largest count, ties to smallest label", exactly
    the old ROW_NUMBER window's order, but as a declarative aggregate
    it partial-aggregates map-side and needs NO per-partition sort
    (round-15, guide §2.3/§2.4: the second exchange now carries at
    most one candidate per (node, map partition) instead of every
    (node, label) count, and the WindowExec sort is gone; -cnt is
    safe unconditionally — counts are >= 1). An explicit
    ``repartition("v")`` to share one exchange between the two stages
    was measured a net LOSS (2.25 -> 3.68 s warm over 4 rounds,
    sf0.1): it moves the FULL neighbor-label volume through the
    exchange before any aggregation, which costs more than the second
    (post-aggregate, counts-sized) exchange it saves."""
    lbl = labels.select(F.col("v").alias("u"), "lbl")
    if broadcast_labels:
        lbl = F.broadcast(lbl)
    nbr = und.join(lbl, "u").select("v", "lbl")
    counts = nbr.groupBy("v", "lbl").agg(F.count("*").alias("cnt"))
    return counts.groupBy("v").agg(
        F.min_by(
            "lbl",
            F.struct(
                (-F.col("cnt")).alias("nc"), F.col("lbl").alias("l")
            ),
        ).alias("lbl")
    )


def _lpa_histogram(labels: DataFrame) -> DataFrame:
    return (
        labels.groupBy("lbl")
        .agg(F.count("*").alias("sz"))
        .groupBy(F.col("sz").cast("bigint").alias("community_size"))
        .agg(F.count("*").cast("bigint").alias("n_communities"))
    )


def q205_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    ROUNDS = 4
    und = _lpa_und_edges(spark, sf_dir)
    labels = _lpa_init(und).localCheckpoint()
    for _ in range(ROUNDS):
        labels = _lpa_round(und, labels).localCheckpoint()
    return _lpa_histogram(labels)


def _lpa_sql(rounds: int = 4) -> str:
    base = """
WITH small_orders AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) <= 7
),
mem AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM small_orders)
),
edges AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT m1.l_partkey AS a, m2.l_partkey AS b, COUNT(*) AS cooc
    FROM mem m1 JOIN mem m2
      ON m1.l_orderkey = m2.l_orderkey AND m1.l_partkey < m2.l_partkey
    GROUP BY 1, 2
  ) WHERE cooc >= 2
),
und AS MATERIALIZED (
  SELECT a AS v, b AS u FROM edges
  UNION ALL SELECT b AS v, a AS u FROM edges
),
l0 AS MATERIALIZED (
  SELECT v, v AS lbl FROM (SELECT DISTINCT v FROM und)
)"""
    steps = []
    for r in range(1, rounds + 1):
        steps.append(f"""
l{r} AS MATERIALIZED (
  SELECT v, lbl FROM (
    SELECT v, lbl,
           ROW_NUMBER() OVER (PARTITION BY v
                              ORDER BY cnt DESC, lbl) AS rn
    FROM (
      SELECT und.v, p.lbl, COUNT(*) AS cnt
      FROM und JOIN l{r - 1} p ON p.v = und.u
      GROUP BY und.v, p.lbl
    )
  ) WHERE rn = 1
)""")
    return (
        base + "," + ",".join(steps)
        + f"""
SELECT CAST(sz AS BIGINT) AS community_size,
       CAST(COUNT(*) AS BIGINT) AS n_communities
FROM (SELECT lbl, COUNT(*) AS sz FROM l{rounds} GROUP BY lbl)
GROUP BY sz
"""
    )


_Q205_SQL = _lpa_sql()

QUERIES["q205_lpa_communities"] = q205_lpa_communities
ORACLE["q205_lpa_communities"] = _Q205_SQL


# --- q258: INCREMENTAL triangle counting ≡ one-shot ------------------------
# q167's exact semantics maintained incrementally (operators/triangles
# triangle_update — the kernel behind streaming/jobs.py
# run_triangle_stream): the co-purchase edges are time-split by a
# deterministic predicate ((a + b) % 2, the "edges discovered later"
# batch; a half split balances the gate's total cost — founding
# wedge work scales ~quadratically with retained degree, so a
# smaller batch makes the FOUNDING leg dominate; the per-batch
# steady-state cost is measured separately by bench.py's
# q258_triangle_update_only entry at a ~1.6% batch), counts are
# founded on the first half with the one-shot
# kernel and UPDATED with the second, and the result must equal q167's
# uninterrupted answer — the oracle IS q167's SQL, so the gate proves
# incremental ≡ one-shot bit-for-bit. The update's work is the batch
# edges' common-neighbor sightings (inclusion-exclusion on edge
# freshness) plus the affected endpoints' degree deltas — never a
# re-count of history, the steady state the top bench line (q167,
# ~6 s full recompute) needs at 100 TB.

def q258_incremental_triangles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.triangles import (
        TriangleCounts,
        triangle_stats,
        triangle_update,
    )

    pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint()
    first = pairs.filter((F.col("a") + F.col("b")) % 2 == 0)
    second = pairs.filter((F.col("a") + F.col("b")) % 2 == 1)
    st = triangle_stats(first)
    prior = TriangleCounts(st.n_edges, st.n_triangles, st.n_wedges)
    got = triangle_update(pairs, second, prior, assume_canonical=True)
    out = local_relation(spark, 
        [tuple(got)],
        "n_edges bigint, n_triangles bigint, n_wedges bigint",
    )
    return out.withColumn(
        "global_clustering",
        F.expr(
            "CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)"
        ),
    )


QUERIES["q258_incremental_triangles"] = q258_incremental_triangles
# incremental ≡ one-shot: the oracle is q167's uninterrupted SQL
ORACLE["q258_incremental_triangles"] = _Q167_SQL


# --- q259: INCREMENTAL k-core ≡ one-shot ------------------------------------
# q193's exact semantics maintained incrementally (operators/kcore
# k_core / k_core_update — the kernel behind streaming/jobs.py
# run_kcore_stream): same time-split discipline; the 3-core members
# are founded on the first half and UPDATED with the second (GROW the
# eligible region from the batch endpoints, PEEL it to the maximal
# fixpoint — insertion can only grow a core), and the reported
# (n_core_nodes, n_core_edges) must equal q193's uninterrupted
# answer — the oracle IS q193's SQL. `converged` is literally true:
# the incremental kernel runs to the fixpoint by construction (and
# raises rather than emitting a bounded-peel artifact).

def q259_incremental_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    K = 3
    from ..operators.kcore import k_core, k_core_update

    pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint()
    first = pairs.filter((F.col("a") + F.col("b")) % 2 == 0)
    second = pairs.filter((F.col("a") + F.col("b")) % 2 == 1)
    base = k_core(first, K, assume_canonical=True)
    members = k_core_update(
        pairs, second, base, K, assume_canonical=True
    ).localCheckpoint()
    core_edges = pairs.join(
        members.withColumnRenamed("node", "a"), "a", "left_semi"
    ).join(members.withColumnRenamed("node", "b"), "b", "left_semi")
    # both result scalars ride ONE single-exchange action: tag-union the
    # two relations and count conditionally (cheaper than crossJoining
    # two scalar aggregates, which pays an AQE stage per aggregate)
    row = (
        members.select(F.lit(1).alias("t"))
        .unionAll(core_edges.select(F.lit(0).alias("t")))
        .agg(
            F.sum("t").cast("bigint").alias("nn"),
            F.count("*").cast("bigint").alias("tot"),
        )
    ).first()
    n_nodes = int(row["nn"] or 0)
    return local_relation(spark,
        [(n_nodes, int(row["tot"]) - n_nodes, True)],
        "n_core_nodes bigint, n_core_edges bigint, converged boolean",
    )


QUERIES["q259_incremental_kcore"] = q259_incremental_kcore
# incremental ≡ one-shot: the oracle is q193's uninterrupted SQL
ORACLE["q259_incremental_kcore"] = _Q193_SQL


# --- q264: INCREMENTAL Doulion triangles ≡ one-shot -------------------------
# q188 is the 100 TB triangle entry (deterministic p=0.5 edge sample,
# exact count on the sample, 1/p³ scale); this is its STEADY STATE:
# the sample predicate is a pure function of the edge key, so sampling
# commutes with edge arrival — maintaining the sampled subgraph's
# counts with triangle_update over sampled batches reproduces q188's
# uninterrupted answer exactly (oracle = q188's SQL). Per batch the
# cost is the SAMPLED batch's common-neighbor sightings — p³ of the
# exact incremental work on top of q258's delta-proportional shape.

def q264_incremental_triangle_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.triangles import (
        TriangleCounts,
        triangle_stats,
        triangle_update,
    )

    sampled = _copurchase_pairs(
        spark, sf_dir, sample_p=0.5
    ).localCheckpoint()
    first = sampled.filter((F.col("a") + F.col("b")) % 2 == 0)
    second = sampled.filter((F.col("a") + F.col("b")) % 2 == 1)
    st = triangle_stats(first, method="wedge")
    prior = TriangleCounts(st.n_edges, st.n_triangles, st.n_wedges)
    got = triangle_update(sampled, second, prior, assume_canonical=True)
    return local_relation(spark, 
        [(got.n_edges, got.n_triangles, int(round(got.n_triangles * 8)))],
        "n_sampled_edges bigint, n_triangles_sampled bigint,"
        " n_triangles_est bigint",
    ).withColumn("sample_p", F.lit(0.5).cast("double"))


QUERIES["q264_incremental_triangle_approx"] = (
    q264_incremental_triangle_approx
)
# incremental ≡ one-shot on the sampled subgraph: q188's SQL
ORACLE["q264_incremental_triangle_approx"] = _Q188_SQL


# --- q274/q275: DELETE-side incremental graph kernels ≡ one-shot ------------
# The forget sweep (q267) erases documents from every serving index;
# these are the graph-side counterparts that keep MAINTAINED graph
# state consistent under the same lifecycle event. A deterministic
# predicate marks the "forgotten" co-purchase edges ((a + 2b) % 5 = 0,
# ~20% of the graph — disjoint from the %2 insert-split so the two
# directions exercise different batches); counts/membership are
# founded on the FULL graph with the one-shot kernels and the batch is
# then REMOVED with the delete kernels (operators/triangles
# triangle_delete_update, operators/kcore k_core_delete_update — the
# lifecycle.graph_forget machinery). The result must equal the
# one-shot answer on the remaining edges: the oracles are q167's /
# q193's SQL over the filtered edge set, so the gate proves
# decremental ≡ one-shot bit-for-bit. Work per batch is the removed
# edges' endpoint neighborhoods (triangles: the same three-job freshness
# delta as q258, roles swapped; k-core: the reverse peel cascade) —
# never a recount of history.

def _rm_edge_pred():
    return (F.col("a") + 2 * F.col("b")) % 5 == 0
_RM_EDGE_SQL = "(a + 2 * b) % 5 = 0"


def q274_triangle_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import (
        TriangleCounts,
        triangle_delete_update,
        triangle_stats,
    )

    pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint()
    removed = pairs.filter(_rm_edge_pred())
    st = triangle_stats(pairs)
    prior = TriangleCounts(st.n_edges, st.n_triangles, st.n_wedges)
    got = triangle_delete_update(
        pairs, removed, prior, assume_canonical=True
    )
    out = local_relation(spark, 
        [tuple(got)],
        "n_edges bigint, n_triangles bigint, n_wedges bigint",
    )
    return out.withColumn(
        "global_clustering",
        F.expr(
            "CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)"
        ),
    )


_Q274_SQL = f"""
WITH small_orders AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) <= 7
),
mem AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM small_orders)
),
edges AS (
  SELECT a, b FROM (
    SELECT DISTINCT m1.l_partkey AS a, m2.l_partkey AS b
    FROM mem m1 JOIN mem m2
      ON m1.l_orderkey = m2.l_orderkey AND m1.l_partkey < m2.l_partkey
  ) WHERE NOT ({_RM_EDGE_SQL})
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  ) GROUP BY v
),
wed AS (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       n_wedges,
       CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
         AS global_clustering
FROM tri, wed
"""

QUERIES["q274_triangle_delete"] = q274_triangle_delete
ORACLE["q274_triangle_delete"] = _Q274_SQL


def q275_kcore_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    K = 3
    from ..operators.kcore import k_core, k_core_delete_update

    pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint()
    removed = pairs.filter(_rm_edge_pred())
    remaining = pairs.filter(~_rm_edge_pred())
    base = k_core(pairs, K, assume_canonical=True)
    members = k_core_delete_update(
        remaining, removed, base, K, assume_canonical=True
    ).localCheckpoint()
    core_edges = remaining.join(
        members.withColumnRenamed("node", "a"), "a", "left_semi"
    ).join(members.withColumnRenamed("node", "b"), "b", "left_semi")
    # the q259 tag-union idiom: one single-exchange action for both
    row = (
        members.select(F.lit(1).alias("t"))
        .unionAll(core_edges.select(F.lit(0).alias("t")))
        .agg(
            F.sum("t").cast("bigint").alias("nn"),
            F.count("*").cast("bigint").alias("tot"),
        )
    ).first()
    n_nodes = int(row["nn"] or 0)
    return local_relation(spark,
        [(n_nodes, int(row["tot"]) - n_nodes, True)],
        "n_core_nodes bigint, n_core_edges bigint, converged boolean",
    )


QUERIES["q275_kcore_delete"] = q275_kcore_delete
# decremental ≡ one-shot: q193's SQL over the remaining edges
ORACLE["q275_kcore_delete"] = _kcore_sql(edge_filter=_RM_EDGE_SQL)
