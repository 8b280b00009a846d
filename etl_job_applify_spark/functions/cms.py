"""Count-min sketch as exact relational arithmetic (Cormode &
Muthukrishnan 2005): the mergeable heavy-hitter / point-query sketch a
streaming curation pipeline keeps per shard and unions at read time.

Design for Spark (and for the correctness gate):

- The sketch IS a relation: ``(row, bucket, cnt)`` with ``depth`` rows
  and ``width`` buckets per row. Building it is one ``groupBy`` with
  map-side combine; MERGING two sketches is ``union → groupBy → sum`` —
  the mergeability that makes CMS the right shape for per-partition /
  per-day sketching at 100 TB (sketch size depth×width is independent
  of corpus size).
- Hash functions are PINNED universal-family members
  ``h_i(k) = ((a_i·k + b_i) mod p) mod width`` over a portable integer
  key (``rolling_hash_expr`` for strings) with p = 2^31−1 and published
  (a_i, b_i) — pure int64 arithmetic (no overflow: a·k < 2^63 for
  k < p·1), so DuckDB replays the ENTIRE sketch bit-for-bit and the
  gate pins estimates exactly, not just within the ε·N bound.
- Estimates are the classic min over rows; the CMS guarantee
  (estimate ≥ true count always; ≤ true + ε·N w.h.p., ε = e/width)
  holds per construction and the ≥ side is asserted in the gate query.

Built-in alternative: ``approx_top_k`` (q103) answers "which items are
frequent" but is opaque state — no merge across independently built
sketches, no point queries, no cross-engine replay. This kernel is the
composable version of the same idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1: the universal-hash modulus
CMS_P = 2_147_483_647

#: pinned (a, b) per sketch row — odd multipliers, fixed offsets; the
#: published family members that make the sketch replayable anywhere
CMS_A = (1_103_515_245, 69_069, 1_664_525, 22_695_477, 134_775_813)
CMS_B = (12_345, 362_437, 1_013_904_223, 7_777, 1)


def cms_bucket_expr(key_col: str, row_i: int, width: int) -> Column:
    """Bucket of integer key ``key_col`` in sketch row ``row_i`` —
    ((a·k + b) mod p) mod width, int64-safe for keys < p."""
    a, b = CMS_A[row_i], CMS_B[row_i]
    return (
        (F.col(key_col) * F.lit(a) + F.lit(b)) % F.lit(CMS_P)
    ) % F.lit(width)


def cms_build(
    items: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(row, bucket, cnt) sketch relation from an item relation.

    ``key_col`` must be a non-negative int64 < 2^31−1 (hash strings
    through ``rolling_hash_expr`` first). ``weight_col`` (optional)
    adds that weight per item instead of 1 — so a pre-aggregated
    (item, count) relation sketches in one pass over DISTINCT items.
    One explode (depth rows per item) + one groupBy with map-side
    combine; output size ≤ depth×width rows regardless of input."""
    if not 1 <= depth <= len(CMS_A):
        raise ValueError(f"depth must be in [1, {len(CMS_A)}]")
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_bucket_expr(key_col, i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("__rb")
    return (
        items.select(rows, w.alias("__w"))
        .groupBy(F.col("__rb.row").alias("row"),
                 F.col("__rb.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built with the SAME (depth, width): bucket-wise
    sum — CMS mergeability (sketch shards per partition/day/stream,
    merge at read time)."""
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.unionByName(s)
    return acc.groupBy("row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    probe_id_col: str | None = None,
) -> DataFrame:
    """Point queries: probes (any columns + integer ``key_col``) gain a
    ``cms_est`` column = min over rows of the key's bucket counters (0
    if a bucket row is absent — possible only when nothing hashed
    there). The sketch side is ≤ depth×width rows, so Spark broadcasts
    it; the probe side stays distributed — point queries over a
    corpus-sized probe relation are one broadcast join.

    Cardinality contract: one output row PER PROBE ROW, duplicates
    included — each probe row is tagged with a unique row id before the
    depth-explode, so the post-join regroup undoes the explode exactly
    (identical probe rows do NOT collapse to one).

    ``probe_id_col``: name of an existing column that uniquely keys
    probe rows, used as that tag DETERMINISTICALLY. Pass it whenever
    the probe relation has one. The ad-hoc fallback tag is
    ``monotonically_increasing_id()`` — a NONDETERMINISTIC expression:
    if the probe lineage is itself nondeterministic (post-shuffle row
    order) and a map task is recomputed after a fetch failure, fallback
    tags can differ across attempts and silently split/merge regroup
    groups. Fine for deterministic file-scan lineages and one-shot
    local probes; keyed relations should supply the key."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_bucket_expr(key_col, i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("__rb")
    tag = (
        F.col(probe_id_col)
        if probe_id_col is not None
        else F.monotonically_increasing_id()
    )
    exploded = (
        probes.withColumn("__pid", tag)
        .select("*", rows)
        .select(
            "*",
            F.col("__rb.row").alias("__row"),
            F.col("__rb.bucket").alias("__bucket"),
        )
        .drop("__rb")
    )
    joined = exploded.join(
        F.broadcast(
            sketch.select(
                F.col("row").alias("__row"),
                F.col("bucket").alias("__bucket"),
                F.col("cnt").alias("__cnt"),
            )
        ),
        ["__row", "__bucket"],
        "left",
    )
    group_cols = [c for c in probes.columns]
    return (
        joined.groupBy("__pid", *group_cols)
        .agg(
            F.min(F.coalesce(F.col("__cnt"), F.lit(0))).alias("cms_est")
        )
        .drop("__pid")
    )


def cms_read(spark, sketch_dir: str) -> DataFrame:
    """Merged view of a streamed sketch log (``streaming/jobs.py
    run_cms_sketch_stream``): union of the per-epoch increment
    snapshots, bucket-wise summed. Each snapshot is ≤ depth×width rows
    of three ints, so even a 10k-epoch log re-aggregates in one trivial
    shuffle — the log needs no compaction protocol, which is what makes
    the streamed sketch exactly-once for free (append-only CAS
    snapshots + epoch marks, no read-modify-write anywhere)."""
    from ..sinks.versioned import read_log_table

    return (
        read_log_table(spark, sketch_dir)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
