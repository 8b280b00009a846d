"""q139: the transactional MERGE path, oracle-checked end to end.

Unlike q23 (the relational MERGE rewrite in isolation), this query drives
the full storage protocol: three ``merge_into`` commits against a fresh
versioned table (insert seed → upsert batch → delete batch), then reads
the committed snapshot back and summarizes it. The DuckDB oracle computes
the same final state purely relationally — so the snapshot write/CAS/
read-back machinery (sinks/versioned.py, sinks/merge.py) must be
value-faithful, not just the algebra.

Each invocation uses a fresh temp table directory (rerunnable; the
driver may call queries repeatedly) and removes it before returning:
the final aggregate is a handful of rows, so it is materialized off the
snapshot and re-wrapped as a local DataFrame — no lazy reference to the
deleted path escapes. Parquet round-trips doubles bit-exactly, so the
DSUM idiom holds across the storage hop.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation

from ..sinks import merge_into, read_table
from ._util import DSUM, dsum, tbl


def q139_merge_transactional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="q139_merge_")
    # commit 1: seed every 50th order
    merge_into(
        spark,
        path,
        orders.filter(F.col("o_orderkey") % 50 == 0),
        keys=["o_orderkey"],
    )
    # commit 2: upsert every 25th order at +20% price (updates the seeded
    # %50 keys, inserts the odd %25 multiples)
    merge_into(
        spark,
        path,
        orders.filter(F.col("o_orderkey") % 25 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.2
        ),
        keys=["o_orderkey"],
    )
    # commit 3: tombstone every 150th order
    merge_into(
        spark,
        path,
        orders.filter(F.col("o_orderkey") % 150 == 0),
        keys=["o_orderkey"],
        when_matched="delete",
    )
    final = read_table(spark, path)  # latest committed snapshot
    agg = (
        final.groupBy("o_orderstatus")
        .agg(F.count("*").cast("bigint").alias("n"), dsum("o_totalprice", "total"))
        .orderBy("o_orderstatus")
    )
    # The aggregate is O(#order statuses) rows: materialize it, then drop
    # the temp table so repeated driver invocations don't accumulate
    # snapshot copies in /tmp.
    rows = agg.collect()
    schema = agg.schema
    shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q139_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 50 = 0
),
upd AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 1.2 AS o_totalprice
  FROM orders WHERE o_orderkey % 25 = 0
),
merged AS (
  SELECT * FROM base
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL
  SELECT * FROM upd
),
final AS (SELECT * FROM merged WHERE o_orderkey % 150 <> 0)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       {DSUM('o_totalprice')} AS total
FROM final
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- q144: data-skipping read path, oracle-checked end to end ------------
# Drives the round-5 lakehouse read capability: publish orders as a
# versioned snapshot Z-ordered on o_custkey, read it back through
# read_table(ranges=...) — which consults the per-file min/max sidecar
# and hands Spark only surviving files — and aggregate. The DuckDB
# oracle computes the same aggregate straight off the raw table, so a
# pruning bug that DROPS a matching file breaks the hashes (the
# `pruned` column additionally pins that skipping actually engaged:
# files_read < files_total at every fixture SF).


def q144_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sinks import read_table as read_versioned
    from ..sinks import snapshot_files, write_version

    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # range hint for the layout from a one-row aggregate (control plane;
    # hints steer clustering only, never correctness)
    hi = orders.agg(F.max("o_custkey")).first()[0]
    path = tempfile.mkdtemp(prefix="q144_skip_")
    try:
        write_version(
            orders, path, cluster_by=(("o_custkey", 0, hi),), num_files=16
        )
        kept, total = snapshot_files(
            spark, path, ranges={"o_custkey": (100, 500)}
        )
        agg = (
            read_versioned(spark, path, ranges={"o_custkey": (100, 500)})
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                dsum("o_totalprice", "total"),
            )
            .withColumn("pruned", F.lit(len(kept) < total))
        )
        rows = agg.collect()
        schema = agg.schema
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q144_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       {DSUM('o_totalprice')} AS total,
       true AS pruned
FROM orders
WHERE o_custkey BETWEEN 100 AND 500
"""


# --- q145: copy-on-write MERGE, oracle-checked end to end ----------------
# Seeds a key-clustered versioned table, cow-merges a narrow-key batch
# (+25% price for every 4th order in the bottom tenth of the key range
# — nonempty at every SF, and the band shape leaves upper-range files
# provably untouched), and summarizes the final state.
# The oracle computes the same final state relationally, so the
# file-pruning invariant — carried-over files contain NO batch key — is
# value-checked through the storage protocol: a pruning bug that
# carries a should-have-been-rewritten file (stale row survives) or
# drops one breaks the hashes. The `linked` column additionally pins
# that the merge actually carried files by hard link rather than
# silently falling back to a full rewrite.


def q145_cow_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from ..sinks import merge_into, read_table, write_version

    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    hi = orders.agg(F.max("o_orderkey")).first()[0]
    path = tempfile.mkdtemp(prefix="q145_cow_")
    try:
        write_version(
            orders, path, cluster_by=(("o_orderkey", 0, hi),), num_files=16
        )
        batch = orders.filter(
            (F.col("o_orderkey") % 4 == 0)
            & (F.col("o_orderkey") <= F.lit(hi / 10.0))
        ).withColumn("o_totalprice", F.col("o_totalprice") * 1.25)
        merge_into(spark, path, batch, keys=["o_orderkey"], cow=True)

        def inodes(v):
            return {
                os.path.basename(p): os.stat(p).st_ino
                for p in glob.glob(f"{path}/snap_0000000{v}/part-*.parquet")
            }

        old, new = inodes(1), inodes(2)
        linked = any(old.get(n) == i for n, i in new.items())
        agg = (
            read_table(spark, path)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                dsum("o_totalprice", "total"),
            )
            .withColumn("linked", F.lit(linked))
            .orderBy("o_orderstatus")
        )
        rows = agg.collect()
        schema = agg.schema
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q145_SQL = f"""
WITH merged AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 4 = 0
               AND o_orderkey <= (SELECT MAX(o_orderkey) FROM orders) / 10.0
              THEN o_totalprice * 1.25
              ELSE o_totalprice END AS o_totalprice
  FROM orders
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       {DSUM('o_totalprice')} AS total,
       true AS linked
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- q150: change data feed, oracle-checked end to end -------------------
# Drives the CDF read path (sinks/changes.py): publish two versions of
# an orders-derived table (membership shifted by key residue, prices
# bumped on a second residue), ask table_changes for the delta, and
# summarize per change type. The oracle derives the same delta purely
# relationally from the raw table — so the full-outer diff, the
# null-safe struct comparison, and the pre/post-image emission must all
# be value-faithful through the storage protocol.


def q150_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sinks import table_changes, write_version

    orders = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v1 = orders.filter(F.col("o_orderkey") % 4 != 3)
    v2 = orders.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 5, F.col("o_totalprice") * 1.25
        ).otherwise(F.col("o_totalprice")),
    )
    path = tempfile.mkdtemp(prefix="q150_cdf_")
    try:
        write_version(v1, path)
        write_version(v2, path)
        agg = (
            table_changes(spark, path, 1, 2, keys=["o_orderkey"])
            .groupBy("_change_type")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
                dsum("o_totalprice", "total"),
            )
            .orderBy("_change_type")
        )
        rows = agg.collect()
        schema = agg.schema
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q150_SQL = f"""
WITH v1 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 <> 3
),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice * 1.25
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 4 <> 0
),
changes AS (
  SELECT 'insert' AS _change_type, o_orderkey, o_totalprice
  FROM v2 WHERE o_orderkey % 4 = 3
  UNION ALL
  SELECT 'delete', o_orderkey, o_totalprice
  FROM v1 WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT 'update_preimage', o_orderkey, o_totalprice
  FROM v1 WHERE o_orderkey % 4 = 1 AND o_orderkey % 10 = 5
  UNION ALL
  SELECT 'update_postimage', o_orderkey, o_totalprice
  FROM v2 WHERE o_orderkey % 4 = 1 AND o_orderkey % 10 = 5
)
SELECT _change_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       {DSUM('o_totalprice')} AS total
FROM changes
GROUP BY _change_type
ORDER BY _change_type
"""


# --- q151: incremental view maintenance off the change feed --------------
# The consumer loop CDF exists for: a materialized rollup built at
# version 1 is advanced to version 2 by folding in ONLY table_changes'
# delta (signed contributions: insert/postimage +, delete/preimage −;
# operators/incremental.py changes_increment). The oracle computes the
# version-2 aggregate DIRECTLY from the raw table — so the incremental
# result must be bit-identical to a full recompute, which the exact
# DECIMAL states guarantee by construction and this query now pins.


def q151_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.incremental import (
        aggregate_increment,
        changes_increment,
        merge_rollup,
        prune_empty_groups,
        rollup_readout,
    )
    from ..sinks import table_changes, write_version

    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v1 = orders.filter(F.col("o_orderkey") % 4 != 3)
    v2 = orders.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 5, F.col("o_totalprice") * 1.25
        ).otherwise(F.col("o_totalprice")),
    )
    keys, measures = ["o_orderstatus"], {"price": "o_totalprice"}
    path = tempfile.mkdtemp(prefix="q151_ivm_")
    try:
        write_version(v1, path)
        write_version(v2, path)
        rollup_v1 = aggregate_increment(v1, keys, measures)
        delta = changes_increment(
            table_changes(spark, path, 1, 2, keys=["o_orderkey"]),
            keys,
            measures,
        )
        updated = prune_empty_groups(
            merge_rollup(rollup_v1, delta, keys, measures)
        )
        out = rollup_readout(updated, measures).orderBy("o_orderstatus")
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q151_SQL = """
WITH v2 AS (
  SELECT o_orderstatus,
         CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice * 1.25
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 4 <> 0
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(28,6))) AS DOUBLE) AS price_total,
       CAST(SUM(CAST(price AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
         AS price_avg
FROM v2
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- q170: Bloom point-lookup read path, oracle-checked end to end -------
# Drives the round-5 point-lookup capability (sinks/bloom.py): publish
# orders as a custkey-clustered snapshot with a Bloom index on
# o_orderkey (the column the layout does NOT cluster — min/max stats
# cannot prune it), probe a deterministic key set through
# read_table(equals=...), and aggregate the matches. The DuckDB oracle
# computes the same aggregate straight off the raw table, so a bloom
# bug that DROPS a matching file (the one failure bloom filters must
# never have) breaks the hashes; the `pruned` column pins that skipping
# actually engaged (files_read < files_total at every fixture SF).

def q170_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sinks import read_table as read_versioned
    from ..sinks import snapshot_files, write_version

    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    hi = orders.agg(F.max("o_custkey")).first()[0]
    # CDC-batch-sized probe set (control plane by contract). Capped at 5
    # keys so the probe stays smaller than the file count at EVERY
    # fixture SF — a probe set ~= file count legitimately touches every
    # file and nothing prunes (the sidecar's win is keys << files, which
    # is the 100 TB regime: thousands of files, a point-lookup batch).
    keys = [
        r[0]
        for r in orders.filter(F.col("o_orderkey") % 997 == 0)
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(5)
        .collect()
    ]
    path = tempfile.mkdtemp(prefix="q170_bloom_")
    try:
        write_version(
            orders,
            path,
            cluster_by=(("o_custkey", 0, hi),),
            num_files=16,
            bloom_columns=("o_orderkey",),
        )
        kept, total = snapshot_files(spark, path, equals={"o_orderkey": keys})
        agg = (
            read_versioned(spark, path, equals={"o_orderkey": keys})
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
                dsum("o_totalprice", "total"),
            )
            .withColumn("pruned", F.lit(len(kept) < total))
        )
        rows = agg.collect()
        schema = agg.schema
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return local_relation(spark, rows, schema)


_Q170_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       {DSUM('o_totalprice')} AS total,
       true AS pruned
FROM orders
WHERE o_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % 997 = 0
  ORDER BY o_orderkey LIMIT 5
)
"""


QUERIES = {
    "q139_merge_transactional": q139_merge_transactional,
    "q144_skipping_read": q144_skipping_read,
    "q145_cow_merge": q145_cow_merge,
    "q150_table_changes": q150_table_changes,
    "q151_incremental_view": q151_incremental_view,
    "q170_bloom_point_lookup": q170_bloom_point_lookup,
}
ORACLE = {
    "q139_merge_transactional": _Q139_SQL,
    "q144_skipping_read": _Q144_SQL,
    "q145_cow_merge": _Q145_SQL,
    "q150_table_changes": _Q150_SQL,
    "q151_incremental_view": _Q151_SQL,
    "q170_bloom_point_lookup": _Q170_SQL,
}
