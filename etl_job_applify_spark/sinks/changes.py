"""Change data feed over versioned tables: what changed between two
snapshots, as rows.

Delta's CHANGE DATA FEED / Iceberg's changelog scan, derived from the
directory protocol instead of a transaction log: given two committed
versions and the table's key columns, emit one row per changed key with
``_change_type`` in {insert, delete, update_preimage, update_postimage}
(the Delta CDF vocabulary, so downstream incremental consumers port
unchanged). This is the read side of the merge/versioned stack: MERGE
commits versions, VACUUM expires them, CHANGES lets a consumer advance
from version N to M without rescanning the table.

Plan shape: one full-outer SORT-MERGE join of the two snapshots on the
key — both sides shuffle once on the key columns and nothing else moves.
Non-key comparison happens inside the join output via a single struct
equality (codegen, null-safe). At 100 TB the two snapshots are typically
written with the same clustering (optimize_table), so AQE sees
co-sorted inputs; a log-backed format does better (it KNOWS the changed
files) — documented trade, same consumer contract.

Snapshot-level caveat, stated plainly: a version produced by rewriting
the whole table (write_version) has no file-level lineage, so CHANGES is
computed by diffing, not replayed from a log — an update that leaves
every column equal is indistinguishable from "no change" and is NOT
emitted (Delta CDF behaves the same for MERGEs that write identical
values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import read_table

CHANGE_COL = "_change_type"


def table_changes(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int,
    keys: list[str],
) -> DataFrame:
    """Rows that changed between ``from_version`` and ``to_version``.

    Output schema: the table's columns plus ``_change_type``. Updates
    emit BOTH images (preimage carries the old values, postimage the
    new), inserts/deletes carry the new/old row. Keys must uniquely
    identify rows in each snapshot — the same contract MERGE enforces.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    old = read_table(spark, table_path, version=from_version)
    new = read_table(spark, table_path, version=to_version)
    if old.columns != new.columns:
        raise ValueError(
            f"schema changed between versions: {old.columns} vs "
            f"{new.columns}; diff the overlapping columns explicitly"
        )
    payload = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        F.struct(*payload).alias("_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        F.struct(*payload).alias("_new"),
    )
    joined = o.join(n, [f"_k_{k}" for k in keys], "full_outer")

    def _emit(img: str, ctype: str) -> DataFrame:
        return joined.select(
            *[F.col(f"_k_{k}").alias(k) for k in keys],
            *[F.col(f"{img}.{c}").alias(c) for c in payload],
            F.lit(ctype).alias(CHANGE_COL),
            "_old",
            "_new",
        )

    inserts = _emit("_new", "insert").filter(F.col("_old").isNull())
    deletes = _emit("_old", "delete").filter(F.col("_new").isNull())
    both = (
        F.col("_old").isNotNull()
        & F.col("_new").isNotNull()
        # null-safe struct inequality: any payload difference counts
        & ~F.col("_old").eqNullSafe(F.col("_new"))
    )
    pre = _emit("_old", "update_preimage").filter(both)
    post = _emit("_new", "update_postimage").filter(both)
    out = inserts.unionByName(deletes).unionByName(pre).unionByName(post)
    return out.drop("_old", "_new")
