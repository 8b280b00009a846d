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
_CURSOR = "_cdf_cursor.json"


def consume_changes(
    spark: SparkSession,
    table_path: str,
    cursor_path: str,
    keys: list[str],
):
    """Cursor-tracked change consumption: the daemon loop every CDF
    consumer runs. Returns ``(changes, head_version)`` where ``changes``
    covers (last committed cursor, head] — or ``(None, head)`` when the
    cursor is already at head. After the consumer has durably applied
    the delta, it calls ``commit_cursor(cursor_path, head_version)``;
    crashing before that re-delivers the same delta next call —
    at-least-once, the same contract as every checkpointed consumer.
    Because the delta is derived by DIFFING two committed snapshots (not
    tailing a log), redelivery is idempotent-friendly: the same
    (from, to) pair always yields the same rows.

    If retention (``vacuum_table``) has expired the cursor's snapshot,
    raises with a resync instruction instead of silently emitting a
    wrong partial delta — the operational failure mode log-based CDC
    calls "cursor off the end of the log"."""
    import json
    import os

    from .versioned import list_versions

    versions = list_versions(spark, table_path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {table_path}")
    head = versions[-1]
    last = 0
    if os.path.exists(cursor_path):
        with open(cursor_path) as fh:
            last = json.load(fh)["version"]
    if last == head:
        return None, head
    if last and last not in versions:
        raise ValueError(
            f"cursor version {last} was vacuumed from {table_path} "
            f"(available: {versions}); resync by reprocessing the full "
            f"snapshot and committing the cursor at head"
        )
    if last == 0:
        # first consumption: everything at head is an insert
        base = read_table(spark, table_path, version=head)
        changes = base.withColumn(CHANGE_COL, F.lit("insert"))
    else:
        changes = table_changes(spark, table_path, last, head, keys)
    return changes, head


def commit_cursor(cursor_path: str, version: int) -> None:
    """Durably record the consumer's position (write-then-rename, so a
    crash never leaves a torn cursor)."""
    import json
    import os

    tmp = f"{cursor_path}.tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, cursor_path)


def table_changes(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int,
    keys: list[str],
    verify_keys: bool = False,
) -> DataFrame:
    """Rows that changed between ``from_version`` and ``to_version``.

    Output schema: the table's columns plus ``_change_type``. Updates
    emit BOTH images (preimage carries the old values, postimage the
    new), inserts/deletes carry the new/old row. Keys must uniquely
    identify rows in each snapshot — the same contract MERGE enforces;
    ``verify_keys=True`` pays one counting pass per snapshot to raise on
    violation (Delta MERGE's duplicate-match error) instead of silently
    emitting a many-to-many diff. Leave it off when an upstream
    invariant (e.g. the table is only written by merge_into on the same
    keys) already guarantees uniqueness.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    old = read_table(spark, table_path, version=from_version)
    new = read_table(spark, table_path, version=to_version)
    if verify_keys:
        for label, df in (("from", old), ("to", new)):
            dup = (
                df.groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                viol = {k: dup[0][k] for k in keys}
                raise ValueError(
                    f"keys {keys} are not unique in the {label}-version "
                    f"snapshot (e.g. {viol}); a key-ambiguous diff would "
                    "be meaningless"
                )
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


def schema_changes(
    spark, table_path: str, from_version: int, to_version: int
) -> list[dict]:
    """Schema drift between two committed versions: added / removed /
    type-changed columns, as a list of findings ({change, column,
    before, after}). The DDL-side companion of ``table_changes`` (which
    diffs rows): CDC consumers alert on BOTH — a silently widened or
    dropped column breaks downstream contracts before any row does.
    Reads only parquet footers (schema inference on the snapshot
    directories), no data scan."""
    from .versioned import _resolve_snapshot

    a = dict(
        spark.read.parquet(
            _resolve_snapshot(spark, table_path, from_version)
        ).dtypes
    )
    b = dict(
        spark.read.parquet(
            _resolve_snapshot(spark, table_path, to_version)
        ).dtypes
    )
    out: list[dict] = []
    for col in sorted(a.keys() - b.keys()):
        out.append(
            {"change": "removed", "column": col, "before": a[col], "after": None}
        )
    for col in sorted(b.keys() - a.keys()):
        out.append(
            {"change": "added", "column": col, "before": None, "after": b[col]}
        )
    for col in sorted(a.keys() & b.keys()):
        if a[col] != b[col]:
            out.append(
                {
                    "change": "type_changed",
                    "column": col,
                    "before": a[col],
                    "after": b[col],
                }
            )
    return out


def sync_changes_to_jdbc(
    spark,
    table_path: str,
    cursor_path: str,
    keys: list[str],
    url: str,
    table: str,
    staging_table: str,
    user: str,
    password: str,
    driver: str,
) -> int:
    """CDC-out: apply the lake table's change feed to a JDBC serving
    table (lake → warehouse), exactly-once in END STATE.

    One cycle: consume the delta from the cursor, stage it to the
    warehouse with a DISTRIBUTED JDBC write (never driver-side rows),
    then apply it in ONE transaction —

        DELETE FROM target WHERE key IN (SELECT key FROM staging)
        INSERT INTO target SELECT ... FROM staging WHERE __op <> 'delete'

    — and only then commit the cursor. The delete-then-insert covers
    inserts, updates (post-image re-inserted) and deletes in one shape,
    and REDELIVERY after a crash (cursor not yet committed) replays the
    same delta to the same end state — the at-least-once/idempotent pair
    that makes the cycle exactly-once where it matters. Returns the
    number of change rows applied (0 = cursor already at head)."""
    from pyspark.sql import functions as F

    from .redshift import _check_identifier, execute_transaction
    from .writers import write_jdbc

    # caller-supplied names all land in identifier position of
    # hand-built SQL — validate up front, before any staging work
    table = _check_identifier(table)
    staging_table = _check_identifier(staging_table)
    keys = [_check_identifier(k) for k in keys]

    changes, head = consume_changes(spark, table_path, cursor_path, keys)
    if changes is None:
        return 0
    payload = changes.filter(
        F.col("_change_type") != "update_preimage"
    ).withColumn(
        "__op",
        F.when(F.col("_change_type") == "delete", "delete").otherwise("upsert"),
    ).drop("_change_type")
    n = payload.count()
    if n == 0:
        commit_cursor(cursor_path, head)
        return 0
    write_jdbc(
        payload, url, staging_table, user, password, driver, mode="overwrite"
    )
    # Spark's JDBC writer creates case-sensitive (quoted) columns on the
    # STAGING table, while the user-created TARGET follows dialect
    # default case — so staging identifiers are quoted, target ones are
    # not. (Targets with quoted mixed-case columns should pass those
    # exact names in ``keys``.)
    key_cond = " AND ".join(f't.{k} = s."{k}"' for k in keys)
    data_cols = ", ".join(
        f'"{_check_identifier(c)}"' for c in payload.columns if c != "__op"
    )
    execute_transaction(
        spark,
        url,
        [
            f"DELETE FROM {table} t WHERE EXISTS "
            f"(SELECT 1 FROM {staging_table} s WHERE {key_cond})",
            f"INSERT INTO {table} SELECT {data_cols} FROM {staging_table} "
            # Spark maps StringType to CLOB on some dialects (Derby);
            # the cast keeps the marker comparable everywhere
            "WHERE CAST(\"__op\" AS VARCHAR(16)) <> 'delete'",
        ],
        user,
        password,
    )
    commit_cursor(cursor_path, head)
    return n


def changes_to_cdc(changes: DataFrame, op_col: str = "op") -> DataFrame:
    """Adapt a change relation (``table_changes`` /
    ``consume_changes`` output — ``_change_type`` in {insert, delete,
    update_preimage, update_postimage}) to the index families' CDC
    contract (``op_col`` in {add, delete}): inserts and update
    POSTIMAGES become adds, deletes stay deletes, preimages drop. No
    separate "replace" op is needed — the ``*_apply_cdc`` operators
    treat an add of a live id as an upsert (the old version is
    tombstoned in the same snapshot), so an update is exactly its
    postimage add. This is the one-feed composition glue: a versioned
    table's change feed drives text, vector, and dedup serving through
    ``lifecycle.apply_cdc_documents`` with a single epoch mark."""
    ct = F.col(CHANGE_COL)
    return (
        changes.filter(ct != "update_preimage")
        .withColumn(
            op_col,
            F.when(ct == "delete", F.lit("delete")).otherwise(
                F.lit("add")
            ),
        )
        .drop(CHANGE_COL)
    )
