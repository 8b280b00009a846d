"""Versioned parquet tables: snapshot isolation + time travel without a
table format dependency.

Layout: ``table_path/snap_00000001, snap_00000002, ...`` — each snapshot
is a complete table written by Spark's committer (the ``_SUCCESS`` marker
lands last, so readers never see a half-written snapshot; a crash leaves
an invisible orphan that the next write simply overwrites). The live
version is the highest committed number; older versions stay readable
until retention prunes them — and pruning runs only AFTER a newer commit,
so a committed recovery point always exists. Each snapshot also carries a
``_stats.json`` sidecar (per-file column min/max harvested from the
parquet footers — sinks/stats.py) that ``read_table(ranges=...)``
consults to skip files, the directory-protocol version of Delta/Iceberg
data skipping; underscore-prefixed members are invisible to parquet
reads, so the sidecar never pollutes the data.

This generalizes the CDC sink's snapshot discipline
(streaming/jobs.py run_foreach_batch_upsert) into a reusable lake API:
append/overwrite jobs get atomic publish + time travel; the production
upgrade path is a transactional format (Delta/Iceberg), where these
semantics come from the table format instead of the directory protocol.

Scale notes: a snapshot write is an ordinary distributed parquet write
(full parallelism); listing is O(versions) driver-side name operations;
time travel is a direct path read — no log replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation

_PREFIX = "snap_"


def _snapshots(spark: SparkSession, table_path: str):
    """(fs, root, sorted committed snapshot names). A snapshot counts only
    once its _SUCCESS marker exists."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return fs, root, []
    names = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith(_PREFIX)
            and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            )
        ):
            names.append(name)
    return fs, root, sorted(names)


def list_versions(spark: SparkSession, table_path: str) -> list[int]:
    _, _, names = _snapshots(spark, table_path)
    return [int(n[len(_PREFIX):]) for n in names]


def _arrange(df: DataFrame, cluster_by, num_files: int | None) -> DataFrame:
    """Z-order-cluster ``df`` so each written file covers a compact
    region of the clustered columns' space — the layout per-file min/max
    stats exist to exploit (see sinks/writers.py write_zordered).

    ``num_files`` pins the range-partition count; without it AQE
    right-sizes (and at test scale collapses everything to one file,
    which defeats skipping — production tables size this from bytes,
    like sinks/writers.py compact_parquet)."""
    if not cluster_by:
        return df
    from .writers import zorder_expr

    tagged = df.withColumn("__z", zorder_expr(cluster_by))
    parted = (
        tagged.repartitionByRange(num_files, "__z")
        if num_files
        else tagged.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")


def write_version(
    df: DataFrame,
    table_path: str,
    retain: int | None = None,
    cluster_by=None,
    num_files: int | None = None,
    bloom_columns=None,
) -> int:
    """Publish ``df`` as the next version of the table; returns the new
    version number. ``retain``: keep only the newest N versions (pruned
    only after this commit succeeds); None keeps everything.

    ``cluster_by``: optional Z-order spec ((column, lo, hi), ...) — lays
    the snapshot's files out so the per-file stats sidecar prunes
    selectively on every clustered column.

    Every snapshot gets a ``_stats.json`` sidecar (per-file column
    min/max from the parquet footers — no data re-scan); ``read_table``
    consults it to skip files under range predicates. Best-effort: the
    sidecar lands after _SUCCESS, and a reader that races it simply
    full-scans.

    ``bloom_columns``: optionally also build per-file Bloom bitsets for
    these columns (sinks/bloom.py) — the point-lookup index for columns
    the Z-order layout does NOT cluster. Costs one extra
    column-projected scan of the just-written snapshot."""
    from . import stats as _stats

    spark = df.sparkSession
    jvm = spark._jvm
    fs, root, names = _snapshots(spark, table_path)
    nxt = (int(names[-1][len(_PREFIX):]) + 1) if names else 1
    snap_dir = f"{table_path}/{_PREFIX}{nxt:08d}"
    _arrange(df, cluster_by, num_files).write.mode("overwrite").parquet(
        snap_dir
    )
    _stats.write_stats(snap_dir)
    # bloom index: an explicit bloom_columns argument RECORDS the index
    # as a table property (Delta TBLPROPERTIES shape); with no argument
    # the recorded property applies — so MERGE/OPTIMIZE/later writers
    # keep rebuilding the sidecar instead of silently dropping it
    from . import properties as _props

    if bloom_columns:
        _props.update_table_properties(
            table_path, bloom_columns=list(bloom_columns)
        )
    else:
        bloom_columns = _props.get_table_properties(table_path).get(
            "bloom_columns"
        )
    if bloom_columns:
        from . import bloom as _bloom

        # the snapshot is ALREADY live at this point (parquet +
        # _SUCCESS written, readers see it) — a bloom-build failure
        # (e.g. the max_total_positions budget on a snapshot that
        # outgrew the dense-sidecar sweet spot) must NOT surface as a
        # failed publish: the caller would retry and duplicate the
        # version, and retention below would be skipped. The sidecar is
        # a pure accelerator — a missing one just means point lookups
        # full-scan — so degrade to "no sidecar" with a warning; FSCK
        # (check_table repair=True) rebuilds it once the cause is fixed.
        try:
            _bloom.build_blooms(spark, snap_dir, bloom_columns)
        except Exception as exc:  # noqa: BLE001 — deliberate degrade
            import logging

            logging.getLogger(__name__).warning(
                "bloom sidecar build failed for %s (version %d); "
                "publishing without bloom index — point lookups will "
                "full-scan until FSCK repair rebuilds it: %s",
                table_path, nxt, exc,
            )
    if retain is not None and retain >= 1:
        survivors = (names + [f"{_PREFIX}{nxt:08d}"])[-retain:]
        for name in names:
            if name not in survivors:
                fs.delete(jvm.org.apache.hadoop.fs.Path(root, name), True)
    return nxt


class CommitConflict(Exception):
    """Another writer published a version after this writer's read.

    The optimistic-concurrency signal: re-read the table, recompute, and
    retry the commit (sinks/merge.py merge_into does exactly that)."""


def commit_version(
    df: DataFrame, table_path: str, base_version: int
) -> int:
    """Compare-and-swap publish: commit ``df`` as ``base_version + 1``
    iff ``base_version`` is still the newest committed version.

    Protocol: write to a uniquely-named staging directory (full
    distributed write), then RENAME it to ``snap_{base+1}`` — on
    HDFS-semantics filesystems rename refuses an existing destination,
    so of N racing writers exactly one wins; losers raise
    ``CommitConflict`` with their staging cleaned up. This is the
    directory-protocol version of a transaction-log CAS (what Delta does
    against ``_delta_log/N.json``); object stores without atomic rename
    (S3) need the real table format — documented trade, same API.
    """

    def populate(staging: str) -> None:
        df.write.mode("overwrite").parquet(staging)

    return commit_staged(df.sparkSession, table_path, base_version, populate)


def commit_staged(
    spark: SparkSession, table_path: str, base_version: int, populate
) -> int:
    """The CAS commit with caller-controlled staging content:
    ``populate(staging_path)`` fills the staging directory (a parquet
    write, hard-linked carryover files, anything that leaves a complete
    readable snapshot). Stats are harvested after population, so the
    rename publishes data and skipping metadata atomically together.
    Used by ``commit_version`` (plain write) and the copy-on-write MERGE
    (sinks/merge.py), which populates rewritten files + links."""
    jvm = spark._jvm
    fs, root, names = _snapshots(spark, table_path)
    latest = int(names[-1][len(_PREFIX):]) if names else 0
    if latest != base_version:
        raise CommitConflict(
            f"expected latest version {base_version}, found {latest}"
        )
    import uuid

    nxt = base_version + 1
    tag = uuid.uuid4().hex
    staging_name = f".staging_{tag}"
    staging = f"{table_path}/{staging_name}"
    populate(staging)
    from . import stats as _stats

    _stats.write_stats(staging)
    # recorded bloom index rebuilds for CAS commits too (MERGE path) —
    # the rename publishes data + stats + bloom atomically together
    from . import properties as _props

    bloom_cols = _props.get_table_properties(table_path).get("bloom_columns")
    if bloom_cols:
        from . import bloom as _bloom

        _bloom.build_blooms(spark, staging, bloom_cols)
    # writer-unique commit token: Hadoop's rename follows mv semantics —
    # when the destination directory already EXISTS, the source is moved
    # INSIDE it and rename still returns true, which would silently drop
    # a racing writer's snapshot. The token only appears at the
    # destination ROOT if OUR rename created the destination, so its
    # presence is the actual commit test. (Underscore-prefixed files are
    # invisible to parquet reads, like _SUCCESS.)
    token = jvm.org.apache.hadoop.fs.Path(staging, f"_commit_{tag}")
    fs.create(token, True).close()
    dest = jvm.org.apache.hadoop.fs.Path(root, f"{_PREFIX}{nxt:08d}")
    renamed = fs.rename(jvm.org.apache.hadoop.fs.Path(staging), dest)
    won = renamed and fs.exists(
        jvm.org.apache.hadoop.fs.Path(dest, f"_commit_{tag}")
    )
    if not won:
        for leftover in (
            jvm.org.apache.hadoop.fs.Path(dest, staging_name),  # moved inside
            jvm.org.apache.hadoop.fs.Path(staging),  # rename refused
        ):
            if fs.exists(leftover):
                fs.delete(leftover, True)
        raise CommitConflict(
            f"version {nxt} was committed concurrently under {table_path}"
        )
    # The token has served its purpose (proving OUR rename created the
    # destination); drop it so committed snapshots carry only the layout
    # external tools expect (_SUCCESS + data files).
    fs.delete(jvm.org.apache.hadoop.fs.Path(dest, f"_commit_{tag}"), False)
    return nxt


def _commit_time_ms(fs, jvm, root, name: str) -> int:
    """Commit instant of a snapshot = its _SUCCESS marker's mtime (the
    last file the committer writes, so it IS the publish moment)."""
    p = jvm.org.apache.hadoop.fs.Path(
        jvm.org.apache.hadoop.fs.Path(root, name), "_SUCCESS"
    )
    return fs.getFileStatus(p).getModificationTime()


def version_as_of(
    spark: SparkSession, table_path: str, ts_ms: int
) -> int:
    """Timestamp time travel (Delta's ``TIMESTAMP AS OF``): the newest
    version committed at or before ``ts_ms`` (epoch millis). Raises if
    the table's first commit is later than the asked instant — reading
    "before the table existed" is an error, not an empty frame."""
    jvm = spark._jvm
    fs, root, names = _snapshots(spark, table_path)
    eligible = [
        int(n[len(_PREFIX):])
        for n in names
        if _commit_time_ms(fs, jvm, root, n) <= ts_ms
    ]
    if not eligible:
        raise FileNotFoundError(
            f"no version of {table_path} committed at or before {ts_ms}"
        )
    return max(eligible)


def table_history(spark: SparkSession, table_path: str) -> DataFrame:
    """DESCRIBE HISTORY: one row per committed version — version,
    committed_at, file count, total bytes. Driver-side listing of
    O(versions × files) name operations; the observability surface
    retention policy and debugging start from."""
    jvm = spark._jvm
    fs, root, names = _snapshots(spark, table_path)
    rows = []
    for name in names:
        snap = jvm.org.apache.hadoop.fs.Path(root, name)
        n_files, nbytes = 0, 0
        for st in fs.listStatus(snap):
            fname = st.getPath().getName()
            if fname.endswith(".parquet") and not fname.startswith(("_", ".")):
                n_files += 1
                nbytes += st.getLen()
        rows.append(
            (
                int(name[len(_PREFIX):]),
                _commit_time_ms(fs, jvm, root, name),
                n_files,
                nbytes,
            )
        )
    return local_relation(spark, 
        rows, "version int, committed_at_ms long, n_files int, total_bytes long"
    )


def _resolve_snapshot(
    spark: SparkSession, table_path: str, version: int | None
) -> str:
    _, _, names = _snapshots(spark, table_path)
    if not names:
        raise FileNotFoundError(f"no committed snapshot under {table_path}")
    if version is None:
        name = names[-1]
    else:
        name = f"{_PREFIX}{version:08d}"
        if name not in names:
            avail = [int(n[len(_PREFIX):]) for n in names]
            raise FileNotFoundError(
                f"version {version} not found under {table_path}; "
                f"available: {avail}"
            )
    return f"{table_path}/{name}"


def snapshot_files(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    ranges=None,
    equals=None,
) -> tuple[list[str], int]:
    """(data files a ``ranges``/``equals``-constrained read would scan,
    total data files in the snapshot). The observability hook for data
    skipping — tests and operators use it to SEE pruning instead of
    trusting it. ``ranges`` prunes on min/max stats, ``equals`` on the
    Bloom sidecar; together they intersect."""
    from . import stats as _stats

    snap = _resolve_snapshot(spark, table_path, version)
    kept: list[str] | None = None
    total: int | None = None
    if ranges:
        pruned = _stats.prune_files(snap, ranges)
        if pruned is not None:
            kept, total = pruned
    if equals:
        from . import bloom as _bloom

        pruned = _bloom.prune_files_bloom(spark, snap, equals)
        if pruned is not None:
            bkept, btotal = pruned
            if kept is None:
                kept, total = bkept, btotal
            else:
                keep_set = set(bkept)
                kept = [p for p in kept if p in keep_set]
    if kept is not None:
        return kept, total
    local = _stats._local_path(snap)
    import os

    every = [
        os.path.join(local, n)
        for n in sorted(os.listdir(local))
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    ]
    return every, len(every)


def optimize_table(
    spark: SparkSession,
    table_path: str,
    cluster_by=None,
    target_file_bytes: int = 128 * 1024 * 1024,
    retain: int | None = None,
) -> int:
    """Rewrite the latest snapshot with a maintained layout — the
    OPTIMIZE / compaction step of the lakehouse loop.

    Reads the live version, right-sizes the file count from the ACTUAL
    snapshot bytes (the compact_parquet rule), optionally Z-orders on
    ``cluster_by``, and publishes the result as a NEW version — never an
    in-place rewrite, so readers of the old version are undisturbed and
    a crash mid-optimize leaves the table exactly as it was (the same
    recovery contract as every other commit). The new snapshot's stats
    sidecar is rebuilt automatically, so skipping improves with the
    layout. Returns the new version number.

    Incremental sinks at scale need this on a schedule: streaming/CDC
    commits land many small files, and a year of micro-batches is 10^7
    footer reads per scan without compaction."""
    import math
    import os

    from . import stats as _stats

    snap = _resolve_snapshot(spark, table_path, None)
    local = _stats._local_path(snap)
    total = 0
    if local and os.path.isdir(local):
        for name in os.listdir(local):
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(local, name))
    num_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(snap)
    if not cluster_by:
        # repartition (not coalesce): rebalances skew, keeps the write wide
        df = df.repartition(num_files)
    return write_version(
        df,
        table_path,
        retain=retain,
        cluster_by=cluster_by,
        num_files=num_files if cluster_by else None,
    )


def vacuum_table(
    spark: SparkSession,
    table_path: str,
    retain: int = 2,
    min_age_s: float = 3600.0,
) -> dict:
    """Apply retention without requiring a new commit — the VACUUM step
    of the lakehouse loop (Delta's VACUUM / Iceberg's expire_snapshots).

    Removes, in this order of safety:

    - committed snapshots beyond the newest ``retain`` (time travel to
      them stops working; the newest ``retain`` always survive, so a
      committed recovery point always exists);
    - crash debris older than ``min_age_s`` seconds: ``.staging_*``
      directories from writers that died before their CAS rename, and
      orphan ``snap_*`` directories that never got a ``_SUCCESS``
      marker. The age gate is what makes this safe to run concurrently
      with live writers — an in-flight writer's staging directory is
      younger than any sane ``min_age_s`` (Delta's VACUUM makes the
      identical timing argument for unreferenced files).

    Returns ``{"snapshots_removed": [versions], "debris_removed":
    [names]}``. Idempotent; a crash mid-vacuum just leaves some garbage
    for the next run."""
    if retain < 1:
        raise ValueError(f"retain must be >= 1, got {retain}")
    import time

    jvm = spark._jvm
    fs, root, names = _snapshots(spark, table_path)
    removed_versions: list[int] = []
    for name in names[:-retain] if len(names) > retain else []:
        fs.delete(jvm.org.apache.hadoop.fs.Path(root, name), True)
        removed_versions.append(int(name[len(_PREFIX):]))
    debris: list[str] = []
    if fs.exists(root):
        committed = set(names)
        cutoff = (time.time() - min_age_s) * 1000.0
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not st.isDirectory():
                continue
            is_staging = name.startswith(".staging_")
            is_orphan_snap = (
                name.startswith(_PREFIX) and name not in committed
            )
            if (
                (is_staging or is_orphan_snap)
                and st.getModificationTime() <= cutoff
            ):
                fs.delete(st.getPath(), True)
                debris.append(name)
    return {
        "snapshots_removed": removed_versions,
        "debris_removed": sorted(debris),
    }


def read_table(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    ranges=None,
    as_of_ms: int | None = None,
    equals=None,
) -> DataFrame:
    """Read the latest committed version, or time-travel to ``version``
    (or to the newest version committed at or before ``as_of_ms`` —
    mutually exclusive with ``version``).

    ``ranges``: optional {column: (lo, hi)} bounds (inclusive; None =
    unbounded side). When the snapshot carries a stats sidecar, files
    whose min/max PROVE no match are never handed to Spark; the
    equivalent residual predicate is re-applied to the survivors, so the
    result equals reading everything and filtering — pruning is an
    optimization, never a semantics change. Without a sidecar (or on a
    non-local URI) the read degrades to scan + filter.

    ``equals``: optional {col: value or list} equality predicate,
    pruned against the Bloom sidecar (sinks/bloom.py) — the point-
    lookup path for columns the layout does not cluster. Same contract:
    residual predicate always re-applied, missing sidecar degrades to
    scan + filter. Composes with ``ranges`` (file sets intersect)."""
    from . import stats as _stats

    if as_of_ms is not None:
        if version is not None:
            raise ValueError("pass version OR as_of_ms, not both")
        version = version_as_of(spark, table_path, as_of_ms)
    snap = _resolve_snapshot(spark, table_path, version)
    if not ranges and not equals:
        return spark.read.parquet(snap)
    pred = F.lit(True)
    if ranges:
        pred = pred & _stats.range_predicate(ranges)
    if equals:
        from . import bloom as _bloom

        pred = pred & _bloom.equality_predicate(equals)
    kept, _total = snapshot_files(
        spark, table_path, version=version, ranges=ranges, equals=equals
    )
    all_files, _ = snapshot_files(spark, table_path, version=version)
    if len(kept) == len(all_files):
        return spark.read.parquet(snap).filter(pred)
    if not kept:
        # provably-empty result, schema preserved from the snapshot
        return spark.read.parquet(snap).limit(0)
    return spark.read.parquet(*kept).filter(pred)


def clone_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    version: int | None = None,
) -> int:
    """Zero-copy shallow clone: publish ``src``'s snapshot (latest or
    ``version``) as version 1 of a NEW table at ``dst_path``, carrying
    every data file as a hard link — the Delta SHALLOW CLONE workflow
    (dev/test sandboxes, reproducible experiment pins) on the directory
    protocol.

    The clone is an independent table from the first byte: parquet files
    are immutable under this protocol (writers always publish NEW
    snapshots), so shared inodes are safe; later commits to either table
    never touch the other, and VACUUM on the source only unlinks names
    (data lives until the last link drops — no dangling-clone hazard,
    which is the trade Delta shallow clones accept where dropping source
    data DOES break clones). Stats/bloom sidecars are copied as regular
    files (tiny). Non-local tables raise — object stores need the real
    format's clone. Returns the new table's version number (1)."""
    import os
    import shutil

    from . import stats as _stats
    from .bloom import BLOOM_FILE

    snap = _resolve_snapshot(spark, src_path, version)
    local_src = _stats._local_path(snap)
    local_dst = _stats._local_path(dst_path)
    if local_src is None or local_dst is None:
        raise ValueError("clone_table requires local src and dst paths")
    if os.path.exists(local_dst) and os.listdir(local_dst):
        raise ValueError(f"clone destination not empty: {dst_path}")
    dst_snap = os.path.join(local_dst, f"{_PREFIX}{1:08d}")
    os.makedirs(dst_snap, exist_ok=True)
    for name in sorted(os.listdir(local_src)):
        src_f = os.path.join(local_src, name)
        dst_f = os.path.join(dst_snap, name)
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            os.link(src_f, dst_f)  # zero-copy
        elif name in ("_SUCCESS", _stats.STATS_FILE, BLOOM_FILE):
            shutil.copyfile(src_f, dst_f)
    # table-root properties (recorded bloom index, etc.) travel with the
    # clone: without this, the clone's NEXT commit would silently stop
    # maintaining the bloom sidecar — breaking the properties.py
    # contract that maintenance never drops a recorded index
    from .properties import PROPERTIES_FILE

    src_root = _stats._local_path(src_path) or ""
    src_props = os.path.join(src_root, PROPERTIES_FILE)
    if src_root and os.path.isfile(src_props):
        shutil.copyfile(src_props, os.path.join(local_dst, PROPERTIES_FILE))
    # _SUCCESS must exist for the snapshot to count as committed
    open(os.path.join(dst_snap, "_SUCCESS"), "a").close()
    return 1


def fsck_table(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    repair: bool = False,
) -> list[dict]:
    """Consistency check for a snapshot's skipping metadata — the FSCK
    of the directory protocol. Verifies, per sidecar:

    - ``_stats.json`` lists exactly the snapshot's data files and its
      per-file min/max agree with a fresh footer harvest;
    - ``_bloom.json`` (when the table records bloom columns) covers
      every data file.

    Returns a list of findings ({kind, detail}); empty = clean. With
    ``repair=True``, stale/missing sidecars are rebuilt in place (safe:
    sidecars are derived data — readers treat a missing/invalid sidecar
    as "full scan", so repair can only improve pruning, never change
    results). A reader-visible corruption (missing _SUCCESS) is
    reported but never repaired — that is a failed commit, not drift."""
    import os

    from . import bloom as _bloom
    from . import properties as _props
    from . import stats as _stats

    snap = _resolve_snapshot(spark, table_path, version)
    local = _stats._local_path(snap)
    findings: list[dict] = []
    if local is None:
        return [{"kind": "non-local", "detail": snap}]
    data_files = sorted(
        n
        for n in os.listdir(local)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )
    if not os.path.isfile(os.path.join(local, "_SUCCESS")):
        findings.append({"kind": "uncommitted-snapshot", "detail": snap})
    fresh = _stats.collect_file_stats(snap)
    stored = _stats.load_stats(snap)
    if stored is None:
        findings.append({"kind": "missing-stats", "detail": snap})
    elif fresh is not None and stored["files"] != fresh["files"]:
        stale = sorted(
            set(stored["files"]) ^ set(fresh["files"])
        ) or ["min/max drift"]
        findings.append(
            {"kind": "stale-stats", "detail": ", ".join(map(str, stale))}
        )
    bloom_cols = _props.get_table_properties(table_path).get("bloom_columns")
    if bloom_cols:
        doc = _bloom.load_blooms(snap)
        if doc is None:
            findings.append({"kind": "missing-bloom", "detail": snap})
        else:
            for col in bloom_cols:
                covered = set(doc.get("columns", {}).get(col, {}).get("files", {}))
                missing = sorted(set(data_files) - covered)
                if missing:
                    findings.append(
                        {
                            "kind": "bloom-uncovered-files",
                            "detail": f"{col}: {', '.join(missing)}",
                        }
                    )
    if repair and findings:
        if any(f["kind"] in ("missing-stats", "stale-stats") for f in findings):
            _stats.write_stats(snap)
        if bloom_cols and any(
            f["kind"] in ("missing-bloom", "bloom-uncovered-files")
            for f in findings
        ):
            _bloom.build_blooms(spark, snap, bloom_cols)
    return findings


def restore_table(
    spark: SparkSession, table_path: str, version: int
) -> int:
    """RESTORE: publish snapshot ``version`` as the NEW latest version
    (Delta's RESTORE TABLE ... TO VERSION AS OF). History is preserved —
    the bad versions stay readable for forensics until retention prunes
    them; the restore itself is one more commit, so it is audit-visible
    in ``table_history`` and CDC consumers see it as an ordinary delta.
    Data files carry over as hard links (zero copy, same immutability
    argument as ``clone_table``); sidecars copy along. Returns the new
    version number."""
    import os
    import shutil

    from . import stats as _stats
    from .bloom import BLOOM_FILE

    src_snap = _resolve_snapshot(spark, table_path, version)
    local_src = _stats._local_path(src_snap)
    local_root = _stats._local_path(table_path)
    if local_src is None or local_root is None:
        raise ValueError("restore_table requires a local table path")
    _, _, names = _snapshots(spark, table_path)
    nxt = int(names[-1][len(_PREFIX):]) + 1
    dst_snap = os.path.join(local_root, f"{_PREFIX}{nxt:08d}")
    os.makedirs(dst_snap, exist_ok=True)
    for name in sorted(os.listdir(local_src)):
        src_f = os.path.join(local_src, name)
        dst_f = os.path.join(dst_snap, name)
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            os.link(src_f, dst_f)
        elif name in (_stats.STATS_FILE, BLOOM_FILE):
            shutil.copyfile(src_f, dst_f)
    open(os.path.join(dst_snap, "_SUCCESS"), "a").close()
    return nxt


# ---------------------------------------------------------------------------
# Log tables: CAS-committed append logs
#
# A versioned table (above) treats each snapshot as the COMPLETE table;
# a log table treats each snapshot as one APPENDED batch and the table
# as the union of live snapshots — the right shape for append-heavy
# streams (detected dedup pairs, ingested corpus batches, index
# entries) where rewriting the whole table per append is unaffordable.
# Appends are the same commit_staged CAS race (concurrent appenders
# serialize; losers retry), and each snapshot can carry marker files
# (_epoch_*) that fence at-least-once replays into exactly-once
# appends: a redelivered batch finds its mark on a live snapshot and
# skips. Object-store capable — no renames of existing data. The
# dedup index's versioned layout (dedup/incremental.py) is this
# protocol plus index-specific params/compaction.


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def fs_write_json(spark: SparkSession, path: str, obj) -> None:
    import json

    fs, p = _fs_for(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def fs_read_json(spark: SparkSession, path: str):
    import json

    fs, p = _fs_for(spark, path)
    stream = fs.open(p)
    try:
        data = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def fs_touch(spark: SparkSession, path: str) -> None:
    fs, p = _fs_for(spark, path)
    fs.create(p, True).close()


def fs_count_data_files(spark: SparkSession, path: str) -> int:
    """Recursive parquet data-file count through the Hadoop FS API — the
    stats functions' counter. ``os.walk`` silently yields 0 on
    object-store paths even though the versioned layout is advertised
    as object-store capable; this walks through whatever FileSystem the
    path resolves to. Hidden/underscore files and any file under a
    tombstone (``deletes``/``_deletes``) or hidden directory segment are
    excluded. Returns 0 for a missing path."""
    fs, p = _fs_for(spark, path)
    if not fs.exists(p):
        return 0
    root = fs.makeQualified(p).toString().rstrip("/")
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        fpath = it.next().getPath().toString()
        name = fpath.rsplit("/", 1)[-1]
        if not name.endswith(".parquet") or name[0] in "_.":
            continue
        rel_dirs = fpath[len(root):].lstrip("/").split("/")[:-1]
        if any(
            d in ("deletes", "_deletes") or d[0] in "_."
            for d in rel_dirs
            if d
        ):
            continue
        n += 1
    return n


def cdc_dedup_adds(
    adds: DataFrame, id_col: str, payload_cols: list[str]
) -> DataFrame:
    """Reduce a CDC batch's add side to ONE row per id. CDC batches
    carry no within-batch ordering, so "last writer" is undefined; the
    winner is picked deterministically instead — max ``xxhash64`` over
    the payload struct — so the same batch reduces to the same row on
    every engine and every replay. Shared by all three index families'
    ``*_apply_cdc`` (duplicate add rows for one id would otherwise
    commit duplicate index entries and inflate the net count). The
    window is keyed by id over a single CDC BATCH (change-sized, not
    corpus-sized), so no skew concern."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.xxhash64(F.struct(*[F.col(c) for c in payload_cols])).desc()
    )
    return (
        adds.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def snapshot_members(spark: SparkSession, snap_path: str) -> list[str]:
    """Top-level member names of a snapshot directory (FS-API based, so
    it works wherever the table lives)."""
    fs, p = _fs_for(spark, snap_path)
    return [st.getPath().getName() for st in fs.listStatus(p)]


def recover_live_snapshots(
    spark: SparkSession, table_path: str, compact_mark_prefix: str
) -> list[str]:
    """Live-set listing + grace-period pruning for compacting log
    tables — the shared recovery pass of the three persisted index
    families (dedup/incremental.py, functions/text_index.py,
    similarity/vector_index.py).

    A compaction snapshot carries ``{compact_mark_prefix}{N}`` meaning
    "this snapshot folds every snapshot with version <= N". The LIVE set
    is everything above the newest watermark; folded snapshots are never
    read again. Physical deletion, however, is deferred one compaction
    cycle: snapshots folded by the NEWEST watermark stay on disk until a
    LATER compaction supersedes them, so a reader that lazily captured
    pre-compaction snapshot paths (a long probe, a concurrent serving
    stream) finishes its scan against intact files instead of dying on
    missing-file errors mid-flight. Only snapshots already folded by an
    OLDER watermark — dead for at least one full compaction cycle — are
    deleted here. Idempotent: a crash between a compaction's commit and
    its prune just leaves this pass more to do.

    Returns surviving (live) snapshot paths oldest-first."""
    fs, root, names = _snapshots(spark, table_path)
    watermarks: set[int] = set()
    for name in names:
        for member in snapshot_members(spark, f"{table_path}/{name}"):
            if member.startswith(compact_mark_prefix):
                watermarks.add(int(member[len(compact_mark_prefix):]))
    newest = max(watermarks) if watermarks else -1
    older = {w for w in watermarks if w < newest}
    grace_cut = max(older) if older else -1
    live = []
    for name in names:
        v = int(name[len(_PREFIX):])
        if v <= grace_cut:
            fs.delete(
                spark._jvm.org.apache.hadoop.fs.Path(root, name), True
            )
        elif v > newest:
            live.append(f"{table_path}/{name}")
        # else: folded by the newest compaction — kept on disk for one
        # grace cycle, excluded from the live set
    return live


def vacuum_snapshots(
    spark: SparkSession, table_path: str, compact_mark_prefix: str
) -> list[str]:
    """Collapse the grace window NOW: delete every snapshot folded by
    the NEWEST compaction watermark (``recover_live_snapshots`` defers
    those one full compaction cycle, so a table that compacts once and
    then never again would otherwise retain its entire pre-compaction
    log on disk forever).

    Caller contract: run only when no in-flight reader captured
    pre-compaction snapshot paths — i.e. quiesce (or time out) probes
    that started before the last compaction. A steadily-compacting
    table never needs this; it is the explicit retention entry point
    for tables whose compaction cadence has stopped.

    Returns the deleted snapshot names (possibly empty). Idempotent."""
    fs, root, names = _snapshots(spark, table_path)
    watermarks: set[int] = set()
    for name in names:
        for member in snapshot_members(spark, f"{table_path}/{name}"):
            if member.startswith(compact_mark_prefix):
                watermarks.add(int(member[len(compact_mark_prefix):]))
    if not watermarks:
        return []
    newest = max(watermarks)
    deleted = []
    for name in names:
        if int(name[len(_PREFIX):]) <= newest:
            fs.delete(
                spark._jvm.org.apache.hadoop.fs.Path(root, name), True
            )
            deleted.append(name)
    return deleted


def log_snapshots(spark: SparkSession, table_path: str) -> list[str]:
    """Live snapshot paths of a log table, oldest first ([] if the
    table does not exist yet)."""
    _, _, names = _snapshots(spark, table_path)
    return [f"{table_path}/{n}" for n in names]


def log_has_mark(spark: SparkSession, table_path: str, mark: str) -> bool:
    """True when any live snapshot carries marker file ``mark`` — the
    replay fence query."""
    return any(
        mark in snapshot_members(spark, snap)
        for snap in log_snapshots(spark, table_path)
    )


def append_log_version(
    df: DataFrame,
    table_path: str,
    marks: list[str] | None = None,
    max_retries: int = 10,
) -> int | None:
    """Append ``df`` as one new log snapshot via CAS; returns the
    committed version. When ``marks`` are given and any live snapshot
    already carries one of them, the append is SKIPPED (None) — an
    at-least-once redelivery commits at most once. The snapshot stores
    its schema (_schema.json) so empty batches stay readable."""
    spark = df.sparkSession
    marks = list(marks or [])
    schema_json = df.schema.jsonValue()

    def populate(staging: str) -> None:
        df.write.mode("overwrite").parquet(staging)
        fs_write_json(spark, f"{staging}/_schema.json", schema_json)
        for m in marks:
            fs_touch(spark, f"{staging}/{m}")

    for _ in range(max_retries):
        if any(log_has_mark(spark, table_path, m) for m in marks):
            return None  # replayed batch: already committed
        base = (list_versions(spark, table_path) or [0])[-1]
        try:
            return commit_staged(spark, table_path, base, populate)
        except CommitConflict:
            continue  # another appender advanced the head; retry
    raise CommitConflict(
        f"append to {table_path} lost {max_retries} CAS races"
    )


def read_log_table(spark: SparkSession, table_path: str) -> DataFrame:
    """The union of live snapshots, read with the newest snapshot's
    recorded schema (all-empty logs stay readable). Raises
    FileNotFoundError when the log has no snapshots."""
    from pyspark.sql.types import StructType

    snaps = log_snapshots(spark, table_path)
    if not snaps:
        raise FileNotFoundError(f"no log table at {table_path}")
    schema = StructType.fromJson(
        fs_read_json(spark, f"{snaps[-1]}/_schema.json")
    )
    return spark.read.schema(schema).parquet(*snaps)
