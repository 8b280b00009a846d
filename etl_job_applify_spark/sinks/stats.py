"""Per-file min/max statistics for versioned tables — the data-skipping
half of the lakehouse read path.

Delta/Iceberg record per-file column stats in the transaction log and
prune files against query predicates before the scan ever starts; on a
selective predicate over a clustered table this is the difference
between touching 1% and 100% of a 100 TB table's files. This module
supplies the same capability for the directory-protocol versioned
tables (sinks/versioned.py):

- at commit time, read each data file's parquet FOOTER (no data scan —
  row-group stats are already there, written by every parquet writer)
  and aggregate them to per-file [min, max] per column;
- persist as ``_stats.json`` inside the snapshot directory (underscore
  prefix → invisible to parquet reads, same convention as _SUCCESS);
- at read time, intersect the caller's column ranges with each file's
  [min, max] and hand Spark only the surviving files.

Pruning is CONSERVATIVE by construction: a file is skipped only when
its stats PROVE no row can match (range predicates never match NULLs,
so null-heavy stats stay safe); columns without stats keep the file.
The residual predicate is always re-applied to the surviving files, so
a stale or missing stats sidecar degrades to a full scan, never to a
wrong answer — the same contract table-format data skipping has.

Footer reading uses pyarrow on local paths (this image's lake IS the
local filesystem). Non-local snapshot URIs skip stats collection
gracefully; a cluster deployment lowers the whole table to Delta/
Iceberg, where the format collects these stats natively.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from typing import Mapping

STATS_FILE = "_stats.json"

#: column-range predicate: {column: (lo, hi)}, bounds inclusive,
#: ``None`` for unbounded on that side.
Ranges = Mapping[str, tuple]


def _local_path(path: str) -> str | None:
    """Strip a file: scheme; return None for non-local URIs."""
    if path.startswith("file:"):
        path = path[len("file:"):]
        # file:///x and file:/x both mean /x
        while path.startswith("//"):
            path = path[1:]
        return path
    if "://" in path or path.startswith("hdfs:"):
        return None
    return path


def _jsonable(value):
    """Footer stat → JSON-storable value, or None when the type has no
    safe total order across the JSON round-trip (then no stats for the
    column: file is kept, correctness preserved)."""
    if isinstance(value, bool) or value is None:
        return value if isinstance(value, bool) else None
    if isinstance(value, (int, float, str)):
        return value
    if isinstance(value, (_dt.datetime, _dt.date)):
        # ISO-8601 compares lexicographically in timestamp order for the
        # uniform formats one parquet column produces
        return value.isoformat()
    if isinstance(value, bytes):
        try:
            return value.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None


def collect_file_stats(snapshot_dir: str) -> dict | None:
    """Aggregate row-group footer stats to per-file column [min, max].

    Returns the stats document, or None when the directory isn't
    locally readable (non-local URI, no data files)."""
    local = _local_path(snapshot_dir)
    if local is None or not os.path.isdir(local):
        return None
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return None
    files = {}
    for name in sorted(os.listdir(local)):
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        md = pq.ParquetFile(os.path.join(local, name)).metadata
        cols: dict[str, dict] = {}
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                # nested leaves have dotted paths; stats apply to
                # top-level primitives only
                cname = col.path_in_schema
                if "." in cname:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    cols[cname] = {"unusable": True}
                    continue
                lo, hi = _jsonable(st.min), _jsonable(st.max)
                if lo is None or hi is None:
                    cols[cname] = {"unusable": True}
                    continue
                cur = cols.setdefault(cname, {"min": lo, "max": hi})
                if not cur.get("unusable"):
                    cur["min"] = min(cur["min"], lo)
                    cur["max"] = max(cur["max"], hi)
        files[name] = {
            c: s for c, s in cols.items() if not s.get("unusable")
        }
    if not files:
        return None
    return {"stats_version": 1, "files": files}


def write_stats(snapshot_dir: str) -> bool:
    """Collect and persist ``_stats.json`` for a snapshot directory.
    Returns True when a sidecar was written. Best-effort: any failure
    leaves the snapshot valid (readers fall back to full scans)."""
    doc = collect_file_stats(snapshot_dir)
    if doc is None:
        return False
    local = _local_path(snapshot_dir)
    tmp = os.path.join(local, f".{STATS_FILE}.tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(local, STATS_FILE))
    return True


def load_stats(snapshot_dir: str) -> dict | None:
    local = _local_path(snapshot_dir)
    if local is None:
        return None
    path = os.path.join(local, STATS_FILE)
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def _coerce(value):
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value.isoformat()
    return value


def _file_may_match(col_stats: Mapping[str, dict], ranges: Ranges) -> bool:
    for col, (lo, hi) in ranges.items():
        st = col_stats.get(col)
        if st is None:
            continue  # no stats for this column → cannot prune
        lo, hi = _coerce(lo), _coerce(hi)
        try:
            if lo is not None and st["max"] < lo:
                return False
            if hi is not None and st["min"] > hi:
                return False
        except TypeError:
            # incomparable types (caller bound vs stored stat) → keep
            continue
    return True


def prune_files(
    snapshot_dir: str, ranges: Ranges
) -> tuple[list[str], int] | None:
    """Files of ``snapshot_dir`` whose stats admit rows in ``ranges``.

    Returns (surviving absolute paths, total data-file count), or None
    when no stats sidecar exists (caller must full-scan)."""
    doc = load_stats(snapshot_dir)
    if doc is None:
        return None
    local = _local_path(snapshot_dir)
    kept = [
        os.path.join(local, name)
        for name, cols in doc["files"].items()
        if _file_may_match(cols, ranges)
    ]
    return kept, len(doc["files"])


def range_predicate(ranges: Ranges):
    """The residual Spark predicate equivalent to ``ranges`` (applied to
    surviving files so pruning is an optimization, never a semantics
    change)."""
    from pyspark.sql import functions as F

    pred = F.lit(True)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            pred = pred & (F.col(col) >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col(col) <= F.lit(hi))
    return pred
