"""Per-file Bloom-filter sidecars — point-lookup data skipping.

Min/max stats (sinks/stats.py) prune on CLUSTERED columns; they are
useless for an equality lookup on a column the layout ignores (every
file's [min, max] spans the whole domain, nothing prunes). Delta solves
this with per-file Bloom filter indexes; parquet-mr can embed them in
the file footer. This module supplies the same capability for the
directory-protocol versioned tables:

- ``build_blooms``: one DISTRIBUTED pass over the snapshot — each row
  contributes k = 4 seeded xxhash64 bit positions, aggregated per file
  with a ``collect_set`` (positions are ≤ k·rows distinct ints, file-
  grained, never driver-scale) — persisted as ``_bloom.json`` with the
  column's Spark type so probes hash IDENTICALLY (xxhash64 is
  type-sensitive; the probe value is cast to the stored type).
- ``prune_files_bloom``: probe values are hashed by a one-row Spark
  job (same JVM expression as the build — single-sourced, no Python
  reimplementation to drift), then a file survives only if ALL k bits
  of SOME probe value are set.

Bloom pruning is conservative in exactly one direction: a set bit can
lie (false positive → file scanned needlessly, correct result), a
missing bit cannot (the value is provably absent). Missing sidecar or
un-indexed column → no pruning, never a wrong answer. As with stats,
the caller re-applies the equality predicate to survivors.

Scale: the build is one extra column-projected scan at commit time
(amortized: the committing writer already has the data hot); the
sidecar is ~2 bytes/row — 16 bits/row at fpp ≈ (1-e^(-k·n/m))^k ≈ 0.2%
for k=4. A cluster deployment lowers to parquet's native footer bloom
filters or Delta's index; the read-path contract is identical.
"""

from __future__ import annotations

import base64
import json
import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .stats import _local_path

BLOOM_FILE = "_bloom.json"
_SEEDS = (0x5EED0, 0x5EED1, 0x5EED2, 0x5EED3)


def _positions_expr(col_expr, m: int):
    """The k seeded bit positions of one value — THE hash definition,
    used verbatim by both build and probe."""
    return F.array(
        *[F.pmod(F.xxhash64(F.lit(s), col_expr), F.lit(m)) for s in _SEEDS]
    )


def _bitset(positions, m: int) -> str:
    buf = bytearray((m + 7) // 8)
    for p in positions:
        buf[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(buf)).decode("ascii")


def _has_all(bits: bytes, positions) -> bool:
    return all(bits[p >> 3] & (1 << (p & 7)) for p in positions)


def build_blooms(
    spark: SparkSession,
    snapshot_dir: str,
    columns,
    bits_per_row: int = 16,
    max_total_positions: int = 50_000_000,
) -> bool:
    """Build and persist per-file Bloom bitsets for ``columns``.
    Returns True when a sidecar was written (local snapshots only —
    non-local tables lower to the format's native index).

    ``max_total_positions`` bounds the driver-side sidecar assembly
    (the per-file position sets are aggregated on executors but packed
    on the driver, ~8 bytes/position in flight): tables beyond
    ~``max_total_positions / 4`` rows raise instead of silently
    stressing the driver — the explicit signal to move to parquet's
    native footer bloom filters, where packing happens in the writer
    tasks. No silent cap: an oversized build FAILS, it never writes a
    partial index."""
    local = _local_path(snapshot_dir)
    if local is None or not os.path.isdir(local):
        return False
    df = spark.read.parquet(snapshot_dir)
    dtypes = dict(df.dtypes)
    per_file_rows = {
        os.path.basename(r["__f"]): r["cnt"]
        for r in df.select(F.input_file_name().alias("__f"))
        .groupBy("__f")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    if not per_file_rows:
        return False
    total_rows = sum(per_file_rows.values())
    if total_rows * len(_SEEDS) > max_total_positions:
        raise ValueError(
            f"bloom build over {total_rows} rows x {len(_SEEDS)} hashes "
            f"exceeds max_total_positions={max_total_positions}; use the "
            "table format's native bloom filter index at this scale"
        )
    max_rows = max(per_file_rows.values())
    # one power-of-two m per column keeps every file's bitset aligned
    m = max(64, 1 << math.ceil(math.log2(bits_per_row * max_rows)))
    doc = {"bloom_version": 1, "m": m, "k": len(_SEEDS), "columns": {}}
    for col in columns:
        if col not in dtypes:
            continue
        rows = (
            df.select(
                F.input_file_name().alias("__f"),
                F.explode(_positions_expr(F.col(col), m)).alias("p"),
            )
            .groupBy("__f")
            .agg(F.collect_set("p").alias("ps"))
            .collect()
        )
        doc["columns"][col] = {
            "dtype": dtypes[col],
            "files": {
                os.path.basename(r["__f"]): _bitset(r["ps"], m) for r in rows
            },
        }
    if not doc["columns"]:
        return False
    tmp = os.path.join(local, f".{BLOOM_FILE}.tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(local, BLOOM_FILE))
    return True


def load_blooms(snapshot_dir: str) -> dict | None:
    local = _local_path(snapshot_dir)
    if local is None:
        return None
    path = os.path.join(local, BLOOM_FILE)
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def _probe_positions(
    spark: SparkSession, values, dtype: str, m: int
) -> list[list[int]]:
    """Hash probe values with the build's own JVM expression (one-row
    control-plane job; |values| is CDC-batch-sized by contract)."""
    exprs = [
        _positions_expr(F.lit(v).cast(dtype), m).alias(f"v{i}")
        for i, v in enumerate(values)
    ]
    row = spark.range(1).select(*exprs).first()
    return [list(row[f"v{i}"]) for i in range(len(values))]


def prune_files_bloom(
    spark: SparkSession, snapshot_dir: str, equals
) -> tuple[list[str], int] | None:
    """Files whose Bloom bitsets admit at least one probed value for
    EVERY equality-constrained column in ``equals`` ({col: value or
    list-of-values}). Returns (surviving absolute paths, total indexed
    files), or None when no usable sidecar covers the columns."""
    doc = load_blooms(snapshot_dir)
    if doc is None:
        return None
    local = _local_path(snapshot_dir)
    m = doc["m"]
    surviving: set[str] | None = None
    covered_any = False
    for col, vals in equals.items():
        centry = doc["columns"].get(col)
        if centry is None:
            continue  # un-indexed column cannot prune
        covered_any = True
        values = vals if isinstance(vals, (list, tuple)) else [vals]
        probes = _probe_positions(spark, values, centry["dtype"], m)
        keep = {
            name
            for name, b64 in centry["files"].items()
            if any(
                _has_all(base64.b64decode(b64), ps) for ps in probes
            )
        }
        surviving = keep if surviving is None else (surviving & keep)
    if not covered_any:
        return None
    total = max(len(c["files"]) for c in doc["columns"].values())
    return [os.path.join(local, n) for n in sorted(surviving)], total


def equality_predicate(equals):
    """Residual Spark predicate for ``equals`` (re-applied to surviving
    files — bloom pruning is an optimization, never a semantics change)."""
    pred = F.lit(True)
    for col, vals in equals.items():
        values = vals if isinstance(vals, (list, tuple)) else [vals]
        pred = pred & F.col(col).isin(*values)
    return pred
