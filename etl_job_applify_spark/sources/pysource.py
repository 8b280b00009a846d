"""Custom Python DataSource (Spark 4 extension point): JSONL shards.

The reference's source registry (services/data_source.py:9-21
DATASOURCE_MAP) dispatches to per-format reader classes; Spark 4's
Python DataSource API is the engine-native version of that idea — a
registered format name usable from ``spark.read.format(...)`` with the
engine handling distribution, schema enforcement, and task scheduling.

This module implements ``jsonl_shards``: newline-delimited JSON where
each *.jsonl file is one input partition (shard-parallel reads, the
layout pretraining corpora actually ship in) and each write task emits
one shard. It exists alongside the built-in ``spark.read.json`` for the
cases the built-in can't express: per-shard provenance (``_shard``
metadata column) and strict field projection against a caller-declared
schema (unknown keys dropped, missing keys → NULL, never a corrupt-
record column).

Scale notes: file listing happens once on the driver (cheap — names
only); parsing is fully distributed, one task per shard. Shards should
be ~100 MB-1 GB for even task sizing; the writer's one-file-per-task
layout keeps that invariant if the upstream partitioning does.

Python-level JSON parsing is the slow path vs the JVM json reader —
this source is for semantics (provenance + strict projection), not
speed; it stays off the bench and out of the oracle-checked hot path.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _list_shards(path: str) -> list[str]:
    import glob as _glob

    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.jsonl")))
    return sorted(_glob.glob(path))


def _parse_shard(
    path: str, schema: StructType, with_shard: bool, permissive: bool = False
):
    # runs on executors: parse one shard, project to the declared
    # schema (strict: unknown keys dropped, missing keys -> None).
    # permissive=True skips malformed lines instead of failing the task —
    # the reference's PERMISSIVE-reader semantics (SURVEY S1/S2); at
    # scale one corrupt line must not kill a 10^5-task job.
    fields = [
        f.name for f in schema.fields if not (with_shard and f.name == "_shard")
    ]
    shard = os.path.basename(path)
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                if permissive:
                    continue
                raise
            if not isinstance(rec, dict):
                if permissive:
                    continue
                raise ValueError(f"non-object JSONL line in {shard}")
            row = tuple(rec.get(k) for k in fields)
            yield row + (shard,) if with_shard else row


def _opt_bool(options: dict, key: str) -> bool:
    return str(options.get(key, "false")).lower() == "true"


class _ShardPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _filter_predicate(filters):
    """Compile pushed filters to a Python predicate over a parsed record.

    SQL comparison semantics: NULL operands fail every predicate except
    IsNull; incomparable types keep the row (Spark re-applies every
    filter post-scan, so pre-filtering here is purely a transfer
    optimization and can never change results)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
        StringStartsWith,
    )

    def one(flt, value):
        if isinstance(flt, IsNull):
            return value is None
        if isinstance(flt, IsNotNull):
            return value is not None
        if value is None:
            return False
        try:
            if isinstance(flt, EqualTo):
                return value == flt.value
            if isinstance(flt, GreaterThan):
                return value > flt.value
            if isinstance(flt, GreaterThanOrEqual):
                return value >= flt.value
            if isinstance(flt, LessThan):
                return value < flt.value
            if isinstance(flt, LessThanOrEqual):
                return value <= flt.value
            if isinstance(flt, In):
                return value in flt.values
            if isinstance(flt, StringStartsWith):
                return isinstance(value, str) and value.startswith(flt.value)
        except TypeError:
            return True  # incomparable: keep, Spark decides
        return True  # unrecognized: keep

    simple = [f for f in filters if len(getattr(f, "attribute", ())) == 1]

    def predicate(rec: dict) -> bool:
        return all(one(f, rec.get(f.attribute[0])) for f in simple)

    return predicate if simple else None


class _JsonlReader(DataSourceReader):
    """Shard-per-partition reader with Spark 4.1 filter pushdown.

    ``pushFilters`` records every conjunct and RETURNS them all, so
    Spark re-applies them after the scan — the pushdown is a pure
    optimization with engine-guaranteed correctness. What it buys:

    - filters on the ``_shard`` provenance column prune whole FILES in
      ``partitions()`` (the partition-pruning analogue — a shard never
      opened, not just rows dropped);
    - data-column conjuncts are evaluated during parsing, so
      non-matching rows never cross the Python→Arrow→JVM boundary —
      the boundary being exactly what makes a Python source slow.
    """

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires a 'path' option")
        self.with_shard = _opt_bool(options, "shardcolumn")
        self.permissive = _opt_bool(options, "permissive")
        self.pushed: list = []

    def pushFilters(self, filters):
        self.pushed = list(filters)
        # hand every filter back: Spark re-checks post-scan, this layer
        # only prunes early
        return filters

    def _shard_admits(self, name: str) -> bool:
        from pyspark.sql.datasource import EqualTo, In, StringStartsWith

        for f in self.pushed:
            if getattr(f, "attribute", None) != ("_shard",):
                continue
            if isinstance(f, EqualTo) and name != f.value:
                return False
            if isinstance(f, In) and name not in f.values:
                return False
            if isinstance(f, StringStartsWith) and not name.startswith(
                f.value
            ):
                return False
        return True

    def partitions(self):
        files = _list_shards(self.path)
        if not files:
            raise FileNotFoundError(f"no .jsonl shards under {self.path}")
        if self.with_shard:
            files = [
                f for f in files if self._shard_admits(os.path.basename(f))
            ]
        return [_ShardPartition(f) for f in files]

    def read(self, partition: _ShardPartition):
        rows = _parse_shard(
            partition.path, self.schema, self.with_shard, self.permissive
        )
        pred = _filter_predicate(
            [f for f in self.pushed if getattr(f, "attribute", None) != ("_shard",)]
        )
        if pred is None:
            yield from rows
            return
        fields = [
            f.name
            for f in self.schema.fields
            if not (self.with_shard and f.name == "_shard")
        ]
        for row in rows:
            if pred(dict(zip(fields, row))):
                yield row


class _JsonlStreamReader(DataSourceStreamReader):
    """Shard-tailing micro-batch reader: the offset is a position in the
    name-sorted shard list, so each micro-batch is 'the files that
    appeared since the last one' (append-only landing zones with
    monotonic shard names — the standard corpus-drop layout). Listing
    runs on the driver (names only); parsing stays one task per shard.
    Offsets live in the checkpoint, so a restarted query resumes at the
    first unconsumed shard — never reprocessing, never skipping."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires a 'path' option")
        self.with_shard = _opt_bool(options, "shardcolumn")
        self.permissive = _opt_bool(options, "permissive")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(_list_shards(self.path))}

    def partitions(self, start: dict, end: dict):
        files = _list_shards(self.path)[start["index"] : end["index"]]
        return [_ShardPartition(f) for f in files]

    def read(self, partition: _ShardPartition):
        yield from _parse_shard(
            partition.path, self.schema, self.with_shard, self.permissive
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: shards are immutable once landed


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class _JsonlWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool) -> None:
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires a 'path' option")
        self.overwrite = overwrite

    def write(self, iterator):
        # one shard per task; uuid names make concurrent tasks safe and
        # retries idempotent-by-abandonment (orphan files are ignored
        # until commit lists them — simple local-FS semantics; object
        # stores would use a task-attempt manifest instead)
        os.makedirs(self.path, exist_ok=True)
        names = [f.name for f in self.schema.fields]
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(names, row)), default=str))
                fh.write("\n")
                n += 1
        return _JsonlCommit(out, n)


class JsonlShardDataSource(DataSource):
    """``spark.read.format("jsonl_shards").schema(ddl).load(path)``.

    Register once per session:
    ``spark.dataSource.register(JsonlShardDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def schema(self):
        # used only when the caller didn't pass an explicit schema
        return "value string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _JsonlReader(schema, self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _JsonlStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(schema, self.options, overwrite)


def register(spark) -> None:
    # Spark 4.1 gates Python-source filter pushdown behind a conf (off
    # by default) and ERRORS on a reader that implements pushFilters
    # while it's disabled — enable it with the source registration so
    # the two can't drift apart (runtime-settable, session-scoped).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlShardDataSource)
