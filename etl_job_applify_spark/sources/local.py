"""JVM-local control-plane relations from driver-side rows.

``spark.createDataFrame(rows, schema)`` with a plain Python list does
NOT build a local relation: it pickles the rows into an RDD, and every
downstream action then runs ``defaultParallelism`` Python-worker tasks
just to re-scan a handful of literals. On the round-15 bench profile
that accident cost ~300-500 ms of executor time per task x 32 tasks
per scan (guide §4 — the JVM↔Python boundary, paid where no Python
code exists at all); a 60-row query-terms relation consumed more task
time than the BM25 scoring join it fed, and every ``F.broadcast`` of
such a relation re-ran the Python scan to build the hash table.

Routing the same rows through a pandas frame instead takes PySpark's
Arrow conversion path: the values land in the JVM once, at creation,
and every later scan is a plain JVM stage (measured 17 s → 0.8 s task
time for one 60-row distinct+collect). ``local_relation`` is the
drop-in replacement used by every control-plane construction site
(query-term batches, allocation tables, seed/anchor sets, scalar
results). It falls back to the plain path when pandas/Arrow are
unavailable or the values defeat Arrow conversion, so behavior is
identical — only the execution shape changes.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession

_WARNED_FALLBACK = False


def local_relation(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for LITERAL driver-side
    rows, via the Arrow path (no per-scan Python workers).

    ``rows``: a list of tuples/lists (or an empty list). ``schema``: a
    DDL string or StructType — required, because the whole point is a
    fixed control-plane schema. Cells are passed through ``object``
    dtype pandas columns so None stays null and ints never become
    floats; Arrow casts each column to the declared Spark type exactly
    like the pickled path would."""
    global _WARNED_FALLBACK
    plain_path_wanted = False
    try:
        import math

        import pandas as pd
        from pyspark.sql.types import StructType

        for r in rows:  # control-plane sized by contract
            for v in r:
                if isinstance(v, float) and math.isnan(v):
                    # pandas' object path folds NaN into missing —
                    # the pickled path keeps it a NaN cell; preserve
                    # the original semantics for the rare NaN literal
                    plain_path_wanted = True
                    raise ValueError("NaN literal: use plain path")
        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            struct = _parse_datatype_string(schema)
        else:
            struct = schema
        if not isinstance(struct, StructType):
            raise TypeError(f"need a struct schema, got {struct!r}")
        names = [f.name for f in struct.fields]
        data = {}
        for i, n in enumerate(names):
            col = pd.Series(
                [r[i] for r in rows], dtype=object, name=n
            )
            data[n] = col
        pdf = pd.DataFrame(data, columns=names)
        if len(pdf.columns) != len(names):  # defensive: dup names
            raise ValueError("duplicate column names")
        return spark.createDataFrame(pdf, struct)
    except Exception as e:
        # the pickled-rows path: slower scans, identical semantics.
        # LOUD (one-time RuntimeWarning, the fresh_local_checkpoint
        # discipline) unless the fallback was deliberately requested
        # (NaN literal): ~20 files route control-plane relations here
        # precisely to avoid per-scan Python-worker tasks — a silent
        # Arrow-path breakage would quietly reinstate the pathology
        # the round-15 rework removed, surfacing only as a slow bench.
        if not (plain_path_wanted or _WARNED_FALLBACK):
            _WARNED_FALLBACK = True
            warnings.warn(
                "local_relation: Arrow/pandas local-relation path "
                f"unavailable ({type(e).__name__}: {e}); falling back "
                "to pickled-row createDataFrame — control-plane "
                "relations on this session scan through Python-worker "
                "tasks (see sources/local.py)",
                RuntimeWarning,
                stacklevel=2,
            )
        return spark.createDataFrame(rows, schema)
