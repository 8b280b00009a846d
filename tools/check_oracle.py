"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the same
scale factor, then compares row count, column names/order-insensitive
value multiset (values normalized: floats fuzzed to 12 significant digits,
timestamps to ISO strings). Exit code = number of failing queries.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")


EXACT = os.environ.get("CHECK_EXACT") == "1"


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if EXACT:  # raw IEEE bits — the strictest possible compare
            import struct
            return struct.pack("<d", v).hex()
        return f"{v:.12g}"
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return str(v)


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from etl_job_applify_spark import queries as registry
    from etl_job_applify_spark.session import get_spark_session

    spark = get_spark_session("check_oracle")
    con = duckdb.connect()
    for t in registry.relational.__dict__.get("_TABLES", ()) or (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = registry.queries()
    oracles = registry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        # The driver's harness canonicalizes via pandas sort_values, which
        # crashes on unhashable cells (list/dict/Row). Reject complex-typed
        # output columns here so local runs reproduce that failure instead
        # of masking it (round-1 q49 lesson).
        if name in oracles:
            from pyspark.sql.types import ArrayType, MapType, StructType

            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                print(
                    f"FAIL  {name}: non-scalar output columns {complex_cols} "
                    "would crash the driver's correctness gate — serialize "
                    "them (array_join/to_json) in both query and oracle"
                )
                failures += 1
                continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            ok = False
        else:
            sm = to_multiset(scols, srows)
            om = to_multiset(ocols, orows)
            if sm != om:
                diff_s = {k: v for k, v in sm.items() if om.get(k) != v}
                diff_o = {k: v for k, v in om.items() if sm.get(k) != v}
                print(f"FAIL  {name}: value mismatch; "
                      f"spark-only={list(diff_s.items())[:3]} "
                      f"oracle-only={list(diff_o.items())[:3]}")
                ok = False
        if ok:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures += 1
        # queries that persist plan branches (dedup probes, postings)
        # leave InMemoryRelations behind after their result is collected;
        # across ~190 queries the leaked cache is what ran the 1g-default
        # heap out of memory at sf0.1. One gate query never needs
        # another's cache — drop it.
        spark.catalog.clearCache()
    spark.stop()
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    sys.exit(main())
