"""Index administration CLI — one entry point for the operational
surface of the three persisted index families (DESCRIBE / histogram /
compact / vacuum / reindex):

    python tools/index_admin.py describe  vector /path/to/idx
    python tools/index_admin.py histogram vector /path/to/idx
    python tools/index_admin.py compact   text   /path/to/idx
    python tools/index_admin.py vacuum    dedup  /path/to/idx
    python tools/index_admin.py reindex   vector /path/to/idx
    python tools/index_admin.py forget    text   /path/to/idx --ids 3,7,11
    python tools/index_admin.py forget    dedup  /path/to/idx \
        --ids-parquet /lake/takedown_ids.parquet

`describe` prints the family's stats dict as one JSON line (the
DESCRIBE INDEX surface: counters, snapshots, pending tombstones, skew
signals). `vacuum` collapses the retention grace window — run it only
when no in-flight probe spans the last compaction (see
sinks/versioned.py vacuum_snapshots). `reindex` (vector only) retrains
the quantizer on the live corpus — the manual twin of the streaming
ingest's reindex_skew_threshold policy. `forget` tombstones an id set
out of one family (lifecycle.forget_documents — idempotent, so the
cross-family sweep is simply this command run once per family; pass
`--ids-parquet` for domain-sized takedown sets — the ids never ride
the driver).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _actions(family: str):
    if family == "vector":
        from etl_job_applify_spark.similarity import (
            optimize_vector_index,
            reindex_vector_index,
            vacuum_vector_index,
            vector_index_cell_histogram,
            vector_index_stats,
        )

        return {
            "describe": vector_index_stats,
            "histogram": lambda s, p: vector_index_cell_histogram(
                s, p
            ).orderBy("cell").collect(),
            "compact": optimize_vector_index,
            "vacuum": vacuum_vector_index,
            "reindex": reindex_vector_index,
        }
    if family == "text":
        from etl_job_applify_spark.functions.text_index import (
            optimize_text_index,
            text_index_stats,
            vacuum_text_index,
        )

        return {
            "describe": text_index_stats,
            "compact": optimize_text_index,
            "vacuum": vacuum_text_index,
        }
    if family == "dedup":
        from etl_job_applify_spark.dedup import (
            minhash_index_stats,
            optimize_index,
            vacuum_minhash_index,
        )

        return {
            "describe": minhash_index_stats,
            "compact": optimize_index,
            "vacuum": vacuum_minhash_index,
        }
    raise SystemExit(f"unknown family {family!r}")


def main(argv=None, spark=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "action",
        choices=[
            "describe", "histogram", "compact", "vacuum", "reindex",
            "forget",
        ],
    )
    ap.add_argument("family", choices=["vector", "text", "dedup"])
    ap.add_argument("index_path")
    ap.add_argument("--ids", help="comma-separated ids to forget")
    ap.add_argument(
        "--ids-parquet",
        help="one-column parquet of ids to forget (scale path)",
    )
    args = ap.parse_args(argv)
    actions = _actions(args.family)
    if args.action != "forget" and args.action not in actions:
        raise SystemExit(
            f"{args.action} is not available for the {args.family} family"
        )
    own_session = spark is None
    if own_session:
        from etl_job_applify_spark.session import get_spark_session

        spark = get_spark_session("index_admin")
    try:
        if args.action == "forget":
            from etl_job_applify_spark.lifecycle import forget_documents

            if bool(args.ids) == bool(args.ids_parquet):
                raise SystemExit(
                    "forget needs exactly one of --ids / --ids-parquet"
                )
            ids = (
                spark.read.parquet(args.ids_parquet)
                if args.ids_parquet
                else [int(x) for x in args.ids.split(",")]
            )
            kw = {
                "vector": "vector_index",
                "text": "text_index",
                "dedup": "dedup_index",
            }[args.family]
            out = forget_documents(spark, ids, **{kw: args.index_path})
        else:
            out = actions[args.action](spark, args.index_path)
    finally:
        if own_session:
            spark.stop()
    if args.action == "histogram":
        result = {"cells": [(r["cell"], r["n_live"]) for r in out]}
    elif isinstance(out, dict):
        result = out
    else:
        result = {"result": out}
    print(json.dumps(result, default=str))
    return result


if __name__ == "__main__":
    main()
