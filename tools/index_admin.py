"""Index administration CLI — one entry point for the operational
surface of the three persisted index families (DESCRIBE / histogram /
compact / vacuum / reindex):

    python tools/index_admin.py describe  vector /path/to/idx
    python tools/index_admin.py histogram vector /path/to/idx
    python tools/index_admin.py compact   text   /path/to/idx
    python tools/index_admin.py vacuum    dedup  /path/to/idx
    python tools/index_admin.py reindex   vector /path/to/idx

`describe` prints the family's stats dict as one JSON line (the
DESCRIBE INDEX surface: counters, snapshots, pending tombstones, skew
signals). `vacuum` collapses the retention grace window — run it only
when no in-flight probe spans the last compaction (see
sinks/versioned.py vacuum_snapshots). `reindex` (vector only) retrains
the quantizer on the live corpus — the manual twin of the streaming
ingest's reindex_skew_threshold policy.
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
        choices=["describe", "histogram", "compact", "vacuum", "reindex"],
    )
    ap.add_argument("family", choices=["vector", "text", "dedup"])
    ap.add_argument("index_path")
    args = ap.parse_args(argv)
    actions = _actions(args.family)
    if args.action not in actions:
        raise SystemExit(
            f"{args.action} is not available for the {args.family} family"
        )
    own_session = spark is None
    if own_session:
        from etl_job_applify_spark.session import get_spark_session

        spark = get_spark_session("index_admin")
    try:
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
