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
    python tools/index_admin.py apply-cdc text   /path/to/idx \
        --feed-parquet /lake/changes.parquet --epoch-mark _epoch_feed_42

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
the driver). `apply-cdc` applies one op-column change-feed parquet
(the `sinks.changes.changes_to_cdc` shape: payload columns + op in
{add, delete}) to one family as a single fenced CAS snapshot
(lifecycle.apply_cdc_documents); run it once per family with the SAME
--epoch-mark and the whole feed lands with the q278 one-feed
semantics — completed families fence a re-run out whole, so a crash
mid-sweep is healed by re-running the remaining families.
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
            "forget", "apply-cdc",
        ],
    )
    ap.add_argument("family", choices=["vector", "text", "dedup"])
    ap.add_argument("index_path")
    ap.add_argument("--ids", help="comma-separated ids to forget")
    ap.add_argument(
        "--ids-parquet",
        help="one-column parquet of ids to forget (scale path)",
    )
    ap.add_argument(
        "--feed-parquet",
        help="op-column CDC feed parquet for apply-cdc",
    )
    ap.add_argument("--op-col", default="op")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument(
        "--epoch-mark",
        help="fence marker; reuse the SAME mark across families for "
        "one-feed semantics (q278)",
    )
    args = ap.parse_args(argv)
    actions = _actions(args.family)
    if args.action not in ("forget", "apply-cdc") and args.action not in actions:
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
        elif args.action == "apply-cdc":
            from etl_job_applify_spark.lifecycle import apply_cdc_documents

            if not args.feed_parquet:
                raise SystemExit("apply-cdc needs --feed-parquet")
            feed = spark.read.parquet(args.feed_parquet)
            kw = {
                "vector": "vector_index",
                "text": "text_index",
                "dedup": "dedup_index",
            }[args.family]
            res = apply_cdc_documents(
                feed,
                id_col=args.id_col,
                text_col=args.text_col,
                vec_col=args.vec_col,
                op_col=args.op_col,
                epoch_mark=args.epoch_mark,
                **{kw: args.index_path},
            )
            out = {
                f: ("fenced" if v is None else v) for f, v in res.items()
            }
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
