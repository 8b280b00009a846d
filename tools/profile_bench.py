"""Per-query stage/job profile via the local Spark UI REST API.

For each measured bench entry: run once (noop sink, warmed), then pull
job+stage metrics from http://localhost:<ui-port>/api/v1 — job count,
stage count, total task time, shuffle bytes, and the slowest stages.
This is the measurement step of the optimization loop (guide §1):
it tells you whether an entry is stage-floor-bound (many tiny stages)
or genuinely compute/shuffle-bound.

Usage: python tools/profile_bench.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def _api(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}"
    ) as r:
        return json.load(r)


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import shutil
    import tempfile

    from bench import (
        HEADLINE,
        INCREMENTAL,
        SERVE_ONLY,
        _build_incremental_state,
        _build_serve_indexes,
    )
    from etl_job_applify_spark import queries as registry
    from etl_job_applify_spark.session import get_spark_session

    spark = get_spark_session("profile_bench", enable_ui=True)
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1])
    app_id = sc.applicationId
    qs = dict(registry.queries())
    idx_root = tempfile.mkdtemp(prefix="prof_idx_")
    report = {}
    try:
        qs.update(_build_serve_indexes(spark, sf_dir, idx_root))
        qs.update(_build_incremental_state(spark, sf_dir))
        names = HEADLINE + SERVE_ONLY + INCREMENTAL
        if only:
            names = [n for n in names if n in only]
        for name in names:
            # warm once (codegen/JIT), then measure the second run
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            jobs_before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            sc.setJobDescription(None)
            jobs = [
                j
                for j in _api(port, f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            stage_ids = sorted(
                {s for j in jobs for s in j["stageIds"]}
            )
            stages = []
            for sid in stage_ids:
                try:
                    for att in _api(
                        port, f"applications/{app_id}/stages/{sid}"
                    ):
                        stages.append(att)
                except Exception:
                    pass
            tot_task_ms = sum(s.get("executorRunTime", 0) for s in stages)
            sh_read = sum(s.get("shuffleReadBytes", 0) for s in stages)
            sh_write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
            inp = sum(s.get("inputBytes", 0) for s in stages)
            top = sorted(
                stages,
                key=lambda s: -(s.get("executorRunTime", 0)),
            )[:5]
            report[name] = {
                "wall_s": round(wall, 3),
                "n_jobs": len(jobs),
                "n_stages": len(stages),
                "task_time_s": round(tot_task_ms / 1000.0, 2),
                "input_mb": round(inp / 1e6, 1),
                "shuffle_read_mb": round(sh_read / 1e6, 1),
                "shuffle_write_mb": round(sh_write / 1e6, 1),
                "top_stages": [
                    {
                        "stage": s["stageId"],
                        "run_ms": s.get("executorRunTime", 0),
                        "tasks": s.get("numCompleteTasks", 0),
                        "sh_r_mb": round(
                            s.get("shuffleReadBytes", 0) / 1e6, 1
                        ),
                        "name": s.get("name", "")[:60],
                    }
                    for s in top
                ],
            }
            print(
                f"{name}: wall={wall:.2f}s jobs={len(jobs)} "
                f"stages={len(stages)} task_time={tot_task_ms/1000:.1f}s "
                f"shuffle_r={sh_read/1e6:.1f}MB"
            )
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)
    out = "/tmp/profile_bench.json"
    json.dump(report, open(out, "w"), indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
