"""Capture `.explain("formatted")` for every measured bench entry into
plans/r15/<query>_<tag>.txt — the optimization round's evidence files.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag: "before" / "after"; with no query names, captures all measured
  bench entries (HEADLINE + SERVE_ONLY + INCREMENTAL) at the bench SF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
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

    out_dir = "/root/repo/plans/r16"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark_session("capture_plans")
    qs = dict(registry.queries())
    idx_root = tempfile.mkdtemp(prefix="plan_idx_")
    try:
        qs.update(_build_serve_indexes(spark, sf_dir, idx_root))
        qs.update(_build_incremental_state(spark, sf_dir))
        names = HEADLINE + SERVE_ONLY + INCREMENTAL
        if only:
            names = [n for n in names if n in only] + [
                n for n in only if n not in set(names)
            ]
        for name in names:
            df = qs[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            open(path, "w").write(text)
            print(f"wrote {path} ({len(text.splitlines())} lines)")
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
