"""The metrics/observability loop over an event stream, end to end.

What a monitoring stack runs on this engine, composed from the round-5
time-series operators:

    resample:   q162's shape — per-entity hourly means on a gap-filled
                grid (linear interpolation between observed hours)
    baseline:   q166's shape — hour-of-day seasonal profile, residuals
    detect:     q163's shape — rolling z-score anomalies, batch...
    stream:     ...and the SAME detector as a Structured Streaming job
                (streaming_anomalies), bit-exact with the batch run
                under Trigger.AvailableNow
    publish:    anomalies land in a versioned table with a Bloom index
                on event_id, so an on-call click ("show me event
                4711's context") is a pruned point lookup, not a scan

Run: python examples/metrics_observability.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str) -> None:
    from etl_job_applify_spark.queries.timeseries import (
        q162_resample_interpolate,
        q163_rolling_zscore,
        q166_seasonal_baseline,
    )
    from etl_job_applify_spark.sinks import read_table, write_version
    from etl_job_applify_spark.streaming import (
        events_stream,
        run_available_now_to_memory,
    )
    from etl_job_applify_spark.streaming.jobs import streaming_anomalies

    # 1. resample: raw events → gap-filled hourly grid per user
    grid = q162_resample_interpolate(spark, sf_dir)
    n_grid = grid.count()
    n_filled = grid.filter(~F.col("observed") & F.col("interp").isNotNull()).count()
    print(f"grid points: {n_grid} ({n_filled} interpolated)")

    # 2. seasonal baseline: worst hour-of-day residuals
    print("top seasonal residuals:")
    q166_seasonal_baseline(spark, sf_dir).limit(3).show(truncate=False)

    # 3. batch anomaly pass
    batch = q163_rolling_zscore(spark, sf_dir)
    anomalies = batch.filter(F.col("anomaly"))
    print(f"batch anomalies: {anomalies.count()} of {batch.count()} events")

    # 4. the same detector as a stream (exactly-once catch-up trigger);
    #    equality with the batch pass is pinned by tests/test_streaming.py
    streamed = run_available_now_to_memory(
        streaming_anomalies(events_stream(spark, sf_dir)),
        "obs_anomalies",
        output_mode="append",
    )
    print(f"streamed rows: {streamed.count()}")

    # 5. publish anomalies to a versioned table with a point-lookup index
    table = tempfile.mkdtemp(prefix="obs_anomalies_")
    write_version(
        streamed.filter(F.col("anomaly")),
        table,
        bloom_columns=("event_id",),
    )
    one = streamed.filter(F.col("anomaly")).select("event_id").first()
    if one:
        ctx = read_table(spark, table, equals={"event_id": one[0]})
        print(f"point lookup event {one[0]}: {ctx.count()} row(s)")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    session = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("metrics-observability")
        .getOrCreate()
    )
    try:
        run(session, sf)
    finally:
        session.stop()
