"""SparkSession factory.

Reference parity: ``get_spark_session`` in the reference
(lambda_function.py:54-80) builds a session from app name + config dict +
jars/packages. This factory keeps that contract but bakes in the settings a
large-scale analytics engine needs by default:

- AQE on (runtime join-strategy switching, skew-join splitting, partition
  coalescing) — the single most important knob at 100 TB.
- UTC session timezone — reproducible timestamps and DuckDB-oracle parity.
- Arrow for pandas interchange — the fast path for every Pandas UDF.
- shuffle partitions sized to the machine, not the 200 default.

On a real cluster the caller overrides ``master`` and sizes
``shuffle_partitions`` to ~2-3x total executor cores (or leaves AQE's
coalescing to trim them down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_APP = "etl_job_applify_spark"


def default_parallelism() -> int:
    """CPU budget: $SPARK_GRAFT_CPUS if set, else machine cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


#: engine semantics every entry point pins on the session it is handed.
#: These are *session-level* confs (Spark consults them again at task
#: execution time, so a save/restore around a single read would break the
#: deferred scan) — hence one idempotent prep call instead of scattered
#: ``conf.set`` inside query/reader bodies.
_SESSION_PINS = {
    # permissive semantics (NULL on overflow / bad cast / OOB array access)
    # like the reference's PERMISSIVE readers; matches the DuckDB oracle.
    "spark.sql.ansi.enabled": "false",
    # some fixture generations encode events.ts as parquet TIMESTAMP(NANOS),
    # which Spark 4 refuses to map to TimestampType; read as raw long and
    # convert (sources/readers.py normalize_events_ts). Harmless for
    # micros-encoded fixtures — it only affects NANOS columns.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def prepare_session(spark: SparkSession) -> SparkSession:
    """Idempotently pin engine semantics on an externally-built session.

    The correctness driver (and any embedding application) runs queries on
    ITS OWN SparkSession with arbitrary configs; every public entry point
    (queries/_util.tbl, sources/readers.load_table, streaming jobs) routes
    through here so the pins live in exactly one place. Only touches confs
    that differ — repeat calls are free.
    """
    for k, v in _SESSION_PINS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    return spark


def get_spark_session(
    app_name: str = _DEFAULT_APP,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    config_options: dict[str, str] | None = None,
    jars: str | None = None,
    packages: str | None = None,
    enable_ui: bool = False,
    max_partition_bytes: str = "8m",
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for analytics at scale.

    ``config_options``/``jars``/``packages`` mirror the reference factory's
    signature (lambda_function.py:54-80) so existing job specs translate 1:1.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # split small-but-CPU-dense inputs so every core gets work: a
        # single 10 MB parquet is ONE 128 MB-default split = one task, and
        # expression-heavy stages (shingling, folds, vector math) starve
        # the other cores. Petabyte deployments with many large files
        # should raise this back toward 128m-256m via the parameter.
        .config("spark.sql.files.maxPartitionBytes", max_partition_bytes)
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "true" if enable_ui else "false")
        # ANSI off: engine semantics are permissive (NULL on overflow/bad
        # cast) like the reference's PERMISSIVE readers, and it matches the
        # DuckDB oracle harness on e.g. try-cast behavior.
        .config("spark.sql.ansi.enabled", "false")
        # Size the local JVM deliberately: a pyspark-launched JVM
        # defaults spark.driver.memory to 1g, and in local mode the
        # driver JVM IS every executor — 32 task threads + cached
        # relations in 1 GB dies with the SparkContext shut down
        # mid-job once enough plans persist (observed at the sf0.1 full
        # gate). 8g measured best: a 64g max heap produced 60-99 s GC/
        # heap-expansion outliers on the same queries that run in 5-9 s
        # at 8g (5-run A/B, BENCHNOTES round 6) — more heap is not more
        # speed in local mode. Applies only at JVM launch; a
        # pre-existing session keeps its heap. Cluster deployments size
        # executors through their own submit args as usual.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    )
    if jars:
        builder = builder.config("spark.jars", jars)
    if packages:
        builder = builder.config("spark.jars.packages", packages)
    for k, v in (config_options or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # getOrCreate may have returned a pre-existing session whose builder
    # configs were ignored — pin the session-level semantics regardless.
    return prepare_session(spark)
