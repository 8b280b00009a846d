"""Job-spec driven dispatch (reference parity: P2, lambda_function.py:84-203).

The reference's ``lambda_handler`` pulls a connection spec from DynamoDB,
branches on ``source_type``, builds a session, and runs fetch→show. Here
the same contract is a declarative dict (the control plane can load it
from anywhere) compiled into a ``Pipeline``:

    spec = {
        "source": {"type": "csv", "path": "/data/in.csv",
                    "options": {"header": True}},
        "contract": {"columns": [...]},          # optional
        "dedup": {"subset": ["id"]},             # optional
        "sink": {"type": "parquet", "path": "/data/out",
                  "partition_by": ["dt"]},       # optional
    }
    run_job(spark, spec)

Source types mirror DATASOURCE_MAP (services/data_source.py:9-21):
files = {parquet, csv, json, xml}; databases = {mysql, postgres, oracle,
mssql} via the partitioned JDBC source.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .pipeline import Pipeline
from .sinks.writers import write_csv, write_jdbc, write_json, write_parquet
from .sources.jdbc import DIALECTS, JdbcSource
from .sources.readers import (
    read_binary,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    read_xml,
)
from .transform.contract import SchemaContract
from .transform.dedup import exact_dedup

FILE_SOURCES = {
    "parquet", "csv", "json", "xml", "orc", "text", "binary", "jsonl"
}
DB_SOURCES = set(DIALECTS)


def _build_extract(src: dict[str, Any]):
    stype = src.get("type")
    opts = dict(src.get("options") or {})
    if stype == "parquet":
        return lambda s: read_parquet(s, src["path"])
    if stype == "csv":
        return lambda s: read_csv(s, src["path"], schema=src.get("schema"), **opts)
    if stype == "json":
        return lambda s: read_json(s, src["path"], schema=src.get("schema"), **opts)
    if stype == "xml":
        return lambda s: read_xml(
            s, src["path"], row_tag=src.get("row_tag", "row"),
            schema=src.get("schema"), **opts,
        )
    if stype == "orc":
        return lambda s: read_orc(s, src["path"])
    if stype == "text":
        return lambda s: read_text(
            s, src["path"], whole=bool(src.get("whole", False)), **opts
        )
    if stype == "binary":
        return lambda s: read_binary(s, src["path"], glob=src.get("glob"))
    if stype == "jsonl":
        def _extract_jsonl(s):
            from .sources.pysource import register

            register(s)
            reader = s.read.format("jsonl_shards")
            if src.get("schema"):
                reader = reader.schema(src["schema"])
            for k, v in opts.items():
                reader = reader.option(k, v)
            return reader.load(src["path"])

        return _extract_jsonl
    if stype in DB_SOURCES:
        jdbc = JdbcSource(
            dialect=stype,
            host=src["host"],
            database=src["database"],
            user=src["user"],
            password=src["password"],
            port=src.get("port"),
        )
        part = src.get("partition") or {}
        return lambda s: jdbc.read_table(
            s,
            src["table"],
            partition_column=part.get("column"),
            lower_bound=part.get("lower"),
            upper_bound=part.get("upper"),
            num_partitions=part.get("num"),
        )
    raise ValueError(
        f"unknown source type {stype!r}; one of {sorted(FILE_SOURCES | DB_SOURCES)}"
    )


def _build_load(sink: dict[str, Any]):
    stype = sink.get("type")
    if stype == "parquet":
        return lambda df: write_parquet(
            df, sink["path"], mode=sink.get("mode", "overwrite"),
            partition_by=sink.get("partition_by"),
        )
    if stype == "jdbc":
        return lambda df: write_jdbc(
            df, sink["url"], sink["table"], sink["user"], sink["password"],
            sink["driver"], mode=sink.get("mode", "append"),
        )
    if stype == "csv":
        return lambda df: write_csv(
            df, sink["path"], mode=sink.get("mode", "overwrite"),
            header=bool(sink.get("header", True)),
            compression=sink.get("compression", "gzip"),
        )
    if stype == "json":
        return lambda df: write_json(
            df, sink["path"], mode=sink.get("mode", "overwrite"),
            compression=sink.get("compression", "gzip"),
        )
    if stype == "jsonl":
        def _load_jsonl(df):
            from .sources.pysource import register

            register(df.sparkSession)
            df.write.format("jsonl_shards").mode(
                sink.get("mode", "append")
            ).save(sink["path"])

        return _load_jsonl
    if stype == "versioned":
        # the lakehouse sink: atomic snapshot publish + optional Z-order
        # layout (cluster_by: [[col, lo, hi], ...]) and point-lookup
        # Bloom index (bloom_columns: [col, ...]); read back with
        # sinks.read_table(ranges=/equals=) for stats- and Bloom-pruned
        # scans
        def _load_versioned(df):
            from .sinks.versioned import write_version

            cluster = sink.get("cluster_by")
            write_version(
                df,
                sink["path"],
                retain=sink.get("retain"),
                cluster_by=(
                    tuple(tuple(c) for c in cluster) if cluster else None
                ),
                num_files=sink.get("num_files"),
                bloom_columns=sink.get("bloom_columns"),
            )

        return _load_versioned
    raise ValueError(f"unknown sink type {stype!r}")


def build_job(spec: dict[str, Any]) -> Pipeline:
    """Compile a job spec into a lazy Pipeline (no execution)."""
    transforms = []
    if spec.get("filter"):
        # SQL predicate string; declared early so Catalyst pushes it into
        # the scan regardless of its position in the transform list
        cond = spec["filter"]
        transforms.append(lambda df: df.filter(cond))
    if spec.get("flatten"):
        # normalize nested structs to flat columns before the contract
        # (so contracts address dotted names as plain columns)
        from .transform.flatten import flatten_structs

        transforms.append(flatten_structs)
    if spec.get("contract"):
        contract = SchemaContract.from_dict(spec["contract"])
        transforms.append(contract.apply)
    if "dedup" in spec:
        subset = (spec["dedup"] or {}).get("subset")
        transforms.append(lambda df: exact_dedup(df, subset))
    if spec.get("sample"):
        # deterministic content-hash sampling (never rand(): reproducible
        # across reruns/engines/cluster sizes — transform/sampling idiom)
        rate = int(spec["sample"]["rate_pct"])
        cols = list(spec["sample"]["hash_cols"])
        if not 0 < rate <= 100:
            raise ValueError(f"sample.rate_pct must be 1..100, got {rate}")

        def _sample(df, rate=rate, cols=cols):
            from pyspark.sql import functions as F

            bucket = F.expr(
                f"pmod(xxhash64(concat_ws('\x1f', {', '.join('CAST(' + c + ' AS STRING)' for c in cols)})), 100)"
            )
            return df.filter(bucket < F.lit(rate))

        transforms.append(_sample)
    if spec.get("quality"):
        # publish gate: the quality suite runs as the LAST transform, so
        # a failing dataset never reaches the sink (one extra scan —
        # all rules ride a single aggregate, transform/quality.py)
        rules = spec["quality"]

        def _gate(df):
            from .transform.quality import assert_rules

            assert_rules(df, rules)
            return df

        transforms.append(_gate)
    return Pipeline(
        extract=_build_extract(spec["source"]),
        transforms=transforms,
        load=_build_load(spec["sink"]) if spec.get("sink") else None,
        name=spec.get("name", "job"),
    )


def run_job(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    """Build and run a job; returns the final DataFrame."""
    return build_job(spec).run(spark)


def run_stream_job(spark: SparkSession, spec: dict[str, Any]) -> None:
    """Streaming twin of ``run_job``: file-stream source → the same
    declarative transform stages → exactly-once parquet sink, processed
    with ``Trigger.AvailableNow`` (drain-what's-there-and-stop — the
    cron'd incremental shape; see streaming/jobs.py).

        spec = {
            "source": {"type": "parquet"|"csv"|"json"|"jsonl"
                               |"rate"|"rate-micro-batch",
                        "path": ..., "schema": "a int, b string",
                        "projection": ["value AS event_id", ...]},
            "filter": "a > 0",                # optional
            "contract": {...}, "dedup": {...},# optional (dedup within
                                              # watermark needs ts_col)
            "sink": {"path": ..., "checkpoint": ...},
        }

    Stream sources REQUIRE an explicit schema (no inference pass exists
    on an unbounded input — the same reason production batch jobs pin
    schemas, made mandatory). Restarts resume from the checkpoint:
    already-seen files are never reprocessed.

    Source bindings beyond files prove the spec→stream path is
    source-agnostic:

    - ``rate`` / ``rate-micro-batch``: Spark's built-in generator
      sources (fixed (timestamp, value) schema — no ``path``/``schema``
      keys; ``options`` pass through, e.g. ``rowsPerBatch``). The
      ``projection`` list of SQL expressions maps the generator columns
      onto the pipeline's schema (e.g. the events table's). Note
      ``rate`` accumulates rows in WALL-CLOCK time, so an AvailableNow
      run that starts at t=0 drains zero rows — ``rate-micro-batch``
      (deterministic rowsPerBatch per micro-batch) is the testable
      binding and the one the smoke test pins.
    - kafka (third binding — the code path is live, the jars are not in
      this image): ``{"type": "kafka", "options":
      {"kafka.bootstrap.servers": ..., "subscribe": topic}}`` followed
      by a projection that parses ``CAST(value AS STRING)`` with
      ``from_json`` against the payload schema. Kafka's reader schema
      is fixed (key/value/topic/partition/offset/timestamp), so like
      the generator sources it takes no ``path``/``schema`` keys.
    """
    src = spec["source"]
    stype = src.get("type", "parquet")
    if stype in ("rate", "rate-micro-batch", "kafka"):
        # fixed-schema sources: no path, no schema spec; projection maps
        # the source's own columns onto the pipeline's
        reader = spark.readStream.format(stype)
        for k, v in (src.get("options") or {}).items():
            reader = reader.option(k, v)
        df = reader.load()
    else:
        if stype == "jsonl":
            from .sources.pysource import register

            register(spark)
            reader = spark.readStream.format("jsonl_shards")
        else:
            reader = spark.readStream.format(stype)
            if stype == "csv":
                reader = reader.option("header", True)
        if not src.get("schema"):
            raise ValueError("stream sources require an explicit 'schema'")
        reader = reader.schema(src["schema"])
        for k, v in (src.get("options") or {}).items():
            reader = reader.option(k, v)
        df = reader.load(src["path"])
    if src.get("projection"):
        df = df.selectExpr(*src["projection"])

    if spec.get("filter"):
        df = df.filter(spec["filter"])
    if spec.get("contract"):
        df = SchemaContract.from_dict(spec["contract"]).apply(df)
    if "dedup" in spec:
        d = spec["dedup"] or {}
        if d.get("watermark"):
            df = df.withWatermark(
                d["ts_col"], d["watermark"]
            ).dropDuplicatesWithinWatermark(d.get("subset"))
        else:
            df = df.dropDuplicates(d.get("subset"))

    from .streaming.jobs import run_available_now_to_parquet

    sink = spec["sink"]
    run_available_now_to_parquet(df, sink["path"], sink["checkpoint"])
