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
from .sinks.writers import write_jdbc, write_parquet
from .sources.jdbc import DIALECTS, JdbcSource
from .sources.readers import read_csv, read_json, read_parquet, read_xml
from .transform.contract import SchemaContract
from .transform.dedup import exact_dedup

FILE_SOURCES = {"parquet", "csv", "json", "xml"}
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
    raise ValueError(f"unknown sink type {stype!r}")


def build_job(spec: dict[str, Any]) -> Pipeline:
    """Compile a job spec into a lazy Pipeline (no execution)."""
    transforms = []
    if spec.get("contract"):
        contract = SchemaContract.from_dict(spec["contract"])
        transforms.append(contract.apply)
    if "dedup" in spec:
        subset = (spec["dedup"] or {}).get("subset")
        transforms.append(lambda df: exact_dedup(df, subset))
    return Pipeline(
        extract=_build_extract(spec["source"]),
        transforms=transforms,
        load=_build_load(spec["sink"]) if spec.get("sink") else None,
        name=spec.get("name", "job"),
    )


def run_job(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    """Build and run a job; returns the final DataFrame."""
    return build_job(spec).run(spark)
