"""File-format readers (reference parity: S1-S3, services/data_source.py).

The reference reads JSON (multiline, PERMISSIVE), CSV (header, inferSchema,
PERMISSIVE) and XML (rowTag). Same capability here, with the scale-minded
defaults the reference lacked:

- every reader takes an optional explicit ``schema`` — at 100 TB schema
  inference is a full extra pass over the data (CSV/JSON) and is
  nondeterministic across samples; production jobs pin schemas.
- PERMISSIVE mode + ``columnNameOfCorruptRecord`` so malformed records land
  in a quarantine column instead of failing the job.
- parquet is the engine-native format: columnar, predicate pushdown, column
  pruning, splittable — the default interchange for everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: tables of the shared star-schema fixtures (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; Catalyst pushes filters and prunes columns into it."""
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar/pushdown properties as parquet; provided
    for lake interop (some warehouses land ORC)."""
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — the row-oriented interchange format Kafka pipelines
    land. Spark's Avro support lives in the external ``spark-avro``
    module (not bundled with pyspark's jars, absent in this image), so
    this is an environment gate with the real call behind it: deploy
    with ``--packages org.apache.spark:spark-avro_2.13:<ver>`` and it
    works unchanged."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # AnalysisException: failed to find data source
        if "avro" in str(e).lower():
            raise ImportError(
                "Avro needs the external spark-avro module on the "
                "classpath (--packages org.apache.spark:spark-avro_2.13); "
                "it is not bundled with pyspark"
            ) from e
        raise


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer_schema: bool | None = None,
    corrupt_column: str | None = None,
    **options: str,
) -> DataFrame:
    """CSV scan (reference S2: header + inferSchema + PERMISSIVE).

    ``infer_schema`` defaults to True only when no explicit schema is given,
    matching reference behavior while letting production pin schemas.
    """
    reader = spark.read.option("header", header).option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option(
            "inferSchema", True if infer_schema is None else infer_schema
        )
    if corrupt_column:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multiline: bool = True,
    corrupt_column: str | None = None,
    **options: str,
) -> DataFrame:
    """JSON scan (reference S1: multiLine + PERMISSIVE)."""
    reader = (
        spark.read.option("multiLine", multiline).option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    if corrupt_column:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """XML scan (reference S3: rowTag-delimited records).

    Spark 4 ships a native ``xml`` data source (the reference pinned the
    external ``spark-xml_2.12:0.14.0`` package on Spark 3.5 —
    lambda_function.py:120); same rowTag semantics.
    """
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_text(
    spark: SparkSession, path: str, whole: bool = False, **options: str
) -> DataFrame:
    """Line-oriented (or whole-file) text scan → single ``value`` column.

    The raw-corpus ingest path: one line (or one file with
    ``wholetext``) per row, feeding the documents pipeline
    (q40-q43/q117-q120 text analysis). Splittable per line at any scale.
    """
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    # NB: the text source ignores a string-valued "wholetext" reader
    # option; only the typed kwarg takes effect
    return reader.text(path, wholetext=whole)


def read_binary(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file scan → (path, modificationTime, length, content) rows.

    The multimodal ingest path (images/audio/video as opaque ``binary``
    content + typed metadata — see multimodal/media.py for the decode
    plumbing). ``glob`` filters by pattern (e.g. ``*.jpg``). Spark
    parallelizes at file granularity; pack small media files into a few
    large parquet/tar shards upstream — a 100 TB corpus of tiny files
    is a driver-side listing bottleneck otherwise (the same reason the
    sinks compact small files on write).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-zoned TimestampType whatever the
    fixture generation encoded.

    Generations have shipped it as parquet TIMESTAMP(NANOS) (which Spark 4
    refuses to map to TimestampType; the session pin
    ``spark.sql.legacy.parquet.nanosAsLong`` surfaces it as a raw long —
    convert with integer division, ``div 1000`` to micros, keeping full
    precision where a double roundtrip would lose bits on ~1.7e18 nano
    epochs) and as native micros TIMESTAMP_NTZ (cast; the session is
    pinned UTC so the NTZ→TZ cast is instant-preserving). Shared by the
    batch loader and streaming/jobs.events_stream so both paths convert
    identically.
    """
    from pyspark.sql import functions as F

    if isinstance(df.schema["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One star-schema fixture table (``events.ts`` normalized — see
    ``normalize_events_ts``; the required session pins are applied once by
    ``session.prepare_session``)."""
    from ..session import prepare_session

    prepare_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        return normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
