"""Sinks (reference parity: W1/W3/W4, services/data_store.py).

The reference's working sink is a JDBC overwrite into a staging table
(services/data_store.py:14-27); Redshift/DataLake are ``pass`` stubs. Here:
a real partitioned parquet sink (the data-lake path), a JDBC sink with
batched writes, and upsert in ``upsert.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    target_file_partitions: int | None = None,
) -> None:
    """Partitioned parquet sink.

    ``partition_by`` → directory partitioning (partition pruning for
    downstream readers). ``target_file_partitions`` coalesces before write
    to avoid the many-tiny-files problem (at scale prefer AQE coalescing or
    a key-based ``repartition`` upstream so writers stay parallel).
    """
    out = df
    if target_file_partitions:
        out = out.coalesce(target_file_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    target_file_partitions: int | None = None,
) -> None:
    """ORC sink — read_orc's write twin for ORC-standardized lakes.
    Same columnar/pushdown properties and the same partitioning knobs as
    the parquet sink."""
    out = df
    if target_file_partitions:
        out = out.coalesce(target_file_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink — env-gated like ``sources.readers.read_avro`` (the
    external spark-avro module is not bundled with pyspark)."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as e:
        if "avro" in str(e).lower():
            raise ImportError(
                "Avro needs the external spark-avro module on the "
                "classpath (--packages org.apache.spark:spark-avro_2.13); "
                "it is not bundled with pyspark"
            ) from e
        raise


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = "gzip",
    **options: str,
) -> None:
    """CSV export sink (interchange with non-columnar consumers).

    Gzip by default — CSV's size penalty vs parquet is the cost of the
    format, compression claws most of it back. NB gzip splits per FILE,
    not per block: keep write parallelism (one file per task) so reads
    stay parallel too. Flat columns only — Spark rejects array/map/
    struct in CSV; export those via parquet/JSON.
    """
    writer = df.write.mode(mode).option("header", header)
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    **options: str,
) -> None:
    """JSON-lines export sink — keeps nested struct/array/map columns
    (the interchange format for schema-flexible consumers)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.json(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """XML export sink (Spark 4 native xml source, write side) — closes
    the loop with read_xml for round-tripping the reference's XML
    interchange format (flat columns; nest via struct columns)."""
    writer = (
        df.write.format("xml")
        .mode(mode)
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """JDBC sink: each partition opens one connection and writes in
    ``batch_size`` chunks (reference W1 used default batching and a blind
    overwrite). Cap ``num_partitions`` so a 1000-task stage doesn't open
    1000 simultaneous connections against the target database."""
    out = df.repartition(num_partitions) if num_partitions else df
    (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .mode(mode)
        .save()
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    mode: str = "overwrite",
    num_files: int | None = None,
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on the
    cluster keys (each output file covers a disjoint key range) +
    ``sortWithinPartitions`` (row groups inside a file are ordered).
    Parquet min/max statistics then let downstream point/range scans skip
    whole files and row groups — the single cheapest I/O lever for a
    100 TB table that is mostly read with selective key predicates.

    The range exchange samples key quantiles, so files come out
    size-balanced even under key skew (contrast hash bucketing, which
    a hot key can blow up)."""
    cols = list(cluster_by)
    out = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def zorder_expr(cols: Sequence[str], bits: int = 10):
    """Z-value (Morton code) over up to 6 numeric columns: each column is
    min-max normalized to ``bits`` bits (range bounds must be supplied by
    the caller as (col, lo, hi) tuples) and the bits are interleaved —
    one codegen'd integer expression, no UDF.

    ``cols``: sequence of (name, lo, hi).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    scale = (1 << bits) - 1
    parts = []
    for ci, (name, lo, hi) in enumerate(cols):
        # normalized integer rank in [0, 2^bits)
        norm = (
            f"CAST(LEAST(GREATEST(({name} - {lo}) / ({hi} - {lo}), 0.0),"
            f" 1.0) * {scale} AS BIGINT)"
        )
        # spread this column's bit b to interleaved position b*n + ci
        parts += [
            f"(((({norm}) >> {b}) & 1) << {b * n + ci})" for b in range(bits)
        ]
    return F.expr(" + ".join(parts))


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[tuple],
    mode: str = "overwrite",
    num_files: int | None = None,
    bits: int = 10,
) -> None:
    """Z-order-clustered parquet layout: range-partition + sort on the
    interleaved Morton code so every file covers a compact REGION of the
    multi-column space. Unlike ``write_clustered`` (lexicographic — only
    the leading column prunes well), Z-ordering gives file-level min/max
    skipping on EVERY clustered column, the standard layout for tables
    queried by multiple independent predicates.

    ``cluster_by``: sequence of (column, lo, hi) range hints — at scale
    compute them once with approxQuantile(0/1) or table stats; they only
    steer layout, so staleness degrades clustering, never correctness."""
    z = zorder_expr(cluster_by, bits)
    tagged = df.withColumn("__z", z)
    out = (
        tagged.repartitionByRange(num_files, "__z")
        if num_files
        else tagged.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite ``src_path`` into ``dst_path`` with
    file count sized from the ACTUAL input bytes (ceil(total/target)).
    Returns the output file count.

    The many-tiny-files problem is the classic death of streaming/
    incremental sinks at scale (every micro-batch lands a file per task;
    a year later the table is 10^7 footer reads per scan). Compaction
    writes to a NEW directory — the swap is the caller's atomic pointer
    flip (same recovery contract as streaming/jobs.py's versioned
    snapshots), never an in-place rewrite that a crash can truncate."""
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    # repartition (not coalesce): rebalances skewed inputs and keeps the
    # write parallel; coalesce would chain tiny inputs onto few tasks
    df.repartition(n).write.mode(mode).parquet(dst_path)
    return n
