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
