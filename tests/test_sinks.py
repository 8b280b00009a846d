"""Sinks: partitioned parquet write-out + partition pruning on read-back."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_applify_spark.plans import explain_str
from etl_job_applify_spark.queries._util import tbl
from etl_job_applify_spark.sinks import write_parquet

from conftest import SF_SMOKE


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = tbl(spark, SF_SMOKE, "orders")
    write_parquet(orders, out, partition_by=["o_orderstatus"])

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    pruned = back.filter(F.col("o_orderstatus") == "F")
    text = explain_str(pruned)
    # the status filter must become a PartitionFilter, not a data filter
    assert "PartitionFilters" in text
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_coalesced_file_count(spark, tmp_path):
    out = str(tmp_path / "single")
    write_parquet(
        tbl(spark, SF_SMOKE, "region"), out, target_file_partitions=1
    )
    import glob

    assert len(glob.glob(f"{out}/*.parquet")) == 1
