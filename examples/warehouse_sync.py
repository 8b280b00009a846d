"""Incremental warehouse sync — the reference's production use case
(ingest → contract → dedup → upsert into a warehouse table), composed
from the engine's operators with the observability a real deployment
needs. The reference staged this flow but never executed the merge
(services/data_store.py:29-41 only *prints* the upsert SQL); here it
runs end-to-end:

1. ingest      JSONL drop-zone shards (custom DataSource, shard-parallel,
               permissive bad-record handling)
2. contract    declarative project/rename/cast (single select)
3. dedup       latest record per business key (deterministic keep-first)
4. merge       anti-join+union upsert into the parquet warehouse table
5. observe     rows-in/rows-upserted metrics ride the sink job (no
               second pass)

Run: python examples/warehouse_sync.py  (self-contained demo dirs in /tmp)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def sync(
    spark: SparkSession, drop_zone: str, table_path: str
) -> dict:
    """One sync cycle: drain the drop zone into the warehouse table.
    Returns the run's observed metrics."""
    from pyspark.sql import Observation

    from etl_job_applify_spark.sinks.upsert import upsert
    from etl_job_applify_spark.sinks.versioned import read_table, write_version
    from etl_job_applify_spark.sources.pysource import register
    from etl_job_applify_spark.transform.contract import SchemaContract
    from etl_job_applify_spark.transform.dedup import dedup_keep_first

    register(spark)

    # 1: ingest the landed shards (bad lines skipped, not fatal)
    raw = (
        spark.read.format("jsonl_shards")
        .schema("user_id bigint, name string, updated_at string, v long")
        .option("permissive", "true")
        .load(drop_zone)
    )

    # 2: contract — rename/cast to the warehouse schema
    contract = SchemaContract.from_dict(
        {
            "columns": [
                {"source": "user_id", "name": "id", "type": "integer"},
                {"source": "name", "name": "name", "type": "string"},
                {
                    "source": "updated_at",
                    "name": "updated_at",
                    "type": "timestamp",
                    "format": "yyyy-MM-dd HH:mm:ss",
                },
                {"source": "v", "name": "version", "type": "integer"},
            ]
        }
    )
    batch = contract.apply(raw)

    # 3: latest row per key within the batch
    batch = dedup_keep_first(
        batch, keys=["id"], order_by=["version"], ascending=False
    )

    # 4+5: merge into the warehouse table with observed metrics, landed
    # as a new VERSION (atomic publish — no snapshot ever overwrites its
    # own input, so no cache pinning, and a crash can't truncate the
    # table; older versions stay time-travelable until retention prunes).
    # This read→upsert→publish is the single-writer form; when several
    # jobs may sync the same table concurrently, sinks.merge.merge_into
    # wraps the identical sequence in an optimistic-concurrency CAS
    # commit (recompute-and-retry on conflict).
    try:
        target = read_table(spark, table_path)
        merged = upsert(target, batch, keys=["id"], version_col="version")
    except FileNotFoundError:  # first run: no table yet
        merged = batch
    obs = Observation("sync_metrics")
    merged = merged.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.count_if(F.col("version").isNull()).alias("null_versions"),
    )
    write_version(merged, table_path, retain=3)
    return obs.get


if __name__ == "__main__":
    import tempfile

    from etl_job_applify_spark.session import get_spark_session

    spark = get_spark_session("warehouse_sync")
    d = tempfile.mkdtemp()
    drop, table = f"{d}/drop", f"{d}/users"
    import os

    os.makedirs(drop)
    with open(f"{drop}/batch-000.jsonl", "w") as fh:
        for i in range(5):
            fh.write(json.dumps({
                "user_id": i, "name": f"user{i}",
                "updated_at": "2024-01-01 10:00:00", "v": 1,
            }) + "\n")
    print("run 1:", sync(spark, drop, table))
    with open(f"{drop}/batch-001.jsonl", "w") as fh:
        fh.write(json.dumps({
            "user_id": 3, "name": "user3-renamed",
            "updated_at": "2024-01-02 10:00:00", "v": 2,
        }) + "\n")
    print("run 2:", sync(spark, drop, table))
    from etl_job_applify_spark.sinks.versioned import read_table as _rt
    _rt(spark, table).orderBy("id").show()
    spark.stop()
