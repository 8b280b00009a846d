"""The lakehouse incremental loop, end to end on one table.

A fact table is maintained by transactional MERGEs; a downstream rollup
(the "materialized view") never rescans it — each refresh consumes the
change feed from its cursor and folds the signed delta:

    writer:    merge_into(fact_path, batch)           # CAS-committed
    consumer:  changes, head = consume_changes(fact_path, cursor)
               delta = changes_increment(changes)     # signed: +new -old
               rollup = merge_rollup(rollup, delta)   # exact decimal fold
               commit_cursor(cursor, head)
    janitor:   vacuum_table(fact_path, retain=N)      # after consumers

Refresh cost is O(|rollup| + |delta|), independent of fact-table size —
at 100 TB that is the difference between reading one batch and reading
three years of history. The fold is bit-identical to a full recompute
(DECIMAL states, q151's oracle pins this), so the view can be audited
against a recompute at any time.

Run: python examples/incremental_rollup.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str) -> None:
    from etl_job_applify_spark.operators.incremental import (
        aggregate_increment,
        changes_increment,
        merge_rollup,
        prune_empty_groups,
        rollup_readout,
    )
    from etl_job_applify_spark.sinks import (
        commit_cursor,
        consume_changes,
        merge_into,
        table_history,
        vacuum_table,
    )
    from etl_job_applify_spark.sources.readers import load_table

    work = tempfile.mkdtemp(prefix="ivm_demo_")
    fact, cursor = f"{work}/fact", f"{work}/cursor.json"
    keys, measures = ["o_orderstatus"], {"price": "o_totalprice"}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    rollup = None
    batches = [
        orders.filter(F.col("o_orderkey") % 3 == 0),  # seed
        orders.filter(F.col("o_orderkey") % 6 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.1
        ),  # update half the seed
        orders.filter(F.col("o_orderkey") % 9 == 0),  # delete a third
    ]
    for i, batch in enumerate(batches):
        merge_into(
            spark, fact, batch, keys=["o_orderkey"],
            when_matched="delete" if i == 2 else "update",
        )
        changes, head = consume_changes(spark, fact, cursor, ["o_orderkey"])
        if changes is not None:
            delta = changes_increment(changes, keys, measures)
            rollup = prune_empty_groups(
                merge_rollup(rollup, delta, keys, measures)
            )
            # materialize the fold before advancing the cursor (a real
            # consumer writes the rollup somewhere durable here)
            rollup = spark.createDataFrame(rollup.collect(), rollup.schema)
            commit_cursor(cursor, head)

    print("-- view after 3 incremental refreshes (never rescanned fact):")
    rollup_readout(rollup, measures).orderBy("o_orderstatus").show()
    print("-- audit vs full recompute of the live fact table:")
    from etl_job_applify_spark.sinks import read_table

    rollup_readout(
        aggregate_increment(read_table(spark, fact), keys, measures),
        measures,
    ).orderBy("o_orderstatus").show()
    print("-- table history before/after vacuum:")
    table_history(spark, fact).show()
    print(vacuum_table(spark, fact, retain=1, min_age_s=0.0))
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    from etl_job_applify_spark.session import get_spark_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    run(get_spark_session("incremental_rollup"), sf)
