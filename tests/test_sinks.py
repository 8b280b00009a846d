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


def test_write_clustered_files_cover_disjoint_ranges(spark, tmp_path):
    from etl_job_applify_spark.sinks.writers import write_clustered

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    out = str(tmp_path / "clustered")
    write_clustered(df, out, cluster_by=["k"], num_files=4)

    from pyspark.sql import functions as F

    ranges = (
        spark.read.parquet(out)
        .select("k", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) == 4
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] < cur["lo"], "file key ranges overlap"


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    import os

    from etl_job_applify_spark.sinks.writers import compact_parquet

    src = str(tmp_path / "fragmented")
    spark.range(0, 50_000).repartition(64).write.parquet(src)
    n_small = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_small == 64

    dst = str(tmp_path / "compacted")
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    n = compact_parquet(spark, src, dst, target_file_bytes=total // 3)
    n_big = sum(f.endswith(".parquet") for f in os.listdir(dst))
    assert n == n_big <= 4
    assert spark.read.parquet(dst).count() == 50_000


def test_csv_and_json_export_roundtrip(spark, tmp_path):
    from etl_job_applify_spark.sinks import write_csv, write_json

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    cdir, jdir = str(tmp_path / "csv"), str(tmp_path / "json")
    write_csv(df, cdir)
    back = spark.read.csv(cdir, header=True, inferSchema=True)
    assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}

    nested = spark.createDataFrame(
        [(1, {"k": "x"}, [1, 2])], "id int, m map<string,string>, a array<int>"
    )
    write_json(nested, jdir)
    jback = spark.read.json(jdir)
    row = jback.collect()[0]
    assert row["a"] == [1, 2] and row["m"]["k"] == "x"


def test_zorder_expr_interleaves_bits(spark):
    from etl_job_applify_spark.sinks.writers import zorder_expr

    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3)], "x int, y int"
    ).withColumn("z", zorder_expr([("x", 0, 3), ("y", 0, 3)], bits=2))
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    # x occupies even bit positions, y odd: (3,0)=0101=5, (0,3)=1010=10
    assert got == {(0, 0): 0, (3, 0): 5, (0, 3): 10, (3, 3): 15}


def test_zordered_layout_gives_2d_locality(spark, tmp_path):
    """Each z-ordered file must cover a compact tile of (x, y) space —
    unlike lexicographic clustering, whose files span ALL of y."""
    import os

    from etl_job_applify_spark.sinks.writers import write_zordered

    grid = spark.range(0, 4096).selectExpr(
        "CAST(id % 64 AS INT) AS x", "CAST(id DIV 64 AS INT) AS y"
    )
    out = str(tmp_path / "zorder")
    write_zordered(grid, out, [("x", 0, 63), ("y", 0, 63)], num_files=16)

    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) == 16
    spans = []
    for f in files:
        r = spark.read.parquet(f).selectExpr(
            "max(x) - min(x) AS sx", "max(y) - min(y) AS sy"
        ).collect()[0]
        spans.append((r["sx"], r["sy"]))
    # a 64×64 grid in 16 z-tiles → every file's bounding box stays well
    # under half the global span on BOTH axes (stripes would span 63)
    assert all(sx <= 32 and sy <= 32 for sx, sy in spans), spans


def test_xml_writer_roundtrips_with_reader(spark, tmp_path):
    from etl_job_applify_spark.sinks import write_xml
    from etl_job_applify_spark.sources import read_xml

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    out = str(tmp_path / "xml")
    write_xml(df, out, row_tag="record")
    back = read_xml(spark, out, row_tag="record")
    assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_versioned_table_time_travel_and_retention(spark, tmp_path):
    from etl_job_applify_spark.sinks import (
        list_versions,
        read_table,
        write_version,
    )

    t = str(tmp_path / "vt")
    assert write_version(spark.range(0, 10), t) == 1
    assert write_version(spark.range(0, 20), t) == 2
    assert write_version(spark.range(0, 30), t, retain=2) == 3

    assert list_versions(spark, t) == [2, 3]  # v1 pruned by retain=2
    assert read_table(spark, t).count() == 30           # latest
    assert read_table(spark, t, version=2).count() == 20  # time travel

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="available: \\[2, 3\\]"):
        read_table(spark, t, version=1)


def test_versioned_table_ignores_uncommitted_snapshot(spark, tmp_path):
    import os

    from etl_job_applify_spark.sinks import read_table, write_version

    t = str(tmp_path / "vt2")
    write_version(spark.range(0, 5), t)
    # simulate a crash mid-write: a snapshot dir with data but no _SUCCESS
    broken = os.path.join(t, "snap_00000002")
    os.makedirs(broken)
    open(os.path.join(broken, "part-junk.parquet"), "wb").write(b"junk")
    assert read_table(spark, t).count() == 5  # broken snapshot invisible
    # the next write claims version 2 and OVERWRITES the orphan cleanly
    v = write_version(spark.range(0, 7), t)
    assert v == 2 and read_table(spark, t).count() == 7


# --- Redshift stage-then-COPY sink ---------------------------------------


def test_redshift_copy_statements():
    from etl_job_applify_spark.sinks import copy_statements

    stmts = copy_statements(
        "analytics.events", "s3://lake/stage/run1", iam_role="arn:role",
        mode="overwrite", region="us-east-1",
    )
    assert stmts == [
        "TRUNCATE analytics.events",
        "COPY analytics.events FROM 's3://lake/stage/run1' "
        "FORMAT AS PARQUET IAM_ROLE 'arn:role' REGION 'us-east-1'",
    ]
    append = copy_statements("t", "/stage/p")
    assert append == ["COPY t FROM '/stage/p' FORMAT AS PARQUET"]


def test_redshift_copy_statements_escape_and_validate():
    import pytest

    from etl_job_applify_spark.sinks import copy_statements

    # embedded quotes in string values are doubled, not statement-breaking
    stmts = copy_statements("t", "/stage/o'brien", iam_role="arn:a'b")
    assert stmts == [
        "COPY t FROM '/stage/o''brien' FORMAT AS PARQUET IAM_ROLE 'arn:a''b'"
    ]
    # hostile or malformed table identifiers are rejected outright
    for bad in ("t; DROP TABLE x", "t name", 'a"b"c"', "", "t'--"):
        with pytest.raises(ValueError):
            copy_statements(bad, "/stage/p")
    # quoted mixed-case identifiers stay legal
    assert copy_statements('"My.Table"', "/p")[0].startswith('COPY "My.Table" ')


def test_write_redshift_stages_then_copies(spark, tmp_path):
    """The staging parquet must be complete and committed BEFORE any
    statement executes (the warehouse loads whatever is staged)."""
    from etl_job_applify_spark.sinks import write_redshift

    staging = str(tmp_path / "stage")
    seen = []

    def recorder(sql):
        # staging is readable at execution time
        assert spark.read.parquet(staging).count() == 10
        seen.append(sql)

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    issued = write_redshift(
        df,
        table="warehouse.t",
        staging_path=staging,
        url="jdbc:redshift://example:5439/db",
        user="u",
        password="p",
        mode="overwrite",
        execute=recorder,
    )
    assert list(issued) == seen
    assert seen[0] == "TRUNCATE warehouse.t"
    assert seen[1].startswith("COPY warehouse.t FROM ")


def test_orc_roundtrip_with_partition_pruning(spark, tmp_path):
    from etl_job_applify_spark.sinks import write_orc
    from etl_job_applify_spark.sources import read_orc

    path = str(tmp_path / "orc")
    df = spark.range(100).selectExpr("id", "id % 4 AS part", "id * 3 AS v")
    write_orc(df, path, partition_by=["part"])
    back = read_orc(spark, path)
    assert back.count() == 100
    one = back.filter("part = 2")
    assert one.count() == 25
    # directory partitioning must prune at the scan (inputFiles() shows
    # the unfiltered listing, so check the physical plan's PartitionFilters)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part" in plan.split(
        "PartitionFilters", 1
    )[1][:120]
