"""Custom Python DataSource (jsonl_shards): shard-parallel read, strict
schema projection, provenance column, and the one-shard-per-task writer."""

from __future__ import annotations

import json

import pytest

from etl_job_applify_spark.sources.pysource import register


@pytest.fixture()
def shards(tmp_path):
    p = tmp_path / "shards"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"id": 1, "name": "x", "extra": true}\n{"id": 2, "name": "y"}\n'
    )
    (p / "b.jsonl").write_text('{"id": 3}\n\n{"id": 4, "name": "z"}\n')
    return p


def test_read_strict_projection(spark, shards):
    register(spark)
    df = (
        spark.read.format("jsonl_shards")
        .schema("id int, name string")
        .load(str(shards))
    )
    rows = {(r["id"], r["name"]) for r in df.collect()}
    # unknown key 'extra' dropped; missing 'name' -> NULL; blank line skipped
    assert rows == {(1, "x"), (2, "y"), (3, None), (4, "z")}


def test_one_partition_per_shard(spark, shards):
    register(spark)
    df = (
        spark.read.format("jsonl_shards")
        .schema("id int, name string")
        .load(str(shards))
    )
    assert df.rdd.getNumPartitions() == 2


def test_shard_provenance_column(spark, shards):
    register(spark)
    df = (
        spark.read.format("jsonl_shards")
        .schema("id int, name string, _shard string")
        .option("shardcolumn", "true")
        .load(str(shards))
    )
    by_shard = {(r["id"], r["_shard"]) for r in df.collect()}
    assert ((1, "a.jsonl") in by_shard) and ((3, "b.jsonl") in by_shard)


def test_writer_roundtrip(spark, tmp_path):
    register(spark)
    out = tmp_path / "out"
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    ).repartition(2)
    df.write.format("jsonl_shards").mode("append").save(str(out))
    files = sorted(out.glob("part-*.jsonl"))
    assert len(files) == 2  # one shard per write task
    recs = [json.loads(l) for f in files for l in f.read_text().splitlines()]
    assert {(r["id"], r["v"]) for r in recs} == {(1, "a"), (2, "b"), (3, "c")}
    # and the source reads its own output back
    back = (
        spark.read.format("jsonl_shards")
        .schema("id int, v string")
        .load(str(out))
    )
    assert back.count() == 3


def test_stream_reader_tails_new_shards(spark, tmp_path):
    """Streaming read: first micro-batch drains existing shards; shards
    landed later arrive in later batches without reprocessing."""
    register(spark)
    src = tmp_path / "drop"
    src.mkdir()
    (src / "shard-000.jsonl").write_text('{"id": 1}\n{"id": 2}\n')

    stream = (
        spark.readStream.format("jsonl_shards")
        .schema("id int")
        .load(str(src))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName("t_jsonl_tail").start()
    )
    try:
        q.processAllAvailable()
        assert {
            r["id"] for r in spark.sql("SELECT * FROM t_jsonl_tail").collect()
        } == {1, 2}
        (src / "shard-001.jsonl").write_text('{"id": 3}\n')
        q.processAllAvailable()
        ids = [r["id"] for r in spark.sql("SELECT * FROM t_jsonl_tail").collect()]
    finally:
        q.stop()
    assert sorted(ids) == [1, 2, 3]  # no duplicates: shard-000 not re-read


def test_permissive_mode_skips_malformed_lines(spark, tmp_path):
    register(spark)
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"id": 1}\nNOT JSON AT ALL\n[1, 2, 3]\n{"id": 2}\n'
    )
    df = (
        spark.read.format("jsonl_shards")
        .schema("id int")
        .option("permissive", "true")
        .load(str(p))
    )
    assert {r["id"] for r in df.collect()} == {1, 2}
    strict = (
        spark.read.format("jsonl_shards").schema("id int").load(str(p))
    )
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    with _pytest.raises(PythonException):
        strict.collect()


def test_stream_composes_with_windowed_agg(spark, tmp_path):
    """The custom stream feeds a standard watermarked tumbling window —
    custom sources compose with the rest of the streaming engine."""
    from pyspark.sql import functions as F

    register(spark)
    src = tmp_path / "evts"
    src.mkdir()
    (src / "s0.jsonl").write_text(
        '{"ts": "2024-01-01 10:00:30", "kind": "a"}\n'
        '{"ts": "2024-01-01 10:00:45", "kind": "a"}\n'
        '{"ts": "2024-01-01 10:01:30", "kind": "b"}\n'
    )
    stream = (
        spark.readStream.format("jsonl_shards")
        .schema("ts string, kind string")
        .load(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    counts = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "kind")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "kind", "n")
    )
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory").queryName("t_jsonl_win").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["start"]), r["kind"], r["n"])
            for r in spark.sql("SELECT * FROM t_jsonl_win").collect()
        }
    finally:
        q.stop()
    assert ("2024-01-01 10:00:00", "a", 2) in got
    assert ("2024-01-01 10:01:00", "b", 1) in got


# --- Spark 4.1 filter pushdown into the Python source --------------------


def test_pushdown_prunes_shard_partitions(spark, shards):
    """An EqualTo on _shard must prune whole FILES before any read; the
    reader's partitions() is the observable."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    from etl_job_applify_spark.sources.pysource import _JsonlReader

    schema = StructType.fromDDL("id int, name string, _shard string")
    r = _JsonlReader(schema, {"path": str(shards), "shardcolumn": "true"})
    assert len(r.partitions()) == 2
    kept = r.pushFilters([EqualTo(("_shard",), "b.jsonl")])
    assert list(kept)  # every filter handed back for Spark to re-check
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].path.endswith("b.jsonl")


def test_pushdown_prefilters_rows_in_read(spark, shards):
    from pyspark.sql.datasource import GreaterThan
    from pyspark.sql.types import StructType

    from etl_job_applify_spark.sources.pysource import _JsonlReader

    schema = StructType.fromDDL("id int, name string")
    r = _JsonlReader(schema, {"path": str(shards)})
    r.pushFilters([GreaterThan(("id",), 2)])
    rows = [row for p in r.partitions() for row in r.read(p)]
    assert {row[0] for row in rows} == {3, 4}


def test_pushdown_end_to_end_results_and_null_semantics(spark, shards):
    """Through the engine: filters reach the source AND Spark re-applies
    them, so results match SQL semantics exactly (NULL name fails the
    predicate; incomparable pre-filter cases are Spark's to settle)."""
    register(spark)
    df = (
        spark.read.format("jsonl_shards")
        .schema("id int, name string, _shard string")
        .option("shardcolumn", "true")
        .load(str(shards))
    )
    got = {
        r["id"]
        for r in df.filter("_shard = 'a.jsonl' AND name >= 'x'").collect()
    }
    assert got == {1, 2}
    assert df.filter("name = 'nope'").count() == 0
