"""Job-spec dispatch (reference P2 parity) + engine-side AES-GCM (C2)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_job_applify_spark.functions.crypto import aes_gcm_decrypt, aes_gcm_encrypt
from etl_job_applify_spark.jobs import build_job, run_job


def test_job_spec_csv_contract_dedup_parquet(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text(
        "Customer Id,Subscription Date,Score\n"
        "c1,2020-08-24,1.5\nc1,2020-08-24,1.5\nc2,2021-01-02,2.5\n"
    )
    out = str(tmp_path / "out")
    spec = {
        "name": "csv_ingest",
        "source": {"type": "csv", "path": str(src)},
        "contract": {"columns": [
            {"source": "Customer Id", "name": "customer_id", "type": "string"},
            {"source": "Subscription Date", "name": "subscribed_on",
             "type": "date", "format": "yyyy-MM-dd"},
            {"source": "Score", "name": "score", "type": "double"},
        ]},
        "dedup": {},
        "sink": {"type": "parquet", "path": out},
    }
    run_job(spark, spec)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert set(back.columns) == {"customer_id", "subscribed_on", "score"}


def test_job_spec_json_no_sink_returns_df(spark, tmp_path):
    src = tmp_path / "in.json"
    src.write_text('[{"id": 1}, {"id": 2}]')
    spec = {"source": {"type": "json", "path": str(src)}}
    df = run_job(spark, spec)
    assert df.count() == 2


def test_job_spec_unknown_source_rejected():
    with pytest.raises(ValueError, match="unknown source"):
        build_job({"source": {"type": "dynamo"}})


def test_jdbc_job_spec_builds_lazily():
    # building must not touch the (nonexistent) database
    pipe = build_job({
        "source": {"type": "postgres", "host": "h", "database": "d",
                    "user": "u", "password": "p", "table": "t",
                    "partition": {"column": "id", "lower": 0, "upper": 100, "num": 4}},
    })
    assert pipe.extract is not None


def test_aes_gcm_roundtrip(spark):
    key = b"0123456789abcdef0123456789abcdef"  # 32 bytes = AES-256
    df = spark.createDataFrame([("s3cret",), ("pa ss",)], "pwd string")
    enc = df.select(aes_gcm_encrypt("pwd", key).alias("ct"), "pwd")
    # ciphertext is nonce-prepended binary, not the plaintext
    first = enc.first()
    assert isinstance(first["ct"], (bytes, bytearray))
    assert bytes(first["ct"]) != first["pwd"].encode()
    dec = enc.select(aes_gcm_decrypt("ct", key).alias("pt"), "pwd")
    assert all(r["pt"] == r["pwd"] for r in dec.collect())


def test_streaming_dedup_within_watermark(spark):
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.streaming import events_stream, run_to_memory
    from etl_job_applify_spark.streaming.jobs import deduped_stream

    from conftest import SF_SMOKE

    out = run_to_memory(
        deduped_stream(events_stream(spark, SF_SMOKE)), "t_dedup_stream"
    )
    # fixture ids are unique → dedup is the identity on counts
    assert out.count() == tbl(spark, SF_SMOKE, "events").count()


def test_job_spec_new_sources_and_sinks(spark, tmp_path):
    """The widened dispatch: text source with filter, jsonl roundtrip,
    csv/json sinks."""
    import json as _json

    from etl_job_applify_spark.jobs import run_job

    # text source + filter + json sink
    src = tmp_path / "raw"
    src.mkdir()
    (src / "a.txt").write_text("keep me\ndrop this\nkeep too\n")
    out_json = str(tmp_path / "out_json")
    run_job(spark, {
        "source": {"type": "text", "path": str(src)},
        "filter": "value LIKE 'keep%'",
        "sink": {"type": "json", "path": out_json, "compression": None},
    })
    assert spark.read.json(out_json).count() == 2

    # jsonl source -> csv sink
    shards = tmp_path / "shards"
    shards.mkdir()
    (shards / "s.jsonl").write_text(
        "\n".join(_json.dumps({"id": i, "v": f"x{i}"}) for i in range(5))
    )
    out_csv = str(tmp_path / "out_csv")
    run_job(spark, {
        "source": {"type": "jsonl", "path": str(shards),
                   "schema": "id int, v string"},
        "filter": "id >= 2",
        "sink": {"type": "csv", "path": out_csv, "compression": None},
    })
    back = spark.read.csv(out_csv, header=True, inferSchema=True)
    assert {r["id"] for r in back.collect()} == {2, 3, 4}

    # binary source listing
    media = tmp_path / "media"
    media.mkdir()
    (media / "x.bin").write_bytes(b"abc")
    df = run_job(spark, {
        "source": {"type": "binary", "path": str(media)},
    })
    assert df.count() == 1


def test_stream_job_spec_incremental(spark, tmp_path):
    """Declarative streaming job: drain existing files, stop, resume with
    only new files after restart (checkpointed offsets)."""
    import json as _json

    from etl_job_applify_spark.jobs import run_stream_job

    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(_json.dumps({"id": i, "v": i * 10}) for i in range(4))
    )
    spec = {
        "source": {"type": "jsonl", "path": str(src),
                   "schema": "id int, v int"},
        "filter": "id >= 1",
        "sink": {"path": str(tmp_path / "out"),
                  "checkpoint": str(tmp_path / "ckpt")},
    }
    run_stream_job(spark, spec)
    assert spark.read.parquet(spec["sink"]["path"]).count() == 3

    (src / "b.jsonl").write_text(_json.dumps({"id": 9, "v": 90}))
    run_stream_job(spark, spec)
    back = spark.read.parquet(spec["sink"]["path"])
    assert {r["id"] for r in back.collect()} == {1, 2, 3, 9}


def test_stream_job_rate_source_maps_onto_events_schema(spark, tmp_path):
    """Source-swap seam: the same spec→stream path runs on Spark's
    built-in rate-micro-batch generator (no files), with a projection
    mapping (timestamp, value) onto the events schema — proving the
    binding is source-agnostic (kafka is the same shape, jars absent)."""
    from etl_job_applify_spark.jobs import run_stream_job

    spec = {
        "source": {
            "type": "rate-micro-batch",
            "options": {"rowsPerBatch": "24", "numPartitions": "4"},
            "projection": [
                "value AS event_id",
                "pmod(value, 5) AS user_id",
                "element_at(array('view','click','purchase'), "
                "CAST(pmod(value, 3) AS INT) + 1) AS event_type",
                "timestamp AS ts",
                "CAST(value AS DOUBLE) * 1.5 AS value",
            ],
        },
        "filter": "event_type != 'view'",
        "sink": {"path": str(tmp_path / "out"),
                 "checkpoint": str(tmp_path / "ckpt")},
    }
    run_stream_job(spark, spec)
    out = spark.read.parquet(spec["sink"]["path"])
    assert set(out.columns) == {"event_id", "user_id", "event_type",
                                "ts", "value"}
    rows = out.collect()
    assert len(rows) == 16  # 24 generated, every third is 'view'
    assert {r["event_type"] for r in rows} == {"click", "purchase"}
    assert all(r["value"] == r["event_id"] * 1.5 for r in rows)


def test_job_quality_gate_blocks_bad_data(spark, tmp_path):
    """A job spec with a 'quality' suite must refuse to publish a
    dataset that fails a rule, and pass through one that doesn't."""
    import pytest

    from etl_job_applify_spark.jobs import run_job

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 5.0), (2, 500.0)], "id long, v double"
    ).write.parquet(src)
    sink = str(tmp_path / "out")

    bad = {
        "source": {"type": "parquet", "path": src},
        "quality": [{"type": "bounds", "column": "v", "lo": 0, "hi": 100}],
        "sink": {"type": "parquet", "path": sink},
    }
    with pytest.raises(ValueError, match="data-quality gate"):
        run_job(spark, bad)
    import os

    assert not os.path.exists(os.path.join(sink, "_SUCCESS"))

    ok = dict(bad, quality=[{"type": "completeness", "column": "id"}])
    run_job(spark, ok)
    assert spark.read.parquet(sink).count() == 2


def test_job_spec_versioned_sink_with_bloom(spark, tmp_path):
    """The lakehouse sink through the job driver: snapshot publish +
    Z-order layout + Bloom index, read back with pruned point lookup."""
    import pyspark.sql.functions as F

    from etl_job_applify_spark.jobs import run_job
    from etl_job_applify_spark.sinks import read_table, snapshot_files

    src = str(tmp_path / "in.parquet")
    spark.range(5000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        (F.col("id") * 2.0).alias("v"),
    ).write.parquet(src)
    table = str(tmp_path / "tbl")
    run_job(spark, {
        "source": {"type": "parquet", "path": src},
        "sink": {
            "type": "versioned",
            "path": table,
            "cluster_by": [["k", 0, 97]],
            "num_files": 8,
            "bloom_columns": ["id"],
        },
    })
    kept, total = snapshot_files(spark, table, equals={"id": 1234})
    assert total == 8 and 1 <= len(kept) <= 3
    rows = read_table(spark, table, equals={"id": 1234}).collect()
    assert len(rows) == 1 and rows[0]["v"] == 2468.0


def test_job_spec_flatten_step(spark, tmp_path):
    import json

    from etl_job_applify_spark.jobs import run_job

    src = str(tmp_path / "nested.json")
    with open(src, "w") as fh:
        # the json source is multiLine (S1 parity): one array document
        json.dump(
            [
                {"id": 1, "meta": {"k": "a", "n": 5}},
                {"id": 2, "meta": {"k": "b", "n": 7}},
            ],
            fh,
        )
    df = run_job(spark, {
        "source": {"type": "json", "path": src},
        "flatten": True,
    })
    assert set(df.columns) == {"id", "meta_k", "meta_n"}
    assert df.count() == 2


def test_job_spec_sample_step_deterministic(spark, tmp_path):
    from etl_job_applify_spark.jobs import run_job

    src = str(tmp_path / "s.parquet")
    spark.range(5000).write.parquet(src)
    spec = {
        "source": {"type": "parquet", "path": src},
        "sample": {"rate_pct": 20, "hash_cols": ["id"]},
    }
    a = run_job(spark, spec)
    b = run_job(spark, spec)
    na, nb = a.count(), b.count()
    assert na == nb  # reruns identical
    assert 600 < na < 1400  # ~20% of 5000
    # rate 100 keeps everything
    spec["sample"]["rate_pct"] = 100
    assert run_job(spark, spec).count() == 5000
