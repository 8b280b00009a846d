"""Reader layer: reference-parity semantics (S1-S3) + explicit schemas."""

from __future__ import annotations

import textwrap

from etl_job_applify_spark.sources import (
    read_csv,
    read_json,
    read_xml,
    load_tables,
    TABLES,
)
from etl_job_applify_spark.sources.jdbc import JdbcSource, jdbc_reader_options
from etl_job_applify_spark.sources.catalog import list_tables_sql

from conftest import SF_SMOKE


def test_load_tables_all_present(spark):
    dfs = load_tables(spark, SF_SMOKE)
    assert set(dfs) == set(TABLES)
    assert dfs["lineitem"].count() > 0


def test_read_csv_header_infer(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["id", "name", "score"]
    assert df.count() == 2
    assert dict(df.dtypes)["id"] == "int"


def test_read_csv_explicit_schema_no_infer(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,alpha\nbad,beta\n")
    df = read_csv(spark, str(p), schema="id int, name string")
    rows = {r["name"]: r["id"] for r in df.collect()}
    assert rows == {"alpha": 1, "beta": None}  # PERMISSIVE: bad cell → null


def test_read_json_multiline_permissive(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text('[{"id": 1, "city": "NY"}, {"id": 2, "city": "SF"}]')
    df = read_json(spark, str(p))
    assert df.count() == 2
    assert set(df.columns) == {"id", "city"}


def test_read_xml_rowtag(spark, tmp_path):
    p = tmp_path / "t.xml"
    p.write_text(
        textwrap.dedent(
            """\
            <records>
              <record><id>1</id><name>John</name></record>
              <record><id>2</id><name>Jane</name></record>
            </records>
            """
        )
    )
    df = read_xml(spark, str(p), row_tag="record")
    assert df.count() == 2
    assert {r["name"] for r in df.collect()} == {"John", "Jane"}


def test_jdbc_reader_options_partitioned():
    opts = jdbc_reader_options(
        "jdbc:postgresql://h:5432/db", "u", "p", "org.postgresql.Driver",
        table="orders", partition_column="id", lower_bound=0,
        upper_bound=1000, num_partitions=8,
    )
    assert opts["numPartitions"] == "8"
    assert opts["partitionColumn"] == "id"


def test_jdbc_source_url_and_dialects():
    src = JdbcSource("mysql", "h", "db", "u", "p")
    assert src.url == "jdbc:mysql://h:3306/db"
    assert "information_schema" in list_tables_sql("mysql", "db")
    assert list_tables_sql("oracle") == "SELECT table_name FROM user_tables"


def test_jdbc_empty_table_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        jdbc_reader_options("u", "u", "p", "d", table="")


def test_orc_roundtrip(spark, tmp_path):
    from etl_job_applify_spark.sources import read_orc

    out = str(tmp_path / "orc")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    df.write.orc(out)
    back = read_orc(spark, out)
    assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_text_reader_lines_and_whole(spark, tmp_path):
    from etl_job_applify_spark.sources import read_text

    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo line\n")
    lines = read_text(spark, str(p))
    assert lines.columns == ["value"]
    assert lines.count() == 3
    whole = read_text(spark, str(p), whole=True)
    assert whole.count() == 2
    assert {r["value"].count("\n") for r in whole.collect()} == {1, 2}


def test_binary_reader_content_and_glob(spark, tmp_path):
    from etl_job_applify_spark.sources import read_binary

    p = tmp_path / "media"
    p.mkdir()
    (p / "x.jpg").write_bytes(b"\xff\xd8fakejpeg")
    (p / "y.png").write_bytes(b"\x89PNGfake")
    df = read_binary(spark, str(p), glob="*.jpg")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["content"] == b"\xff\xd8fakejpeg"
    assert rows[0]["length"] == 10
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}


def test_avro_paths_are_cleanly_gated(spark, tmp_path):
    """Avro needs the external spark-avro module (absent here): both
    directions must raise the actionable ImportError, not a raw
    ClassNotFound — and would work unchanged with the package present."""
    import pytest

    from etl_job_applify_spark.sinks.writers import write_avro
    from etl_job_applify_spark.sources.readers import read_avro

    with pytest.raises(ImportError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "x.avro"))
    with pytest.raises(ImportError, match="spark-avro"):
        write_avro(spark.range(3), str(tmp_path / "y.avro"))


def test_local_relation_fallback_warns_once(spark, monkeypatch):
    """A broken Arrow path must be LOUD: the first pickled-row fallback
    raises a RuntimeWarning naming the exception (silent fallback would
    quietly reinstate per-scan Python-worker tasks across ~20 call
    sites); the deliberate NaN-literal fallback stays silent."""
    import warnings

    import pytest

    from etl_job_applify_spark.sources import local as local_mod

    monkeypatch.setattr(local_mod, "_WARNED_FALLBACK", False)
    # deliberate NaN routing: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        df = local_mod.local_relation(
            spark, [(1, float("nan"))], "a int, b double"
        )
        assert df.count() == 1
    # forced Arrow-path failure: one warning, then silence
    real_create = spark.createDataFrame
    calls = {"n": 0}

    def flaky(data, schema=None, **kw):
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            calls["n"] += 1
            raise RuntimeError("forced arrow failure")
        return real_create(data, schema, **kw)

    monkeypatch.setattr(spark, "createDataFrame", flaky)
    with pytest.warns(RuntimeWarning, match="forced arrow failure"):
        out = local_mod.local_relation(spark, [(1, 2.5)], "a int, b double")
        assert out.count() == 1
    assert calls["n"] == 1
    with warnings.catch_warnings():  # second failure: already warned
        warnings.simplefilter("error")
        local_mod.local_relation(spark, [(2, 3.5)], "a int, b double")
