"""Change data feed over versioned tables (sinks/changes.py)."""

from __future__ import annotations

import pytest

from etl_job_applify_spark.sinks import table_changes, write_version


def _publish(spark, path, rows):
    return write_version(
        spark.createDataFrame(rows, "id long, val string, qty int"), path
    )


def test_changes_classify_insert_delete_update(spark, tmp_path):
    path = str(tmp_path / "t")
    _publish(spark, path, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    _publish(spark, path, [(2, "b", 21), (3, "c", 30), (4, "d", 40)])

    got = {
        (r["id"], r["_change_type"]): (r["val"], r["qty"])
        for r in table_changes(spark, path, 1, 2, keys=["id"]).collect()
    }
    assert got == {
        (1, "delete"): ("a", 10),
        (2, "update_preimage"): ("b", 20),
        (2, "update_postimage"): ("b", 21),
        (4, "insert"): ("d", 40),
    }
    # id=3 is unchanged → not emitted at all
    assert not any(k[0] == 3 for k in got)


def test_changes_null_payloads_are_null_safe(spark, tmp_path):
    path = str(tmp_path / "t")
    _publish(spark, path, [(1, None, 1), (2, None, 2)])
    _publish(spark, path, [(1, None, 1), (2, "x", 2)])
    got = {
        (r["id"], r["_change_type"])
        for r in table_changes(spark, path, 1, 2, keys=["id"]).collect()
    }
    # null == null must count as unchanged; null -> 'x' must count as update
    assert got == {(2, "update_preimage"), (2, "update_postimage")}


def test_changes_reject_schema_drift_and_empty_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    _publish(spark, path, [(1, "a", 1)])
    write_version(
        spark.createDataFrame([(1, "a")], "id long, val string"), path
    )
    with pytest.raises(ValueError, match="schema changed"):
        table_changes(spark, path, 1, 2, keys=["id"])
    with pytest.raises(ValueError, match="keys"):
        table_changes(spark, path, 1, 2, keys=[])


def test_changes_compose_across_merge_commits(spark, tmp_path):
    """CDF over versions produced by merge_into reflects exactly the
    merged batch."""
    from etl_job_applify_spark.sinks.merge import merge_into

    path = str(tmp_path / "t")
    _publish(spark, path, [(1, "a", 10), (2, "b", 20)])
    merge_into(
        spark,
        path,
        spark.createDataFrame([(2, "b", 25), (5, "e", 50)],
                              "id long, val string, qty int"),
        keys=["id"],
    )
    got = {
        (r["id"], r["_change_type"])
        for r in table_changes(spark, path, 1, 2, keys=["id"]).collect()
    }
    assert got == {
        (2, "update_preimage"),
        (2, "update_postimage"),
        (5, "insert"),
    }


def test_consume_changes_cursor_loop(spark, tmp_path):
    """First consumption delivers the snapshot as inserts; subsequent
    calls deliver only deltas; an up-to-date cursor returns None; an
    uncommitted cursor redelivers the same delta."""
    from etl_job_applify_spark.sinks import commit_cursor, consume_changes

    path, cursor = str(tmp_path / "t"), str(tmp_path / "cursor.json")
    _publish(spark, path, [(1, "a", 10), (2, "b", 20)])

    changes, head = consume_changes(spark, path, cursor, keys=["id"])
    assert head == 1
    assert {(r["id"], r["_change_type"]) for r in changes.collect()} == {
        (1, "insert"), (2, "insert"),
    }
    commit_cursor(cursor, head)
    assert consume_changes(spark, path, cursor, keys=["id"])[0] is None

    _publish(spark, path, [(1, "a", 10), (2, "b", 25), (3, "c", 30)])
    delta, head = consume_changes(spark, path, cursor, keys=["id"])
    want = {(2, "update_preimage"), (2, "update_postimage"), (3, "insert")}
    assert {(r["id"], r["_change_type"]) for r in delta.collect()} == want
    # crash before commit: same delta is re-delivered
    delta2, _ = consume_changes(spark, path, cursor, keys=["id"])
    assert {(r["id"], r["_change_type"]) for r in delta2.collect()} == want
    commit_cursor(cursor, head)
    assert consume_changes(spark, path, cursor, keys=["id"])[0] is None


def test_consume_changes_vacuumed_cursor_demands_resync(spark, tmp_path):
    from etl_job_applify_spark.sinks import (
        commit_cursor,
        consume_changes,
        vacuum_table,
    )

    path, cursor = str(tmp_path / "t"), str(tmp_path / "cursor.json")
    _publish(spark, path, [(1, "a", 10)])
    commit_cursor(cursor, 1)
    _publish(spark, path, [(1, "a", 11)])
    _publish(spark, path, [(1, "a", 12)])
    vacuum_table(spark, path, retain=2, min_age_s=0.0)  # drops version 1
    with pytest.raises(ValueError, match="resync"):
        consume_changes(spark, path, cursor, keys=["id"])


def test_sync_changes_rejects_malicious_identifiers(spark, tmp_path):
    """Key/table names are interpolated into hand-built DELETE/INSERT
    SQL — names that could break out of identifier position must be
    rejected up front, before any staging write or transaction."""
    import pytest

    from etl_job_applify_spark.sinks import sync_changes_to_jdbc

    path, cursor = str(tmp_path / "t"), str(tmp_path / "cursor.json")
    _publish(spark, path, [(1, "a", 10)])
    for bad in ({"keys": ["id; DROP TABLE x --"]},
                {"table": 'tgt" OR 1=1'},
                {"staging_table": "s t"}):
        kw = dict(keys=["id"], table="tgt", staging_table="stg")
        kw.update(bad)
        with pytest.raises(ValueError, match="invalid table identifier"):
            sync_changes_to_jdbc(
                spark, path, cursor, kw["keys"],
                "jdbc:derby:memory:never;create=true",
                kw["table"], kw["staging_table"],
                "u", "p", "org.apache.derby.jdbc.EmbeddedDriver",
            )


def test_changes_verify_keys_raises_on_duplicates(spark, tmp_path):
    path = str(tmp_path / "t")
    _publish(spark, path, [(1, "a", 10), (1, "a", 11)])  # dup key in v1
    _publish(spark, path, [(1, "a", 10)])
    with pytest.raises(ValueError, match="not unique"):
        table_changes(spark, path, 1, 2, keys=["id"], verify_keys=True)
    # without verification the diff still runs (documented contract)
    table_changes(spark, path, 1, 2, keys=["id"]).collect()


def test_schema_changes_between_versions(spark, tmp_path):
    import pyspark.sql.functions as F

    from etl_job_applify_spark.sinks import schema_changes, write_version

    path = str(tmp_path / "t")
    write_version(
        spark.range(10).select("id", F.lit("x").alias("tag"),
                               (F.col("id") * 1.0).alias("v")),
        path,
    )
    write_version(
        spark.range(10).select(
            "id",
            F.col("id").cast("int").alias("v"),      # type change
            F.lit(True).alias("flag"),               # added
        ),                                           # tag removed
        path,
    )
    findings = schema_changes(spark, path, 1, 2)
    by = {(f["change"], f["column"]): f for f in findings}
    assert set(by) == {
        ("removed", "tag"), ("added", "flag"), ("type_changed", "v")
    }
    assert by[("type_changed", "v")]["before"] == "double"
    assert by[("type_changed", "v")]["after"] == "int"
    assert schema_changes(spark, path, 2, 2) == []
