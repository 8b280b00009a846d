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
