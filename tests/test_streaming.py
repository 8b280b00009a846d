"""Structured Streaming jobs: each streaming window job must agree with
its oracle-checked batch twin from queries/temporal.py."""

from __future__ import annotations

from etl_job_applify_spark.queries.temporal import (
    q50_tumbling_window,
    q51_sliding_window,
    q52_sessions,
)
from etl_job_applify_spark.streaming import (
    events_stream,
    run_available_now_to_memory,
    run_to_memory,
    session_aggregates,
    sliding_counts,
    tumbling_counts,
)

from conftest import SF_SMOKE


def _norm(rows, keys):
    return {tuple(r[k] for k in keys): r["n"] for r in rows}


def test_tumbling_stream_matches_batch_twin(spark):
    stream = tumbling_counts(events_stream(spark, SF_SMOKE))
    got = run_to_memory(stream, "t_tumbling", output_mode="complete").collect()
    want = q50_tumbling_window(spark, SF_SMOKE).collect()
    assert _norm(got, ["window_start", "event_type"]) == _norm(
        want, ["window_start", "event_type"]
    )


def test_sliding_stream_matches_batch_twin(spark):
    stream = sliding_counts(events_stream(spark, SF_SMOKE))
    got = run_to_memory(stream, "t_sliding", output_mode="complete").collect()
    want = q51_sliding_window(spark, SF_SMOKE).collect()
    assert _norm(got, ["window_start"]) == _norm(want, ["window_start"])


def test_session_stream_produces_state(spark):
    stream = session_aggregates(events_stream(spark, SF_SMOKE), gap="30 minutes")
    # session windows stream in append (watermark-finalized) or complete;
    # complete emits every session for the single-batch smoke run
    got = run_to_memory(stream, "t_sessions", output_mode="complete").collect()
    assert len(got) > 0
    assert all(r["session_start"] <= r["session_end"] for r in got)


# --- stream-vs-batch equivalence under Trigger.AvailableNow --------------
# The strongest available oracle for streaming (SURVEY §7 risk register:
# no DuckDB twin exists for a streaming query): run the streaming job to
# completion with the production catch-up trigger and assert EXACT
# equality — keys, counts, and bit-for-bit totals (both sides aggregate
# through the associative DECIMAL idiom) — with the oracle-checked batch
# query over the same fixture.


def _rows(rows, key_cols, val_cols):
    out = {}
    for r in rows:
        k = tuple(r[c] for c in key_cols)
        assert k not in out, f"duplicate key {k}"
        out[k] = tuple(r[c] for c in val_cols)
    return out


def test_available_now_tumbling_equals_batch(spark):
    stream = tumbling_counts(events_stream(spark, SF_SMOKE))
    got = run_available_now_to_memory(stream, "an_tumbling").collect()
    want = q50_tumbling_window(spark, SF_SMOKE).collect()
    assert _rows(got, ["window_start", "event_type"], ["n", "total"]) == _rows(
        want, ["window_start", "event_type"], ["n", "total"]
    )


def test_available_now_sliding_equals_batch(spark):
    stream = sliding_counts(events_stream(spark, SF_SMOKE))
    got = run_available_now_to_memory(stream, "an_sliding").collect()
    want = q51_sliding_window(spark, SF_SMOKE).collect()
    assert _rows(got, ["window_start"], ["n", "total"]) == _rows(
        want, ["window_start"], ["n", "total"]
    )


def test_available_now_sessions_equal_batch(spark):
    """Session equality needs a boundary mapping: session_window reports
    [first_ts, last_ts + gap) while the batch sessionizer reports
    [min(ts), max(ts)] — identical membership, shifted end. Compare
    per-(user, session_start): counts, exact totals, and the end-bound
    relation."""
    import datetime as dt

    gap = dt.timedelta(seconds=1800)
    stream = session_aggregates(
        events_stream(spark, SF_SMOKE), gap="30 minutes"
    )
    got = run_available_now_to_memory(stream, "an_sessions").collect()
    want = q52_sessions(spark, SF_SMOKE).collect()
    assert len(got) == len(want) > 0
    s = _rows(
        got,
        ["user_id", "session_start"],
        ["n_events", "total_value", "session_end"],
    )
    b = _rows(
        want,
        ["user_id", "session_start"],
        ["n_events", "total_value", "session_end"],
    )
    assert set(s) == set(b)
    for k, (n_s, tot_s, end_s) in s.items():
        n_b, tot_b, end_b = b[k]
        assert (n_s, tot_s) == (n_b, tot_b), f"session {k} differs"
        assert end_s == end_b + gap, f"session {k} end bound mismatch"


def test_watermark_present_in_plan(spark):
    stream = tumbling_counts(events_stream(spark, SF_SMOKE), watermark="2 hours")
    assert stream.isStreaming


def test_stream_static_join(spark):
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.streaming.jobs import stream_static_enrich

    customers = tbl(spark, SF_SMOKE, "customer")
    out = run_to_memory(
        stream_static_enrich(events_stream(spark, SF_SMOKE), customers),
        "t_enrich",
    ).collect()
    assert len(out) > 0
    assert all(r["c_mktsegment"] is not None for r in out)


def test_stateful_user_totals_matches_batch(spark):
    from pyspark.sql import functions as F

    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.streaming.jobs import stateful_user_totals

    got = run_to_memory(
        stateful_user_totals(events_stream(spark, SF_SMOKE)),
        "t_stateful",
        output_mode="update",
    ).collect()
    # single-batch replay → the final state per user equals the batch agg
    latest = {r["user_id"]: (r["n_events"], r["total_value"]) for r in got}
    want = {
        r["user_id"]: (r["n"], r["tv"])
        for r in tbl(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert latest.keys() == want.keys()
    for u in want:
        assert latest[u][0] == want[u][0]
        assert abs(latest[u][1] - want[u][1]) < 1e-6


def test_transform_with_state_matches_batch(spark):
    """Spark 4 transformWithStateInPandas twin of the stateful test:
    typed ValueState on the RocksDB provider, same batch-agg oracle.
    Skips where protobuf (the TWS state-server protocol dependency) is
    absent — this container — after asserting the gate raises cleanly."""
    import pytest

    from pyspark.sql import functions as F

    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.streaming.jobs import (
        transform_with_state_user_totals,
    )

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="protobuf"):
            transform_with_state_user_totals(events_stream(spark, SF_SMOKE))
        pytest.skip("protobuf unavailable: transformWithState gated off")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = run_to_memory(
            transform_with_state_user_totals(events_stream(spark, SF_SMOKE)),
            "t_tws",
            output_mode="update",
        ).collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    latest = {r["user_id"]: (r["n_events"], r["total_value"]) for r in got}
    want = {
        r["user_id"]: (r["n"], r["tv"])
        for r in tbl(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert latest.keys() == want.keys()
    for u in want:
        assert latest[u][0] == want[u][0]
        assert abs(latest[u][1] - want[u][1]) < 1e-6


def test_foreach_batch_parquet_sink(spark, tmp_path):
    from etl_job_applify_spark.streaming.jobs import run_foreach_batch_to_parquet

    out = str(tmp_path / "sink")
    run_foreach_batch_to_parquet(events_stream(spark, SF_SMOKE), out)
    n = spark.read.parquet(out).count()
    from etl_job_applify_spark.queries._util import tbl

    assert n == tbl(spark, SF_SMOKE, "events").count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Micro-batches via maxFilesPerTrigger=1: batch1 establishes event
    time, batch2 advances the watermark, batch3 carries an event behind
    it → dropped from the windowed aggregation. (Spark applies the
    late-row filter with the watermark as of the PREVIOUS batch, hence
    the three-batch shape.)"""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()
    t = pd.Timestamp("2024-01-01 10:00:00")
    batches = [
        pd.DataFrame({"event_id": [1, 2, 3],
                      "ts": [t, t + pd.Timedelta("5 minutes"),
                             pd.Timestamp("2024-01-01 13:00:00")],
                      "value": [1.0, 1.0, 1.0]}),
        pd.DataFrame({"event_id": [4],
                      "ts": [pd.Timestamp("2024-01-01 13:30:00")],
                      "value": [1.0]}),
        # watermark now 12:00 → window [10:00, 11:00) is closed; this
        # event is late and must be dropped
        pd.DataFrame({"event_id": [5],
                      "ts": [pd.Timestamp("2024-01-01 10:20:00")],
                      "value": [1.0]}),
    ]
    for i, b in enumerate(batches):
        b.to_parquet(src / f"b{i}.parquet", coerce_timestamps="us")
        _time.sleep(1.1)  # distinct mtimes → deterministic file order

    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    got = run_to_memory(stream, "t_late", output_mode="update").collect()
    by_window = {}
    for r in got:  # update mode appends one row per changed window per batch
        by_window.setdefault(r["ws"].hour, []).append(r["n"])
    # the 10:00 window saw 2 events in batch1; the late event must NOT
    # bump it to 3
    assert max(by_window[10]) == 2
    # the 13:00 window updates to 2 with the on-time batch2 event
    assert max(by_window[13]) == 2


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases join preceding views of the same user within 30 minutes;
    result must equal the batch twin of the same interval join."""
    import pandas as pd

    from etl_job_applify_spark.streaming.jobs import stream_stream_interval_join
    from pyspark.sql import functions as F

    t0 = pd.Timestamp("2024-01-01 10:00:00")
    views = pd.DataFrame(
        {"v_user": [1, 1, 2, 3],
         "v_ts": [t0, t0 + pd.Timedelta("20 minutes"),
                  t0 + pd.Timedelta("5 minutes"), t0],
         "view_id": [10, 11, 12, 13]}
    )
    purchases = pd.DataFrame(
        {"p_user": [1, 2, 3],
         "p_ts": [t0 + pd.Timedelta("30 minutes"),
                  t0 + pd.Timedelta("50 minutes"),  # view too old → no match
                  t0 + pd.Timedelta("10 minutes")],
         "purchase_id": [100, 101, 102]}
    )
    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    vdir.mkdir(); pdir.mkdir()
    views.to_parquet(vdir / "v.parquet", coerce_timestamps="us")
    purchases.to_parquet(pdir / "p.parquet", coerce_timestamps="us")

    v_stream = spark.readStream.schema(
        "v_user bigint, v_ts timestamp, view_id bigint"
    ).parquet(str(vdir))
    p_stream = spark.readStream.schema(
        "p_user bigint, p_ts timestamp, purchase_id bigint"
    ).parquet(str(pdir))
    joined = stream_stream_interval_join(p_stream, v_stream)
    got = sorted(
        (r["purchase_id"], r["view_id"])
        for r in run_to_memory(joined, "t_ssj").collect()
    )
    # batch twin
    bv, bp = spark.createDataFrame(views), spark.createDataFrame(purchases)
    want = sorted(
        (r["purchase_id"], r["view_id"])
        for r in bp.join(
            bv,
            F.expr("p_user = v_user AND v_ts BETWEEN p_ts - INTERVAL 30 minutes AND p_ts"),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_foreach_batch_cdc_upsert(spark, tmp_path):
    """Two micro-batches of keyed updates MERGE into a parquet target; the
    final table equals applying the batch upsert over all updates."""
    import time as _time

    import pandas as pd

    from etl_job_applify_spark.streaming.jobs import run_foreach_batch_upsert

    src = tmp_path / "cdc_src"
    src.mkdir()
    target = str(tmp_path / "cdc_target")
    pd.DataFrame({"id": [1, 2, 3], "v": ["a", "b", "c"], "ver": [1, 1, 1]}
                 ).to_parquet(src / "b1.parquet")
    _time.sleep(1.1)
    pd.DataFrame({"id": [2, 4], "v": ["B", "d"], "ver": [2, 1]}
                 ).to_parquet(src / "b2.parquet")

    stream = (
        spark.readStream.schema("id bigint, v string, ver bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_foreach_batch_upsert(stream, target, keys=["id"], version_col="ver")
    from etl_job_applify_spark.streaming.jobs import read_upsert_target

    got = {r["id"]: r["v"] for r in read_upsert_target(spark, target).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_checkpoint_recovery_no_reprocessing(spark, tmp_path):
    """Stop a checkpointed stream, add data, restart with the same
    checkpoint: only the NEW file is processed (exactly-once source
    accounting across restarts)."""
    import time as _time

    import pandas as pd

    src = tmp_path / "cp_src"
    src.mkdir()
    out = str(tmp_path / "cp_out")
    cp = str(tmp_path / "cp_state")
    pd.DataFrame({"id": [1, 2, 3]}).to_parquet(src / "a.parquet")

    def start():
        return (
            spark.readStream.schema("id bigint").parquet(str(src))
            .writeStream.option("checkpointLocation", cp)
            .format("parquet").option("path", out).start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 3

    _time.sleep(1.1)
    pd.DataFrame({"id": [4, 5]}).to_parquet(src / "b.parquet")
    q = start()
    q.processAllAvailable()
    q.stop()
    rows = [r["id"] for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == [1, 2, 3, 4, 5]  # batch a NOT reprocessed


def test_cdc_old_snapshots_pruned(spark, tmp_path):
    import os

    import pandas as pd

    from etl_job_applify_spark.streaming.jobs import (
        read_upsert_target,
        run_foreach_batch_upsert,
    )

    src = tmp_path / "cdc2_src"
    src.mkdir()
    target = str(tmp_path / "cdc2_target")
    pd.DataFrame({"id": [1], "v": ["a"], "ver": [1]}).to_parquet(src / "b.parquet")
    pd.DataFrame({"id": [2], "v": ["b"], "ver": [1]}).to_parquet(src / "c.parquet")
    stream = (
        spark.readStream.schema("id bigint, v string, ver bigint")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    run_foreach_batch_upsert(stream, target, keys=["id"], version_col="ver")
    snaps = sorted(d for d in os.listdir(target) if d.startswith("snap_"))
    assert snaps == ["snap_00000002"]  # superseded snapshot pruned
    assert read_upsert_target(spark, target).count() == 2


def test_cdc_crash_mid_write_preserves_previous_snapshot(spark, tmp_path):
    """An uncommitted snapshot dir (no _SUCCESS — a crash mid-write) is
    invisible to resolution: readers still see the last committed state,
    and the next batch numbers PAST the junk dir and merges correctly."""
    import os
    import shutil

    import pandas as pd

    from etl_job_applify_spark.streaming.jobs import (
        read_upsert_target,
        run_foreach_batch_upsert,
    )

    src = tmp_path / "cdc3_src"
    src.mkdir()
    target = str(tmp_path / "cdc3_target")
    pd.DataFrame({"id": [1, 2], "v": ["a", "b"], "ver": [1, 1]}
                 ).to_parquet(src / "b1.parquet")
    stream = (
        spark.readStream.schema("id bigint, v string, ver bigint")
        .parquet(str(src))
    )
    run_foreach_batch_upsert(stream, target, keys=["id"], version_col="ver")

    # simulate a crash mid-write of the NEXT snapshot: parquet part files
    # present but no _SUCCESS marker
    shutil.copytree(f"{target}/snap_00000001", f"{target}/snap_00000002")
    os.remove(f"{target}/snap_00000002/_SUCCESS")
    got = {r["id"]: r["v"] for r in read_upsert_target(spark, target).collect()}
    assert got == {1: "a", 2: "b"}  # committed state, not the torn write

    import time as _time

    _time.sleep(1.1)
    pd.DataFrame({"id": [2], "v": ["B"], "ver": [2]}).to_parquet(src / "b2.parquet")
    stream2 = (
        spark.readStream.schema("id bigint, v string, ver bigint")
        .parquet(str(src))
    )
    run_foreach_batch_upsert(stream2, target, keys=["id"], version_col="ver")
    got = {r["id"]: r["v"] for r in read_upsert_target(spark, target).collect()}
    assert got == {1: "a", 2: "B"}


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """leftOuter interval join: the purchase with no in-interval view must
    emit with NULL view columns once the watermark passes its interval."""
    import pandas as pd

    from etl_job_applify_spark.streaming.jobs import (
        run_to_memory,
        stream_stream_interval_join,
    )

    t0 = pd.Timestamp("2024-01-01 10:00:00")
    views = pd.DataFrame(
        {"v_user": [1], "v_ts": [t0], "view_id": [10]}
    )
    purchases = pd.DataFrame(
        {"p_user": [1, 2],
         "p_ts": [t0 + pd.Timedelta("10 minutes"),
                  t0 + pd.Timedelta("10 minutes")],    # user 2: no view
         "purchase_id": [100, 101]}
    )
    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    vdir.mkdir(); pdir.mkdir()
    views.to_parquet(vdir / "v.parquet", coerce_timestamps="us")
    purchases.to_parquet(pdir / "p.parquet", coerce_timestamps="us")

    v_stream = spark.readStream.schema(
        "v_user bigint, v_ts timestamp, view_id bigint"
    ).parquet(str(vdir))
    p_stream = spark.readStream.schema(
        "p_user bigint, p_ts timestamp, purchase_id bigint"
    ).parquet(str(pdir))
    joined = stream_stream_interval_join(p_stream, v_stream, how="leftOuter")

    # live query: outer-side state evicts (and emits NULL-matches) only in
    # a batch AFTER the watermark has passed the join interval, so feed a
    # far-future sentinel view between the two drains
    q = (
        joined.writeStream.outputMode("append")
        .format("memory").queryName("t_ssoj").start()
    )
    try:
        q.processAllAvailable()
        # the GLOBAL watermark is min() across both inputs — advance both
        pd.DataFrame(
            {"v_user": [9], "v_ts": [t0 + pd.Timedelta("6 hours")],
             "view_id": [99]}
        ).to_parquet(vdir / "sentinel.parquet", coerce_timestamps="us")
        pd.DataFrame(
            {"p_user": [9], "p_ts": [t0 + pd.Timedelta("6 hours")],
             "purchase_id": [999]}
        ).to_parquet(pdir / "sentinel.parquet", coerce_timestamps="us")
        q.processAllAvailable()
        got = {
            (r["purchase_id"], r["view_id"])
            for r in spark.sql("SELECT * FROM t_ssoj").collect()
        }
    finally:
        q.stop()
    assert (100, 10) in got          # matched pair
    assert (101, None) in got        # unmatched purchase flushed as outer


def test_available_now_catch_up_and_resume(spark, tmp_path):
    """AvailableNow: first run drains existing files and stops; a restart
    with the same checkpoint processes ONLY files added in between."""
    import pandas as pd

    from etl_job_applify_spark.streaming.jobs import (
        run_available_now_to_parquet,
    )

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    pd.DataFrame({"id": [1, 2]}).to_parquet(src / "a.parquet")
    stream = spark.readStream.schema("id bigint").parquet(str(src))

    run_available_now_to_parquet(stream, str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == 2

    pd.DataFrame({"id": [3]}).to_parquet(src / "b.parquet")
    run_available_now_to_parquet(stream, str(out), str(ckpt))
    back = spark.read.parquet(str(out))
    assert back.count() == 3  # a.parquet not reprocessed
    assert {r["id"] for r in back.collect()} == {1, 2, 3}


def test_rollup_maintenance_stream_matches_batch_agg(spark, tmp_path):
    """Two checkpointed AvailableNow passes over a growing source keep
    the versioned rollup equal to the batch aggregate of everything
    seen; a replayed epoch is a no-op (exactly-once fold fencing)."""
    import time as _time

    import pandas as pd

    from etl_job_applify_spark.operators.incremental import rollup_readout
    from etl_job_applify_spark.sinks import read_table
    from etl_job_applify_spark.streaming.jobs import fold_rollup_batch

    src = tmp_path / "roll_src"
    src.mkdir()
    rollup = str(tmp_path / "rollup")
    keys, measures = ["grp"], {"amt": "amount"}
    pd.DataFrame({"grp": ["a", "a", "b"], "amount": [1.0, 2.0, 3.0]}) \
        .to_parquet(src / "a.parquet")

    stream = spark.readStream.schema("grp string, amount double") \
        .parquet(str(src))
    q = stream.writeStream.foreachBatch(
        lambda df, eid: fold_rollup_batch(df, eid, rollup, keys, measures)
    ).option("checkpointLocation", str(tmp_path / "cp")).start()
    q.processAllAvailable(); q.stop()

    view = {r["grp"]: (r["amt_total"], r["n_rows"])
            for r in rollup_readout(read_table(spark, rollup), measures).collect()}
    assert view == {"a": (3.0, 2), "b": (3.0, 1)}

    # replaying the same epoch id must be a no-op
    replay = spark.createDataFrame([("a", 99.0)], "grp string, amount double")
    assert fold_rollup_batch(replay, 0, rollup, keys, measures) is False
    view2 = {r["grp"]: (r["amt_total"], r["n_rows"])
             for r in rollup_readout(read_table(spark, rollup), measures).collect()}
    assert view2 == view

    # a new epoch folds incrementally
    _time.sleep(1.1)
    pd.DataFrame({"grp": ["b"], "amount": [7.0]}).to_parquet(src / "b.parquet")
    q = spark.readStream.schema("grp string, amount double").parquet(str(src)) \
        .writeStream.foreachBatch(
            lambda df, eid: fold_rollup_batch(df, eid, rollup, keys, measures)
        ).option("checkpointLocation", str(tmp_path / "cp")).start()
    q.processAllAvailable(); q.stop()
    view3 = {r["grp"]: (r["amt_total"], r["n_rows"])
             for r in rollup_readout(read_table(spark, rollup), measures).collect()}
    assert view3 == {"a": (3.0, 2), "b": (10.0, 2)}


def test_fold_rollup_batch_survives_commit_race(spark, tmp_path):
    """Two folders race distinct epochs against the same rollup table:
    the CAS loser must retry against the winner's head, so BOTH deltas
    land exactly once (sum reflects each epoch once)."""
    from concurrent.futures import ThreadPoolExecutor

    from etl_job_applify_spark.operators.incremental import rollup_readout
    from etl_job_applify_spark.sinks import read_table
    from etl_job_applify_spark.streaming.jobs import fold_rollup_batch

    rollup = str(tmp_path / "race_rollup")
    keys, measures = ["grp"], {"amt": "amount"}
    b1 = spark.createDataFrame([("a", 10.0)], "grp string, amount double")
    b2 = spark.createDataFrame([("a", 1.0), ("b", 5.0)],
                               "grp string, amount double")

    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(fold_rollup_batch, b1, 0, rollup, keys, measures)
        f2 = ex.submit(fold_rollup_batch, b2, 1, rollup, keys, measures)
        assert f1.result(120) is True and f2.result(120) is True

    view = {r["grp"]: (r["amt_total"], r["n_rows"])
            for r in rollup_readout(read_table(spark, rollup), measures).collect()}
    assert view == {"a": (11.0, 2), "b": (5.0, 1)}


def test_streaming_anomalies_bit_exact_with_batch(spark):
    """The stateful rolling z-score stream must reproduce the
    oracle-checked batch query q163 EXACTLY — same rows, same doubles to
    the last bit (the Decimal-replay idiom in streaming_anomalies)."""
    import struct

    from etl_job_applify_spark.queries.timeseries import q163_rolling_zscore
    from etl_job_applify_spark.streaming import (
        events_stream,
        run_available_now_to_memory,
    )
    from etl_job_applify_spark.streaming.jobs import streaming_anomalies

    got = run_available_now_to_memory(
        streaming_anomalies(events_stream(spark, SF_SMOKE)),
        "t_anom",
        output_mode="append",
    ).collect()
    want = q163_rolling_zscore(spark, SF_SMOKE).collect()

    def norm(rows):
        def bits(x):
            return None if x is None else struct.pack("<d", x).hex()

        return sorted(
            (
                r["user_id"],
                r["event_id"],
                bits(r["value"]),
                bits(r["roll_mean"]),
                bits(r["z"]),
                r["anomaly"],
            )
            for r in rows
        )

    assert len(got) == len(want) > 0
    assert norm(got) == norm(want)


def test_streaming_anomalies_frame_one_keeps_empty_state(spark):
    """frame=1 regression: buf[-0:] is the WHOLE list, so per-key state
    grew with the stream instead of staying O(frame). With the fix the
    carried buffer is empty and each row's window is just itself (mean
    = value, z undefined)."""
    from etl_job_applify_spark.streaming import (
        events_stream,
        run_available_now_to_memory,
    )
    from etl_job_applify_spark.streaming.jobs import streaming_anomalies

    got = run_available_now_to_memory(
        streaming_anomalies(events_stream(spark, SF_SMOKE), frame=1),
        "t_anom_f1",
        output_mode="append",
    ).collect()
    assert len(got) > 0
    for r in got:
        assert r["roll_mean"] == r["value"]
        # a single-value window can never flag: z is undefined (var=0)
        # or exactly 0 when decimal quantization leaves var > 0
        assert r["z"] in (None, 0.0) and r["anomaly"] in (None, False)


def test_scd2_stream_builds_dimension_and_is_idempotent(spark, tmp_path):
    """foreachBatch SCD2 maintenance: the streamed dimension must match
    a direct scd2_apply of the same change set, and re-running the
    stream over the same input must be a no-op (redelivery safety)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_job_applify_spark.streaming.jobs import run_scd2_stream

    src = str(tmp_path / "changes")
    rows = [
        (1, "a", 10.0, dt.datetime(2024, 1, 1)),
        (2, "b", 20.0, dt.datetime(2024, 1, 1)),
        (1, "a", 11.0, dt.datetime(2024, 1, 2)),  # change for k=1
        (3, "c", 30.0, dt.datetime(2024, 1, 2)),  # new key
    ]
    schema = "k long, name string, price double, ts timestamp"
    spark.createDataFrame(rows, schema).write.parquet(src)
    table = str(tmp_path / "dim")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        run_scd2_stream(stream, table, ["k"], ["name", "price"], "ts")

    run_once()
    from etl_job_applify_spark.sinks import read_table

    dim1 = {
        (r["k"], r["is_current"]): r["price"]
        for r in read_table(spark, table).collect()
    }
    # single-batch fold: last change per key wins, no history rows
    assert dim1 == {(1, True): 11.0, (2, True): 20.0, (3, True): 30.0}
    # a second batch with one change and redelivered no-ops
    more = [
        (1, "a", 11.0, dt.datetime(2024, 1, 3)),  # redelivery (no-op)
        (2, "b", 25.0, dt.datetime(2024, 1, 3)),  # change
    ]
    spark.createDataFrame(more, schema).write.mode("append").parquet(src)
    run_once()
    rows2 = read_table(spark, table).collect()
    cur = {r["k"]: r["price"] for r in rows2 if r["is_current"]}
    hist = {r["k"]: r["price"] for r in rows2 if not r["is_current"]}
    assert cur == {1: 11.0, 2: 25.0, 3: 30.0}
    assert hist == {2: 20.0}  # only k=2 was versioned; k=1 was a no-op


def test_quarantine_stream_routes_bad_rows(spark, tmp_path):
    """Streaming DLQ: rows failing the contract's casts land in the
    quarantine sink with blame; clean rows land in the target — and the
    split agrees with the batch quarantine op on the same data."""
    from etl_job_applify_spark.streaming.jobs import run_quarantine_stream
    from etl_job_applify_spark.transform.contract import (
        apply_with_quarantine,
    )

    src = str(tmp_path / "in")
    rows = [("1", "2024-01-01"), ("x", "2024-01-02"), ("3", "oops")]
    spark.createDataFrame(rows, "amount string, day string").write.parquet(src)
    contract = {
        "columns": [
            {"source": "amount", "name": "amount", "type": "int"},
            {"source": "day", "name": "day", "type": "date",
             "format": "yyyy-MM-dd"},
        ]
    }
    good_p, bad_p = str(tmp_path / "good"), str(tmp_path / "bad")
    stream = spark.readStream.schema("amount string, day string").parquet(src)
    run_quarantine_stream(stream, contract, good_p, bad_p)

    good = spark.read.parquet(good_p).collect()
    bad = spark.read.parquet(bad_p).collect()
    assert len(good) == 1 and good[0]["amount"] == 1
    blames = {str(r["__bad_columns"]) for r in bad}
    assert blames == {"amount", "day"}
    # agrees with the batch op
    g2, b2 = apply_with_quarantine(spark.read.parquet(src), contract)
    assert g2.count() == 1 and b2.count() == 2


def test_dynamic_gap_sessions_split_more_than_long_gap(spark):
    """Per-row gap sessionization: with browse gap 15 min < the fixed
    30 min, the dynamic sessions must be at least as numerous as the
    fixed-gap ones, and every event lands in exactly one session."""
    from etl_job_applify_spark.streaming.jobs import (
        session_aggregates,
        session_aggregates_dynamic_gap,
    )

    fixed = run_available_now_to_memory(
        session_aggregates(events_stream(spark, SF_SMOKE), gap="30 minutes"),
        "dg_fixed",
    ).collect()
    dyn = run_available_now_to_memory(
        session_aggregates_dynamic_gap(events_stream(spark, SF_SMOKE)),
        "dg_dyn",
    ).collect()
    assert len(dyn) >= len(fixed) > 0
    assert sum(r["n_events"] for r in dyn) == sum(
        r["n_events"] for r in fixed
    )


def test_distinct_sketch_view_matches_oneshot_sketch(spark, tmp_path):
    """The streaming HLL distinct view folded across micro-batches must
    equal a one-shot sketch over everything seen (hll_union_agg is a
    register-wise max — associative, so batch boundaries are invisible),
    and replays must be no-ops."""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from etl_job_applify_spark.sinks import read_table
    from etl_job_applify_spark.streaming.jobs import (
        distinct_view_readout,
        fold_distinct_sketch_batch,
        run_distinct_view_stream,
    )

    src = tmp_path / "dv_src"
    src.mkdir()
    view_path = str(tmp_path / "dv_view")
    pd.DataFrame({"grp": ["a"] * 4 + ["b"] * 2,
                  "uid": [1, 2, 2, 3, 7, 7]}).to_parquet(src / "a.parquet")

    ckpt = str(tmp_path / "dv_cp")
    stream = spark.readStream.schema("grp string, uid bigint").parquet(str(src))
    run_distinct_view_stream(stream, view_path, ["grp"], "uid", ckpt)

    def view_now():
        return {
            r["grp"]: (r["approx_distinct"], r["n_rows"])
            for r in distinct_view_readout(
                read_table(spark, view_path), ["grp"]
            ).collect()
        }

    v1 = view_now()
    assert v1["a"] == (3, 4) and v1["b"] == (1, 2)

    # replayed epoch: no-op
    replay = spark.createDataFrame([("a", 999)], "grp string, uid bigint")
    assert fold_distinct_sketch_batch(
        replay, 0, view_path, ["grp"], "uid"
    ) is False
    assert view_now() == v1

    # second batch folds; folded estimate == one-shot sketch over union
    _time.sleep(1.1)
    pd.DataFrame({"grp": ["a", "b", "b"], "uid": [9, 8, 7]}) \
        .to_parquet(src / "b.parquet")
    run_distinct_view_stream(
        spark.readStream.schema("grp string, uid bigint").parquet(str(src)),
        view_path, ["grp"], "uid", ckpt,
    )
    v2 = view_now()
    allrows = spark.read.parquet(str(src))
    oneshot = {
        r["grp"]: r["d"]
        for r in allrows.groupBy("grp").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("d")
        ).collect()
    }
    assert {k: v[0] for k, v in v2.items()} == oneshot
    assert v2["a"][1] == 5 and v2["b"][1] == 4


def test_fold_distinct_sketch_batch_survives_commit_race(spark, tmp_path):
    """Two sketch folders race distinct epochs against the same view:
    the CAS loser retries against the winner's head, so both batches'
    distinct sets land exactly once."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from etl_job_applify_spark.sinks import read_table
    from etl_job_applify_spark.streaming.jobs import (
        distinct_view_readout,
        fold_distinct_sketch_batch,
    )

    view = str(tmp_path / "race_view")
    b1 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "grp string, uid bigint"
    )
    b2 = spark.createDataFrame(
        [("a", 2), ("a", 3), ("b", 5)], "grp string, uid bigint"
    )
    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(fold_distinct_sketch_batch, b1, 0, view, ["grp"], "uid")
        f2 = ex.submit(fold_distinct_sketch_batch, b2, 1, view, ["grp"], "uid")
        assert f1.result(120) is True and f2.result(120) is True
    got = {
        r["grp"]: (r["approx_distinct"], r["n_rows"])
        for r in distinct_view_readout(
            read_table(spark, view), ["grp"]
        ).collect()
    }
    assert got == {"a": (3, 4), "b": (1, 2)}


def test_streaming_capped_sessions_matches_batch(spark):
    """The stateful capped-session stream must reproduce the batch
    kernel's assignment exactly (single micro-batch replay)."""
    from etl_job_applify_spark.operators.sessionize import capped_sessions
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.queries.temporal import (
        _Q226_CAP_S,
        _Q226_GAP_S,
    )
    from etl_job_applify_spark.streaming import (
        events_stream,
        run_available_now_to_memory,
    )
    from etl_job_applify_spark.streaming.jobs import streaming_capped_sessions

    got = {
        (r.user_id, r.event_id, r.session_id)
        for r in run_available_now_to_memory(
            streaming_capped_sessions(
                events_stream(spark, SF_SMOKE), _Q226_GAP_S, _Q226_CAP_S
            ),
            "t_capped",
            output_mode="append",
        ).collect()
    }
    want = {
        (r.user_id, r.event_id, r.session_id)
        for r in capped_sessions(
            tbl(spark, SF_SMOKE, "events").select("user_id", "event_id", "ts"),
            ["user_id"],
            "ts",
            _Q226_GAP_S,
            _Q226_CAP_S,
            order_tiebreak=["event_id"],
        ).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_capped_sessions_state_spans_micro_batches(
    spark, tmp_path
):
    """Two time-ordered micro-batches: sessions that STRADDLE the batch
    boundary must continue (state carries sid/start/prev), matching the
    batch kernel over the union."""
    import time as _time

    from pyspark.sql import functions as F

    from etl_job_applify_spark.operators.sessionize import capped_sessions
    from etl_job_applify_spark.queries._util import tbl
    from etl_job_applify_spark.queries.temporal import (
        _Q226_CAP_S,
        _Q226_GAP_S,
    )
    from etl_job_applify_spark.sources.readers import normalize_events_ts
    from etl_job_applify_spark.streaming.jobs import (
        run_available_now_to_memory,
        streaming_capped_sessions,
    )

    events = tbl(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts"
    )
    cut = events.agg(
        F.expr("percentile(unix_micros(ts), 0.5e0)").alias("m")
    ).collect()[0]["m"]
    src = tmp_path / "capped_src"
    events.filter(F.unix_micros("ts") <= cut).coalesce(1).write.parquet(
        str(src / "a=0")
    )
    _time.sleep(1.1)  # file-source ordering is modification-time based
    events.filter(F.unix_micros("ts") > cut).coalesce(1).write.parquet(
        str(src / "a=1")
    )
    schema = spark.read.parquet(str(src / "a=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    got = {
        (r.user_id, r.event_id, r.session_id)
        for r in run_available_now_to_memory(
            streaming_capped_sessions(stream, _Q226_GAP_S, _Q226_CAP_S),
            "t_capped2",
            output_mode="append",
        ).collect()
    }
    want = {
        (r.user_id, r.event_id, r.session_id)
        for r in capped_sessions(
            events, ["user_id"], "ts", _Q226_GAP_S, _Q226_CAP_S,
            order_tiebreak=["event_id"],
        ).collect()
    }
    assert got == want and len(got) > 0
