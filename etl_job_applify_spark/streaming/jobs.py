"""Structured Streaming jobs over the events stream (SURVEY §2b:
streaming — ABSENT in the batch-only reference).

Each job is the streaming twin of an oracle-checked batch query in
queries/temporal.py (same logical window spec), so correctness is anchored
batch-side while these add the streaming-only semantics: watermarks for
late data, append/update output modes, incremental state.

In production the source is Kafka (``readStream.format("kafka")``); here
the file source replays the fixture parquet, which exercises the identical
logical plan. State stores scale horizontally: windowed aggregations
shuffle on (window, keys), session windows on the session key — watermarks
bound state size, which is what makes 100 TB/day streams sustainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation

def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stream the events fixture with ``ts`` normalized to TimestampType.

    Streaming sources can't infer schemas, and the declared schema must
    match the file encoding, which has differed across fixture generations
    (TIMESTAMP(NANOS) read as raw long vs native micros TIMESTAMP_NTZ) —
    so probe the footer with a cheap batch read and declare what the file
    actually contains, then convert ``ts`` through the same helper as the
    batch loader (same instants; the session is pinned UTC).
    """
    from ..session import prepare_session
    from ..sources.readers import normalize_events_ts

    prepare_session(spark)
    file_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source wants a directory: stream the fixture dir with
    # a glob pinned to the events file
    reader = (
        spark.readStream.schema(file_schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_events_ts(reader.parquet(sf_dir))


#: exact streaming sum (same idiom as queries/_util.DSUM): DECIMAL
#: accumulation is associative, so incremental state merges produce the
#: SAME bits as the batch twin's one-shot aggregation — which is what
#: lets tests assert stream == batch EXACTLY instead of approximately
_EXACT_TOTAL = "CAST(SUM(CAST((value) AS DECIMAL(28,6))) AS DOUBLE)"


def tumbling_counts(
    events: DataFrame, size: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling windows + watermark: late events beyond the watermark are
    dropped and window state is evicted — bounded state forever."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.expr(_EXACT_TOTAL).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def sliding_counts(
    events: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.expr(_EXACT_TOTAL).alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native session windows: state merges windows within ``gap`` per
    user; watermark closes (finalizes) sessions — the streaming equivalent
    of operators/sessionize.py.

    Boundary semantics vs the batch sessionizer: ``session_window``
    starts a NEW session when the inter-event gap is >= ``gap``;
    operators/sessionize.py splits strictly on > gap. The two differ
    only for events spaced EXACTLY ``gap`` apart (sub-second fixture
    timestamps make that measure-zero; the equivalence test would catch
    a fixture that hits it)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(_EXACT_TOTAL).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming query over the available batch synchronously and
    return the materialized result (local smoke-test harness: memory sink +
    processAllAvailable)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def run_available_now_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming query to completion under Trigger.AvailableNow
    and return the materialized result.

    AvailableNow is the production batch-catch-up trigger (process
    everything present, then STOP — unlike processAllAvailable, which is
    a test-only blocking call on a still-running query). Complete output
    mode emits every window, including those a watermark hasn't closed,
    which is what batch-equivalence asserts need."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def stream_static_enrich(
    events: DataFrame, customers: DataFrame
) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (broadcast)
    static dimension — no state store involved; the standard pattern for
    enriching a 100 TB/day stream with slowly-changing dims."""
    return events.join(
        F.broadcast(customers.select("c_custkey", "c_mktsegment")),
        events.user_id == F.col("c_custkey"),
        "inner",
    ).drop("c_custkey")


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total across micro-batches. State is one
    row per user (bounded by |users|, not |events|); a production job adds
    a timeout to expire idle users."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: "GroupState"):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transform_with_state_user_totals(events: DataFrame) -> DataFrame:
    """The same per-user running totals as ``stateful_user_totals``, on
    the Spark 4 ``transformWithStateInPandas`` API: typed state variables
    (ValueState here; ListState/MapState/timers available) on the RocksDB
    state store instead of the single implicit state row of
    ``applyInPandasWithState``. Requires
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider at query start (the caller sets it; the
    bundled RocksDB provider is the production choice anyway — state
    spills to disk instead of executor heap, which is what bounds memory
    when keyspace is |users| at 100 TB/day).

    Environment gate: the TWS state-server protocol needs
    ``google.protobuf`` in the Python workers; raises ImportError with a
    clear message where it's unavailable (this container), in which case
    ``stateful_user_totals`` is the drop-in fallback on the same
    output schema."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark's TWS state-server protocol); use "
            "stateful_user_totals (applyInPandasWithState) instead"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [
                    StructField("n", LongType()),
                    StructField("total", DoubleType()),
                ]
            )
            self._totals = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        UserTotals(),
        outputStructType=(
            "user_id bigint, n_events bigint, total_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def run_available_now_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint: str
) -> None:
    """Batch-style catch-up: ``Trigger.AvailableNow`` processes everything
    available at start (respecting ``maxFilesPerTrigger`` backpressure,
    unlike the deprecated ``Trigger.Once``) and then STOPS — the scheduled
    re-run pattern (cron'd incremental jobs with streaming semantics:
    exactly-once sink commits + checkpointed source offsets, no always-on
    cluster). Restarting later resumes from the checkpoint and processes
    only new files."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_to_parquet(stream_df: DataFrame, out_dir: str) -> None:
    """Exactly-once-style sink via foreachBatch: each micro-batch lands as
    parquet (idempotent overwrite per epoch id in real jobs)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = stream_df.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def deduped_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup by event id: dropDuplicatesWithinWatermark
    keeps id state only until the watermark passes — bounded state, which
    plain dropDuplicates on a stream can't guarantee (its state grows with
    every id ever seen)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_interval_join(
    purchases: DataFrame,
    views: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join: purchase ⋈ preceding view by the same
    user within ``max_gap``. Both sides buffer state; the watermarks plus
    the interval condition bound how long each side's rows are retained —
    without the time bound the state would grow forever.

    ``watermark`` is the LATENESS tolerance (independent of the join
    interval): how far behind the stream's max event time a row may
    arrive and still join. It defaults to ``max_gap`` — the floor below
    which in-interval matches would be lost — and should be set larger
    when the transport can delay events beyond the interval itself.

    ``how="leftOuter"`` additionally emits unmatched purchases (NULL view
    columns) — but only once the views watermark has passed the end of
    the purchase's join interval, because until then a matching view
    could still arrive. Outer results are therefore delayed by the
    watermark, not wrong; a no-data microbatch flushes them when input
    stops (Spark runs one automatically to finalize event-time state)."""
    wm = watermark or max_gap
    p = purchases.withWatermark("p_ts", wm)
    v = views.withWatermark("v_ts", wm)
    return p.join(
        v,
        F.expr(
            f"p_user = v_user AND v_ts BETWEEN p_ts - INTERVAL {max_gap} AND p_ts"
        ),
        how,
    )


def _upsert_snapshots(spark, target_path: str):
    """Committed snapshots of a CDC target — the shared versioned-table
    protocol (sinks/versioned.py): a snapshot counts only once its
    ``_SUCCESS`` marker exists, so half-written dirs are invisible."""
    from ..sinks.versioned import _snapshots

    return _snapshots(spark, target_path)


def read_upsert_target(spark, target_path: str) -> DataFrame:
    """Read the current committed snapshot of a ``run_foreach_batch_upsert``
    target (alias for the versioned-table reader; pass ``version=`` there
    to time-travel CDC history when pruning retains more than one)."""
    from ..sinks.versioned import read_table

    return read_table(spark, target_path)


def run_foreach_batch_upsert(
    stream_df: DataFrame, target_path: str, keys: list[str], version_col: str
) -> None:
    """CDC sink: every micro-batch MERGEs into a parquet target via the
    relational upsert (anti-join + union).

    Crash-safe snapshot layout: the target is a directory of versioned
    snapshots ``snap_00000001, snap_00000002, ...``; each batch writes the
    merged table to a NEW snapshot dir and the live version is resolved as
    the highest-numbered dir whose ``_SUCCESS`` marker committed. A crash
    mid-write leaves an uncommitted dir that readers ignore and the next
    run overwrites nothing — the previous snapshot stays intact (unlike an
    in-place ``mode("overwrite")`` rewrite, which truncates the target if
    the job dies mid-rewrite). Older snapshots are pruned only AFTER the
    new one commits, so the recovery source always exists. Production
    targets a transactional format (Delta/Iceberg MERGE) — the merge logic
    and the commit-then-prune discipline are identical; read with
    ``read_upsert_target``."""
    from ..sinks.upsert import upsert as _upsert
    from ..sinks.versioned import write_version

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        _, _, names = _upsert_snapshots(spark, target_path)
        if names:
            current = spark.read.parquet(f"{target_path}/{names[-1]}")
            merged = _upsert(current, batch_df, keys=keys, version_col=version_col)
        else:
            merged = batch_df
        # distributed write via the shared versioned-table protocol:
        # publish-then-prune (retain=1 keeps only the fresh commit; a
        # crash mid-write leaves the previous snapshot intact)
        write_version(merged, target_path, retain=1)

    q = stream_df.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_incremental_dedup_stream(
    docs_stream: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int = 64,
    compact_every: int | None = None,
    compact_max_files: int | None = None,
    exactly_once: bool = False,
    writer_id: str = "dedup",
) -> None:
    """The LLM pipeline's steady state as one streaming job: every
    micro-batch of crawled documents is probed for near-dups against the
    persisted MinHash index of ALL previously-seen documents
    (dedup/incremental.py), then ingested — found pairs append to a
    result table and the batch's band entries append to the index, so
    batch N+1 dedups against batches 1..N with no recomputation of
    history.

    Layout under ``state_dir``: ``index/`` (band-partitioned bucket
    entries), ``corpus/`` (ingested docs — the text store the exact
    verification joins against; in production this is the lake table the
    crawl lands in anyway), ``pairs/`` (detected near-dup pairs, with a
    ``batch_id`` column for lineage).

    Delivery contract: foreachBatch is at-least-once. Default mode
    (``exactly_once=False``) ingests with plain parquet appends — a
    crash between the pairs append and the index append can replay a
    batch, producing duplicate pair rows (dedupable by (a, b)) and
    duplicate index entries (harmless: probes dedup candidates).
    ``exactly_once=True`` lowers ALL THREE appends (pairs, corpus,
    index) onto the versioned/CAS protocol with per-table epoch
    fencing: every committed snapshot carries an
    ``_epoch_<writer_id>_<epoch>`` marker INSIDE it (atomic with the
    commit, the fold_rollup_batch discipline), and a redelivered batch
    finds its marker and skips per table — so any crash point replays
    to exactly the state a crash-free run produces (replay-invariance
    is test-pinned, including the founding batch's crash window, where
    the index carries the epoch mark but the pairs log must NOT gain
    retroactive intra-batch pairs). This mode is also object-store
    capable end to end: log-table appends and the index's versioned
    compaction never rename live data.

    ``compact_every``: run ``optimize_index`` (bin compaction) after
    every N ingested batches, bounding the index file count at
    steady state — without it a daily-cadence stream grows one per-band
    file set per batch forever (small-file rot on the most-probed table
    in the pipeline). Compaction is idempotent, so an at-least-once
    replay that re-triggers it is harmless.

    ``compact_max_files``: the STATE-based policy twin (the dedup
    family's analogue of the vector ingest's ``reindex_skew_threshold``
    loop) — after each committed ingest, the live index data-file count
    (``minhash_index_stats``'s ``data_files`` signal, via the Hadoop FS
    API) above this threshold triggers ``optimize_index`` at the epoch
    boundary; the post-compaction count drops back under it. Robust
    where epoch ids restart (a new checkpoint dir breaks a pure
    cadence); both triggers compose, either alone suffices. File
    pressure is the dedup signal with a SAFE automatic action —
    compaction never changes probe results; ``max_bucket`` pressure is
    policy-handled at probe time by the ``max_bucket_size`` cap (see
    SCALING.md on why an index-side re-banding stays manual).
    """
    import os

    from ..dedup import (
        is_versioned_index,
        minhash_index_build,
        minhash_index_probe,
        optimize_index,
        versioned_index_has_epoch,
    )

    index_dir = os.path.join(state_dir, "index")
    corpus_dir = os.path.join(state_dir, "corpus")
    pairs_dir = os.path.join(state_dir, "pairs")

    def _maybe_compact(spark, epoch_id: int) -> None:
        """Cadence OR file-pressure compaction at the epoch boundary;
        both paths are idempotent under at-least-once redelivery."""
        if (
            compact_every
            and epoch_id > 0
            and (epoch_id + 1) % compact_every == 0
        ):
            optimize_index(spark, index_dir)
            return
        if compact_max_files is not None:
            from ..sinks.versioned import fs_count_data_files

            if fs_count_data_files(spark, index_dir) > compact_max_files:
                optimize_index(spark, index_dir)

    def sink_exactly_once(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark import StorageLevel

        from ..sinks.versioned import (
            append_log_version,
            log_has_mark,
            read_log_table,
        )

        spark = batch_df.sparkSession
        mark = f"_epoch_{writer_id}_{epoch_id}"
        batch = batch_df.select(id_col, text_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            if is_versioned_index(spark, index_dir):
                # pairs first (so a crash can never leave pairs without
                # their index entries' epoch having a retry path), and
                # only if neither the pairs log NOR the index carries
                # this epoch: an index-side mark without a pairs-side
                # one is the FOUNDING batch's crash window, whose
                # contract is "no pairs" — probing the batch against an
                # index already containing it would invent intra-batch
                # pairs a crash-free run never records.
                if not log_has_mark(
                    spark, pairs_dir, mark
                ) and not versioned_index_has_epoch(spark, index_dir, mark):
                    try:
                        history = read_log_table(spark, corpus_dir)
                    except FileNotFoundError:
                        history = batch.limit(0)
                    pairs = minhash_index_probe(
                        spark,
                        index_dir,
                        batch,
                        history,
                        id_col,
                        text_col,
                        threshold=threshold,
                        max_bucket_size=max_bucket_size,
                    )
                    append_log_version(
                        pairs.withColumn("batch_id", F.lit(epoch_id)),
                        pairs_dir,
                        [mark],
                    )
                append_log_version(batch, corpus_dir, [mark])
                minhash_index_build(
                    batch,
                    index_dir,
                    id_col,
                    text_col,
                    num_hashes=num_hashes,
                    bands=bands,
                    mode="append",
                    epoch_mark=mark,
                )
            else:
                # founding: the epoch mark rides the founding snapshot,
                # so a replay of this batch is fenced at every table
                minhash_index_build(
                    batch,
                    index_dir,
                    id_col,
                    text_col,
                    num_hashes=num_hashes,
                    bands=bands,
                    layout="versioned",
                    epoch_mark=mark,
                )
                append_log_version(batch, corpus_dir, [mark])
            _maybe_compact(spark, epoch_id)  # CAS path, idempotent
        finally:
            batch.unpersist()

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col)
        from pyspark import StorageLevel

        batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # a crash inside a compaction swap must not look like "no
            # index yet" — the overwrite first-batch branch would then
            # silently discard all history
            from ..dedup.incremental import _recover_index

            _recover_index(index_dir)
            if os.path.exists(os.path.join(index_dir, "_index_meta.json")):
                history = spark.read.parquet(corpus_dir)
                pairs = minhash_index_probe(
                    spark,
                    index_dir,
                    batch,
                    history,
                    id_col,
                    text_col,
                    threshold=threshold,
                    max_bucket_size=max_bucket_size,
                )
                pairs.withColumn("batch_id", F.lit(epoch_id)).write.mode(
                    "append"
                ).parquet(pairs_dir)
                mode = "append"
            else:
                mode = "overwrite"  # first batch founds the index
            batch.write.mode("append").parquet(corpus_dir)
            minhash_index_build(
                batch,
                index_dir,
                id_col,
                text_col,
                num_hashes=num_hashes,
                bands=bands,
                mode=mode,
                layout="flat",  # this sink IS the flat-layout ingest
            )
            _maybe_compact(spark, epoch_id)
        finally:
            batch.unpersist()

    q = docs_stream.writeStream.foreachBatch(
        sink_exactly_once if exactly_once else sink
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_vector_index_ingest_stream(
    vec_stream: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    m: int = 0,
    k_codes: int = 16,
    compact_every: int | None = None,
    writer_id: str = "vecidx",
    centroids=None,
    max_snapshots: int | None = None,
    reindex_skew_threshold: float | None = None,
    reindex_min_vecs: int = 0,
    shadow_queries: DataFrame | None = None,
    recall_target: float | None = None,
    recall_k: int = 5,
    recall_nprobe: int = 2,
    op_col: str | None = None,
) -> None:
    """Streaming ingest into the persisted vector index
    (similarity/vector_index.py): every micro-batch of embeddings is
    assigned + (optionally PQ-)encoded with the index's RECORDED
    quantizer and CAS-appended as one snapshot — the embedding-side
    twin of ``run_incremental_dedup_stream``'s exactly-once mode.

    Delivery contract: foreachBatch is at-least-once; every commit
    carries an ``_epoch_<writer_id>_<epoch>`` marker INSIDE the
    snapshot (atomic with the CAS rename), so a redelivered batch finds
    its marker and skips — replays commit nothing (replay-invariance
    test-pinned). The founding batch trains the quantizer unless
    ``centroids`` pins it externally; production should pass a
    bootstrap-sample-trained quantizer rather than trusting batch 0 to
    be representative (the quantizer is immutable after founding).

    ``compact_every``: fold snapshots through the CAS watermark every N
    batches, bounding file count at steady state; compaction is
    idempotent under replay. ``max_snapshots``: the state-based twin —
    compact whenever the LIVE snapshot count exceeds the threshold
    (robust where epoch ids restart, e.g. a new checkpoint dir); both
    triggers compose, either alone suffices.

    ``reindex_skew_threshold``: the POLICY LOOP on the cell-skew signal
    ``vector_index_stats`` exposes (probe latency is bounded by the
    hottest probed cell, so ``max_cell / avg_cell`` drifting upward is
    the operational reindex trigger — corpus drift away from the
    immutable founding quantizer). After each committed append the
    ingest computes the live cell histogram (one narrow aggregate over
    the cells relation); skew above the threshold triggers
    ``reindex_vector_index`` at the epoch boundary — retrain on the
    CURRENT live corpus, re-assign, CAS-publish (also a compaction).
    ``reindex_min_vecs`` gates the trigger until the live corpus is
    large enough for a meaningful retrain (early epochs are noisy).
    Replay-safe: a redelivered epoch's append is fenced to a no-op and
    the post-reindex histogram is balanced, so the trigger does not
    re-fire. Note the threshold is a steady-state contract: data whose
    true distribution k-means cannot balance will re-trigger every
    epoch — pick the threshold from the post-reindex skew this corpus
    actually achieves (observable via ``vector_index_stats``).

    ``shadow_queries`` + ``recall_target``: the QUALITY policy loop —
    the skew loop acts on a cost signal; this one watches what the
    user actually experiences. After each committed append, the fixed
    control-plane shadow batch (``query_id``, ``embedding`` — the
    ``vector_index_probe`` contract) is served twice: once at the
    monitored serving config (``recall_k``/``recall_nprobe``) and once
    exactly (``nprobe = num_cells``, the documented brute-force
    degeneration); recall@k = |served ∩ exact| / |exact|. Below
    ``recall_target`` the loop triggers ``reindex_vector_index`` —
    corpus drift away from the immutable founding quantizer splits
    true neighbor sets across unprobed cells, and a retrain on the
    CURRENT live corpus gives the drifted region its own cells (the
    planted-drift test pins trigger + post-action recovery). Cost per
    epoch: one pruned probe + one exact scan over the live corpus for
    a trickle-sized batch — production deployments sample epochs; the
    action is SAFE-by-scope (a reindex never changes exact results,
    only cell shapes).

    ``op_col``: CDC mode — batches mix adds and deletes (``op_col ==
    'delete'``), each applied as ONE atomic CAS snapshot
    (``vector_index_apply_cdc`` — tombstones + encoded adds + net
    count + epoch fence ride the same commit), mirroring the text
    index's CDC contract: whole-source replays are invariant and
    delete+re-add in one batch lands as the re-add. The founding
    batch uses its adds only (a delete in batch 0 targets nothing);
    ``max_snapshots`` keeps triggering state-based compaction."""
    from ..similarity import (
        optimize_vector_index,
        reindex_vector_index,
        vector_index_build,
    )
    from ..similarity.vector_index import (
        _live_cells,
        _vxi_is_versioned,
        vector_index_apply_cdc,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            # an empty micro-batch must not found the index (training a
            # quantizer on zero rows raises) nor commit an empty append
            return
        spark = batch_df.sparkSession
        mark = f"_epoch_{writer_id}_{epoch_id}"
        if op_col is None:
            batch = batch_df.select(id_col, vec_col)
        else:
            # CDC mode: adds + deletes mixed; founding uses the adds
            # only (a delete in batch 0 targets nothing)
            batch = batch_df.select(id_col, vec_col, op_col)
        if _vxi_is_versioned(spark, index_dir):
            if op_col is not None:
                vector_index_apply_cdc(
                    batch, index_dir, id_col, vec_col, op_col,
                    epoch_mark=mark,
                )
                if max_snapshots is not None:
                    from ..similarity.vector_index import (
                        _vxi_recover_live,
                    )

                    if len(
                        _vxi_recover_live(spark, index_dir)
                    ) > max_snapshots:
                        optimize_vector_index(spark, index_dir)
            else:
                vector_index_build(
                    batch, index_dir, id_col, vec_col,
                    mode="append", epoch_mark=mark,
                    max_snapshots=max_snapshots,
                )
        else:
            # founding: the epoch mark rides the founding snapshot, so
            # a replay of batch 0 is fenced like any other
            adds = (
                batch
                if op_col is None
                else batch.filter(
                    F.coalesce(F.col(op_col), F.lit("add")) != "delete"
                ).select(id_col, vec_col)
            )
            if op_col is not None and adds.isEmpty():
                # a deletes-only batch before the index exists targets
                # nothing (documented CDC contract, mirrors the text
                # twin) — founding on zero adds would train the
                # quantizer on an empty relation
                return
            vector_index_build(
                adds, index_dir, id_col, vec_col,
                num_cells=num_cells, m=m, k_codes=k_codes,
                epoch_mark=mark, centroids=centroids,
            )
        if (
            compact_every
            and epoch_id > 0
            and (epoch_id + 1) % compact_every == 0
        ):
            optimize_vector_index(spark, index_dir)  # CAS, idempotent
        if reindex_skew_threshold:
            meta_now, _c, _b, _o, cells_now = _live_cells(
                spark, index_dir
            )
            agg = (
                cells_now.groupBy("cell")
                .agg(F.count("*").alias("n"))
                .agg(
                    F.sum("n").alias("total"), F.max("n").alias("mx")
                )
                .first()
            )
            total = int(agg["total"] or 0)
            avg = (
                total / meta_now["num_cells"]
                if meta_now["num_cells"]
                else 0.0
            )
            if (
                total >= reindex_min_vecs
                and avg > 0
                and int(agg["mx"] or 0) / avg > reindex_skew_threshold
            ):
                reindex_vector_index(spark, index_dir)
        if shadow_queries is not None and recall_target is not None:
            from ..similarity import vector_index_probe

            meta_now = _live_cells(spark, index_dir)[0]
            served = vector_index_probe(
                spark, index_dir, shadow_queries,
                k=recall_k, nprobe=recall_nprobe,
            )
            exact = vector_index_probe(
                spark, index_dir, shadow_queries,
                k=recall_k, nprobe=meta_now["num_cells"],
            )
            tot = exact.count()
            hit = exact.join(
                served.select("query_id", "neighbor"),
                ["query_id", "neighbor"],
                "left_semi",
            ).count()
            if tot and hit / tot < recall_target:
                reindex_vector_index(spark, index_dir)

    q = vec_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_text_index_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    meta_cols: list[str] | None = None,
    op_col: str | None = None,
    compact_every: int | None = None,
    max_snapshots: int | None = None,
    compact_tombstone_ratio: float | None = None,
    writer_id: str = "textidx",
) -> None:
    """Streaming ingest into the persisted inverted text index
    (functions/text_index.py): every micro-batch of documents is
    tokenized and CAS-appended as one versioned snapshot — the
    text-side twin of ``run_vector_index_ingest_stream``, completing
    the policy-loop triad across the three persisted index families.

    Delivery contract: foreachBatch is at-least-once; every batch's
    effects carry an ``_epoch_<writer_id>_<epoch>`` marker INSIDE the
    snapshot (atomic with the CAS commit), so a redelivered batch
    finds its marker and skips WHOLE — adds and deletes together,
    replays commit nothing. On the CDC path the batch's tombstones,
    appended postings, net stats increment, and the marker are ONE CAS
    snapshot (``text_index_apply_cdc``): there is no crash point
    between a delete and its epoch fence, so any replay — including a
    whole-source replay that redelivers a delete epoch after a later
    re-add — reproduces the crash-free state bit-for-bit. The fence
    also skips a batch when a HIGHER epoch mark for this writer is
    already recorded (epoch ids are monotone within a stream), which
    covers replayed epochs that originally committed nothing (a
    deletes-only batch delivered before the index was founded).

    ``op_col``: CDC-shaped input — rows whose ``op_col`` equals
    ``'delete'`` tombstone their ids out of the index; all other rows
    append. A delete+re-add of one id in the same batch lands as the
    re-add: the versioned layout's tombstones suppress only rows
    committed at a strictly LOWER version, and both ride the same
    snapshot. Without ``op_col`` every row appends. Deletes delivered
    before any add has founded the index are dropped (there is
    nothing to delete from).

    POLICY LOOPS — the signals ``text_index_stats`` exposes, wired to
    their one SAFE action (compaction, which never changes a score;
    contrast ``max_df`` stopword pressure, whose candidate actions all
    rewrite BM25 semantics and therefore stay operator-in-the-loop,
    see SCALING.md):

    - ``compact_every`` / ``max_snapshots``: cadence- and state-based
      snapshot-count triggers — per-batch appends grow the per-probe
      N-way snapshot union (``live_snapshots`` in the stats), and the
      trigger folds it back to 1. Snapshot count, not raw file count,
      is the text family's pressure signal: the versioned compaction
      bins each term bucket for rewrite parallelism, so its FILE count
      floor is buckets-shaped (at toy scale it can exceed a few
      appends' worth) while the probe-cost driver — snapshots unioned
      per scan — always returns to 1.
    - ``compact_tombstone_ratio``: pending tombstones / live docs
      above the ratio triggers compaction — delete pressure; the
      post-action tombstone count is 0 and probe scans stop paying the
      anti-join over reclaimed rows.

    All triggers compose; compaction is CAS-published and idempotent
    under replay."""
    from ..functions.text_index import (
        _tidx_epoch_done,
        _tidx_is_versioned,
        _tidx_read,
        _tidx_recover_live,
        optimize_text_index,
        text_index_apply_cdc,
        text_index_build,
    )

    def _pending_tombstones(spark) -> tuple[int, int]:
        """(n_tombstones, n_docs_live) from delete members + meta —
        control-plane listings, no postings scan."""
        from pyspark.sql.types import LongType, StructField, StructType

        from ..functions.text_index import _tidx_recover_live
        from ..sinks.versioned import snapshot_members

        live = _tidx_recover_live(spark, index_dir)
        del_paths = [
            f"{p}/deletes"
            for p in live
            if "deletes" in snapshot_members(spark, p)
        ]
        tombs = 0
        if del_paths:
            t_schema = StructType([StructField("doc", LongType())])
            tombs = (
                spark.read.schema(t_schema)
                .parquet(*del_paths)
                .select("doc")
                .distinct()
                .count()
            )
        meta = _tidx_read(spark, index_dir)[0]
        return tombs, int(meta["n_docs"])

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return  # an empty micro-batch must not found the index
        spark = batch_df.sparkSession
        mark = f"_epoch_{writer_id}_{epoch_id}"
        versioned = _tidx_is_versioned(spark, index_dir)
        if versioned and _tidx_epoch_done(
            spark, index_dir, writer_id, epoch_id
        ):
            return  # redelivered epoch: adds AND deletes already landed
        if op_col is not None and versioned:
            # the whole CDC batch (tombstones + adds + stats + mark)
            # is ONE CAS snapshot — atomic, replay-idempotent
            text_index_apply_cdc(
                batch_df,
                index_dir,
                id_col,
                text_col,
                op_col=op_col,
                epoch_mark=mark,
            )
            if max_snapshots and len(
                _tidx_recover_live(spark, index_dir)
            ) > max_snapshots:
                optimize_text_index(spark, index_dir)
        else:
            adds = batch_df
            if op_col is not None:
                # founding path: deletes target an index that does not
                # exist yet — dropped (docstring contract)
                adds = batch_df.filter(
                    F.coalesce(F.col(op_col), F.lit("add")) != "delete"
                )
            adds = adds.select(id_col, text_col, *(meta_cols or []))
            if adds.isEmpty():
                return  # deletes-only before founding: no index yet
            text_index_build(
                adds,
                index_dir,
                id_col,
                text_col,
                num_buckets=num_buckets,
                mode="append" if versioned else "overwrite",
                layout="versioned",
                epoch_mark=mark,
                max_snapshots=max_snapshots,
                meta_cols=meta_cols,
            )
        if not _tidx_is_versioned(spark, index_dir):
            return  # nothing founded this batch: no index yet
        if (
            compact_every
            and epoch_id > 0
            and (epoch_id + 1) % compact_every == 0
        ):
            optimize_text_index(spark, index_dir)  # CAS, idempotent
            return
        if compact_tombstone_ratio is not None:
            tombs, n_live = _pending_tombstones(spark)
            if tombs > compact_tombstone_ratio * max(1, n_live):
                optimize_text_index(spark, index_dir)

    q = docs_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_sssp_stream(
    edges_stream: DataFrame,
    state_dir: str,
    source_nodes: list[int],
    horizon: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    writer_id: str = "sssp",
) -> None:
    """Streaming bounded-horizon weighted SSSP — the resumable-iteration
    family (q223) extended to weighted paths: every micro-batch of new
    DIRECTED weighted edges folds into a persisted edge set AND a
    persisted horizon profile (``operators/paths.py sssp_profile``),
    so after each epoch ``<state_dir>/profile`` holds the EXACT
    ``sssp_profile(all edges so far, source, horizon)`` — "cheapest
    route within at most H legs" maintained incrementally as lanes
    appear (batch parity is test-pinned).

    Both folds go through the epoch-fenced CAS skeleton
    (``_fold_with_fence``): a redelivered batch skips per table, and a
    crash BETWEEN the edge fold and the profile fold replays to the
    crash-free state (the profile merge is a deterministic function of
    the already-committed edge head + the batch). The profile update
    is the INCREMENTAL kernel (``sssp_profile_update``): per level it
    relaxes only the stored level against the batch's new edges plus
    the improvement frontier against all edges — a batch that shortens
    nothing costs ``horizon`` empty joins, never a full Bellman-Ford
    re-run.

    ``source_nodes``: the fixed seed set (control-plane literals — the
    founding contract; seeds entering later would need a profile
    refound). Read the result with ``read_table(spark,
    state_dir + "/profile")``; the ``h == horizon`` slice is the
    distance relation."""
    import os

    from ..operators.paths import sssp_profile, sssp_profile_update
    from ..sinks.versioned import read_table

    edges_path = os.path.join(state_dir, "edges")
    profile_path = os.path.join(state_dir, "profile")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.select(src, dst, weight)
        source = local_relation(spark, 
            [(int(n),) for n in source_nodes], "node bigint"
        )
        _fold_with_fence(
            spark, edges_path, writer_id + "_edges", epoch_id,
            lambda base: (
                batch
                if base is None
                else base.unionByName(batch).distinct()
            ),
        )
        all_edges = read_table(spark, edges_path)

        def merge(base_profile: DataFrame | None) -> DataFrame:
            if base_profile is None:
                return sssp_profile(
                    all_edges, source, horizon, src, dst, weight
                )
            return sssp_profile_update(
                all_edges, batch, base_profile, source, horizon,
                src, dst, weight,
            )

        _fold_with_fence(spark, profile_path, writer_id, epoch_id, merge)

    q = edges_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_components_stream(
    pairs_stream: DataFrame,
    state_dir: str,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    writer_id: str = "cc",
    op_col: str | None = None,
) -> None:
    """Streaming connected-components maintenance — the CLUSTER side of
    the dedup steady state: ``run_incremental_dedup_stream`` emits
    near-dup PAIRS per micro-batch; this job folds those pairs into a
    persisted edge set and a persisted (node, component) label table
    (component = min member, the canonical-doc id), so after every
    epoch ``<state_dir>/labels`` is EXACTLY
    ``connected_components(all pairs so far)`` — without ever
    re-propagating history (``operators/components.py cc_update``
    relaxes only the improvement frontier the batch induces).

    Both folds ride the epoch-fenced CAS skeleton (``_fold_with_fence``
    — the ``run_sssp_stream`` contract): redelivered batches skip per
    table, and a crash between the folds replays to the crash-free
    state. Read the result with ``read_table(spark,
    state_dir + "/labels")``; batch parity is test-pinned.

    ``op_col``: CDC mode — batches mix edge adds and deletes
    (``op_col == 'delete'``), the index families' CDC contract on the
    graph surface. The edge head carries (first_epoch, deleted_epoch)
    so the label merge stays a deterministic function of the committed
    head (``_cdc_fold_edges`` module comment); per epoch the insert
    kernel (``cc_update``) runs on old ∪ adds and the delete kernel
    (``cc_delete_update``) then removes the tombstoned edges — after
    every epoch ``labels`` is EXACTLY ``connected_components(live
    edges)``. Delete+re-add of an edge in one batch = delete wins."""
    import os

    from ..operators.components import (
        cc_delete_update,
        cc_update,
        connected_components,
    )
    from ..sinks.versioned import read_table

    edges_path = os.path.join(state_dir, "edges")
    labels_path = os.path.join(state_dir, "labels")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if op_col is None:
            batch = batch_df.select(src, dst)
            _fold_with_fence(
                spark, edges_path, writer_id + "_edges", epoch_id,
                lambda base: (
                    batch
                    if base is None
                    else base.unionByName(batch).distinct()
                ),
            )
            all_edges = read_table(spark, edges_path)

            def merge(base_labels: DataFrame | None) -> DataFrame:
                if base_labels is None:
                    return connected_components(
                        all_edges, src=src, dst=dst, max_iter=max_iter
                    )
                return cc_update(
                    all_edges, batch, base_labels, src=src, dst=dst,
                    max_iter=max_iter,
                )

            _fold_with_fence(
                spark, labels_path, writer_id, epoch_id, merge
            )
            return
        adds = batch_df.filter(
            F.coalesce(F.col(op_col), F.lit("add")) != "delete"
        ).select(src, dst)
        dels = batch_df.filter(F.col(op_col) == "delete").select(src, dst)
        _fold_with_fence(
            spark, edges_path, writer_id + "_edges", epoch_id,
            lambda base: _cdc_fold_edges(
                base, adds, dels, [src, dst], epoch_id
            ),
        )
        head = read_table(spark, edges_path)
        adds_this, dels_this, live, pre_del = _cdc_slices(
            head, [src, dst], epoch_id
        )

        def merge(base_labels: DataFrame | None) -> DataFrame:
            if base_labels is None:
                return connected_components(
                    live, src=src, dst=dst, max_iter=max_iter
                )
            mid = cc_update(
                pre_del, adds_this, base_labels, src=src, dst=dst,
                max_iter=max_iter,
            )
            return cc_delete_update(
                live, dels_this, mid, src=src, dst=dst,
                max_iter=max_iter,
            )

        _fold_with_fence(spark, labels_path, writer_id, epoch_id, merge)

    q = pairs_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_scc_stream(
    edges_stream: DataFrame,
    state_dir: str,
    src: str = "src",
    dst: str = "dst",
    max_phases: int = 64,
    max_bfs_rounds: int = 64,
    writer_id: str = "scc",
    op_col: str | None = None,
) -> None:
    """Streaming strongly-connected-component maintenance — the
    DIRECTED twin of ``run_components_stream`` for insert-only edge
    streams (link graphs, citation DAGs, trade lanes): fold each
    micro-batch into a persisted edge set and a persisted (node, scc)
    label table so after every epoch ``<state_dir>/labels`` is EXACTLY
    ``strongly_connected_components(all edges so far)`` — without
    re-running the FB decomposition over the node graph
    (``operators/scc.py scc_update`` confines each batch to the
    condensation-DAG region its new inter-component edges can merge).

    Both folds ride the epoch-fenced CAS skeleton (``_fold_with_fence``
    — the ``run_components_stream`` contract): redelivered batches
    skip per table, and a crash between the folds replays to the
    crash-free state. Read the result with ``read_table(spark,
    state_dir + "/labels")``; batch parity is test-pinned.

    ``op_col``: CDC mode — adds + deletes mixed (the round-15
    delete-aware kernels lifted the old insert-only contract): the
    epoch-tagged edge head keeps the merge deterministic
    (``_cdc_fold_edges``), ``scc_update`` handles old ∪ adds, then
    ``scc_delete_update`` re-decomposes only the SCCs that lost an
    intra-SCC edge — after every epoch ``labels`` is EXACTLY
    ``strongly_connected_components(live edges)``."""
    import os

    from ..operators.scc import (
        scc_delete_update,
        scc_update,
        strongly_connected_components,
    )
    from ..sinks.versioned import read_table

    edges_path = os.path.join(state_dir, "edges")
    labels_path = os.path.join(state_dir, "labels")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if op_col is None:
            batch = batch_df.select(src, dst)
            _fold_with_fence(
                spark, edges_path, writer_id + "_edges", epoch_id,
                lambda base: (
                    batch
                    if base is None
                    else base.unionByName(batch).distinct()
                ),
            )
            all_edges = read_table(spark, edges_path)

            def merge(base_labels: DataFrame | None) -> DataFrame:
                if base_labels is None:
                    return strongly_connected_components(
                        all_edges, src=src, dst=dst,
                        max_phases=max_phases,
                        max_bfs_rounds=max_bfs_rounds,
                    )
                return scc_update(
                    all_edges, batch, base_labels, src=src, dst=dst,
                    max_phases=max_phases,
                    max_bfs_rounds=max_bfs_rounds,
                )

            _fold_with_fence(
                spark, labels_path, writer_id, epoch_id, merge
            )
            return
        adds = batch_df.filter(
            F.coalesce(F.col(op_col), F.lit("add")) != "delete"
        ).select(src, dst)
        dels = batch_df.filter(F.col(op_col) == "delete").select(src, dst)
        _fold_with_fence(
            spark, edges_path, writer_id + "_edges", epoch_id,
            lambda base: _cdc_fold_edges(
                base, adds, dels, [src, dst], epoch_id
            ),
        )
        head = read_table(spark, edges_path)
        adds_this, dels_this, live, pre_del = _cdc_slices(
            head, [src, dst], epoch_id
        )

        def merge(base_labels: DataFrame | None) -> DataFrame:
            if base_labels is None:
                return strongly_connected_components(
                    live, src=src, dst=dst,
                    max_phases=max_phases,
                    max_bfs_rounds=max_bfs_rounds,
                )
            mid = scc_update(
                pre_del, adds_this, base_labels, src=src, dst=dst,
                max_phases=max_phases,
                max_bfs_rounds=max_bfs_rounds,
            )
            return scc_delete_update(
                live, dels_this, mid, src=src, dst=dst,
                max_phases=max_phases,
                max_bfs_rounds=max_bfs_rounds,
            )

        _fold_with_fence(spark, labels_path, writer_id, epoch_id, merge)

    q = edges_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_triangle_stream(
    pairs_stream: DataFrame,
    state_dir: str,
    src: str = "a",
    dst: str = "b",
    writer_id: str = "tri",
    op_col: str | None = None,
) -> None:
    """Streaming triangle/wedge-count maintenance: every micro-batch of
    undirected edges folds into a persisted edge set AND a persisted
    one-row counts table, so after each epoch ``<state_dir>/counts``
    holds EXACTLY ``triangle_stats(all edges so far)``'s
    (n_edges, n_triangles, n_wedges) — maintained by the incremental
    kernel (``operators/triangles.py triangle_update``): per batch the
    work is the new edges' common-neighbor sightings plus the affected
    endpoints' degree deltas, never a re-count of history (the
    q252/q253 discipline applied to q167's kernel).

    Triangle deltas are NOT idempotent under edge redelivery (unlike
    min-label CC), so the edge fold tags each edge with the epoch that
    FIRST delivered it (``first_epoch``) and drops re-deliveries; the
    counts merge derives its batch as ``first_epoch == epoch`` from
    the already-committed edge head — a deterministic function of
    head + epoch, which is what makes the crash-between-folds replay
    exact. Both folds ride the epoch-fenced CAS skeleton
    (``_fold_with_fence``); batch parity and replay invariance are
    test-pinned. Founding (epoch with no prior counts) runs the
    one-shot kernel over the head.

    ``op_col``: CDC mode — adds + deletes mixed; the first_epoch tag
    generalizes to the (first_epoch, deleted_epoch) head
    (``_cdc_fold_edges``), the insert delta (``triangle_update``) runs
    on old ∪ adds, the delete delta (``triangle_delete_update``) then
    subtracts the tombstoned edges' triangles — after every epoch
    ``counts`` equals ``triangle_stats(live edges)``."""
    import os

    from ..operators.triangles import (
        TriangleCounts,
        triangle_delete_update,
        triangle_stats,
        triangle_update,
    )
    from ..sinks.versioned import read_table

    edges_path = os.path.join(state_dir, "edges")
    counts_path = os.path.join(state_dir, "counts")
    counts_schema = "n_edges bigint, n_triangles bigint, n_wedges bigint"

    def _canon_pairs(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least(src, dst).alias("a"),
                F.greatest(src, dst).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def cdc_sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        adds = _canon_pairs(
            batch_df.filter(
                F.coalesce(F.col(op_col), F.lit("add")) != "delete"
            )
        )
        dels = _canon_pairs(batch_df.filter(F.col(op_col) == "delete"))
        _fold_with_fence(
            spark, edges_path, writer_id + "_edges", epoch_id,
            lambda base: _cdc_fold_edges(
                base, adds, dels, ["a", "b"], epoch_id
            ),
        )
        head = read_table(spark, edges_path)
        adds_this, dels_this, live, pre_del = _cdc_slices(
            head, ["a", "b"], epoch_id
        )

        def merge(base_counts: DataFrame | None) -> DataFrame:
            if base_counts is None:
                st = triangle_stats(live)
                return local_relation(spark, 
                    [(st.n_edges, st.n_triangles, st.n_wedges)],
                    counts_schema,
                )
            r = base_counts.first()
            prior = TriangleCounts(
                int(r["n_edges"]),
                int(r["n_triangles"]),
                int(r["n_wedges"]),
            )
            mid = triangle_update(
                pre_del, adds_this, prior, assume_canonical=True
            )
            got = triangle_delete_update(
                pre_del, dels_this, mid, assume_canonical=True
            )
            return local_relation(spark, [tuple(got)], counts_schema)

        _fold_with_fence(spark, counts_path, writer_id, epoch_id, merge)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if op_col is not None:
            cdc_sink(batch_df, epoch_id)
            return
        spark = batch_df.sparkSession
        batch = (
            batch_df.select(
                F.least(src, dst).alias("a"),
                F.greatest(src, dst).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

        def fold_edges(base: DataFrame | None) -> DataFrame:
            tagged = batch.withColumn(
                "first_epoch", F.lit(int(epoch_id)).cast("bigint")
            )
            if base is None:
                return tagged
            fresh = tagged.join(
                base.select("a", "b"), ["a", "b"], "left_anti"
            )
            return base.unionByName(fresh)

        _fold_with_fence(
            spark, edges_path, writer_id + "_edges", epoch_id, fold_edges
        )
        head = read_table(spark, edges_path)

        def merge(base_counts: DataFrame | None) -> DataFrame:
            if base_counts is None:
                st = triangle_stats(head.select("a", "b"))
                return local_relation(spark, 
                    [(st.n_edges, st.n_triangles, st.n_wedges)],
                    counts_schema,
                )
            r = base_counts.first()
            prior = TriangleCounts(
                int(r["n_edges"]),
                int(r["n_triangles"]),
                int(r["n_wedges"]),
            )
            batch_new = head.filter(
                F.col("first_epoch") == int(epoch_id)
            ).select("a", "b")
            # the head IS the canonical deduped relation (this fold
            # maintains it) — skip the normalizing distinct
            got = triangle_update(
                head.select("a", "b"), batch_new, prior,
                assume_canonical=True,
            )
            return local_relation(spark, [tuple(got)], counts_schema)

        _fold_with_fence(spark, counts_path, writer_id, epoch_id, merge)

    q = pairs_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_kcore_stream(
    pairs_stream: DataFrame,
    state_dir: str,
    k: int,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
    writer_id: str = "kcore",
    op_col: str | None = None,
) -> None:
    """Streaming k-core membership maintenance: every micro-batch of
    undirected edges folds into a persisted edge set AND a persisted
    (node) member table, so after each epoch ``<state_dir>/core`` is
    EXACTLY ``k_core(all edges so far, k)`` — maintained incrementally
    (``operators/kcore.py k_core_update``): insertion can only GROW
    the core, so each batch re-peels only the eligible region reached
    from its endpoints, never history.

    ``k_core_update`` is exact for any candidate region that covers
    the joining set, so redelivered/duplicate edges are harmless and
    the edge fold stays the plain distinct union (no epoch tagging
    needed — contrast ``run_triangle_stream``). Both folds ride the
    epoch-fenced CAS skeleton; batch parity and replay invariance are
    test-pinned.

    ``op_col``: CDC mode — adds + deletes mixed, the
    ``run_components_stream`` contract: epoch-tagged edge head, insert
    kernel on old ∪ adds, then the reverse-peel delete kernel
    (``k_core_delete_update``) — after every epoch ``core`` is EXACTLY
    ``k_core(live edges, k)``."""
    import os

    from ..operators.kcore import (
        k_core,
        k_core_delete_update,
        k_core_update,
    )
    from ..sinks.versioned import read_table

    edges_path = os.path.join(state_dir, "edges")
    core_path = os.path.join(state_dir, "core")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if op_col is None:
            batch = batch_df.select(src, dst)
            _fold_with_fence(
                spark, edges_path, writer_id + "_edges", epoch_id,
                lambda base: (
                    batch
                    if base is None
                    else base.unionByName(batch).distinct()
                ),
            )
            head = read_table(spark, edges_path)

            def merge(base_core: DataFrame | None) -> DataFrame:
                if base_core is None:
                    return k_core(
                        head, k, src=src, dst=dst, max_iter=max_iter
                    )
                return k_core_update(
                    head, batch, base_core, k,
                    src=src, dst=dst, max_iter=max_iter,
                )

            _fold_with_fence(spark, core_path, writer_id, epoch_id, merge)
            return
        adds = batch_df.filter(
            F.coalesce(F.col(op_col), F.lit("add")) != "delete"
        ).select(src, dst)
        dels = batch_df.filter(F.col(op_col) == "delete").select(src, dst)
        _fold_with_fence(
            spark, edges_path, writer_id + "_edges", epoch_id,
            lambda base: _cdc_fold_edges(
                base, adds, dels, [src, dst], epoch_id
            ),
        )
        head = read_table(spark, edges_path)
        adds_this, dels_this, live, pre_del = _cdc_slices(
            head, [src, dst], epoch_id
        )

        def merge(base_core: DataFrame | None) -> DataFrame:
            if base_core is None:
                return k_core(live, k, src=src, dst=dst, max_iter=max_iter)
            mid = k_core_update(
                pre_del, adds_this, base_core, k,
                src=src, dst=dst, max_iter=max_iter,
            )
            return k_core_delete_update(
                live, dels_this, mid, k,
                src=src, dst=dst, max_iter=max_iter,
            )

        _fold_with_fence(spark, core_path, writer_id, epoch_id, merge)

    q = pairs_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_cms_sketch_stream(
    items_stream: DataFrame,
    sketch_dir: str,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 256,
    writer_id: str = "cms",
) -> None:
    """Streaming count-min sketch maintenance (functions/cms.py): each
    micro-batch's items are sketched (one ≤ depth×width-row increment
    relation) and CAS-appended as one epoch-marked log snapshot —
    at-least-once delivery commits at most once (a replayed batch finds
    its mark and skips). The merged sketch is ``cms_read`` (bucket-wise
    sum over the log), exact by CMS additivity: the streamed sketch
    equals the batch sketch over the union of all batches, test-pinned.

    No compaction protocol needed: increments are sketch-sized (three
    ints × depth×width rows per epoch), so read-time re-aggregation is
    trivial at any epoch count — the rare log-structured state whose
    merge cost is O(epochs × sketch), independent of data volume. The
    100 TB shape: shard streams sketch independently into separate
    logs; ``cms_merge``/``cms_read`` union them at read time."""
    from ..functions.cms import cms_build
    from ..sinks.versioned import append_log_version, log_has_mark

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return  # nothing to add; do not commit an empty snapshot
        spark = batch_df.sparkSession
        mark = f"_epoch_{writer_id}_{epoch_id}"
        if log_has_mark(spark, sketch_dir, mark):
            return  # replayed batch: increment already committed
        inc = cms_build(
            batch_df, key_col, weight_col=weight_col,
            depth=depth, width=width,
        )
        append_log_version(inc, sketch_dir, marks=[mark])

    q = items_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_vector_search_stream(
    queries_stream: DataFrame,
    index_path: str,
    results_dir: str,
    k: int = 5,
    nprobe: int = 3,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    writer_id: str = "vecsearch",
    where: str | None = None,
    use_codes: bool = False,
    shortlist: int = 64,
    escalate: bool = False,
) -> None:
    """Nearline ANN serving: a STREAM of query embeddings probed
    per-micro-batch against the persisted vector index, results
    appended to a CAS log table with per-epoch fencing — the
    query-side twin of ``run_vector_index_ingest_stream``.

    ``where``: optional metadata predicate (over the index's
    ``meta_cols``) applied INSIDE the probed cells before top-k —
    filtered serving ("top-k WHERE lang='en'") at the stream level.
    ``use_codes``/``shortlist``: serve the PQ/ADC path instead of
    exact cosine (requires a PQ-enabled index). ``escalate``: the
    under-return contract for selective ``where`` facets — under-filled
    queries re-probe with nprobe doubled (``vector_index_probe``'s
    escalation; per-batch query sets are control-plane small, so its
    driver-side counts are in-contract here).

    Each batch's results ride one ``append_log_version`` snapshot
    carrying ``_epoch_<writer_id>_<epoch>``, so an at-least-once
    redelivery finds its mark and appends nothing: the results log is
    replay-invariant (exactly-once results, test-pinned). Results carry
    a ``batch_id`` for lineage. The probe itself is the ordinary
    pruned-cell read (``vector_index_probe``) — per batch, cost is the
    probed fraction of the index, independent of stream history.

    Serving against an index that is concurrently ingesting
    (``run_vector_index_ingest_stream``): every probe reads a
    consistent snapshot set (CAS snapshots are immutable once
    published), so pure APPENDS are safe by construction. When the
    ingest stream also COMPACTS (``compact_every``), folded snapshots
    are physically pruned with a one-compaction-cycle grace window
    (``sinks/versioned.py recover_live_snapshots``): a probe that
    lazily captured pre-compaction snapshot paths finishes against
    intact files as long as it completes within one compaction
    interval — readers that may stall longer than that should pin
    their own copy (clone) rather than race retention."""
    from ..similarity import vector_index_probe
    from ..sinks.versioned import append_log_version, log_has_mark

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        mark = f"_epoch_{writer_id}_{epoch_id}"
        if log_has_mark(spark, results_dir, mark):
            return  # replayed batch: results already committed
        hits = vector_index_probe(
            spark,
            index_path,
            batch_df.select(query_id_col, vec_col),
            k=k,
            nprobe=nprobe,
            query_id_col=query_id_col,
            vec_col=vec_col,
            where=where,
            use_codes=use_codes,
            shortlist=shortlist,
            escalate=escalate,
        )
        append_log_version(
            hits.withColumn("batch_id", F.lit(epoch_id)),
            results_dir,
            [mark],
        )

    q = queries_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def fold_rollup_batch(
    batch_df: DataFrame,
    epoch_id: int,
    rollup_path: str,
    keys: list[str],
    measures: dict,
    writer_id: str = "stream",
) -> bool:
    """Fold ONE micro-batch's aggregated increment into a versioned
    rollup table, exactly once. Returns True if folded, False if this
    (writer, epoch) was already folded (replay).

    foreachBatch delivery is at-least-once; exactly-once folding comes
    from epoch fencing made ATOMIC with the CAS commit: every folded
    (writer, epoch) pair rides inside the published snapshot as an
    ``_epoch_<writer>_<id>`` marker written to the staging directory
    BEFORE the rename, so "epoch folded" and "rollup advanced" are one
    filesystem event — there is no crash window where one happened
    without the other (contrast the incremental-dedup stream's
    documented at-least-once appends). The fence is the SET of folded
    pairs, carried forward into every successor snapshot — not a
    max-epoch watermark, which would silently DROP the loser when two
    writers race out of epoch order (a commit-race test caught exactly
    that). A losing race re-reads the new head (whose marker set now
    includes the winner) and retries; replays are detected off the live
    snapshot's set and skipped. ``writer_id`` namespaces the fence so
    independent streams can maintain one rollup without epoch-id
    collisions."""
    from ..operators.incremental import aggregate_increment, merge_rollup

    inc = aggregate_increment(batch_df, keys, measures)
    return _fold_with_fence(
        batch_df.sparkSession,
        rollup_path,
        writer_id,
        epoch_id,
        lambda base: merge_rollup(base, inc, keys, measures),
    )


def _fold_with_fence(spark, table_path: str, writer_id: str,
                     epoch_id: int, merge_fn) -> bool:
    """The epoch-fenced CAS fold skeleton shared by every exactly-once
    streaming view (rollup sums, HLL distinct sketches): read the head,
    skip if this (writer, epoch) marker is already in it, publish
    ``merge_fn(base)`` with the carried-forward fence set + this marker
    riding the staging rename, retry on commit races."""
    from ..sinks.versioned import (
        CommitConflict,
        commit_staged,
        fs_touch,
        list_versions,
        read_table,
        snapshot_members,
    )

    mark = f"_epoch_{writer_id}_{epoch_id}"
    while True:
        versions = list_versions(spark, table_path)
        base_version = versions[-1] if versions else 0
        prior_marks: list[str] = []
        if base_version:
            snap = f"{table_path}/snap_{base_version:08d}"
            # FS-API listing, so the fence works wherever the table
            # lives (same helpers as the versioned dedup/text indexes)
            prior_marks = [
                m
                for m in snapshot_members(spark, snap)
                if m.startswith("_epoch_")
            ]
            if mark in prior_marks:
                return False  # replayed batch: already in the view
            base = read_table(spark, table_path)
        else:
            base = None
        merged = merge_fn(base)

        def populate(staging: str) -> None:
            merged.write.mode("overwrite").parquet(staging)
            # the fence rides in the snapshot: atomic with the rename.
            # Carry the full folded set forward, then add this epoch.
            for name in prior_marks:
                fs_touch(spark, f"{staging}/{name}")
            fs_touch(spark, f"{staging}/{mark}")

        try:
            commit_staged(spark, table_path, base_version, populate)
            return True
        except CommitConflict:
            continue  # another writer advanced the head; re-read, retry


def fold_distinct_sketch_batch(
    batch_df: DataFrame,
    epoch_id: int,
    view_path: str,
    keys: list[str],
    distinct_col: str,
    writer_id: str = "stream",
) -> bool:
    """Streaming APPROXIMATE-DISTINCT materialized view: fold one
    micro-batch into a versioned per-key HLL sketch table, exactly once
    (the fold_rollup_batch fence, shared via ``_fold_with_fence``).

    The state per key is one KB-sized HLL sketch + an exact row count;
    the merge is ``hll_union_agg`` — register-wise max, associative and
    commutative, so the folded sketch is IDENTICAL to a one-shot
    ``hll_sketch_agg`` over every row ever folded (no drift across batch
    boundaries; tests assert estimate equality with the one-shot
    sketch). This is the streaming twin of q186's daily-sketch rollup:
    distinct-user counts over an unbounded stream in O(|keys|) state,
    where an exact streaming COUNT DISTINCT would hold O(stream) state.
    Read the view with ``distinct_view_readout``."""

    inc = batch_df.groupBy(*keys).agg(
        F.hll_sketch_agg(distinct_col).alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )

    def merge(base: DataFrame | None) -> DataFrame:
        if base is None:
            return inc
        return (
            base.unionByName(inc)
            .groupBy(*keys)
            .agg(
                F.hll_union_agg("sk").alias("sk"),
                F.sum("n_rows").cast("bigint").alias("n_rows"),
            )
        )

    return _fold_with_fence(
        batch_df.sparkSession, view_path, writer_id, epoch_id, merge
    )


def drift_view_readout(view: DataFrame) -> DataFrame:
    """Drift monitor over a STREAMING-MAINTAINED count rollup: ``view``
    is the versioned rollup table keyed by (bin, s) with ``n_rows``
    (maintained exactly-once by ``fold_rollup_batch`` — integer counts
    are the simplest of the fence-folded state types: plain sums).
    Output schema and formulas are exactly q216_drift_bins' — both
    evaluate ``queries.mining.drift_from_counts``, so the streaming
    view reads bit-identically to the batch query over the same rows
    (test-asserted). This is how a 100 TB pipeline watches ingest
    drift continuously: per-batch state is O(bins × splits), the
    readout is O(bins)."""
    from ..queries.mining import drift_from_counts

    counts = view.groupBy("bin").agg(
        F.sum(
            F.when(F.col("s") == 0, F.col("n_rows")).otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when(F.col("s") == 1, F.col("n_rows")).otherwise(0)
        ).alias("cb"),
    )
    return drift_from_counts(counts)


def distinct_view_readout(view: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., approx_distinct, n_rows) from the sketch view — O(|keys|)
    regardless of stream history."""
    return view.select(
        *keys,
        F.hll_sketch_estimate("sk").alias("approx_distinct"),
        F.col("n_rows"),
    )


def run_distinct_view_stream(
    stream_df: DataFrame,
    view_path: str,
    keys: list[str],
    distinct_col: str,
    checkpoint: str | None = None,
) -> None:
    """Streaming materialized view of approximate distinct counts per
    key (see fold_distinct_sketch_batch). ``checkpoint`` makes repeated
    catch-up runs incremental — without it a fresh start re-reads the
    source from epoch 0, and the fence correctly discards every batch
    as a replay (the at-least-once contract doing its job)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        fold_distinct_sketch_batch(
            batch_df, epoch_id, view_path, keys, distinct_col
        )

    w = stream_df.writeStream.foreachBatch(sink)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_rollup_maintenance_stream(
    stream_df: DataFrame,
    rollup_path: str,
    keys: list[str],
    measures: dict,
) -> None:
    """Streaming materialized view: every micro-batch advances a
    versioned rollup table via ``fold_rollup_batch`` (exactly-once
    folds; see its docstring for the fencing protocol). Read the current
    view with ``sinks.read_table`` + ``operators.incremental
    .rollup_readout`` — O(|rollup|) regardless of stream history."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        fold_rollup_batch(batch_df, epoch_id, rollup_path, keys, measures)

    q = stream_df.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def streaming_anomalies(
    events: DataFrame, frame: int = 6, threshold: float = 2.0
) -> DataFrame:
    """Streaming twin of q163's rolling z-score anomaly detector
    (queries/timeseries.py) — per-user trailing-``frame`` moments across
    micro-batches via applyInPandasWithState. State per user is the last
    ``frame - 1`` values (O(frame) per key, never O(stream)); each
    micro-batch's rows are processed in (ts, event_id) order.

    Bit-exact batch parity: the moment arithmetic replays q163's
    DECIMAL(28,6) idiom — each double is quantized through its shortest
    decimal representation (``repr``; Java's ``BigDecimal.valueOf`` is
    Double.toString-based, so HALF_UP on ``Decimal(repr(v))`` lands on
    the same 6-dp decimal as Spark's double→decimal cast), summed
    exactly, and converted back once (both conversions are correctly
    rounded). tests/test_streaming.py asserts EXACT equality with the
    oracle-checked batch query under Trigger.AvailableNow.

    Caveat shared with every trailing-window stream: rows arriving in a
    LATER micro-batch than a larger timestamp already processed see a
    different window than the batch query would give them (state cannot
    retro-sort history) — the standard out-of-orderness trade; bound it
    upstream with a watermark + sorted replay where exact parity
    matters."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")

    def dec(v: float) -> Decimal:
        return Decimal(repr(v)).quantize(q6, rounding=ROUND_HALF_UP)

    def update(key, pdfs, state: "GroupState"):
        buf = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        out = {
            "user_id": [], "event_id": [], "value": [],
            "roll_mean": [], "z": [], "anomaly": [],
        }
        for event_id, v in zip(batch["event_id"], batch["value"]):
            v = float(v)
            buf.append(v)
            window = buf[-frame:]
            n = len(window)
            mean = float(sum((dec(x) for x in window), Decimal(0))) / n
            sq = float(sum((dec(x * x) for x in window), Decimal(0))) / n
            var = max(0.0, sq - mean * mean)
            z = (v - mean) / (var ** 0.5) if var > 0.0 else None
            out["user_id"].append(int(key[0]))
            out["event_id"].append(int(event_id))
            out["value"].append(v)
            out["roll_mean"].append(mean)
            out["z"].append(z)
            out["anomaly"].append(None if z is None else abs(z) > threshold)
        # frame=1 trap: buf[-0:] is the WHOLE list, so per-key state
        # would grow with the stream — keep exactly the frame-1 tail
        # (empty when each row's window is just itself)
        buf = buf[len(buf) - (frame - 1):] if frame > 1 else []
        state.update((buf,))
        yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, event_id bigint, value double, "
            "roll_mean double, z double, anomaly boolean"
        ),
        stateStructType="buf array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_capped_sessions(
    events: DataFrame, gap_seconds: int, max_duration_seconds: int
) -> DataFrame:
    """Streaming twin of q226's duration-capped sessionization
    (operators/sessionize.capped_sessions): per-user state is THREE
    integers — current session ordinal, its start, and the last event
    time (exact micros) — updated by the same linear recurrence the
    batch kernel scans, so under in-order delivery the assignment is
    bit-identical to the batch query (test-asserted under AvailableNow
    with multi-micro-batch file splits). Emits one row per event with
    its session id (append mode).

    Same out-of-orderness caveat as streaming_anomalies: state cannot
    retro-sort history — a row delivered after a later timestamp was
    processed may split differently than the batch replay; bound it
    upstream with a watermark + sorted replay where parity matters."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000
    cap_us = int(max_duration_seconds) * 1_000_000

    def update(key, pdfs, state: "GroupState"):
        if state.exists:
            sid, start, prev = state.get
        else:
            sid, start, prev = 0, None, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = batch["ts"].astype("int64") // 1000
        sids = []
        for t in ts_us:
            t = int(t)
            if prev is None or t - prev > gap_us or t - start > cap_us:
                sid += 1
                start = t
            prev = t
            sids.append(sid)
        state.update((int(sid), start, prev))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])] * len(batch),
                "event_id": batch["event_id"].astype("int64"),
                "ts": batch["ts"],
                "session_id": sids,
            }
        )

    return events.select("user_id", "event_id", "ts").groupBy(
        "user_id"
    ).applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, event_id bigint, ts timestamp, "
            "session_id bigint"
        ),
        stateStructType="sid bigint, start_us bigint, prev_us bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fold_scd2_batch(
    batch_df: DataFrame,
    table_path: str,
    keys: list[str],
    attrs: list[str],
    ts_col: str,
) -> None:
    """Fold one CDC micro-batch into a type-2 dimension maintained as a
    versioned table: dedup the batch to its last change per key (max
    ``ts_col``, deterministic), stamp the batch's max timestamp as the
    effective instant, and ``scd2_apply`` it onto the current snapshot.

    Exactly-once WITHOUT an epoch fence: scd2_apply's no-op semantics
    make redelivery idempotent — a replayed batch finds every key's
    current attrs already equal and closes/inserts nothing (unlike the
    rollup fold, whose increments would double-count and therefore need
    fold fencing). The publish is the same commit-then-prune snapshot
    protocol as every other sink here."""
    from pyspark.sql import functions as F

    from ..operators.scd2 import scd2_apply
    from ..sinks.versioned import _snapshots, read_table, write_version
    from ..transform.dedup import dedup_keep_first

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    last = dedup_keep_first(
        batch_df, keys=keys, order_by=[ts_col], ascending=False
    ).select(*keys, *attrs)
    effective = batch_df.agg(F.max(ts_col)).first()[0]
    _, _, names = _snapshots(spark, table_path)
    dim = read_table(spark, table_path) if names else None
    updated = scd2_apply(dim, last, keys, attrs, effective)
    write_version(updated, table_path, retain=2)


def run_scd2_stream(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str],
    attrs: list[str],
    ts_col: str,
) -> None:
    """Maintain an SCD2 dimension from a change stream via foreachBatch
    (AvailableNow catch-up trigger; rerun on a schedule for continuous
    maintenance)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        fold_scd2_batch(batch_df, table_path, keys, attrs, ts_col)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_quarantine_stream(
    stream_df: DataFrame,
    contract: dict,
    good_path: str,
    bad_path: str,
) -> None:
    """Streaming contract application with dead-letter routing: per
    micro-batch, rows whose casts silently null a non-null source value
    go to the ``bad_path`` DLQ (original rows + ``__bad_columns``
    blame), clean rows land in ``good_path`` — the streaming form of
    ``transform.contract.apply_with_quarantine``, with the same one-scan
    sharing inside each batch. Both sinks are plain appends: DLQ rows
    are facts about the batch, re-processing after a contract fix is a
    REPLAY (reread the DLQ parquet through the contract), not an edit.
    AvailableNow trigger — rerun on a schedule for continuous flow."""
    from ..transform.contract import apply_with_quarantine

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        good, bad = apply_with_quarantine(batch_df, contract)
        good.write.mode("append").parquet(good_path)
        bad.write.mode("append").parquet(bad_path)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def session_aggregates_dynamic_gap(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Session windows with a PER-ROW gap (Spark's dynamic
    session_window): purchase-active sessions stay open longer than
    browse-only ones — the per-segment inactivity timeout real products
    use. The gap is an expression evaluated per event; state merging and
    watermark eviction work exactly as with the fixed gap."""
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("45 minutes")
    ).otherwise(F.lit("15 minutes"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(_EXACT_TOTAL).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_forget_stream(
    ids_stream: DataFrame,
    id_col: str = "doc_id",
    text_index: str | None = None,
    dedup_index: str | None = None,
    vector_index: str | None = None,
    optimize_every: int | None = None,
) -> None:
    """Streaming takedown feed — the forget sweep (q267 /
    ``lifecycle.forget_documents``) folded into the streaming surface:
    each micro-batch of document ids is tombstoned out of every
    supplied index family, so a production takedown queue is consumed
    exactly-once without an operator babysitting it.

    Exactly-once here needs NO separate epoch fence: a forget is
    naturally idempotent — each family's delete commit dedups the ids
    against its prior tombstone set (the CAS snapshot discipline all
    three families share), so THE TOMBSTONE SET IS THE FENCE. A
    redelivered batch (crash before the checkpoint advanced, or crash
    BETWEEN families mid-sweep) tombstones nothing new in the families
    that already landed and catches the missed ones up — the same
    heal-by-rerun contract the batch sweep documents, driven by the
    stream's own at-least-once replay. Contrast the ingest streams
    (``run_*_index_ingest_stream``), where adds are NOT idempotent and
    the epoch mark must ride the commit.

    ``optimize_every``: compact every Nth epoch (physical purge of
    accumulated tombstones across all swept families — CAS, idempotent,
    serve-invariant)."""
    from ..lifecycle import forget_documents

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        ids = batch_df.select(id_col).distinct()
        forget_documents(
            spark, ids,
            text_index=text_index,
            dedup_index=dedup_index,
            vector_index=vector_index,
            optimize=bool(
                optimize_every
                and epoch_id > 0
                and (epoch_id + 1) % optimize_every == 0
            ),
        )

    q = ids_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


# --- CDC edge-set machinery for the graph streams ---------------------------
# The graph streams were insert-only; with the delete-aware kernels
# (operators/{components,kcore,triangles,scc} *_delete_update) a
# micro-batch may now mix adds and deletes (op_col — the exact CDC
# contract the three INDEX families speak, so one change feed can
# drive serving AND maintained graph state). The replay problem is the
# triangle stream's, generalized: graph deltas are not idempotent, so
# the label/count merge must be a DETERMINISTIC function of the
# already-committed edge head + the epoch id — never of the raw batch
# (a crash between the edge fold and the state fold replays the state
# merge against the post-fold head). The edge head therefore carries
# two epoch columns:
#
#   first_epoch    the epoch that (last) brought the edge alive
#   deleted_epoch  NULL while live; the tombstoning epoch otherwise
#
# Fold rules (exactly once per epoch — the fold itself rides the
# fence): a new edge inserts (first=epoch, deleted=NULL); an add of a
# tombstoned edge RESURRECTS it (first=epoch, deleted=NULL — it is a
# fresh edge for counting); an add of a live edge is a no-op; a delete
# tombstones a live edge (deleted=epoch) and is a no-op on dead or
# unknown edges; add+delete of one edge in one batch = delete wins
# (born-dead rows are skipped). The state merge then derives, from the
# head alone:
#
#   adds_this = first_epoch == epoch  AND live      (incl. resurrects)
#   dels_this = deleted_epoch == epoch              (were live before)
#   live      = deleted_epoch IS NULL
#   pre_del   = live ∪ dels_this  (= old ∪ adds_this — the relation
#               the INSERT-side kernels need as their all_edges)
#
# so the insert kernel runs first (old ∪ adds), the delete kernel
# second (remaining = live), and the composition is exact.


def _cdc_fold_edges(
    base: DataFrame | None,
    adds: DataFrame,
    dels: DataFrame,
    keys: list[str],
    epoch_id: int,
) -> DataFrame:
    """One CDC fold of (adds, dels) into the epoch-tagged edge head
    (module comment above). Pure relational — one full-outer join of
    the head against the batch delta."""
    ep = F.lit(int(epoch_id)).cast("bigint")
    delta = (
        adds.distinct().withColumn("__add", F.lit(1))
        .join(
            dels.distinct().withColumn("__del", F.lit(1)),
            keys,
            "full_outer",
        )
        .select(
            *keys,
            F.coalesce("__add", F.lit(0)).alias("__add"),
            F.coalesce("__del", F.lit(0)).alias("__del"),
        )
    )
    if base is None:
        return (
            delta.filter((F.col("__add") == 1) & (F.col("__del") == 0))
            .select(
                *keys,
                ep.alias("first_epoch"),
                F.lit(None).cast("bigint").alias("deleted_epoch"),
            )
        )
    joined = base.join(delta, keys, "full_outer")
    live = F.col("deleted_epoch").isNull() & F.col("first_epoch").isNotNull()
    return joined.select(
        *keys,
        F.when(
            # fresh insert or resurrect (add, no in-batch delete, not live)
            (F.col("__add") == 1) & (F.col("__del") == 0) & ~live, ep
        ).otherwise(F.col("first_epoch")).alias("first_epoch"),
        F.when(
            # delete wins: tombstone live rows (in-batch add+del included)
            (F.col("__del") == 1) & live, ep
        ).when(
            # resurrect clears the tombstone
            (F.col("__add") == 1) & (F.col("__del") == 0), F.lit(None)
        ).otherwise(F.col("deleted_epoch")).alias("deleted_epoch"),
    ).filter(
        # drop delete-of-unknown and born-dead rows (never existed)
        F.col("first_epoch").isNotNull()
    )


def _cdc_slices(head: DataFrame, keys: list[str], epoch_id: int):
    """(adds_this, dels_this, live, pre_delete) — each a pure function
    of the committed head + epoch (module comment above)."""
    ep = int(epoch_id)
    live = head.filter(F.col("deleted_epoch").isNull()).select(*keys)
    adds_this = head.filter(
        (F.col("first_epoch") == ep) & F.col("deleted_epoch").isNull()
    ).select(*keys)
    dels_this = head.filter(F.col("deleted_epoch") == ep).select(*keys)
    pre_delete = head.filter(
        F.col("deleted_epoch").isNull() | (F.col("deleted_epoch") == ep)
    ).select(*keys)
    return adds_this, dels_this, live, pre_delete
