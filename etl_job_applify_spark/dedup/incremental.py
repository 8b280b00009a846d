"""Incremental near-duplicate detection: probe a new batch against a
persisted MinHash band-bucket index of the historical corpus.

The steady state of an LLM data pipeline is not "dedup the corpus" but
"dedup TODAY'S CRAWL against 100 TB of history". Re-running whole-corpus
banding (minhash.py) per batch would recompute every historical
signature every day; instead:

- ``minhash_index_build`` computes each document's banded bucket keys
  ONCE and persists them as a parquet index partitioned by band —
  ~``bands`` small rows per document, written the day the document is
  ingested and never recomputed;
- ``minhash_index_probe`` computes bucket keys for the new batch only,
  and joins them against the index with the BATCH side broadcast: the
  index streams through map tasks (no shuffle of the history), and
  partition pruning skips nothing only because every band is touched —
  per-band parallelism is the point of the layout;
- candidate pairs are verified with exact shingle Jaccard over just the
  implicated documents (precision exact, recall LSH-bounded — same
  contract as minhash_lsh_pairs), and the surviving new docs' entries
  are appended to the index for the next batch.

Scale: probe cost is one scan of the index (semi-join against the
broadcast batch's bucket keys) + work proportional to matched buckets.
Index size is ``bands`` × ~24 B per document — a few percent of corpus
bytes (measured in SCALING.md). Boilerplate buckets are dropped by a
size cap measured over the MATCHED subset, so a hot template bucket
costs one count, not a quadratic fanout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.local import local_relation
from .minhash import minhash_signatures
from .shingles import with_shingles

_META = "_index_meta.json"
_SCHEMA = "_index_schema.json"


def _read_index(spark: SparkSession, index_path: str) -> DataFrame:
    """Read the band-bucket index, tolerating an EMPTY index (a
    purge-everything compaction leaves zero data files; a
    schema-inferring read would raise). ``optimize_index`` persists the
    schema next to the meta; when present it drives an explicit-schema
    read, which returns 0 rows instead of failing on an empty dir."""
    sp = os.path.join(index_path, _SCHEMA)
    if os.path.exists(sp):
        from pyspark.sql.types import StructType

        with open(sp) as fh:
            schema = StructType.fromJson(json.load(fh))
        return spark.read.schema(schema).parquet(index_path)
    return spark.read.parquet(index_path)


def _band_entries(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(doc, band, bucket): one row per document per band."""
    r = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, n, num_hashes)
    return sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def _meta_path(index_path: str) -> str:
    return os.path.join(index_path, _META)


def _read_idx_deletes(spark: SparkSession, index_path: str) -> DataFrame | None:
    """Tombstone set of a FLAT index (``_deletes/`` — the underscore
    keeps the subtree invisible to the root band-entry read), or None.
    Reading an underscore-named base path emits a cosmetic "All paths
    were ignored" WARN from Spark's first listing pass; the read itself
    returns the rows (behavior pinned by the delete tests)."""
    path = os.path.join(index_path, "_deletes")
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path).select("doc").distinct()


def minhash_index_delete(
    spark: SparkSession, index_path: str, doc_ids
) -> dict:
    """Tombstone documents out of the dedup index IMMEDIATELY: probes
    stop surfacing them as candidates now (anti-join, no hint — the
    tombstone set can be large at scale); the next ``optimize_index``
    purges their band entries physically and clears the tombstone set.
    The same GDPR posture as the text index (functions/text_index.py):
    removal is a metadata append, space reclaim is compaction's job.

    Flat layout: appends to ``_deletes/``. Versioned layout: ONE CAS
    snapshot carries the tombstones (no counters to adjust — the dedup
    index has no corpus stats), so concurrent appends/deletes serialize
    through the ordinary commit protocol. Ids are not validated against
    the index (validation would cost an index scan; unknown ids are
    harmless to the anti-join) but re-deletes are deduplicated."""
    if not isinstance(doc_ids, DataFrame):
        doc_ids = local_relation(
            spark, [(int(d),) for d in doc_ids], "doc bigint"
        )
    ids = doc_ids.select(F.col("doc").cast("bigint").alias("doc")).distinct()
    if is_versioned_index(spark, index_path):
        return {"n_tombstoned": _vidx_delete(spark, index_path, ids)}
    _recover_index(index_path)
    prior = _read_idx_deletes(spark, index_path)
    new = ids if prior is None else ids.join(prior, "doc", "left_anti")
    n = new.count()
    if n:
        new.write.mode("append").parquet(
            os.path.join(index_path, "_deletes")
        )
    return {"n_tombstoned": n}


def minhash_index_build(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    mode: str = "overwrite",
    layout: str = "versioned",
    epoch_mark: str | None = None,
) -> None:
    """Persist the corpus's band-bucket entries as the dedup index.

    ``mode="append"`` adds a new batch's entries to an existing index
    (the post-probe ingest step); parameters must match the index's
    recorded ones — bucket keys from different (n, num_hashes, bands)
    are incomparable, so a mismatch raises instead of silently
    corrupting recall.

    ``layout``: ``"versioned"`` (the DEFAULT) founds a log-structured
    CAS-committed index (see the versioned-layout section below) —
    object-store capable, concurrent-append safe, with optional
    ``epoch_mark`` replay fencing; production should stay here, since
    the flat layout's compaction publish is an ``os.rename`` directory
    swap that only local filesystems provide. ``layout="flat"`` opts
    into the band-partitioned directory layout above explicitly (local
    paths only). Appends auto-detect the existing index's layout."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    params = {"n": n, "num_hashes": num_hashes, "bands": bands}
    spark = docs.sparkSession
    if mode == "append" and is_versioned_index(spark, index_path):
        existing = _vidx_read(spark, index_path)[0]
        if existing != params:
            raise ValueError(
                f"index at {index_path} was built with {existing}, "
                f"probe/append requested {params}"
            )
        versioned_index_append(
            docs, index_path, id_col, text_col, epoch_mark=epoch_mark
        )
        return
    if mode != "append" and layout == "versioned":
        _vidx_found(docs, index_path, id_col, text_col, params, epoch_mark)
        return
    if epoch_mark is not None:
        raise ValueError("epoch_mark requires the versioned layout")
    if mode == "append":
        _recover_index(index_path)  # finish any interrupted compaction
    if mode == "append" and os.path.exists(_meta_path(index_path)):
        with open(_meta_path(index_path)) as fh:
            existing = json.load(fh)
        if existing != params:
            raise ValueError(
                f"index at {index_path} was built with {existing}, "
                f"probe/append requested {params}"
            )
    entries = _band_entries(docs, id_col, text_col, n, num_hashes, bands)
    # partitioned by band: a 100 TB index's per-band files compact and
    # prune independently, and the probe's per-band join parallelizes
    # over them
    entries.write.mode(mode).partitionBy("band").parquet(index_path)
    os.makedirs(index_path, exist_ok=True)
    with open(_meta_path(index_path), "w") as fh:
        json.dump(params, fh)


def _recover_index(index_path: str) -> None:
    """Complete an interrupted ``optimize_index`` directory swap.

    The swap is rename(index → __old) then rename(__compact → index): a
    crash between the two renames leaves NO live index but a COMPLETE
    compacted copy at __compact (its meta is written before the swap
    starts). Without recovery, the streaming ingest's first-batch branch
    would silently re-found an EMPTY index (mode="overwrite") and every
    prior batch's entries would be lost — so every entry point
    (probe/append/optimize) first finishes the swap: promote a complete
    __compact when the live index is missing, then clear a leftover
    __old once a live index exists."""
    import shutil

    staging = index_path.rstrip("/") + "__compact"
    old = index_path.rstrip("/") + "__old"
    if not os.path.exists(_meta_path(index_path)):
        if os.path.exists(os.path.join(staging, _META)):
            os.rename(staging, index_path)
        elif os.path.exists(os.path.join(old, _META)):
            # crashed before the staging promotion was possible (or the
            # staging itself was incomplete): roll back to the previous
            # live index rather than losing history
            os.rename(old, index_path)
    if os.path.exists(_meta_path(index_path)):
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
        # symmetric cleanup: a crash after the staging meta write but
        # before the swap leaves a COMPLETE __compact next to a live
        # index. Left in place it is a stale snapshot — if the live
        # directory were ever lost later, recovery would promote it and
        # silently roll the index back past every append since. Only a
        # mid-swap crash (live index already moved aside) may promote
        # staging.
        if os.path.exists(os.path.join(staging, _META)):
            shutil.rmtree(staging, ignore_errors=True)


def _index_data_files(index_path: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(index_path):
        out.extend(
            os.path.join(dirpath, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def optimize_index(
    spark: SparkSession,
    index_path: str,
    target_file_rows: int = 4_000_000,
    tombstones: DataFrame | None = None,
) -> dict:
    """Compact the band-bucket index and drop tombstoned documents —
    the OPTIMIZE of the dedup loop (same discipline as the lakehouse
    ``optimize_table``).

    Per-batch ``mode="append"`` ingest grows an ever-larger,
    ever-smaller-filed index: a daily cadence is 365 appends/year ×
    per-band files each, on the MOST-read table in the pipeline — every
    probe scans it. This rewrite bins each band partition into
    ``ceil(band_rows / target_file_rows)`` files (one shuffle keyed on
    (band, doc-hash bin), so compaction parallelism is bands × bins and
    no band funnels through one task).

    ``tombstones``: a one-column DataFrame of ``doc`` ids to purge
    (documents deleted upstream — takedowns, retention). Dropping them
    at compaction time keeps deletes O(0) on the ingest path; until the
    next compaction a tombstoned doc still surfaces as a candidate and
    is filtered by the caller or survives harmlessly as a verified pair
    against a doc the history no longer serves. Plain anti-join, no
    broadcast hint: takedown lists are usually tiny (AQE broadcasts
    them), but a retention sweep can be a large fraction of the corpus.

    The rewrite publishes via staging + directory swap: a crash before
    the swap leaves the live index untouched, and a crash at ANY point
    inside the swap is repaired by ``_recover_index`` — every entry
    point (probe, append, optimize) first promotes a complete
    ``__compact`` if the live index is missing, or rolls back to
    ``__old``, so no crash window can silently re-found an empty index.
    Probes in flight during the swap must be drained — same
    maintenance-window contract as any non-transactional directory
    rewrite. Returns counts
    {rows_before, rows_after, files_before, files_after}.
    """
    import math
    import shutil

    from ..sinks.stats import _local_path

    if is_versioned_index(spark, index_path):
        # CAS-committed layout: object-store capable, no renames of
        # existing data — the local-path guard does not apply
        return _vidx_optimize(
            spark, index_path, target_file_rows, tombstones
        )
    if _local_path(index_path) is None:
        # the FLAT layout's staging+swap publish below is os.rename-
        # based; an object-store index uses layout="versioned", whose
        # compaction publishes through the versioned-CAS protocol —
        # fail loudly instead of corrupting via a half-applied swap
        raise ValueError(
            f"optimize_index on a flat layout requires a local index "
            f"path, got {index_path}; found the index with "
            f'layout="versioned" for object storage'
        )
    _recover_index(index_path)
    if not os.path.exists(_meta_path(index_path)):
        raise FileNotFoundError(f"no index meta at {index_path}")
    with open(_meta_path(index_path)) as fh:
        params = json.load(fh)
    index = _read_index(spark, index_path)
    files_before = len(_index_data_files(index_path))
    # parquet count() is footer-metadata-only — no data scan
    rows_before = index.count()
    kept = index
    dead = tombstones.toDF("doc") if tombstones is not None else None
    persisted = _read_idx_deletes(spark, index_path)
    if persisted is not None:
        # immediate deletes (minhash_index_delete) purge here too; the
        # staging swap publishes without a _deletes subtree, clearing
        # the tombstone set once its rows are physically gone
        dead = persisted if dead is None else dead.unionByName(persisted)
    if dead is not None:
        kept = index.join(dead.distinct(), "doc", "left_anti")
    # rows per band is uniform by construction (one entry per doc per
    # band), so one global count sizes every band's bin fanout. Bin
    # sizing uses the PRE-purge count even with tombstones (a slight
    # bins overshoot, never an undershoot), so the anti-join runs
    # exactly once — inside the compaction write, not in an extra
    # counting pass over the most-read table in the pipeline.
    bands = params["bands"]
    per_band = math.ceil(max(rows_before, 1) / bands)
    bins = max(1, math.ceil(per_band / target_file_rows))
    staging = index_path.rstrip("/") + "__compact"
    old = index_path.rstrip("/") + "__old"
    shutil.rmtree(staging, ignore_errors=True)
    (
        # pmod (not abs+mod): abs(Integer.MIN_VALUE) overflows int32
        kept.withColumn("__bin", F.pmod(F.hash("doc"), F.lit(bins)))
        .repartition(bands * bins, "band", "__bin")
        .drop("__bin")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(staging)
    )
    # footer-only count of what actually landed (rows_after without a
    # second anti-join pass). Read with the live index's schema: a
    # purge-everything tombstone sweep writes ZERO data files, and a
    # schema-inferring read of the empty staging dir would abort the
    # whole optimize with an obscure AnalysisException — the explicit
    # schema makes the empty index a publishable (0-row) result instead.
    rows_after = spark.read.schema(index.schema).parquet(staging).count()
    with open(os.path.join(staging, _SCHEMA), "w") as fh:
        json.dump(index.schema.jsonValue(), fh)
    with open(os.path.join(staging, _META), "w") as fh:
        json.dump(params, fh)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_path, old)
    os.rename(staging, index_path)
    shutil.rmtree(old)
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "files_before": files_before,
        "files_after": len(_index_data_files(index_path)),
    }


def minhash_index_probe(
    spark: SparkSession,
    index_path: str,
    new_docs: DataFrame,
    history: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket_size: int = 64,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Near-dup pairs (a, b, jaccard) between ``new_docs`` and the
    indexed corpus, a < b, exact jaccard >= ``threshold``.

    ``history`` supplies the text of indexed documents for the exact
    verification join (the index stores only bucket keys — at scale the
    corpus lives in the lake anyway; only the few implicated documents
    are ever read). Self-matches (a re-crawled id probing against its
    own index entry) are dropped.

    ``max_bucket_size`` drops index buckets larger than the cap *among
    the matched subset* — template buckets carry no pair signal and
    their fanout is what melts a probe against skewed history.

    ``broadcast_batch`` gates EVERY batch-derived broadcast hint in the
    probe (touched buckets, surviving buckets, the batch's band
    entries, and the two shingle-set verification sides). The default
    assumes the incremental premise — today's batch is small next to
    the history — but a heavy day (~10^8 crawled docs → billions of
    band entries) or a dup-storm (shingle sets scale with candidate
    pairs × document length) breaks that premise and a forced broadcast
    would OOM every executor; knob off → no hint is emitted and AQE
    sizes the joins from runtime statistics (the semi-join shapes
    survive either way). Same one-knob discipline as
    ``operators/triangles.py::triangle_stats(broadcast_closing=...)``.
    """
    if is_versioned_index(spark, index_path):
        p, index, _ = _vidx_read(spark, index_path)  # tombstone-filtered
    else:
        _recover_index(index_path)  # finish any interrupted compaction
        if not os.path.exists(_meta_path(index_path)):
            raise FileNotFoundError(f"no index meta at {index_path}")
        with open(_meta_path(index_path)) as fh:
            p = json.load(fh)
        index = _read_index(spark, index_path)
        tombs = _read_idx_deletes(spark, index_path)
        if tombs is not None:
            # immediate delete semantics (minhash_index_delete): no
            # hint — AQE sizes the anti-join
            index = index.join(tombs, "doc", "left_anti")
    from pyspark import StorageLevel

    # the batch's band entries feed three plan branches (touched-bucket
    # probe, pair join, and the verification's id set); the batch is
    # small BY DEFINITION (that's the incremental premise), so persist
    # it once rather than re-running the 64-hash signature pipeline per
    # branch — measured 8.5 s → 3.4 s for a 10% batch at sf0.1
    _hint = F.broadcast if broadcast_batch else (lambda df: df)
    new_entries = _band_entries(
        new_docs, id_col, text_col, p["n"], p["num_hashes"], p["bands"]
    ).persist(StorageLevel.MEMORY_AND_DISK)
    touched = new_entries.select("band", "bucket").distinct()
    # one scan of the (huge) index: keep only buckets the batch touches
    matched = index.join(_hint(touched), ["band", "bucket"], "left_semi")
    matched = matched.persist(StorageLevel.MEMORY_AND_DISK)
    ok_buckets = (
        matched.groupBy("band", "bucket")
        .agg(F.count("*").alias("idx_sz"))
        .filter(F.col("idx_sz") <= max_bucket_size)
        .select("band", "bucket")
    )
    candidates = (
        matched.join(_hint(ok_buckets), ["band", "bucket"], "left_semi")
        .select("band", "bucket", F.col("doc").alias("old"))
        .join(
            _hint(
                new_entries.select("band", "bucket", F.col("doc").alias("new"))
            ),
            ["band", "bucket"],
        )
        .filter(F.col("old") != F.col("new"))
        .select(
            F.least("old", "new").alias("a"),
            F.greatest("old", "new").alias("b"),
        )
        .distinct()
        # candidates feed the two id-union branches and the final
        # semi-join; tiny relation, same persist rationale as above
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Exact verification over only the implicated documents — but in the
    # PAIR-JOIN shape, not the whole-corpus postings self-join: with the
    # candidate pairs already known, jaccard is set-intersection per
    # pair. One shingle pass over the implicated docs, two broadcast
    # joins (the implicated set is small by construction), zero postings
    # shuffles — measured 4.9 s → ~1 s on the sf0.1 batch probe. Values
    # are identical to the postings formulation: both score the DISTINCT
    # n-gram sets (q142's oracle recomputes them relationally).
    cand_ids = (
        candidates.select(F.col("a").alias(id_col))
        .union(candidates.select(F.col("b").alias(id_col)))
        .distinct()
    )
    implicated = (
        history.select(id_col, text_col)
        .join(cand_ids, id_col, "left_semi")
        .unionByName(
            new_docs.select(id_col, text_col).join(
                cand_ids, id_col, "left_semi"
            )
        )
        .dropDuplicates([id_col])
    )
    sets_ = with_shingles(implicated, text_col, p["n"]).select(
        id_col, F.array_distinct("shingles").alias("sh")
    )
    sa = sets_.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    sb = sets_.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        candidates.join(_hint(sa), "a")
        .join(_hint(sb), "b")
        .withColumn(
            "jaccard",
            inter / (F.size("sh_a") + F.size("sh_b") - inter),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Versioned (object-store-capable) index layout
#
# The flat layout above publishes compactions via os.rename — atomic on
# a local/HDFS-semantics filesystem, impossible on S3-style object
# stores, which is why optimize_index guards against non-local paths.
# The versioned layout removes that limit by storing the index as a
# LOG-STRUCTURED sequence of snapshots under the same versioned-CAS
# protocol the lakehouse tables use (sinks/versioned.py commit_staged):
#
#   index_path/snap_00000001/   <- founding build's band entries
#   index_path/snap_00000002/   <- batch 2's entries (append = one
#                                  cheap snapshot of JUST the batch)
#   index_path/snap_00000003/   <- compaction: all live entries binned,
#                                  carries a _compacts_through_2 marker
#
# The live index is the UNION of snapshots above the newest compaction
# watermark. Appends are commit_version CAS races (two concurrent
# appenders serialize; the loser retries with a new version number —
# nothing is lost). Compaction reads the live set, writes the folded
# entries + the watermark marker into staging, commits, THEN prunes the
# compacted-away snapshots — a crash between commit and prune leaves
# extra snapshots that every entry point's recovery pass deletes
# idempotently (the marker, not the prune, is the source of truth; the
# flat layout's interrupted-swap tests port 1:1 to this window).
# Params/schema ride INSIDE each snapshot (_params.json/_schema.json,
# written to staging before the rename) so metadata publishes
# atomically with data; underscore names are invisible to parquet.
# Epoch-fence markers (_epoch_*) ride the same way and are carried
# forward by compaction — the exactly-once streaming ingest's replay
# detection (streaming/jobs.py run_incremental_dedup_stream with
# exactly_once=True).
#
# Trade vs the flat layout: snapshots are NOT partitioned by band
# (partition discovery across multiple snapshot roots conflicts), so
# per-band file pruning is lost — acceptable because probes touch every
# band anyway; per-band parallelism comes from file splits. Probe and
# optimize_index auto-detect the layout; founding a versioned index is
# ``minhash_index_build(..., layout="versioned")``.

_COMPACT_MARK = "_compacts_through_"
_SNAP = "snap_"


def is_versioned_index(spark: SparkSession, index_path: str) -> bool:
    from ..sinks.versioned import list_versions

    try:
        return bool(list_versions(spark, index_path))
    except Exception:
        return False


def _vidx_recover_live(spark: SparkSession, index_path: str) -> list[str]:
    """Recovery + live-set listing in one pass (idempotent — a crash
    between a compaction's commit and its prune just leaves this pass
    more to do); folded snapshots are pruned with the shared
    one-compaction-cycle grace window (``sinks/versioned.py
    recover_live_snapshots`` — same protocol as the text and vector
    indexes). Returns the surviving snapshot paths oldest-first."""
    from ..sinks.versioned import recover_live_snapshots

    return recover_live_snapshots(spark, index_path, _COMPACT_MARK)


def vacuum_minhash_index(spark: SparkSession, index_path: str) -> list:
    """Collapse the retention grace window for an index whose
    compaction cadence has stopped: delete every snapshot folded by the
    NEWEST compaction watermark (the recover pass keeps those one full
    compaction cycle, which is forever if no later compaction comes).
    Only safe when no in-flight probe captured pre-compaction snapshot
    paths. Returns the deleted snapshot names."""
    from ..sinks.versioned import vacuum_snapshots

    return vacuum_snapshots(spark, index_path, _COMPACT_MARK)


def _vidx_read(
    spark: SparkSession, index_path: str
) -> tuple[dict, DataFrame, list[str]]:
    """(params, live entries DF, live snapshot paths). Explicit-schema
    read so an all-tombstoned (empty) compacted snapshot stays
    readable."""
    from pyspark.sql.types import StructType

    from ..sinks.versioned import fs_read_json

    live = _vidx_recover_live(spark, index_path)
    if not live:
        raise FileNotFoundError(f"no versioned index at {index_path}")
    params = fs_read_json(spark, f"{live[-1]}/_params.json")
    schema = StructType.fromJson(
        fs_read_json(spark, f"{live[-1]}/_schema.json")
    )
    # delete snapshots (minhash_index_delete) contribute tombstone
    # sets; the returned relation is pre-filtered so probes and the
    # compaction fold serve only live documents. No hint: tombstone
    # sets can be large at scale — AQE sizes the anti-join.
    from functools import reduce

    from pyspark.sql.types import LongType, StructField

    from ..sinks.versioned import snapshot_members

    del_paths = [
        p for p in live if "_deletes" in snapshot_members(spark, p)
    ]
    if not del_paths:
        return params, spark.read.schema(schema).parquet(*live), live

    def _v(p: str) -> int:
        return int(p.rsplit(_SNAP, 1)[1])

    # tombstones are VERSION-SCOPED (same contract as the text index's
    # _tidx_read): a delete at version d suppresses only entries
    # committed before it, so a doc re-appended after its deletion is
    # probed again instead of being silently dark forever.
    # Deliberate trade-off: once ANY delete snapshot exists, the live
    # set is N per-snapshot reads unioned with a literal __sv column
    # (version scoping needs to know which snapshot a row came from)
    # instead of the one multi-path read above — every probe on a
    # tombstone-carrying index pays that union until the next
    # compaction purges the tombstones and restores the fast path, so
    # compact soon after bulk deletes on large snapshot counts.
    entries = reduce(
        DataFrame.unionByName,
        [
            spark.read.schema(schema)
            .parquet(p)
            .withColumn("__sv", F.lit(_v(p)))
            for p in live
        ],
    )
    t_schema = StructType([StructField("doc", LongType())])
    tombs = (
        reduce(
            DataFrame.unionByName,
            [
                spark.read.schema(t_schema)
                .parquet(f"{p}/_deletes")
                .withColumn("__dv", F.lit(_v(p)))
                for p in del_paths
            ],
        )
        .groupBy("doc")
        .agg(F.max("__dv").alias("__dv"))
        .select(F.col("doc").alias("__tdoc"), "__dv")
    )
    cond = (F.col("doc") == F.col("__tdoc")) & (
        F.col("__dv") > F.col("__sv")
    )
    entries = entries.join(tombs, cond, "left_anti").drop("__sv")
    return params, entries, live


def versioned_index_has_epoch(
    spark: SparkSession, index_path: str, epoch_mark: str
) -> bool:
    """True when a live snapshot carries ``epoch_mark`` — the replay
    fence: an at-least-once re-delivery of a committed batch is
    detected and skipped (markers survive compaction: the compacted
    snapshot carries every mark of the snapshots it folded)."""
    from ..sinks.versioned import snapshot_members

    for snap in _vidx_recover_live(spark, index_path):
        if epoch_mark in snapshot_members(spark, snap):
            return True
    return False


def _vidx_commit(
    spark: SparkSession,
    index_path: str,
    entries: DataFrame,
    params: dict,
    marks: list[str],
    base_version: int,
    deletes: DataFrame | None = None,
) -> int:
    from ..sinks.versioned import commit_staged, fs_touch, fs_write_json

    schema_json = entries.schema.jsonValue()

    def populate(staging: str) -> None:
        entries.write.mode("overwrite").parquet(staging)
        if deletes is not None:
            # underscore name: invisible to the root band-entry read
            deletes.write.mode("overwrite").parquet(f"{staging}/_deletes")
        fs_write_json(spark, f"{staging}/_params.json", params)
        fs_write_json(spark, f"{staging}/_schema.json", schema_json)
        for m in marks:
            fs_touch(spark, f"{staging}/{m}")

    return commit_staged(spark, index_path, base_version, populate)


def _vidx_delete(
    spark: SparkSession,
    index_path: str,
    ids: DataFrame,
    max_retries: int = 10,
) -> int:
    """Tombstone documents out of a VERSIONED dedup index: one CAS
    snapshot carrying only the tombstone set (zero band entries). Ids
    already tombstoned are dropped so re-deletes commit nothing."""
    from ..sinks.versioned import CommitConflict

    for _ in range(max_retries):
        params, entries, live = _vidx_read(spark, index_path)
        # entries is pre-filtered: an id with no surviving entry is
        # either unknown or already tombstoned — skip both
        fresh = ids.join(
            entries.select("doc").distinct(), "doc", "left_semi"
        )
        n = fresh.count()
        if n == 0:
            return 0
        base = int(live[-1].rsplit(_SNAP, 1)[1])
        try:
            _vidx_commit(
                spark,
                index_path,
                entries.limit(0),
                params,
                [],
                base,
                deletes=fresh,
            )
            return n
        except CommitConflict:
            continue  # concurrent append/delete; recompute and retry
    raise CommitConflict(
        f"delete on {index_path} lost {max_retries} CAS races"
    )



def minhash_index_apply_cdc(
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    epoch_mark: str | None = None,
    max_retries: int = 10,
) -> dict | None:
    """Apply one CDC batch (adds + deletes mixed, ``op_col`` ==
    ``'delete'`` marks deletions) to a VERSIONED dedup index as ONE
    CAS snapshot — completing the CDC contract across all three index
    families (``text_index_apply_cdc`` / ``vector_index_apply_cdc``):
    the tombstone set, the new band entries, and the ``epoch_mark``
    ride the same commit, so a CDC ingest stream is replay-idempotent.
    Two separate commits cannot share one fence, and version-scoped
    tombstones (``_vidx_read``) make a redelivered delete epoch kill
    an already-landed re-add; with one snapshot a replayed epoch finds
    its mark and skips whole (``None``), and delete+re-add of one doc
    in the same batch lands as the re-add (tombstones suppress only
    STRICTLY LOWER versions).

    Delete ids not live are ignored; a no-op batch still commits its
    (empty) marked snapshot so whole-source replays stay invariant.
    Adds are UPSERTS: the batch is first reduced to one row per id
    (``cdc_dedup_adds`` — deterministic winner, so duplicate add rows
    cannot commit duplicate band entries), and an add whose id is
    already live tombstones the old version in the SAME snapshot, so
    exactly one version of a doc is ever probed.
    The index must already exist (founding goes through
    ``minhash_index_build``); banding params come from the recorded
    meta. Returns ``{"n_added", "n_tombstoned", "version"}`` or
    ``None`` when fenced."""
    from ..sinks.versioned import CommitConflict

    spark = batch.sparkSession
    if not is_versioned_index(spark, index_path):
        raise ValueError(
            f"no versioned dedup index at {index_path}: found it with "
            "minhash_index_build(layout='versioned') before applying CDC"
        )
    params = _vidx_read(spark, index_path)[0]
    dels = (
        batch.filter(F.col(op_col) == "delete")
        .select(F.col(id_col).cast("bigint").alias("doc"))
        .distinct()
    )
    from ..sinks.versioned import cdc_dedup_adds

    adds = cdc_dedup_adds(
        batch.filter(
            F.coalesce(F.col(op_col), F.lit("add")) != "delete"
        ).select(id_col, text_col),
        id_col,
        [text_col],
    )
    # upsert semantics: an add of a live doc replaces it — the old
    # version joins the victim set and is tombstoned in the same
    # snapshot (tombstones suppress strictly LOWER versions only)
    upserts = dels.unionByName(
        adds.select(F.col(id_col).cast("bigint").alias("doc"))
    ).distinct()
    # the add-side entries are a pure function of the batch + the
    # recorded banding params — built once, outside the CAS retry loop
    entries = _band_entries(
        adds, id_col, text_col,
        params["n"], params["num_hashes"], params["bands"],
    )
    n_add = adds.count()
    marks = [epoch_mark] if epoch_mark else []
    for _ in range(max_retries):
        if epoch_mark and versioned_index_has_epoch(
            spark, index_path, epoch_mark
        ):
            return None  # replayed epoch: everything already landed
        _p, live_entries, live = _vidx_read(spark, index_path)
        # victims depend on the live head — recomputed per CAS attempt
        vic = upserts.join(
            live_entries.select("doc").distinct(), "doc", "left_semi"
        )
        n_vic = vic.count()
        base = int(live[-1].rsplit(_SNAP, 1)[1])
        try:
            v = _vidx_commit(
                spark, index_path, entries, params, marks, base,
                deletes=vic if n_vic else None,
            )
            return {"n_added": n_add, "n_tombstoned": n_vic, "version": v}
        except CommitConflict:
            continue  # concurrent writer advanced the head; retry
    raise CommitConflict(
        f"CDC apply on {index_path} lost {max_retries} CAS races"
    )


def minhash_index_stats(spark: SparkSession, index_path: str) -> dict:
    """DESCRIBE INDEX for the MinHash dedup index (the
    ``vector_index_stats`` / ``text_index_stats`` twin — the shared
    observability surface of the three persisted index families):

    - recorded quantizer shape (``n``, ``num_hashes``, ``bands``);
    - ``layout`` / ``live_snapshots`` / ``data_files`` /
      ``n_pending_tombstones`` (same operational meanings as the other
      two families);
    - ``n_docs`` (live documents) and ``n_entries`` — the invariant
      ``n_entries == n_docs * bands`` catches double-ingest, the exact
      bug the epoch fence exists to prevent;
    - bucket pressure: ``max_bucket`` / ``mean_bucket`` /
      ``n_buckets`` — probe fanout is quadratic in bucket size, so
      ``max_bucket`` is the direct input for tuning the
      ``max_bucket_size`` skew cap.

    One aggregate over live entries + directory listings. File counts
    go through the Hadoop FS API (``sinks/versioned.py
    fs_count_data_files``) so they are correct wherever the index lives
    — os.walk would silently report 0 data files on object-store paths.
    """
    from ..sinks.versioned import fs_count_data_files

    def _n_data_files(root: str) -> int:
        return fs_count_data_files(spark, root)

    versioned = is_versioned_index(spark, index_path)
    if versioned:
        params, entries, live = _vidx_read(spark, index_path)
        snapshots = len(live)
        files = sum(_n_data_files(p) for p in live)
        from pyspark.sql.types import LongType, StructField, StructType

        from ..sinks.versioned import snapshot_members

        del_paths = [
            f"{p}/_deletes" for p in live
            if "_deletes" in snapshot_members(spark, p)
        ]
        t_schema = StructType([StructField("doc", LongType())])
        tombs = (
            spark.read.schema(t_schema).parquet(*del_paths)
            .select("doc").distinct().count()
            if del_paths
            else 0
        )
    else:
        _recover_index(index_path)
        with open(_meta_path(index_path)) as fh:
            params = json.load(fh)
        entries = _read_index(spark, index_path)
        deletes = _read_idx_deletes(spark, index_path)
        tombs = deletes.count() if deletes is not None else 0
        if deletes is not None:
            entries = entries.join(deletes, "doc", "left_anti")
        snapshots = 1
        files = _n_data_files(index_path)
    agg = entries.agg(
        F.count("*").alias("n_entries"),
        F.countDistinct("doc").alias("n_docs"),
    ).first()
    bagg = entries.groupBy("band", "bucket").agg(
        F.count("*").alias("sz")
    ).agg(
        F.max("sz").alias("mx"),
        F.avg("sz").alias("mean"),
        F.count("*").alias("n_buckets"),
    ).first()
    return {
        "layout": "versioned" if versioned else "flat",
        "n": params["n"],
        "num_hashes": params["num_hashes"],
        "bands": params["bands"],
        "n_docs": int(agg["n_docs"] or 0),
        "n_entries": int(agg["n_entries"] or 0),
        "n_pending_tombstones": tombs,
        "live_snapshots": snapshots,
        "data_files": files,
        "n_buckets": int(bagg["n_buckets"] or 0),
        "max_bucket": int(bagg["mx"] or 0),
        "mean_bucket": float(bagg["mean"] or 0.0),
    }


def versioned_index_append(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    epoch_mark: str | None = None,
    max_retries: int = 10,
    max_snapshots: int | None = None,
) -> int | None:
    """Append a batch's band entries as one new snapshot (CAS commit —
    concurrent appenders serialize, the loser retries with the next
    version number). ``epoch_mark`` fences replays: if any live
    snapshot already carries it, the append is SKIPPED and None is
    returned — the exactly-once contract for streaming ingest. Returns
    the committed version otherwise.

    ``max_snapshots``: auto-compaction threshold — after the append
    commits, a live snapshot count above it triggers ``optimize_index``
    under the usual CAS publish (bounds the per-probe snapshot union)."""
    from ..sinks.versioned import CommitConflict, list_versions

    spark = docs.sparkSession
    params, _, _ = _vidx_read(spark, index_path)
    entries = _band_entries(
        docs, id_col, text_col,
        params["n"], params["num_hashes"], params["bands"],
    )
    marks = [epoch_mark] if epoch_mark else []
    for _ in range(max_retries):
        if epoch_mark and versioned_index_has_epoch(
            spark, index_path, epoch_mark
        ):
            return None  # replayed batch: already committed
        base = (list_versions(spark, index_path) or [0])[-1]
        try:
            v = _vidx_commit(
                spark, index_path, entries, params, marks, base
            )
            break
        except CommitConflict:
            continue  # another writer advanced the head; retry
    else:
        raise CommitConflict(
            f"append to {index_path} lost {max_retries} CAS races"
        )
    if max_snapshots and len(
        _vidx_recover_live(spark, index_path)
    ) > max_snapshots:
        optimize_index(spark, index_path)
    return v


def _vidx_found(
    docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    params: dict,
    epoch_mark: str | None = None,
) -> int:
    """Found a NEW versioned index (snapshot 1)."""
    from ..sinks.versioned import list_versions

    spark = docs.sparkSession
    if list_versions(spark, index_path):
        raise ValueError(
            f"versioned index already exists at {index_path}; use "
            "mode='append'"
        )
    entries = _band_entries(
        docs, id_col, text_col,
        params["n"], params["num_hashes"], params["bands"],
    )
    return _vidx_commit(
        spark, index_path, entries, params,
        [epoch_mark] if epoch_mark else [], 0,
    )


def _vidx_optimize(
    spark: SparkSession,
    index_path: str,
    target_file_rows: int,
    tombstones: DataFrame | None,
    max_retries: int = 10,
) -> dict:
    """Compaction for the versioned layout: fold the live snapshots
    into one (optionally purging tombstoned docs), publish via CAS with
    a ``_compacts_through_<base>`` watermark marker riding inside the
    snapshot, then prune. Object-store capable — no renames of existing
    data, only the commit protocol's staging publish. Epoch-fence
    markers of the folded snapshots are carried forward, so replay
    detection survives compaction."""
    import math

    from ..sinks.versioned import CommitConflict, snapshot_members

    for _ in range(max_retries):
        params, index, live = _vidx_read(spark, index_path)
        base = int(live[-1].rsplit(_SNAP, 1)[1])
        files_before = sum(
            1
            for snap in live
            for m in snapshot_members(spark, snap)
            if m.endswith(".parquet") and not m.startswith(("_", "."))
        )
        rows_before = index.count()
        kept = index
        if tombstones is not None:
            dead = tombstones.toDF("doc")
            kept = index.join(dead, "doc", "left_anti")
        bands = params["bands"]
        per_band = math.ceil(max(rows_before, 1) / bands)
        bins = max(1, math.ceil(per_band / target_file_rows))
        carried = sorted(
            {
                m
                for snap in live
                for m in snapshot_members(spark, snap)
                if m.startswith("_epoch_")
            }
        )
        compacted = (
            kept.withColumn("__bin", F.pmod(F.hash("doc"), F.lit(bins)))
            .repartition(bands * bins, "band", "__bin")
            .drop("__bin")
        )
        try:
            _vidx_commit(
                spark,
                index_path,
                compacted,
                params,
                carried + [f"{_COMPACT_MARK}{base}"],
                base,
            )
            break
        except CommitConflict:
            continue  # an append raced in; fold it too and retry
    else:
        raise CommitConflict(
            f"compaction of {index_path} lost {max_retries} CAS races"
        )
    live_after = _vidx_recover_live(spark, index_path)  # prunes through the previous watermark
    _, after, _ = _vidx_read(spark, index_path)
    return {
        "rows_before": rows_before,
        "rows_after": after.count(),
        "files_before": files_before,
        "files_after": sum(
            1
            for snap in live_after
            for m in snapshot_members(spark, snap)
            if m.endswith(".parquet") and not m.startswith(("_", "."))
        ),
    }
