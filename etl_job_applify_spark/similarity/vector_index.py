"""Persisted IVF(/PQ) vector index: the steady-state serving shape of
embedding similarity search over a 100 TB corpus.

The recompute kernels (``ann_topk_ivf`` / ``ann_topk_ivfpq``) re-train
the coarse quantizer and re-assign every corpus vector per query batch —
correct for one-shot analytics, the wrong steady-state shape for
serving: the corpus-sized assignment pass is paid on every query. This
module pays it ONCE, at ingest, with the exact lifecycle the persisted
text index proved out (``functions/text_index.py``) and the FAISS
build/serve split (Jégou et al., TPAMI 2011; Johnson et al., 2017):

- ``vector_index_build`` trains the coarse quantizer (and optional PQ
  codebooks) ONCE at founding time and persists
  - ``centroids/``: one row per cell (the quantizer is immutable after
    founding — appended batches are assigned with the FOUNDING
    centroids, the standard IVF contract that keeps historical
    assignments valid without re-layout);
  - ``codebooks/`` (``m > 0``): per-subspace PQ codebooks, so the index
    carries its own compressed-domain scan path;
  - ``cells/``: the corpus re-laid-out PARTITIONED BY cell id, each row
    carrying (vid, vec, norm[, codes]) — a probe's cell filter is a
    physical disk-pruning ratio (``nprobe / num_cells`` of the index is
    read), not just a join-size reduction;
  ``mode="append"`` ingests a new batch (assign + encode with the
  recorded quantizer, no retraining) and increments the exact vector
  count; quantizer parameters must match the recorded ones or the
  build raises.
- ``vector_index_probe`` serves a query batch: probe cells collect to a
  STATIC partition filter, exact cosine (or ADC shortlist + exact
  refine when PQ codes are present) runs inside the probed cells only,
  through the SAME scoring expressions as the recompute kernels —
  probe results are bit-identical to ``ann_topk_ivf(...,
  centroids=<recorded>)`` over the same live corpus (pinned by
  tests/test_vector_index.py and the q232 registry oracle).
- ``vector_index_delete`` tombstones vectors out of the index (the
  GDPR path: results change NOW, space is reclaimed at compaction);
  version-scoped on the versioned layout so delete-then-re-append
  serves again, exactly like the text index.
- ``optimize_vector_index`` compacts append-grown small files and
  purges tombstones — flat layout via the staging + directory-swap +
  crash-recovery publish, versioned layout through the CAS watermark
  protocol (object-store capable).

Layouts, shared verbatim with the text index:

- ``layout="versioned"`` (DEFAULT): a log of CAS-committed snapshots
  (``sinks/versioned.py commit_staged``), each COMPLETE for its batch —
  a cell-partitioned ``cells/`` subtree and a ``_params.json`` carrying
  the batch's exact vector-count increment; the FOUNDING snapshot (and
  every compacted snapshot) additionally carries ``centroids/`` and
  ``codebooks/`` so quantizer state survives snapshot pruning. Live
  count = sum over live snapshots; appends never CAS a global meta.
  Optional ``epoch_mark`` fences streaming replays.
- ``layout="flat"``: a single partitioned directory + meta JSON; local
  filesystems only (the compaction publish is an ``os.rename`` swap).

Scale: probe cost is ``nprobe/num_cells`` of the index scanned (ADC
makes the scan m byte-code adds per vector when PQ is on) + a
shortlist-sized exact refine — independent of corpus size except
through cell size. The assignment pass the recompute path pays per
query batch is paid once per vector here and amortized over every
later query.

Reference lineage: the reference engine has no vector search at all
(SURVEY.md §2 north-star extension); the lifecycle contract mirrors
``functions/text_index.py`` so both serving indexes behave identically
under append/delete/compact/crash.
"""

from __future__ import annotations

import json
import math
import os
import shutil

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, with_norm
from ..sources.local import local_relation
from .ivf import _centroid_assign_expr, _centroid_dists_sql, train_centroids
from .pq import (
    _adc_lut_expr,
    adc_lut_raw_expr,
    pq_encode_expr,
    pq_encode_raw_expr,
    residual_col,
    train_pq_codebooks,
    train_residual_quantizer,
)

_META = "_vector_index_meta.json"
_V_COMPACT_MARK = "_compacts_through_"

#: largest query batch ``vector_index_probe(escalate=True)`` accepts:
#: escalation's per-round bookkeeping (collected id lists -> isin
#: literal filters) is control-plane by contract; above this, the
#: guard routes callers to ``vector_index_knn_join(ensure_k=True)``
ESCALATE_MAX_BATCH = 10_000


# ---------------------------------------------------------------------------
# shared helpers


def _meta_path(index_path: str) -> str:
    return os.path.join(index_path, _META)


def _read_meta(index_path: str) -> dict:
    if not os.path.exists(_meta_path(index_path)):
        raise FileNotFoundError(f"no vector index meta at {index_path}")
    with open(_meta_path(index_path)) as fh:
        return json.load(fh)


def _write_meta(index_path: str, meta: dict) -> None:
    os.makedirs(index_path, exist_ok=True)
    with open(_meta_path(index_path), "w") as fh:
        json.dump(meta, fh)


def _centroids_df(
    spark: SparkSession,
    centroids: np.ndarray,
    offsets: np.ndarray | None = None,
) -> DataFrame:
    """One row per cell. ``offsets`` (residual-PQ indexes): the per-cell
    residual offsets ride the SAME relation as an extra column, so the
    whole quantizer travels as one artifact through compaction/reindex
    (the quantizer_src copy-forward moves it verbatim)."""
    if offsets is None:
        return local_relation(
            spark,
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        ).coalesce(1)
    return local_relation(
        spark,
        [
            (i, [float(x) for x in c], [float(x) for x in o])
            for i, (c, o) in enumerate(zip(centroids, offsets))
        ],
        "cell int, centroid array<double>, offset array<double>",
    ).coalesce(1)


def _codebooks_df(spark: SparkSession, codebooks: np.ndarray) -> DataFrame:
    m, k, _ = codebooks.shape
    return local_relation(
        spark,
        [
            (j, c, [float(x) for x in codebooks[j, c]])
            for j in range(m)
            for c in range(k)
        ],
        "j int, c int, code array<double>",
    ).coalesce(1)


def _local_small_rows(path: str) -> list[dict] | None:
    """Driver-side pyarrow read of a tiny control-plane parquet subtree
    (quantizer/codebooks: O(num_cells + m*k) rows by construction,
    written ``coalesce(1)``). Returns plain row dicts, or None when the
    path is non-local/unreadable — callers fall back to the Spark read,
    the only path object stores can take. Motivation (guide §1.2 "don't
    compute things you throw away" at the job level): the Spark read of
    one of these artifacts costs a schema-inference job plus a collect
    job per PROBE, pure scheduler latency for a relation that is
    driver-destined control-plane data anyway."""
    from ..sinks.stats import _local_path

    p = _local_path(path)
    if p is None or not os.path.exists(p):
        return None
    try:
        import pyarrow.parquet as pq

        # directory reads skip '_'/'.' prefixed files (_SUCCESS) by
        # default, matching what the Spark scan would select
        return pq.read_table(p).to_pylist()
    except Exception:
        return None


def _load_quantizer(
    spark: SparkSession, path: str
) -> tuple[np.ndarray, np.ndarray | None]:
    """(centroids, residual offsets | None) from a centroids subtree."""
    local = _local_small_rows(path)
    if local:
        rows = sorted(local, key=lambda r: r["cell"])
        has_off = "offset" in rows[0]
    else:
        df = spark.read.parquet(path)
        has_off = "offset" in df.columns
        rows = df.orderBy("cell").collect()
    cents = np.array([r["centroid"] for r in rows])
    offs = np.array([r["offset"] for r in rows]) if has_off else None
    return cents, offs


def _load_centroids(spark: SparkSession, path: str) -> np.ndarray:
    return _load_quantizer(spark, path)[0]


def _load_codebooks(spark: SparkSession, path: str) -> np.ndarray:
    local = _local_small_rows(path)
    if local:
        rows = sorted(local, key=lambda r: (r["j"], r["c"]))
    else:
        rows = spark.read.parquet(path).orderBy("j", "c").collect()
    m = 1 + max(r["j"] for r in rows)
    k = 1 + max(r["c"] for r in rows)
    d_sub = len(rows[0]["code"])
    out = np.empty((m, k, d_sub))
    for r in rows:
        out[r["j"], r["c"]] = r["code"]
    return out


#: internal column names of the cells relation — a meta col that
#: shadows one would produce an ambiguous/duplicate column at ingest or
#: probe time with a confusing Spark error, so founding rejects them
RESERVED_INDEX_COLS = frozenset(
    {"cell", "vid", "vec", "norm", "codes", "__resid"}
)


def _check_meta_col_names(meta_cols) -> None:
    bad = sorted(RESERVED_INDEX_COLS.intersection(meta_cols or ()))
    if bad:
        raise ValueError(
            f"meta_cols {bad} collide with the index's internal column "
            f"names {sorted(RESERVED_INDEX_COLS)}; rename them before "
            "founding"
        )


def _encode_cells(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    codebooks: np.ndarray | None,
    meta_cols: tuple | list = (),
    pq_encoding: str = "plain",
    offsets: np.ndarray | None = None,
) -> DataFrame:
    """The ingest transform: (cell, vid, vec, norm[, codes][, meta...])
    — chained narrow selects over one scan, assignment and PQ encoding
    in a single codegen stage (no join, no shuffle, no second pass).
    ``meta_cols`` ride each row so probes can push filter predicates
    INTO the index scan (filtered ANN: "top-k WHERE lang='en'").
    ``pq_encoding="residual"`` quantizes the vector's residual from its
    cell's unit centroid (FAISS IVFADC) instead of the vector itself."""
    base = with_norm(
        corpus.select(id_col, vec_col, *meta_cols), vec_col
    ).withColumn("cell", _centroid_assign_expr(vec_col, centroids))
    sel = [
        F.col("cell"),
        F.col(id_col).cast("bigint").alias("vid"),
        F.col(vec_col).alias("vec"),
        F.col("norm"),
    ]
    if codebooks is not None:
        if pq_encoding == "residual":
            base = base.withColumn(
                "__resid", residual_col(vec_col, "cell", offsets)
            )
            sel.append(
                pq_encode_raw_expr("__resid", codebooks).alias("codes")
            )
        else:
            sel.append(pq_encode_expr(vec_col, codebooks).alias("codes"))
    sel.extend(F.col(c) for c in meta_cols)
    return base.select(*sel)


def _probe_cells_expr(vec_col: str, centroids: np.ndarray, nprobe: int) -> str:
    """nprobe nearest cells per query — the SAME metric expression the
    build-side assignment uses (divergence would silently break
    recall)."""
    d_arr = _centroid_dists_sql(vec_col, centroids)
    return (
        f"transform(slice(array_sort(transform({d_arr},"
        f" (d, i) -> struct(d AS dist, i AS idx))), 1, {nprobe}), s -> s.idx)"
    )


def _index_data_files(index_path: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(index_path):
        out.extend(
            os.path.join(dirpath, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def _as_ids(spark: SparkSession, vec_ids) -> DataFrame:
    if not isinstance(vec_ids, DataFrame):
        vec_ids = local_relation(
            spark, [(int(d),) for d in vec_ids], "vid bigint"
        )
    col = vec_ids.columns[0]
    return vec_ids.select(
        F.col(col).cast("bigint").alias("vid")
    ).distinct()


# ---------------------------------------------------------------------------
# flat layout


def _recover_vector_index(index_path: str) -> None:
    """Finish an interrupted flat-layout ``optimize_vector_index`` swap
    (verbatim protocol of ``text_index._recover_text_index``)."""
    staging = index_path.rstrip("/") + "__compact"
    old = index_path.rstrip("/") + "__old"
    if not os.path.exists(_meta_path(index_path)):
        if os.path.exists(os.path.join(staging, _META)):
            os.rename(staging, index_path)
        elif os.path.exists(os.path.join(old, _META)):
            os.rename(old, index_path)
    if os.path.exists(_meta_path(index_path)):
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(os.path.join(staging, _META)):
            shutil.rmtree(staging, ignore_errors=True)


def _read_flat_cells(
    spark: SparkSession, index_path: str, meta: dict
) -> DataFrame:
    """Flat cells relation; explicit schema once recorded (a
    purge-everything compaction leaves zero data files — the recorded
    schema keeps the empty index a readable 0-row relation)."""
    schema_json = meta.get("cells_schema")
    if schema_json is not None:
        from pyspark.sql.types import StructType

        return spark.read.schema(StructType.fromJson(schema_json)).parquet(
            os.path.join(index_path, "cells")
        )
    return spark.read.parquet(os.path.join(index_path, "cells"))


def _read_flat_deletes(
    spark: SparkSession, index_path: str
) -> DataFrame | None:
    path = os.path.join(index_path, "deletes")
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path).select("vid").distinct()


# ---------------------------------------------------------------------------
# public API


def _check_append_params(meta: dict, expect: dict) -> None:
    """Append-mode quantizer-shape validation: explicitly passed
    ``num_cells``/``m``/``k_codes`` must match the recorded index (the
    recorded quantizer is ALWAYS the one used — a silent mismatch would
    leave the caller believing the index has a shape it doesn't)."""
    defaults = {"meta_cols": [], "pq_encoding": "plain"}
    bad = {
        k: (v, meta.get(k, defaults.get(k)))
        for k, v in expect.items()
        if v is not None and meta.get(k, defaults.get(k)) != v
    }
    if bad:
        raise ValueError(
            "append-mode quantizer params must match the recorded index "
            "(appends always use the founding quantizer; reshape via "
            "reindex_vector_index): "
            + ", ".join(
                f"{k}={v} vs recorded {r}" for k, (v, r) in bad.items()
            )
        )


def vector_index_build(
    corpus: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int | None = None,
    m: int | None = None,
    k_codes: int | None = None,
    seed: int = 7,
    mode: str = "overwrite",
    layout: str = "versioned",
    epoch_mark: str | None = None,
    centroids=None,
    codebooks=None,
    meta_cols: list[str] | None = None,
    max_snapshots: int | None = None,
    pq_encoding: str | None = None,
    offsets=None,
) -> dict:
    """Found or append to a persisted IVF(/PQ) index; returns the meta.

    ``pq_encoding`` (``m > 0`` only): ``"plain"`` (default) quantizes
    the normalized vector; ``"residual"`` quantizes its residual from
    the cell's unit centroid (FAISS IVFADC — lower quantization error
    at equal m, q239-gated). Recorded at founding; appends and probes
    follow the recorded value automatically.

    ``max_snapshots`` (versioned appends only): auto-compaction
    threshold — after the append commits, if the live snapshot count
    exceeds it, ``optimize_vector_index`` folds the log under the usual
    CAS publish. Bounds the N-way union every probe plans over (a
    long-running ingest stream otherwise grows one snapshot per epoch
    until someone compacts manually); probe results are unchanged by
    construction (compaction invariance is oracle-pinned by q232).

    ``m=0`` stores no PQ codes (exact-cosine probes only); ``m>0``
    additionally trains per-subspace codebooks and stores m-byte codes
    per vector, enabling the ADC shortlist scan at probe time. Founding
    defaults: ``num_cells=16, m=0, k_codes=16``.

    ``meta_cols``: metadata columns of ``corpus`` stored alongside each
    vector (recorded at founding; appends carry the same set, validated
    when passed explicitly) — the substrate for FILTERED probes
    (``vector_index_probe(..., where="lang = 'en'")``), where the
    predicate applies inside the probed-cells scan, before top-k.

    The quantizer (centroids, codebooks) is trained ONCE, at founding —
    ``mode="append"`` assigns and encodes the new batch with the
    RECORDED quantizer (retraining would strand historical assignments;
    re-shaping is ``reindex_vector_index``'s job once drift warrants a
    re-found). ``num_cells``/``m``/``k_codes`` passed explicitly on an
    append are VALIDATED against the recorded index and raise on
    mismatch; passing ``centroids``/``codebooks`` on an append raises
    outright. Pass ``centroids`` (num_cells × dim) at founding to pin
    the quantizer externally — deterministic-anchor builds are what
    make the q232 oracle exactly reproducible in SQL.

    Append id contract per layout: flat ids must never have been in the
    index (doc-scoped tombstones; same as the text index); versioned
    ids may be re-appended after deletion (version-scoped tombstones).
    """
    spark = corpus.sparkSession
    if mode == "append":
        if (
            centroids is not None
            or codebooks is not None
            or offsets is not None
        ):
            raise ValueError(
                "append-mode always uses the recorded quantizer; pass "
                "centroids/codebooks/offsets at founding or via "
                "reindex_vector_index"
            )
        expect = {
            "num_cells": num_cells,
            "m": m,
            "k_codes": k_codes,
            "meta_cols": list(meta_cols) if meta_cols is not None else None,
            "pq_encoding": pq_encoding,
        }
        if _vxi_is_versioned(spark, index_path):
            _vxi_append(
                corpus, index_path, id_col, vec_col,
                epoch_mark=epoch_mark, expect_params=expect,
            )
            if max_snapshots and len(
                _vxi_recover_live(spark, index_path)
            ) > max_snapshots:
                _vxi_optimize(spark, index_path, 4_000_000)
            return _vxi_read(spark, index_path)[0]
        if epoch_mark is not None:
            raise ValueError("epoch_mark requires the versioned layout")
        _recover_vector_index(index_path)
        meta = _read_meta(index_path)
        _check_append_params(meta, expect)
        cents, offs = _load_quantizer(
            spark, os.path.join(index_path, "centroids")
        )
        books = (
            _load_codebooks(spark, os.path.join(index_path, "codebooks"))
            if meta["m"]
            else None
        )
        batch = _encode_cells(
            corpus, id_col, vec_col, cents, books,
            meta_cols=meta.get("meta_cols", []),
            pq_encoding=meta.get("pq_encoding", "plain"),
            offsets=offs,
        )
        batch.write.mode("append").partitionBy("cell").parquet(
            os.path.join(index_path, "cells")
        )
        meta["n_vecs"] += corpus.count()
        _write_meta(index_path, meta)
        return meta

    _check_meta_col_names(meta_cols)
    num_cells = 16 if num_cells is None else num_cells
    m = 0 if m is None else m
    k_codes = 16 if k_codes is None else k_codes
    pq_encoding = "plain" if pq_encoding is None else pq_encoding
    if pq_encoding not in ("plain", "residual"):
        raise ValueError(f"unknown PQ encoding {pq_encoding!r}")
    if centroids is None:
        centroids = train_centroids(corpus, vec_col, num_cells, seed)
    centroids = np.asarray(centroids, dtype=np.float64)
    if codebooks is None and m:
        if pq_encoding == "residual":
            codebooks, offsets = train_residual_quantizer(
                corpus, centroids, vec_col, m, k_codes, seed
            )
        else:
            codebooks = train_pq_codebooks(corpus, vec_col, m, k_codes, seed)
    if codebooks is not None:
        codebooks = np.asarray(codebooks, dtype=np.float64)
        if pq_encoding == "residual" and offsets is None:
            raise ValueError(
                "pq_encoding='residual' with pinned codebooks needs the"
                " matching offsets (train_residual_quantizer returns"
                " both)"
            )
    offsets = (
        np.asarray(offsets, dtype=np.float64)
        if (offsets is not None and codebooks is not None
            and pq_encoding == "residual")
        else None
    )
    params = {
        "num_cells": int(len(centroids)),
        "m": int(codebooks.shape[0]) if codebooks is not None else 0,
        "k_codes": int(codebooks.shape[1]) if codebooks is not None else 0,
        "dim": int(centroids.shape[1]),
        "meta_cols": list(meta_cols or []),
        "pq_encoding": pq_encoding if codebooks is not None else "plain",
    }
    if layout == "versioned":
        _vxi_found(
            corpus, index_path, id_col, vec_col, centroids, codebooks,
            params, epoch_mark=epoch_mark, offsets=offsets,
        )
        return _vxi_read(spark, index_path)[0]
    if epoch_mark is not None:
        raise ValueError("epoch_mark requires the versioned layout")
    # re-founding over a prior FLAT index must not inherit its state:
    # stale tombstones would silently suppress re-founded vectors at
    # probe time (and n_vecs would overcount); a stale codebooks/
    # subtree from a prior m>0 build is dead weight under m=0
    _recover_vector_index(index_path)
    if os.path.exists(_meta_path(index_path)):
        shutil.rmtree(
            os.path.join(index_path, "deletes"), ignore_errors=True
        )
        shutil.rmtree(
            os.path.join(index_path, "codebooks"), ignore_errors=True
        )
        os.remove(_meta_path(index_path))
    _centroids_df(spark, centroids, offsets).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_path, "centroids"))
    if codebooks is not None:
        _codebooks_df(spark, codebooks).write.mode("overwrite").parquet(
            os.path.join(index_path, "codebooks")
        )
    cells = _encode_cells(
        corpus, id_col, vec_col, centroids, codebooks,
        meta_cols=params["meta_cols"],
        pq_encoding=params["pq_encoding"],
        offsets=offsets,
    )
    cells.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(index_path, "cells")
    )
    # record the read-back cells schema at founding (the discipline
    # optimize_vector_index already applies): every later probe's
    # _read_flat_cells then reads with the explicit schema instead of
    # paying a schema-inference job per probe — one tiny build-time job
    # buys a job off the steady-state serving path
    meta = dict(
        params,
        n_vecs=corpus.count(),
        cells_schema=spark.read.parquet(
            os.path.join(index_path, "cells")
        ).schema.jsonValue(),
    )
    _write_meta(index_path, meta)
    return meta


def _live_cells(spark: SparkSession, index_path: str):
    """(meta, centroids, codebooks|None, residual offsets|None, live
    cells DF) — tombstones already filtered out, both layouts."""
    if _vxi_is_versioned(spark, index_path):
        meta, cells, live = _vxi_read(spark, index_path)
        cpath = _vxi_quantizer_path(spark, live, "centroids")
        cents, offs = _load_quantizer(spark, cpath)
        books = None
        if meta["m"]:
            books = _load_codebooks(
                spark, _vxi_quantizer_path(spark, live, "codebooks")
            )
        return meta, cents, books, offs, cells
    _recover_vector_index(index_path)
    meta = _read_meta(index_path)
    cents, offs = _load_quantizer(
        spark, os.path.join(index_path, "centroids")
    )
    books = (
        _load_codebooks(spark, os.path.join(index_path, "codebooks"))
        if meta["m"]
        else None
    )
    cells = _read_flat_cells(spark, index_path, meta)
    deletes = _read_flat_deletes(spark, index_path)
    if deletes is not None:
        # no broadcast hint: tombstone sets can be large at scale — AQE
        # sizes the anti-join from runtime stats
        cells = cells.join(deletes, "vid", "left_anti")
    return meta, cents, books, offs, cells


def _probe_once(
    index_path: str,
    state: tuple,
    queries: DataFrame,
    k: int,
    nprobe: int,
    query_id_col: str,
    vec_col: str,
    use_codes: bool,
    shortlist: int,
    where,
) -> DataFrame:
    """One probe pass at a fixed nprobe (see vector_index_probe)."""
    from ..functions.vectors import py_norm
    from .ivf import py_probe_cells
    from .pq import py_lut, py_normed, py_residual

    meta, cents, books, offs, cells = state
    nprobe = min(nprobe, meta["num_cells"])
    # The query batch is control-plane small by contract (docstring):
    # collect it ONCE and plan the probe DRIVER-SIDE. Norms, probe
    # cells, residuals and ADC LUTs are computed with bit-exact Python
    # twins of the Spark expressions (py_norm/py_probe_cells/py_lut —
    # same IEEE-double left folds, pinned by
    # test_driver_probe_twins_bit_exact), then served to the joins as
    # JVM local relations of VALUES. What this removes, vs round 15:
    # the probe-cell distinct+collect job, and the O(num_cells×d) /
    # O(m×k×d_sub) centroid+LUT literal expression trees that every
    # DataFrame operation downstream re-analyzed — on the round-16
    # profile q234's wall was 2.8 s against 0.8 s of task time, almost
    # all py4j/analysis latency over those literals (guide §1.2/§5:
    # the driver should do almost no data work — and no giant-plan
    # work either). Scoring stays in Spark: cosine/ADC arithmetic over
    # these values is unchanged, and the values round-trip the driver
    # exactly (Arrow doubles).
    qsel = queries.select(query_id_col, vec_col)
    spark = qsel.sparkSession
    qid_t = qsel.schema.fields[0].dataType.simpleString()
    vec_t = qsel.schema.fields[1].dataType.simpleString()
    qrows = [(r[0], list(r[1])) for r in qsel.collect()]
    probes = []  # (qid, vec, norm, [probe cells])
    for qid, vec in qrows:
        probes.append(
            (qid, vec, py_norm(vec), py_probe_cells(vec, cents, nprobe))
        )
    needed = sorted({c for _, _, _, cs in probes for c in cs})
    pruned = cells.filter(F.col("cell").isin(needed))
    if where is not None:
        # inside the cells scan: parquet pushes the predicate down to
        # the pruned partitions; every later stage sees survivors only
        pruned = pruned.filter(
            F.expr(where) if isinstance(where, str) else where
        )
    if not use_codes:
        qn = local_relation(
            spark,
            [
                (c, qid, vec, norm)
                for qid, vec, norm, cs in probes
                for c in cs
            ],
            f"cell int, query_id {qid_t}, __qv {vec_t}, __qn double",
        )
        scored = pruned.join(F.broadcast(qn), "cell").withColumn(
            "cosine", cosine_expr("__qv", "vec", "__qn", "norm")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.col("neighbor")
        )
        return (
            scored.select(
                "query_id", F.col("vid").alias("neighbor"), "cosine"
            )
            .distinct()
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    if books is None:
        raise ValueError(
            f"index at {index_path} stores no PQ codes (built with m=0); "
            "use_codes probes need a PQ-enabled build"
        )
    if meta.get("pq_encoding", "plain") == "residual":
        # one LUT per (query, probed cell): the query's residual from
        # THAT cell's offset (FAISS IVFADC serving)
        qc_rows = [
            (c, qid, py_lut(py_residual(py_normed(vec, norm), c, offs), books))
            for qid, vec, norm, cs in probes
            for c in cs
        ]
    else:
        qc_rows = []
        for qid, vec, norm, cs in probes:
            lut = py_lut(py_normed(vec, norm), books)
            qc_rows.extend((c, qid, lut) for c in cs)
    qc = local_relation(
        spark,
        qc_rows,
        f"cell int, query_id {qid_t}, __lut array<array<double>>",
    )
    scored = (
        pruned.select("cell", "vid", "codes")
        .join(F.broadcast(qc), "cell")
        .withColumn(
            "adc_dist",
            F.expr(
                "aggregate(zip_with(__lut, codes, (l, c) -> l[c]),"
                " 0D, (a, v) -> a + v)"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vid")
    cand = (
        scored.select("query_id", "vid", "adc_dist")
        .distinct()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shortlist)
        .select("query_id", "vid")
    )
    # exact refine: raw vectors come from the SAME index rows (vec and
    # codes are colocated). Fetch from ``pruned`` — the partition-
    # filtered (+ predicate-filtered) cells scan — not the full live
    # relation: every shortlist candidate lives in a probed cell by
    # construction, so the join is semantically identical but reads
    # nprobe/num_cells of the index instead of 100% of it.
    qv = local_relation(
        spark,
        [(qid, vec, norm) for qid, vec, norm, _ in probes],
        f"query_id {qid_t}, __qv {vec_t}, __qn double",
    )
    refined = (
        cand.join(pruned.select("vid", "vec", "norm"), "vid")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", cosine_expr("__qv", "vec", "__qn", "norm"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor")
    )
    # same .distinct() the exact path applies: a vid duplicated in live
    # cells (a contract violation, but validated nowhere) must not
    # consume top-k rank slots twice on this path either
    return (
        refined.select("query_id", F.col("vid").alias("neighbor"), "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def vector_index_probe(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    use_codes: bool = False,
    shortlist: int = 64,
    where=None,
    escalate: bool = False,
) -> DataFrame:
    """(query_id, neighbor, cosine, rank) top-k from the persisted
    index.

    ``where`` (a SQL string or Column over the index's ``meta_cols``,
    plus ``vid``): FILTERED ANN — the predicate applies to the pruned
    cells scan BEFORE top-k (and before the ADC shortlist on the PQ
    path), so the full k survivors are guaranteed within the probed
    cells, unlike post-filtering the top-k, which silently returns
    fewer than k rows. The serving shape of "top-k WHERE lang='en'
    AND date > X"; build the index with ``meta_cols`` to use it.

    Default path: exact cosine inside the probed cells — bit-identical
    to ``ann_topk_ivf(corpus_live, queries, centroids=<recorded>)``
    (shared assignment/probe/scoring expressions; the parity the q232
    oracle pins). ``nprobe >= num_cells`` degenerates to exact
    brute-force over the live corpus — equal to ``cosine_topk`` —
    which is what lets the index serve the q200 hybrid-RRF contract
    exactly (q235).

    ``use_codes=True`` (requires a PQ-enabled index): ADC over the
    STORED codes shortlists candidates per query, exact cosine
    re-ranks the shortlist — the FAISS serving path where the
    compressed scan is cache-resident and raw vectors are touched for
    ``shortlist`` rows only. Matches ``ann_topk_ivfpq(...,
    centroids=<recorded>, codebooks=<recorded>, encoding=<recorded>)``
    over the live corpus. The index's recorded ``pq_encoding`` is
    followed automatically: on a residual-encoded index the ADC LUT is
    computed per (query, probed cell) from the query's cell residual.

    The query batch is control-plane small by contract (same premise
    as ``text_index_bm25``): its probe-cell set collects to the driver
    and becomes a STATIC partition filter, so the cells scan physically
    reads ``|probed cells| / num_cells`` of the index.

    ``escalate=True``: the under-return contract for selective
    predicates. A filtered probe guarantees full k only WITHIN the
    probed cells — a selective facet (``lang='is'``) can leave fewer
    than k predicate survivors in ``nprobe`` cells and the plain probe
    silently returns short. With escalation, queries whose result
    under-fills k re-probe with nprobe doubled, repeatedly, until they
    fill or the probe covers every cell (the predicate-filtered full
    scan — at that point a short result means fewer than k live
    survivors EXIST, the maximal answer). Queries that filled at the
    base nprobe keep their fast-path result unchanged (bit-identical
    to ``escalate=False``; their cells are never re-read). Escalation
    runs one control-plane count per round — bounded by
    ``log2(num_cells / nprobe)`` rounds — so it is a serving-path
    affordance, not a planning-time rewrite; the common case (fill at
    base nprobe) pays exactly one extra aggregate over the result.
    The batch contract is ENFORCED: more than ``ESCALATE_MAX_BATCH``
    distinct queries raises, naming ``vector_index_knn_join(...,
    ensure_k=True)`` — the fully relational under-return path a
    data-plane query relation should take instead.
    """
    state = _live_cells(spark, index_path)
    res = _probe_once(
        index_path, state, queries, k, nprobe,
        query_id_col, vec_col, use_codes, shortlist, where,
    )
    if not escalate:
        return res
    num_cells = state[0]["num_cells"]
    out = []
    pending = queries
    cur_np = min(nprobe, num_cells)
    while True:
        # enforce the control-plane batch contract BEFORE collecting:
        # the limit-bounded count caps what ever reaches the driver at
        # ESCALATE_MAX_BATCH+1 rows, so the guard itself cannot be the
        # driver-memory blowup it exists to prevent (a data-plane
        # query relation fails here without materializing its id set)
        probe_n = (
            pending.select(query_id_col)
            .distinct()
            .limit(ESCALATE_MAX_BATCH + 1)
            .count()
        )
        if probe_n > ESCALATE_MAX_BATCH:
            # each escalation round builds per-query isin literal
            # filters from these ids — fine for a serving batch, a
            # giant literal plan for a data-plane relation
            raise ValueError(
                f"escalate=True got more than {ESCALATE_MAX_BATCH} "
                "distinct queries: escalation is a serving-path "
                "affordance for control-plane batches; for data-plane "
                "query relations use vector_index_knn_join(..., "
                "ensure_k=True) — the fully relational under-return "
                "contract"
            )
        pending_ids = [
            r[0]
            for r in pending.select(query_id_col).distinct().collect()
        ]
        counts = {
            r["query_id"]: r["n"]
            for r in res.groupBy("query_id").agg(
                F.count("*").alias("n")
            ).collect()
        }
        under = [q for q in pending_ids if counts.get(q, 0) < k]
        filled = [q for q in pending_ids if q not in set(under)]
        if filled:
            out.append(res.filter(F.col("query_id").isin(filled)))
        if not under or cur_np >= num_cells:
            if under:
                # full coverage reached: short results are maximal
                out.append(res.filter(F.col("query_id").isin(under)))
            break
        cur_np = min(cur_np * 2, num_cells)
        pending = queries.filter(F.col(query_id_col).isin(under))
        res = _probe_once(
            index_path, state, pending, k, cur_np,
            query_id_col, vec_col, use_codes, shortlist, where,
        )
    if not out:  # empty query batch
        return res
    acc = out[0]
    for df in out[1:]:
        acc = acc.unionByName(df)
    return acc


def vector_index_knn_join(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    where=None,
    exclude_self: bool = False,
    ensure_k: bool = False,
    use_codes: bool = False,
    shortlist: int = 64,
) -> DataFrame:
    """Bulk kNN join: (query_id, neighbor, cosine, rank) top-k for a
    DATA-PLANE-SIZED query relation — the offline corpus-vs-index shape
    (the semantic-dedup feeder, batch re-embedding backfills, corpus
    self-join kNN graphs).

    ``vector_index_probe`` contracts the query batch to control-plane
    size: it collects the probe-cell set to the driver (a static
    partition filter) and broadcasts the query side. Both moves invert
    at corpus scale — a 100 TB query relation can neither collect its
    probe cells nor broadcast. This variant keeps everything
    distributed: probe cells explode per query row (the same JVM
    assignment expression the build used), and candidates come from a
    CELL-KEYED SHUFFLE JOIN against the cells relation — both sides
    hash-partition on ``cell``, so each task intersects one cell's
    queries with that cell's vectors (AQE splits skewed hot cells).
    No driver collect, no broadcast, no partition pruning — a bulk join
    touches most cells anyway, and each query still scores only its
    ``nprobe`` cells' candidates, which is what bounds the join output
    at ``|queries| x nprobe x avg_cell_size`` instead of
    ``|queries| x |corpus|``.

    Semantics are the probe's exactly (same assignment / probe /
    scoring expressions): results are bit-identical to
    ``vector_index_probe(spark, path, queries, k, nprobe)`` on the same
    live index (pinned by tests/test_vector_index.py). ``where`` filters
    the cells scan before scoring, as in the probe. ``exclude_self``
    drops ``neighbor == query_id`` candidates before ranking — the
    corpus self-join default (a vector's nearest neighbor is itself).
    ``use_codes=True`` (requires a PQ-enabled index): the COMPRESSED
    bulk path — per-(query, probed cell) ADC LUTs are computed as a
    COLUMN on the exploded query side (the residual probe's per-cell
    LUT trick, kept relational: no driver-side LUT broadcast, which is
    the control-plane move this variant exists to avoid), the
    cell-keyed shuffle join scans STORED CODES instead of raw vectors
    (m bytes/vector instead of d doubles — at 100 TB corpus×corpus the
    candidate shuffle shrinks ~8d/m×), the per-query ADC shortlist
    keeps ``shortlist`` candidates, and an exact-cosine refine touches
    raw vectors for shortlist rows only (two distributed equi-joins:
    vid against the predicate-filtered cells, query_id against the
    query relation — no broadcast anywhere). Results are bit-identical
    to ``vector_index_probe(..., use_codes=True)`` with the same
    ``shortlist`` on the same live index (shared LUT/ADC/refine
    expressions; pinned by tests/test_vector_index.py); the recorded
    ``pq_encoding`` is followed automatically (residual indexes get
    per-cell residual LUTs).

    ``ensure_k=True``: the BULK under-return contract — the distributed
    twin of the probe's ``escalate`` (whose per-round driver counts are
    exactly the control-plane move this path avoids). TWO passes, both
    fully distributed: pass 1 runs at the base ``nprobe``; a relational
    count splits queries into filled (kept as-is, bit-identical to
    ensure_k=False) and under-filled, and pass 2 re-runs ONLY the
    under-filled queries at full coverage (every cell — the
    predicate-filtered exact answer, short only when fewer than k live
    survivors exist). No driver collect, no per-query loop; the cost
    model is one extra pass over the typically-tiny under-filled
    fraction at full fan-out."""
    meta, cents, books, offs, cells = _live_cells(spark, index_path)
    nprobe = min(nprobe, meta["num_cells"])
    if use_codes and books is None:
        raise ValueError(
            f"index at {index_path} stores no PQ codes (built with m=0); "
            "use_codes joins need a PQ-enabled build"
        )
    pruned = cells
    if where is not None:
        pruned = pruned.filter(
            F.expr(where) if isinstance(where, str) else where
        )

    def _pass_exact(qdf: DataFrame, np_: int) -> DataFrame:
        q = with_norm(
            qdf.select(query_id_col, vec_col), vec_col
        ).withColumn(
            "__probe",
            F.explode(F.expr(_probe_cells_expr(vec_col, cents, np_))),
        ).select(
            F.col("__probe").cast("int").alias("cell"),
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col("norm").alias("__qn"),
        )
        scored = pruned.join(q, "cell")  # shuffle join keyed by cell
        if exclude_self:
            scored = scored.filter(F.col("vid") != F.col("query_id"))
        scored = scored.withColumn(
            "cosine", cosine_expr("__qv", "vec", "__qn", "norm")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.col("neighbor")
        )
        return (
            scored.select(
                "query_id", F.col("vid").alias("neighbor"), "cosine"
            )
            .distinct()
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def _pass_codes(qdf: DataFrame, np_: int) -> DataFrame:
        # compressed scan: the probe's ADC expressions (LUT per
        # (query, probed cell), same aggregate/shortlist/refine order),
        # but every join is a distributed equi-join — no broadcast, no
        # driver collect
        q = with_norm(
            qdf.select(query_id_col, vec_col), vec_col
        ).withColumn(
            "__probe",
            F.explode(F.expr(_probe_cells_expr(vec_col, cents, np_))),
        ).withColumn("cell", F.col("__probe").cast("int"))
        if meta.get("pq_encoding", "plain") == "residual":
            qc = q.withColumn(
                "__qresid", residual_col(vec_col, "cell", offs)
            ).select(
                "cell",
                F.col(query_id_col).alias("query_id"),
                adc_lut_raw_expr("__qresid", books).alias("__lut"),
            )
        else:
            qc = q.select(
                "cell",
                F.col(query_id_col).alias("query_id"),
                _adc_lut_expr(vec_col, books).alias("__lut"),
            )
        scored = (
            pruned.select("cell", "vid", "codes")
            .join(qc, "cell")  # shuffle join keyed by cell
            .withColumn(
                "adc_dist",
                F.expr(
                    "aggregate(zip_with(__lut, codes, (l, c) -> l[c]),"
                    " 0D, (a, v) -> a + v)"
                ),
            )
        )
        if exclude_self:
            scored = scored.filter(F.col("vid") != F.col("query_id"))
        w = Window.partitionBy("query_id").orderBy("adc_dist", "vid")
        cand = (
            scored.select("query_id", "vid", "adc_dist")
            .distinct()
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= shortlist)
            .select("query_id", "vid")
        )
        # exact refine over shortlist rows only; both joins distributed
        qv = with_norm(
            qdf.select(query_id_col, vec_col), vec_col
        ).select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col("norm").alias("__qn"),
        )
        refined = (
            cand.join(pruned.select("vid", "vec", "norm"), "vid")
            .join(qv, "query_id")
            .withColumn(
                "cosine", cosine_expr("__qv", "vec", "__qn", "norm")
            )
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.col("neighbor")
        )
        return (
            refined.select(
                "query_id", F.col("vid").alias("neighbor"), "cosine"
            )
            .distinct()
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
        )

    _pass = _pass_codes if use_codes else _pass_exact

    res = _pass(queries, nprobe)
    if not ensure_k or nprobe >= meta["num_cells"]:
        return res
    filled_ids = (
        res.groupBy("query_id")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= k)
        .select("query_id")
    )
    filled = res.join(filled_ids, "query_id", "semi")
    under_q = queries.join(
        filled_ids.withColumnRenamed("query_id", query_id_col),
        [query_id_col],
        "left_anti",
    )
    return filled.unionByName(_pass(under_q, meta["num_cells"]))


def vector_index_cell_histogram(
    spark: SparkSession, index_path: str
) -> DataFrame:
    """(cell, n_live) per non-empty cell — the quantizer-balance view.
    Probe cost scales with the PROBED cells' sizes, so a skewed
    histogram (hot cells from corpus drift away from the founding
    sample) is the operational signal that ``reindex_vector_index`` is
    due. Exactly reproducible under pinned anchors (q240's oracle
    replays the assignment histogram relationally)."""
    cells = _live_cells(spark, index_path)[4]
    return cells.groupBy("cell").agg(F.count("*").alias("n_live"))


def vector_index_stats(spark: SparkSession, index_path: str) -> dict:
    """DESCRIBE INDEX: one dict of operational facts —

    - quantizer shape (``num_cells``/``m``/``k_codes``/``dim``/
      ``pq_encoding``/``meta_cols``) and the exact logical ``n_vecs``;
    - ``layout`` + ``live_snapshots`` (versioned: the N-way union every
      probe plans over — the ``max_snapshots`` trigger's input) and
      ``data_files`` (small-file pressure — compaction's input);
    - ``n_pending_tombstones`` (rows suppressed at probe time, space
      reclaimed at the next compaction);
    - cell balance: ``max_cell`` / ``avg_cell`` / ``cell_skew`` (their
      ratio) and ``nonempty_cells`` — ``cell_skew`` drifting upward is
      the reindex trigger signal (probe latency is bounded by the
      hottest probed cell).

    Driver-side cost: one aggregate over the live cells + directory
    listings — control-plane work, no corpus-sized collect."""
    versioned = _vxi_is_versioned(spark, index_path)
    if versioned:
        meta, cells, live = _vxi_read(spark, index_path)
        snapshots = len(live)
        from ..sinks.versioned import fs_count_data_files

        files = sum(
            fs_count_data_files(spark, f"{p}/cells") for p in live
        )
        from pyspark.sql.types import LongType, StructField, StructType

        from ..sinks.versioned import snapshot_members

        t_schema = StructType([StructField("vid", LongType())])
        del_paths = [
            f"{p}/deletes" for p in live
            if "deletes" in snapshot_members(spark, p)
        ]
        tombs = (
            spark.read.schema(t_schema).parquet(*del_paths)
            .select("vid").distinct().count()
            if del_paths
            else 0
        )
    else:
        _recover_vector_index(index_path)
        meta = _read_meta(index_path)
        cells = _read_flat_cells(spark, index_path, meta)
        deletes = _read_flat_deletes(spark, index_path)
        tombs = deletes.count() if deletes is not None else 0
        if deletes is not None:
            cells = cells.join(deletes, "vid", "left_anti")
        snapshots = 1
        from ..sinks.versioned import fs_count_data_files

        files = fs_count_data_files(
            spark, os.path.join(index_path, "cells")
        )
    agg = cells.groupBy("cell").agg(F.count("*").alias("n")).agg(
        F.sum("n").alias("total"),
        F.max("n").alias("mx"),
        F.count("*").alias("nonempty"),
    ).first()
    n_live = int(agg["total"] or 0)
    max_cell = int(agg["mx"] or 0)
    nonempty = int(agg["nonempty"] or 0)
    avg_cell = n_live / meta["num_cells"] if meta["num_cells"] else 0.0
    return {
        "layout": "versioned" if versioned else "flat",
        "num_cells": meta["num_cells"],
        "m": meta["m"],
        "k_codes": meta["k_codes"],
        "dim": meta["dim"],
        "pq_encoding": meta.get("pq_encoding", "plain"),
        "meta_cols": meta.get("meta_cols", []),
        "n_vecs": meta["n_vecs"],
        "n_live_rows": n_live,
        "n_pending_tombstones": tombs,
        "live_snapshots": snapshots,
        "data_files": files,
        "nonempty_cells": nonempty,
        "max_cell": max_cell,
        "avg_cell": avg_cell,
        "cell_skew": (max_cell / avg_cell) if avg_cell else 0.0,
    }


def vector_index_delete(
    spark: SparkSession, index_path: str, vec_ids
) -> dict:
    """Tombstone vectors out of the index (results change NOW, space
    reclaims at ``optimize_vector_index``). ``vec_ids``: a one-column
    DataFrame or a list of ids; unknown / already-tombstoned ids are
    ignored. Versioned layout: one CAS snapshot carries the tombstone
    set and the negative count increment atomically; flat layout:
    doc-scoped ``deletes/`` append."""
    ids = _as_ids(spark, vec_ids)
    if _vxi_is_versioned(spark, index_path):
        return {"n_tombstoned": _vxi_delete(spark, index_path, ids)}
    _recover_vector_index(index_path)
    meta = _read_meta(index_path)
    live = ids.join(
        _read_flat_cells(spark, index_path, meta).select("vid"),
        "vid",
        "left_semi",
    )
    prior = _read_flat_deletes(spark, index_path)
    if prior is not None:
        live = live.join(prior, "vid", "left_anti")
    n = live.count()
    if n:
        live.write.mode("append").parquet(
            os.path.join(index_path, "deletes")
        )
        meta["n_vecs"] -= n
        _write_meta(index_path, meta)
    return {"n_tombstoned": n}


def vector_index_apply_cdc(
    batch: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    op_col: str = "op",
    epoch_mark: str | None = None,
    max_retries: int = 10,
) -> dict | None:
    """Apply one CDC batch (adds + deletes mixed, ``op_col`` ==
    ``'delete'`` marks deletions) to a VERSIONED vector index as ONE
    CAS snapshot — the embedding-side twin of
    ``text_index_apply_cdc`` with the identical rationale: the
    tombstone set, the newly-encoded cells, the NET count increment,
    and the ``epoch_mark`` all ride the same commit, so a CDC ingest
    stream is replay-IDEMPOTENT. Two separate commits (delete, then
    add) cannot share one fence, and version-scoped tombstones make a
    redelivered delete DIVERGE — a tombstone recommitted at a higher
    version than an already-landed re-add permanently kills the
    re-add. With one snapshot a replayed epoch finds its mark and
    skips whole (``None`` returned), and delete+re-add of one vid in
    the same batch lands as the re-add (tombstones suppress only rows
    committed at a STRICTLY LOWER version — ``_vxi_read``).

    Adds are assigned/encoded with the index's RECORDED (immutable)
    quantizer; delete vids not live are ignored; a batch whose adds
    and deletes are both no-ops still commits its (empty) marked
    snapshot, so whole-source replays stay invariant. Adds are UPSERTS:
    the batch is first reduced to one row per vid
    (``cdc_dedup_adds`` — deterministic winner, so duplicate add rows
    cannot commit duplicate cell entries or inflate the net count),
    and an add whose vid is already live tombstones the old version in
    the SAME snapshot, so exactly one version of a vid is ever served
    (``n_tombstoned`` counts replaced vids too). The index must
    already exist (founding goes through ``vector_index_build``).
    Returns ``{"n_added", "n_tombstoned", "version"}``, or ``None``
    when the epoch was fenced."""
    from ..sinks.versioned import (
        CommitConflict,
        fs_read_json,
        snapshot_members,
    )

    spark = batch.sparkSession
    if not _vxi_is_versioned(spark, index_path):
        raise ValueError(
            f"no versioned vector index at {index_path}: found it with "
            "vector_index_build before applying CDC"
        )
    meta, _cells0, live = _vxi_read(spark, index_path)
    dels = (
        batch.filter(F.col(op_col) == "delete")
        .select(F.col(id_col).cast("bigint").alias("vid"))
        .distinct()
    )
    from ..sinks.versioned import cdc_dedup_adds

    adds = cdc_dedup_adds(
        batch.filter(
            F.coalesce(F.col(op_col), F.lit("add")) != "delete"
        ).select(id_col, vec_col, *meta["meta_cols"]),
        id_col,
        [vec_col, *meta["meta_cols"]],
    )
    # upsert semantics: an add of a live vid replaces it — the old
    # version joins the victim set and is tombstoned in the same
    # snapshot (the new row commits at the tombstone's version, which
    # tombstones never suppress)
    upserts = dels.unionByName(
        adds.select(F.col(id_col).cast("bigint").alias("vid"))
    ).distinct()
    # the add-side cells are a pure function of the batch + the
    # immutable quantizer — encoded once, outside the CAS retry loop
    c_schema_json = fs_read_json(spark, f"{live[-1]}/_cells_schema.json")
    cents, offs = _load_quantizer(
        spark, _vxi_quantizer_path(spark, live, "centroids")
    )
    books = (
        _load_codebooks(
            spark, _vxi_quantizer_path(spark, live, "codebooks")
        )
        if meta["m"]
        else None
    )
    cells = _encode_cells(
        adds, id_col, vec_col, cents, books,
        meta_cols=meta["meta_cols"],
        pq_encoding=meta["pq_encoding"],
        offsets=offs,
    )
    n_add = adds.count()
    marks = [epoch_mark] if epoch_mark else []
    for _ in range(max_retries):
        if epoch_mark and any(
            epoch_mark in snapshot_members(spark, p)
            for p in _vxi_recover_live(spark, index_path)
        ):
            return None  # replayed epoch: everything already landed
        _m, live_cells, live_now = _vxi_read(spark, index_path)
        # victims depend on the live head — recomputed per CAS attempt
        vic = (
            live_cells.select("vid")
            .join(upserts, "vid", "left_semi")
            .distinct()
        )
        n_vic = vic.count()
        params = {
            "num_cells": meta["num_cells"],
            "m": meta["m"],
            "k_codes": meta["k_codes"],
            "dim": meta["dim"],
            "meta_cols": meta["meta_cols"],
            "pq_encoding": meta["pq_encoding"],
            "n_vecs": n_add - n_vic,
        }
        base = int(live_now[-1].rsplit("snap_", 1)[1])
        try:
            v = _vxi_commit(
                spark, index_path, cells, params, marks, base,
                deletes=vic if n_vic else None,
                cells_schema_json=c_schema_json,
            )
            return {"n_added": n_add, "n_tombstoned": n_vic, "version": v}
        except CommitConflict:
            continue  # concurrent writer advanced the head; retry
    raise CommitConflict(
        f"CDC apply on {index_path} lost {max_retries} CAS races"
    )


def reindex_vector_index(
    spark: SparkSession,
    index_path: str,
    num_cells: int | None = None,
    m: int | None = None,
    k_codes: int | None = None,
    seed: int = 7,
    centroids=None,
    codebooks=None,
    target_file_rows: int = 4_000_000,
    max_retries: int = 10,
    pq_encoding: str | None = None,
    offsets=None,
) -> dict:
    """Re-found the index in place: retrain the coarse quantizer (and
    PQ codebooks) on the CURRENT live corpus and re-assign/re-encode
    every live vector — the maintenance op for quantizer drift (the
    founding quantizer is immutable under appends by design; once the
    corpus distribution has drifted from the founding sample, cells go
    unbalanced and recall/pruning degrade — FAISS's retrain+re-add,
    done index-side).

    No raw-corpus read: the index stores full vectors, so the retrain
    sample and the re-encode pass both come from the index itself.
    ``num_cells``/``m``/``k_codes`` default to the recorded values
    (pass new ones to re-shape the index); pass ``centroids``/
    ``codebooks`` to pin the new quantizer externally (the q237 oracle
    contract). Tombstoned vectors are purged (a reindex is also a
    compaction).

    Publish: versioned layout commits ONE CAS snapshot carrying the new
    quantizer + re-encoded cells + summed stats + carried epoch marks +
    the compaction watermark, then prunes — concurrent appends lose the
    CAS race and retry against the new quantizer (or this op retries if
    they won). Flat layout uses the staging + directory-swap publish
    with the usual crash recovery.

    ``pq_encoding`` defaults to the recorded value; with
    ``"residual"``, pinned ``codebooks`` must come with matching
    ``offsets`` (``train_residual_quantizer``)."""
    meta, _old_cents, _old_books, _old_offs, cells = _live_cells(
        spark, index_path
    )
    nc = num_cells if num_cells is not None else meta["num_cells"]
    new_m = m if m is not None else meta["m"]
    kc = k_codes if k_codes is not None else (meta["k_codes"] or 16)
    mcols = meta.get("meta_cols", [])
    enc = (
        pq_encoding
        if pq_encoding is not None
        else meta.get("pq_encoding", "plain")
    )
    if enc not in ("plain", "residual"):
        raise ValueError(f"unknown PQ encoding {enc!r}")
    live_vecs = cells.select("vid", "vec", *mcols)
    if centroids is None:
        centroids = train_centroids(live_vecs, "vec", nc, seed)
    centroids = np.asarray(centroids, dtype=np.float64)
    if codebooks is None and new_m:
        if enc == "residual":
            codebooks, offsets = train_residual_quantizer(
                live_vecs, centroids, "vec", new_m, kc, seed
            )
        else:
            codebooks = train_pq_codebooks(live_vecs, "vec", new_m, kc, seed)
    if codebooks is not None:
        codebooks = np.asarray(codebooks, dtype=np.float64)
        if enc == "residual" and offsets is None:
            raise ValueError(
                "pq_encoding='residual' with pinned codebooks needs the"
                " matching offsets (train_residual_quantizer returns"
                " both)"
            )
    if offsets is not None:
        offsets = np.asarray(offsets, dtype=np.float64)
    if int(centroids.shape[1]) != meta["dim"]:
        raise ValueError(
            f"reindex centroids have dim {centroids.shape[1]}, index "
            f"stores dim {meta['dim']} vectors"
        )
    params = {
        "num_cells": int(len(centroids)),
        "m": int(codebooks.shape[0]) if codebooks is not None else 0,
        "k_codes": int(codebooks.shape[1]) if codebooks is not None else 0,
        "dim": meta["dim"],
        "meta_cols": list(mcols),
    }
    params["pq_encoding"] = enc if params["m"] else "plain"
    if params["pq_encoding"] != "residual":
        offsets = None
    bins_for = lambda n_rows: max(
        1, math.ceil(math.ceil(max(n_rows, 1) / params["num_cells"])
                     / target_file_rows)
    )

    if not _vxi_is_versioned(spark, index_path):
        from ..sinks.stats import _local_path

        if _local_path(index_path) is None:
            raise ValueError(
                f"reindex_vector_index on a flat layout requires a "
                f"local index path, got {index_path}"
            )
        recoded = _encode_cells(
            live_vecs, "vid", "vec", centroids, codebooks,
            meta_cols=mcols, pq_encoding=params["pq_encoding"],
            offsets=offsets,
        )
        n_rows = live_vecs.count()
        bins = bins_for(n_rows)
        staging = index_path.rstrip("/") + "__compact"
        old = index_path.rstrip("/") + "__old"
        shutil.rmtree(staging, ignore_errors=True)
        (
            recoded.withColumn("__bin", F.pmod(F.hash("vid"), F.lit(bins)))
            .repartition(params["num_cells"] * bins, "cell", "__bin")
            .drop("__bin")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(staging, "cells"))
        )
        _centroids_df(spark, centroids, offsets).write.mode(
            "overwrite"
        ).parquet(os.path.join(staging, "centroids"))
        if codebooks is not None:
            _codebooks_df(spark, codebooks).write.mode(
                "overwrite"
            ).parquet(os.path.join(staging, "codebooks"))
        new_meta = dict(
            params,
            n_vecs=n_rows,
            cells_schema=spark.read.parquet(
                os.path.join(staging, "cells")
            ).schema.jsonValue(),
        )
        _write_meta(staging, new_meta)  # meta last: staging-complete
        shutil.rmtree(old, ignore_errors=True)
        os.rename(index_path, old)
        os.rename(staging, index_path)
        shutil.rmtree(old)
        return new_meta

    from ..sinks.versioned import CommitConflict, snapshot_members

    for _ in range(max_retries):
        meta, cells, live = _vxi_read(spark, index_path)
        base = int(live[-1].rsplit("snap_", 1)[1])
        live_vecs = cells.select("vid", "vec", *mcols)
        n_rows = live_vecs.count()
        recoded = _encode_cells(
            live_vecs, "vid", "vec", centroids, codebooks,
            meta_cols=mcols, pq_encoding=params["pq_encoding"],
            offsets=offsets,
        )
        bins = bins_for(n_rows)
        carried = sorted(
            {
                mk
                for p_ in live
                for mk in snapshot_members(spark, p_)
                if mk.startswith("_epoch_")
            }
        )
        compacted = (
            recoded.withColumn("__bin", F.pmod(F.hash("vid"), F.lit(bins)))
            .repartition(params["num_cells"] * bins, "cell", "__bin")
            .drop("__bin")
        )
        try:
            _vxi_commit(
                spark,
                index_path,
                compacted,
                dict(params, n_vecs=n_rows),
                carried + [f"{_V_COMPACT_MARK}{base}"],
                base,
                centroids=centroids,
                codebooks=codebooks,
                offsets=offsets,
            )
            break
        except CommitConflict:
            continue  # an append raced in; re-encode it too
    else:
        raise CommitConflict(
            f"reindex of {index_path} lost {max_retries} CAS races"
        )
    _vxi_recover_live(spark, index_path)  # prune folded snapshots
    return _vxi_read(spark, index_path)[0]


def optimize_vector_index(
    spark: SparkSession,
    index_path: str,
    target_file_rows: int = 4_000_000,
) -> dict:
    """Compact append-grown small files and purge tombstones: each cell
    partition rewrites into row-bounded vid-hash bins (parallelism =
    cells × bins — no cell funnels through one task). Flat layout:
    staging + directory swap with crash recovery at every entry point
    (local paths only); versioned layout: the CAS watermark fold
    (object-store capable), quantizer subtrees carried forward so
    founding snapshots can be pruned."""
    from ..sinks.stats import _local_path

    if _vxi_is_versioned(spark, index_path):
        return _vxi_optimize(spark, index_path, target_file_rows)
    if _local_path(index_path) is None:
        raise ValueError(
            f"optimize_vector_index on a flat layout requires a local "
            f"index path, got {index_path}; found the index with "
            f'layout="versioned" for object storage'
        )
    _recover_vector_index(index_path)
    meta = _read_meta(index_path)
    cells = _read_flat_cells(spark, index_path, meta)
    meta = dict(meta, cells_schema=cells.schema.jsonValue())
    files_before = len(_index_data_files(index_path))
    deletes = _read_flat_deletes(spark, index_path)
    if deletes is not None:
        cells = cells.join(deletes, "vid", "left_anti")
    rows_before = cells.count()
    nc = meta["num_cells"]
    per_cell = math.ceil(max(rows_before, 1) / nc)
    bins = max(1, math.ceil(per_cell / target_file_rows))
    staging = index_path.rstrip("/") + "__compact"
    old = index_path.rstrip("/") + "__old"
    shutil.rmtree(staging, ignore_errors=True)
    (
        cells.withColumn("__bin", F.pmod(F.hash("vid"), F.lit(bins)))
        .repartition(nc * bins, "cell", "__bin")
        .drop("__bin")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(staging, "cells"))
    )
    for sub in ("centroids", "codebooks"):
        src = os.path.join(index_path, sub)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(staging, sub))
    meta = dict(meta, n_vecs=rows_before)
    _write_meta(staging, meta)  # meta last: staging-complete marker
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_path, old)
    os.rename(staging, index_path)
    shutil.rmtree(old)
    return {
        "rows_before": rows_before,
        "files_before": files_before,
        "files_after": len(_index_data_files(index_path)),
    }


# ---------------------------------------------------------------------------
# versioned layout (mirror of functions/text_index.py's _tidx_* protocol)


def _vxi_is_versioned(spark: SparkSession, index_path: str) -> bool:
    from ..sinks.versioned import list_versions

    try:
        return bool(list_versions(spark, index_path))
    except Exception:
        return False


def _vxi_recover_live(spark: SparkSession, index_path: str) -> list[str]:
    """Live snapshots oldest-first; folded snapshots are pruned with a
    one-compaction-cycle grace window (``sinks/versioned.py
    recover_live_snapshots``) so concurrent probes that lazily captured
    pre-compaction snapshot paths finish against intact files."""
    from ..sinks.versioned import recover_live_snapshots

    return recover_live_snapshots(spark, index_path, _V_COMPACT_MARK)


def vacuum_vector_index(spark: SparkSession, index_path: str) -> list:
    """Collapse the retention grace window for an index whose
    compaction cadence has stopped: delete every snapshot folded by the
    NEWEST compaction watermark (the recover pass keeps those one full
    compaction cycle, which is forever if no later compaction comes).
    Only safe when no in-flight probe captured pre-compaction snapshot
    paths. Returns the deleted snapshot names."""
    from ..sinks.versioned import vacuum_snapshots

    return vacuum_snapshots(spark, index_path, _V_COMPACT_MARK)


def _vxi_quantizer_path(
    spark: SparkSession, live: list[str], sub: str
) -> str:
    """The quantizer subtree lives in the oldest live snapshot carrying
    it: the founding snapshot until the first compaction, the compacted
    snapshot after (compaction carries it forward before pruning)."""
    from ..sinks.versioned import snapshot_members

    for p in live:
        if sub in snapshot_members(spark, p):
            return f"{p}/{sub}"
    raise FileNotFoundError(
        f"no {sub} subtree in any live snapshot — corrupt vector index"
    )


def _vxi_read(spark: SparkSession, index_path: str):
    """(meta, live cells DF, live snapshot paths); tombstones filtered
    version-scoped (a delete at version d kills only rows committed
    before d, so re-appended vectors serve again)."""
    from functools import reduce

    from pyspark.sql.types import LongType, StructField, StructType

    from ..sinks.versioned import fs_read_json, snapshot_members

    live = _vxi_recover_live(spark, index_path)
    if not live:
        raise FileNotFoundError(f"no versioned vector index at {index_path}")
    metas = [fs_read_json(spark, f"{p}/_params.json") for p in live]
    quant = {
        (
            m["num_cells"], m["m"], m["k_codes"], m["dim"],
            tuple(m.get("meta_cols", [])),
            m.get("pq_encoding", "plain"),
        )
        for m in metas
    }
    if len(quant) != 1:
        raise ValueError(
            f"inconsistent quantizer params across snapshots: {quant}"
        )
    nc, m_, kc, dim, mcols, enc = quant.pop()
    meta = {
        "num_cells": nc,
        "m": m_,
        "k_codes": kc,
        "dim": dim,
        "meta_cols": list(mcols),
        "pq_encoding": enc,
        "n_vecs": sum(mm["n_vecs"] for mm in metas),
    }
    c_schema = StructType.fromJson(
        fs_read_json(spark, f"{live[-1]}/_cells_schema.json")
    )
    del_paths = [
        p for p in live if "deletes" in snapshot_members(spark, p)
    ]

    def _v(p: str) -> int:
        return int(p.rsplit("snap_", 1)[1])

    parts = [
        spark.read.schema(c_schema).parquet(f"{p}/cells") for p in live
    ]
    if del_paths:
        parts = [
            df.withColumn("__sv", F.lit(_v(p)))
            for df, p in zip(parts, live)
        ]
    cells = reduce(DataFrame.unionByName, parts)
    if del_paths:
        t_schema = StructType([StructField("vid", LongType())])
        tombs = (
            reduce(
                DataFrame.unionByName,
                [
                    spark.read.schema(t_schema)
                    .parquet(f"{p}/deletes")
                    .withColumn("__dv", F.lit(_v(p)))
                    for p in del_paths
                ],
            )
            .groupBy("vid")
            .agg(F.max("__dv").alias("__dv"))
            .select(F.col("vid").alias("__tvid"), "__dv")
        )
        cond = (F.col("vid") == F.col("__tvid")) & (
            F.col("__dv") > F.col("__sv")
        )
        cells = cells.join(tombs, cond, "left_anti").drop("__sv")
    return meta, cells, live


def _vxi_commit(
    spark: SparkSession,
    index_path: str,
    cells: DataFrame,
    params: dict,
    marks: list[str],
    base_version: int,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    quantizer_src: tuple[str, str | None] | None = None,
    deletes: DataFrame | None = None,
    cells_schema_json: dict | None = None,
    offsets: np.ndarray | None = None,
) -> int:
    """CAS-commit one snapshot. Quantizer state rides either as arrays
    (founding/reindex — residual offsets ride the centroids relation)
    or copied forward from existing paths (compaction,
    ``quantizer_src=(centroids_path, codebooks_path|None)``).
    ``cells_schema_json``: pass explicitly when ``cells`` can be EMPTY
    (delete snapshots / purge-everything compactions)."""
    from ..sinks.versioned import commit_staged, fs_touch, fs_write_json

    def populate(staging: str) -> None:
        cells.write.partitionBy("cell").mode("overwrite").parquet(
            f"{staging}/cells"
        )
        if centroids is not None:
            _centroids_df(spark, centroids, offsets).write.mode(
                "overwrite"
            ).parquet(f"{staging}/centroids")
            if codebooks is not None:
                _codebooks_df(spark, codebooks).write.mode(
                    "overwrite"
                ).parquet(f"{staging}/codebooks")
        if quantizer_src is not None:
            cpath, bpath = quantizer_src
            spark.read.parquet(cpath).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{staging}/centroids")
            if bpath is not None:
                spark.read.parquet(bpath).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(f"{staging}/codebooks")
        if deletes is not None:
            deletes.write.mode("overwrite").parquet(f"{staging}/deletes")
        fs_write_json(
            spark,
            f"{staging}/_cells_schema.json",
            cells_schema_json
            or spark.read.parquet(f"{staging}/cells").schema.jsonValue(),
        )
        fs_write_json(spark, f"{staging}/_params.json", params)
        for mk in marks:
            fs_touch(spark, f"{staging}/{mk}")
        fs_touch(spark, f"{staging}/_SUCCESS")

    return commit_staged(spark, index_path, base_version, populate)


def _vxi_found(
    corpus: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    codebooks: np.ndarray | None,
    params: dict,
    epoch_mark: str | None = None,
    offsets: np.ndarray | None = None,
) -> int:
    from ..sinks.versioned import list_versions

    spark = corpus.sparkSession
    if list_versions(spark, index_path):
        raise ValueError(
            f"versioned vector index already exists at {index_path}; "
            "use mode='append'"
        )
    cells = _encode_cells(
        corpus, id_col, vec_col, centroids, codebooks,
        meta_cols=params.get("meta_cols", []),
        pq_encoding=params.get("pq_encoding", "plain"),
        offsets=offsets,
    )
    params = dict(params, n_vecs=corpus.count())
    marks = [epoch_mark] if epoch_mark else []
    return _vxi_commit(
        spark, index_path, cells, params, marks, 0,
        centroids=centroids, codebooks=codebooks, offsets=offsets,
    )


def _vxi_append(
    corpus: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    epoch_mark: str | None = None,
    max_retries: int = 10,
    expect_params: dict | None = None,
) -> int | None:
    """CAS-append one batch, assigned/encoded with the RECORDED
    quantizer. ``epoch_mark`` fences replays (None returned when
    skipped); ``expect_params`` validates caller-passed quantizer shape
    against the recorded meta (mismatch raises)."""
    from ..sinks.versioned import (
        CommitConflict,
        fs_read_json,
        list_versions,
        snapshot_members,
    )

    spark = corpus.sparkSession
    meta, _, live = _vxi_read(spark, index_path)
    _check_append_params(meta, expect_params or {})
    # the recorded cells schema rides the commit so an EMPTY batch still
    # publishes a readable snapshot (schema inference over a
    # part-file-less parquet dir raises)
    c_schema_json = fs_read_json(spark, f"{live[-1]}/_cells_schema.json")
    cents, offs = _load_quantizer(
        spark, _vxi_quantizer_path(spark, live, "centroids")
    )
    books = (
        _load_codebooks(
            spark, _vxi_quantizer_path(spark, live, "codebooks")
        )
        if meta["m"]
        else None
    )
    cells = _encode_cells(
        corpus, id_col, vec_col, cents, books,
        meta_cols=meta["meta_cols"],
        pq_encoding=meta["pq_encoding"],
        offsets=offs,
    )
    params = {
        "num_cells": meta["num_cells"],
        "m": meta["m"],
        "k_codes": meta["k_codes"],
        "dim": meta["dim"],
        "meta_cols": meta["meta_cols"],
        "pq_encoding": meta["pq_encoding"],
        "n_vecs": corpus.count(),
    }
    marks = [epoch_mark] if epoch_mark else []
    for _ in range(max_retries):
        if epoch_mark and any(
            epoch_mark in snapshot_members(spark, p)
            for p in _vxi_recover_live(spark, index_path)
        ):
            return None  # replayed batch
        base = (list_versions(spark, index_path) or [0])[-1]
        try:
            return _vxi_commit(
                spark, index_path, cells, params, marks, base,
                cells_schema_json=c_schema_json,
            )
        except CommitConflict:
            continue
    raise CommitConflict(
        f"append to {index_path} lost {max_retries} CAS races"
    )


def _vxi_delete(
    spark: SparkSession,
    index_path: str,
    ids: DataFrame,
    max_retries: int = 10,
) -> int:
    """One CAS snapshot carries the tombstone set and the NEGATIVE
    count increment atomically. Ids not live are ignored; a no-op
    delete commits nothing."""
    from pyspark.sql.types import StructType

    from ..sinks.versioned import CommitConflict, fs_read_json

    for _ in range(max_retries):
        meta, cells, live = _vxi_read(spark, index_path)
        vic = cells.select("vid").join(ids, "vid", "left_semi").distinct()
        n = vic.count()
        if n == 0:
            return 0
        params = {
            "num_cells": meta["num_cells"],
            "m": meta["m"],
            "k_codes": meta["k_codes"],
            "dim": meta["dim"],
            "meta_cols": meta["meta_cols"],
            "pq_encoding": meta["pq_encoding"],
            "n_vecs": -n,
        }
        base = int(live[-1].rsplit("snap_", 1)[1])
        c_schema_json = fs_read_json(
            spark, f"{live[-1]}/_cells_schema.json"
        )
        empty_cells = spark.createDataFrame(
            [], StructType.fromJson(c_schema_json)
        )
        try:
            _vxi_commit(
                spark,
                index_path,
                empty_cells,
                params,
                [],
                base,
                deletes=vic,
                cells_schema_json=c_schema_json,
            )
            return n
        except CommitConflict:
            continue  # concurrent append/delete; recompute victims
    raise CommitConflict(
        f"delete on {index_path} lost {max_retries} CAS races"
    )


def _vxi_optimize(
    spark: SparkSession,
    index_path: str,
    target_file_rows: int,
    max_retries: int = 10,
) -> dict:
    """Versioned compaction: fold live snapshots into one (counts
    summed net of deletes, epoch marks carried, quantizer subtrees
    copied forward, watermark marker riding the commit), then prune."""
    from ..sinks.versioned import (
        CommitConflict,
        fs_read_json,
        snapshot_members,
    )

    def n_files(paths):
        return sum(
            1 for p in paths for _f in _index_data_files(f"{p}/cells")
        )

    for _ in range(max_retries):
        meta, cells, live = _vxi_read(spark, index_path)
        base = int(live[-1].rsplit("snap_", 1)[1])
        files_before = n_files(live)
        rows_before = cells.count()
        nc = meta["num_cells"]
        per_cell = math.ceil(max(rows_before, 1) / nc)
        bins = max(1, math.ceil(per_cell / target_file_rows))
        carried = sorted(
            {
                mk
                for p in live
                for mk in snapshot_members(spark, p)
                if mk.startswith("_epoch_")
            }
        )
        compacted = (
            cells.withColumn("__bin", F.pmod(F.hash("vid"), F.lit(bins)))
            .repartition(nc * bins, "cell", "__bin")
            .drop("__bin")
        )
        params = {
            "num_cells": nc,
            "m": meta["m"],
            "k_codes": meta["k_codes"],
            "dim": meta["dim"],
            "meta_cols": meta["meta_cols"],
            "pq_encoding": meta["pq_encoding"],
            "n_vecs": rows_before,
        }
        c_schema_json = fs_read_json(
            spark, f"{live[-1]}/_cells_schema.json"
        )
        cpath = _vxi_quantizer_path(spark, live, "centroids")
        bpath = (
            _vxi_quantizer_path(spark, live, "codebooks")
            if meta["m"]
            else None
        )
        try:
            _vxi_commit(
                spark,
                index_path,
                compacted,
                params,
                carried + [f"{_V_COMPACT_MARK}{base}"],
                base,
                quantizer_src=(cpath, bpath),
                cells_schema_json=c_schema_json,
            )
            break
        except CommitConflict:
            continue  # an append raced in; fold it too
    else:
        raise CommitConflict(
            f"compaction of {index_path} lost {max_retries} CAS races"
        )
    live_after = _vxi_recover_live(spark, index_path)  # prunes through the previous watermark
    return {
        "rows_before": rows_before,
        "files_before": files_before,
        "files_after": n_files(live_after),
    }
