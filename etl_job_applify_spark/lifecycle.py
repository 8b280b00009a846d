"""Cross-family document lifecycle: the FORGET sweep.

A training-data platform serves the same document through several
persisted derived stores at once — the BM25 text index, the ANN vector
index, the MinHash dedup index.  When a document must stop being
served (takedown, opt-out, contamination, license revocation), the
removal has to land in EVERY family, idempotently, at data-plane
scale: the forget set can be an entire domain, so nothing here may
collect ids onto the driver.

``forget_documents`` composes the three families' tombstone paths
(``text_index_delete`` / ``minhash_index_delete`` /
``vector_index_delete``) into one sweep with a shared contract:

- **Serving changes NOW, space reclaims later** — every family's
  delete is a metadata-only tombstone commit (one CAS snapshot per
  family on the versioned layouts); physical purge is compaction's
  job (``optimize=True`` runs it in the same sweep when wanted).
- **Idempotent per family** — re-running the sweep with the same id
  set tombstones nothing new (each family dedups against its prior
  tombstone set), so a sweep interrupted between families is simply
  re-run: the completed families no-op and the missed ones catch up.
  Cross-family atomicity is deliberately NOT promised — there is no
  coordinator that could give it without stalling every family's
  writers; the replayable sweep is the 100 TB-honest contract, and
  the window where family A already forgot while family B has not is
  closed by the re-run.
- **Distributed end to end** — ids flow as DataFrames into per-family
  anti-joins; unknown ids are harmless everywhere.

Reference parity: the reference has no index surface at all
(SURVEY.md §2); this completes the persisted-index family the way
``text_index_apply_cdc`` completed streamed maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.local import local_relation


def _as_id_df(spark: SparkSession, ids, col: str) -> DataFrame:
    if isinstance(ids, DataFrame):
        first = ids.columns[0]
        return ids.select(
            F.col(first).cast("bigint").alias(col)
        ).distinct()
    return local_relation(
        spark, [(int(i),) for i in ids], f"{col} bigint"
    )


def forget_documents(
    spark: SparkSession,
    doc_ids,
    text_index: str | None = None,
    dedup_index: str | None = None,
    vector_index: str | None = None,
    optimize: bool = False,
) -> dict:
    """Tombstone ``doc_ids`` out of every supplied index family and
    return per-family tombstone counts, e.g. ``{"text": 71, "dedup":
    71, "vector": 71}``.  Families left ``None`` are skipped.  A
    second sweep with the same ids returns zeros — the idempotence the
    module docstring promises (re-run on any partial failure).

    ``optimize=True`` additionally compacts each touched family after
    its delete (physical purge + tombstone clear) — results must not
    change (each family's compaction is serve-invariant, test-pinned
    in its own suite); only space and probe fast paths do.

    Maintained GRAPH state (triangle counts, CC/k-core/SCC steady
    states) is swept by the companion ``graph_forget`` — run it with
    the same id set so a forgotten document's co-occurrence edges
    leave every maintained stat, not just the serving indexes
    (``examples/gdpr_erasure.py`` shows the combined runbook)."""
    out: dict[str, int] = {}
    if text_index is not None:
        from .functions.text_index import (
            optimize_text_index,
            text_index_delete,
        )

        ids = _as_id_df(spark, doc_ids, "doc")
        out["text"] = text_index_delete(spark, text_index, ids)[
            "n_tombstoned"
        ]
        if optimize:
            optimize_text_index(spark, text_index)
    if dedup_index is not None:
        from .dedup.incremental import minhash_index_delete, optimize_index

        ids = _as_id_df(spark, doc_ids, "doc")
        out["dedup"] = minhash_index_delete(spark, dedup_index, ids)[
            "n_tombstoned"
        ]
        if optimize:
            optimize_index(spark, dedup_index)
    if vector_index is not None:
        from .similarity.vector_index import (
            optimize_vector_index,
            vector_index_delete,
        )

        ids = _as_id_df(spark, doc_ids, "vid")
        out["vector"] = vector_index_delete(spark, vector_index, ids)[
            "n_tombstoned"
        ]
        if optimize:
            optimize_vector_index(spark, vector_index)
    return out


def graph_forget(
    edges: DataFrame,
    forget_ids,
    src: str = "a",
    dst: str = "b",
    triangle_prior=None,
    cc_labels: DataFrame | None = None,
    core_nodes: DataFrame | None = None,
    core_k: int | None = None,
    scc_labels: DataFrame | None = None,
) -> dict:
    """The GRAPH side of the forget sweep: ``forget_documents`` erases
    ids from the serving indexes, but maintained graph state (triangle
    counts, CC labels, k-core membership, SCC labels — the q258/q259/
    q253/q266 steady states) would silently keep a forgotten
    document's co-occurrence edges forever. This helper removes every
    edge INCIDENT to a forgotten id from each supplied maintained
    state using the delete-aware kernels
    (``triangle_delete_update`` / ``cc_delete_update`` /
    ``k_core_delete_update`` / ``scc_delete_update``), each
    change-bounded: the work tracks the forgotten nodes'
    neighborhoods / affected components, never a recompute of history
    (the q274–q277 oracles pin each kernel ≡ its one-shot recompute).

    ``edges`` is the OLD edge relation the states were maintained
    over; states left ``None`` are skipped (``core_k`` is required
    with ``core_nodes``). Ids flow as a DataFrame into the incidence
    semi-join — nothing collects to the driver. Returns::

        {"remaining_edges": ..., "removed_edges": ...,
         "triangles": ..., "cc_labels": ..., "core_nodes": ...,
         "scc_labels": ...}

    with every supplied state updated to the post-forget graph (and
    ``None`` for states not supplied). Re-running with the same ids is
    a no-op on every kernel (their removed sets come up empty), the
    same idempotence contract as ``forget_documents``. For SCC, a
    caller-carried condensation (``scc_update``'s ``condensed``) is
    invalidated — rebuild it with ``scc_condense`` on the returned
    labels."""
    spark = edges.sparkSession
    ids = _as_id_df(spark, forget_ids, "node")
    e = edges.select(src, dst)
    removed = e.join(
        ids.withColumnRenamed("node", src), src, "left_semi"
    ).unionByName(
        e.join(ids.withColumnRenamed("node", dst), dst, "left_semi")
    ).distinct()
    remaining = (
        e.join(ids.withColumnRenamed("node", src), src, "left_anti")
        .join(ids.withColumnRenamed("node", dst), dst, "left_anti")
    )
    out: dict = {
        "remaining_edges": remaining,
        "removed_edges": removed,
        "triangles": None,
        "cc_labels": None,
        "core_nodes": None,
        "scc_labels": None,
    }
    if triangle_prior is not None:
        from .operators.triangles import triangle_delete_update

        out["triangles"] = triangle_delete_update(
            e, removed, triangle_prior, src=src, dst=dst
        )
    if cc_labels is not None:
        from .operators.components import cc_delete_update

        out["cc_labels"] = cc_delete_update(
            remaining, removed, cc_labels, src=src, dst=dst
        )
    if core_nodes is not None:
        if core_k is None:
            raise ValueError("core_k is required with core_nodes")
        from .operators.kcore import k_core_delete_update

        out["core_nodes"] = k_core_delete_update(
            remaining, removed, core_nodes, core_k, src=src, dst=dst
        )
    if scc_labels is not None:
        from .operators.scc import scc_delete_update

        out["scc_labels"] = scc_delete_update(
            remaining, removed, scc_labels, src=src, dst=dst
        )
    return out


def apply_cdc_documents(
    batch: DataFrame,
    text_index: str | None = None,
    dedup_index: str | None = None,
    vector_index: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    op_col: str = "op",
    epoch_mark: str | None = None,
) -> dict:
    """ONE CDC change relation drives every serving family — the
    composition SCALING.md promises: the three ``*_apply_cdc``
    operators share identical semantics (adds are upserts, deletes
    tombstone, one fenced CAS snapshot per family), so a single
    ``op_col`` batch (e.g. a versioned table's change feed through
    ``sinks.changes.changes_to_cdc``) applies to text, dedup, and
    vector serving in one call under ONE epoch mark.

    Cross-family ordering and crash semantics are the forget-sweep
    contract: families commit independently (text → dedup → vector; no
    coordinator could make them atomic without stalling every
    family's writers), each commit carries the same ``epoch_mark``,
    and each family is replay-idempotent on that mark — so a crash
    BETWEEN families is healed by redelivering the epoch: completed
    families fence the replay out whole, the missed ones catch up
    (test-pinned in test_lifecycle.py, the CDC edition of the sweep's
    crash-window test).

    Batch rows whose ``vec_col`` is null only affect text/dedup (a
    document without an embedding is not a vector); delete rows need
    no payload anywhere. Families left ``None`` are skipped. Returns
    per-family apply results (``None`` where the family fenced the
    epoch as already applied)."""
    out: dict = {}
    if text_index is not None:
        from .functions.text_index import text_index_apply_cdc

        out["text"] = text_index_apply_cdc(
            batch.select(id_col, text_col, op_col),
            text_index,
            id_col=id_col,
            text_col=text_col,
            op_col=op_col,
            epoch_mark=epoch_mark,
        )
    if dedup_index is not None:
        from .dedup.incremental import minhash_index_apply_cdc

        out["dedup"] = minhash_index_apply_cdc(
            batch.select(id_col, text_col, op_col),
            dedup_index,
            id_col=id_col,
            text_col=text_col,
            op_col=op_col,
            epoch_mark=epoch_mark,
        )
    if vector_index is not None:
        from .similarity.vector_index import vector_index_apply_cdc

        vec_batch = batch.filter(
            (F.col(op_col) == "delete") | F.col(vec_col).isNotNull()
        ).select(id_col, vec_col, op_col)
        out["vector"] = vector_index_apply_cdc(
            vec_batch,
            vector_index,
            id_col=id_col,
            vec_col=vec_col,
            op_col=op_col,
            epoch_mark=epoch_mark,
        )
    return out
