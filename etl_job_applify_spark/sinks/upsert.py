"""Pure-Spark upsert (reference parity: W2, services/data_store.py:29-41).

The reference stages the batch then generates
``DELETE FROM t USING t_staging WHERE t.id = t_staging.id;
INSERT INTO t SELECT * FROM t_staging`` — and only prints it. Spark has no
native JDBC upsert, so the engine expresses MERGE semantics relationally:

    merged = target ⟕anti updates  ∪  updates

i.e. keep every target row whose key does NOT appear in the batch, then
append the batch. One shuffle on the key (or zero for a broadcastable
batch — the common CDC case, which Catalyst turns into a broadcast anti
join). Last-writer-wins within the batch is resolved deterministically
first. On a transactional table format (Delta/Iceberg) the same call
lowers to ``MERGE INTO``; those jars aren't in this image, so the
relational rewrite is the default backend.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..transform.dedup import dedup_keep_first


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str | None = None,
) -> DataFrame:
    """MERGE: rows of ``updates`` replace same-key rows of ``target``.

    ``version_col``: when the batch can carry several rows per key, the row
    with the greatest version wins (deterministic); otherwise the batch must
    be unique per key.
    """
    keys = list(keys)
    if version_col:
        updates = dedup_keep_first(updates, keys, [version_col], ascending=False)
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates.select(*target.columns))
