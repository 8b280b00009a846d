"""Sequence packing: concatenate-and-chunk documents into fixed-token
training sequences — the batching step every LLM data pipeline runs
between curation and the trainer (docs are concatenated in a
deterministic order and the token stream is cut every ``capacity``
tokens; a document whose tokens straddle a cut spans two sequences —
the standard "concat then chunk" packing, zero padding waste except
the final partial sequence).

The kernel is a GLOBAL cumulative sum, which a naive
``Window.orderBy(...)`` without a partition key would funnel through
ONE task — the classic 100 TB bottleneck. ``bucketed_cumsum`` is the
scalable two-pass form:

1. bucket each row by a deterministic key range (``order_col div
   bucket_width`` — engine-portable integer arithmetic, unlike
   ``spark_partition_id``);
2. per-bucket totals (one narrow aggregate), prefix-summed with ONE
   tiny window over the bucket relation (rows = #buckets, not #docs);
3. broadcast-join the per-bucket offsets back and finish with a
   window PARTITIONED by bucket — every partition sums its own rows
   only.

Both windows are exact integer arithmetic, so a DuckDB oracle replays
the whole packing bit-for-bit (q254).

Reference parity: the reference has no packing surface (SURVEY.md §2b
— batch-only ETL); this extends the north-star curation family
(token counting q41, BPE q203) toward the trainer hand-off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_width: int = 4096,
    out: str = "cumsum",
    partition_by: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over ``order_col`` order
    (``out`` = sum of all STRICTLY EARLIER rows), computed without a
    global single-task window: per-bucket offsets ride one tiny window
    over ``order_col div bucket_width`` buckets; the per-row window is
    partitioned by bucket. ``order_col`` must be unique integers.

    With ``partition_by``, the prefix sum restarts per partition group
    (e.g. per domain): buckets are keyed by (group, order div width),
    the offset window is partitioned by the group over the BUCKET
    relation (rows = #buckets, not #rows — tiny even for a skewed
    group), and the per-row window is partitioned by (group, bucket) —
    so no window over the DATA relation is ever keyed by the group
    alone, which is what keeps an 80 %-of-corpus domain from funneling
    through one task."""
    part = list(partition_by)
    # true integer division — double division + truncation happens to
    # be monotone at small magnitudes but silently diverges from the
    # documented exact-arithmetic contract above 2^53
    b = F.expr(
        f"cast({order_col} as bigint) div {int(bucket_width)}"
    )
    rows = df.withColumn("__bkt", b)
    per_bucket = rows.groupBy(*part, "__bkt").agg(
        F.sum(value_col).cast("bigint").alias("__bsum")
    )
    w_b = (
        Window.partitionBy(*part) if part else Window
    ).orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        *part,
        "__bkt",
        F.coalesce(F.sum("__bsum").over(w_b), F.lit(0))
        .cast("bigint")
        .alias("__boff"),
    )
    w_r = Window.partitionBy(*part, "__bkt").orderBy(
        order_col
    ).rowsBetween(Window.unboundedPreceding, -1)
    return (
        rows.join(F.broadcast(offsets), [*part, "__bkt"])
        .withColumn(
            out,
            (
                F.col("__boff")
                + F.coalesce(
                    F.sum(value_col).over(w_r).cast("bigint"), F.lit(0)
                )
            ).cast("bigint"),
        )
        .drop("__bkt", "__boff")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: Column | str = None,
    bucket_width: int = 4096,
) -> DataFrame:
    """Assign each document to its packed-sequence span: (id_col,
    n_tokens, start_off, start_seq, end_seq) where the concatenated
    token stream (``id_col`` order) is cut every ``capacity`` tokens —
    a doc whose tokens cross a cut spans sequences
    ``start_seq..end_seq`` (inclusive; both = token offsets div
    capacity; ``start_off`` is the doc's global token offset, the
    input ``packed_sequence_slices`` refines into per-sequence
    slices). Zero-token docs land wholly in the sequence at their
    offset (start == end)."""
    if tokens_col is None:
        from ..functions.text import n_tokens_expr

        tokens_col = n_tokens_expr("text")
    d = docs.select(
        id_col, F.col(tokens_col).alias("n_tokens")
        if isinstance(tokens_col, str)
        else tokens_col.alias("n_tokens"),
    ).withColumn("n_tokens", F.col("n_tokens").cast("bigint"))
    with_off = bucketed_cumsum(
        d, id_col, "n_tokens", bucket_width, out="start_off"
    )
    cap = int(capacity)
    return with_off.select(
        id_col,
        "n_tokens",
        F.col("start_off").alias("start_off"),
        F.expr(f"start_off div {cap}").alias("start_seq"),
        F.expr(
            f"greatest(start_off, start_off + n_tokens - 1) div {cap}"
        ).alias("end_seq"),
    )


def packed_sequence_slices(
    spans: DataFrame, capacity: int, id_col: str = "doc_id"
) -> DataFrame:
    """The trainer hand-off relation: one row per (sequence, document)
    the document touches — (seq, id_col, start_in_seq,
    n_tokens_in_seq), i.e. exactly WHERE inside each packed sequence
    the document's tokens sit, the attention-mask boundary input
    ``pack_sequences``'s span view only implies.

    Pure integer interval arithmetic over the spans' global offsets:
    a doc occupying global tokens ``[start_off, start_off+n_tokens)``
    contributes to sequence ``s`` the intersection with ``[s*capacity,
    (s+1)*capacity)``. Invariants (oracle-checkable, q258): per-seq
    slices sum to ``capacity`` on every sequence except the final
    partial one; per-doc slices sum to ``n_tokens``; zero-token docs
    keep one zero-length row at their offset.

    Input must be ``pack_sequences`` output (needs ``start_off``)."""
    cap = int(capacity)
    s_lo = F.col("seq") * cap
    lo = F.greatest(F.col("start_off"), s_lo)
    hi = F.least(F.col("start_off") + F.col("n_tokens"), s_lo + cap)
    return (
        spans.select(
            id_col,
            "n_tokens",
            "start_off",
            F.explode(
                F.sequence(F.col("start_seq"), F.col("end_seq"))
            ).alias("seq"),
        )
        .select(
            F.col("seq").cast("bigint").alias("seq"),
            id_col,
            (lo - s_lo).cast("bigint").alias("start_in_seq"),
            (hi - lo).cast("bigint").alias("n_tokens_in_seq"),
        )
    )


def packed_sequence_stats(spans: DataFrame) -> DataFrame:
    """Per-sequence roll-up of ``pack_sequences`` output: (seq, n_docs,
    n_boundary_docs) — how many docs touch each sequence and how many
    straddle a cut (span more than one). The packing-efficiency view a
    training pipeline monitors (straddlers are attention-mask
    breakpoints)."""
    exploded = spans.select(
        F.explode(
            F.sequence(F.col("start_seq"), F.col("end_seq"))
        ).alias("seq"),
        (F.col("end_seq") > F.col("start_seq")).alias("straddles"),
    )
    return exploded.groupBy("seq").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("straddles").cast("bigint"))
        .cast("bigint")
        .alias("n_boundary_docs"),
    )
