"""Training-mixture composition: per-domain token budgets with a
max-share cap, then deterministic budgeted selection — the "data
mixing" step between curation and packing in an LLM pipeline (decide
how many tokens each domain/language/source contributes to the run,
then pick WHICH documents fill each budget, reproducibly).

Allocation contract (two-round capped proportional split, exact
integer arithmetic end to end):

1. round 1 — proportional share, floored:
   ``base_d = budget * avail_d // total_avail``, clipped by the
   per-domain cap ``floor(max_share * budget)`` and by ``avail_d``;
2. round 2 — the flooring/cap leftover is redistributed once,
   proportionally to remaining headroom
   (``min(avail_d, cap) - alloc1_d``), again floored and clipped.

The residual after round 2 is at most (#domains - 1) tokens of
flooring plus whatever the caps make unplaceable — accepted by design
(true water-filling is iterative; two rounds are deterministic,
SQL-replayable, and within one doc of it in practice). The allocation
itself is a CONTROL-PLANE computation: #domains is a human-reviewed
mixture config, so the per-domain totals collect to the driver and
the arithmetic runs in Python integers (arbitrary precision — no
2^63 product ceiling at 100 TB budgets), then rejoins the data plane
as broadcast literals.

Selection contract: within each domain, documents in ``id_col`` order
are taken while their INCLUSIVE token prefix sum stays <= the domain's
allocation — no domain ever exceeds its budget, the boundary document
is dropped rather than split (packing handles splitting, q254/q260).
The prefix sum rides ``bucketed_cumsum(partition_by=[domain])`` —
per-(domain, id-bucket) partial sums, a bucket-relation-sized offset
window, and a per-row window keyed by (domain, bucket) — because a
domain is exactly the skewed key a 100 TB corpus guarantees (one
language can be 80 % of it); a plain per-domain running window would
funnel that whole domain through a single task.

Reference parity: none (SURVEY §2b north-star surface); composes with
q61 stratified sampling (rate-based) by being BUDGET-based, which is
what mixture configs actually specify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.local import local_relation


def domain_token_allocation(
    avail: dict[str, int], budget: int, max_share: float
) -> dict[str, int]:
    """Exact two-round capped proportional allocation (module
    docstring). ``avail`` maps domain -> available tokens; returns
    domain -> allocated tokens (every domain present, possibly 0)."""
    budget = int(budget)
    cap = int(max_share * budget)
    total = sum(avail.values())
    if total <= 0 or budget <= 0:
        return {d: 0 for d in avail}
    base = {d: budget * a // total for d, a in avail.items()}
    alloc1 = {d: min(base[d], cap, avail[d]) for d in avail}
    left = budget - sum(alloc1.values())
    head = {d: min(avail[d], cap) - alloc1[d] for d in avail}
    h_total = sum(head.values())
    if left <= 0 or h_total <= 0:
        return alloc1
    return {
        d: alloc1[d] + min(head[d], left * head[d] // h_total)
        for d in avail
    }


def _mix_parts(
    docs: DataFrame,
    budget: int,
    max_share: float,
    domain_col: str,
    tokens_col: Column | str | None,
    id_col: str,
    bucket_width: int = 4096,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(narrow tokenized relation, allocation relation, narrow selected
    relation) — the shared assembly behind select/summary.

    Every decision in mixing depends only on (id, domain, n_tokens) —
    never on the document payload — so the text is tokenized exactly
    ONCE into that narrow relation and checkpointed (guide §8: decide
    with small rows, move big rows once). Before this shape, the
    summary tokenized the corpus three times (avail collect, avail_df,
    the selection's cumsum) and the selection dragged the text payload
    through the cumsum's shuffle and windows."""
    if tokens_col is None:
        from ..functions.text import n_tokens_expr

        tokens_col = n_tokens_expr("text")
    narrow = docs.select(
        id_col,
        domain_col,
        (
            F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
        )
        .cast("bigint")
        .alias("n_tokens"),
    ).localCheckpoint()
    avail = {
        r["d"]: int(r["a"])
        for r in narrow.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum("n_tokens").alias("a"))
        .collect()
    }
    alloc = domain_token_allocation(avail, budget, max_share)
    alloc_df = local_relation(
        docs.sparkSession,
        [(k, v) for k, v in sorted(alloc.items())],
        f"{domain_col} string, allocation bigint",
    )
    from .packing import bucketed_cumsum

    # Inclusive per-domain prefix sum, built on the bucketed two-pass
    # cumsum (exclusive + this row) — NOT a per-domain running window:
    # a domain is exactly the skewed key at 100 TB (one language can be
    # 80 % of a corpus), so no window over the doc relation may be
    # partitioned by the domain alone. bucketed_cumsum's offset window
    # (partitioned by domain) runs over the per-bucket relation only
    # (#buckets rows); the per-row window is keyed by (domain, bucket).
    sel = (
        bucketed_cumsum(
            narrow.join(F.broadcast(alloc_df), domain_col),
            id_col,
            "n_tokens",
            bucket_width=bucket_width,
            out="__excl",
            partition_by=[domain_col],
        )
        .withColumn(
            "__cum", (F.col("__excl") + F.col("n_tokens")).cast("bigint")
        )
        .filter(F.col("__cum") <= F.col("allocation"))
        .drop("__cum", "__excl")
    )
    return narrow, alloc_df, sel


def domain_mix_select(
    docs: DataFrame,
    budget: int,
    max_share: float,
    domain_col: str = "lang",
    tokens_col: Column | str | None = None,
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """The selected-documents relation: ``docs`` columns plus
    ``n_tokens`` and the domain's ``allocation`` — documents taken in
    ``id_col`` order per domain while the inclusive token prefix sum
    fits the domain's exact allocation. ``bucket_width``: size it so
    #buckets (≈ id range / width) stays broadcast-sized — at 10^11
    ids raise it toward 10^6 (the offsets relation the cumsum
    broadcasts has one row per (domain, bucket))."""
    sel = _mix_parts(
        docs, budget, max_share, domain_col, tokens_col, id_col,
        bucket_width,
    )[2]
    # attach the decision back to the payload: ONE id-equi-join (the
    # docs side is never shuffled through the cumsum windows; column
    # pruning keeps a narrow-projection caller from reading the text
    # at all). No broadcast hint — the selection is budget-bounded but
    # not control-plane-sized; AQE decides from runtime stats.
    out_cols = (
        [domain_col]
        + [c for c in docs.columns if c != domain_col]
        + ["n_tokens", "allocation"]
    )
    return docs.join(
        sel.select(id_col, "n_tokens", "allocation"), id_col
    ).select(*out_cols)


def domain_mix_summary(
    docs: DataFrame,
    budget: int,
    max_share: float,
    domain_col: str = "lang",
    tokens_col: Column | str | None = None,
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """Per-domain mixture report: (domain, avail_tokens, allocation,
    n_docs, tokens_taken) — the view a mixture config review reads.
    ``tokens_taken <= allocation <= min(avail_tokens, cap)`` by
    construction (invariants the oracle replays exactly). Domains
    whose allocation no document fits still report their true
    allocation with zero taken."""
    narrow, alloc_df, sel = _mix_parts(
        docs, budget, max_share, domain_col, tokens_col, id_col,
        bucket_width,
    )
    # every summary relation derives from the narrow checkpoint — the
    # corpus text is tokenized once, and never re-read here
    avail_df = narrow.groupBy(domain_col).agg(
        F.sum("n_tokens").cast("bigint").alias("avail_tokens")
    )
    taken = sel.groupBy(domain_col).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_taken"),
    )
    return (
        avail_df.join(alloc_df, domain_col)
        .join(taken, domain_col, "left")
        .select(
            domain_col,
            "avail_tokens",
            "allocation",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("tokens_taken", F.lit(0))
            .cast("bigint")
            .alias("tokens_taken"),
        )
    )
