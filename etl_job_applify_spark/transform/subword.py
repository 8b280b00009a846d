"""BPE subword tokenizer training as reusable corpus operators.

The kernels behind q203/q208 (queries/subword.py documents the
semantics, the run-parity overlap lemma, and the scale analysis), here
as library calls a curation pipeline composes directly:

- ``bpe_merge_round``   one greedy left-to-right pair merge, purely
                        relational (window functions, no regex);
- ``learn_bpe``         the training loop: corpus → weighted vocabulary
                        → N merge rounds → (merge table, tokenized
                        vocabulary relation);
- ``bpe_word_subwords`` per-word subword counts from the tokenized
                        vocabulary — the encode side's join input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.iterate import fresh_local_checkpoint


def bpe_merge_round(seq: DataFrame, s1: str, s2: str) -> DataFrame:
    """Apply one greedy left-to-right merge of (s1, s2) to a
    (wid, f, pos, sym) sequence relation. Overlapping matches (possible
    only when s1 == s2) resolve by run parity — see queries/subword.py
    for the argument."""
    return bpe_merge_batch(seq, [(s1, s2)])


def bpe_merge_batch(
    seq: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Apply a batch of SYMBOL-DISJOINT merges in ONE relational pass.

    Disjointness (no symbol appears in two pairs, as left or right) is
    the caller's contract (``_select_disjoint_pairs`` enforces it in
    ``learn_bpe``) and what makes the single pass exact: adjacent
    matched positions would need a symbol to be one pair's right AND
    another's left, which disjointness forbids — so every contiguous
    match run is a SINGLE pair's run and the existing parity argument
    applies verbatim (same-symbol runs (a,a) included). Consequence:
    the batch result equals applying the same merges sequentially via
    ``bpe_merge_round`` in ANY order (merge-order equivalence,
    test-pinned on the fixture)."""
    w = Window.partitionBy("wid").orderBy("pos")
    run = Window.partitionBy("wid", "grp")
    pair_lits = F.array(
        *[
            F.struct(F.lit(a).alias("l"), F.lit(b).alias("r"))
            for a, b in pairs
        ]
    )
    marked = (
        seq.withColumn("nxt_sym", F.lead("sym").over(w))
        .withColumn(
            "match",
            F.coalesce(
                F.array_contains(
                    pair_lits,
                    F.struct(
                        F.col("sym").alias("l"),
                        F.col("nxt_sym").alias("r"),
                    ),
                ),
                F.lit(False),
            ),
        )
        .withColumn(
            "mseq",
            F.sum(F.when(F.col("match"), 1).otherwise(0)).over(w),
        )
        .withColumn("grp", F.col("pos") - F.col("mseq"))
        .withColumn(
            "do_merge",
            F.col("match")
            & (
                (
                    F.col("mseq")
                    - F.min(F.when(F.col("match"), F.col("mseq"))).over(run)
                )
                % 2
                == 0
            ),
        )
        .withColumn(
            "prev_merge",
            F.coalesce(F.lag("do_merge").over(w), F.lit(False)),
        )
    )
    return (
        marked.filter(~F.col("prev_merge"))
        .select(
            "wid",
            "f",
            F.row_number().over(w).alias("pos"),
            F.when(
                F.col("do_merge"), F.concat(F.col("sym"), F.col("nxt_sym"))
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


def _merge_syms_col(pairs: list[tuple[str, str]]) -> F.Column:
    """Array twin of ``bpe_merge_batch``: apply a batch of
    symbol-disjoint merges to a ``syms`` array column in ONE
    left-to-right fold — no window, no per-word shuffle.

    The fold replays the classic greedy scan the windowed formulation
    encodes positionally: walk the symbols; when the PREVIOUS emitted
    symbol is raw (not itself produced by a merge this round) and
    (prev, cur) is a batch pair, replace it with the merged symbol and
    mark it non-raw; otherwise emit cur raw. A merged symbol never
    re-matches within the round (matches are against the pre-round
    sequence — the ``do_merge`` semantics), and for same-symbol runs
    (a,a) the raw/non-raw flag alternates exactly like the windowed
    run-parity rule, so the result is identical
    (tests/test_subword.py::test_array_merge_matches_row_merge).

    Per-word cost is O(len²) array copies in the worst case — fine for
    natural-language word lengths (the windowed form pays two window
    sorts over the exploded corpus instead)."""
    pair_lits = F.array(
        *[
            F.struct(F.lit(a).alias("l"), F.lit(b).alias("r"))
            for a, b in pairs
        ]
    )

    def step(st: F.Column, s: F.Column) -> F.Column:
        last = F.element_at(st["out"], -1)
        can = (
            (F.size(st["out"]) > 0)
            & ~st["lastm"]
            & F.array_contains(
                pair_lits, F.struct(last.alias("l"), s.alias("r"))
            )
        )
        merged = F.concat(
            F.slice(st["out"], F.lit(1), F.size(st["out"]) - 1),
            F.array(F.concat(last, s)),
        )
        appended = F.concat(st["out"], F.array(s))
        return F.when(
            can,
            F.struct(merged.alias("out"), F.lit(True).alias("lastm")),
        ).otherwise(
            F.struct(appended.alias("out"), F.lit(False).alias("lastm"))
        )

    init = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(False).alias("lastm"),
    )
    return F.aggregate("syms", init, step, lambda st: st["out"])


def _select_disjoint_pairs(
    ranked: list[tuple[str, str, int]], batch: int
) -> list[tuple[str, str, int]]:
    """Greedy symbol-disjoint prefix of the (cnt desc, sym, nxt)-ranked
    pair list: take pairs in rank order, skipping any that shares a
    symbol (left or right) with one already taken, up to ``batch``.
    The top pair is always taken, so batch=1 is exactly the classic
    greedy schedule."""
    taken: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for a, b, c in ranked:
        if len(taken) >= batch:
            break
        if a in used or b in used:
            continue
        taken.append((a, b, c))
        used.update((a, b))
    return taken


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 6,
    min_word_len: int = 2,
    batch: int = 1,
) -> tuple[list[tuple[int, str, str, int, int]], DataFrame]:
    """Train BPE merges on a corpus; → (merge table rows
    (round, s1, s2, pair_count, corpus_tokens_after), final
    (wid, f, pos, sym) sequence — the tokenizer applied to the
    vocabulary). Vocabulary-level cost: the corpus is scanned once; the
    rounds run over distinct words weighted by frequency.

    ``batch``: merges selected per driver round. batch=1 (default) is
    classic greedy BPE — one pair per round, two Spark actions each, so
    a production 32k-merge vocabulary costs 64k driver rounds. batch=N
    collects the top ranked pairs once per round and applies the
    greedy SYMBOL-DISJOINT prefix (up to N pairs) in one relational
    pass (``bpe_merge_batch``) — ~N× fewer driver rounds at the same
    per-round cost. Within a batch the merges commute (disjointness;
    merge-order equivalence is test-pinned), so the batched schedule
    equals SOME sequential schedule of the same pairs; it can deviate
    from the strict one-at-a-time greedy schedule when a merge's newly
    created symbol would have out-ranked a later batch member — the
    standard batched-BPE trade (YouTokenToMe-style) that buys the N×
    driver-round cut; pin ``batch=1`` where exact greedy parity
    matters (q203 does).

    Merge-table granularity with ``batch>1``: ``pair_count`` is the
    pair's frequency measured BEFORE the round's batch applies (all
    batch members are ranked against the same pre-batch sequence —
    that is what makes them selectable in one pass), and
    ``corpus_tokens_after`` is the PER-ROUND post-batch total, shared
    by every merge of the round. The table is therefore an exact
    per-merge trajectory only at ``batch=1``; at ``batch>1`` read it
    per round (rows of one round share ``round`` and
    ``corpus_tokens_after``, and list order within the round is the
    greedy disjoint-selection order)."""
    words = (
        docs.select(F.explode(F.split(text_col, " ")).alias("wid"))
        .filter(F.length("wid") >= min_word_len)
        .groupBy("wid")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    # ARRAY representation for the round loop (round 16): one row per
    # distinct word with its symbol array, instead of one row per
    # (word, position). Adjacent-pair counts come from a zip of the
    # array against its own tail and merges apply as a per-word fold
    # (_merge_syms_col) — the per-round plan keeps ONE exchange (the
    # pair aggregate) where the exploded form paid a per-word window
    # sort+exchange for lead() and another inside the merge, and the
    # loop-carried checkpoint holds |vocab| rows instead of |chars|.
    # Guide §2.4 (remove shuffles outright) + §1.2 (the loop floor
    # dominated q203: 40 jobs for 0.5 s of task time on the round-16
    # profile). The returned relation converts back to the exploded
    # (wid, f, pos, sym) contract once, after the loop.
    syms = (
        words.select(
            "wid",
            "f",
            F.expr(
                "transform(sequence(1, length(wid)),"
                " i -> substring(wid, i, 1))"
            ).alias("syms"),
        )
        .localCheckpoint()
    )
    pair_zip = (
        "zip_with(slice(syms, 1, size(syms) - 1),"
        " slice(syms, 2, size(syms) - 1),"
        " (a, b) -> struct(a AS sym, b AS nxt))"
    )
    merges: list[tuple[int, str, str, int, int]] = []
    # a round's corpus_tokens_after is Σ f·|syms| over the relation the
    # NEXT round ranks on — so it rides the next round's head action
    # (crossJoin of the ranked head with the 1-row total, the
    # scalar-branch idiom) instead of a dedicated per-round aggregate
    # job; only the final round pays a separate total action
    # (round-15, guide §1.2: fewer driver actions per round, identical
    # arithmetic).
    pending: tuple[int, list[tuple[str, str, int]]] | None = None

    def _total() -> F.Column:
        return F.sum(F.col("f") * F.size("syms")).cast("bigint")

    def _flush(tokens_after: int) -> None:
        pr, plist = pending  # type: ignore[misc]
        merges.extend((pr, a, b, c, tokens_after) for a, b, c in plist)

    for r in range(1, rounds + 1):
        pairs = (
            syms.select("f", F.explode(F.expr(pair_zip)).alias("p"))
            .select("p.sym", "p.nxt", "f")
            .groupBy("sym", "nxt")
            .agg(F.sum("f").cast("bigint").alias("cnt"))
        )
        # O(batch) driver rows: the round's ranked pair head (control
        # plane); 4x over-fetch leaves room for disjointness skips
        head_q = pairs.orderBy(F.desc("cnt"), "sym", "nxt").limit(
            max(1, 4 * batch)
        )
        if pending is None:
            head = head_q.collect()
        else:
            head = head_q.crossJoin(
                syms.agg(_total().alias("__tot"))
            ).collect()
            _flush(
                int(head[0]["__tot"])
                if head
                else int(syms.agg(_total()).collect()[0][0])
            )
            pending = None
        if not head:
            break
        picked = _select_disjoint_pairs(
            [(t["sym"], t["nxt"], int(t["cnt"])) for t in head], batch
        )
        syms = syms.withColumn(
            "syms", _merge_syms_col([(a, b) for a, b, _ in picked])
        ).transform(fresh_local_checkpoint)  # loop-carried: reset stats
        pending = (r, picked)
    if pending is not None:
        _flush(int(syms.agg(_total()).collect()[0][0]))
    seq = syms.select(
        "wid", "f", F.posexplode("syms").alias("pos", "sym")
    ).select("wid", "f", (F.col("pos") + 1).alias("pos"), "sym")
    return merges, seq


def bpe_word_subwords(seq: DataFrame) -> DataFrame:
    """(wid, n_sub): per-word subword counts from a tokenized
    vocabulary relation — join corpus tokens against this to encode."""
    return seq.groupBy("wid").agg(
        F.count("*").cast("bigint").alias("n_sub")
    )
