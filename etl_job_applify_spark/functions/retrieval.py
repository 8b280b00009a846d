"""Shared keyword-retrieval kernels: BM25 scoring and positional phrase
matching.

Single source of truth for the scoring/join shapes used by the
registered queries (q190/q191, queries/textops.py) and the composed
example (examples/retrieval_pipeline.py) — the constants, decimal
width, and join shapes live here so the two call sites cannot drift.

Cross-engine contracts (see the q190/q191 oracle notes):

- the BM25 expression is log-free (rational Robertson-odds idf —
  ``ln()`` is not bit-stable between engines) and every float literal
  is rendered in e-notation (a bare ``0.5`` parses as DECIMAL, not
  DOUBLE, in both SQL dialects and walks a different rounding path);
- per-document sums go through the DECIMAL(28,6) accumulate idiom so
  term order cannot shift bits;
- token positions are 1-based to share arithmetic with
  ``generate_subscripts``-style oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _e(x: float) -> str:
    """Render a float as an e-notation SQL literal (always DOUBLE)."""
    return f"{x!r}e0"


def doc_tokens(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, word) token stream — one explode, whitespace tokens."""
    return docs.select(
        id_col, F.explode(F.expr(f"split({text_col}, ' ')")).alias("word")
    )


def token_positions(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, pos, word) positional token stream, positions 1-based."""
    return docs.select(
        id_col,
        F.posexplode(F.split(text_col, " ")).alias("pos0", "word"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "word")


def _idf_expr(scoring: str) -> str:
    """The idf factor for one term, by ``scoring`` variant:

    - ``"odds"`` (default): rational Robertson odds
      ``(N - df + 0.5) / (df + 0.5)`` — log-free for cross-engine
      bit-stability (the exact-oracle contract; see ``bm25_scores``);
    - ``"log"``: textbook Robertson log-idf
      ``ln((N - df + 0.5) / (df + 0.5))`` — the Lucene/Elasticsearch-
      comparable weighting (modulo Lucene's ``ln(1 + odds)`` floor).
      ``ln()`` is transcendental, so cross-engine agreement is to the
      last ulp of libm, not bit-contractual; the DECIMAL(28,6)
      per-term quantization below absorbs that in practice (a 1-ulp
      ln() difference flips the quantized value only when it straddles
      a 1e-6 grid boundary). Negative idf (df > N/2 stopwords) is kept
      as Robertson defined it — the WAND bound dominance in
      ``bm25_topk_pruned`` is sign-agnostic (per-term max ≥ per-term
      actual regardless of sign)."""
    odds = f"((n - df + {_e(0.5)}) / (df + {_e(0.5)}))"
    if scoring == "odds":
        return odds
    if scoring == "log":
        return f"ln{odds}"
    raise ValueError(f"unknown BM25 scoring variant {scoring!r}")


def _contrib_expr(k1: float, b: float, scoring: str = "odds") -> str:
    """One query term's BM25 contribution for one document, quantized to
    the exact DECIMAL(28,6) accumulator grid — the per-row expression
    whose SUM is the score. Shared verbatim by the scoring join and the
    pruned-top-k bounds so the bound-dominates-score inequality holds in
    EXACT decimal arithmetic (see ``bm25_topk_pruned``)."""
    from .exact import quantize_expr

    return quantize_expr(
        f"{_idf_expr(scoring)}"
        f" * (tf * {_e(k1 + 1)})"
        f" / (tf + {_e(k1)} * ({_e(1 - b)} + {_e(b)} * dl / avgdl))"
    )


def _contrib_rows(
    tf: DataFrame,
    dl: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    id_col: str,
    k1: float,
    b: float,
    extra_cols: Sequence[str] = (),
    scoring: str = "odds",
) -> DataFrame:
    """(qterms group cols..., id_col, [extra...], c) — one decimal
    contribution row per (query, term, matching doc)."""
    group_cols = [c for c in qterms.columns if c != "word"]
    return (
        tf.join(F.broadcast(qterms), "word")
        .join(
            F.broadcast(dfreq.join(F.broadcast(qterms), "word", "left_semi")),
            "word",
        )
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            *group_cols,
            id_col,
            *extra_cols,
            F.expr(_contrib_expr(k1, b, scoring)).alias("c"),
        )
    )


def bm25_score_join(
    tf: DataFrame,
    dl: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    scoring: str = "odds",
) -> DataFrame:
    """The BM25 scoring join over pre-computed relations — the ONE
    expression both the recompute path (``bm25_scores``) and the
    persisted-index probe (``functions/text_index.py``) go through, so
    index-served scores are bit-identical to corpus-recomputed ones.

    ``tf``: (id_col, word, tf); ``dl``: (id_col, dl);
    ``dfreq``: (word, df); ``stats``: one row (n, avgdl)."""
    group_cols = [c for c in qterms.columns if c != "word"]
    return (
        _contrib_rows(tf, dl, dfreq, stats, qterms, id_col, k1, b,
                      scoring=scoring)
        .groupBy(*group_cols, id_col)
        .agg(F.expr("CAST(SUM(c) AS DOUBLE)").alias("score"))
    )


def bm25_topk_pruned(
    tf: DataFrame,
    dl: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    scoring: str = "odds",
) -> DataFrame:
    """Top-``k`` BM25 documents per query with WAND-style LOSSLESS
    bound pruning: the exact scoring aggregate and the rank sort run
    only over documents whose term-upper-bound sum can still reach the
    current threshold.

    Two-phase relational WAND (Broder et al., CIKM'03, re-expressed as
    joins — no document-at-a-time cursors):

    1. seed θ: exact-score only the documents containing each query's
       RAREST term (the shortest posting list) and take the k-th best
       score as the per-query threshold;
    2. bound: per (query, doc), sum the per-term maxima (``ub_t``) over
       the terms the doc contains. ``score(d) ≤ bound(d)`` term-wise,
       so ``bound < θ`` proves d cannot beat the k seeds — only the
       survivors reach the exact scoring aggregate and the top-k sort.

    Losslessness is EXACT, not approximate: contributions, bounds and
    θ all live on the same DECIMAL(28,6) grid (``_contrib_expr``), so
    the dominance inequality cannot be broken by float rounding, and
    ties at θ are kept (the prune is strictly ``<``). Queries with
    fewer than k seeded documents get no threshold and skip pruning.

    Scale: at 100 TB the per-term postings already arrive
    pushdown-filtered (functions/text_index.py); this kernel is what
    keeps the SCORING side sublinear too — the groupBy+window run over
    |survivors| ≈ k·|queries| rows instead of every posting match. The
    contribution relation is persisted once and feeds seed/bound/final
    (three consumers, one computation).

    Broadcast premise: the hinted relations (rare terms, per-term upper
    bounds, per-query thresholds) are all bounded by |queries|·|terms| —
    the same control-plane-small query-batch premise the index probe
    documents (text_index_bm25). A mega-batch serving run (millions of
    queries in one call) breaks that premise for EVERY stage of this
    kernel, not just the hints — shard the query set instead.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    g = [c for c in qterms.columns if c != "word"]
    contrib = _contrib_rows(
        tf, dl, dfreq, stats, qterms, id_col, k1, b,
        extra_cols=["word", "df"], scoring=scoring
    ).persist(StorageLevel.MEMORY_AND_DISK)

    ub = contrib.groupBy(*g, "word").agg(
        F.max("c").alias("ub"), F.max("df").alias("df")
    )
    w_rare = Window.partitionBy(*g).orderBy(F.asc("df"), F.asc("word"))
    rare = (
        ub.withColumn("__rn", F.row_number().over(w_rare))
        .filter(F.col("__rn") == 1)
        .select(*g, F.col("word").alias("__rare"))
    )
    seed_docs = (
        contrib.join(F.broadcast(rare), g)
        .filter(F.col("word") == F.col("__rare"))
        .select(*g, id_col)
    )
    seed_scores = (
        contrib.join(seed_docs, [*g, id_col], "left_semi")
        .groupBy(*g, id_col)
        .agg(F.sum("c").alias("__sc"))
    )
    w_k = Window.partitionBy(*g).orderBy(F.desc("__sc"), F.asc(id_col))
    theta = (
        seed_scores.withColumn("__rn", F.row_number().over(w_k))
        .filter(F.col("__rn") == k)
        .select(*g, F.col("__sc").alias("__theta"))
    )
    bound = (
        contrib.join(F.broadcast(ub.select(*g, "word", "ub")), [*g, "word"])
        .groupBy(*g, id_col)
        .agg(F.sum("ub").alias("__bound"))
    )
    cand = (
        bound.join(F.broadcast(theta), g, "left")
        .filter(
            F.col("__theta").isNull()
            | (F.col("__bound") >= F.col("__theta"))
        )
        .select(*g, id_col)
    )
    final = (
        contrib.join(cand, [*g, id_col], "left_semi")
        .groupBy(*g, id_col)
        .agg(F.expr("CAST(SUM(c) AS DOUBLE)").alias("score"))
    )
    w_rank = Window.partitionBy(*g).orderBy(F.desc("score"), F.asc(id_col))
    return (
        final.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= k)
        .select(*g, id_col, "rnk", "score")
    )


def bm25_scores(
    docs: DataFrame,
    qterms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    scoring: str = "odds",
) -> DataFrame:
    """BM25 score per (query, document) with rational Robertson-odds
    idf: ``(N - df + 0.5) / (df + 0.5)`` — the log is dropped for
    cross-engine bit-stability (``ln()`` disagrees between engines in
    the last ulp). NOTE: that is monotone PER TERM only; the score is
    a SUM over query terms, so rational odds re-weights terms against
    each other (rare terms weigh more than under log idf) and
    multi-term rankings can deviate from textbook log-idf BM25.
    Single-term queries rank identically. For textbook rankings, wrap
    the odds in ``ln()`` and forgo the bit-exact oracle contract.

    ``qterms`` carries one row per query term; any extra columns (e.g.
    a ``qid``) group the final sum, so both "one query" (a bare
    ``word`` column) and "a query set" (``qid, word``) call through the
    same kernel. Returns the qterms' grouping columns + ``doc_id`` +
    ``score``.

    Plan: ONE corpus-sized exchange (the tf aggregation); dl and df
    both derive from tf; query terms / df / corpus stats reach the
    score join as broadcasts (vocabulary is Heaps-law sublinear, the
    stats relation is one row)."""
    toks = doc_tokens(docs, text_col, id_col)
    tf = toks.groupBy(id_col, "word").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    return bm25_score_join(
        tf, dl, dfreq, stats, qterms, id_col=id_col, k1=k1, b=b,
        scoring=scoring,
    )


def phrase_hits(toks: DataFrame, words: Sequence[str],
                id_col: str = "doc_id") -> DataFrame:
    """Occurrence starts (id, p) of the exact phrase ``words`` over a
    positional token stream: per-word pushdown-filtered posting scans
    chained on (id, pos - offset) equi-joins — each join leg reads only
    that word's postings, never a corpus regex scan. Overlap-aware:
    every start position counts."""
    hits = toks.filter(F.col("word") == words[0]).select(
        id_col, F.col("pos").alias("p")
    )
    for k, w in enumerate(words[1:], 1):
        hits = hits.join(
            toks.filter(F.col("word") == w).select(
                id_col, (F.col("pos") - k).alias("p")
            ),
            [id_col, "p"],
        )
    return hits


def proximity_hits(
    toks: DataFrame,
    words: Sequence[str],
    window: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Unordered proximity ("sloppy AND"): one row per position
    combination where ALL ``words`` co-occur within ``window``
    consecutive tokens — (id, span), span = max(pos) − min(pos) ≤
    window − 1.  The within-window companion of ``phrase_hits``
    (exact adjacency): per-word pushdown-filtered scans chained on the
    id equi-join, the span test a residual — each leg reads only that
    word's postings, never a corpus scan.

    Fanout per document is Π tf(wᵢ) — fine for the selective terms a
    proximity query targets; for stopword-grade terms prune upstream
    (``max_df`` — the same pressure signal the text index tracks).
    ``words`` must be distinct: duplicate words would pair a position
    with itself and a within-window duplicate check is ``tf ≥ 2`` on
    the postings, not a proximity question."""
    if len(set(words)) != len(words):
        raise ValueError("proximity words must be distinct")
    if window < 1:
        raise ValueError("window must be >= 1")
    pcols = []
    hits = None
    for k, w in enumerate(words):
        leg = toks.filter(F.col("word") == w).select(
            id_col, F.col("pos").alias(f"p{k}")
        )
        hits = leg if hits is None else hits.join(leg, id_col)
        pcols.append(f"p{k}")
    span = F.greatest(*pcols) - F.least(*pcols) if len(pcols) > 1 else F.lit(0)
    return (
        hits.select(id_col, span.alias("span"))
        .filter(F.col("span") <= window - 1)
    )
