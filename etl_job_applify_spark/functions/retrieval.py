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


def bm25_score_join(
    tf: DataFrame,
    dl: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """The BM25 scoring join over pre-computed relations — the ONE
    expression both the recompute path (``bm25_scores``) and the
    persisted-index probe (``functions/text_index.py``) go through, so
    index-served scores are bit-identical to corpus-recomputed ones.

    ``tf``: (id_col, word, tf); ``dl``: (id_col, dl);
    ``dfreq``: (word, df); ``stats``: one row (n, avgdl)."""
    group_cols = [c for c in qterms.columns if c != "word"]
    return (
        tf.join(F.broadcast(qterms), "word")
        .join(
            F.broadcast(dfreq.join(F.broadcast(qterms), "word", "left_semi")),
            "word",
        )
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(*group_cols, id_col)
        .agg(
            F.expr(
                "CAST(SUM(CAST("
                f" ((n - df + {_e(0.5)}) / (df + {_e(0.5)}))"
                f" * (tf * {_e(k1 + 1)})"
                f" / (tf + {_e(k1)} * ({_e(1 - b)} + {_e(b)} * dl / avgdl))"
                " AS DECIMAL(28,6))) AS DOUBLE)"
            ).alias("score")
        )
    )


def bm25_scores(
    docs: DataFrame,
    qterms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
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
        tf, dl, dfreq, stats, qterms, id_col=id_col, k1=k1, b=b
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
