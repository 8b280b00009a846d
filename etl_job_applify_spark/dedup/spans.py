"""Exact-substring span duplication: docs sharing a verbatim k-token run.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499) deduplicate on *exact* repeated substrings (50-token
spans) rather than document-level similarity: a verbatim paragraph pasted
into two otherwise-different pages is invisible to whole-document Jaccard
(q31) yet is precisely the memorization hazard for an LLM. The suffix
array of the paper is a single-machine structure; the distributed
equivalent is an inverted index over sliding k-token windows — every
shared window is a witness that an exact >= k-token run occurs in both
documents.

Same relational shape as jaccard.py (postings → capped groups →
in-group combinations → per-pair counts), so it inherits the scale
properties proven there: one groupBy shuffle over postings, fanout
bounded by max_doc_freq² per window, no all-pairs path. The difference
is the scoring: raw shared-window count plus the asymmetric containment
fraction (shared / own window count), which flags a short doc fully
embedded in a long one — exactly the quote/excerpt case whole-doc
similarity misses.

Reference parity: none (the reference has no text analytics); this is
north-star LLM-pipeline surface (SURVEY §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .shingles import with_hashed_shingles


def shared_span_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 6,
    max_doc_freq: int = 50,
    min_shared: int = 1,
) -> DataFrame:
    """(a, b, shared_spans, containment_a, containment_b) for doc pairs
    sharing >= ``min_shared`` verbatim ``n``-token windows.

    ``max_doc_freq`` drops windows present in more than that many docs
    (boilerplate headers/footers — no pair signal, quadratic fanout).
    Containment denominators are the post-cap per-doc window counts,
    mirroring the jaccard path so the cap stays a single HAVING in the
    SQL oracle.
    """
    spread = docs.select(id_col, text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    # a "span" IS a distinct word n-gram — the jaccard path's shingle
    # key expression reused verbatim, just at window length n. Keys are
    # built hash-first (token hashes combined per window, the n-gram
    # string never materialized — see with_hashed_shingles); counts and
    # containments are unchanged up to the same 64-bit collision odds
    # the string-hash key already accepted.
    postings = with_hashed_shingles(spread, text_col, n, out="spans").select(
        F.col(id_col).alias("doc"),
        F.explode("spans").alias("span"),
    )
    grouped = (
        postings.groupBy("span")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size("docs") <= max_doc_freq)
    )
    sizes = (
        grouped.select(F.explode("docs").alias("doc"))
        .groupBy("doc")
        .agg(F.count("*").alias("sz"))
    )
    pair_structs = (
        "flatten(transform(docs, (x, i) -> "
        "transform(slice(docs, i + 2, size(docs)), "
        "y -> struct(x AS a, y AS b))))"
    )
    shared = (
        grouped.select(F.explode(F.expr(pair_structs)).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared_spans"))
        .filter(F.col("shared_spans") >= min_shared)
    )
    sa = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            "shared_spans",
            (F.col("shared_spans") / F.col("sz_a")).alias("containment_a"),
            (F.col("shared_spans") / F.col("sz_b")).alias("containment_b"),
        )
    )


def contamination_spans(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 6,
) -> DataFrame:
    """Benchmark decontamination (the PaLM/GPT n-gram rule, cross-set
    form of ``shared_span_pairs``): (doc, n_contaminated_spans,
    n_spans, contamination) for every TRAIN document sharing at least
    one verbatim ``n``-token window with ANY eval document — the
    documents a training run must drop so eval scores measure
    generalization, not memorization.

    Relational shape: both sides shingle into distinct per-doc window
    sets (the q147 machinery); the check is one equi-join of train
    postings against the DISTINCT eval window set plus one per-doc
    count — no pair generation, so no ``max_doc_freq`` cap is needed
    (a boilerplate window flags every train doc carrying it, which IS
    the decontamination semantics). At 100 TB the eval set is
    benchmark-sized, so the join broadcasts (AQE sizes it; no hint);
    the train side stays one pruned scan + one shuffle on the window
    hash. ``contamination`` = shared / own distinct window count (the
    fraction an audit thresholds on)."""

    def postings(docs: DataFrame) -> DataFrame:
        spread = docs.select(id_col, text_col).repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
        return with_hashed_shingles(
            spread, text_col, n, out="spans"
        ).select(
            F.col(id_col).alias("doc"),
            F.explode("spans").alias("span"),
        )
    tp = postings(train_docs)
    ev = postings(eval_docs).select("span").distinct()
    sizes = tp.groupBy("doc").agg(F.count("*").alias("n_spans"))
    hits = (
        tp.join(ev, "span")
        .groupBy("doc")
        .agg(F.count("*").cast("bigint").alias("n_contaminated_spans"))
    )
    return hits.join(sizes, "doc").select(
        "doc",
        "n_contaminated_spans",
        F.col("n_spans").cast("bigint").alias("n_spans"),
        (
            F.col("n_contaminated_spans") / F.col("n_spans")
        ).alias("contamination"),
    )
