"""Exact n-gram Jaccard near-duplicate pairs via shingle inverted index.

Relational formulation (runs identically in Spark and any SQL engine,
which is what makes it DuckDB-oracle-checkable):

1. explode documents to distinct (doc_id, shingle) postings;
2. drop shingles occurring in more than ``max_doc_freq`` documents —
   stop-shingles create quadratic fanout and carry no signal (standard
   trick from MinHash/LSH literature);
3. self-join postings on shingle with doc_a < doc_b → co-occurrence
   counts |A∩B|;
4. jaccard = |A∩B| / (|A| + |B| − |A∩B|), filter by threshold.

Scale: the join shuffles postings, not documents. With the frequency cap,
fanout per shingle is bounded by ``max_doc_freq²`` pairs; AQE's skew join
splits any residual hot shingle. This is the exact-verification stage; at
100 TB you first prune candidates with MinHash banding (minhash.py) and
run this only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .shingles import with_hashed_shingles


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    cache_postings: bool = True,
    include_containment: bool = False,
    broadcast_sizes: bool = False,
) -> DataFrame:
    """Pairs (a, b, jaccard) with a < b and jaccard >= threshold.

    ``max_doc_freq``: drop shingles shared by more than this many docs
    before pairing (recall-lossy for near-identical boilerplate, essential
    at scale).

    ``cache_postings`` (uncapped path only): the postings relation feeds
    three plan branches; without materialization Spark re-runs the
    shingle pipeline per branch. The CAPPED path deliberately does NOT
    persist: its two consumers sit downstream of the same groupBy
    shuffle, so ReusedExchange already runs the expensive shingle
    map-side exactly once, and only the cheap post-shuffle aggregation
    repeats — measured cheaper than paying the cache's columnar
    materialization barrier (and an in-memory cache of a fresh logical
    plan is silently REUSED by Spark's CacheManager across invocations,
    which made repeat timings lie; see BENCHNOTES.md round 5).

    ``broadcast_sizes``: hash-broadcast the per-doc size relation into
    the final scoring joins instead of shuffling the pair aggregate
    twice. Right whenever |docs| is dimension-sized relative to the pair
    relation (one (id, int) row per doc); leave False at
    billion-document scale, where AQE decides from the measured sizes.
    """
    # shingling is compute-bound, not IO-bound: a corpus that is small in
    # bytes still needs every core, so spread rows before the heavy
    # expressions regardless of how few input splits the file produced
    spread = docs.select(id_col, text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    # join on a 64-bit hash of the shingle, not the string: 8-byte
    # shuffle keys, and both join sides shuffle the identical subplan →
    # Spark reuses one Exchange (collision odds over 2^64 are negligible
    # next to the corpus sizes this runs at). Round 16: the key is
    # built hash-first (token hashes combined per window — see
    # with_hashed_shingles) so the n-gram strings are never
    # materialized; same key equivalence classes as xxhash64 over the
    # concat string.
    postings = with_hashed_shingles(spread, text_col, n).select(
        F.col(id_col).alias("doc"), F.explode("shingles").alias("sh")
    )
    from pyspark import StorageLevel

    if max_doc_freq is not None:
        # Capped path: group postings by shingle ONCE and generate pairs
        # by in-group combination. The doc-frequency cap is then FREE — a
        # size() filter on the grouped row — instead of a second pass
        # over postings (window sort / count-join formulations both cost
        # an extra full-postings shuffle; measured ~25% of q31's runtime
        # at sf0.1). Per-group fanout is bounded by cap². Doc lists are
        # sorted so following-only combination yields each pair exactly
        # once with a < b — same multiset the self-join produced. Both
        # consumers below share this groupBy's Exchange (ReusedExchange),
        # so the shingle pipeline's map side runs once without a persist.
        grouped = (
            postings.groupBy("sh")
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
        common = (
            grouped.select(F.explode(F.expr(pair_structs)).alias("p"))
            .select("p.a", "p.b")
            .groupBy("a", "b")
            .agg(F.count("*").alias("common"))
        )
    else:
        # Uncapped exact baseline: hash-keyed self-join on the postings
        # (both sides shuffle the identical subplan → one Exchange).
        if cache_postings:
            # lifecycle: Spark's ContextCleaner unpersists the cache once
            # the returned plan (and this handle) are garbage-collected,
            # so repeated calls don't accumulate dead caches; explicit
            # tracking here would invalidate earlier, still-live results
            postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
        sizes = postings.groupBy("doc").agg(F.count("*").alias("sz"))
        a = postings.select(F.col("doc").alias("a"), "sh")
        b = postings.select(F.col("doc").alias("b"), "sh")
        common = (
            a.join(b, "sh")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("common"))
        )
    sa = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sz_b"))
    if broadcast_sizes:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    scored = (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if include_containment:
        # containment is ASYMMETRIC (|A∩B|/|A| vs /|B|): high containment
        # with low jaccard flags quotes/excerpts that symmetric dedup
        # misses — a first-class signal for LLM-corpus decontamination
        return scored.select(
            "a",
            "b",
            "jaccard",
            (F.col("common") / F.col("sz_a")).alias("containment_a"),
            (F.col("common") / F.col("sz_b")).alias("containment_b"),
        )
    return scored.select("a", "b", "jaccard")


def prefix_filtered_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact jaccard pairs via PPJoin-style PREFIX FILTERING (Chaudhuri
    et al. ICDE'06; Bayardo et al. WWW'07; Xiao et al. WWW'08).

    Same output as :func:`ngram_jaccard_pairs` (same ``threshold`` /
    ``max_doc_freq`` semantics — the correctness gate pins value
    equality); different candidate-generation shape. Each document's
    shingle set is put in a CANONICAL rarest-first order (ascending
    document frequency, shingle hash as tie-break) and only its first
    ``|A| - ceil(t*|A|) + 1`` shingles are indexed: if J(A,B) >= t, the
    canonically-smallest common shingle provably lies in BOTH prefixes
    (at most ceil(t*|A|)-1 of A's >= t*|A| intersection shingles fit in
    A's suffix), so joining prefixes loses nothing. Candidates are then
    verified exactly with one array_intersect over the full hash sets.

    Why this exists next to the inverted-index formulation: the postings
    self-join's fanout is sum over shingles of df² — the frequency cap
    bounds it, but every kept shingle still generates its full pair
    fanout. Prefix filtering cuts the GENERATING relation itself to
    ~(1-t) of each document (rarest shingles first, which concentrates
    candidates on discriminative features), at the price of one extra
    document-frequency aggregation and an array-carrying verify join.
    The crossover favors prefixes as documents grow and t rises; at the
    fixture scale the single-shuffle q31 shape measures faster (see
    BENCHNOTES) — both are kept because they are different points on
    the same exactness/shape trade.
    """
    spread = docs.select(id_col, text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    # hash-first shingle keys (see ngram_jaccard_pairs note). The
    # canonical (df, sh) order below changes with the key values, but
    # the prefix lemma holds for ANY fixed total order and candidates
    # are verified exactly — the OUTPUT is order-independent.
    postings = with_hashed_shingles(spread, text_col, n).select(
        F.col(id_col).alias("doc"), F.explode("shingles").alias("sh")
    )
    dfreq = postings.groupBy("sh").agg(F.count("*").alias("df"))
    if max_doc_freq is not None:
        dfreq = dfreq.filter(F.col("df") <= max_doc_freq)
    kept = postings.join(dfreq, "sh")
    # canonical rarest-first order rides a per-doc sorted struct array;
    # array_intersect below is order-insensitive, so one array serves
    # both the prefix slice and the verification
    sets = (
        kept.groupBy("doc")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(df, sh))),"
                " p -> p.sh)"
            ).alias("set")
        )
        .withColumn("sz", F.size("set"))
    )
    prefix = sets.select(
        "doc",
        F.explode(
            F.expr(
                f"slice(set, 1, sz - CAST(ceil({threshold} * sz) AS INT)"
                " + 1)"
            )
        ).alias("sh"),
    )
    cands = (
        prefix.select(F.col("doc").alias("a"), "sh")
        .join(prefix.select(F.col("doc").alias("b"), "sh"), "sh")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = sets.select(
        F.col("doc").alias("a"), F.col("set").alias("set_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets.select(
        F.col("doc").alias("b"), F.col("set").alias("set_b"),
        F.col("sz").alias("sz_b"),
    )
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "common", F.size(F.array_intersect("set_a", "set_b"))
        )
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
