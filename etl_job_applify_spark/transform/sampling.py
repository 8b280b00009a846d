"""Sampling operators for training-data pipelines.

Two regimes:

- ``systematic_stratified_sample``: deterministic every-k-th row per
  stratum under a total order — reproducible AND SQL-mirrorable, so it is
  the oracle-checked variant. One shuffle on the stratum keys.
- ``hash_sample``: Bernoulli-style p-sampling by hashing a stable id
  (``xxhash64(id) mod 10_000 < p·10_000``). Reproducible across runs and
  machines (unlike ``df.sample``'s RNG-seeded variant, whose draw depends
  on partitioning), works in a single pass with no shuffle at all — the
  100 TB default. Not oracle-checkable (engine-specific hash).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def systematic_stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    order_by: Sequence[str],
    every_k: int,
) -> DataFrame:
    """Keep rows ranked 1, k+1, 2k+1, … per stratum under ``order_by``."""
    w = Window.partitionBy(*strata).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") - 1) % every_k == 0)
        .drop("__rn")
    )


def hash_sample(df: DataFrame, id_cols: Sequence[str], fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on stable ids; no shuffle,
    no RNG state, stable under repartitioning and reruns."""
    threshold = int(fraction * 10_000)
    return df.filter(
        F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(10_000)) < threshold
    )


def weighted_hash_sample(
    df: DataFrame,
    id_cols: Sequence[str],
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted reservoir (Efraimidis–Spirakis A-Res): each
    row draws u ∈ (0,1) from a hash of its id (reproducible, no RNG
    state) and scores u^(1/w); the global top-k by score is a weighted
    sample without replacement. One TakeOrdered pass — no shuffle of the
    full data, cluster-size independent.

    Rows with non-positive or NULL weight are excluded up front: a
    negative weight would score u^(1/w) > 1 and outrank every valid row.
    """
    df = df.filter(F.col(weight_col) > 0)
    u = (
        (F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(1_000_000_007))
         .cast("double") + F.lit(1.0))
        / F.lit(1_000_000_009.0)
    )
    score = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.withColumn("__score", score)
        .orderBy(F.desc("__score"), *[F.col(c) for c in id_cols])
        .limit(k)
        .drop("__score")
    )


def content_hash_split(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "split",
    val_buckets: int = 2,
    test_buckets: int = 1,
) -> DataFrame:
    """Deterministic content-addressed train/val/test assignment: bucket =
    first hex nibble of md5(text) (16 buckets); the top ``test_buckets``
    are test, the next ``val_buckets`` are val, the rest train.

    Content-addressed (not id-addressed) so byte-identical documents
    always land in the same split — exact-dup leakage across splits is
    structurally impossible. Pure projection: scan-speed at any scale,
    identical on every engine and cluster size (vs rand(), which is
    neither reproducible nor resumable). Used by q119 and the corpus
    pipeline example.
    """
    train_hi = 16 - val_buckets - test_buckets
    bucket = (
        f"instr('0123456789abcdef', substring(md5({text_col}), 1, 1)) - 1"
    )
    return df.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN {bucket} < {train_hi} THEN 'train' "
            f"WHEN {bucket} < {train_hi + val_buckets} THEN 'val' "
            "ELSE 'test' END"
        ),
    )


#: portable sampling modulus (2^31) — shared with the Doulion edge
#: sampler (operators/triangles.py): every term reduces mod 2^31
#: before the next multiply, so no intermediate leaves int64 and ANY
#: SQL engine re-derives the identical sample.
PORTABLE_SAMPLE_MOD = 2_147_483_648


def portable_sample_predicate(key_col: str, p: float) -> F.Column:
    """Deterministic keep-with-probability-``p`` predicate on one
    integer key column, in ENGINE-PORTABLE arithmetic (quadratic-form
    multiply-mod hash — pure BIGINT ops, no xxhash64/md5 dependency),
    so a DuckDB/ANSI oracle replays the exact sample. Use this instead
    of ``hash_sample`` whenever the sample itself must be
    cross-engine-verifiable; ``hash_sample`` (xxhash64) remains the
    Spark-side default for better mixing on arbitrary column sets.

    The key is reduced mod 2^31 BEFORE the quadratic term: k ≡ key
    (mod m) makes every term congruent to the unreduced form, but
    keeps all products under (m-1)·1864987861 < 2^63 — raw keys
    ≥ ~3.04e9 would overflow int64 in ``key * key``, where Spark
    wraps silently and ANSI engines error or diverge, breaking the
    cross-engine replay promise exactly where it matters."""
    m = PORTABLE_SAMPLE_MOD
    k = f"pmod(cast({key_col} AS BIGINT), {m})"
    return F.expr(
        f"pmod(pmod(pmod({k} * {k}, {m})"
        f" * 1220703125, {m})"
        f" + pmod({k} * 987654323, {m}), {m})"
        f" < {int(p * m)}"
    )


def sampled_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    p: float,
    quantiles: Sequence[float],
    round_digits: int = 4,
) -> DataFrame:
    """Approximate grouped quantiles with a DETERMINISTIC, engine-
    portable contract: keep rows by ``portable_sample_predicate`` on
    ``key_col``, then take EXACT interpolated percentiles over the
    sample — so unlike sketch-based approx_percentile (whose error
    and layout are engine-private, rows-only checkable), the estimate
    replays bit-for-bit in any SQL engine and the approximation error
    is the classical sampling bound (±O(1/√(p·n)) quantile rank).

    Mergeable/streamable for free: the hash sample of a union is the
    union of the hash samples, so shards/epochs sample independently
    and the final percentile runs over the concatenated sample. Output
    columns: group cols, n_sampled, q_<quantile> per requested
    quantile (rounded to ``round_digits`` — the q37 cross-engine
    interpolation discipline)."""
    sampled = df.filter(portable_sample_predicate(key_col, p))
    aggs = [F.count("*").cast("bigint").alias("n_sampled")]
    for q in quantiles:
        name = f"q_{str(q).replace('.', '')}"
        aggs.append(
            F.round(
                F.expr(f"percentile({value_col}, {q!r})"), round_digits
            ).alias(name)
        )
    return sampled.groupBy(*group_cols).agg(*aggs)


def sampled_weighted_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    key_col,
    p: float,
    quantiles: Sequence[float],
) -> DataFrame:
    """The SCALE twin of the exact grouped weighted percentile (q270):
    keep rows by ``portable_sample_predicate`` on ``key_col`` (an
    integer key expression — engine-portable, deterministic), then
    compute the EXACT weighted lower-quantiles over the sample with
    the q270 kernel (running weight window + cross-multiplied integer
    thresholds against the SAMPLE's own total weight — that is the
    weight-aware correction: quantiles are weight PROPORTIONS, so the
    sampled estimate needs no 1/p scaling). The whole estimate replays
    bit-for-bit in any SQL engine, and the approximation error is the
    classical weighted-rank sampling bound (O(sqrt(1/(p·n))) quantile
    rank, plus w_max/W when one row dominates the group's weight).

    Scale posture: the per-group sorted window — the reason the exact
    form (q270) is documented as a small-group statistic — here runs
    over the p-sample only, which is what makes the token-weighted
    corpus medians a mixture audit wants affordable at 100 TB (pick p
    so each group's sample fits an executor). Mergeable across
    shards/epochs for free, like ``sampled_quantiles``: the hash
    sample of a union is the union of the hash samples.

    ``quantiles`` are converted to exact fractions (``Fraction(str(q))``)
    so every threshold test stays in integer arithmetic. Output:
    group cols, ``n_sampled``, ``sampled_weight``, and ``wq_<q>`` per
    requested quantile (lower flavor — the first value whose cumulative
    sampled weight reaches q·W_sample)."""
    from fractions import Fraction

    sampled = df.filter(portable_sample_predicate(key_col, p))
    wo = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col, key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wc = Window.partitionBy(*group_cols)
    ranked = sampled.select(
        *group_cols,
        value_col,
        F.sum(F.col(weight_col).cast("bigint")).over(wo).alias("__cum"),
        F.sum(F.col(weight_col).cast("bigint")).over(wc).alias("__tw"),
    )
    aggs = [
        F.count("*").cast("bigint").alias("n_sampled"),
        F.max("__tw").cast("bigint").alias("sampled_weight"),
    ]
    for q in quantiles:
        fr = Fraction(str(q))
        name = f"wq_{str(q).replace('.', '')}"
        aggs.append(
            F.min(
                F.when(
                    fr.denominator * F.col("__cum")
                    >= fr.numerator * F.col("__tw"),
                    F.col(value_col),
                )
            ).alias(name)
        )
    return ranked.groupBy(*group_cols).agg(*aggs)
