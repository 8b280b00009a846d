"""Skew mitigation by key salting (SURVEY §4 / 100 TB discipline).

When one join/group key carries a disproportionate share of rows (the
celebrity user, the null-ish default key), a hash shuffle sends all of it
to one task. AQE's skew-join splitting handles the join case at runtime;
these operators are the explicit, planner-independent form — useful when
AQE can't help (aggregations, or deliberately partitioned pipelines).

- salted aggregation: two-phase — aggregate on (key, salt), then merge
  partials per key. Works for any algebraic aggregate.
- salted join: replicate the small side's rows k times (one per salt);
  spread the big side across salts deterministically. The big side's hot
  key now lands on k tasks instead of one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.local import local_relation


def _salt_col(cols: Sequence[str], k: int) -> Column:
    """Deterministic pseudo-random salt in [0, k) from non-key columns —
    deterministic so reruns produce identical partitioning (xxhash64 of
    the row's distinguishing columns, not rand())."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(k)).cast("int")


def salted_agg_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_from: Sequence[str],
    num_salts: int = 16,
) -> DataFrame:
    """SUM aggregation over skewed keys in two phases: partial sums on
    (keys, salt) — k-way fan-out of the hot key — then final sums on keys.
    Output schema: keys + ``sum_<col>``."""
    salted = df.withColumn("__salt", _salt_col(salt_from, num_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_from: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: big rows get a
    deterministic salt, small rows are replicated once per salt value, and
    the join runs on (keys, salt). Replication cost = |small| × k — keep
    the replicated side genuinely small.

    ``how``: inner or left (big side preserved). Right/full-outer are
    rejected — an unmatched small-side row would surface once per salt
    replica (num_salts duplicates)."""
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how='inner'|'left' only; outer-preserving "
            "the replicated small side would duplicate unmatched rows"
        )
    keys = list(keys)
    big_s = big.withColumn("__salt", _salt_col(salt_from, num_salts))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_s.join(small_s, [*keys, "__salt"], how).drop("__salt")


def hot_keys(
    df: DataFrame,
    keys: Sequence[str],
    threshold_share: float = 0.01,
    sample_fraction: float | None = 0.05,
    seed: int = 7,
) -> DataFrame:
    """Keys carrying more than ``threshold_share`` of rows, estimated
    from a Bernoulli sample (one cheap pass; a hot key by definition
    dominates the sample too, so sampling cannot miss it — it can only
    misjudge keys NEAR the threshold, where salting is harmless either
    way). ``sample_fraction=None`` counts exactly. Returns a
    (keys..., share) relation — hot-key sets are tiny by definition."""
    base = df.sample(fraction=sample_fraction, seed=seed) if sample_fraction else df
    counts = base.groupBy(*keys).agg(F.count("*").alias("__n"))
    # total via a one-row broadcast cross join, NOT an unpartitioned
    # window — Window.partitionBy() would funnel the ENTIRE per-key
    # count relation through one task, a scale cliff on high-cardinality
    # keys in the very operator meant to mitigate skew
    total = counts.agg(F.sum("__n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("__n") / F.col("__total"))
        .filter(F.col("share") > threshold_share)
        .select(*keys, "share")
    )


def differential_salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_from: Sequence[str],
    num_salts: int = 16,
    threshold_share: float = 0.01,
    sample_fraction: float | None = 0.05,
) -> DataFrame:
    """The production skew join: salt ONLY the hot keys.

    ``salted_join`` replicates the whole small side k times — measured
    NEGATIVE for q146 once parallelism saturated (BENCHNOTES round 5:
    replicated shuffle volume beats the win). Differential salting pays
    replication only where it buys parallelism: detect hot keys from a
    sample (control-plane-sized set, broadcast), salt-join the hot slice,
    plain-join the cold slice, union. Cold keys keep their single-copy
    shuffle; the hot key's rows land on k tasks.

    Inner join only (the union of two outer slices would need unmatched
    bookkeeping; extend per use)."""
    keys = list(keys)
    hk = hot_keys(
        big, keys, threshold_share=threshold_share,
        sample_fraction=sample_fraction,
    ).select(*keys)
    big_hot = big.join(F.broadcast(hk), keys, "left_semi")
    big_cold = big.join(F.broadcast(hk), keys, "left_anti")
    small_hot = small.join(F.broadcast(hk), keys, "left_semi")
    small_cold = small.join(F.broadcast(hk), keys, "left_anti")
    hot_joined = salted_join(
        big_hot, small_hot, keys, salt_from, num_salts=num_salts
    )
    cold_joined = big_cold.join(small_cold, keys, "inner")
    return hot_joined.unionByName(cold_joined)


def profile_join_keys(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Skew diagnostic for prospective join/groupBy keys: per column,
    exact row count, distinct-key count, and the row share of the
    heaviest key and the heaviest 10 — the numbers that decide between
    a plain shuffle join, AQE skew splitting, and differential salting
    (``hot_keys`` / ``differential_salted_join``). One aggregation per
    column; the readouts are O(1) driver scalars (control plane — the
    q126 precedent), so nothing key-cardinality-sized leaves the
    executors. Boundary ties in the top-10 are share-invariant (equal
    counts sum identically whichever side of the LIMIT they land on),
    so the output is deterministic without a tie-break.
    """
    spark = df.sparkSession
    rows = []
    for c in cols:
        counts = df.groupBy(c).agg(F.count("*").alias("n"))
        head = counts.agg(
            F.sum("n").alias("n_rows"),
            F.count("*").alias("n_distinct"),
            F.max("n").alias("top1"),
        ).collect()[0]
        top10 = (
            counts.orderBy(F.desc("n"))
            .limit(10)
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        rows.append(
            (
                c,
                int(head["n_rows"]),
                int(head["n_distinct"]),
                float(head["top1"]) / float(head["n_rows"]),
                float(top10) / float(head["n_rows"]),
            )
        )
    return local_relation(spark, 
        rows,
        "key_col string, n_rows bigint, n_distinct bigint,"
        " top1_share double, top10_share double",
    )
