"""IVF (inverted-file) approximate nearest neighbors.

The FAISS-style scale path: k-means coarse quantizer partitions the corpus
into cells; a query scores only the ``nprobe`` nearest cells — a
``cells/nprobe``× reduction in scored pairs vs brute force. On a cluster
the corpus is repartitioned by cell id, so each probe is a partition-local
scan.

Training is driver-side Lloyd k-means over a SEEDED DISTRIBUTED sample
(the quantizer needs O(√N) quality, not exactness): rows are ranked by
``xxhash64(seed, vec)`` and the lowest ``sample_rows`` taken, which Spark
executes as a per-partition top-n merge (TakeOrderedAndProject — one
column-pruned scan, no full sort shuffle) and which is invariant to file
layout and partition order — a ``.limit()`` sample would train on
whatever partition answered first, i.e. one file of one ingest batch, and
skew the cells at scale. Assignment uses a broadcast-centroid JVM
expression (unrolled literals, whole-stage codegen), not model.transform,
to keep the hot path free of VectorUDT conversions.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, with_norm
from ..sources.local import local_relation


def _centroid_dists_sql(vec_col: str, centroids: np.ndarray) -> str:
    """SQL array of squared L2 distances to every centroid — the single
    source of the metric for BOTH corpus cell assignment and query cell
    probing (two sites using divergent expressions would silently break
    recall)."""
    dists = []
    for c in centroids:
        arr = "array(" + ", ".join(f"{x}D" for x in c) + ")"
        dists.append(
            f"aggregate(zip_with({vec_col}, {arr},"
            f" (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
            f" 0D, (a, v) -> a + v)"
        )
    return "array(" + ", ".join(dists) + ")"


def py_probe_cells(vec, centroids: np.ndarray, nprobe: int) -> list[int]:
    """Driver-side twin of ``_probe_cells_expr``: squared-L2 to every
    centroid via the same left fold (IEEE doubles — Python float == JVM
    double), then the same (dist, idx) struct order ``array_sort``
    applies (ascending, NaN greater than any non-NaN, idx tie-break),
    sliced to ``nprobe``. Bit-exact with the expression on the same row
    (tests/test_vector_index.py::test_driver_probe_twins_bit_exact)."""
    import math

    dists = []
    for c in centroids:
        acc = 0.0
        for i in range(len(c)):
            d = float(vec[i]) - float(c[i])
            acc = acc + d * d
        dists.append(acc)
    # NaN key: Spark's struct compare treats NaN as greater than any
    # non-NaN and NaN == NaN (ties fall to idx); a raw float NaN in a
    # Python sort key would compare inconsistently, so normalize it out
    order = sorted(
        range(len(dists)),
        key=lambda i: (
            (1, 0.0, i) if math.isnan(dists[i]) else (0, dists[i], i)
        ),
    )
    return order[:nprobe]


def _centroid_assign_expr(vec_col: str, centroids: np.ndarray) -> F.Column:
    """argmin cell by squared L2 distance, unrolled over the (small)
    centroid set as a codegen'd expression."""
    d_arr = _centroid_dists_sql(vec_col, centroids)
    return F.expr(f"array_position({d_arr}, array_min({d_arr})) - 1").cast("int")


def _quantizer_sample(
    corpus: DataFrame, vec_col: str, sample_rows: int, seed: int
):
    """Seeded, partition-order-invariant training sample as a pandas
    frame: the ``sample_rows`` lowest rows by ``xxhash64(seed, vec)``.
    Executes as TakeOrderedAndProject (per-partition top-n + driver
    merge over the single projected column) — one scan, no sort
    shuffle, O(sample_rows) driver memory. Ties (duplicate vectors)
    are interchangeable for training; the vec itself tiebreaks so the
    row SET is still deterministic."""
    return (
        corpus.select(vec_col)
        .orderBy(
            F.xxhash64(F.lit(int(seed)), F.col(vec_col)), F.col(vec_col)
        )
        .limit(sample_rows)
        .toPandas()
    )


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    num_cells: int = 16,
    seed: int = 7,
    sample_rows: int = 10_000,
) -> np.ndarray:
    """k-means centroids from a driver-side sample (quantizer training is
    small-data; the corpus itself never leaves executors).

    The sample is deterministic AND distributed: rank by
    ``xxhash64(seed, vec)``, take the lowest ``sample_rows`` — same
    result no matter how the corpus is partitioned or ordered (pinned by
    tests/test_similarity.py), and every file contributes, so centroids
    are never trained on a time- or source-skewed first-N slice."""
    pdf = _quantizer_sample(corpus, vec_col, sample_rows, seed)
    if not len(pdf):
        raise ValueError(
            "cannot train a coarse quantizer on an empty corpus"
        )
    X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    rs = np.random.RandomState(seed)
    centroids = X[rs.choice(len(X), size=min(num_cells, len(X)), replace=False)]
    for _ in range(10):  # Lloyd iterations
        d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(centroids)):
            members = X[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_cells: int = 16,
    nprobe: int = 3,
    seed: int = 7,
    centroids=None,
) -> DataFrame:
    """Approximate top-k: exact cosine over the nprobe nearest cells.

    ``centroids``: pass a pre-trained (num_cells, dim) array to pin the
    quantizer (the persisted-index parity contract,
    similarity/vector_index.py); None trains on a sample here."""
    if centroids is None:
        centroids = train_centroids(corpus, vec_col, num_cells, seed)

    c = with_norm(corpus.select(id_col, vec_col), vec_col).withColumn(
        "cell", _centroid_assign_expr(vec_col, centroids)
    ).select(
        "cell",
        F.col(id_col).alias("neighbor"),
        F.col(vec_col).alias("__cv"),
        F.col("norm").alias("__cn"),
    )

    # query → nprobe nearest cells (shared metric with assignment)
    d_arr = _centroid_dists_sql(vec_col, centroids)
    # nprobe nearest cells: sort (distance, index) structs, keep indexes
    probe_cells = (
        f"transform(slice(array_sort(transform({d_arr},"
        f" (d, i) -> struct(d AS dist, i AS idx))), 1, {nprobe}), s -> s.idx)"
    )
    q = with_norm(queries.select(query_id_col, vec_col), vec_col).withColumn(
        "__probe", F.explode(F.expr(probe_cells))
    ).withColumn("cell", F.col("__probe").cast("int")).select(
        "cell",
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("norm").alias("__qn"),
    )

    scored = c.join(q, "cell").withColumn(
        "cosine", cosine_expr("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor"))
    return (
        scored.select("query_id", "neighbor", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    seed: int = 7,
) -> None:
    """Persist an IVF index: ``path/centroids`` (one row per cell) and
    ``path/cells`` (the corpus with precomputed norms, PARTITIONED BY
    cell id on disk).

    This splits ANN into the two jobs a 100 TB deployment actually runs:
    an expensive one-time build (train quantizer, assign, re-layout) and
    cheap repeated queries that read only the probed cells — the cell
    partitioning turns ``nprobe/num_cells`` into a physical disk-pruning
    ratio, not just a join-size reduction.

    NOTE: this is the minimal build-once demo kept for its tests; the
    full serving lifecycle (append/delete/compact, versioned-CAS
    object-store layout, PQ codes, crash recovery) is
    ``similarity/vector_index.py`` — new code should use
    ``vector_index_build`` / ``vector_index_probe``."""
    centroids = train_centroids(corpus, vec_col, num_cells, seed)
    spark = corpus.sparkSession
    local_relation(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = with_norm(corpus.select(id_col, vec_col), vec_col).withColumn(
        "cell", _centroid_assign_expr(vec_col, centroids)
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/cells"
    )


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nprobe: int = 3,
) -> DataFrame:
    """Top-k over a persisted IVF index. The query batch is small by
    definition, so its probe-cell set collects to the driver and becomes
    a STATIC partition filter — the cells scan reads only
    ``|probed cells| / num_cells`` of the index from disk (visible as
    PartitionFilters in the plan), then one equi-join on cell scores
    exact cosine inside the probed cells."""
    import numpy as np

    cents = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    centroids = np.array([r["centroid"] for r in cents])
    d_arr = _centroid_dists_sql(vec_col, centroids)
    probe_cells = (
        f"transform(slice(array_sort(transform({d_arr},"
        f" (d, i) -> struct(d AS dist, i AS idx))), 1, {nprobe}), s -> s.idx)"
    )
    q = with_norm(queries.select(query_id_col, vec_col), vec_col).withColumn(
        "__probe", F.explode(F.expr(probe_cells))
    ).withColumn("cell", F.col("__probe").cast("int")).select(
        "cell",
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("norm").alias("__qn"),
    )
    needed = sorted(r["cell"] for r in q.select("cell").distinct().collect())
    c = (
        spark.read.parquet(f"{path}/cells")
        .filter(F.col("cell").isin(needed))
        .select(
            "cell",
            F.col(id_col).alias("neighbor"),
            F.col(vec_col).alias("__cv"),
            F.col("norm").alias("__cn"),
        )
    )
    scored = c.join(q, "cell").withColumn(
        "cosine", cosine_expr("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor")
    )
    return (
        scored.select("query_id", "neighbor", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
