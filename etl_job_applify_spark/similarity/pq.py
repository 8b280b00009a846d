"""Product quantization ANN: compressed-domain similarity search.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — the memory-side half of the FAISS recipe (IVF is
the partition-side half, similarity/ivf.py): split each d-dim vector
into ``m`` subvectors, vector-quantize each subspace against its own
``k``-entry codebook, and store only the m code indexes. A 64-dim float
embedding (256 B) becomes m=8 bytes — 32× compression — and distances
are computed in the COMPRESSED domain via asymmetric distance
computation (ADC): per query, precompute an m×k lookup table of
query-subvector→code distances once, then every corpus vector costs m
table adds instead of d multiplies.

Why this matters at 100 TB: the corpus's PQ codes for a billion vectors
fit in executor memory (8 GB vs 256 GB raw), so the scan side of ANN
becomes CPU-trivial and cache-resident. Production composes PQ inside
IVF cells (scan only probed cells, ADC within them) — both halves exist
here independently and compose by construction.

Spark-first shape, mirroring ivf.py's conventions:
- codebook training is driver-side on a bounded sample (quantizer
  training is small-data; the corpus never leaves executors);
- encode and ADC are inlined-literal codegen expressions — the
  codebooks are dimension-sized constants, exactly like the IVF
  centroid arrays, so the hot loop is JVM whole-stage codegen with no
  Python stage and no shuffle beyond the final top-k;
- vectors are L2-normalized inside the expression before quantization,
  making squared-L2 ADC order equivalent to cosine order (the metric
  every other similarity op here uses).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import with_norm


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 7,
    sample_rows: int = 10_000,
) -> np.ndarray:
    """(m, k, d/m) codebooks: per-subspace Lloyd k-means over a
    normalized driver-side sample (same training discipline as
    ivf.train_centroids — a seeded distributed xxhash64 top-n, so
    codebooks are invariant to corpus partitioning and never trained
    on a first-N skewed slice)."""
    from .ivf import _quantizer_sample

    pdf = _quantizer_sample(corpus, vec_col, sample_rows, seed)
    if not len(pdf):
        raise ValueError(
            "cannot train PQ codebooks on an empty corpus"
        )
    X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    return _lloyd_subspaces(X, m, k, seed)


def _lloyd_subspaces(X: np.ndarray, m: int, k: int, seed: int) -> np.ndarray:
    """Per-subspace Lloyd k-means over prepared training rows."""
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    d_sub = d // m
    rs = np.random.RandomState(seed)
    books = np.empty((m, k, d_sub))
    for j in range(m):
        S = X[:, j * d_sub : (j + 1) * d_sub]
        cb = S[rs.choice(len(S), size=min(k, len(S)), replace=False)].copy()
        for _ in range(10):
            dist = ((S[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(len(cb)):
                members = S[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j, : len(cb)] = cb
        if len(cb) < k:  # degenerate tiny sample: pad with copies
            books[j, len(cb):] = cb[-1]
    return books


def train_residual_quantizer(
    corpus: DataFrame,
    centroids,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 7,
    sample_rows: int = 10_000,
) -> tuple[np.ndarray, np.ndarray]:
    """(codebooks (m, k, d/m), offsets (num_cells, d)) for RESIDUAL PQ
    — the IVFADC training recipe (Jégou et al. TPAMI 2011 §IV):
    residuals concentrate near 0 with much smaller variance than the
    vectors themselves, so the same m-byte budget quantizes a smaller
    ball. Assignment in the sample replays the IVF contract exactly
    (raw-space squared-L2 argmin); the offset is the per-cell mean of
    the NORMALIZED members (see ``residual_col`` for why not the unit
    centroid). An empty training cell gets a zero offset (residual
    degrades to plain there — safe, never wrong)."""
    from .ivf import _quantizer_sample

    pdf = _quantizer_sample(corpus, vec_col, sample_rows, seed)
    if not len(pdf):
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cents = np.asarray(centroids, dtype=np.float64)
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    offsets = np.zeros_like(cents)
    for j in range(len(cents)):
        members = Xn[assign == j]
        if len(members):
            offsets[j] = members.mean(axis=0)
    R = Xn - offsets[assign]
    return _lloyd_subspaces(R, m, k, seed), offsets


def _normed(vec_col: str) -> str:
    """L2-normalize inline (norm column must exist via with_norm)."""
    return f"transform({vec_col}, x -> CAST(x AS DOUBLE) / norm)"


def residual_col(
    vec_col: str, cell_col: str, offsets: np.ndarray
) -> F.Column:
    """Column: normalized vector minus its assigned cell's OFFSET — the
    residual that IVF-composed PQ quantizes (Jégou et al. §IV:
    residuals concentrate around 0 with far less variance than the
    vectors themselves, so the same m bytes spend their precision on a
    smaller ball → lower quantization error → better ADC ordering at
    equal code budget).

    The offset is the per-cell MEAN of the normalized training members
    (``train_residual_quantizer``), i.e. the variance-minimizing center
    in the space PQ actually quantizes — NOT the unit-normalized raw
    centroid, whose norm-1 overshoot (normalized cluster means have
    resultant length « 1 in high dimension) would INFLATE residual
    variance on weakly clustered data. Measured on the embeddings
    fixture: mean-offset residuals cut quantization error ~12% at
    m=8,k=16 where unit-centroid residuals inflate it ~25%.

    Computed ONCE as a real column (not re-inlined per codebook entry):
    the per-cell offset table is a single array literal indexed by the
    cell id, so expression size stays O(num_cells × dim) regardless of
    m × k."""
    o = np.asarray(offsets, dtype=np.float64)
    offs = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{x}D" for x in row) + ")" for row in o
        )
        + ")"
    )
    return F.expr(
        f"zip_with({_normed(vec_col)},"
        f" element_at({offs}, CAST({cell_col} AS INT) + 1),"
        f" (x, o) -> x - o)"
    )


def _sub_dist_sql(sub_expr: str, code: np.ndarray) -> str:
    arr = "array(" + ", ".join(f"{x}D" for x in code) + ")"
    return (
        f"aggregate(zip_with({sub_expr}, {arr},"
        f" (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v)"
    )


def _encode_from(source: str, codebooks: np.ndarray) -> F.Column:
    """array<int> of m code indexes from an already-prepared vector
    expression: per subspace, argmin squared-L2 over its codebook —
    unrolled literals, codegen end to end."""
    m, _, d_sub = codebooks.shape
    per_sub = []
    for j in range(m):
        sub = f"slice({source}, {j * d_sub + 1}, {d_sub})"
        d_arr = (
            "array("
            + ", ".join(_sub_dist_sql(sub, c) for c in codebooks[j])
            + ")"
        )
        per_sub.append(
            f"CAST(array_position({d_arr}, array_min({d_arr})) - 1 AS INT)"
        )
    return F.expr("array(" + ", ".join(per_sub) + ")")


def pq_encode_expr(vec_col: str, codebooks: np.ndarray) -> F.Column:
    """Plain encoding: quantize the NORMALIZED vector itself."""
    return _encode_from(_normed(vec_col), codebooks)


def pq_encode_raw_expr(col: str, codebooks: np.ndarray) -> F.Column:
    """Encode an already-prepared vector column verbatim (no
    re-normalization) — the residual path feeds ``residual_col``
    through this."""
    return _encode_from(col, codebooks)


def _lut_from(source: str, codebooks: np.ndarray) -> F.Column:
    m, _, d_sub = codebooks.shape
    rows = []
    for j in range(m):
        sub = f"slice({source}, {j * d_sub + 1}, {d_sub})"
        rows.append(
            "array("
            + ", ".join(_sub_dist_sql(sub, c) for c in codebooks[j])
            + ")"
        )
    return F.expr("array(" + ", ".join(rows) + ")")


def _adc_lut_expr(vec_col: str, codebooks: np.ndarray) -> F.Column:
    """array<array<double>>: the per-query ADC lookup table — entry
    [j][c] is the squared-L2 between the query's j-th subvector and
    code c. Computed ONCE per query row; every corpus vector then costs
    m array indexings."""
    return _lut_from(_normed(vec_col), codebooks)


def py_lut(source, codebooks: np.ndarray) -> list[list[float]]:
    """Driver-side twin of ``_lut_from``: the SAME left-fold
    ``((0+d₁²)+d₂²)+…`` per (subspace, code), in IEEE doubles (a Python
    float IS a JVM double, and +,-,* are single correctly-rounded ops),
    so the returned values are bit-identical to evaluating the
    ``_adc_lut_expr``/``adc_lut_raw_expr`` column on the same row.
    Used by the probe path to compute control-plane-sized LUTs on the
    driver instead of carrying an m×k×d_sub literal expression through
    every plan analysis (pinned by
    tests/test_vector_index.py::test_driver_probe_twins_bit_exact)."""
    m, _, d_sub = codebooks.shape
    out = []
    for j in range(m):
        base = j * d_sub
        row = []
        for code in codebooks[j]:
            acc = 0.0
            for i in range(d_sub):
                d = source[base + i] - float(code[i])
                acc = acc + d * d
            row.append(acc)
        out.append(row)
    return out


def py_normed(vec, norm: float) -> list[float]:
    """Driver-side twin of ``_normed``: elementwise ``x / norm`` in IEEE
    doubles — bit-identical to the expression on the same row."""
    return [float(x) / norm for x in vec]


def py_residual(normed, cell: int, offsets: np.ndarray) -> list[float]:
    """Driver-side twin of ``residual_col`` (given the already-normalized
    vector): elementwise ``x - offsets[cell]`` in IEEE doubles."""
    off = offsets[cell]
    return [normed[i] - float(off[i]) for i in range(len(normed))]


def adc_lut_raw_expr(col: str, codebooks: np.ndarray) -> F.Column:
    """ADC LUT over an already-prepared vector column (the residual
    path: one LUT per (query, probed cell) row, since the query's
    residual differs per cell — exactly FAISS's IVFADC)."""
    return _lut_from(col, codebooks)


def ann_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    shortlist: int = 64,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k neighbors: ADC shortlist, exact refine.

    The FAISS two-stage recipe: the full corpus is scanned ONLY in the
    compressed domain (every query × m-byte codes, m adds per pair) to
    produce a ``shortlist`` of candidates per query; raw vectors are
    then fetched for just the shortlist (a semi-join — the only place
    full vectors are read) and re-ranked by exact cosine. Recall is
    governed by shortlist/|corpus|, memory by m — independently tunable,
    which is the entire point of refine-after-ADC. Production bounds the
    compressed scan further with IVF cells (ann_topk_ivf composes).

    ``shortlist=0`` disables refinement: pure ADC ranking, distances in
    ``adc_dist`` — the memory-bound regime where raw vectors are too big
    to fetch at all.
    """
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, vec_col, m, k_codes)
    enc = (
        with_norm(corpus.select(id_col, vec_col), vec_col)
        .select(
            F.col(id_col).alias("neighbor"),
            pq_encode_expr(vec_col, codebooks).alias("__codes"),
        )
    )
    q = (
        with_norm(queries.select(query_id_col, vec_col), vec_col)
        .select(
            F.col(query_id_col).alias("query_id"),
            _adc_lut_expr(vec_col, codebooks).alias("__lut"),
        )
    )
    scored = enc.crossJoin(F.broadcast(q)).withColumn(
        "adc_dist",
        F.expr(
            # [] on arrays is 0-BASED in Spark SQL (element_at is the
            # 1-based accessor) and the codes are already 0-based
            "aggregate(zip_with(__lut, __codes, (l, c) -> l[c]),"
            " 0D, (a, v) -> a + v)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor")
    if not shortlist:
        return (
            scored.select("query_id", "neighbor", "adc_dist")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    cand = (
        scored.select("query_id", "neighbor", "adc_dist")
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shortlist)
        .select("query_id", "neighbor")
    )
    from ..functions.vectors import cosine_expr

    cv = with_norm(corpus.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("neighbor"),
        F.col(vec_col).alias("__cv"),
        F.col("norm").alias("__cn"),
    )
    qv = with_norm(queries.select(query_id_col, vec_col), vec_col).select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("norm").alias("__qn"),
    )
    refined = (
        cand.join(cv, "neighbor")  # shortlist-sized: the only raw fetch
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", cosine_expr("__qv", "__cv", "__qn", "__cn"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor")
    )
    return (
        refined.select("query_id", "neighbor", "cosine")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def ann_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    shortlist: int = 64,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 7,
    centroids=None,
    codebooks=None,
    encoding: str = "plain",
    offsets=None,
) -> DataFrame:
    """IVF×PQ: the composed FAISS index, both halves of the recipe at
    once — coarse cells bound WHICH vectors are scanned (nprobe/num_cells
    of the corpus), PQ codes bound WHAT the scan costs per vector (m
    adds on 8-byte codes), and the exact-refine stage re-ranks the
    shortlist so recall stays a tunable, not a casualty. At 100 TB this
    is the layout that makes billion-vector ANN an interactive query:
    cells are disk partitions (see build_ivf_index), codes are the only
    thing resident, raw vectors are fetched for ``shortlist`` rows per
    query.

    ``encoding="residual"``: quantize each vector's RESIDUAL from its
    cell's offset (mean of normalized members — FAISS's IVFADC recipe
    adapted to the cosine/normalized space) instead of the vector
    itself: residuals have far smaller variance, so the same m bytes
    yield lower quantization error and a better ADC ordering —
    gate-verified by the q239 recall/error properties. The query side
    then computes one ADC LUT per (query, probed cell), since the
    query's residual differs per cell. ``codebooks``/``offsets`` passed
    explicitly must come from ``train_residual_quantizer`` (pass both
    or neither).

    The equi-join on the probed cell REPLACES the pure-PQ path's gated
    cross join — composition upgrades the plan shape, which is the
    point of proving it with a test rather than asserting it in prose.
    """
    from .ivf import _centroid_assign_expr, _centroid_dists_sql, train_centroids

    if encoding not in ("plain", "residual"):
        raise ValueError(f"unknown PQ encoding {encoding!r}")
    if centroids is None:
        centroids = train_centroids(corpus, vec_col, num_cells, seed)
    if codebooks is None:
        if offsets is not None:
            # pass-both-or-neither: silently retraining would overwrite
            # the caller's pinned offsets with fresh ones
            raise ValueError(
                "offsets passed without codebooks; pass both (from "
                "train_residual_quantizer) or neither"
            )
        if encoding == "residual":
            codebooks, offsets = train_residual_quantizer(
                corpus, centroids, vec_col, m, k_codes, seed
            )
        else:
            codebooks = train_pq_codebooks(corpus, vec_col, m, k_codes, seed)
    if encoding == "residual" and offsets is None:
        raise ValueError(
            "encoding='residual' with pinned codebooks needs the "
            "matching offsets (train_residual_quantizer returns both)"
        )

    enc_base = with_norm(corpus.select(id_col, vec_col), vec_col).withColumn(
        "cell", _centroid_assign_expr(vec_col, centroids)
    )
    if encoding == "residual":
        enc = enc_base.withColumn(
            "__resid", residual_col(vec_col, "cell", offsets)
        ).select(
            "cell",
            F.col(id_col).alias("neighbor"),
            pq_encode_raw_expr("__resid", codebooks).alias("__codes"),
        )
    else:
        enc = enc_base.select(
            "cell",
            F.col(id_col).alias("neighbor"),
            pq_encode_expr(vec_col, codebooks).alias("__codes"),
        )
    d_arr = _centroid_dists_sql(vec_col, centroids)
    probe_cells = (
        f"transform(slice(array_sort(transform({d_arr},"
        f" (d, i) -> struct(d AS dist, i AS idx))), 1, {nprobe}), s -> s.idx)"
    )
    q_base = (
        with_norm(queries.select(query_id_col, vec_col), vec_col)
        .withColumn("__probe", F.explode(F.expr(probe_cells)))
        .withColumn("cell", F.col("__probe").cast("int"))
    )
    if encoding == "residual":
        q = q_base.withColumn(
            "__qresid", residual_col(vec_col, "cell", offsets)
        ).select(
            "cell",
            F.col(query_id_col).alias("query_id"),
            adc_lut_raw_expr("__qresid", codebooks).alias("__lut"),
        )
    else:
        q = q_base.select(
            "cell",
            F.col(query_id_col).alias("query_id"),
            _adc_lut_expr(vec_col, codebooks).alias("__lut"),
        )
    scored = enc.join(F.broadcast(q), "cell").withColumn(
        "adc_dist",
        F.expr(
            "aggregate(zip_with(__lut, __codes, (l, c) -> l[c]),"
            " 0D, (a, v) -> a + v)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor")
    cand = (
        scored.select("query_id", "neighbor", "adc_dist")
        .distinct()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shortlist)
        .select("query_id", "neighbor")
    )
    from ..functions.vectors import cosine_expr

    cv = with_norm(corpus.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("neighbor"),
        F.col(vec_col).alias("__cv"),
        F.col("norm").alias("__cn"),
    )
    qv = with_norm(queries.select(query_id_col, vec_col), vec_col).select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("norm").alias("__qn"),
    )
    refined = (
        cand.join(cv, "neighbor")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", cosine_expr("__qv", "__cv", "__qn", "__cn"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor")
    )
    return (
        refined.select("query_id", "neighbor", "cosine")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
