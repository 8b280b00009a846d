"""Property-based operator tests (hypothesis): the custom assemblies must
agree with an independent reference implementation on arbitrary inputs,
not just the fixtures."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etl_job_applify_spark.operators import asof_join
from etl_job_applify_spark.sinks.upsert import upsert

_ts = st.integers(min_value=0, max_value=10_000)
_key = st.sampled_from(["a", "b", "c"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=8),
    right=st.lists(st.tuples(_key, _ts, st.integers(0, 100)),
                   min_size=1, max_size=8, unique_by=lambda r: (r[0], r[1])),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, t int, lid int"
    ).withColumn("t", F.timestamp_seconds("t"))
    rdf = spark.createDataFrame(right, "k string, rt int, payload int") \
        .withColumn("rt", F.timestamp_seconds("rt"))
    got = {
        r["lid"]: r["payload"]
        for r in asof_join(ldf, rdf, on=["k"], left_ts="t", right_ts="rt",
                           payload=["payload"]).collect()
    }
    lp = pd.DataFrame(
        [(k, dt.datetime.utcfromtimestamp(t), i) for i, (k, t) in enumerate(left)],
        columns=["k", "t", "lid"],
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(
        [(k, dt.datetime.utcfromtimestamp(t), p) for k, t, p in right],
        columns=["k", "rt", "payload"],
    ).sort_values("rt", kind="stable")
    want_df = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k")
    want = {
        int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
        for r in want_df.itertuples()
    }
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=8),
    right=st.lists(st.tuples(_key, _ts, st.integers(0, 100)),
                   min_size=1, max_size=8, unique_by=lambda r: (r[0], r[1])),
    how=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.one_of(st.none(), st.integers(0, 2000)),
)
def test_asof_nearest_tolerance_matches_pandas(spark, left, right, how,
                                               tolerance):
    """The full merge_asof surface (direction x tolerance) against
    pandas on arbitrary NUMERIC keys — including the tie-prefers-
    backward nearest contract and tolerance edge equality."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k string, t long, lid int",
    )
    rdf = spark.createDataFrame(right, "k string, rt long, payload int")
    got = {
        r["lid"]: r["payload"]
        for r in asof_join(ldf, rdf, on=["k"], left_ts="t",
                           right_ts="rt", payload=["payload"],
                           how=how, tolerance=tolerance).collect()
    }
    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        columns=["k", "t", "lid"],
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "rt", "payload"]).sort_values(
        "rt", kind="stable"
    )
    want_df = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k",
                            direction=how, tolerance=tolerance)
    want = {
        int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
        for r in want_df.itertuples()
    }
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    target=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 9)),
                    min_size=0, max_size=10, unique_by=lambda r: r[0]),
    updates=st.lists(st.tuples(st.integers(0, 20), st.integers(10, 19),
                               st.integers(0, 5)),
                     min_size=0, max_size=10),
)
def test_upsert_matches_dict_semantics(spark, target, updates):
    tdf = spark.createDataFrame(target, "id int, v int") if target else \
        spark.createDataFrame([], "id int, v int")
    udf_ = spark.createDataFrame(updates, "id int, v int, ver int") if updates else \
        spark.createDataFrame([], "id int, v int, ver int")
    out = {
        r["id"]: r["v"]
        for r in upsert(tdf, udf_.select("id", "v", "ver"),
                        keys=["id"], version_col="ver").collect()
    }
    want = {k: v for k, v in target}
    best: dict[int, tuple[int, int]] = {}
    for (k, v, ver) in updates:
        # dedup_keep_first orders by version DESC with row_number → the
        # max version wins; ties broken arbitrarily, so make value depend
        # only on (k, ver) to keep the property deterministic
        if k not in best or ver > best[k][0]:
            best[k] = (ver, v)
    for k, (ver, v) in best.items():
        want[k] = v
    # tie versions: any of the tied values is acceptable
    for k in want:
        if k in best:
            tied = {v for (kk, v, ver) in updates if kk == k and ver == best[k][0]}
            assert out[k] in tied
        else:
            assert out[k] == want[k]
    assert out.keys() == want.keys()


_val = st.integers(min_value=-50, max_value=50)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    points=st.lists(_val, min_size=1, max_size=10),
    intervals=st.lists(st.tuples(_val, st.integers(0, 20)),
                       min_size=1, max_size=6),
)
def test_bucketed_range_join_matches_naive(spark, points, intervals):
    """range_join_bucketed ≡ the naive cross-filter on arbitrary points
    and [lo, hi) intervals, including empty/degenerate ones."""
    from etl_job_applify_spark.operators.range_join import range_join_bucketed

    ldf = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], "pid int, p double"
    )
    rdf = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(intervals)],
        "rid int, lo double, hi double",
    )
    got = {
        (r["pid"], r["rid"])
        for r in range_join_bucketed(ldf, rdf, "p", "lo", "hi",
                                     bucket_width=7.0).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, w) in enumerate(intervals)
        if lo <= p < lo + w
    }
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(st.tuples(_key, st.integers(0, 300)),
                    min_size=1, max_size=12),
)
def test_sessionize_matches_naive(spark, events):
    """sessionize ≡ a serial gap scan per key (gap > 60s starts a new
    session), on arbitrary event sets including duplicate timestamps."""
    from etl_job_applify_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(events)],
        "k string, ti int, eid int",
    ).withColumn("ts", F.timestamp_seconds("ti"))
    got = {
        r["eid"]: r["session_id"]
        for r in sessionize(df, keys=["k"], ts_col="ts", gap_seconds=60,
                            order_tiebreak=["eid"]).collect()
    }
    want = {}
    by_key: dict[str, list] = {}
    for i, (k, t) in enumerate(events):
        by_key.setdefault(k, []).append((t, i))
    for k, evs in by_key.items():
        sess, prev = 0, None
        for t, i in sorted(evs):
            if prev is None or t - prev > 60:
                sess += 1
            want[i] = sess
            prev = t
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                   min_size=1, max_size=15),
)
def test_connected_components_match_union_find(spark, edges):
    from etl_job_applify_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(st.tuples(st.integers(0, 63), st.integers(0, 63)),
                 min_size=1, max_size=20, unique=True),
)
def test_zorder_code_is_injective_and_bounded(spark, pts):
    """Distinct grid points get distinct Morton codes within range."""
    from etl_job_applify_spark.sinks.writers import zorder_expr

    df = spark.createDataFrame(pts, "x int, y int").withColumn(
        "z", zorder_expr([("x", 0, 63), ("y", 0, 63)], bits=6)
    )
    rows = df.collect()
    zs = [r["z"] for r in rows]
    assert len(set(zs)) == len(pts)          # injective on the grid
    assert all(0 <= z < 4096 for z in zs)    # 2*6 bits

    # locality anchor: interleaving means the code of (x, y) is bounded
    # by interleave(max) — spot-check the known corner
    corner = [r["z"] for r in rows if r["x"] == 63 and r["y"] == 63]
    assert corner == [4095] if corner else True


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=30),
        min_size=1, max_size=12, unique=True,
    ),
)
def test_hash_split_is_total_and_content_stable(spark, texts):
    """Every doc lands in exactly one split; identical text → same split
    regardless of doc_id (the dup-safety property)."""
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(1000 + i, t) for i, t in enumerate(texts)]  # dup ids differ
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    bucket = "instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1"
    out = df.select(
        "doc_id", "text",
        F.expr(
            f"CASE WHEN {bucket} < 13 THEN 'train' "
            f"WHEN {bucket} < 15 THEN 'val' ELSE 'test' END"
        ).alias("split"),
    ).collect()
    by_text = {}
    for r in out:
        assert r["split"] in {"train", "val", "test"}
        by_text.setdefault(r["text"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_text.values())


# --- PPM codec properties (pure Python — no Spark session needed) --------


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_ppm_encode_decode_roundtrip(w, h, seed):
    import numpy as np

    from etl_job_applify_spark.multimodal import ppm

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
    got_w, got_h, got_c, raster = ppm.decode_ppm(ppm.encode_ppm(w, h, px))
    assert (got_w, got_h, got_c) == (w, h, 3)
    assert np.array_equal(np.frombuffer(raster, dtype=np.uint8), px)


@given(
    w=st.integers(min_value=1, max_value=10),
    h=st.integers(min_value=1, max_value=10),
    tw=st.integers(min_value=1, max_value=10),
    th=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_ppm_resize_matches_floor_mapping(w, h, tw, th, seed):
    """resize_nearest must equal the per-pixel floor mapping the SQL
    oracle replays (q138): dst(y,x) = src((y*h)//th, (x*w)//tw)."""
    import numpy as np

    from etl_job_applify_spark.multimodal import ppm

    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
    out = np.frombuffer(
        ppm.resize_nearest(src.tobytes(), w, h, tw, th), dtype=np.uint8
    ).reshape(th, tw, 3)
    img = src.reshape(h, w, 3)
    for y in range(th):
        for x in range(tw):
            assert np.array_equal(out[y, x], img[(y * h) // th, (x * w) // tw])


# --- transactional merge: a commit chain equals serial dict replay -------


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),
                st.integers(min_value=0, max_value=99),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    ),
    deletes=st.sets(st.integers(min_value=0, max_value=6), max_size=4),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_chain_matches_dict_replay(spark, tmp_path_factory, batches, deletes):
    """N upsert commits + one delete commit == replaying the same batches
    into a dict (last write per key wins within and across batches)."""
    from etl_job_applify_spark.sinks import merge_into
    from etl_job_applify_spark.sinks import read_table as read_versioned

    path = str(tmp_path_factory.mktemp("merge_prop") / "t")
    state: dict[int, int] = {}
    for batch in batches:
        # version_col resolves multi-row-per-key batches: max v wins;
        # mirror that in the dict replay
        best: dict[int, tuple[int, int]] = {}
        for i, (k, v) in enumerate(batch):
            if k not in best or v > best[k][0]:
                best[k] = (v, i)
        merge_into(
            spark,
            path,
            spark.createDataFrame(batch, "k int, v int"),
            keys=["k"],
            version_col="v",
        )
        for k, (v, _) in best.items():
            state[k] = v
    if deletes:
        merge_into(
            spark,
            path,
            spark.createDataFrame([(k, 0) for k in deletes], "k int, v int"),
            keys=["k"],
            when_matched="delete",
        )
        for k in deletes:
            if k in state:
                del state[k]
            else:
                state[k] = 0  # unmatched delete-batch rows are inserts
    got = {r.k: r.v for r in read_versioned(spark, path).collect()}
    assert got == state


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(_word, min_size=0, max_size=10).map(" ".join),
        min_size=1, max_size=6,
    ),
    n=st.integers(2, 4),
)
def test_shared_span_pairs_match_python_window_sets(spark, texts, n):
    """Uncapped span pairs == brute-force distinct-window-set
    intersections computed in plain Python."""
    from etl_job_applify_spark.dedup import shared_span_pairs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): r["shared_spans"]
        for r in shared_span_pairs(
            docs, n=n, max_doc_freq=10**6, min_shared=1
        ).collect()
    }
    windows = []
    for t in texts:
        toks = t.split(" ")
        windows.append(
            {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        )
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            k = len(windows[a] & windows[b])
            if k:
                want[(a, b)] = k
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(st.integers(-3, 3), min_size=3, max_size=3)
        .filter(lambda v: any(v)),
        min_size=1, max_size=8,
    ),
    k=st.integers(1, 3),
    thresh=st.sampled_from([0.5, 0.9]),
)
def test_semantic_dedup_matches_numpy_reference(spark, vecs, k, thresh):
    """Kept set == a numpy replay of assign-to-argmax-anchor then
    drop-if-smaller-id-neighbor-within-threshold."""
    import numpy as np

    from etl_job_applify_spark.dedup import semantic_dedup_kept

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]
        for r in semantic_dedup_kept(
            emb, num_anchors=k, threshold=thresh
        ).collect()
    }
    a = np.array(vecs, dtype=float)
    norms = np.linalg.norm(a, axis=1)
    anchors = a[: min(k, len(vecs))]
    anorms = norms[: min(k, len(vecs))]
    cos_to_anchor = (a @ anchors.T) / np.outer(norms, anorms)
    # argmax with ties broken by lowest anchor id == first occurrence
    clusters = np.argmax(cos_to_anchor, axis=1)
    want = set()
    for i in range(len(vecs)):
        dup = any(
            clusters[j] == clusters[i]
            and (a[j] @ a[i]) / (norms[j] * norms[i]) >= thresh
            for j in range(i)
        )
        if not dup:
            want.add(i)
    assert got == want


@given(
    fps=st.integers(min_value=1, max_value=60),
    dims=st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ),
    n_frames=st.integers(min_value=0, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_pvs_encode_decode_roundtrip(fps, dims, n_frames, seed):
    import numpy as np

    from etl_job_applify_spark.multimodal import ppm, video

    w, h = dims
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
        for _ in range(n_frames)
    ]
    data = video.encode_pvs(fps, [ppm.encode_ppm(w, h, f) for f in frames])
    got_fps, got = video.decode_pvs(data)
    assert got_fps == fps and len(got) == n_frames
    for (gw, gh, raster), f in zip(got, frames):
        assert (gw, gh) == (w, h)
        assert np.array_equal(np.frombuffer(raster, dtype=np.uint8), f)


@given(
    vals=st.lists(
        st.floats(
            min_value=-1000, max_value=1000,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ewma_bounded_by_window_extremes(spark, vals):
    """q164's truncated EWMA is a convex combination of the trailing
    8 values, so it must lie within their [min, max] for every row."""
    from etl_job_applify_spark.queries import timeseries as ts

    rows = [
        (1, i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    df.createOrReplaceTempView("_ewma_prop")

    orig = ts.tbl
    ts.tbl = lambda s, d, n: spark.table("_ewma_prop")
    try:
        out = {r["event_id"]: r["ewma"] for r in ts.q164_ewma(spark, "x").collect()}
    finally:
        ts.tbl = orig
    for i, _ in enumerate(vals):
        window = vals[max(0, i - 7): i + 1]
        lo, hi = min(window), max(window)
        assert lo - 1e-9 <= out[i] <= hi + 1e-9


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interpolation_between_endpoint_values(spark, obs):
    """q162: every interpolated grid point lies within [min, max] of its
    two surrounding observations, observed points echo their value, and
    edge points (no prev/next) stay NULL."""
    from etl_job_applify_spark.queries import timeseries as ts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (7, i, base + dt.timedelta(hours=h), float(v))
        for i, (h, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    df.createOrReplaceTempView("_interp_prop")

    orig = ts.tbl
    ts.tbl = lambda s, d, n: spark.table("_interp_prop")
    try:
        out = ts.q162_resample_interpolate(spark, "x").collect()
    finally:
        ts.tbl = orig
    by_hour = {int((r["hour"] - base).total_seconds() // 3600): r for r in out}
    hours = sorted(h for h, _ in obs)
    vals = dict(obs)
    assert len(by_hour) == hours[-1] - hours[0] + 1  # full spine
    for h, r in by_hour.items():
        # hourly means pass through DECIMAL(28,6) quantization (DAVG), so
        # compare with a half-ulp-of-6dp tolerance
        if h in vals:
            assert r["observed"] and abs(r["interp"] - vals[h]) < 1.1e-6
        else:
            prevs = [x for x in hours if x < h]
            nexts = [x for x in hours if x > h]
            assert not r["observed"]
            lo = min(vals[prevs[-1]], vals[nexts[0]])
            hi = max(vals[prevs[-1]], vals[nexts[0]])
            assert lo - 1.1e-6 <= r["interp"] <= hi + 1.1e-6


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_oriented_triangle_count_matches_brute_force(spark, edges):
    """The degree-ordered-orientation wedge count (q167's kernel) must
    equal brute-force triangle enumeration on arbitrary small graphs."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not es:
        return
    nodes = sorted({v for e in es for v in e})
    adj = {v: set() for v in nodes}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    brute = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:]
        if b in adj[a]
        for c in nodes
        if c > b and c in adj[a] and c in adj[b]
    )

    pairs = spark.createDataFrame(sorted(es), "a long, b long")
    deg = (
        pairs.selectExpr("a AS v")
        .unionAll(pairs.selectExpr("b AS v"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    e = (
        pairs.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
        .selectExpr(
            "CASE WHEN da < db OR (da = db AND a < b)"
            " THEN named_struct('src', a, 'dst', b)"
            " ELSE named_struct('src', b, 'dst', a) END AS e"
        )
        .select("e.src", "e.dst")
    )
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.src") == F.col("e2.src"))
        .filter(F.col("e1.dst") < F.col("e2.dst"))
        .select(
            F.least("e1.dst", "e2.dst").alias("u"),
            F.greatest("e1.dst", "e2.dst").alias("w"),
        )
    )
    closing = e.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("w")
    )
    got = wedges.join(closing, ["u", "w"]).count()
    assert got == brute


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(1, 6), st.integers(0, 3)),
            min_size=0, max_size=5,
        ),
        min_size=1, max_size=4,
    )
)
def test_scd2_apply_chain_matches_dict_replay(spark, batches):
    """A chain of scd2_apply batches == a python SCD2 simulator: per key
    the version history is the deduplicated sequence of distinct values
    in batch order, stamped with its batch's effective year, and only
    the last version is current. (Batches dedup to one row per key —
    max v wins — mirroring the operator's upstream-dedup contract.)"""
    from etl_job_applify_spark.operators import scd2_apply

    dim = None
    sim: dict[int, list[tuple[int, int]]] = {}  # k -> [(v, year), ...]
    for i, batch in enumerate(batches):
        year = 2000 + i
        best: dict[int, int] = {}
        for k, v in batch:
            if k not in best or v > best[k]:
                best[k] = v
        if not best:
            continue
        updates = spark.createDataFrame(
            [(k, v) for k, v in best.items()], "k long, v long"
        )
        dim = scd2_apply(dim, updates, ["k"], ["v"], f"{year}-01-01")
        for k, v in best.items():
            hist = sim.setdefault(k, [])
            if not hist or hist[-1][0] != v:
                hist.append((v, year))
    if dim is None:
        return
    got_cur = {}
    got_hist: dict[int, list] = {}
    for r in dim.collect():
        if r["is_current"]:
            got_cur[r["k"]] = (r["v"], r["valid_from"].year)
        else:
            got_hist.setdefault(r["k"], []).append(
                (r["v"], r["valid_from"].year, r["valid_to"].year)
            )
    exp_cur = {k: h[-1] for k, h in sim.items()}
    assert got_cur == exp_cur
    for k, h in sim.items():
        exp = [
            (v, y, h[i + 1][1]) for i, (v, y) in enumerate(h[:-1])
        ]
        assert sorted(got_hist.get(k, [])) == sorted(exp)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(50, 300),
    probes=st.lists(st.integers(0, 400), min_size=1, max_size=6),
)
def test_bloom_never_false_negative(spark, tmp_path_factory, n, probes):
    """The one failure a Bloom filter must never have: a PRESENT key's
    file pruned. Probe random key sets against a random-sized table and
    assert every present key's rows survive the pruned read exactly."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.sinks import read_table, write_version

    path = str(tmp_path_factory.mktemp("bloom_prop") / "t")
    write_version(
        spark.range(n).select("id", (F.col("id") * 3).alias("y")),
        path,
        num_files=None,
        bloom_columns=("id",),
    )
    got = {
        r["id"]: r["y"]
        for r in read_table(spark, path, equals={"id": probes}).collect()
    }
    exp = {k: k * 3 for k in set(probes) if k < n}
    assert got == exp


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1, max_size=30,
    ),
)
def test_triangle_stats_match_brute_force(spark, edges):
    """The degree-ordered wedge-join kernel must count exactly the
    triangles a brute-force set scan finds on arbitrary graphs."""
    from itertools import combinations

    from etl_job_applify_spark.operators import triangle_stats

    norm = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(norm), "a bigint, b bigint")
    st_ = triangle_stats(df)

    nodes = sorted({v for e in norm for v in e})
    want = sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in norm and (x, z) in norm and (y, z) in norm
    )
    deg: dict[int, int] = {}
    for a, b in norm:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert st_.n_triangles == want
    assert st_.n_edges == len(norm)
    assert st_.n_wedges == sum(d * (d - 1) // 2 for d in deg.values())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    w=st.integers(4, 9), h=st.integers(3, 8), seed=st.integers(0, 1000),
    delta=st.integers(1, 40),
)
def test_ahash_matches_numpy_reference_and_shift_invariance(
    spark, w, h, seed, delta
):
    """ahash_image_batch must agree with an independent per-pixel
    reference on arbitrary images, and be exactly invariant under any
    non-saturating uniform shift."""
    import numpy as np

    from pyspark.sql import types as T

    from etl_job_applify_spark.multimodal import (
        MEDIA_META_SCHEMA,
        ahash_image_batch,
        brighten_image_batch,
    )
    from etl_job_applify_spark.multimodal.ppm import encode_ppm

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256 - delta, size=3 * w * h).astype(np.uint8)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ])
    media = spark.createDataFrame(
        [(1, bytearray(encode_ppm(w, h, px)),
          {"format": "ppm", "width": w, "height": h, "duration_ms": None})],
        schema,
    )
    got = ahash_image_batch(media).collect()[0]["ahash"]

    # independent reference: dict-of-cells accumulation
    sums: dict[int, int] = {}
    ns: dict[int, int] = {}
    for i, b in enumerate(px):
        p = i // 3
        cell = (((p // w) * 3) // h) * 4 + ((p % w) * 4) // w
        sums[cell] = sums.get(cell, 0) + int(b)
        ns[cell] = ns.get(cell, 0) + 1
    total_sum, total_n = int(px.sum()), px.size
    want = sum(
        1 << c
        for c in sums
        if sums[c] * total_n > total_sum * ns[c]
    )
    assert got == want
    # non-saturating uniform shift: identical hash
    shifted = ahash_image_batch(brighten_image_batch(media, delta))
    assert shifted.collect()[0]["ahash"] == got


_coord = st.integers(min_value=0, max_value=400).map(lambda v: v / 4.0)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(_coord, _coord), min_size=1, max_size=12),
    right=st.lists(st.tuples(_coord, _coord), min_size=1, max_size=12),
    radius=st.sampled_from([0.5, 1.0, 2.5, 7.0]),
)
def test_grid_radius_join_matches_cross_product(spark, left, right, radius):
    """Grid blocking over arbitrary point sets and radii must reproduce
    the brute-force pair set exactly (superset-candidates + exact
    predicate), each pair exactly once."""
    from etl_job_applify_spark.operators.spatial import grid_radius_join

    ldf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(left)],
        "lid int, x double, y double",
    )
    rdf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(right)],
        "rid int, x double, y double",
    )
    rows = grid_radius_join(ldf, rdf, radius=radius).collect()
    got = [(r.lid, r.rid) for r in rows]
    want = {
        (li, ri)
        for li, (lx, ly) in enumerate(left)
        for ri, (rx, ry) in enumerate(right)
        if (lx - rx) ** 2 + (ly - ry) ** 2 <= radius * radius
    }
    assert len(got) == len(set(got))  # no duplicate candidates survive
    assert set(got) == want


_word = st.sampled_from(["red", "blue", "green", "gold", "gray"])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus=st.lists(
        st.lists(_word, min_size=1, max_size=12).map(" ".join),
        min_size=2,
        max_size=10,
    ),
    qwords=st.lists(_word, min_size=1, max_size=3, unique=True),
    k=st.sampled_from([1, 2, 4]),
)
def test_pruned_topk_matches_exhaustive_on_random_corpora(
    spark, corpus, qwords, k
):
    """Random tiny corpora and queries: the WAND-pruned top-k must equal
    the exhaustive-scoring top-k exactly, whatever the df skew, tie
    structure, or seed-list size."""
    from pyspark.sql import Window

    from etl_job_applify_spark.functions.retrieval import (
        bm25_scores,
        bm25_topk_pruned,
        doc_tokens,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id bigint, text string"
    )
    qterms = spark.createDataFrame(
        [(1, w) for w in qwords], "qid int, word string"
    )
    toks = doc_tokens(docs)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    got = {
        (r.qid, r.doc_id, r.rnk, r.score)
        for r in bm25_topk_pruned(tf, dl, dfreq, stats, qterms, k=k).collect()
    }
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    want = {
        (r.qid, r.doc_id, r.rnk, r.score)
        for r in bm25_scores(docs, qterms)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .collect()
    }
    assert got == want


_vec4 = st.lists(st.integers(1, 9), min_size=4, max_size=4)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus=st.lists(_vec4, min_size=4, max_size=14),
    queries=st.lists(_vec4, min_size=1, max_size=3),
    doom_mod=st.integers(2, 5),
)
def test_vector_index_probe_matches_python_fold(
    spark, tmp_path_factory, corpus, queries, doom_mod
):
    """Persisted-index ANN vs an INDEPENDENT Python reference: build on
    arbitrary vectors, delete an arbitrary id subset, full-probe
    (nprobe = cells -> exact over survivors) and compare against a
    pure-Python cosine computed with Spark's exact left-fold order
    (((0+x1)+x2)+... -> bit-identical doubles, so ranks compare
    exactly; ties broken by neighbor id in both)."""
    from etl_job_applify_spark.similarity import (
        vector_index_build,
        vector_index_delete,
        vector_index_probe,
    )

    k = 3
    cvecs = [(i, [float(x) for x in v]) for i, v in enumerate(corpus)]
    qvecs = [(100 + i, [float(x) for x in v]) for i, v in enumerate(queries)]
    doomed = [i for i, _ in cvecs if i % doom_mod == 0]
    cdf = spark.createDataFrame(cvecs, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(qvecs, "query_id long, embedding array<double>")
    idx = str(tmp_path_factory.mktemp("vxi_prop") / "idx")
    vector_index_build(
        cdf, idx, num_cells=2, centroids=[cvecs[0][1], cvecs[1][1]]
    )
    if doomed:
        vector_index_delete(spark, idx, doomed)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor"], r["cosine"])
        for r in vector_index_probe(
            spark, idx, qdf, k=k, nprobe=99
        ).collect()
    )

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    want = []
    for qid, qv in qvecs:
        qn = math.sqrt(fold_dot(qv, qv))
        scored = sorted(
            (
                -(fold_dot(qv, cv) / (qn * math.sqrt(fold_dot(cv, cv)))),
                i,
            )
            for i, cv in cvecs
            if i not in doomed
        )
        for rank, (negcos, i) in enumerate(scored[:k], 1):
            want.append((qid, rank, i, -negcos))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=24,
    ),
    parts=st.integers(min_value=1, max_value=8),
)
def test_decimal_sum_expr_grid_and_order_invariance(spark, vals, parts):
    """The shared DECIMAL(28,6) accumulation contract
    (functions/exact.py): decimal_sum_expr equals the Python Decimal
    replay (quantize each term HALF_UP to 1e-6, sum exactly, one final
    double conversion) and is INVARIANT under partitioning/order — the
    property every scoring kernel (BM25, DCG, NB) leans on."""
    from decimal import ROUND_HALF_UP, Decimal

    from etl_job_applify_spark.functions.exact import decimal_sum_expr

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = (
        df.repartition(parts)
        .agg(F.expr(decimal_sum_expr("x")).alias("s"))
        .first()["s"]
    )
    got_rev = (
        spark.createDataFrame([(v,) for v in reversed(vals)], "x double")
        .coalesce(1)
        .agg(F.expr(decimal_sum_expr("x")).alias("s"))
        .first()["s"]
    )
    grid = Decimal("0.000001")
    want = float(
        sum(
            Decimal(repr(v)).quantize(grid, rounding=ROUND_HALF_UP)
            for v in vals
        )
    )
    assert got == got_rev == want
