"""Schema contract + dedup + upsert + pipeline semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_job_applify_spark.pipeline import Pipeline
from etl_job_applify_spark.sinks.upsert import upsert
from etl_job_applify_spark.transform import SchemaContract, apply_contract
from etl_job_applify_spark.transform.dedup import dedup_keep_first, exact_dedup


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [("1", "John", "2020-08-24", "99.5"), ("2", "Jane", "2021-01-02", "88.25")],
        "id string, name string, subscribed string, score string",
    )


def test_contract_single_select(people):
    out = apply_contract(
        people,
        {
            "columns": [
                {"source": "id", "name": "user_id", "type": "integer"},
                {"source": "name", "name": "full_name", "type": "string"},
                {"source": "subscribed", "name": "subscribed_on", "type": "date",
                 "format": "yyyy-MM-dd"},
                {"source": "score", "name": "score", "type": "double"},
            ]
        },
    )
    assert out.columns == ["user_id", "full_name", "subscribed_on", "score"]
    assert dict(out.dtypes) == {
        "user_id": "int", "full_name": "string",
        "subscribed_on": "date", "score": "double",
    }
    row = out.orderBy("user_id").first()
    assert row["user_id"] == 1 and str(row["subscribed_on"]) == "2020-08-24"


def test_contract_full_type_lattice(people):
    out = apply_contract(
        people,
        {"columns": [{"source": "score", "name": "amount", "type": "decimal(10,2)"}]},
    )
    assert dict(out.dtypes)["amount"] == "decimal(10,2)"


def test_contract_bad_type_is_error(people):
    with pytest.raises(Exception):
        apply_contract(
            people, {"columns": [{"source": "id", "name": "x", "type": "nope!!"}]}
        ).collect()


def test_contract_from_reference_yaml_shape():
    c = SchemaContract.from_dict(
        {"target_schema": {"columns": [
            {"source": "Customer Id", "name": "customer_id", "type": "string"}
        ]}}
    )
    assert c.columns[0].name == "customer_id"


def test_exact_dedup_and_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 20), (2, "b", 30)], "k int, g string, v int"
    )
    assert exact_dedup(df).count() == 3  # full rows are distinct
    assert exact_dedup(df, ["k"]).count() == 2
    kept = dedup_keep_first(df, ["k"], ["v"], ascending=False)
    assert {(r["k"], r["v"]) for r in kept.collect()} == {(1, 20), (2, 30)}


def test_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "old"), (2, "keep")], "id int, val string"
    )
    updates = spark.createDataFrame(
        [(1, "new", 2), (1, "newer", 3), (3, "ins", 1)], "id int, val string, v int"
    )
    out = upsert(target, updates, keys=["id"], version_col="v")
    assert {(r["id"], r["val"]) for r in out.collect()} == {
        (1, "newer"), (2, "keep"), (3, "ins"),
    }


def test_pipeline_end_to_end(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    pipe = Pipeline(
        extract=lambda s: s.createDataFrame(
            [("1", "x"), ("1", "x"), ("2", "y")], "id string, v string"
        ),
        transforms=[
            lambda df: apply_contract(
                df, {"columns": [
                    {"source": "id", "name": "id", "type": "integer"},
                    {"source": "v", "name": "v", "type": "string"},
                ]}
            ),
            exact_dedup,
        ],
        load=lambda df: df.write.mode("overwrite").parquet(out_dir),
    )
    pipe.run(spark)
    assert spark.read.parquet(out_dir).count() == 2


def test_pipeline_observed_metrics_single_pass(spark, tmp_path):
    """run_observed reports sink-job metrics (no second pass) with the
    caller's alias names."""
    from pyspark.sql import functions as F

    from etl_job_applify_spark.pipeline import Pipeline

    out = str(tmp_path / "obs_out")
    pipe = Pipeline(
        extract=lambda s: s.range(0, 1000).withColumn(
            "v", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
        ),
        transforms=[lambda df: df.filter(F.col("id") >= 100)],
        load=lambda df: df.write.mode("overwrite").parquet(out),
        name="obs_test",
    )
    _, metrics = pipe.run_observed(
        spark,
        {
            "rows_out": F.count(F.lit(1)),
            "null_v": F.count_if(F.col("v").isNull()),
        },
    )
    assert metrics["rows_out"] == 900
    assert metrics["null_v"] == 90
    assert spark.read.parquet(out).count() == 900


def test_pipeline_observed_requires_sink(spark):
    import pytest as _pytest

    from etl_job_applify_spark.pipeline import Pipeline

    with _pytest.raises(ValueError, match="sink"):
        Pipeline(extract=lambda s: s.range(3)).run_observed(spark)


def test_contract_quarantine_catches_silent_cast_nulls(spark):
    from etl_job_applify_spark.transform.contract import apply_with_quarantine

    df = spark.createDataFrame(
        [("1", "2024-01-01"), ("x", "2024-02-02"), ("3", "not-a-date"),
         (None, "2024-03-03")],
        "id string, d string",
    )
    contract = {"columns": [
        {"source": "id", "name": "id", "type": "integer"},
        {"source": "d", "name": "dt", "type": "date"},
    ]}
    good, bad = apply_with_quarantine(df, contract)
    # NULL source is contract-legal (stays good); bad casts quarantine
    assert {r["id"] for r in good.collect()} == {1, None}
    quarantined = {r["id"]: r["__bad_columns"] for r in bad.collect()}
    assert quarantined == {"x": "id", "3": "dt"}
    assert set(bad.columns) == {"id", "d", "__bad_columns"}


# --- declarative data-quality checks (transform/quality.py) ---------------

def test_quality_rules_single_scan_metrics(spark):
    from etl_job_applify_spark.transform.quality import check_rules

    df = spark.createDataFrame(
        [(1, "a@x.com", 5.0), (2, "b@y.org", 15.0), (3, None, 8.0),
         (3, "bad", None)],
        "id long, email string, v double",
    )
    out = {r["rule"]: (round(r["metric"], 6), r["passed"])
           for r in check_rules(df, [
               {"type": "completeness", "column": "email", "min": 0.7},
               {"type": "uniqueness", "column": "id", "min": 1.0},
               {"type": "bounds", "column": "v", "lo": 0, "hi": 10},
               {"type": "pattern", "column": "email",
                "regex": "^[^@]+@[^@]+$", "min": 0.6},
           ]).collect()}
    assert out["completeness(email)"] == (0.75, True)
    assert out["uniqueness(id)"] == (0.75, False)       # dup id=3
    assert out["bounds(v)"] == (0.666667, False)        # 15.0 out of range
    assert out["pattern(email)"] == (0.666667, True)    # 'bad' fails regex

    # exactly ONE aggregate pass: no joins/unions of scans in the plan
    from etl_job_applify_spark.plans import explain_str

    plan = explain_str(check_rules(df, [
        {"type": "completeness", "column": "email"},
        {"type": "bounds", "column": "v", "lo": 0, "hi": 10},
    ]), "simple")
    assert "Union" not in plan and "Join" not in plan


def test_quality_gate_raises_with_failing_metrics(spark):
    import pytest

    from etl_job_applify_spark.transform.quality import assert_rules

    df = spark.createDataFrame([(1,), (1,)], "id long")
    with pytest.raises(ValueError, match="uniqueness"):
        assert_rules(df, [{"type": "uniqueness", "column": "id"}])
    assert_rules(df, [{"type": "completeness", "column": "id"}])  # passes


def test_quality_empty_input_fails_closed(spark):
    from etl_job_applify_spark.transform.quality import check_rules

    df = spark.createDataFrame([], "id long, v double")
    out = {r["rule"]: r["passed"] for r in check_rules(df, [
        {"type": "completeness", "column": "id"},
        {"type": "bounds", "column": "v", "lo": 0, "hi": 1},
    ]).collect()}
    assert out == {"completeness(id)": False, "bounds(v)": False}


# --- nested-structure normalization (transform/flatten.py) ----------------


def test_flatten_structs_recursive_and_collision(spark):
    import pytest

    from etl_job_applify_spark.transform.flatten import flatten_structs

    df = spark.sql(
        "SELECT 1 AS id, named_struct('a', 2, 'b',"
        " named_struct('c', 3)) AS s, 'x' AS t"
    )
    flat = flatten_structs(df)
    assert flat.columns == ["id", "s_a", "s_b_c", "t"]
    assert flat.first().asDict() == {"id": 1, "s_a": 2, "s_b_c": 3, "t": "x"}

    clash = spark.sql(
        "SELECT named_struct('a', 1) AS s, 2 AS s_a"
    )
    with pytest.raises(ValueError, match="collision"):
        flatten_structs(clash)


def test_explode_to_child_positions_and_empty_parents(spark):
    from etl_job_applify_spark.transform.flatten import explode_to_child

    df = spark.sql(
        "SELECT * FROM VALUES"
        " (1, array(named_struct('v', 10), named_struct('v', 20))),"
        " (2, array())"
        " AS t(id, items)"
    )
    child = explode_to_child(df, "items", ["id"])
    rows = {(r["id"], r["pos"]): r["element_v"] for r in child.collect()}
    assert rows == {(1, 0): 10, (1, 1): 20, (2, None): None}


def test_bucketed_cumsum_matches_global_window(spark):
    """The two-pass bucketed prefix sum (no single-task global window)
    must equal the naive global exclusive cumsum — including across
    bucket boundaries and with sparse/non-contiguous order keys."""
    from pyspark.sql import Window

    from etl_job_applify_spark.transform.packing import bucketed_cumsum

    rows = [(i * 7 + (i % 3), (i * 13) % 29 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cumsum"]
        for r in bucketed_cumsum(df, "k", "v", bucket_width=16).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: r["c"]
        for r in df.select(
            "k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    assert got == want


def test_pack_sequences_spans_and_stats(spark):
    """Hand-checkable packing: capacity 10, docs of 4/8/6/12 tokens in
    id order -> offsets 0/4/12/18; doc 2 straddles the first cut
    (spans seqs 0-1), doc 4 spans 1-2 (12 tokens crossing 20)."""
    from etl_job_applify_spark.transform.packing import (
        pack_sequences,
        packed_sequence_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 4)),
            (2, " ".join(["w"] * 8)),
            (3, " ".join(["w"] * 6)),
            (4, " ".join(["w"] * 12)),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["start_seq"], r["end_seq"])
        for r in pack_sequences(docs, capacity=10, bucket_width=2).collect()
    }
    assert spans == {1: (0, 0), 2: (0, 1), 3: (1, 1), 4: (1, 2)}
    stats = {
        r["seq"]: (r["n_docs"], r["n_boundary_docs"])
        for r in packed_sequence_stats(
            pack_sequences(docs, capacity=10, bucket_width=2)
        ).collect()
    }
    assert stats == {0: (2, 1), 1: (3, 2), 2: (1, 1)}


def test_naive_bayes_recovers_separable_classes(spark):
    """NB on a cleanly separable two-class corpus: held-out docs built
    from each class's vocabulary classify correctly, and per-class
    scores order as expected; tie-break is MIN label."""
    from etl_job_applify_spark.transform.nbayes import (
        nb_predict,
        nb_score,
        nb_train,
    )

    train = spark.createDataFrame(
        [
            (1, "aa", "apple banana apple cherry apple"),
            (2, "aa", "banana apple banana"),
            (3, "bb", "dog cat dog ferret dog"),
            (4, "bb", "cat dog cat"),
        ],
        "doc_id long, lang string, text string",
    )
    test = spark.createDataFrame(
        [(10, "apple banana cherry"), (11, "dog cat cat")],
        "doc_id long, text string",
    )
    wc, cs, vocab, n = nb_train(train, "lang")
    pred = {
        r["doc_id"]: r["pred"]
        for r in nb_predict(nb_score(test, wc, cs, vocab, n)).collect()
    }
    assert pred == {10: "aa", 11: "bb"}


def test_exact_grouped_median_and_robust_outliers(spark):
    """Hand-checkable medians (odd + even groups) and the modified
    z-score flag: group A has median 10, MAD 1, outlier 100 flags;
    group B (even count) has its two middles averaged; a constant
    group (MAD 0) flags nothing."""
    from etl_job_applify_spark.transform.quality import (
        exact_grouped_median,
        robust_outliers,
    )

    rows = (
        [(i, "a", v) for i, v in enumerate([9.0, 10.0, 11.0, 10.0, 100.0])]
        + [(10 + i, "b", v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0])]
        + [(20 + i, "c", 5.0) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    med = {
        r["grp"]: r["median"]
        for r in exact_grouped_median(df, "grp", "v").collect()
    }
    assert med == {"a": 10.0, "b": 2.5, "c": 5.0}
    flagged = robust_outliers(df, "grp", "v", "id", z_threshold=3.5)
    got = {(r["id"], r["grp"]) for r in flagged.collect()}
    assert got == {(4, "a")}  # 0.6745*(100-10)/1 = 60.7; b/c flag none


def test_packed_sequence_slices_hand_checkable(spark):
    """Slice relation: capacity 10, docs of 4/8/6/12 tokens -> the
    per-(seq, doc) slices partition every sequence exactly, straddlers
    split at the cut, zero-token docs keep one zero-length row at
    their offset."""
    from etl_job_applify_spark.transform.packing import (
        pack_sequences,
        packed_sequence_slices,
    )

    docs = spark.createDataFrame(
        [(1, 4), (2, 8), (3, 0), (4, 6), (5, 12)],
        "doc_id long, n long",
    )
    spans = pack_sequences(docs, capacity=10, tokens_col="n",
                           bucket_width=2)
    got = {
        (r["seq"], r["doc_id"]): (r["start_in_seq"], r["n_tokens_in_seq"])
        for r in packed_sequence_slices(spans, 10).collect()
    }
    assert got == {
        (0, 1): (0, 4),
        (0, 2): (4, 6), (1, 2): (0, 2),   # doc 2 straddles the cut
        (1, 3): (2, 0),                   # zero-token doc at offset 12
        (1, 4): (2, 6),
        (1, 5): (8, 2), (2, 5): (0, 10),  # doc 5 straddles
    }
    # invariants: every non-final sequence's slices sum to capacity;
    # every doc's slices sum to its token count
    per_seq = {}
    per_doc = {}
    for (s, d), (_, n) in got.items():
        per_seq[s] = per_seq.get(s, 0) + n
        per_doc[d] = per_doc.get(d, 0) + n
    assert per_seq == {0: 10, 1: 10, 2: 10}  # 30 tokens fill 3 seqs
    assert per_doc == {1: 4, 2: 8, 3: 0, 4: 6, 5: 12}


def test_nb_evaluate_hand_checkable(spark):
    """Per-class metrics from a hand-built confusion: class a (2 gold,
    both predicted a, plus one b mispredicted as a) -> p=2/3, r=1;
    class b (2 gold, 1 correct, 1 lost to a) -> p=1, r=1/2; class c
    appears only in GOLD (never predicted: p=0 by convention) and
    class d only as a PREDICTION (r=0)."""
    from etl_job_applify_spark.transform.nbayes import (
        nb_confusion,
        nb_evaluate,
    )

    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "d")],
        "doc_id long, pred string",
    )
    gold = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")],
        "doc_id long, label string",
    )
    conf = {
        (r["gold"], r["pred"]): r["n"]
        for r in nb_confusion(pred, gold).collect()
    }
    assert conf == {
        ("a", "a"): 2, ("b", "a"): 1, ("b", "b"): 1, ("c", "d"): 1
    }
    got = {
        r["label"]: (
            r["n_gold"], r["n_pred"], r["tp"], r["fp"], r["fn"],
            r["precision"], r["recall"], r["f1"],
        )
        for r in nb_evaluate(pred, gold).collect()
    }
    third = 2.0 / 3.0
    f1_a = 2.0 * third * 1.0 / (third + 1.0)
    f1_b = 2.0 * 1.0 * 0.5 / 1.5
    assert got["a"] == (2, 3, 2, 1, 0, third, 1.0, f1_a)
    assert got["b"] == (2, 1, 1, 0, 1, 1.0, 0.5, f1_b)
    assert got["c"] == (1, 0, 0, 0, 1, 0.0, 0.0, 0.0)  # never predicted
    assert got["d"] == (0, 1, 0, 1, 0, 0.0, 0.0, 0.0)  # never gold


def test_domain_mix_allocation_and_selection(spark):
    """Hand-checked two-round allocation: budget 1000, cap 400 over
    avail {a:100, b:1000, c:5000} -> {a:100, b:400, c:400} (round 1
    floors 16/163/400, leftover 421 water-fills headroom 84/237/0);
    selection takes docs in id order while the inclusive prefix sum
    fits, dropping the boundary doc."""
    from etl_job_applify_spark.transform.mixing import (
        domain_mix_select,
        domain_mix_summary,
        domain_token_allocation,
    )

    alloc = domain_token_allocation(
        {"a": 100, "b": 1000, "c": 5000}, budget=1000, max_share=0.4
    )
    assert alloc == {"a": 100, "b": 400, "c": 400}
    # degenerate: zero budget / empty corpus
    assert domain_token_allocation({"a": 5}, 0, 0.5) == {"a": 0}
    assert domain_token_allocation({}, 100, 0.5) == {}

    docs = spark.createDataFrame(
        [(1, "x", 3), (2, "x", 4), (3, "x", 5),
         (4, "y", 300), (5, "y", 1)],
        "doc_id long, lang string, n long",
    )
    # budget 16, cap 8: avail {x:12, y:301}; base x=0, y=15 -> alloc1
    # x=0, y=8; left=8, head x=8, y=0 -> x=8, y=8
    sel = {
        r["doc_id"]
        for r in domain_mix_select(
            docs, budget=16, max_share=0.5, tokens_col="n"
        ).collect()
    }
    # x: cum 3,7,12 vs 8 -> docs 1,2; y: first doc 300 > 8 -> none
    # (boundary doc dropped, not split)
    assert sel == {1, 2}
    summ = {
        r["lang"]: (
            r["avail_tokens"], r["allocation"], r["n_docs"],
            r["tokens_taken"],
        )
        for r in domain_mix_summary(
            docs, budget=16, max_share=0.5, tokens_col="n"
        ).collect()
    }
    # y reports its true allocation even though nothing fits
    assert summ == {"x": (12, 8, 2, 7), "y": (301, 8, 0, 0)}


def test_bucketed_cumsum_partitioned_matches_per_group_window(spark):
    """bucketed_cumsum(partition_by=[g]): the prefix sum restarts per
    group and equals the naive per-group running window — including
    groups that span many buckets and buckets that span many groups.
    This is the kernel behind the domain-mixing selection (q262), where
    a per-domain window alone would funnel a skewed domain through one
    task."""
    from pyspark.sql import Window

    from etl_job_applify_spark.transform.packing import bucketed_cumsum

    rows = [
        (f"g{i % 3}", i * 5 + (i % 2), (i * 11) % 17 + 1)
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "g string, k long, v long")
    got = {
        (r["g"], r["k"]): r["cumsum"]
        for r in bucketed_cumsum(
            df, "k", "v", bucket_width=32, partition_by=["g"]
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = {
        (r["g"], r["k"]): r["c"]
        for r in df.select(
            "g", "k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    assert got == want


def test_sampled_weighted_quantiles_p1_equals_exact(spark):
    """At p=1.0 the portable sample keeps every row, so the sampled
    weighted quantiles must equal the exact weighted lower-quantile
    kernel (q270's) on the full data — pinning that the 'twin' really
    is the same kernel over a sample, not an approximation of it."""
    from pyspark.sql import Window

    from etl_job_applify_spark.transform.sampling import (
        sampled_weighted_quantiles,
    )

    rows = [
        (f"g{i % 2}", i, (i * 7) % 50 + 1.0, (i * 3) % 9 + 1)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, k long, x double, w long")
    got = {
        r["g"]: (r["sampled_weight"], r["wq_05"], r["wq_09"])
        for r in sampled_weighted_quantiles(
            df, ["g"], "x", "w", "k", p=1.0, quantiles=[0.5, 0.9]
        ).collect()
    }
    wo = Window.partitionBy("g").orderBy("x", "k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wc = Window.partitionBy("g")
    exact = {
        r["g"]: (r["tw"], r["m"], r["p9"])
        for r in df.select(
            "g",
            F.sum(F.col("w").cast("bigint")).over(wo).alias("cum"),
            F.sum(F.col("w").cast("bigint")).over(wc).alias("tw"),
            "x",
        )
        .groupBy("g")
        .agg(
            F.max("tw").alias("tw"),
            F.min(
                F.when(2 * F.col("cum") >= F.col("tw"), F.col("x"))
            ).alias("m"),
            F.min(
                F.when(10 * F.col("cum") >= 9 * F.col("tw"), F.col("x"))
            ).alias("p9"),
        )
        .collect()
    }
    assert got == exact
