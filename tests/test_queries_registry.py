"""Registry smoke: every registered query runs at sf0.001 with a stable
schema and sane row counts; oracle coverage is enforced structurally.
(Full value-level DuckDB cross-checks run via tools/check_oracle.py and
the driver's harness at sf0.01.)"""

from __future__ import annotations

import pytest

from etl_job_applify_spark import queries as registry

from conftest import SF_SMOKE

ALL = registry.queries()
ORACLES = registry.oracle_sql()

#: rows-only by design (engine-specific hashes / approximate results)
EXPECTED_ROWS_ONLY = {
    "q32_minhash_lsh",
    "q33_simhash",
    "q35_ann_lsh",
    "q38_approx_distinct",
    "q68_approx_quantiles",
    "q86_ann_ivf",
}

#: queries whose sf0.001 result may legitimately be empty
MAY_BE_EMPTY = {"q36_embedding_near_dup"}


def test_oracle_coverage_is_total_except_rows_only():
    assert set(ORACLES) == set(ALL) - EXPECTED_ROWS_ONLY


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_runs(spark, name):
    df = ALL[name](spark, SF_SMOKE)
    assert df.columns, f"{name} has no columns"
    n = df.count()
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name} returned no rows at sf0.001"


def test_entry_contract(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


@pytest.mark.parametrize("name", [
    "q12_grouping_sets",   # temp view
    "q24_window_range_frame",
    "q26_scalar_subquery",
    "q70_lateral_topn",
    "q31_ngram_jaccard",   # persisted postings
    "q32_minhash_lsh",     # persisted candidates
    "q123_sql_udf",        # temp SQL functions
])
def test_stateful_queries_are_rerunnable(spark, name):
    """Queries that register temp views or persist relations must produce
    identical results when invoked twice in one session (the driver may
    run the registry more than once)."""
    first = ALL[name](spark, SF_SMOKE).count()
    second = ALL[name](spark, SF_SMOKE).count()
    assert first == second


def test_coverage_doc_totals_match_registry():
    """COVERAGE.md's totals line must track the actual registry — docs
    that drift from code are worse than no docs."""
    import re

    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(r"\*\*(\d+) registered queries, (\d+) with DuckDB oracles\*\*", text)
    assert m, "totals line missing from COVERAGE.md"
    assert int(m.group(1)) == len(ALL)
    assert int(m.group(2)) == len(ORACLES)


def test_recursive_cte_matches_dataframe_loop(spark):
    """q179 exercises Spark's NATIVE recursion, so its oracle shares the
    recursion SHAPE with DuckDB; this pins it against a third,
    independent formulation — an explicit DataFrame frontier loop — so a
    same-shape recursion bug cannot cancel in the oracle compare."""
    import pyspark.sql.functions as F

    from etl_job_applify_spark.queries.relational5 import q179_recursive_cte

    got = {
        (r["steps"]): (r["n_chains"], r["node_sum"])
        for r in q179_recursive_cte(spark, SF_SMOKE).collect()
    }

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    frontier = cust.filter(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").alias("node"), F.lit(0).alias("steps")
    )
    acc = frontier
    while frontier.filter(F.col("node") > 1).limit(1).count() > 0:
        frontier = frontier.filter(F.col("node") > 1).select(
            F.expr("node div 2").alias("node"),
            (F.col("steps") + 1).alias("steps"),
        )
        acc = acc.unionByName(frontier)
    want = {
        r["steps"]: (r["n"], r["s"])
        for r in acc.groupBy("steps")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("node").cast("bigint").alias("s"),
        )
        .collect()
    }
    assert got == want and len(got) > 3
