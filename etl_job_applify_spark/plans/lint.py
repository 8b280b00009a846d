"""Physical-plan linting: the registry-wide audit rules as a reusable
API ("explain why my query will be slow" without running it).

The registry test (tests/test_plans.py) enforces these as CI gates; the
same checks are exposed here so a pipeline author can lint any
DataFrame before launching a 1000-executor run. Error-severity findings
are the patterns that do not survive a 100x scale-up; info-severity
findings are worth a look but often legitimate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from .explain import explain_str

#: finding codes, error severity — the non-negotiables
ROW_PYTHON = "row-python"            # BatchEvalPython: per-row Python UDF
PYTHON_STAGE = "python-stage"        # Arrow-batched Python stage
CARTESIAN = "cartesian"              # CartesianProduct / BNLJ

#: finding codes, info severity — heuristics
SORT_FOR_LIMIT = "sort-for-limit"    # global sort + limit, no TakeOrdered
UNPUSHED_SCAN = "unpushed-scan"      # a scan with no pushed filters under a Filter


@dataclass(frozen=True)
class Finding:
    severity: str  # "error" | "info"
    code: str
    message: str


def lint_plan(df: DataFrame) -> list[Finding]:
    """Lint ``df``'s physical plan. Returns findings, errors first.

    Callers with deliberate exceptions (a gated brute-force baseline, an
    Arrow-batched codec) filter by ``code`` — exactly what the registry
    audit does with its allowlists."""
    simple = explain_str(df, "simple")
    formatted = explain_str(df, "formatted")
    out: list[Finding] = []
    if "BatchEvalPython" in simple:
        out.append(
            Finding(
                "error",
                ROW_PYTHON,
                "row-at-a-time Python UDF (BatchEvalPython): ~10-100x "
                "slower than an Arrow-batched pandas UDF or a JVM "
                "expression",
            )
        )
    if (
        "ArrowEvalPython" in simple
        or "MapInPandas" in simple
        or "FlatMapGroupsInPandas" in simple
    ):
        out.append(
            Finding(
                "error",
                PYTHON_STAGE,
                "Arrow-batched Python stage: fine for deliberate Python "
                "operators (UDAF, codecs), a regression anywhere a JVM "
                "expression could serve",
            )
        )
    if "CartesianProduct" in simple or "BroadcastNestedLoopJoin" in simple:
        out.append(
            Finding(
                "error",
                CARTESIAN,
                "cartesian / broadcast-nested-loop join: quadratic work "
                "unless one side is provably tiny — add an equi-join key "
                "or a blocking/banding stage",
            )
        )
    if (
        "GlobalLimit" in simple
        and "Sort " in simple
        and "TakeOrderedAndProject" not in simple
    ):
        out.append(
            Finding(
                "info",
                SORT_FOR_LIMIT,
                "global sort feeding a limit did not collapse to "
                "TakeOrderedAndProject — a full sort of the relation "
                "where a bounded heap would do",
            )
        )
    if "PushedFilters: []" in formatted and "Filter (" in formatted:
        out.append(
            Finding(
                "info",
                UNPUSHED_SCAN,
                "a scan carries no pushed filters while the plan "
                "filters above it — check the predicate is "
                "pushdown-eligible (no UDF/cast barriers)",
            )
        )
    out.sort(key=lambda f: (f.severity != "error", f.code))
    return out


def lint_errors(df: DataFrame, allow: set[str] = frozenset()) -> list[Finding]:
    """Error-severity findings only, minus explicitly allowed codes."""
    return [
        f for f in lint_plan(df) if f.severity == "error" and f.code not in allow
    ]
