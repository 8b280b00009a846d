"""Physical-plan introspection helpers.

The engine's performance discipline is "read the plan, not the vibes":
tests assert that filters reach the parquet scan, dimension joins
broadcast, and shuffle counts stay at the expected minimum — so a
regression that silently de-optimizes a plan fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    text = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan (before AQE
    runtime re-use); the cheapest proxy for 'how many times does the data
    cross the network'."""
    return explain_str(df, "simple").count("Exchange")
