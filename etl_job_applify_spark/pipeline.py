"""Pipeline orchestration (reference parity: P1/E3,
services/etl_pipeline.py:1-29).

The reference's ``ETLPipeline`` chains extract → transform → load → post
with logging, but was never instantiated and its stage signatures didn't
match the concrete classes. Here the contract is explicit and lazy: every
stage maps DataFrame → DataFrame; nothing executes until the sink action,
so Catalyst optimizes across stage boundaries (filters written in a late
transform still push down into the source scan).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger("etl_job_applify_spark")

Extract = Callable[[SparkSession], DataFrame]
Transform = Callable[[DataFrame], DataFrame]
Load = Callable[[DataFrame], None]


@dataclass
class Pipeline:
    """Composable E→T*→L pipeline.

    >>> Pipeline(
    ...     extract=lambda s: read_parquet(s, path),
    ...     transforms=[lambda df: apply_contract(df, contract), exact_dedup],
    ...     load=lambda df: write_parquet(df, out),
    ... ).run(spark)
    """

    extract: Extract
    transforms: list[Transform] = field(default_factory=list)
    load: Load | None = None
    name: str = "pipeline"

    def build(self, spark: SparkSession) -> DataFrame:
        """Compose the lazy plan (no execution)."""
        df = self.extract(spark)
        for t in self.transforms:
            df = t(df)
        return df

    def run(self, spark: SparkSession) -> DataFrame:
        """Build and, if a sink is configured, execute it (the only
        action). Returns the final DataFrame either way."""
        log.info("pipeline %s: building plan", self.name)
        df = self.build(spark)
        if self.load is not None:
            log.info("pipeline %s: executing sink", self.name)
            self.load(df)
            log.info("pipeline %s: done", self.name)
        return df

    def run_observed(
        self, spark: SparkSession, metrics: dict[str, "Column"] | None = None
    ) -> tuple[DataFrame, dict]:
        """Run with free in-flight metrics via ``df.observe``: the named
        aggregates ride the sink job itself (collected by executors as
        rows stream to the sink) — NO second pass over the data, unlike
        a ``.count()`` after the write, which at 100 TB would double the
        job. Requires a configured sink (observed metrics only
        materialize through an action).

        Default metrics: row count. Returns (DataFrame, metrics dict) —
        the numbers production jobs alert on (rows in/out, null rates).
        """
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        if self.load is None:
            raise ValueError("run_observed requires a sink (load=...)")
        obs = Observation(f"{self.name}_metrics")
        m = metrics or {"rows_out": F.count(F.lit(1))}
        df = self.build(spark).observe(
            obs, *(expr.alias(name) for name, expr in m.items())
        )
        self.load(df)
        got = obs.get
        log.info("pipeline %s: metrics %s", self.name, got)
        return df, got
