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
