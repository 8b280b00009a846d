"""Declarative schema-contract transform (reference parity: T2/T3,
services/transformer.py:25-48).

The reference maps a YAML contract ``{source, name, type, format?}`` onto a
DataFrame with one ``withColumn`` per column — N plan nodes, and the source
columns are never dropped. Here the whole contract compiles to a SINGLE
``select``: one projection node, unused source columns pruned at the scan
(column pruning reaches the parquet reader), and the full Spark type
lattice is supported instead of the reference's six scalar types.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_DATE_FMT = "yyyy-MM-dd"
_DEFAULT_TS_FMT = "yyyy-MM-dd HH:mm:ss"

#: reference's scalar type names → Spark SQL type names; anything else is
#: passed through to ``cast`` verbatim, which covers the full lattice
#: (``decimal(18,2)``, ``array<float>``, ``map<string,double>``,
#: ``struct<...>``, ``binary`` …)
_TYPE_ALIASES = {
    "integer": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


@dataclass
class ColumnSpec:
    source: str
    name: str
    type: str
    format: str | None = None

    def to_column(self) -> Column:
        src = F.col(self.source)
        t = self.type.strip().lower()
        if t == "date":
            col = F.to_date(src, self.format or _DEFAULT_DATE_FMT)
        elif t == "timestamp":
            col = F.to_timestamp(src, self.format or _DEFAULT_TS_FMT)
        else:
            col = src.cast(_TYPE_ALIASES.get(t, self.type))
        return col.alias(self.name)


@dataclass
class SchemaContract:
    """Target-schema contract: ordered column specs.

    Build from the reference's YAML shape (FIXTURES.md §1.5)::

        SchemaContract.from_dict({"target_schema": {"columns": [
            {"source": "Customer Id", "name": "customer_id", "type": "string"},
            {"source": "Subscription Date", "name": "subscribed_on",
             "type": "date", "format": "yyyy-MM-dd"},
        ]}})
    """

    columns: list[ColumnSpec] = field(default_factory=list)

    @classmethod
    def from_dict(cls, spec: dict) -> "SchemaContract":
        inner = spec.get("target_schema", spec)
        cols = [
            ColumnSpec(
                source=c["source"],
                name=c.get("name", c["source"]),
                type=c.get("type", "string"),
                format=c.get("format"),
            )
            for c in inner["columns"]
        ]
        return cls(cols)

    @classmethod
    def from_yaml(cls, path: str) -> "SchemaContract":
        import yaml  # transitive dep; contracts may also ship as dicts

        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh))

    def apply(self, df: DataFrame) -> DataFrame:
        """Project + rename + cast in ONE select (vs the reference's N
        ``withColumn`` calls — one plan node, prunable scan)."""
        if not self.columns:
            raise ValueError("empty contract")
        return df.select(*[c.to_column() for c in self.columns])


def apply_contract(df: DataFrame, spec: dict | SchemaContract) -> DataFrame:
    contract = spec if isinstance(spec, SchemaContract) else SchemaContract.from_dict(spec)
    return contract.apply(df)


def apply_with_quarantine(
    df: DataFrame, spec: dict | SchemaContract
) -> tuple[DataFrame, DataFrame]:
    """Contract application with a data-quality quarantine: returns
    (good, bad) where ``bad`` holds the ORIGINAL rows in which any cast
    silently nulled a non-null source value (permissive engines turn
    bad casts into NULLs — this op makes that loss visible instead of
    letting it vanish into the warehouse).

    ``bad`` carries the source columns plus ``__bad_columns`` (the
    contract columns that failed). Both outputs derive from one scan;
    Catalyst shares the subplan, so the pair costs one pass when both
    sides are consumed in the same job. At 100 TB, land ``bad`` next to
    the target table and alert on its row count (see
    Pipeline.run_observed for the free metric).
    """
    contract = (
        spec if isinstance(spec, SchemaContract)
        else SchemaContract.from_dict(spec)
    )
    if not contract.columns:
        raise ValueError("empty contract")
    fail_flags = [
        (
            F.col(c.source).isNotNull()
            & c.to_column().cast("string").isNull()
        ).alias(f"__fail_{c.name}")
        for c in contract.columns
    ]
    flagged = df.select("*", *fail_flags)
    fail_cols = [f"__fail_{c.name}" for c in contract.columns]
    any_fail = F.array_contains(F.array(*fail_cols), True)
    bad = (
        flagged.filter(any_fail)
        .withColumn(
            "__bad_columns",
            F.concat_ws(
                ",",
                F.filter(
                    F.array(*[
                        F.when(F.col(f"__fail_{c.name}"), c.name)
                        for c in contract.columns
                    ]),
                    lambda x: x.isNotNull(),
                ),
            ),
        )
        .drop(*fail_cols)
    )
    good = flagged.filter(~any_fail).drop(*fail_cols)
    return contract.apply(good), bad
