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
