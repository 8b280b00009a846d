"""Nested-structure normalization: flatten structs, explode arrays.

The ingest step between "the JSON parsed" and "the warehouse can query
it": semi-structured payloads land as nested structs/arrays
(sources/readers.py read_json, q22/q106), and downstream SQL wants flat
columns and child tables. Both helpers are pure projections/generators
— scan-speed at any scale, no shuffles, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(
    df: DataFrame, sep: str = "_", max_depth: int = 10
) -> DataFrame:
    """Recursively lift every StructType column to top-level columns
    named ``parent<sep>child``. Arrays/maps are left intact (explode is
    a row-multiplying semantic change — see ``explode_to_child``).

    Name collisions raise (silently overwriting a column is a
    data-corruption vector); ``max_depth`` guards pathological nesting.
    """
    out = df
    for _ in range(max_depth):
        struct_cols = [
            f.name
            for f in out.schema.fields
            if isinstance(f.dataType, T.StructType)
        ]
        if not struct_cols:
            return out
        cols = []
        seen: set[str] = set()
        for f in out.schema.fields:
            if f.name in struct_cols:
                for sub in f.dataType.fields:  # type: ignore[union-attr]
                    new = f"{f.name}{sep}{sub.name}"
                    if new in seen:
                        raise ValueError(f"flatten collision on {new!r}")
                    seen.add(new)
                    cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(new))
            else:
                if f.name in seen:
                    raise ValueError(f"flatten collision on {f.name!r}")
                seen.add(f.name)
                cols.append(F.col(f"`{f.name}`"))
        out = out.select(*cols)
    raise ValueError(f"nesting deeper than max_depth={max_depth}")


def explode_to_child(
    df: DataFrame,
    array_col: str,
    parent_keys: list[str],
    position_col: str = "pos",
) -> DataFrame:
    """Normalize an array column into a child relation: one row per
    element, carrying the parent keys and the element's position (the
    stable ordering key a child table needs). Struct elements are then
    flattened. ``posexplode_outer`` keeps parents with empty/null arrays
    visible as a single null-element row — drop them with
    ``WHERE pos IS NOT NULL`` when inner semantics are wanted."""
    child = df.select(
        *parent_keys,
        F.posexplode_outer(F.col(array_col)).alias(position_col, "element"),
    )
    if isinstance(child.schema["element"].dataType, T.StructType):
        return flatten_structs(child)
    return child
