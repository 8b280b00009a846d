"""One-pass table profiling: per-column null/distinct/extremes stats.

The dbt/Deequ-style "what is in this table" summary every pipeline runs
before trusting a new feed — realized as ONE aggregate over one scan
(every column's metrics are expressions of the same pass; no per-column
jobs, no driver loop over columns), then unpivoted to the long
(column, metrics) form dashboards expect.

Typing discipline: numeric columns report DOUBLE extremes, string
columns report text extremes, timestamps report extremes as epoch
microseconds (exact integers) — never engine-formatted strings, which
would drift between engines' float/timestamp printers.

Scale: COUNT(DISTINCT) for many columns in one aggregate expands the
input (one replica per distinct aggregate — Spark's Expand operator);
at 100 TB swap ``exact_distinct=False`` to approx_count_distinct, which
keeps the single-pass shape with HLL sketch state instead. The unpivot
is |columns| rows — free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(
    df: DataFrame, columns=None, exact_distinct: bool = True
) -> DataFrame:
    """→ one row per profiled column:
    (column, n_rows, n_nulls, n_distinct,
     min_numeric, max_numeric, min_text, max_text).

    DECIMAL columns profile as numeric via a double cast; other types
    (arrays, structs, binary) get null extremes but keep null/distinct
    counts."""
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(dtypes)
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(cols):
        dt = dtypes[c]
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn{i}")
        )
        distinct = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs.append(distinct.alias(f"__nd{i}"))
        if dt in _NUMERIC or dt.startswith("decimal"):
            lo = F.min(F.col(c)).cast("double")
            hi = F.max(F.col(c)).cast("double")
            ts, te = F.lit(None).cast("string"), F.lit(None).cast("string")
        elif dt == "string":
            lo = F.lit(None).cast("double")
            hi = F.lit(None).cast("double")
            ts, te = F.min(F.col(c)), F.max(F.col(c))
        elif dt.startswith("timestamp") or dt == "date":
            micros = F.unix_micros(F.col(c).cast("timestamp"))
            lo = F.min(micros).cast("double")
            hi = F.max(micros).cast("double")
            ts, te = F.lit(None).cast("string"), F.lit(None).cast("string")
        else:
            lo = F.lit(None).cast("double")
            hi = F.lit(None).cast("double")
            ts, te = F.lit(None).cast("string"), F.lit(None).cast("string")
        aggs += [
            lo.alias(f"__lo{i}"),
            hi.alias(f"__hi{i}"),
            ts.alias(f"__ts{i}"),
            te.alias(f"__te{i}"),
        ]
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__nn{i}").cast("bigint").alias("n_nulls"),
                F.col(f"__nd{i}").cast("bigint").alias("n_distinct"),
                F.col(f"__lo{i}").alias("min_numeric"),
                F.col(f"__hi{i}").alias("max_numeric"),
                F.col(f"__ts{i}").alias("min_text"),
                F.col(f"__te{i}").alias("max_text"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")
