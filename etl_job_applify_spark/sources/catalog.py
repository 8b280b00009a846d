"""Catalog listing across SQL dialects (reference parity: S6,
services/data_source.py:113-134).

The reference ships a dialect-specific ``information_schema`` subquery as
the JDBC relation; same map here, plus the Spark-catalog path for tables
Spark itself manages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: dialect → catalog query returning one column ``table_name``
LIST_TABLES_SQL = {
    "mysql": (
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = '{database}'"
    ),
    "postgres": (
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = 'public'"
    ),
    "mssql": (
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_type = 'BASE TABLE'"
    ),
    "oracle": "SELECT table_name FROM user_tables",
    # Derby has no information_schema; sys.systables, 'T' = user tables
    "derby": (
        "SELECT tablename AS table_name FROM sys.systables "
        "WHERE tabletype = 'T'"
    ),
}


def list_tables_sql(dialect: str, database: str = "") -> str:
    if dialect not in LIST_TABLES_SQL:
        raise ValueError(f"unknown dialect {dialect!r}")
    return LIST_TABLES_SQL[dialect].format(database=database)


def show_tables(spark: SparkSession, source, database: str = "") -> DataFrame:
    """Table listing for a JdbcSource via pushed catalog query."""
    return source.read_query(spark, list_tables_sql(source.dialect, database))


def table_names(df: DataFrame) -> list[str]:
    """Driver-side collect of the name column (reference T4 did this via
    an RDD flatMap — lambda_function.py:162; plain collect is idiomatic)."""
    return [r[0] for r in df.select("table_name").collect()]
