from .readers import (
    read_binary,
    read_csv,
    read_orc,
    read_json,
    read_parquet,
    read_text,
    read_xml,
    load_table,
    load_tables,
    register_views,
    TABLES,
)
from .jdbc import JdbcSource, jdbc_reader_options
from .catalog import list_tables_sql, show_tables

__all__ = [
    "read_binary",
    "read_csv",
    "read_orc",
    "read_json",
    "read_parquet",
    "read_text",
    "read_xml",
    "load_table",
    "load_tables",
    "register_views",
    "TABLES",
    "JdbcSource",
    "jdbc_reader_options",
    "list_tables_sql",
    "show_tables",
]
