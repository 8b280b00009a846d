from .writers import write_csv, write_json, write_parquet, write_jdbc, write_xml
from .upsert import upsert
from .versioned import list_versions, read_table, write_version

__all__ = ["write_csv", "write_json", "write_parquet", "write_jdbc", "write_xml", "upsert",
           "write_version", "read_table", "list_versions"]
