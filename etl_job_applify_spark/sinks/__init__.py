from .writers import write_csv, write_json, write_parquet, write_jdbc, write_xml
from .upsert import upsert

__all__ = ["write_csv", "write_json", "write_parquet", "write_jdbc", "write_xml", "upsert"]
