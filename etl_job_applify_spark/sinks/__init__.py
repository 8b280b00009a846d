from .writers import write_csv, write_json, write_parquet, write_jdbc
from .upsert import upsert

__all__ = ["write_csv", "write_json", "write_parquet", "write_jdbc", "upsert"]
