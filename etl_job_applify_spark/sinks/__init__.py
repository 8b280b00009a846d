from .writers import write_parquet, write_jdbc
from .upsert import upsert

__all__ = ["write_parquet", "write_jdbc", "upsert"]
