from .contract import SchemaContract, apply_contract
from .dedup import exact_dedup

__all__ = ["SchemaContract", "apply_contract", "exact_dedup"]
