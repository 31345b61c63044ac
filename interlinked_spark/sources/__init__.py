from .readers import read_table, scan_path, table_provider
from .writers import write_table

__all__ = ["read_table", "scan_path", "table_provider", "write_table"]
