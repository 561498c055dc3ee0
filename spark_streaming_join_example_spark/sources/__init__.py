from .batch import load_table, table_path

__all__ = ["load_table", "table_path"]
