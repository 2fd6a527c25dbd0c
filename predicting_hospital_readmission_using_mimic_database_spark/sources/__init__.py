from .io import TABLES, read_table, read_tables, register_views, write_csv, write_parquet

__all__ = ["TABLES", "read_table", "read_tables", "register_views", "write_csv", "write_parquet"]
