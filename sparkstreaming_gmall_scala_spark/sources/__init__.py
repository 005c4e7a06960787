from .tables import TABLES, load_table, read_parquet_memo, register_views, run_sql

__all__ = ["TABLES", "load_table", "read_parquet_memo", "register_views", "run_sql"]
