from .tables import TABLES, load_table, register_views, run_sql

__all__ = ["TABLES", "load_table", "register_views", "run_sql"]
