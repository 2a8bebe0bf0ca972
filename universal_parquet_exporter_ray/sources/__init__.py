from .tables import load_table, table_path  # noqa: F401
