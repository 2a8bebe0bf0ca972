from .tables import load_table, table_path  # noqa: F401
from .sql import duckdb_factory, read_sql_query, validate_connection  # noqa: F401
