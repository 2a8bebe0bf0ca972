"""DB-source ingestion: ``ray.data.read_sql`` over a DB-API connection
factory — the engine analogue of the reference's live-database extract path
(``/root/reference/src/database/mysql_connection.py:11-18`` MySQL connector,
``/root/reference/src/database/sqlserver_connection.py:238-298`` SQL Server
with driver autodetect/retry, ``/root/reference/src/query/query_executor.py:8-37``
cursor-per-query execution with guaranteed cursor close).

Design mapping:
- the reference's per-query cursor lifecycle (open → execute → fetchall →
  close in ``finally``) becomes Ray task semantics: each read task opens its
  own connection via the picklable factory, and Ray's task retry replaces
  the reference's connection-retry loop;
- preflight validation (``sqlserver_connection.py:300-347``) becomes
  ``validate_connection`` below: open a connection, run the probe query,
  close — failing fast on the driver before any task is scheduled;
- results land as a Dataset of Arrow batches instead of the reference's
  list-of-dicts (its row-dict normalization, SURVEY §2 M10, is subsumed by
  Arrow columns).

Tested against DuckDB as the DB-API peer (sqlite-compatible layout) — no
network/database server exists in this environment.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import ray.data


def validate_connection(connection_factory: Callable[[], Any], probe_sql: str = "SELECT 1") -> None:
    """Preflight: open one connection, run a probe, close. Mirrors the
    reference's connection validation (fail fast on the driver, not in a
    scheduled task)."""
    conn = connection_factory()
    try:
        cur = conn.cursor()
        try:
            cur.execute(probe_sql)
            cur.fetchall()
        finally:
            cur.close()
    finally:
        conn.close()


def read_sql_query(
    sql: str,
    connection_factory: Callable[[], Any],
    *,
    validate: bool = True,
    shard_keys: Optional[list[str]] = None,
    shard_hash_fn: str = "hash",
    parallelism: int = -1,
) -> "ray.data.Dataset":
    """Extract a SQL query into a Dataset (reference
    ``QueryExecutor.execute_query`` semantics, distributed).

    ``shard_keys``/``shard_hash_fn``: optional server-side sharding — when
    given, Ray issues one query per shard (``WHERE hash(keys) % n = i``) so
    a large extract parallelizes instead of streaming through one cursor.
    """
    if validate:
        validate_connection(connection_factory)
    kwargs: dict = {}
    if shard_keys:
        kwargs.update(shard_keys=shard_keys, shard_hash_fn=shard_hash_fn)
        if parallelism and parallelism > 0:
            kwargs.update(parallelism=parallelism)
    return ray.data.read_sql(sql, connection_factory, **kwargs)


def duckdb_factory(db_path: str, read_only: bool = True) -> Callable[[], Any]:
    """Picklable DB-API connection factory for a DuckDB file database —
    the sandbox stand-in for the reference's MySQL/SQL Server connections
    (multiple read tasks open the file concurrently in read-only mode)."""

    def factory():
        import duckdb

        return duckdb.connect(db_path, read_only=read_only)

    return factory
