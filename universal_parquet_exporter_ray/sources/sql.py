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

Tested against TWO live DB-API peers with different cursor/connection
semantics — DuckDB and stdlib sqlite3 — since no network database server
exists in this environment.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import ray.data


class ConnectError(RuntimeError):
    """Connection failure with the reference's enhanced-error contract: the
    message carries the original driver error plus diagnostic context
    (``sqlserver_connection.py:258-260,296`` builds a combined message rather
    than re-raising the raw driver exception)."""


def detect_drivers(
    candidates: dict[str, Callable[[], Any]],
    preference: Optional[Sequence[str]] = None,
) -> list[str]:
    """Probe a set of named connection factories and return the usable ones
    in preference order — the engine analogue of the reference's ODBC driver
    autodetect (``sqlserver_connection.py:29-59``): enumerate what the host
    actually has, order by a preferred-driver list, append any other working
    candidate after the preferred ones.

    A candidate is "available" if its factory can open and close a
    connection. Probes run driver-side (cheap, once per job), never inside
    Ray tasks."""
    available: list[str] = []
    usable = set()
    for name, factory in candidates.items():
        try:
            conn = factory()
            conn.close()
            usable.add(name)
        except Exception:
            continue
    for name in preference or ():
        if name in usable and name not in available:
            available.append(name)
    for name in candidates:
        if name in usable and name not in available:
            available.append(name)
    return available


def connect_with_recovery(
    connection_factory: Callable[[], Any],
    *,
    is_recoverable: Optional[Callable[[Exception], bool]] = None,
    apply_patch: Optional[Callable[[], Callable[[], None]]] = None,
) -> Any:
    """Open a connection with the reference's one-shot patch-and-retry
    protocol (``sqlserver_connection.py:263-298``): attempt normally; if the
    failure matches a recoverable-error classifier (there: the macOS OpenSSL
    TLS signature, ``:92-105``), apply an environment patch, retry exactly
    once, and undo the patch if the retry also fails; all failures raise
    ``ConnectError`` with the combined original + retry detail.

    ``apply_patch`` returns a cleanup callable (the reference tracks its
    OpenSSL config tempfile the same way, ``:27,284``)."""
    try:
        return connection_factory()
    except Exception as first:
        if is_recoverable is None or apply_patch is None or not is_recoverable(first):
            raise ConnectError(f"connection failed: {first}") from first
        cleanup = apply_patch()
        try:
            return connection_factory()
        except Exception as second:
            try:
                cleanup()
            except Exception:
                pass
            raise ConnectError(
                "connection failed even with recovery patch: "
                f"{second}\n\nOriginal error: {first}\n\n"
                "This suggests the issue is not the patched compatibility "
                "problem; check server configuration and connectivity."
            ) from second


def validate_prerequisites(
    candidates: dict[str, Callable[[], Any]],
    preference: Optional[Sequence[str]] = None,
) -> dict[str, Any]:
    """Preflight diagnostics before any task is scheduled — reference
    ``validate_connection_prerequisites`` (``sqlserver_connection.py:300-347``):
    which drivers exist, which one would be used."""
    available = detect_drivers(candidates, preference)
    return {
        "drivers_available": available,
        "recommended_driver": available[0] if available else None,
        "ok": bool(available),
    }


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


def select_factory(
    candidates: dict[str, Callable[[], Any]],
    preference: Optional[Sequence[str]] = None,
) -> tuple[str, Callable[[], Any]]:
    """Pick the best available connection factory (reference behavior: use
    the first driver from the autodetected preference-ordered list,
    ``sqlserver_connection.py:238-246``). Raises ``ConnectError`` listing the
    probed candidates when none works."""
    available = detect_drivers(candidates, preference)
    if not available:
        probed = ", ".join(candidates) if candidates else "(none given)"
        raise ConnectError(f"no usable connection factory among candidates: {probed}")
    name = available[0]
    return name, candidates[name]


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


def sqlite_factory(db_path: str, read_only: bool = True) -> Callable[[], Any]:
    """Picklable DB-API connection factory for a stdlib ``sqlite3`` file
    database — a SECOND live engine with genuinely different connection
    semantics than DuckDB (URI-mode read-only open that fails on a missing
    file instead of creating one; per-thread connection checks relaxed for
    Ray's task threads), proving ``read_sql_query``/``validate_connection``
    are engine-agnostic the way the reference's driver autodetect is
    (``sqlserver_connection.py:29-59``)."""

    def factory():
        import sqlite3

        if read_only:
            return sqlite3.connect(
                f"file:{db_path}?mode=ro", uri=True, check_same_thread=False
            )
        return sqlite3.connect(db_path, check_same_thread=False)

    return factory
