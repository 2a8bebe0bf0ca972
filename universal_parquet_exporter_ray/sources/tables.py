"""Table loading over the driver-provided Parquet test tables (TESTDATA.md).

The engine's source role — replacing the reference's DB connectors
(``/root/reference/src/database/mysql_connection.py:11-18``,
``sqlserver_connection.py:238-298``) — is a column-pruned
``ray.data.read_parquet``; connection validation becomes path/schema
validation at pipeline build time.
"""

from __future__ import annotations

import os
from typing import Optional

import ray.data

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def table_path(sf_dir: str, name: str) -> str:
    p = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(p):
        raise FileNotFoundError(f"table {name!r} not found under {sf_dir}")
    return p


def load_table(
    sf_dir: str, name: str, columns: Optional[list[str]] = None
) -> "ray.data.Dataset":
    """Column-pruned Parquet scan of one logical table."""
    from ..context import tune_for_cluster

    tune_for_cluster()
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns)
