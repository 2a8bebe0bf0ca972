"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship columnar-encode pipeline on sf0.001.
``queries()`` — one callable per implemented operator/pipeline (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins with matching column names.

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable
from typing import Any

# make the package importable regardless of the caller's cwd
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry() -> Any:
    """Flagship: encode the sf0.001 ``documents`` table with the per-column
    codec engine, verify the round-trip, return the manifest dataframe."""
    from universal_parquet_exporter_ray.pipelines import encode_dataset, verify_roundtrip
    from universal_parquet_exporter_ray.sources import table_path

    src = table_path("/root/testdata/sf0.001", "documents")
    out = tempfile.mkdtemp(prefix="upxr_entry_")
    try:
        manifest = encode_dataset(
            src,
            out,
            partition_by="lang",
            hash_cols=["doc_id"],
            target_rows_per_partition=200,
        ).to_pandas()
        report = verify_roundtrip(src, out)
        manifest["verified"] = bool(report.ok.all())
        return manifest
    finally:
        shutil.rmtree(out, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from universal_parquet_exporter_ray.pipelines.relational import QUERIES as REL
    from universal_parquet_exporter_ray.pipelines.textops import QUERIES as TEXT

    return {**REL, **TEXT}


def oracle_sql() -> dict[str, str]:
    from universal_parquet_exporter_ray.pipelines.relational import ORACLE_SQL as REL
    from universal_parquet_exporter_ray.pipelines.textops import ORACLE_SQL as TEXT

    return {**REL, **TEXT}
