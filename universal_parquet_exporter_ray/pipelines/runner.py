"""Export-run orchestrator: the engine's analogue of the reference's
"advanced integration" entry point
(``/root/reference/examples/advanced_integration_example.py:117-328``):

    config → validate → build run dir → for each named query:
    run → write parquet → record outcome → write summary parquet

Reference semantics kept:
- a **named query registry** (dict name → pipeline) (:156-263);
- **per-query error isolation**: one failing export doesn't abort the run;
  outcomes are recorded per query (:102-114, :266-279);
- a **run summary written as its own Parquet** (:283-297) — here one row
  per query with rows/bytes/wall/status;
- run directories are named by a caller-supplied ``run_id`` instead of
  wall-clock (:37-51) so workers stay deterministic and reruns are
  non-destructive.
"""

from __future__ import annotations

import os
import time
import traceback
from typing import Any, Callable, Mapping

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _result_to_table(res: Any) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    # ray.data.Dataset — registry results are small by construction; big
    # exports never come through here (see _write_result: a Dataset above
    # the row threshold streams via write_parquet instead)
    return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)


# above this row count a Dataset result is streamed to a parquet DIRECTORY
# by the workers (ds.write_parquet) instead of being driver-materialized
STREAM_THRESHOLD_ROWS = 5_000_000


def _write_result(res: Any, path: str) -> tuple[int, int, str]:
    """Write one query result; returns (rows, bytes, written_path).

    Datasets larger than ``STREAM_THRESHOLD_ROWS`` stream straight from the
    workers into a partitioned parquet directory — the driver only sees
    counts. Small results take the atomic single-file path."""
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.materialize()  # object-store blocks (spillable), not driver
        n = res.count()
        if n > STREAM_THRESHOLD_ROWS:
            out_dir = path[: -len(".parquet")]
            res.write_parquet(out_dir)
            size = sum(
                os.path.getsize(os.path.join(out_dir, f))
                for f in os.listdir(out_dir)
            )
            return n, size, out_dir
    table = _result_to_table(res)
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return table.num_rows, os.path.getsize(path), path


def run_export(
    queries: Mapping[str, Callable[[], Any]],
    out_root: str,
    run_id: str,
) -> pd.DataFrame:
    """Run every named pipeline, writing ``<out_root>/<run_id>/<name>.parquet``
    per query and ``export_summary.parquet`` at the end; returns the summary.

    Each callable takes no arguments (bind sf_dir etc. with functools.partial
    or a lambda). Failures are caught per query and recorded, never raised.
    """
    run_dir = os.path.join(out_root, run_id)
    os.makedirs(run_dir, exist_ok=True)
    rows = []
    for name, fn in queries.items():
        t0 = time.monotonic()
        path = os.path.join(run_dir, f"{name}.parquet")
        try:
            n_rows, n_bytes, _ = _write_result(fn(), path)
            rows.append(
                {
                    "query": name,
                    "status": "ok",
                    "rows": n_rows,
                    "file_bytes": n_bytes,
                    "wall_s": time.monotonic() - t0,
                    "error": "",
                }
            )
        except Exception as e:  # per-query isolation (reference :112-114)
            rows.append(
                {
                    "query": name,
                    "status": "error",
                    "rows": 0,
                    "file_bytes": 0,
                    "wall_s": time.monotonic() - t0,
                    "error": f"{type(e).__name__}: {e}"[:500],
                }
            )
            traceback.print_exc()
    summary = pd.DataFrame(rows)
    n_ok = int((summary.status == "ok").sum())
    summary_meta = summary.assign(
        run_id=run_id,
        total_queries=len(rows),
        successful=n_ok,
        success_rate=round(100.0 * n_ok / max(1, len(rows)), 2),
    )
    spath = os.path.join(run_dir, "export_summary.parquet")
    tmp = spath + f".tmp{os.getpid()}"
    summary_meta.to_parquet(tmp, index=False)
    os.replace(tmp, spath)
    return summary_meta
