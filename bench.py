"""Benchmark driver (driver contract + BASELINE.md numbers).

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line.

``--scaling``: run the headline encode job twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input (sandbox stand-in for N vs 4N
node clusters) and report both throughputs + scaling efficiency.

The encode benchmark input is the deterministic synthetic source_files table
(FIXTURES.md §1), generated once into /tmp and cached; generation is excluded
from timing.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("UPXR_BENCH_ROWS", "200000"))
FIXTURE = f"/tmp/upxr_bench/source_files_{BENCH_ROWS}.parquet"


def _gen_fixture() -> str:
    from universal_parquet_exporter_ray.datagen import write_source_files

    return write_source_files(FIXTURE, BENCH_ROWS)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    src = _gen_fixture()
    input_bytes = os.path.getsize(src)

    from universal_parquet_exporter_ray.pipelines import encode_dataset
    from universal_parquet_exporter_ray.pipelines.relational import QUERIES as REL
    from universal_parquet_exporter_ray.pipelines.textops import QUERIES as TEXT

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq

    pq.read_table(src)

    timings: dict[str, float] = {}

    # headline: columnar encode of the source-code table
    out = f"/tmp/upxr_bench/out_{NUM_CPUS}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = encode_dataset(
        src,
        out,
        partition_by="repo",
        hash_cols=["path"],
        target_rows_per_partition=max(2000, BENCH_ROWS // 64),
        concurrency=(1, NUM_CPUS),
    ).to_pandas()
    timings["encode_source_files"] = time.perf_counter() - t0
    uncompressed = int(manifest.input_bytes.sum())
    encoded = int(manifest.encoded_bytes.sum())

    # representative relational / text pipelines over $GRAFT_SF_DIR
    def consume(res):
        import pandas as pd

        if isinstance(res, pd.DataFrame):
            return len(res)
        try:
            return res.count()  # ray Dataset
        except AttributeError:
            return res.num_rows  # pyarrow table

    for name in [
        "group_agg",
        "join_multiway",
        "window_agg",
        "topk",
        "rank_partitioned",
        "dedup_exact",
        "token_count",
        "minhash_lsh_pairs",
        "ann_topk",
    ]:
        fn = REL.get(name) or TEXT.get(name)
        t0 = time.perf_counter()
        consume(fn(SF_DIR))
        timings[name] = time.perf_counter() - t0

    total = sum(timings.values())
    result = {
        "metric": "headline pipelines wall time (encode + relational/text suite)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "encode": {
            "rows": int(manifest.n_rows.sum()),
            "input_bytes_arrow": uncompressed,
            "encoded_bytes": encoded,
            "compression_ratio": round(encoded / max(1, uncompressed), 4),
            "parquet_file_bytes": input_bytes,
            "throughput_MBps": round(
                uncompressed / 1e6 / timings["encode_source_files"], 2
            ),
            "rows_per_s": round(
                int(manifest.n_rows.sum()) / timings["encode_source_files"]
            ),
            "partitions": len(manifest),
        },
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same encode job, fresh processes, 8 vs 32 CPUs (N vs 4N stand-in)."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    thr8 = results[8]["encode"]["throughput_MBps"]
    thr32 = results[32]["encode"]["throughput_MBps"]
    eff = thr32 / (4 * thr8)
    return {
        "metric": "encode throughput scaling (8 vs 32 CPUs, fresh sessions)",
        "throughput_MBps_8": thr8,
        "throughput_MBps_32": thr32,
        "sec_8": results[8]["queries"]["encode_source_files"],
        "sec_32": results[32]["queries"]["encode_source_files"],
        "scaling_efficiency": round(eff, 3),
        "rows": results[32]["encode"]["rows"],
        "compression_ratio": results[32]["encode"]["compression_ratio"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
