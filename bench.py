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
# the scaling criterion needs a compute-dominated job: a 200k-row encode
# finishes in seconds of scheduling overhead at 32 CPUs and measures noise
SCALING_ROWS = int(os.environ.get("UPXR_SCALING_ROWS", "4000000"))
FIXTURE = f"/tmp/upxr_bench/source_files_{BENCH_ROWS}.parquet"
SCALING_FIXTURE = f"/tmp/upxr_bench/source_files_dir_{SCALING_ROWS}"


def _gen_fixture() -> str:
    from universal_parquet_exporter_ray.datagen import write_source_files

    return write_source_files(FIXTURE, BENCH_ROWS)


def _gen_scaling_fixture() -> str:
    from universal_parquet_exporter_ray.datagen import write_source_files_parallel

    return write_source_files_parallel(SCALING_FIXTURE, SCALING_ROWS)


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
        concurrency=max(1, NUM_CPUS - 2),
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


def run_encode_only() -> dict:
    """Encode the scaling fixture only; one JSON line. Used by --scaling."""
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
    src = _gen_scaling_fixture()
    # warm the page cache (untimed) so both parallelism levels measure
    # compute + shuffle rather than the first cold disk read
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            with open(os.path.join(src, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    from universal_parquet_exporter_ray.pipelines import encode_dataset

    out = f"/tmp/upxr_bench/scal_out_{NUM_CPUS}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = encode_dataset(
        src,
        out,
        partition_by="repo",
        hash_cols=["path"],
        target_rows_per_partition=max(4000, SCALING_ROWS // 256),
        concurrency=max(1, NUM_CPUS - 2),
    ).to_pandas()
    wall = time.perf_counter() - t0
    uncompressed = int(manifest.input_bytes.sum())
    result = {
        "mode": "encode_only",
        "num_cpus": NUM_CPUS,
        "sec": round(wall, 2),
        "rows": int(manifest.n_rows.sum()),
        "input_bytes_arrow": uncompressed,
        "encoded_bytes": int(manifest.encoded_bytes.sum()),
        "compression_ratio": round(
            manifest.encoded_bytes.sum() / max(1, uncompressed), 4
        ),
        "throughput_MBps": round(uncompressed / 1e6 / wall, 2),
        "partitions": len(manifest),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same encode job, fresh processes, 8 vs 32 CPUs (sandbox stand-in for
    N vs 4N node clusters per the driver instruction)."""
    # pre-generate the fixture once at full parallelism
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    _gen_scaling_fixture()
    ray.shutdown()

    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--encode-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    thr8 = results[8]["throughput_MBps"]
    thr32 = results[32]["throughput_MBps"]
    eff = thr32 / (4 * thr8)
    return {
        "metric": "encode throughput scaling (8 vs 32 CPUs, fresh sessions)",
        "rows": results[32]["rows"],
        "input_bytes_arrow": results[32]["input_bytes_arrow"],
        "throughput_MBps_8": thr8,
        "throughput_MBps_32": thr32,
        "sec_8": results[8]["sec"],
        "sec_32": results[32]["sec"],
        "scaling_efficiency": round(eff, 3),
        "compression_ratio": results[32]["compression_ratio"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--encode-only" in sys.argv:
        print(json.dumps(run_encode_only()))
    else:
        print(json.dumps(run_bench()))
