"""The flagship pipeline: Parquet → salted partitioning → per-partition
columnar encode (codec auto-selection) → manifest dataset, with
checkpoint/resume.

Ray-Data shape (idiomatic, streaming, no full materialization):

    read_parquet(...)                        # column-pruned scan
      .map_batches(AssignPartitions, pandas) # deterministic salted key
      .map_batches(filter completed)         # resume: drop finished partitions
      .groupby(_part)                        # the ONE all-to-all shuffle
      .map_groups(PartitionEncoder, pyarrow) # stateful encode + atomic write
    → manifest Dataset (one tiny row per partition)

Scale notes (designed for a 256-node / 100 TB run, tested single-node):
- the only shuffle is the salted groupby; salting bounds any single
  partition to ~target_rows even for monorepo hot keys;
- the small key-count table for the salt map comes from a groupby-count over
  ONLY the partition column (column-pruned), then is broadcast inside the
  AssignPartitions stage (closure → ray.put'd once), never per batch;
- outputs are one directory per partition + a one-row manifest file, so a
  killed run resumes by skipping manifested partitions (anti-join in
  ``map_batches`` against the broadcast completed-set).

Reference semantics kept: empty input raises ``ValueError`` exactly like the
reference writer (``/root/reference/src/export/parquet_writer.py:10-11``).
"""

from __future__ import annotations

import os
from typing import Optional, Union

import pyarrow as pa

import ray.data

from ..stages.encoder import PART_COL, MANIFEST_SCHEMA, PartitionEncoder
from ..stages.salting import AssignPartitions, build_partition_plan
from ..state.manifest import completed_partitions, read_manifest, sanitize_partition_id

DatasetLike = Union[str, "ray.data.Dataset"]


def _to_dataset(source: DatasetLike, columns: Optional[list[str]] = None):
    if isinstance(source, str):
        return ray.data.read_parquet(source, columns=columns)
    return source


def default_pool_size() -> int:
    """Fixed-size actor pool sized to the cluster: CPUs minus headroom for
    the read/assign tasks (an autoscaling (1, N) pool ramps up too slowly
    for short jobs)."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(1, cpus - 1)


def make_assigner(
    ds: "ray.data.Dataset",
    partition_by: Optional[str],
    hash_cols: list[str],
    target_rows: int,
    num_partitions: Optional[int] = None,
) -> AssignPartitions:
    """Build the deterministic partition assigner. With ``partition_by``: a
    column-pruned groupby-count feeds the salt/merge plan (hot keys split,
    small keys bin-packed); the plan dict broadcasts with the stage closure."""
    if partition_by is not None:
        counts = (
            ds.select_columns([partition_by]).groupby(partition_by).count().to_pandas()
        )
        key_counts = dict(
            zip(counts[partition_by].astype(str), counts["count()"].astype(int))
        )
        salt_map, merge_map = build_partition_plan(key_counts, target_rows)
        assign = AssignPartitions(partition_by, hash_cols, salt_map, 16, merge_map)
        assign.total_rows = int(sum(key_counts.values()))
        return assign
    total = ds.count()
    if num_partitions is None:
        num_partitions = max(1, -(-total // target_rows))
    assign = AssignPartitions(None, hash_cols, None, num_partitions)
    assign.total_rows = total
    return assign


def encode_dataset(
    source: DatasetLike,
    out_dir: str,
    *,
    partition_by: Optional[str] = None,
    hash_cols: Optional[list[str]] = None,
    target_rows_per_partition: int = 100_000,
    num_partitions: Optional[int] = None,
    resume: bool = True,
    concurrency: Optional[int] = None,
    lineage: Optional[dict] = None,
) -> "ray.data.Dataset":
    """Encode ``source`` into ``out_dir``; returns the manifest Dataset.

    ``partition_by``: column giving partitions locality (e.g. ``repo``);
    hot values are salted into multiple buckets. ``hash_cols`` break ties
    deterministically (default: first column).
    """
    from ..context import tune_for_cluster

    tune_for_cluster()
    ds = _to_dataset(source)
    schema = ds.schema()
    if hash_cols is None:
        hash_cols = [schema.names[0]]

    assign = make_assigner(
        ds, partition_by, hash_cols, target_rows_per_partition, num_partitions
    )
    if assign.total_rows == 0:
        # reference semantic: refuse empty export (parquet_writer.py:10-11)
        raise ValueError("No data to write")
    if partition_by is None and num_partitions is None:
        num_partitions = assign.num_partitions
    ds = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    if resume:
        done = completed_partitions(out_dir)
        if done:
            raw_done = set(done)

            def drop_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                keep = [
                    sanitize_partition_id(v) not in raw_done
                    for v in batch[PART_COL].to_pylist()
                ]
                return batch.filter(pa.array(keep))

            ds = ds.map_batches(drop_done, batch_format="pyarrow")

    src_desc = source if isinstance(source, str) else "<dataset>"
    full_lineage = {
        **(lineage or {}),
        "source": str(src_desc),
        # partitioning config recorded so verify/resume can reconstruct
        # the identical deterministic assignment
        "partition_by": partition_by,
        "hash_cols": hash_cols,
        "target_rows": target_rows_per_partition,
        "num_partitions": num_partitions,
    }
    # callable CLASS → actor pool: codec registry + lineage built once per
    # actor, reused across all partitions that actor encodes
    manifest = ds.groupby(PART_COL).map_groups(
        PartitionEncoder,
        fn_constructor_kwargs={"out_dir": out_dir, "lineage": full_lineage},
        batch_format="pyarrow",
        concurrency=concurrency or default_pool_size(),
    )
    # materialize the (tiny — one row per partition) manifest so the encode
    # actually executes; the big data only ever streamed through workers.
    mrows = manifest.to_pandas()
    del mrows
    os.makedirs(out_dir, exist_ok=True)
    return ray.data.from_arrow(read_manifest(out_dir).cast(MANIFEST_SCHEMA))


def read_encoded(out_dir: str) -> "ray.data.Dataset":
    """Dataset of encoded column-blob rows (all partitions)."""
    from ..state.manifest import parts_path

    return ray.data.read_parquet(os.path.join(parts_path(out_dir)))
