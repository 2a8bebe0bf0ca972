from .manifest import (  # noqa: F401
    completed_partitions,
    manifest_path,
    parts_path,
    read_manifest,
    sanitize_partition_id,
    write_atomic_parquet,
)
