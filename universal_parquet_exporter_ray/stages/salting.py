"""Partition-key assignment with salted keys for skew handling.

North rule: "explicit repartitioning and a groupby-on-repo shuffle with salted
keys handles skew from giant monorepos". A repo whose row count exceeds the
per-partition target is split into ``ceil(count / target)`` salt buckets; the
bucket of a row is a **deterministic** hash of its key columns
(``pd.util.hash_pandas_object`` — stable across processes, unlike Python's
``hash``), so retries and resume reassign identically.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd

from .encoder import PART_COL


def build_salt_map(key_counts: dict[str, int], target_rows: int) -> dict[str, int]:
    """partition-by value → number of salt buckets (≥1)."""
    return {k: max(1, math.ceil(c / target_rows)) for k, c in key_counts.items()}


def _stable_hash(df: pd.DataFrame, cols: list[str]) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for c in cols:
        h = h * np.uint64(1099511628211) + pd.util.hash_pandas_object(
            df[c], index=False
        ).to_numpy(dtype=np.uint64)
    return h


class AssignPartitions:
    """``map_batches`` stage adding the ``_part`` string column.

    - ``partition_by`` set: ``_part = f"{key}#{bucket}"`` with per-key salt
      from ``salt_map`` (hot keys get more buckets).
    - ``partition_by`` None: uniform hash of ``hash_cols`` into
      ``num_partitions`` buckets (``p00042`` style ids).
    """

    def __init__(
        self,
        partition_by: Optional[str],
        hash_cols: list[str],
        salt_map: Optional[dict[str, int]] = None,
        num_partitions: int = 16,
    ):
        self.partition_by = partition_by
        self.hash_cols = hash_cols
        self.salt_map = salt_map or {}
        self.num_partitions = num_partitions

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.partition_by is not None:
            keys = batch[self.partition_by].astype(str)
            salts = keys.map(lambda k: self.salt_map.get(k, 1)).to_numpy(dtype=np.uint64)
            buckets = np.zeros(len(batch), dtype=np.uint64)
            multi = salts > 1
            if multi.any():
                h = _stable_hash(batch, self.hash_cols)
                buckets = np.where(multi, h % np.maximum(salts, 1), 0)
            batch[PART_COL] = keys + "#" + pd.Series(buckets, index=batch.index).astype(str)
        else:
            h = _stable_hash(batch, self.hash_cols)
            b = (h % np.uint64(self.num_partitions)).astype(np.int64)
            batch[PART_COL] = pd.Series(b, index=batch.index).map(lambda i: f"p{i:05d}")
        return batch
