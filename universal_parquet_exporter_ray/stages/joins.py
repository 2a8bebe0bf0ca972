"""Join strategies (SURVEY.md §2.4).

Two physical plans, chosen by the pipeline author per join:

- ``broadcast_merge``: dimension-side broadcast. The small side is ``ray.put``
  once (driver) and each ``map_batches`` task merges against the
  shared-memory copy — NO shuffle. This is the 100 TB-scale plan whenever one
  side fits in the object store (nation/customer-style dims, lookup maps).
- ``Dataset.join``: Ray Data's hash-partitioned join for two large sides
  (both sides shuffled on the key).

Semi/anti joins broadcast the key set and filter inside ``map_batches``.
"""

from __future__ import annotations

from typing import Literal, Optional

import pandas as pd

import ray


def broadcast_merge(
    ds: "ray.data.Dataset",
    small: pd.DataFrame,
    *,
    left_on: list[str],
    right_on: Optional[list[str]] = None,
    how: Literal["inner", "left"] = "inner",
) -> "ray.data.Dataset":
    """Hash-free dimension join: ``small`` is shipped to the object store once
    and merged into every batch with a vectorized pandas merge."""
    ref = ray.put(small)
    right_keys = right_on or left_on

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(ref)  # zero-copy read from local object store
        out = batch.merge(
            dim, how=how, left_on=left_on, right_on=right_keys, sort=False
        )
        for rk, lk in zip(right_keys, left_on):
            if rk != lk and rk in out.columns:
                out = out.drop(columns=[rk])
        return out

    return ds.map_batches(merge, batch_format="pandas")


def broadcast_semi(
    ds: "ray.data.Dataset", keys: set, col: str, *, anti: bool = False
) -> "ray.data.Dataset":
    """Semi (or anti) join: broadcast the key set, filter per batch."""
    ref = ray.put(keys)

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        mask = batch[col].isin(ks)
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(filt, batch_format="pandas")
