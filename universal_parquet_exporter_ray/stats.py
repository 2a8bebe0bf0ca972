"""Per-column sampled statistics driving codec auto-selection.

North rule: "a per-column auto-selector driven by sampled cardinality /
run-length / entropy statistics". Stats are computed on a bounded sample
(vectorized pyarrow/numpy; no per-row Python) and are advisory: the selector
uses them to prune the candidate list before trial-encoding (selector.py).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs.base import combine, is_int_like, is_string_like


@dataclass
class ColumnStats:
    n: int
    n_nulls: int
    n_distinct: int          # exact on the sample
    distinct_ratio: float
    avg_run_len: float       # mean length of equal-value runs
    byte_entropy: float      # Shannon entropy (bits/byte) of the value bytes
    avg_len: float           # mean string length (0 for non-strings)
    total_bytes: int

    def to_dict(self) -> dict:
        return asdict(self)


def column_stats(arr: pa.Array | pa.ChunkedArray, max_sample: int = 4096) -> ColumnStats:
    arr = combine(arr)
    n_full = len(arr)
    if n_full > max_sample:
        # deterministic stride sample (no RNG in workers)
        step = n_full // max_sample
        idx = pa.array(np.arange(0, n_full, step, dtype=np.int64)[:max_sample])
        sample = combine(arr.take(idx))
    else:
        sample = arr
    n = len(sample)
    n_nulls = sample.null_count
    if n == 0 or n_nulls == n:
        return ColumnStats(n, n_nulls, 0, 0.0, float(n), 0.0, 0.0, int(arr.nbytes))
    if pa.types.is_nested(sample.type) or pa.types.is_dictionary(sample.type):
        # list/struct/map: pc.unique / not_equal have no kernels — emit
        # neutral stats; the selector routes nested types to zstd/plain
        return ColumnStats(n, n_nulls, n, 1.0, 1.0, 8.0, 0.0, int(arr.nbytes))
    vals = sample.drop_null() if n_nulls else sample
    n_distinct = len(pc.unique(vals))
    # run lengths over the sample (order-sensitive; stride sampling underestimates
    # runs, which only makes the selector conservative about RLE)
    m = len(vals)
    if m > 1:
        neq = pc.not_equal(vals.slice(1), vals.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        )
        n_runs = 1 + int(np.count_nonzero(neq))
    else:
        n_runs = m
    avg_run = m / max(1, n_runs)
    # byte entropy of the raw value bytes
    if is_string_like(vals.type):
        bufs = combine(vals).buffers()
        raw = bufs[2].to_pybytes() if bufs[2] is not None else b""
        avg_len = len(raw) / max(1, m)
    elif pa.types.is_decimal(vals.type):
        raw = b""  # to_numpy gives Decimal objects; pointer bytes are noise
        avg_len = 0.0
    else:
        try:
            raw = vals.cast(pa.int64()).to_numpy(zero_copy_only=False).tobytes() if is_int_like(vals.type) else vals.to_numpy(zero_copy_only=False).tobytes()
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            raw = b""
        avg_len = 0.0
    if raw:
        counts = np.bincount(np.frombuffer(raw, dtype=np.uint8), minlength=256)
        p = counts[counts > 0] / len(raw)
        entropy = float(-(p * np.log2(p)).sum())
    else:
        entropy = 0.0
    return ColumnStats(
        n=n,
        n_nulls=n_nulls,
        n_distinct=n_distinct,
        distinct_ratio=n_distinct / max(1, m),
        avg_run_len=avg_run,
        byte_entropy=entropy,
        avg_len=avg_len,
        total_bytes=int(arr.nbytes),
    )
