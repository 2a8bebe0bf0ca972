"""Codec auto-selector: stats-pruned candidate list → trial-encode a sample →
pick the smallest (cost-factor adjusted) → return (codec, trained state).

The selected codec then encodes the full column chunk; FSST symbol tables
trained here are reused (north rule: per-partition symbol-table reuse).
The zstd candidate is always in the list, which guarantees the encoded size
can always fall back to ≤ general-purpose compression (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import pyarrow as pa

from .codecs.base import combine, get_codec, is_int_like, is_string_like
from .stats import ColumnStats, column_stats

TRIAL_ROWS = 2048


@dataclass
class CodecChoice:
    codec: str
    state: Any
    trial_bytes: int
    stats: ColumnStats


def candidate_codecs(t: pa.DataType, stats: ColumnStats) -> list[str]:
    """Stats-driven pruning of the trial list (cheap gates, not final says)."""
    if stats.n_distinct <= 1 and stats.n_nulls == 0:
        return ["constant"]
    cands: list[str] = []
    if is_string_like(t):
        if stats.distinct_ratio < 0.5:
            cands.append("dict")
        if stats.avg_run_len >= 1.5:
            cands.append("rle")
        # FSST pays off on shortish strings with sub-maximal byte entropy;
        # skip the slow trial when the column is essentially random bytes.
        if stats.byte_entropy < 6.5 and stats.avg_len <= 4096:
            cands.append("fsst")
            cands.append("fsst_zstd")
        cands.append("zstd")
    elif is_int_like(t):
        cands.append("forpack")
        if stats.avg_run_len >= 1.5:
            cands.append("rle")
        if stats.distinct_ratio < 0.1:
            cands.append("dict")
        cands.append("zstd")
    elif pa.types.is_floating(t):
        if stats.avg_run_len >= 1.5:
            cands.append("rle")
        cands.append("zstd")
    else:
        cands.append("zstd")
        cands.append("plain")
    return cands


def select_codec(
    arr: pa.Array | pa.ChunkedArray, stats: Optional[ColumnStats] = None
) -> CodecChoice:
    arr = combine(arr)
    if stats is None:
        stats = column_stats(arr)
    n = len(arr)
    if n > TRIAL_ROWS:
        step = n // TRIAL_ROWS
        idx = pa.array(np.arange(0, n, step, dtype=np.int64)[:TRIAL_ROWS])
        sample = combine(arr.take(idx))
    else:
        sample = arr
    sample_nn = sample.drop_null() if sample.null_count else sample
    if len(sample_nn) == 0:
        return CodecChoice("plain", None, 0, stats)
    best_name, best_state, best_size = "plain", None, None
    for name in candidate_codecs(arr.type, stats):
        codec = get_codec(name)
        try:
            state = codec.train(sample_nn)
            enc = codec.encode(sample_nn, state=state)
            size = int(len(enc.payload) * codec.cost_factor)
        except Exception:
            continue
        if best_size is None or size < best_size:
            best_name, best_state, best_size = name, state, size
    if best_size is None:
        enc = get_codec("plain").encode(sample_nn)
        best_size = len(enc.payload)
    return CodecChoice(best_name, best_state, int(best_size), stats)
