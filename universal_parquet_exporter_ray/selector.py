"""Codec auto-selector: stats-pruned candidate list → trial-encode a sample →
pick the smallest (cost-factor adjusted) → return (codec, trained state).

The selected codec then encodes the full column chunk; FSST symbol tables
trained here are reused (north rule: per-partition symbol-table reuse).
The zstd candidate is always in the list, which guarantees the encoded size
can always fall back to ≤ general-purpose compression (SURVEY.md §7.4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
        # skip the slow trial when the column is essentially random bytes OR
        # low-cardinality enough that dictionary encoding dominates anyway.
        if (
            stats.byte_entropy < 6.5
            and stats.avg_len <= 4096
            and stats.n_distinct > 64
        ):
            cands.append("fsst2")  # vectorized pairs-only variant, no penalty
            cands.append("fsst")
            cands.append("fsst_zstd")
        cands.append("zstd")
        # level-3 twin: wins (via its 0.93 cost bonus) whenever level 6 buys
        # <7% extra size — the dominant source-text case, where level 3
        # encodes 2.6× faster per core and stresses memory bandwidth far
        # less under 16-way concurrency (see Zstd3Codec docstring)
        cands.append("zstd3")
        # level-2 fast twin (0.83 cost bonus): another 1.5× per-core speedup
        # on source text at +9.7% size, and strictly better than level 3 on
        # hex ids. UPXR_ZSTD2=0 restores the level-3-only candidate set
        # (kept for A/B; see Zstd2Codec docstring for the measurements).
        if os.environ.get("UPXR_ZSTD2", "1") == "1":
            cands.append("zstd2")
    elif is_int_like(t):
        cands.append("forpack")
        cands.append("delta")
        cands.append("bshuf_zstd")
        if stats.avg_run_len >= 1.5:
            cands.append("rle")
        if stats.distinct_ratio < 0.1:
            cands.append("dict")
        cands.append("zstd")
    elif pa.types.is_floating(t):
        if stats.avg_run_len >= 1.5:
            cands.append("rle")
        cands.append("alp")
        cands.append("bshuf_zstd")
        cands.append("zstd")
    else:
        from .codecs.vector import _is_vector_type

        if _is_vector_type(t):
            # numeric list columns (embedding vectors): byte-shuffling the
            # flat values beats whole-array IPC+zstd (0.85 vs 0.94 measured)
            cands.append("vec_bshuf_zstd")
        cands.append("zstd")
        cands.append("plain")
    return cands


TRIAL_STRING_BYTES = 64 * 1024
TRIAL_MIN_ROWS = 64


def _cap_string_sample(sample: pa.Array) -> pa.Array:
    """Cap a string trial sample by BYTES, not rows: FSST/zstd trial cost is
    linear in bytes and a 2048-row code-text sample can be megabytes."""
    lens = pc.binary_length(sample).to_numpy(zero_copy_only=False)
    cum = np.cumsum(lens)
    k = int(np.searchsorted(cum, TRIAL_STRING_BYTES)) + 1
    k = max(TRIAL_MIN_ROWS, min(k, len(sample)))
    return sample.slice(0, k)


def select_codec(
    arr: pa.Array | pa.ChunkedArray,
    stats: Optional[ColumnStats] = None,
    fsst_state: Optional[list] = None,
) -> CodecChoice:
    """``fsst_state``: a previously trained symbol table to reuse for the
    fsst trial instead of retraining (encoder actors cache tables across
    partitions of the same column; every chunk stores its own table, so a
    stale table costs ratio, never correctness)."""
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
    if is_string_like(arr.type):
        sample_nn = _cap_string_sample(sample_nn)
    names = candidate_codecs(arr.type, stats)
    best_name, best_state, best_size = "plain", None, None

    def consider(name: str, state, size: float):
        nonlocal best_name, best_state, best_size
        if best_size is None or size < best_size:
            best_name, best_state, best_size = name, state, int(size)

    # fsst and fsst_zstd share one trial encode (the expensive pure-Python
    # pass): fsst_zstd's size is estimated by zstd-compressing the fsst
    # output buffer, not by a second full encode.
    fsst_pair = "fsst" in names and "fsst_zstd" in names
    for name in names:
        if fsst_pair and name == "fsst_zstd":
            continue
        codec = get_codec(name)
        try:
            if name == "fsst" and fsst_state is not None:
                state = fsst_state
            else:
                state = codec.train(sample_nn)
            enc = codec.encode(sample_nn, state=state)
            size = len(enc.payload) * codec.cost_factor
        except Exception:
            continue
        consider(name, state, size)
        if fsst_pair and name == "fsst":
            try:
                from .codecs.base import unpack_blobs

                blobs = unpack_blobs(enc.payload)
                zdata = pa.Codec("zstd", compression_level=6).compress(
                    blobs["data"], asbytes=True
                )
                est = (len(enc.payload) - len(blobs["data"]) + len(zdata)) * get_codec(
                    "fsst_zstd"
                ).cost_factor
                consider("fsst_zstd", state, est)
            except Exception:
                pass
    if best_size is None:
        enc = get_codec("plain").encode(sample_nn)
        best_size = len(enc.payload)
    return CodecChoice(best_name, best_state, int(best_size), stats)
