"""Integer-family lightweight codecs: bit-packing, frame-of-reference
(+bit-pack cascade) and run-length encoding.

Required by the north rule ("dictionary, RLE, ... bit-packing, and
frame-of-reference codecs"); vectorized with numpy over Arrow buffers — no
per-row Python in the hot path.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (
    Codec,
    Encoded,
    bits_needed,
    combine,
    from_uint64_view,
    get_codec,
    is_int_like,
    is_string_like,
    pack_bits,
    pack_blobs,
    to_uint64_view,
    unpack_bits,
    unpack_blobs,
)


class BitPackCodec(Codec):
    """Pack non-negative ints into ⌈log2(max+1)⌉ bits each (no frame)."""

    name = "bitpack"

    def can_encode(self, t: pa.DataType) -> bool:
        return is_int_like(t)

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        vals = to_uint64_view(arr)
        if len(vals) and vals.view(np.int64).min() < 0:
            raise ValueError("bitpack requires non-negative values (use forpack)")
        width = bits_needed(int(vals.max())) if len(vals) else 0
        return Encoded(self.name, pack_bits(vals, width), {"w": width}, len(arr))

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        vals = unpack_bits(enc.payload, int(enc.meta["w"]), enc.n_rows)
        return from_uint64_view(vals, dtype)


class ForPackCodec(Codec):
    """Frame-of-reference + bit-pack cascade: subtract the chunk min (the
    frame), bit-pack the non-negative deltas. Two's-complement wraparound in
    uint64 makes this safe for the full int64 range."""

    name = "forpack"

    def can_encode(self, t: pa.DataType) -> bool:
        return is_int_like(t)

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        vals = to_uint64_view(arr)
        if len(vals) == 0:
            return Encoded(self.name, b"", {"frame": 0, "w": 0}, 0)
        frame = int(vals.view(np.int64).min())
        # wraparound subtract: (v - frame) mod 2^64 keeps deltas non-negative
        deltas = vals - np.int64(frame).astype(np.uint64)
        width = bits_needed(int(deltas.max()))
        return Encoded(
            self.name, pack_bits(deltas, width), {"frame": frame, "w": width}, len(arr)
        )

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        deltas = unpack_bits(enc.payload, int(enc.meta["w"]), enc.n_rows)
        frame = np.int64(int(enc.meta["frame"])).astype(np.uint64)
        vals = deltas + frame  # wraps mod 2^64
        return from_uint64_view(vals, dtype)


class DeltaCodec(Codec):
    """Delta + zigzag + bit-pack: first value stored, successive differences
    zigzag-encoded (sign folded into bit 0) and bit-packed. The winner for
    sequential ids and near-sorted timestamps, where deltas are tiny even
    when the value range is wide."""

    name = "delta"

    def can_encode(self, t: pa.DataType) -> bool:
        return is_int_like(t)

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        vals = to_uint64_view(arr)
        n = len(vals)
        if n == 0:
            return Encoded(self.name, b"", {"first": 0, "w": 0}, 0)
        first = int(np.uint64(vals[0]).astype(np.int64))
        d = np.diff(vals).view(np.int64)  # wraparound differences
        zz = ((d << np.int64(1)) ^ (d >> np.int64(63))).view(np.uint64)
        width = bits_needed(int(zz.max())) if len(zz) else 0
        return Encoded(self.name, pack_bits(zz, width), {"first": first, "w": width}, n)

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        n = enc.n_rows
        if n == 0:
            return pa.array([], type=dtype)
        zz_u = unpack_bits(enc.payload, int(enc.meta["w"]), n - 1)
        # unzigzag needs a LOGICAL right shift (uint64), not arithmetic
        d = (zz_u >> np.uint64(1)).view(np.int64) ^ -(zz_u.view(np.int64) & np.int64(1))
        first = np.int64(int(enc.meta["first"])).astype(np.uint64)
        out = np.empty(n, dtype=np.uint64)
        out[0] = first
        out[1:] = first + np.cumsum(d.view(np.uint64), dtype=np.uint64)
        return from_uint64_view(out, dtype)


def _run_boundaries(arr: pa.Array) -> np.ndarray:
    """Start index of every run in ``arr`` (null-free).

    Floats are compared on their integer BIT view, not by value: value
    equality would merge adjacent ``-0.0``/``0.0`` into one run (decode then
    rewrites ``-0.0`` as ``0.0``, breaking the bit-identical invariant) and
    would split identical-bit NaNs into singleton runs."""
    n = len(arr)
    if n <= 1:
        return np.arange(n, dtype=np.int64)
    if pa.types.is_floating(arr.type):
        f = arr.to_numpy(zero_copy_only=False)
        bits = f.view(f"i{f.dtype.itemsize}")
        neq_np = bits[1:] != bits[:-1]
    else:
        neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
        # not_equal on equal values is False; nulls impossible here (filled)
        neq_np = neq.to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(neq_np) + 1
    return np.concatenate([[0], starts]).astype(np.int64)


class RleCodec(Codec):
    """Run-length encoding for any comparable type: run values (child-encoded)
    + run lengths (forpacked)."""

    name = "rle"

    def can_encode(self, t: pa.DataType) -> bool:
        return is_int_like(t) or is_string_like(t) or pa.types.is_floating(t)

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        n = len(arr)
        starts = _run_boundaries(arr)
        lengths = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        values = combine(arr.take(pa.array(starts)))
        len_enc = get_codec("forpack").encode(pa.array(lengths))
        child = "forpack" if is_int_like(arr.type) else "zstd"
        try:
            val_enc = get_codec(child).encode(values)
        except Exception:
            child = "plain"
            val_enc = get_codec(child).encode(values)
        payload = pack_blobs({"lens": len_enc.payload, "vals": val_enc.payload})
        meta = {
            "n_runs": int(len(starts)),
            "len_meta": len_enc.meta,
            "val_codec": child,
            "val_meta": val_enc.meta,
        }
        return Encoded(self.name, payload, meta, n)

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        blobs = unpack_blobs(enc.payload)
        n_runs = int(enc.meta["n_runs"])
        len_enc = Encoded("forpack", blobs["lens"], enc.meta["len_meta"], n_runs)
        lengths = (
            get_codec("forpack").decode(len_enc, pa.int64()).to_numpy(zero_copy_only=False)
        )
        val_codec = enc.meta["val_codec"]
        val_enc = Encoded(val_codec, blobs["vals"], enc.meta["val_meta"], n_runs)
        values = get_codec(val_codec).decode(val_enc, dtype)
        idx = np.repeat(np.arange(n_runs, dtype=np.int64), lengths)
        return combine(values.take(pa.array(idx)))
