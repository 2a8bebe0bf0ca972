"""Byte-shuffle + zstd codec for numeric list columns (embedding vectors).

The nested fallback (IPC + zstd) compresses an embedding column poorly
because float bytes interleave sign/exponent/mantissa entropy. Splitting
the list into its physical parts and byte-transposing the flat values —
the HDF5/Blosc shuffle filter, as in ``bshuf_zstd`` for flat numerics —
groups the low-entropy exponent bytes together (measured on the synthetic
embeddings table: 0.85 vs 0.94 of raw for the IPC fallback).

Physical layout inside the single payload (``pack_blobs`` framing):
- ``data``:  byte-shuffled + zstd flat values (inner nulls filled with 0)
- ``lens``:  zstd'd int32 per-row list lengths (re-cumsum'd at decode;
             slice-safe: lengths are logical, unlike raw offset buffers)
- ``ivalid``: little-endian packbits of the inner (element) validity, only
             when inner nulls exist

Outer (row-level) nulls never reach a codec: the envelope in
``base.encode_column`` routes nested arrays with nulls to the IPC-lossless
path, and ``Codec`` subclasses are defined over null-free arrays.

Decode rebuilds ``list``/``large_list`` via offsets re-cumsum and
``fixed_size_list`` via ``FixedSizeListArray.from_arrays``, then casts to
the exact requested dtype (field-name differences only).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, Encoded, pack_blobs, unpack_blobs


def _is_vector_type(t: pa.DataType) -> bool:
    if not (
        pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t)
    ):
        return False
    vt = t.value_type
    return pa.types.is_floating(vt) or pa.types.is_integer(vt)


class VecShuffleZstdCodec(Codec):
    name = "vec_bshuf_zstd"

    def __init__(self, level: int = 6):
        self.level = level

    def can_encode(self, t: pa.DataType) -> bool:
        return _is_vector_type(t)

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        t = arr.type
        vt = t.value_type
        np_dtype = np.dtype(vt.to_pandas_dtype())
        # logical per-row lengths + flattened values: both respect slices,
        # unlike the raw offsets/values buffers of a sliced ListArray
        lens = pc.list_value_length(arr)
        lens_np = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False).astype(np.int32)
        values = arr.flatten()
        blobs: dict[str, bytes] = {}
        meta: dict[str, Any] = {"np": np_dtype.str, "w": np_dtype.itemsize}
        if pa.types.is_fixed_size_list(t):
            meta["dim"] = t.list_size
        if values.null_count:
            iv = pc.is_valid(values).to_numpy(zero_copy_only=False)
            blobs["ivalid"] = np.packbits(iv, bitorder="little").tobytes()
            values = pc.fill_null(values, pa.scalar(0, type=vt))
        vals = values.to_numpy(zero_copy_only=False).astype(np_dtype, copy=False)
        width = np_dtype.itemsize
        shuffled = (
            vals.view(np.uint8).reshape(len(vals), width).T.copy().tobytes()
            if len(vals)
            else b""
        )
        codec = pa.Codec("zstd", compression_level=self.level)
        blobs["data"] = codec.compress(shuffled, asbytes=True)
        meta["raw_size"] = len(shuffled)
        lens_raw = lens_np.tobytes()
        blobs["lens"] = codec.compress(lens_raw, asbytes=True)
        meta["lens_size"] = len(lens_raw)
        return Encoded(self.name, pack_blobs(blobs), meta, len(arr))

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        n = enc.n_rows
        blobs = unpack_blobs(enc.payload)
        np_dtype = np.dtype(enc.meta["np"])
        width = int(enc.meta["w"])
        zc = pa.Codec("zstd")
        raw = zc.decompress(blobs["data"], int(enc.meta["raw_size"]), asbytes=True)
        n_vals = len(raw) // width if width else 0
        vals = (
            np.frombuffer(raw, dtype=np.uint8)
            .reshape(width, n_vals)
            .T.copy()
            .view(np_dtype)
            .reshape(n_vals)
            if n_vals
            else np.empty(0, dtype=np_dtype)
        )
        values = pa.array(vals, type=dtype.value_type)
        if "ivalid" in blobs:
            iv = np.unpackbits(
                np.frombuffer(blobs["ivalid"], dtype=np.uint8), bitorder="little"
            )[:n_vals].astype(bool)
            values = pa.array(vals, type=dtype.value_type, mask=~iv)
        if pa.types.is_fixed_size_list(dtype):
            out = pa.FixedSizeListArray.from_arrays(values, int(enc.meta["dim"]))
        else:
            lens_raw = zc.decompress(blobs["lens"], int(enc.meta["lens_size"]), asbytes=True)
            lens = np.frombuffer(lens_raw, dtype=np.int32)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            if pa.types.is_large_list(dtype):
                off_arr = pa.array(offsets, type=pa.int64())
                out = pa.LargeListArray.from_arrays(off_arr, values)
            else:
                off_arr = pa.array(offsets.astype(np.int32), type=pa.int32())
                out = pa.ListArray.from_arrays(off_arr, values)
        if out.type != dtype:
            out = out.cast(dtype)
        return out
