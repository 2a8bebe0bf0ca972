"""Baseline codecs: ``plain`` (Arrow IPC, identity), ``zstd``
(general-purpose fallback guaranteeing the ≤-reference-size bound when
lightweight codecs lose — see SURVEY.md §7.4) and ``bshuf_zstd``
(byte-transpose + zstd, the classic float/wide-int win)."""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from .base import Codec, Encoded, ipc_deserialize, ipc_serialize


class PlainCodec(Codec):
    """Lossless identity: Arrow IPC stream bytes. Works for every type."""

    name = "plain"

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        return Encoded(self.name, ipc_serialize(arr), {}, len(arr))

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        return ipc_deserialize(enc.payload)


class ZstdCodec(Codec):
    """zstd over the IPC bytes. The workhorse for high-entropy payloads
    (e.g. 40-hex commit ids, source text where FSST loses)."""

    name = "zstd"

    def __init__(self, level: int = 6):
        self.level = level

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        raw = ipc_serialize(arr)
        codec = pa.Codec("zstd", compression_level=self.level)
        comp = codec.compress(raw, asbytes=True)
        return Encoded(self.name, comp, {"raw_size": len(raw)}, len(arr))

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        codec = pa.Codec("zstd")
        raw = codec.decompress(enc.payload, int(enc.meta["raw_size"]), asbytes=True)
        return ipc_deserialize(raw)


class ByteShuffleZstdCodec(Codec):
    """Byte-transpose + zstd for fixed-width numerics: grouping the k-th
    byte of every value together exposes the low-entropy exponent/high
    bytes to the compressor (the classic shuffle filter from HDF5/Blosc)."""

    name = "bshuf_zstd"

    def __init__(self, level: int = 6):
        self.level = level

    def can_encode(self, t: pa.DataType) -> bool:
        return (
            pa.types.is_floating(t)
            or pa.types.is_integer(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_date(t)
        )

    def _np_view(self, arr: pa.Array) -> np.ndarray:
        t = arr.type
        if pa.types.is_timestamp(t) or pa.types.is_date64(t):
            return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        if pa.types.is_date32(t):
            return arr.cast(pa.int32()).to_numpy(zero_copy_only=False)
        return arr.to_numpy(zero_copy_only=False)

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        vals = self._np_view(arr)
        width = vals.dtype.itemsize
        shuffled = (
            vals.view(np.uint8).reshape(len(vals), width).T.copy().tobytes()
            if len(vals)
            else b""
        )
        codec = pa.Codec("zstd", compression_level=self.level)
        comp = codec.compress(shuffled, asbytes=True)
        return Encoded(
            self.name,
            comp,
            {"raw_size": len(shuffled), "w": width, "np": vals.dtype.str},
            len(arr),
        )

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        n = enc.n_rows
        width = int(enc.meta["w"])
        if n == 0:
            return pa.array([], type=dtype)
        raw = pa.Codec("zstd").decompress(
            enc.payload, int(enc.meta["raw_size"]), asbytes=True
        )
        vals = (
            np.frombuffer(raw, dtype=np.uint8)
            .reshape(width, n)
            .T.copy()
            .view(np.dtype(enc.meta["np"]))
            .reshape(n)
        )
        out = pa.array(vals)
        if out.type != dtype:
            out = out.cast(dtype)
        return out
