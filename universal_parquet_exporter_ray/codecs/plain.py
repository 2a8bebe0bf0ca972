"""Baseline codecs: ``plain`` (Arrow IPC, identity), ``zstd``
(general-purpose fallback guaranteeing the ≤-reference-size bound when
lightweight codecs lose — see SURVEY.md §7.4) and ``bshuf_zstd``
(byte-transpose + zstd, the classic float/wide-int win)."""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from .base import Codec, Encoded, ipc_deserialize, ipc_serialize, ipc_serialize_buffer


class PlainCodec(Codec):
    """Lossless identity: Arrow IPC stream bytes. Works for every type."""

    name = "plain"

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        return Encoded(self.name, ipc_serialize(arr), {}, len(arr))

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        return ipc_deserialize(enc.payload)


class ZstdCodec(Codec):
    """zstd over the column payload. The workhorse for high-entropy data
    (e.g. 40-hex commit ids, source text where FSST loses).

    String-like null-free arrays take a zero-copy fast path: compress the
    Arrow data buffer directly and forpack the row lengths — the generic
    path's IPC serialization duplicated the whole column (a full extra
    fresh-page working set per chunk) just to frame offsets zstd cannot
    compress any better. Everything else goes through lossless IPC."""

    name = "zstd"

    def __init__(self, level: int = 6):
        self.level = level

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        from .base import is_string_like, pack_blobs

        codec = pa.Codec("zstd", compression_level=self.level)
        if is_string_like(arr.type) and arr.null_count == 0:
            from .fsst import _string_buffer
            from .base import get_codec

            data, offsets = _string_buffer(arr)
            comp = codec.compress(data, asbytes=True)
            len_enc = get_codec("forpack").encode(pa.array(np.diff(offsets)))
            payload = pack_blobs({"data": comp, "lens": len_enc.payload})
            meta = {
                "sb": True,
                "raw_size": len(data),
                "len_meta": len_enc.meta,
            }
            return Encoded(self.name, payload, meta, len(arr))
        raw = ipc_serialize_buffer(arr)
        comp = codec.compress(raw, asbytes=True)
        return Encoded(self.name, comp, {"raw_size": raw.size}, len(arr))

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        codec = pa.Codec("zstd")
        if enc.meta.get("sb"):
            from .base import get_codec, unpack_blobs
            from .fsst import _strings_from_buffer

            blobs = unpack_blobs(enc.payload)
            data = codec.decompress(
                blobs["data"], int(enc.meta["raw_size"]), asbytes=True
            )
            len_enc = Encoded(
                "forpack", blobs["lens"], enc.meta["len_meta"], enc.n_rows
            )
            lengths = (
                get_codec("forpack")
                .decode(len_enc, pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            return _strings_from_buffer(data, lengths, dtype)
        raw = codec.decompress(enc.payload, int(enc.meta["raw_size"]), asbytes=True)
        return ipc_deserialize(raw)


class Zstd3Codec(ZstdCodec):
    """zstd level 3 as a separately-trialed codec for big string payloads.

    Measured on the synthetic source-code corpus (83 MB `content` buffer):
    level 3 compresses 2.6× faster than level 6 (167 vs 65 MB/s/core) at
    5.7% larger output (ratio 0.2613 vs 0.2473); decode speed is level-
    independent. At 16 concurrent workers the level-6 match search is also
    the engine's most memory-bandwidth-hungry kernel, so the speedup
    compounds under contention. The selector cost_factor (0.93) expresses
    the tradeoff: prefer level 3 unless level 6 buys MORE than ~7% size —
    true for the dominant source-text column, false for small columns where
    the extra ratio is nearly free in wall-time. The encoded payload is
    decodable by the plain zstd decode path (frame carries its own level),
    inherited unchanged."""

    name = "zstd3"
    cost_factor = 0.93

    def __init__(self):
        super().__init__(level=3)


class Zstd2Codec(ZstdCodec):
    """zstd level 2 — the fast-twin one notch below ``zstd3``.

    Measured on the synthetic source-code corpus (round 4, same buffers as
    the Zstd3Codec numbers): level 2 compresses `content` at 225 MB/s/core
    vs level 3's 148 (1.52×) at 9.7% larger output (0.2866 vs 0.2613), and
    on the 40-hex `commit` column it is BOTH 4× faster (599 vs 151 MB/s)
    and smaller (0.5008 vs 0.5202) — level 3's lazy-match search buys
    nothing on fixed-width hex. Level 1 is strictly dominated by level 2 on
    this corpus (same speed, 7% larger on text), so level 2 is the twin.

    The selector cost_factor (0.83) makes level 2 win unless level 3 buys
    >10.8% size (it doesn't on any corpus column measured) or level 6 buys
    >17%. Encoded frames decode through the inherited plain-zstd path (the
    zstd frame carries its own level)."""

    name = "zstd2"
    cost_factor = 0.83

    def __init__(self):
        super().__init__(level=2)


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
