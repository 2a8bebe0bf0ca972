"""Baseline codecs: ``plain`` (Arrow IPC, identity) and ``zstd``
(general-purpose fallback guaranteeing the ≤-reference-size bound when
lightweight codecs lose — see SURVEY.md §7.4)."""

from __future__ import annotations

from typing import Any

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
