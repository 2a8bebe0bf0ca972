"""Codec core: the ``Encoded`` container, blob framing, null/validity handling,
Arrow (de)serialization helpers and the codec registry.

This is the engine's replacement for the reference's one-line Parquet sink
(``/root/reference/src/export/parquet_writer.py:8-17``): instead of
``pandas.DataFrame.to_parquet`` with whole-file snappy, each column chunk is
encoded independently with a lightweight codec chosen by sampled statistics
(see ``selector.py``), and must round-trip bit-identically.

The registry is the engine's user-extension surface, mirroring the reference's
DB-API pluggability (``/root/reference/README.md:889-894``): new codecs plug in
via ``register_codec`` without touching pipeline code.

All codecs operate on **null-free** ``pyarrow.Array`` values — the envelope
(``encode_column`` / ``decode_column``) strips and re-applies the validity
bitmap exactly once at the top level, so child/cascade codecs never see nulls.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# Encoded container
# --------------------------------------------------------------------------


@dataclass
class Encoded:
    """One encoded column chunk (codec-internal; the on-disk row is built by
    ``encode_column``)."""

    codec: str
    payload: bytes
    meta: dict = field(default_factory=dict)
    n_rows: int = 0


# --------------------------------------------------------------------------
# Blob framing: pack several named byte blobs into one payload
# --------------------------------------------------------------------------


def pack_blobs(blobs: dict[str, bytes]) -> bytes:
    """Frame ``{name: bytes}`` into a single payload (u16 name len, name,
    u64 blob len, blob). Deterministic: keys sorted."""
    out = [struct.pack("<I", len(blobs))]
    for k in sorted(blobs):
        kb = k.encode("utf-8")
        v = blobs[k]
        out.append(struct.pack("<H", len(kb)))
        out.append(kb)
        out.append(struct.pack("<Q", len(v)))
        out.append(v)
    return b"".join(out)


def unpack_blobs(buf: bytes) -> dict[str, bytes]:
    n = struct.unpack_from("<I", buf, 0)[0]
    off = 4
    out: dict[str, bytes] = {}
    for _ in range(n):
        (klen,) = struct.unpack_from("<H", buf, off)
        off += 2
        k = buf[off : off + klen].decode("utf-8")
        off += klen
        (vlen,) = struct.unpack_from("<Q", buf, off)
        off += 8
        out[k] = buf[off : off + vlen]
        off += vlen
    return out


# --------------------------------------------------------------------------
# Arrow helpers
# --------------------------------------------------------------------------


def ipc_serialize_buffer(arr: pa.Array) -> pa.Buffer:
    """Serialize a single array via Arrow IPC stream → zero-copy Buffer."""
    rb = pa.record_batch([arr], names=["c"])
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, rb.schema) as w:
        w.write_batch(rb)
    return sink.getvalue()


def ipc_serialize(arr: pa.Array) -> bytes:
    """Serialize a single array via Arrow IPC stream (lossless, any type)."""
    return ipc_serialize_buffer(arr).to_pybytes()


def ipc_deserialize(buf: bytes) -> pa.Array:
    with pa.ipc.open_stream(pa.BufferReader(buf)) as r:
        t = r.read_all()
    return t.column("c").combine_chunks()


def type_to_bytes(t: pa.DataType) -> bytes:
    return pa.schema([pa.field("c", t)]).serialize().to_pybytes()


def type_from_bytes(b: bytes) -> pa.DataType:
    return pa.ipc.read_schema(pa.BufferReader(b)).field(0).type


def zero_scalar(t: pa.DataType):
    """A fill value for nulls of type ``t`` (masked out again on decode).
    Returns ``None`` when the type has no scalar fill (nested types) — the
    envelope then keeps nulls inline instead of stripping them."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return b""
    if pa.types.is_boolean(t):
        return False
    if (
        pa.types.is_nested(t)
        or pa.types.is_dictionary(t)
        or pa.types.is_null(t)
    ):
        return None
    # ints, floats, decimals, timestamps, dates: 0 casts fine
    return 0


def combine(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


# --------------------------------------------------------------------------
# Bit packing (little-endian bit order, width in [0, 64])
# --------------------------------------------------------------------------


def bits_needed(max_val: int) -> int:
    return int(max_val).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width`` bits each."""
    if width == 0 or len(vals) == 0:
        return b""
    v = vals.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes, width: int, n: int) -> np.ndarray:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n * width, bitorder="little"
    )
    arr = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (arr << shifts).sum(axis=1, dtype=np.uint64)


def to_uint64_view(arr: pa.Array) -> np.ndarray:
    """Integer-like arrow array (null-free) → uint64 numpy view with two's
    complement wraparound (reversible via ``from_uint64_view``)."""
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_date64(t) or pa.types.is_time64(t):
        np_arr = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        np_arr = arr.cast(pa.int32()).to_numpy(zero_copy_only=False).astype(np.int64)
    elif pa.types.is_boolean(t):
        np_arr = arr.cast(pa.uint8()).to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        np_arr = arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return np_arr.view(np.uint64) if np_arr.dtype == np.int64 else np_arr.astype(np.uint64)


def from_uint64_view(vals: np.ndarray, dtype: pa.DataType) -> pa.Array:
    signed = vals.view(np.int64)
    if pa.types.is_timestamp(dtype) or pa.types.is_date64(dtype) or pa.types.is_time64(dtype):
        return pa.array(signed).cast(dtype)
    if pa.types.is_date32(dtype) or pa.types.is_time32(dtype):
        return pa.array(signed.astype(np.int32)).cast(dtype)
    if pa.types.is_boolean(dtype):
        return pa.array(signed.astype(np.uint8)).cast(dtype)
    if pa.types.is_unsigned_integer(dtype):
        return pa.array(vals).cast(dtype)
    return pa.array(signed).cast(dtype)


def is_int_like(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date(t)
        or pa.types.is_time(t)
        or pa.types.is_boolean(t)
    )


def is_string_like(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


# --------------------------------------------------------------------------
# Codec registry (extension surface)
# --------------------------------------------------------------------------


class Codec:
    """Base codec. Subclasses set ``name`` and implement encode/decode over
    null-free arrays. ``train`` may build reusable per-partition state (e.g.
    an FSST symbol table) from a sample; ``cost_factor`` biases the selector
    against slow codecs (trial size is multiplied by it)."""

    name: str = "?"
    cost_factor: float = 1.0

    def can_encode(self, t: pa.DataType) -> bool:  # pragma: no cover - abstract
        return True

    def train(self, sample: pa.Array) -> Any:
        return None

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:  # pragma: no cover
        raise NotImplementedError

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:  # pragma: no cover
        raise NotImplementedError


_REGISTRY: dict[str, Codec] = {}


def register_codec(codec: Codec) -> None:
    _REGISTRY[codec.name] = codec


def get_codec(name: str) -> Codec:
    return _REGISTRY[name]


def all_codecs() -> dict[str, Codec]:
    return dict(_REGISTRY)


# --------------------------------------------------------------------------
# Top-level envelope: null handling + on-disk row shape
# --------------------------------------------------------------------------

ALL_NULL = "allnull"


def encode_column(
    arr: pa.Array | pa.ChunkedArray, codec_name: str, state: Any = None
) -> dict:
    """Encode one column chunk with the named codec, handling nulls in the
    envelope. Returns the dict used as the on-disk row (payload/meta/codec)."""
    arr = combine(arr)
    n = len(arr)
    dtype = arr.type
    if arr.null_count == n and n > 0:
        payload = pack_blobs({})
        return _row(ALL_NULL, payload, {}, n, dtype, arr.nbytes)
    blobs: dict[str, bytes] = {}
    meta: dict[str, Any] = {}
    if arr.null_count > 0:
        fill = zero_scalar(dtype)
        if fill is None:
            # nested types (list/struct/map): no scalar fill exists — keep
            # nulls inline and route to an IPC-lossless codec (plain/zstd
            # serialize the validity bitmap as part of the array)
            arr_nn = arr
            if codec_name not in ("plain", "zstd"):
                codec_name = "zstd"
            meta["nulls_inline"] = True
        else:
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
            blobs["valid"] = np.packbits(valid, bitorder="little").tobytes()
            arr_nn = combine(pc.fill_null(arr, pa.scalar(fill, type=dtype)))
            meta["has_nulls"] = True
    else:
        arr_nn = arr
    codec = get_codec(codec_name)
    enc = codec.encode(arr_nn, state=state)
    blobs["data"] = enc.payload
    meta["inner"] = enc.meta
    payload = pack_blobs(blobs)
    return _row(codec_name, payload, meta, n, dtype, arr.nbytes)


def _row(codec, payload, meta, n, dtype, input_bytes) -> dict:
    return {
        "codec": codec,
        "payload": payload,
        "meta": json.dumps(meta, separators=(",", ":")),
        "n_rows": n,
        "type_ipc": type_to_bytes(dtype),
        "input_bytes": int(input_bytes),
        "encoded_bytes": len(payload),
    }


def decode_column(row: dict) -> pa.Array:
    """Inverse of ``encode_column``: on-disk row dict → bit-identical array."""
    dtype = type_from_bytes(row["type_ipc"])
    n = int(row["n_rows"])
    codec_name = row["codec"]
    if codec_name == ALL_NULL:
        return pa.nulls(n, dtype)
    meta = json.loads(row["meta"]) if isinstance(row["meta"], str) else row["meta"]
    blobs = unpack_blobs(bytes(row["payload"]))
    codec = get_codec(codec_name)
    enc = Encoded(codec=codec_name, payload=blobs["data"], meta=meta.get("inner", {}), n_rows=n)
    arr = codec.decode(enc, dtype)
    if meta.get("has_nulls"):
        valid_bits = np.unpackbits(
            np.frombuffer(blobs["valid"], dtype=np.uint8), count=n, bitorder="little"
        ).astype(bool)
        valid = pa.array(valid_bits)
        arr = pc.if_else(valid, arr, pa.nulls(n, dtype))
        arr = combine(arr)
    if arr.type != dtype:
        arr = combine(arr.cast(dtype))
    return arr
