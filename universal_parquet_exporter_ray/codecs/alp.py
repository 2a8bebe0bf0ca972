"""ALP-style adaptive lossless float compression (public paper: "ALP:
Adaptive Lossless floating-Point Compression", Afroozeh et al., SIGMOD
2024 — simplified faithfully).

Most real-world float columns are decimals (prices, rates, measurements
rounded at source). ALP encodes ``v`` as the integer ``round(v * 10^e)``
when the double round-trip ``(i / 10^e)`` reproduces ``v`` BIT-identically;
the integers compress with the frame-of-reference bit-pack cascade.
Values that fail the round-trip (true reals, NaN/Inf, extreme magnitudes)
are exceptions: raw bit patterns stored at their positions, patched back
after decode.

Differences from the paper, on purpose: a single decimal exponent ``e``
per chunk chosen by sampled hit rate (the paper's per-vector (e,f) pair
and cutter/compare kernels are a C-level optimization); exceptions are
positions + raw words, not the paper's in-vector patching. Decode recomputes
exactly the expression the encoder validated, so the round trip is
bit-identical by construction (``==`` on the uint64 views, which also makes
``-0.0`` and NaN payloads safe).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from .base import Codec, Encoded, combine, get_codec, pack_blobs, unpack_blobs

MAX_EXPONENT = 14  # 10^14 < 2^47: products stay exactly representable
SAMPLE_VALS = 1024
# |i| must stay well under 2^53 for the double->int64 round trip to be exact
_INT_LIMIT = float(1 << 51)


def _encodable(v: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(int candidates, bit-exact-ok mask) for scale 10^e.

    ``v`` is the column in its OWN width (float32 or float64): the
    round-trip test compares bit patterns at that width, because a float32
    decimal like 0.29f is not exactly representable in float64 and would
    never pass a float64-bit test."""
    f32 = v.dtype == np.float32
    v64 = v.astype(np.float64) if f32 else v
    with np.errstate(over="ignore", invalid="ignore"):
        scaled = v64 * (10.0**e)
    finite = np.isfinite(scaled) & (np.abs(scaled) < _INT_LIMIT)
    i = np.zeros(len(v), dtype=np.int64)
    np.rint(scaled, out=scaled, where=finite)
    i[finite] = scaled[finite].astype(np.int64)
    back = i / (10.0**e)
    if f32:
        ok = finite & (back.astype(np.float32).view(np.uint32) == v.view(np.uint32))
    else:
        ok = finite & (back.view(np.uint64) == v.view(np.uint64))
    return i, ok


def _pick_exponent(v: np.ndarray) -> int:
    """Sampled hit-rate maximization; ties prefer the smaller exponent
    (smaller integers → fewer bits in the FOR pack)."""
    s = v[:: max(1, len(v) // SAMPLE_VALS)][:SAMPLE_VALS]
    best_e, best_hits = 0, -1
    for e in range(MAX_EXPONENT + 1):
        _, ok = _encodable(s, e)
        hits = int(ok.sum())
        if hits > best_hits:
            best_e, best_hits = e, hits
        if hits == len(s):
            break
    return best_e


class AlpCodec(Codec):
    name = "alp"

    def can_encode(self, t: pa.DataType) -> bool:
        return pa.types.is_floating(t)

    def encode(self, arr: pa.Array, state: Any = None) -> Encoded:
        arr = combine(arr)
        f32 = pa.types.is_float32(arr.type)
        v = arr.to_numpy(zero_copy_only=False)
        e = state if state is not None else _pick_exponent(v)
        i, ok = _encodable(v, e)
        exc_pos = np.flatnonzero(~ok).astype(np.int64)
        exc_raw = v[exc_pos].tobytes()
        # exceptions' integer slots get the frame value so they never widen
        # the FOR bit width
        if len(exc_pos) and ok.any():
            i[exc_pos] = i[ok].min()
        elif len(exc_pos):
            i[exc_pos] = 0
        ints = get_codec("forpack").encode(pa.array(i, type=pa.int64()))
        pos_enc = get_codec("forpack").encode(pa.array(exc_pos, type=pa.int64()))
        payload = pack_blobs(
            {"ints": ints.payload, "pos": pos_enc.payload, "exc": exc_raw}
        )
        meta = {
            "e": e,
            "ints_meta": ints.meta,
            "pos_meta": pos_enc.meta,
            "n_exc": len(exc_pos),
            "f32": f32,
        }
        return Encoded(self.name, payload, meta, len(arr))

    def train(self, sample: pa.Array) -> int:
        return _pick_exponent(combine(sample).to_numpy(zero_copy_only=False))

    def decode(self, enc: Encoded, dtype: pa.DataType) -> pa.Array:
        blobs = unpack_blobs(enc.payload)
        e = int(enc.meta["e"])
        n_exc = int(enc.meta["n_exc"])
        f32 = bool(enc.meta.get("f32"))
        ints = (
            get_codec("forpack")
            .decode(
                Encoded("forpack", blobs["ints"], enc.meta["ints_meta"], enc.n_rows),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        v = ints / (10.0**e)
        if f32:
            v = v.astype(np.float32)
        if n_exc:
            pos = (
                get_codec("forpack")
                .decode(
                    Encoded("forpack", blobs["pos"], enc.meta["pos_meta"], n_exc),
                    pa.int64(),
                )
                .to_numpy(zero_copy_only=False)
            )
            exc = np.frombuffer(
                blobs["exc"], dtype=np.float32 if f32 else np.float64
            )
            v = v.copy()
            v[pos] = exc
        out = pa.array(v)
        if out.type != dtype:
            out = out.cast(dtype)
        return out
