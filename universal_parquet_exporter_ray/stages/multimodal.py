"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The actual media decode is STUBBED (this environment ships no image/audio
libraries): ``MediaDecodeStage`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (blake2b-seeded
feature vector) stands in. Everything Ray-side — schema, binary batch
handling, actor signature, small batch sizes for wide binary rows, output
layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),      # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)


def to_media_table(df: pd.DataFrame, id_col: str, payload_col: str, kind: str) -> pa.Table:
    """Wrap raw binary payloads into the typed media schema."""
    payloads = [
        v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
        for v in df[payload_col]
    ]
    return pa.table(
        {
            "media_id": pa.array(df[id_col].astype("int64")),
            "kind": pa.array([kind] * len(df)),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array([f"application/x-fake-{kind}"] * len(df)),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecodeStage:
    """Actor-pool decode/feature-extract stage.

    Real deployments plug a decoder (PIL/torchaudio/ffmpeg) into ``_decode``;
    here the deterministic fake produces an 8-dim feature from a blake2b
    digest of the payload so the full pipeline (small ``batch_size``, actor
    ``__init__``-once model load, Arrow binary in/out) is exercised end to
    end."""

    FEATURE_DIM = 8

    def __init__(self, fake: bool = True):
        self.fake = fake
        # model-load stand-in: built once per actor
        self._mixer = np.arange(1, self.FEATURE_DIM + 1, dtype=np.float64)

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decoding requires an image/audio library not present "
                "in this environment; run with fake=True for the plumbing"
            )
        # sha256 (not blake2b): reproducible in the DuckDB oracle, so the
        # multimodal pipeline's fake features get an exact SQL twin
        digest = hashlib.sha256(payload).digest()[: self.FEATURE_DIM]
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            f = self._decode(payload if payload is not None else b"")
            feats.append((f * self._mixer).round(6).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": batch["n_bytes"],
                "feature": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )
