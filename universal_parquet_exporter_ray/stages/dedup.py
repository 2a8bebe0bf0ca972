"""Deduplication stages: exact (content-hash groupby), MinHash+LSH near-dup,
SimHash, n-gram Jaccard verification.

Scale shape (the part that matters at 100 TB):
- exact dedup: hash column added per batch (vectorized sha) → groupby(hash)
  → first — a single key-shuffle of hashes, never of full texts;
- MinHash-LSH: per-batch shingle→minhash (numpy) → EXPLODE to
  (band, band_hash, doc_id) rows → groupby on the band bucket → candidate
  pairs → exact-Jaccard verify. Only small (band, id) rows shuffle.

Deterministic: fixed seed for the permutation constants; no wall clock.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd

MERSENNE = np.uint64((1 << 61) - 1)
N_PERMS = 64
BAND_ROWS = 4  # 16 bands × 4 rows


def _perm_constants(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=N_PERMS, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=N_PERMS, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-byte shingle hashes of a document (uint64)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


def content_sha(df: pd.DataFrame, text_col: str = "text") -> pd.Series:
    return df[text_col].map(
        lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest() if isinstance(t, str) else ""
    )


class MinHashBandStage:
    """batch(doc_id, text) → exploded (band, band_hash, doc_id) rows.

    Permutation constants are built once per actor (__init__)."""

    def __init__(self, k: int = 5, text_col: str = "text"):
        self.a, self.b = _perm_constants()
        self.k = k
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        h = shingle_hashes(text, self.k)
        # (a*h + b) mod p, min over shingles, per permutation
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % MERSENNE
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_bands = N_PERMS // BAND_ROWS
        ids, bands, bhashes = [], [], []
        for doc_id, text in zip(df["doc_id"], df[self.text_col]):
            sig = self.signature(text if isinstance(text, str) else "")
            for band in range(n_bands):
                chunk = sig[band * BAND_ROWS : (band + 1) * BAND_ROWS]
                bh = int(
                    np.frombuffer(
                        hashlib.sha1(chunk.tobytes()).digest()[:8], dtype=np.uint64
                    )[0]
                )
                ids.append(doc_id)
                bands.append(band)
                bhashes.append(bh)
        return pd.DataFrame(
            {
                "band": np.array(bands, dtype=np.int64),
                "band_hash": np.array(bhashes, dtype=np.uint64),
                "doc_id": np.array(ids, dtype=np.int64),
            }
        )


def bucket_to_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """One LSH bucket → candidate pairs (doc_a < doc_b)."""
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})


def exact_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


class SimHashStage:
    """64-bit SimHash over whitespace tokens (token hash = blake2b-8byte)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.array(
            [
                np.frombuffer(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
                    dtype=np.uint64,
                )[0]
                for t in toks
            ],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = bits.sum(axis=0) * 2 - len(hs)
        return int(
            ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
                dtype=np.uint64
            )
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        out["simhash"] = [
            format(self.simhash64(t if isinstance(t, str) else ""), "016x")
            for t in df[self.text_col]
        ]
        return out
