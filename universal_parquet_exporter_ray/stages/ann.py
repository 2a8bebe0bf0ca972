"""Approximate-nearest-neighbor stages over an embedding column
(``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is normalized once on
the driver, ``ray.put`` once, and every batch does ONE numpy matmul against
it, emitting only its batch-local top-k candidates; a final tiny per-query
reduction merges candidates. At 100 TB the same shape holds (candidates are
k × #batches rows, not the corpus); the scale path adds an IVF-style
pre-bucketing (``kmeans_bucket``) so each batch only scores queries assigned
to its bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BatchTopKCosine:
    """map_batches stage: emit batch-local top-k (query_id, vec_id, cos) rows.

    ``queries_ref``: ray.put of (query_ids int64 array, normalized float64
    query matrix) — fetched once per actor in __init__."""

    def __init__(self, queries_ref, k: int, exclude_self: bool = True):
        self.qids, self.qmat = ray.get(queries_ref)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vec_ids = batch["vec_id"].to_numpy(dtype=np.int64)
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb = _normalize(emb)
        sims = self.qmat @ emb.T  # (n_queries, batch)
        rows_q, rows_v, rows_c = [], [], []
        k = min(self.k + (1 if self.exclude_self else 0), sims.shape[1])
        for qi, qid in enumerate(self.qids):
            s = sims[qi]
            top = np.argpartition(-s, k - 1)[:k]
            for j in top:
                if self.exclude_self and vec_ids[j] == qid:
                    continue
                rows_q.append(qid)
                rows_v.append(vec_ids[j])
                rows_c.append(s[j])
        return pd.DataFrame(
            {
                "query_id": np.array(rows_q, dtype=np.int64),
                "vec_id": np.array(rows_v, dtype=np.int64),
                "cos": np.array(rows_c, dtype=np.float64),
            }
        )


def final_topk(k: int):
    """map_groups reducer: merge batch-local candidates into the true top-k
    per query (ties broken by vec_id for determinism)."""

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return reduce


def kmeans_fit(mat: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means (strided init, fixed iterations) —
    the IVF coarse quantizer. Fit on a sample on the driver; centroids
    broadcast to the assign/search stages."""
    mat = _normalize(mat)
    idx = np.linspace(0, len(mat) - 1, k).astype(np.int64)
    cent = mat[idx].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for j in range(k):
            members = mat[assign == j]
            if len(members):
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cent[j] = c / n
    return cent


class IvfTopKCosine:
    """IVF-bucketed ANN: each batch's vectors are coarse-quantized against
    the broadcast centroids; a query only scores vectors whose bucket is in
    its ``nprobe`` nearest buckets. Same emit shape as ``BatchTopKCosine``
    (batch-local candidates → per-query merge), but each batch scores ~
    nprobe/k of its rows — the scale path when brute force is too wide."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int = 4):
        self.qids, self.qmat = ray.get(queries_ref)
        self.centroids = ray.get(centroids_ref)
        self.k = k
        qsims = self.qmat @ self.centroids.T
        order = np.argsort(-qsims, axis=1)
        self.probes = order[:, :nprobe]  # (n_queries, nprobe)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vec_ids = batch["vec_id"].to_numpy(dtype=np.int64)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        buckets = np.argmax(emb @ self.centroids.T, axis=1)
        rows_q, rows_v, rows_c = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = np.isin(buckets, self.probes[qi])
            mask &= vec_ids != qid
            if not mask.any():
                continue
            cand = np.flatnonzero(mask)
            sims = emb[cand] @ self.qmat[qi]
            kk = min(self.k, len(cand))
            top = cand[np.argpartition(-sims, kk - 1)[:kk]]
            sims_top = emb[top] @ self.qmat[qi]
            rows_q.extend([qid] * len(top))
            rows_v.extend(vec_ids[top].tolist())
            rows_c.extend(sims_top.tolist())
        return pd.DataFrame(
            {
                "query_id": np.array(rows_q, dtype=np.int64),
                "vec_id": np.array(rows_v, dtype=np.int64),
                "cos": np.array(rows_c, dtype=np.float64),
            }
        )


class CosinePairsStage:
    """All-pairs cosine ≥ threshold between a broadcast (normalized) corpus
    matrix and each batch — embedding near-duplicate detection. The corpus
    matrix must fit in the object store; at larger scale replace with an
    LSH/IVF bucket groupby (same emit shape)."""

    def __init__(self, corpus_ref, threshold: float):
        self.ids, self.mat = ray.get(corpus_ref)
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vec_ids = batch["vec_id"].to_numpy(dtype=np.int64)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = emb @ self.mat.T  # (batch, corpus)
        bi, ci = np.nonzero(sims >= self.threshold)
        a, b, c = vec_ids[bi], self.ids[ci], sims[bi, ci]
        keep = a < b  # dedup unordered pairs, drop self-pairs
        return pd.DataFrame(
            {
                "id_a": a[keep],
                "id_b": b[keep],
                "cos": c[keep].astype(np.float64),
            }
        )
