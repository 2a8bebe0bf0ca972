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

import numpy as np
import pandas as pd
import pyarrow as pa

MERSENNE = np.uint64((1 << 61) - 1)
N_PERMS = 64
BAND_ROWS = 4  # 16 bands × 4 rows


def _perm_constants(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=N_PERMS, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=N_PERMS, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-byte (character) shingle hashes of a document (uint64)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


def word_shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Distinct word w-gram shingle hashes (uint64). Word-level shingling is
    the standard choice for near-dup over natural/code text: character
    k-grams over a small vocabulary give every doc pair a high baseline
    Jaccard and flood LSH with false candidates."""
    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    th = pd.util.hash_pandas_object(pd.Series(toks), index=False).to_numpy(np.uint64)
    if len(th) < w:
        th = np.pad(th, (0, w - len(th)))
    win = np.lib.stride_tricks.sliding_window_view(th, w)
    powers = np.uint64(1099511628211) ** np.arange(w, dtype=np.uint64)
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


def content_sha(df: pd.DataFrame, text_col: str = "text") -> pd.Series:
    return df[text_col].map(
        lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest() if isinstance(t, str) else ""
    )


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (the standard grouped-arange)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )


def batch_word_shingles(texts, w: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated word-w-gram shingle hashes for a WHOLE batch + per-doc
    shingle counts — ONE vectorized ``hash_pandas_object`` call over every
    token in the batch instead of a pandas Series per doc (the round-3
    banding hotspot; ~4× faster at sf0.1).

    Per-shingle values are identical to ``word_shingle_hashes`` (same token
    hash, same polynomial window mix, same zero-padding for short docs and
    the 0-sentinel for empty docs); the only difference is that duplicates
    are NOT removed — harmless for minhash, where the per-permutation MIN
    ignores multiplicity."""
    tok_lists = [t.split() if isinstance(t, str) else [] for t in texts]
    n = np.array([len(t) for t in tok_lists], dtype=np.int64)
    # padded token counts: short non-empty docs pad with 0-hashes to w
    m = np.where(n == 0, 0, np.maximum(n, w))
    F = np.zeros(int(m.sum()), dtype=np.uint64)
    flat_tokens = [tok for lst in tok_lists for tok in lst]
    if flat_tokens:
        th = pd.util.hash_pandas_object(
            pd.Series(flat_tokens), index=False
        ).to_numpy(np.uint64)
        doc_starts = np.concatenate([[0], np.cumsum(m)[:-1]])
        F[np.repeat(doc_starts, n) + _grouped_arange(n)] = th
    n_win = np.where(n == 0, 0, m - w + 1)  # windows per non-empty doc
    doc_starts = np.concatenate([[0], np.cumsum(m)[:-1]])
    win_pos = np.repeat(doc_starts, n_win) + _grouped_arange(n_win)
    powers = np.uint64(1099511628211) ** np.arange(w, dtype=np.uint64)
    S = np.zeros(len(win_pos), dtype=np.uint64)
    for k in range(w):
        S += F[win_pos + k] * powers[k]
    counts = np.where(n == 0, 1, n_win)  # empty docs emit one 0-sentinel
    if (n == 0).any():
        H = np.zeros(int(counts.sum()), dtype=np.uint64)
        out_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        H[np.repeat(out_starts, n_win) + _grouped_arange(n_win)] = S
    else:
        H = S
    return H, counts


def batch_word_shingle_sets(texts, w: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT sorted word-w-gram shingle hashes for a whole batch,
    concatenated, + per-doc distinct counts. Identical per-doc output to
    ``word_shingle_hashes`` (sorted unique), computed with one batch-level
    hash pass + one lexsort instead of per-doc pandas/np.unique calls."""
    H, counts = batch_word_shingles(texts, w)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    order = np.lexsort((H, doc_idx))
    Hs, ds = H[order], doc_idx[order]
    keep = np.ones(len(Hs), dtype=bool)
    if len(Hs) > 1:
        keep[1:] = (Hs[1:] != Hs[:-1]) | (ds[1:] != ds[:-1])
    Hu, du = Hs[keep], ds[keep]
    return Hu, np.bincount(du, minlength=len(counts)).astype(np.int64)


class MinHashBandStage:
    """batch(doc_id, text) → exploded (band, band_hash, doc_id) rows.

    Permutation constants are built once per actor (__init__)."""

    def __init__(self, k: int = 3, text_col: str = "text", shingle: str = "word"):
        self.a, self.b = _perm_constants()
        self.k = k
        self.text_col = text_col
        self.word = shingle == "word"
        self.shingler = word_shingle_hashes if self.word else shingle_hashes

    def signature(self, text: str) -> np.ndarray:
        h = self.shingler(text, self.k)
        # (a*h + b) mod p, min over shingles, per permutation
        vals = self.a[:, None] * h[None, :] + self.b[:, None]  # mod 2^64
        return vals.min(axis=1)

    def signatures(self, texts) -> np.ndarray:
        """Batch-vectorized signatures: one batch-level shingle-hash pass
        (``batch_word_shingles``) + one permutation pass over the
        CONCATENATED shingle array with ``np.minimum.reduceat`` per-doc
        reduction — no per-doc pandas objects anywhere."""
        if self.word:
            H, sizes = batch_word_shingles(texts, self.k)
        else:
            hash_lists = [
                self.shingler(t if isinstance(t, str) else "", self.k) for t in texts
            ]
            sizes = np.array([len(h) for h in hash_lists], dtype=np.int64)
            H = np.concatenate(hash_lists)
        bounds = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        sigs = np.empty((len(sizes), N_PERMS), dtype=np.uint64)
        chunk = 16  # bounded temporaries: (chunk, total_shingles) per pass
        for i0 in range(0, N_PERMS, chunk):
            a = self.a[i0 : i0 + chunk][:, None]
            b = self.b[i0 : i0 + chunk][:, None]
            vals = a * H[None, :] + b  # wraparound mod 2^64 (cheap, sound for minhash)
            sigs[:, i0 : i0 + chunk] = np.minimum.reduceat(vals, bounds, axis=1).T
        return sigs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_docs = len(df)
        n_bands = N_PERMS // BAND_ROWS
        if n_docs == 0:
            return pd.DataFrame(
                {
                    "band": pd.Series([], dtype="int64"),
                    "band_hash": pd.Series([], dtype="uint64"),
                    "doc_id": pd.Series([], dtype="int64"),
                }
            )
        sigs = self.signatures(df[self.text_col])
        # FNV-1a-style vectorized band mixing (deterministic)
        s3 = sigs.reshape(n_docs, n_bands, BAND_ROWS)
        bh = np.full((n_docs, n_bands), 1469598103934665603, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        for r in range(BAND_ROWS):
            bh = (bh ^ s3[:, :, r]) * prime
        doc_ids = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(n_bands, dtype=np.int64), n_docs),
                "band_hash": bh.ravel(),
                "doc_id": np.repeat(doc_ids, n_bands),
            }
        )


class ShingleStage:
    """(doc_id, text) → (doc_id, sh, n_sh): the doc's distinct word-w-gram
    shingle hashes as a sorted list column, for the DISTRIBUTED Jaccard
    verify (pairs ⋈ shingles ⋈ shingles, then a per-pair intersect inside
    map_batches — no driver-side text dict).

    Hashes are stored as the int64 BIT VIEW of the uint64 values: a raw
    uint64 column degrades to float64 through pandas blocks and corrupts
    low bits."""

    def __init__(self, w: int = 3, text_col: str = "text"):
        self.w = w
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        shs = [
            word_shingle_hashes(t if isinstance(t, str) else "", self.w).view(np.int64)
            for t in df[self.text_col]
        ]
        # packed little-endian int64 BYTES, not a list column: Arrow's acero
        # join rejects list-typed non-key fields (and raw uint64 would
        # degrade to float64 through pandas anyway)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "sh": [s.tobytes() for s in shs],
                "n_sh": np.array([len(s) for s in shs], dtype=np.int64),
            }
        )


def pair_jaccard_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-pair exact Jaccard from pre-joined shingle lists. Emits integer
    (inter, union) so the ≥-threshold filter and the ppm scaling are exact
    and identical to the SQL oracle."""
    inters = np.empty(len(df), dtype=np.int64)
    for i, (sa, sb) in enumerate(zip(df["sh_a"], df["sh_b"])):
        inters[i] = np.intersect1d(
            np.frombuffer(sa, dtype=np.int64),
            np.frombuffer(sb, dtype=np.int64),
            assume_unique=True,
        ).size
    union = df["n_a"].to_numpy(dtype=np.int64) + df["n_b"].to_numpy(dtype=np.int64) - inters
    return pd.DataFrame(
        {
            "doc_a": df["doc_a"].to_numpy(dtype=np.int64),
            "doc_b": df["doc_b"].to_numpy(dtype=np.int64),
            "inter": inters,
            "union": union,
        }
    )


_EMPTY_PAIRS = pd.DataFrame(
    {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
)


def add_bucket_part(df: pd.DataFrame, n_parts: int = 32) -> pd.DataFrame:
    """Coarse partition key over LSH buckets: a pure function of the bucket
    key (band, band_hash), so every bucket co-locates in exactly one of
    ``n_parts`` groups. Grouping on this instead of the raw bucket key turns
    ~|docs|×bands tiny map_groups calls (or a hash-join operator's actor
    machinery) into ``n_parts`` vectorized pandas calls."""
    df = df.copy()
    df["bp"] = (
        (df["band_hash"].to_numpy(np.uint64) >> np.uint64(3)).astype(np.int64)
        + df["band"].to_numpy(np.int64)
    ) % n_parts
    return df


def partition_to_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All candidate pairs of one coarse bucket-partition: filter to buckets
    with ≥2 members (vectorized duplicated mask), then enumerate pairs only
    in those collision buckets."""
    dup = g[g.duplicated(["band", "band_hash"], keep=False)]
    if dup.empty:
        return _EMPTY_PAIRS.copy()
    out_a, out_b = [], []
    for _, sub in dup.groupby(["band", "band_hash"], sort=False):
        ids = np.unique(sub["doc_id"].to_numpy(dtype=np.int64))
        if len(ids) < 2:
            continue
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return _EMPTY_PAIRS.copy()
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    )


N_PAIR_PARTS = 32


def stamp_pq(doc_a: np.ndarray, doc_b: np.ndarray, n_parts: int = N_PAIR_PARTS) -> np.ndarray:
    """Coarse pair-partition key: both members of a candidate pair land in
    the same partition, so per-partition pair reductions are global."""
    return (
        (
            doc_a.astype(np.uint64) * np.uint64(1000003)
            + doc_b.astype(np.uint64)
        )
        % np.uint64(n_parts)
    ).astype(np.int64)


class PairShingleEmit:
    """Distributed Jaccard-verify feeder: batch(doc_id, text) → one row per
    (candidate pair, member doc) with the doc's shingle set as packed int64
    bytes. The doc→pair membership table is the BROADCAST small side, passed
    BY VALUE in ``fn_constructor_kwargs`` (Ray ships it to the object store
    once per pool; no explicit ObjectRef in the constructor args, so actor
    restarts can't race a lost ref — ray#53727). Candidate pairs are
    output-sized LSH hits under the broadcast budget, never the corpus;
    texts/shingles stay on workers.

    Round-4: membership lookup is a vectorized pandas merge (was a Python
    dict probe per row); only the per-doc shingle hashing — the adjudicated
    per-row surface — loops, and only over the batch's candidate docs."""

    def __init__(self, members: pd.DataFrame, w: int = 3, text_col: str = "text"):
        self.members = members  # columns: doc_id, doc_a, doc_b
        self.w = w
        self.text_col = text_col

    # empty batches return a TYPED arrow table: a size-0 pandas object
    # column ('sh') trips Ray's pandas block-size estimator
    # ("cannot call `vectorize` on size 0 inputs"); arrow blocks are sized
    # natively and mixed pandas/arrow blocks are fine within one operator
    _EMPTY_SCHEMA = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("pq", pa.int64()),
            ("doc_id", pa.int64()),
            ("sh", pa.binary()),
            ("n_sh", pa.int64()),
        ]
    )

    def __call__(self, df: pd.DataFrame):
        hits = df[["doc_id", self.text_col]].merge(self.members, on="doc_id")
        if hits.empty:
            return self._EMPTY_SCHEMA.empty_table()
        uniq = hits.drop_duplicates("doc_id")
        H, cnt = batch_word_shingle_sets(list(uniq[self.text_col]), self.w)
        ends = np.cumsum(cnt)
        Hi = H.view(np.int64)
        blobs = {}
        sizes = {}
        for j, d in enumerate(uniq["doc_id"]):
            blobs[int(d)] = Hi[ends[j] - cnt[j] : ends[j]].tobytes()
            sizes[int(d)] = int(cnt[j])
        da = hits["doc_a"].to_numpy(np.int64)
        db = hits["doc_b"].to_numpy(np.int64)
        ids = hits["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_a": da,
                "doc_b": db,
                "pq": stamp_pq(da, db),
                "doc_id": ids,
                "sh": pd.Series([blobs[int(d)] for d in ids], dtype=object),
                "n_sh": np.array([sizes[int(d)] for d in ids], dtype=np.int64),
            }
        )


class ShingleBlobStage:
    """batch(doc_id, text) → (doc_id, sh blob, n_sh) for EVERY doc — the
    corpus side of the distributed (over-budget) verify join, where no
    broadcast membership exists to prune the scan."""

    def __init__(self, w: int = 3, text_col: str = "text"):
        self.w = w
        self.text_col = text_col

    _EMPTY_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("sh", pa.binary()), ("n_sh", pa.int64())]
    )

    def __call__(self, df: pd.DataFrame):
        if df.empty:
            # typed arrow empty — see PairShingleEmit._EMPTY_SCHEMA
            return self._EMPTY_SCHEMA.empty_table()
        H, sizes = batch_word_shingle_sets(list(df[self.text_col]), self.w)
        ends = np.cumsum(sizes)
        Hi = H.view(np.int64)
        blobs = [Hi[e - c : e].tobytes() for e, c in zip(ends, sizes)]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "sh": pd.Series(blobs, dtype=object),
                "n_sh": sizes,
            }
        )


def _count_pair_intersections(
    sh_all: np.ndarray, pair_idx: np.ndarray, n_pairs: int
) -> np.ndarray:
    """Per-pair intersection counts from concatenated per-side shingle rows:
    per-side (pair, shingle) rows are distinct by construction, so after one
    lexsort a duplicate adjacent (pair, shingle) ⟺ that shingle is on BOTH
    sides of the pair. Fully vectorized, O(S log S)."""
    order = np.lexsort((sh_all, pair_idx))
    p = pair_idx[order]
    s = sh_all[order]
    dup = (p[1:] == p[:-1]) & (s[1:] == s[:-1])
    return np.bincount(p[1:][dup], minlength=n_pairs)


class BlobPairJaccard:
    """(doc_a, doc_b) batch → exact (doc_a, doc_b, inter, union) against a
    BROADCAST per-doc shingle-blob table (flat int64 array + per-doc
    offsets) — the fast verify plan when the corpus blob table fits the
    broadcast budget. The per-pair blob gathers and intersection counts are
    one vectorized pass per batch (``_grouped_arange`` gather + the shared
    lexsort kernel); nothing is shuffled and no blob is ever duplicated
    per pair. Constructor args ship by value once per worker
    (``thresholded_stage`` semantics)."""

    def __init__(self, doc_ids, flat, starts, counts):
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        self.flat = np.asarray(flat, dtype=np.int64)
        self.starts = np.asarray(starts, dtype=np.int64)
        self.counts = np.asarray(counts, dtype=np.int64)
        self.slot = pd.Series(
            np.arange(len(doc_ids), dtype=np.int64), index=doc_ids
        )

    def _gather(self, slots: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        n = self.counts[slots]
        idx = np.repeat(self.starts[slots], n) + _grouped_arange(n)
        return self.flat[idx], n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_PAIR_JAC.copy()
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        sa = self.slot.reindex(a)
        sb = self.slot.reindex(b)
        if sa.isna().any() or sb.isna().any():
            raise KeyError("candidate pair references a doc with no blob row")
        sh_a, na = self._gather(sa.to_numpy(np.int64))
        sh_b, nb = self._gather(sb.to_numpy(np.int64))
        n_pairs = len(a)
        pair_idx = np.concatenate(
            [
                np.repeat(np.arange(n_pairs, dtype=np.int64), na),
                np.repeat(np.arange(n_pairs, dtype=np.int64), nb),
            ]
        )
        inter = _count_pair_intersections(
            np.concatenate([sh_a, sh_b]), pair_idx, n_pairs
        )
        return pd.DataFrame(
            {"doc_a": a, "doc_b": b, "inter": inter, "union": na + nb - inter}
        )


_EMPTY_PAIR_JAC = pd.DataFrame(
    {
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "inter": pd.Series([], dtype="int64"),
        "union": pd.Series([], dtype="int64"),
    }
)


def pair_blob_partition_jaccard(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse pair-partition of (doc_a, doc_b, doc_id, sh, n_sh) rows →
    exact integer (inter, union) per candidate pair. Each pair contributes
    exactly two rows (doc_id == doc_a and doc_id == doc_b, a < b), so after
    a sort the partition is even/odd-row aligned.

    The intersection counts are FULLY vectorized (round-5: replaces the
    per-pair ``np.intersect1d`` Python loop, which at 600k candidates cost
    ~4 s of the ngram verify): both sides' blobs concatenate via ONE
    ``b"".join`` + zero-copy ``frombuffer``, every shingle row gets its
    pair index by ``np.repeat``, and one lexsort + adjacent-equal scan
    counts, per pair, the shingles present on BOTH sides (per-side rows are
    distinct by construction, so a duplicate (pair, shingle) ⟺ an
    intersection hit). O(S log S) for S = Σ(n_a+n_b) per partition,
    ~50× faster than the loop on short-doc corpora."""
    g = g.sort_values(["doc_a", "doc_b", "doc_id"], kind="stable").reset_index(
        drop=True
    )
    if len(g) == 0:
        return _EMPTY_PAIR_JAC.copy()
    if len(g) % 2:
        raise ValueError("pair partition has an unmatched member row")
    a_rows = g.iloc[0::2]
    b_rows = g.iloc[1::2]
    if not (
        np.array_equal(a_rows["doc_a"].to_numpy(), b_rows["doc_a"].to_numpy())
        and np.array_equal(a_rows["doc_b"].to_numpy(), b_rows["doc_b"].to_numpy())
        and np.array_equal(a_rows["doc_id"].to_numpy(), a_rows["doc_a"].to_numpy())
        and np.array_equal(b_rows["doc_id"].to_numpy(), b_rows["doc_b"].to_numpy())
    ):
        raise ValueError("pair partition rows are misaligned")
    n_pairs = len(a_rows)
    na = a_rows["n_sh"].to_numpy(np.int64)
    nb = b_rows["n_sh"].to_numpy(np.int64)
    sh_a = np.frombuffer(b"".join(a_rows["sh"]), dtype=np.int64)
    sh_b = np.frombuffer(b"".join(b_rows["sh"]), dtype=np.int64)
    if len(sh_a) != int(na.sum()) or len(sh_b) != int(nb.sum()):
        raise ValueError("shingle blob length disagrees with n_sh")
    pair_idx = np.concatenate(
        [
            np.repeat(np.arange(n_pairs, dtype=np.int64), na),
            np.repeat(np.arange(n_pairs, dtype=np.int64), nb),
        ]
    )
    inter = _count_pair_intersections(
        np.concatenate([sh_a, sh_b]), pair_idx, n_pairs
    )
    return pd.DataFrame(
        {
            "doc_a": a_rows["doc_a"].to_numpy(np.int64),
            "doc_b": a_rows["doc_b"].to_numpy(np.int64),
            "inter": inter,
            "union": na + nb - inter,
        }
    )


class ShingleExplode:
    """batch(doc_id, text) → one row per DISTINCT word-w-gram shingle:
    (sp, sh, doc_id, n) where ``sp`` is a coarse partition of the shingle
    hash (same co-location trick as ``add_bucket_part``) and ``n`` is the
    doc's total distinct-shingle count, carried on every row so the
    downstream pair aggregation can compute Jaccard without a second pass
    or a corpus-sized doc→n broadcast."""

    def __init__(self, w: int = 3, n_parts: int = 64, text_col: str = "text"):
        self.w = w
        self.n_parts = n_parts
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sh, sizes = batch_word_shingle_sets(list(df[self.text_col]), self.w)
        if sizes.sum() == 0:
            return pd.DataFrame(
                {
                    "sp": pd.Series([], dtype="int64"),
                    "sh": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        doc_ids = np.repeat(df["doc_id"].to_numpy(dtype=np.int64), sizes)
        return pd.DataFrame(
            {
                "sp": ((sh >> np.uint64(7)) % np.uint64(self.n_parts)).astype(
                    np.int64
                ),
                "sh": sh.view(np.int64),
                "doc_id": doc_ids,
                "n": np.repeat(sizes, sizes),
            }
        )


_EMPTY_POSTING_PAIRS = pd.DataFrame(
    {
        c: pd.Series([], dtype="int64")
        for c in ("pp", "doc_a", "doc_b", "n_a", "n_b")
    }
)


def posting_list_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse shingle-partition → (doc_a, doc_b, n_a, n_b) rows, one per
    (shared shingle, doc pair). Counting these rows per pair downstream
    yields the EXACT intersection size (shingles are distinct per doc).

    Scale note: a stop-shingle with document frequency m emits m²/2 pairs —
    at corpus scale apply prefix filtering (emit only each doc's rarest
    shingles, exactness-preserving for a fixed threshold) before this
    stage; exhaustive here because the oracle does the same all-pairs
    intersection."""
    dup = g[g.duplicated("sh", keep=False)]
    if dup.empty:
        return _EMPTY_POSTING_PAIRS.copy()
    dup = dup.sort_values(["sh", "doc_id"], kind="stable")
    sh = dup["sh"].to_numpy()
    ids = dup["doc_id"].to_numpy(dtype=np.int64)
    ns = dup["n"].to_numpy(dtype=np.int64)
    _, starts, counts = np.unique(sh, return_index=True, return_counts=True)
    out_a, out_b, out_na, out_nb = [], [], [], []
    triu_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for s, c in zip(starts, counts):
        if c < 2:
            continue
        tri = triu_cache.get(c)
        if tri is None:
            tri = triu_cache[c] = np.triu_indices(c, k=1)
        ia, ib = tri
        out_a.append(ids[s + ia])
        out_b.append(ids[s + ib])
        out_na.append(ns[s + ia])
        out_nb.append(ns[s + ib])
    if not out_a:
        return _EMPTY_POSTING_PAIRS.copy()
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    # coarse pair-partition key (pure function of the pair): all hits of one
    # pair co-locate under ONE groupby(pp), where a vectorized pandas
    # count replaces a Ray multi-key aggregate — measured 221 s for ~1M
    # groups at sf0.1 vs ~3 s for this shape
    pp = (
        (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(np.uint64)
    ) % np.uint64(_PAIR_PARTS)
    return pd.DataFrame(
        {
            "pp": pp.astype(np.int64),
            "doc_a": a,
            "doc_b": b,
            "n_a": np.concatenate(out_na),
            "n_b": np.concatenate(out_nb),
        }
    )


_PAIR_PARTS = 64


# ---------------------------------------------------------------------------
# Prefix filtering (exactness-preserving candidate pruning for the exact
# n-gram Jaccard join).  Canonical shingle order = (document frequency asc,
# shingle hash asc) — a global total order.  For Jaccard ≥ t, any qualifying
# pair shares at least one shingle among each doc's first
# n − ⌈t·n⌉ + 1 shingles in that order (prefix-filter theorem, SSJoin/ppjoin
# family), so emitting ONLY prefix shingles to the inverted index preserves
# recall while a stop-shingle (huge df) sorts last and never detonates an
# m²/2 pair emission.  df == 1 shingles are dropped outright: they cannot
# appear in any intersection, and removing them from the ordered list only
# shifts true df ≥ 2 prefix members EARLIER, so the kept set still contains
# every theorem-guaranteed witness.  Candidates are then verified with the
# exact distributed Jaccard (PairShingleEmit → per-pair intersect), which
# restores the exact intersection counts the pruned index no longer carries.
# ---------------------------------------------------------------------------


def df_stamp_route(g: pd.DataFrame, n_doc_parts: int = 64) -> pd.DataFrame:
    """One coarse shingle-partition → its rows stamped with each shingle's
    EXACT global document frequency (a shingle lives entirely in one sp
    group), df == 1 rows dropped, re-keyed by a coarse doc partition for
    the per-doc prefix pass."""
    counts = g["sh"].value_counts()
    dfreq = g["sh"].map(counts).to_numpy(dtype=np.int64)
    keep = dfreq >= 2
    kept = g[keep]
    ids = kept["doc_id"].to_numpy(dtype=np.int64)
    dp = (
        ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(41)
    ).astype(np.int64) % n_doc_parts
    return pd.DataFrame(
        {
            "dp": dp,
            "doc_id": ids,
            "sh": kept["sh"].to_numpy(dtype=np.int64),
            "dfreq": dfreq[keep],
            "n": kept["n"].to_numpy(dtype=np.int64),
        }
    )


_EMPTY_PREFIX = pd.DataFrame(
    {c: pd.Series([], dtype="int64") for c in ("sp", "sh", "doc_id")}
)


def prefix_select(
    g: pd.DataFrame, t_num: int = 1, t_den: int = 3, n_parts: int = 64
) -> pd.DataFrame:
    """One coarse doc-partition → each doc's prefix shingles in canonical
    (dfreq, sh) order.  Prefix length p = n − ⌈t·n⌉ + 1 uses the doc's FULL
    distinct-shingle count ``n`` (carried from ShingleExplode), not the
    df-pruned remainder, so the theorem's bound holds.  t = t_num/t_den as
    exact integers: ⌈t·n⌉ = (t_num·n + t_den − 1) // t_den.

    df == 1 rows were dropped upstream (they cannot match), but their
    POSITIONS still count toward the prefix: df == 1 sorts strictly before
    every df ≥ 2 shingle in canonical order, so a doc with ``m2`` surviving
    rows has u = n − m2 invisible leading shingles and the i-th surviving
    shingle's global rank is u + i.  Keeping rank_local < p − u is exactly
    the theorem's prefix — WITHOUT this correction a stop-shingle whose doc
    has only unique other shingles would re-enter every prefix and the m²/2
    blowup would return."""
    if g.empty:
        return _EMPTY_PREFIX.copy()
    g = g.sort_values(["doc_id", "dfreq", "sh"], kind="stable")
    rank_local = g.groupby("doc_id", sort=False).cumcount().to_numpy()
    m2 = g.groupby("doc_id", sort=False)["sh"].transform("size").to_numpy(np.int64)
    n = g["n"].to_numpy(dtype=np.int64)
    p = n - (t_num * n + t_den - 1) // t_den + 1
    u = n - m2
    kept = g[rank_local < p - u]
    sh = kept["sh"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "sp": ((sh.view(np.uint64) >> np.uint64(7)) % np.uint64(n_parts)).astype(
                np.int64
            ),
            "sh": sh,
            "doc_id": kept["doc_id"].to_numpy(dtype=np.int64),
        }
    )


_EMPTY_CAND = pd.DataFrame(
    {c: pd.Series([], dtype="int64") for c in ("doc_a", "doc_b")}
)


def prefix_posting_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse prefix-shingle partition → DISTINCT candidate (doc_a,
    doc_b) pairs sharing a prefix shingle.  Pair volume is bounded by the
    prefix pruning upstream — the stop-shingle m²/2 blowup cannot occur
    because max-df shingles sort out of every prefix."""
    dup = g[g.duplicated("sh", keep=False)]
    if dup.empty:
        return _EMPTY_CAND.copy()
    dup = dup.sort_values(["sh", "doc_id"], kind="stable")
    sh = dup["sh"].to_numpy()
    ids = dup["doc_id"].to_numpy(dtype=np.int64)
    _, starts, counts = np.unique(sh, return_index=True, return_counts=True)
    out_a, out_b = [], []
    triu_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for s, c in zip(starts, counts):
        if c < 2:
            continue
        tri = triu_cache.get(c)
        if tri is None:
            tri = triu_cache[c] = np.triu_indices(c, k=1)
        ia, ib = tri
        out_a.append(ids[s + ia])
        out_b.append(ids[s + ib])
    if not out_a:
        return _EMPTY_CAND.copy()
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    ).drop_duplicates()


def pair_partition_jaccard(g: pd.DataFrame) -> pd.DataFrame:
    """One pair-partition of posting hits → exact (doc_a, doc_b, inter,
    union) per pair (hit count == intersection size; n_a/n_b ride along)."""
    grp = (
        g.groupby(["doc_a", "doc_b", "n_a", "n_b"], sort=False)
        .size()
        .reset_index(name="inter")
    )
    return pd.DataFrame(
        {
            "doc_a": grp["doc_a"].to_numpy(dtype=np.int64),
            "doc_b": grp["doc_b"].to_numpy(dtype=np.int64),
            "inter": grp["inter"].to_numpy(dtype=np.int64),
            "union": (
                grp["n_a"].to_numpy(dtype=np.int64)
                + grp["n_b"].to_numpy(dtype=np.int64)
                - grp["inter"].to_numpy(dtype=np.int64)
            ),
        }
    )


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = word_shingle_hashes(text_a, k), word_shingle_hashes(text_b, k)
    return jaccard_from_sets(sa, sb)


def jaccard_from_sets(sa: np.ndarray, sb: np.ndarray) -> float:
    """Jaccard of two precomputed (unique, sorted) shingle-hash arrays —
    precompute per DOC, not per pair, when verifying many candidates."""
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


class SimHashStage:
    """64-bit SimHash over whitespace tokens.

    Token hash = first 8 bytes of md5, little-endian — chosen because it is
    reproducible in ANSI SQL (DuckDB ``md5_number_upper``), giving the
    simhash query an exact cross-engine oracle."""

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
                    hashlib.md5(t.encode("utf-8")).digest()[:8], dtype=np.uint64
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


# ---------------------------------------------------------------------------
# Distributed connected components over the near-dup pair graph
# ---------------------------------------------------------------------------

_CC_PARTS = 32


def _cc_coarse(df: pd.DataFrame) -> pd.DataFrame:
    """Stamp the coarse hash partition of the grouping node ``u``. All rows
    of a node land in one partition, so per-node mins inside a partition are
    GLOBAL mins — the same exactness argument as the token-frequency coarse
    partitions in ``pipelines/textops.py``."""
    df = df.copy()
    df["cp"] = (
        pd.util.hash_pandas_object(df["u"], index=False).to_numpy(np.uint64)
        % np.uint64(_CC_PARTS)
    ).astype(np.int64)
    return df


def _large_star(g: pd.DataFrame) -> pd.DataFrame:
    """Large-star over one coarse partition of the SYMMETRIZED edge list:
    for each node u, m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.
    Vectorized: one pandas groupby-transform per partition."""
    m = g.groupby("u", sort=False)["v"].transform("min").to_numpy(np.int64)
    u = g["u"].to_numpy(np.int64)
    v = g["v"].to_numpy(np.int64)
    m = np.minimum(m, u)
    keep = v > u
    out = pd.DataFrame({"u": v[keep], "v": m[keep]})
    return out.drop_duplicates()


def _small_star(g: pd.DataFrame) -> pd.DataFrame:
    """Small-star over one coarse partition of the (u=max, v=min)-oriented
    edge list: for each u, m = min(N(u)); emit (v, m) for v ∈ N(u) \\ {m}
    plus (u, m)."""
    mn = g.groupby("u", sort=False)["v"].transform("min").to_numpy(np.int64)
    u = g["u"].to_numpy(np.int64)
    v = g["v"].to_numpy(np.int64)
    keep = v != mn
    heads = g.assign(_mn=mn).drop_duplicates("u")
    out = pd.DataFrame(
        {
            "u": np.concatenate([v[keep], heads["u"].to_numpy(np.int64)]),
            "v": np.concatenate([mn[keep], heads["_mn"].to_numpy(np.int64)]),
        }
    )
    return out.drop_duplicates()


def _symmetrize(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "u": np.concatenate([df["u"].to_numpy(np.int64), df["v"].to_numpy(np.int64)]),
            "v": np.concatenate([df["v"].to_numpy(np.int64), df["u"].to_numpy(np.int64)]),
        }
    )


def _orient_max_min(df: pd.DataFrame) -> pd.DataFrame:
    u = df["u"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    return pd.DataFrame({"u": np.maximum(u, v), "v": np.minimum(u, v)})


def _edge_checksum(ds) -> tuple[int, int]:
    """(row count, order-insensitive uint64 checksum) of a deduped edge
    dataset — one tiny row per batch to the driver, never the edge set."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df["u"].astype("int64") * np.int64(1000003) + df["v"].astype("int64"),
            index=False,
        ).to_numpy(np.uint64)
        return pd.DataFrame(
            {"n": [np.int64(len(df))], "s": [np.int64(h.sum(dtype=np.uint64) >> np.uint64(1))]}
        )

    part = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return int(part["n"].sum()), int(part["s"].sum())


def connected_components(edges, max_rounds: int = 64):
    """Connected components of an undirected edge Dataset (``u``, ``v``)
    via alternating large-star / small-star rounds (Kiveris et al.,
    *Connected Components in MapReduce and Beyond*, SoCC'14) — the
    100-TB-shaped replacement for a driver-side union-find:

    - every round is two coarse-partition ``groupby().map_groups`` passes
      with fully vectorized pandas bodies — the edge set never leaves the
      workers;
    - the driver holds ONE (count, checksum) pair per round for convergence
      detection, O(rounds) state total;
    - converges to per-component stars rooted at the component minimum in
      O(log n) rounds (chain graphs — the worst case — included).

    Returns a Dataset with columns (``doc_id``, ``cluster_id``) covering
    every node incident to an edge; ``cluster_id`` is the component's
    minimum node id.
    """
    import ray.data  # noqa: F401  (caller owns ray.init)

    cur = edges.map_batches(_orient_max_min, batch_format="pandas").materialize()
    prev_sig = None
    for _ in range(max_rounds):
        large = (
            cur.map_batches(_symmetrize, batch_format="pandas")
            .map_batches(_cc_coarse, batch_format="pandas")
            .groupby("cp")
            .map_groups(_large_star, batch_format="pandas")
        )
        small = (
            large.map_batches(_orient_max_min, batch_format="pandas")
            .map_batches(_cc_coarse, batch_format="pandas")
            .groupby("cp")
            .map_groups(_small_star, batch_format="pandas")
            .materialize()
        )
        sig = _edge_checksum(small)
        cur = small
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    def to_labels(df: pd.DataFrame) -> pd.DataFrame:
        # star edges (leaf u → root v): every leaf labels v; roots label
        # themselves. Dedup is global because (node → label) rows for a node
        # are identical everywhere.
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(
                    [df["u"].to_numpy(np.int64), df["v"].to_numpy(np.int64)]
                ),
                "cluster_id": np.concatenate(
                    [df["v"].to_numpy(np.int64), df["v"].to_numpy(np.int64)]
                ),
            }
        ).drop_duplicates()

    labels = cur.map_batches(to_labels, batch_format="pandas")
    # global dedup: a node's (doc_id, cluster_id) row is identical in every
    # batch at convergence, so a coarse hash-partition drop_duplicates is
    # exact
    def lab_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cp"] = (
            pd.util.hash_pandas_object(df["doc_id"], index=False).to_numpy(np.uint64)
            % np.uint64(_CC_PARTS)
        ).astype(np.int64)
        return df

    def lab_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()[["doc_id", "cluster_id"]]

    return (
        labels.map_batches(lab_coarse, batch_format="pandas")
        .groupby("cp")
        .map_groups(lab_dedup, batch_format="pandas")
    )


# Candidate-pair verification budget: membership tables below this many
# PAIRS broadcast via the object store (two 3-int64-column rows per pair,
# ~100 MB at the limit); above it — the dup-heavy-crawl case where the pair
# graph scales with the corpus — the verify switches to a hash-partitioned
# join, and nothing pair-graph-sized ever reaches the driver.
BROADCAST_PAIR_BUDGET = 2_000_000

# Corpus blob-table broadcast budget for the fast verify plan: below this
# many bytes the per-doc shingle blobs ship ONCE to each worker (flat
# arrays) and pairs verify with zero blob duplication; above it the corpus
# side stays distributed. 64 MB default — at 100 TB the blob table is
# corpus-sized and this plan never triggers, by design.
import os as _os

BLOB_BROADCAST_BUDGET = int(
    _os.environ.get("UPXR_BLOB_BROADCAST_BUDGET", str(64 << 20))
)


def verify_pairs(
    docs,
    cand_rows,
    *,
    broadcast_budget: int = BROADCAST_PAIR_BUDGET,
    w: int = 3,
    text_col: str = "text",
    join_partitions: int = 32,
    concurrency=(1, 8),
    blob_budget: int = BLOB_BROADCAST_BUDGET,
):
    """Exact word-w-gram-Jaccard verification of candidate pairs — the
    shared tail of ``minhash_lsh_pairs`` and ``ngram_jaccard_pairs``.

    ``cand_rows`` is a Dataset of (doc_a, doc_b) candidate rows (duplicates
    allowed, a < b).  Three physical plans, size-thresholded like
    ``stages/joins.py::thresholded_join``:

    - **broadcast-blob** (pair count ≤ budget AND the corpus blob table ≤
      ``blob_budget`` bytes): the per-doc shingle blobs broadcast ONCE as
      flat arrays and the pairs stream through ``BlobPairJaccard`` — no
      per-pair blob duplication, no pq shuffle (round-5: the emit+shuffle
      plan duplicated each doc's blob per candidate pair, ~80× on the
      sf0.1 ngram corpus, 4.4 s → 0.9 s).
    - **broadcast-pair** (pair count ≤ budget, blob table too big): the
      deduped membership table ships by value to a ``PairShingleEmit``
      actor pool; one corpus scan emits shingle blobs only for candidate
      docs, then the coarse pair-partition reducer.
    - **distributed** (over budget): pairs dedup inside coarse hash
      partitions, explode to membership rows, and hash-join against a full
      corpus blob scan — no driver materialization of the pair graph.

    Returns a Dataset of exact integer (doc_a, doc_b, inter, union)."""
    import ray.data  # noqa: F401

    cand = cand_rows.materialize()
    n_upper = cand.count()  # band-duplicate upper bound — safe to broadcast
    if n_upper <= broadcast_budget:
        pairs = cand.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"])
        if len(pairs) == 0:
            import ray.data as rd

            return rd.from_pandas(_EMPTY_PAIR_JAC.copy())
        from . import task_stage as _task_stage
        from . import thresholded_stage as _thr

        # CHEAP pre-gate before any corpus work (review r5): the blob table
        # is ~8 bytes per token ≈ 1-2× the raw text bytes, so a corpus whose
        # TEXT already exceeds 4× the budget cannot fit it — skip straight
        # to the broadcast-pair plan without shingling the corpus just to
        # measure it (the decision probe must not itself be corpus-scale).
        text_proxy_ok = True
        try:
            text_proxy_ok = docs.size_bytes() <= 4 * blob_budget
        except Exception:
            pass
        blobs = None
        if text_proxy_ok:
            blobs = docs.map_batches(
                _task_stage(ShingleBlobStage, w=w, text_col=text_col),
                batch_format="pandas",
            ).materialize()
        if blobs is not None and blobs.size_bytes() <= blob_budget:
            import ray.data as rd

            bdf = blobs.to_pandas()
            counts = bdf["n_sh"].to_numpy(np.int64)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            flat = np.frombuffer(b"".join(bdf["sh"]), dtype=np.int64)
            pairs_ds = rd.from_pandas(pairs.reset_index(drop=True))
            if len(pairs) > 65536:
                pairs_ds = pairs_ds.repartition(32)
            payload = int(
                flat.nbytes + 3 * counts.nbytes + len(bdf) * 8
            )
            return _thr(
                pairs_ds,
                BlobPairJaccard,
                {
                    "doc_ids": bdf["doc_id"].to_numpy(np.int64),
                    "flat": flat,
                    "starts": starts,
                    "counts": counts,
                },
                payload_nbytes=payload,
                concurrency=concurrency,
                batch_format="pandas",
            )
        a = pairs["doc_a"].to_numpy(np.int64)
        b = pairs["doc_b"].to_numpy(np.int64)
        members = pd.DataFrame(
            {
                "doc_id": np.concatenate([a, b]),
                "doc_a": np.concatenate([a, a]),
                "doc_b": np.concatenate([b, b]),
            }
        )
        # task form under the broadcast budget: the membership table is
        # 3 int64 columns over 2×pairs rows; below UPXR_TASK_BROADCAST_BUDGET
        # it closure-ships to warm workers instead of paying ~1 s/actor
        # spawn for a microsecond constructor (same gate as the ANN stages)
        from . import thresholded_stage

        emitted = thresholded_stage(
            docs,
            PairShingleEmit,
            {"members": members, "w": w, "text_col": text_col},
            payload_nbytes=int(members.memory_usage(index=False).sum()),
            concurrency=concurrency,
            batch_format="pandas",
        )
    else:
        def stamp(df: pd.DataFrame) -> pd.DataFrame:
            df = df[["doc_a", "doc_b"]].copy()
            df["pq"] = stamp_pq(
                df["doc_a"].to_numpy(np.int64), df["doc_b"].to_numpy(np.int64)
            )
            return df

        def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop_duplicates(subset=["doc_a", "doc_b"])

        pairs_ds = (
            cand.map_batches(stamp, batch_format="pandas")
            .groupby("pq")
            .map_groups(dedup_group, batch_format="pandas")
        )

        def to_members(df: pd.DataFrame) -> pd.DataFrame:
            a = df["doc_a"].to_numpy(np.int64)
            b = df["doc_b"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "doc_id": np.concatenate([a, b]),
                    "doc_a": np.concatenate([a, a]),
                    "doc_b": np.concatenate([b, b]),
                }
            )

        members_ds = pairs_ds.map_batches(to_members, batch_format="pandas")
        # pure-hash stage, trivial hashable ctor -> plain tasks (task_stage)
        from . import task_stage

        blobs = docs.map_batches(
            task_stage(ShingleBlobStage, w=w, text_col=text_col),
            batch_format="pandas",
        )

        # co-partitioned join via tagged union + ONE groupby on a coarse
        # doc-hash partition (the lang_centroids pattern): robust to empty
        # hash partitions, no acero operators, all vectorized pandas inside
        # each group. role 0 = blob row, role 1 = membership row; sentinel
        # zeros keep every column non-null int64/bytes so no float upcast
        # can corrupt large ids.
        def tag_blobs(df: pd.DataFrame):
            if df.empty:
                return _TAGGED_SCHEMA.empty_table()
            ids = df["doc_id"].to_numpy(np.int64)
            z = np.zeros(len(df), dtype=np.int64)
            return pd.DataFrame(
                {
                    "dp": _doc_part(ids, join_partitions),
                    "role": z,
                    "doc_id": ids,
                    "sh": df["sh"].to_numpy(),
                    "n_sh": df["n_sh"].to_numpy(np.int64),
                    "doc_a": z,
                    "doc_b": z,
                }
            )

        def tag_members(df: pd.DataFrame):
            if df.empty:
                return _TAGGED_SCHEMA.empty_table()
            ids = df["doc_id"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "dp": _doc_part(ids, join_partitions),
                    "role": np.ones(len(df), dtype=np.int64),
                    "doc_id": ids,
                    "sh": pd.Series([b""] * len(df), dtype=object),
                    "n_sh": np.zeros(len(df), dtype=np.int64),
                    "doc_a": df["doc_a"].to_numpy(np.int64),
                    "doc_b": df["doc_b"].to_numpy(np.int64),
                }
            )

        both = blobs.map_batches(tag_blobs, batch_format="pandas").union(
            members_ds.map_batches(tag_members, batch_format="pandas")
        )

        def join_group(g: pd.DataFrame):
            m = g[g["role"].to_numpy() == 1]
            b = g[g["role"].to_numpy() == 0]
            if m.empty or b.empty:
                return PairShingleEmit._EMPTY_SCHEMA.empty_table()
            mm = m[["doc_id", "doc_a", "doc_b"]].merge(
                b[["doc_id", "sh", "n_sh"]], on="doc_id"
            )
            mm["pq"] = stamp_pq(
                mm["doc_a"].to_numpy(np.int64), mm["doc_b"].to_numpy(np.int64)
            )
            return mm[["doc_a", "doc_b", "pq", "doc_id", "sh", "n_sh"]]

        emitted = both.groupby("dp").map_groups(join_group, batch_format="pandas")
    return emitted.groupby("pq").map_groups(
        pair_blob_partition_jaccard, batch_format="pandas"
    )


# typed empty for the tagged-union join stages (see PairShingleEmit note)
_TAGGED_SCHEMA = pa.schema(
    [
        ("dp", pa.int64()),
        ("role", pa.int64()),
        ("doc_id", pa.int64()),
        ("sh", pa.binary()),
        ("n_sh", pa.int64()),
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
    ]
)


def _doc_part(ids: np.ndarray, n_parts: int) -> np.ndarray:
    """Coarse doc-hash partition (Fibonacci mixer, stable cross-process)."""
    h = ids.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int64)


_KEEP_BEST_COLS = ["cluster_id", "kept_doc", "best_tok", "n_members"]


def _keep_best_empty() -> pd.DataFrame:
    return pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in _KEEP_BEST_COLS}
    )


class ClusterBestPartial:
    """(doc_id, text) batch → per-cluster ARGMAX PARTIAL for representative
    selection: one row per cluster present in the batch, carrying the
    batch-local best member (max token count, min doc_id tiebreak) and the
    batch-local member count. Partials are algebraic — merging two partials
    with the same rule (sum counts, argmax of argmaxes) is exact — so only
    cluster-sized rows ever reach an exchange, never documents.

    The doc_id → cluster map (OUTPUT-sized: only docs incident to a
    verified near-dup edge appear) is passed by value as two flat int64
    arrays — no driver-side Python dict is ever built. Unmapped docs are
    their own singleton cluster. The lookup is a vectorized Int64 reindex
    — no float round-trip, so 2^53+ doc ids stay exact."""

    def __init__(self, map_keys, map_vals):
        keys = np.asarray(map_keys, dtype=np.int64)
        vals = np.asarray(map_vals, dtype=np.int64)
        self.cs = pd.Series(vals, index=keys, dtype="Int64")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _keep_best_empty()
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        n_tok = (
            df["text"].fillna("").str.count(r"\S+").to_numpy(dtype=np.int64)
        )
        if len(self.cs):
            looked = self.cs.reindex(ids)
            mask = looked.isna().to_numpy()
            filled = looked.to_numpy(dtype=np.int64, na_value=0)
            cl = np.where(mask, ids, filled)
        else:
            cl = ids
        tmp = pd.DataFrame(
            {"cluster_id": cl, "kept_doc": ids, "best_tok": n_tok}
        )
        return merge_keep_best_partials(tmp, counts_col=None)


def merge_keep_best_partials(
    df: pd.DataFrame, counts_col: str | None = "n_members"
) -> pd.DataFrame:
    """Merge keep-best partial rows (or raw member rows when
    ``counts_col=None``: each row then counts 1): per cluster, sum member
    counts and keep the (best_tok DESC, kept_doc ASC) argmax row."""
    if len(df) == 0:
        return _keep_best_empty()
    if counts_col is None:
        counts = df.groupby("cluster_id", sort=False).size()
    else:
        counts = df.groupby("cluster_id", sort=False)[counts_col].sum()
    best = df.sort_values(
        ["cluster_id", "best_tok", "kept_doc"],
        ascending=[True, False, True],
        kind="stable",
    ).drop_duplicates("cluster_id", keep="first")
    return pd.DataFrame(
        {
            "cluster_id": best["cluster_id"].to_numpy(dtype=np.int64),
            "kept_doc": best["kept_doc"].to_numpy(dtype=np.int64),
            "best_tok": best["best_tok"].to_numpy(dtype=np.int64),
            "n_members": counts.loc[best["cluster_id"]].to_numpy(
                dtype=np.int64
            ),
        }
    ).reset_index(drop=True)


# ----------------------------------------------------------------------
# exact-substring (sliding-window) dedup — the ExactSubstr family member
# (Lee et al., "Deduplicating Training Data Makes Language Models Better",
# ACL 2022): any W-token span that occurs more than once ANYWHERE in the
# corpus is removed from every occurrence except the global first. The
# suffix-array construction of the paper is replaced by the distributed
# hash shape: only (h1, h2, packed) window rows — two independent 64-bit
# token-polynomial hashes (128 bits total, so a cross-window collision is
# vanishingly unlikely at any corpus size) plus a packed (doc_id, pos)
# int64 — ever cross the wire, never window text.
# ----------------------------------------------------------------------

_WKEY_1 = "9f2b4c6d8e0a1357"  # deterministic siphash keys for the two
_WKEY_2 = "1122deadbeef3344"  # independent per-token hash streams
_WBASE = np.uint64(1099511628211)

_EMPTY_SUBSTR = pd.DataFrame(
    {
        "doc_id": pd.Series([], dtype="int64"),
        "dup_windows": pd.Series([], dtype="int64"),
        "removed_tokens": pd.Series([], dtype="int64"),
    }
)

_EMPTY_WINDOWS = pd.DataFrame(
    {
        "h1": pd.Series([], dtype="int64"),
        "h2": pd.Series([], dtype="int64"),
        "packed": pd.Series([], dtype="int64"),
        "doc_id": pd.Series([], dtype="int64"),
        "pos": pd.Series([], dtype="int64"),
    }
)


def emit_token_windows(
    df: pd.DataFrame, w: int, text_col: str = "text"
) -> pd.DataFrame:
    """All sliding ``w``-token window hashes of a batch of documents,
    vectorized across the whole batch: tokens of every doc flatten into ONE
    object array, each per-token hash stream is computed in one
    ``hash_pandas_object`` call, and the polynomial window combination is
    ``w`` vectorized multiply-adds — no per-window Python.

    ``packed`` = doc_id * 2^32 + pos (callers guarantee doc_id < 2^31 and
    doc length < 2^32), so an int64 MIN aggregate picks the lexicographic
    (doc_id, pos) first occurrence.

    The window hashes ship as the int64 BIT VIEW of the uint64 polynomial
    values (the standing repo pattern, see ``posting_list_pairs``): a raw
    uint64 key column degrades to float64 through Ray's distributed
    groupby final and pandas blocks, which corrupts hashes above 2^53 —
    the r4 exact_substr sf0.1 incident."""
    texts = df[text_col]
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    toks = [t.split() for t in texts]
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    n_wins = np.maximum(lens - w + 1, 0)
    total = int(n_wins.sum())
    if total == 0:
        return _EMPTY_WINDOWS.copy()
    flat = pd.Series(
        [tok for doc in toks for tok in doc], dtype="object"
    )
    h1 = pd.util.hash_pandas_object(
        flat, index=False, hash_key=_WKEY_1
    ).to_numpy(np.uint64)
    h2 = pd.util.hash_pandas_object(
        flat, index=False, hash_key=_WKEY_2
    ).to_numpy(np.uint64)
    # global start index of every window in the flattened token array
    doc_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    doc_rep = np.repeat(np.arange(len(toks)), n_wins)
    win_off = np.concatenate([[0], np.cumsum(n_wins)[:-1]])
    pos = np.arange(total, dtype=np.int64) - np.repeat(win_off, n_wins)
    start = doc_off[doc_rep] + pos
    wh1 = np.zeros(total, dtype=np.uint64)
    wh2 = np.zeros(total, dtype=np.uint64)
    for j in range(w):  # w vectorized steps, not per-window Python
        wh1 = wh1 * _WBASE + h1[start + j]
        wh2 = wh2 * _WBASE + h2[start + j]
    did = ids[doc_rep]
    return pd.DataFrame(
        {
            "h1": wh1.view(np.int64),
            "h2": wh2.view(np.int64),
            "packed": did * np.int64(1 << 32) + pos,
            "doc_id": did,
            "pos": pos,
        }
    )


def merge_removal_spans(df: pd.DataFrame, w: int) -> pd.DataFrame:
    """Per-doc merge of removal spans [pos, pos+w): overlapping/adjacent
    spans coalesce (equal-length spans sorted by pos make the running-max
    end simply the previous pos + w). Emits one row per doc:
    (doc_id, dup_windows = removed occurrences, removed_tokens = merged
    span tokens). Fully vectorized."""
    if len(df) == 0:
        return _EMPTY_SUBSTR.copy()
    df = df.sort_values(["doc_id", "pos"], kind="stable")
    d = df["doc_id"].to_numpy(dtype=np.int64)
    p = df["pos"].to_numpy(dtype=np.int64)
    new_doc = np.empty(len(d), dtype=bool)
    new_doc[0] = True
    new_doc[1:] = d[1:] != d[:-1]
    gap = np.empty(len(d), dtype=bool)
    gap[0] = True
    gap[1:] = p[1:] > p[:-1] + w
    island = np.cumsum(new_doc | gap) - 1
    isl = pd.DataFrame({"doc_id": d, "pos": p, "g": island})
    spans = isl.groupby("g", sort=False).agg(
        doc_id=("doc_id", "first"),
        first_pos=("pos", "min"),
        last_pos=("pos", "max"),
        n_occ=("pos", "size"),
    )
    spans["span"] = spans["last_pos"] + w - spans["first_pos"]
    out = spans.groupby("doc_id", sort=False).agg(
        dup_windows=("n_occ", "sum"), removed_tokens=("span", "sum")
    )
    return pd.DataFrame(
        {
            "doc_id": out.index.to_numpy(dtype=np.int64),
            "dup_windows": out["dup_windows"].to_numpy(dtype=np.int64),
            "removed_tokens": out["removed_tokens"].to_numpy(dtype=np.int64),
        }
    ).reset_index(drop=True)


class SubstrFilterStage:
    """Second corpus pass of the broadcast exact-substring plan: regenerate
    each batch's window hashes, inner-merge against the (output-sized)
    duplicated-window table, drop each window's global first occurrence,
    and merge the surviving removal spans per doc — all of a doc's windows
    are in its own batch, so the span merge needs no shuffle.

    ``dup`` ships as three flat numpy arrays (h1, h2, first_packed) via
    ``thresholded_stage``: task-closure under the broadcast budget, actor
    pool by value above it."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray, first: np.ndarray, w: int):
        self.dup = pd.DataFrame(
            {
                "h1": np.asarray(h1, dtype=np.int64),
                "h2": np.asarray(h2, dtype=np.int64),
                "first": np.asarray(first, dtype=np.int64),
            }
        )
        self.w = w

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        wins = emit_token_windows(df, self.w)
        if len(wins) == 0:
            return _EMPTY_SUBSTR.copy()
        hit = wins.merge(self.dup, on=["h1", "h2"], how="inner")
        rem = hit[hit["packed"] != hit["first"]]
        return merge_removal_spans(rem[["doc_id", "pos"]], self.w)
