"""Text-analysis stages for large-scale training-data pipelines: token
counting, quality scoring, language-ID heuristic, rolling-hash fingerprints.

All are vectorized ``map_batches`` bodies (pandas str kernels / numpy); the
language-ID and fingerprint stages are callable classes so their tables /
compiled regexes are built once per actor, not per batch.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd


def token_count(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace tokenization; semantics match DuckDB
    ``len(regexp_extract_all(text, '\\S+'))``."""
    out = df[["doc_id"]].copy()
    out["n_tokens"] = (
        df[text_col].str.findall(r"\S+").str.len().fillna(0).astype("int64")
    )
    return out


def _ppm(num: pd.Series, den: pd.Series) -> np.ndarray:
    """CAST(round(num * 1000000.0 / den) AS BIGINT), half away from zero —
    identical expression order to the DuckDB oracle so doubles match."""
    v = num.to_numpy(dtype=np.float64) * 1000000.0 / den.to_numpy(dtype=np.float64)
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def quality_score(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Cheap quality signals as parts-per-million integers: alphabetic ratio,
    whitespace ratio, mean token length (space chars = ``[ \\t\\n\\r]`` to
    match the SQL twin). Rows with empty text are dropped (oracle:
    ``WHERE length(text) > 0``)."""
    keep = df[text_col].str.len() > 0
    df = df[keep]
    out = df[["doc_id"]].copy()
    n = df[text_col].str.len().astype("int64")
    alpha = df[text_col].str.count(r"[A-Za-z]").astype("int64")
    ws = df[text_col].str.count(r"[ \t\n\r]").astype("int64")
    n_tok = df[text_col].str.findall(r"\S+").str.len().astype("int64")
    out["alpha_ppm"] = _ppm(alpha, n)
    out["ws_ppm"] = _ppm(ws, n)
    out["mean_token_len_ppm"] = _ppm(n - ws, n_tok)
    return out


def repetition_signals(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Within-document repetition signals (Gopher-style quality filters,
    Rae et al. 2021, arXiv:2112.11446 §A1.1) as parts-per-million integers:

    - ``dup_tok_ppm``      fraction of tokens that are repeats of an earlier
                           token in the same document,
    - ``top_tok_chars_ppm`` fraction of token characters claimed by the
                           single most frequent token,
    - ``dup_bigram_ppm``   fraction of adjacent token bigrams that are
                           repeats (0 for single-token docs, matching the
                           SQL twin's COALESCE).

    Distinct from ``segment_dedup`` (corpus-wide repeats): this measures
    self-repetition inside one row, so it is a pure per-batch map — every
    doc lives in one row, no cross-batch state, embarrassingly parallel at
    any scale. Vectorized: one explode + two groupbys per batch; bigrams
    via a shift, never a Python loop over rows. Docs with zero tokens drop
    out on both sides (SQL: unnest emits no rows for them)."""
    toks = df[text_col].str.findall(r"\S+")
    ids = df["doc_id"].to_numpy()
    ex = toks.reset_index(drop=True).explode().dropna()
    if len(ex) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=df["doc_id"].dtype),
                "dup_tok_ppm": pd.Series([], dtype="int64"),
                "top_tok_chars_ppm": pd.Series([], dtype="int64"),
                "dup_bigram_ppm": pd.Series([], dtype="int64"),
            }
        )
    tmp = pd.DataFrame(
        {"i": ids[ex.index.to_numpy(dtype=np.int64)], "tok": ex.to_numpy()}
    )
    g = tmp.groupby(["i", "tok"], sort=False).size().reset_index(name="cnt")
    g["chars"] = g["tok"].str.len() * g["cnt"]
    agg = g.groupby("i", sort=False).agg(
        n_tok=("cnt", "sum"),
        n_grp=("cnt", "size"),
        top_chars=("chars", "max"),
        tot_chars=("chars", "sum"),
    )
    # adjacent-token bigrams: shift within the exploded frame, mask the last
    # token of each doc (where the next row belongs to a different doc)
    iarr = tmp["i"].to_numpy()
    not_last = np.r_[iarr[:-1] == iarr[1:], False]
    bgr = tmp.loc[not_last].copy()
    bgr["bg"] = bgr["tok"] + " " + tmp["tok"].shift(-1).to_numpy()[not_last]
    bagg = bgr.groupby("i", sort=False).agg(n_bg=("bg", "size"), n_uniq=("bg", "nunique"))
    out = agg.join(bagg)

    res = pd.DataFrame({"doc_id": out.index.to_numpy()})
    res["dup_tok_ppm"] = _ppm(out["n_tok"] - out["n_grp"], out["n_tok"])
    res["top_tok_chars_ppm"] = _ppm(out["top_chars"], out["tot_chars"])
    nb = out["n_bg"].fillna(0).to_numpy(dtype=np.float64)
    nd = (out["n_bg"] - out["n_uniq"]).fillna(0).to_numpy(dtype=np.float64)
    v = np.where(nb > 0, nd * 1000000.0 / np.where(nb > 0, nb, 1.0), 0.0)
    res["dup_bigram_ppm"] = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
    return res


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "pour", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "por", "que"},
}


class LangIdStage:
    """n-gram/stopword language-ID heuristic. Actor-pool stage: the stopword
    tables and the token regex are compiled once per actor in __init__."""

    def __init__(self):
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        preds = []
        for text in df["text"]:
            toks = self.word.findall(text.lower()) if isinstance(text, str) else []
            best, best_score = "unknown", 0
            for lang in sorted(self.tables):
                score = sum(t in self.tables[lang] for t in toks)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        out["lang_pred"] = preds
        return out


class FingerprintStage:
    """Karp–Rabin rolling-hash document fingerprint: min of all k-byte window
    hashes (winnowing-style robust fingerprint). Deterministic, seedless."""

    def __init__(self, k: int = 8):
        self.k = k
        base = np.uint64(1099511628211)
        self.powers = base ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    def _fp(self, text: str) -> int:
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(b) < self.k:
            return zlib.crc32(b.tobytes())
        win = np.lib.stride_tricks.sliding_window_view(b, self.k).astype(np.uint64)
        hashes = (win * self.powers).sum(axis=1, dtype=np.uint64)
        return int(hashes.min())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        out["fingerprint"] = [format(self._fp(t), "016x") for t in df["text"]]
        return out


# Redaction pattern set: (name, regex, replacement). Regexes are restricted
# to syntax with identical semantics in Python ``re`` and RE2 (DuckDB
# ``regexp_replace``): no backrefs, no lookaround, leftmost-first
# alternation only. Patterns apply IN ORDER, each over the previous
# pattern's output (matching the oracle's nested regexp_replace), and none
# of the replacement tokens can match a later pattern.
REDACTION_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("blockterm", r"\b(?:spark|secret|password)\b", "<TERM>"),
]


class RedactStage:
    """PII / blocklist-term redaction — the training-data hygiene pass that
    scrubs emails, IP addresses, and a configurable blocklist before a
    corpus ships. Actor-pool stage: patterns compile once per actor in
    ``__init__``; ``__call__`` is vectorized pandas ``str.replace`` /
    ``str.count`` over the batch. Hit counts are measured against the
    ORIGINAL text per pattern (order-independent, exactly what the SQL twin
    computes with ``len(regexp_extract_all(text, pat))``)."""

    def __init__(self, patterns: list[tuple[str, str, str]] | None = None):
        pats = patterns if patterns is not None else REDACTION_PATTERNS
        self.compiled = [(re.compile(p), repl) for _, p, repl in pats]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        red = df["text"]
        n_hits = np.zeros(len(df), dtype=np.int64)
        for rx, repl in self.compiled:
            n_hits += df["text"].str.count(rx).fillna(0).to_numpy(np.int64)
            red = red.str.replace(rx, repl, regex=True)
        out["red_text"] = red
        out["n_hits"] = n_hits
        return out


# --- Multi-probe containment scan (benchmark decontamination at scale) ----

_RK_BASE = 1099511628211  # odd (the FNV-1 64-bit prime), so inv mod 2^64 exists
_RK_INV = pow(_RK_BASE, -1, 1 << 64)


def _rk_prefix_hashes(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Polynomial prefix sums of a uint8 byte array in WRAPPING uint64
    arithmetic: ``P[k] = sum_{j<k} b[j]*B^j  (mod 2^64)`` plus the inverse
    power table ``invpw[i] = B^-i``. All vectorized; overflow wrap IS the
    modulus, so no bigint path."""
    n = len(b)
    pw = np.ones(n, dtype=np.uint64)
    if n > 1:
        pw[1:] = np.uint64(_RK_BASE)
        np.cumprod(pw, out=pw)  # wraps mod 2^64 by C semantics
    invpw = np.ones(n, dtype=np.uint64)
    if n > 1:
        invpw[1:] = np.uint64(_RK_INV)
        np.cumprod(invpw, out=invpw)
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(b.astype(np.uint64) * pw, out=prefix[1:])
    return prefix, invpw


def _rk_hash_bytes(p: bytes) -> int:
    """Normalized hash of a whole byte string: ``sum p[j]*B^j (mod 2^64)`` —
    exactly what a window at position i reads after the ``B^-i`` shift."""
    a = np.frombuffer(p, dtype=np.uint8).astype(np.uint64)
    pw = np.ones(len(a), dtype=np.uint64)
    if len(a) > 1:
        pw[1:] = np.uint64(_RK_BASE)
        np.cumprod(pw, out=pw)
    return int((a * pw).sum(dtype=np.uint64))


class ProbeScanStage:
    """Find every (document, probe) containment pair for a broadcast probe
    set — the benchmark-decontamination scan — with per-batch cost
    INDEPENDENT of the probe count.

    This is the vectorizable cousin of the Aho–Corasick automaton the
    round-3 docstring promised: all texts in the batch are concatenated
    into one UTF-8 byte array, every window hash (one per byte position,
    per distinct probe LENGTH) is computed in a single wrapping-uint64
    polynomial-prefix-sum pass, candidates are found with a binary search
    into the sorted probe-hash array (``np.searchsorted``), and every
    candidate is verified byte-exact before emission. Hash collisions and
    windows that straddle a document boundary only cost a rejected verify,
    so the output is EXACT containment — identical to a per-probe
    ``str.contains`` loop and to the SQL ``contains()`` oracle. Scan work
    is O(batch bytes x #distinct probe lengths + hits*log #probes): at the
    real decontamination regime (10^4-10^6 probes from published benchmark
    suites) the probe count appears only in the one-time per-actor index
    build, never in the per-byte loop.

    Actor-pool stage: pass the probe list (``[(probe_id, text), ...]``) by
    value in ``fn_constructor_kwargs``; the per-length hash indexes build
    once per actor in ``__init__``. UTF-8 byte matching equals str
    containment because UTF-8 is self-synchronizing (a byte-exact match of
    a whole valid sequence is always codepoint-aligned).
    """

    def __init__(self, probes: list[tuple[int, str]]):
        # per distinct length: (sorted unique hash array, hash -> [(pid, bytes)])
        self.by_len: dict[int, tuple[np.ndarray, dict[int, list[tuple[int, bytes]]]]] = {}
        groups: dict[int, dict[int, list[tuple[int, bytes]]]] = {}
        for pid, text in probes:
            pb = text.encode("utf-8")
            if not pb:
                continue
            groups.setdefault(len(pb), {}).setdefault(
                _rk_hash_bytes(pb), []
            ).append((int(pid), pb))
        for length, bucket in groups.items():
            keys = np.array(sorted(bucket), dtype=np.uint64)
            self.by_len[length] = (keys, bucket)

    @staticmethod
    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "probe_id": pd.Series([], dtype="int64"),
            }
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or not self.by_len:
            return self._empty()
        blobs = [t.encode("utf-8") if isinstance(t, str) else b"" for t in df["text"]]
        big = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        if len(big) == 0:
            return self._empty()
        ends = np.cumsum(np.fromiter((len(x) for x in blobs), dtype=np.int64, count=len(blobs)))
        doc_ids = df["doc_id"].to_numpy(dtype=np.int64)
        prefix, invpw = _rk_prefix_hashes(big)
        out_d: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        for length, (keys, bucket) in self.by_len.items():
            n_win = len(big) - length + 1
            if n_win <= 0:
                continue
            win = (prefix[length:] - prefix[:-length]) * invpw[:n_win]
            pos = np.searchsorted(keys, win)
            np.clip(pos, 0, len(keys) - 1, out=pos)
            cand = np.nonzero(keys[pos] == win)[0]
            if len(cand) == 0:
                continue
            # window must sit entirely inside one document
            d = np.searchsorted(ends, cand, side="right")
            inside = cand + length <= ends[d]
            cand, d = cand[inside], d[inside]
            hits_d: list[int] = []
            hits_p: list[int] = []
            raw = big.tobytes()
            for i, di in zip(cand.tolist(), d.tolist()):
                for pid, pb in bucket[int(win[i])]:
                    if raw[i : i + length] == pb:
                        hits_d.append(int(doc_ids[di]))
                        hits_p.append(pid)
            if hits_d:
                out_d.append(np.asarray(hits_d, dtype=np.int64))
                out_p.append(np.asarray(hits_p, dtype=np.int64))
        if not out_d:
            return self._empty()
        pairs = np.unique(
            np.stack([np.concatenate(out_d), np.concatenate(out_p)], axis=1), axis=0
        )
        return pd.DataFrame({"doc_id": pairs[:, 0], "probe_id": pairs[:, 1]})
