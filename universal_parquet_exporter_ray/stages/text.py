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
