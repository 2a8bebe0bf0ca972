"""Training-data-pipeline operators over ``documents`` / ``embeddings``:
dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search,
text analysis, multimodal plumbing, and the codec-engine round-trip query.

Same registry shape as relational.py; entries without an oracle are
non-SQL-expressible (driver records the weaker rows-only check)."""

from __future__ import annotations

import tempfile
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..sources import load_table, table_path
from ..stages.ann import BatchTopKCosine, CosinePairsStage, _normalize, final_topk
from ..stages.dedup import MinHashBandStage, SimHashStage, content_sha
from ..stages.multimodal import MediaDecodeStage, to_media_table
from ..stages.text import FingerprintStage, LangIdStage, quality_score, token_count

QUERIES: dict[str, Callable] = {}
ORACLE_SQL: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# ----------------------------------------------------------------------
# dedup
# ----------------------------------------------------------------------


@q(
    "dedup_exact",
    "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text",
)
def q_dedup_exact(sf_dir: str):
    """Exact dedup: vectorized sha256 per batch → groupby(hash) → first.
    Only 64-hex hashes shuffle, never the texts."""
    ds = load_table(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"], "h": content_sha(df)})

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    out = hashed.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies")
    )
    return out.select_columns(["doc_id", "n_copies"])


@q("minhash_lsh_pairs")
def q_minhash_lsh_pairs(sf_dir: str):
    """MinHash(64 perms) + LSH(16×4 bands) near-dup candidates, verified with
    exact 5-gram Jaccard ≥ 0.5. Non-SQL-expressible (rows-only check).

    Scale shape: texts stay put; only (band, band_hash, doc_id) rows and the
    candidate-pair id list shuffle. Pair verification re-reads only candidate
    docs via a broadcast id-filter."""
    docs = load_table(sf_dir, "documents", ["doc_id", "text"])
    bands = docs.map_batches(
        MinHashBandStage, batch_format="pandas", concurrency=4
    ).materialize()  # small (16 rows/doc) intermediate, reused twice
    # only buckets holding ≥2 docs can produce pairs. Per-batch PARTIAL
    # bucket counts (combiner) shrink what leaves the workers; the final
    # merge over distinct keys is driver-side here (small at test scale —
    # at 100 TB the same partials feed a groupby instead; never a
    # per-bucket map_groups over millions of singleton buckets).
    partial = bands.map_batches(
        lambda df: df.groupby(["band", "band_hash"], sort=False)
        .size()
        .rename("n")
        .reset_index(),
        batch_format="pandas",
    ).to_pandas()
    totals = partial.groupby(["band", "band_hash"], sort=False)["n"].sum()
    dup = totals[totals > 1].reset_index()
    if len(dup) == 0:
        pairs = pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
    else:
        dupset = set(zip(dup["band"].astype(int), dup["band_hash"].astype(np.uint64)))

        def in_dup(df: pd.DataFrame) -> pd.DataFrame:
            mask = [
                (b, h) in dupset
                for b, h in zip(df["band"].astype(int), df["band_hash"].astype(np.uint64))
            ]
            return df[np.array(mask, dtype=bool)]

        cand = bands.map_batches(in_dup, batch_format="pandas").to_pandas()
        m = cand.merge(cand, on=["band", "band_hash"])
        m = m[m.doc_id_x < m.doc_id_y]
        pairs = (
            m[["doc_id_x", "doc_id_y"]]
            .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
            .drop_duplicates()
        )
    if len(pairs) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    cand_ids = set(pd.concat([pairs.doc_a, pairs.doc_b]).unique().tolist())
    texts = (
        docs.map_batches(
            lambda df: df[df["doc_id"].isin(cand_ids)], batch_format="pandas"
        )
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    # shingle sets computed once per candidate DOC, reused across its pairs
    from ..stages.dedup import jaccard_from_sets, word_shingle_hashes

    shingles = {i: word_shingle_hashes(t) for i, t in texts.items()}
    jac = [
        jaccard_from_sets(shingles[a], shingles[b])
        for a, b in zip(pairs.doc_a, pairs.doc_b)
    ]
    pairs = pairs.assign(jaccard=np.round(jac, 6))
    out = pairs[pairs.jaccard >= 0.5].sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return out


@q("simhash64")
def q_simhash64(sf_dir: str):
    """SimHash (64-bit, token-hash majority vote) per document. Rows-only."""
    ds = load_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(SimHashStage, batch_format="pandas", concurrency=(1, 4))


@q("fingerprint")
def q_fingerprint(sf_dir: str):
    """Karp–Rabin rolling-hash min-fingerprint per document. Rows-only."""
    ds = load_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(FingerprintStage, batch_format="pandas", concurrency=(1, 4))


# ----------------------------------------------------------------------
# text analysis
# ----------------------------------------------------------------------


@q(
    "token_count",
    "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents",
)
def q_token_count(sf_dir: str):
    ds = load_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_count, batch_format="pandas")


@q(
    "text_quality",
    "SELECT doc_id, "
    "CAST(round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000000.0 "
    "/ length(text)) AS BIGINT) AS alpha_ppm, "
    "CAST(round(length(regexp_replace(text, '[^ \\t\\n\\r]', '', 'g')) * 1000000.0 "
    "/ length(text)) AS BIGINT) AS ws_ppm, "
    "CAST(round((length(text) - length(regexp_replace(text, '[^ \\t\\n\\r]', '', 'g'))) * 1000000.0 "
    "/ len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS mean_token_len_ppm "
    "FROM documents WHERE length(text) > 0",
)
def q_text_quality(sf_dir: str):
    ds = load_table(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(quality_score, batch_format="pandas")
    return out


@q(
    "quality_by_lang",
    "SELECT lang, count(*) AS n_docs, "
    "CAST(round(avg(n_chars) * 100) AS BIGINT) AS avg_chars_c, "
    "CAST(round(avg(len(regexp_extract_all(text, '\\S+'))) * 100) AS BIGINT) AS avg_tokens_c "
    "FROM documents GROUP BY lang",
)
def q_quality_by_lang(sf_dir: str):
    """Composition: per-batch token counting feeding a grouped aggregate —
    the text-analysis → corpus-statistics pipeline shape."""
    from ray.data.aggregate import Mean

    ds = load_table(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])

    def add_tokens(df: pd.DataFrame) -> pd.DataFrame:
        df["n_tok"] = df["text"].str.findall(r"\S+").str.len().astype("int64")
        return df[["lang", "n_chars", "n_tok"]]

    out = (
        ds.map_batches(add_tokens, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Mean("n_chars", alias_name="avg_chars"),
            Mean("n_tok", alias_name="avg_tokens"),
        )
    )

    def scale(df: pd.DataFrame) -> pd.DataFrame:
        from .relational import scaled_int

        df["avg_chars_c"] = scaled_int(df["avg_chars"], 100.0)
        df["avg_tokens_c"] = scaled_int(df["avg_tokens"], 100.0)
        return df[["lang", "n_docs", "avg_chars_c", "avg_tokens_c"]]

    return out.map_batches(scale, batch_format="pandas")


@q("lang_id")
def q_lang_id(sf_dir: str):
    """Stopword-table language-ID heuristic (actor pool). Rows-only."""
    ds = load_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pandas", concurrency=(1, 4))


# ----------------------------------------------------------------------
# similarity search
# ----------------------------------------------------------------------


@q("ann_topk")
def q_ann_topk(sf_dir: str, k: int = 5, n_queries: int = 10):
    """Brute-force cosine top-k: queries (vec_id < n_queries) broadcast once,
    one matmul per batch, batch-local top-k → per-query merge. Rows-only
    (float-tie rank boundaries make a SQL twin hash-unstable)."""
    ds = load_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        ds.map_batches(
            lambda df: df[df["vec_id"] < n_queries], batch_format="pandas"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    qids = qdf["vec_id"].to_numpy(dtype=np.int64)
    qmat = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    qref = ray.put((qids, qmat))
    cands = ds.map_batches(
        BatchTopKCosine,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    out = cands.groupby("query_id").map_groups(final_topk(k), batch_format="pandas")

    def round_cos(df: pd.DataFrame) -> pd.DataFrame:
        df["cos"] = df["cos"].round(6)
        return df

    return out.map_batches(round_cos, batch_format="pandas")


@q("embedding_near_dup")
def q_embedding_near_dup(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold). The corpus
    matrix is broadcast (fits in object store at test scale; LSH/IVF bucket
    groupby is the stated scale path). Rows-only."""
    ds = load_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    corpus = ds.to_pandas().sort_values("vec_id")
    ids = corpus["vec_id"].to_numpy(dtype=np.int64)
    mat = _normalize(np.stack(corpus["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((ids, mat))
    pairs = ds.map_batches(
        CosinePairsStage,
        fn_constructor_kwargs={"corpus_ref": ref, "threshold": threshold},
        batch_format="pandas",
        concurrency=(1, 4),
    ).to_pandas()
    if "cos" not in pairs.columns:  # no pair anywhere → schema-less empty ds
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )
    pairs["cos"] = pairs["cos"].round(6)
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


@q("ann_ivf_topk")
def q_ann_ivf_topk(sf_dir: str, k: int = 5, n_queries: int = 10, n_clusters: int = 16):
    """IVF-bucketed approximate top-k (the scale path for ann_topk): a
    deterministic k-means coarse quantizer fit driver-side on a sample,
    centroids broadcast; each batch scores only vectors in a query's nprobe
    nearest buckets. Approximate → rows-only check."""
    from ..stages.ann import IvfTopKCosine, kmeans_fit

    ds = load_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    corpus = ds.to_pandas().sort_values("vec_id")  # test-scale sample = all
    mat = _normalize(np.stack(corpus["embedding"].to_numpy()).astype(np.float64))
    centroids = kmeans_fit(mat, n_clusters)
    qdf = corpus[corpus["vec_id"] < n_queries]
    qids = qdf["vec_id"].to_numpy(dtype=np.int64)
    qmat = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    qref = ray.put((qids, qmat))
    cref = ray.put(centroids)
    cands = ds.map_batches(
        IvfTopKCosine,
        fn_constructor_kwargs={"queries_ref": qref, "centroids_ref": cref, "k": k},
        batch_format="pandas",
        concurrency=4,
    )
    out = cands.groupby("query_id").map_groups(final_topk(k), batch_format="pandas")

    def round_cos(df: pd.DataFrame) -> pd.DataFrame:
        df["cos"] = df["cos"].round(6)
        return df

    return out.map_batches(round_cos, batch_format="pandas")


# ----------------------------------------------------------------------
# multimodal plumbing (decode stubbed; see stages/multimodal.py)
# ----------------------------------------------------------------------


@q("multimodal_features")
def q_multimodal_features(sf_dir: str):
    """Binary media column → actor-pool feature extraction. The payloads are
    the documents' utf-8 bytes standing in for image blobs; decode is a
    deterministic fake (real decoders are NotImplementedError-gated)."""
    ds = load_table(sf_dir, "documents", ["doc_id", "text"])
    media = ds.map_batches(
        lambda df: to_media_table(df, "doc_id", "text", "image"),
        batch_format="pandas",
    )
    # small batches: wide binary rows (multimodal memory rule)
    return media.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


# ----------------------------------------------------------------------
# the codec engine as a query (north-rule invariant with a SQL oracle)
# ----------------------------------------------------------------------


@q(
    "encode_roundtrip",
    "SELECT doc_id, sha256(text) AS text_sha FROM documents",
)
def q_encode_roundtrip(sf_dir: str):
    """Encode the documents table with the per-column codec engine, decode it
    back, and emit per-row sha256 of the DECODED text — the oracle hashes the
    source, so a hash match IS the bit-identical round-trip proof."""
    import hashlib

    from .encode import encode_dataset
    from .verify import decoded_dataset

    out = tempfile.mkdtemp(prefix="upxr_rt_")
    encode_dataset(
        table_path(sf_dir, "documents"),
        out,
        partition_by="lang",
        hash_cols=["doc_id"],
        target_rows_per_partition=5000,
    )

    def sha_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "text_sha": [
                    hashlib.sha256(t.encode("utf-8")).hexdigest() for t in df["text"]
                ],
            }
        )

    return decoded_dataset(out).map_batches(sha_rows, batch_format="pandas")


@q(
    "encode_lineitem_roundtrip",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate "
    "FROM lineitem",
)
def q_encode_lineitem_roundtrip(sf_dir: str):
    """Encode the numeric-heavy lineitem table (exercises forpack / delta /
    bshuf_zstd / rle on ints, doubles and timestamps), decode it, and return
    the DECODED values — the oracle selects the same columns from the
    source, so the value-hash match is a direct bit-identical proof for the
    numeric codec family."""
    from .encode import encode_dataset
    from .verify import decoded_dataset

    out = tempfile.mkdtemp(prefix="upxr_li_")
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"]
    encode_dataset(
        load_table(sf_dir, "lineitem", cols),
        out,
        partition_by=None,
        hash_cols=["l_orderkey", "l_linenumber"],
        target_rows_per_partition=20000,
    )
    return decoded_dataset(out).drop_columns(["_part"])


@q("encode_manifest")
def q_encode_manifest(sf_dir: str):
    """Manifest dataset of an encode run over documents: per-partition codec
    choices, sizes, ratios, lineage. Rows-only."""
    from .encode import encode_dataset

    out = tempfile.mkdtemp(prefix="upxr_mf_")
    mdf = encode_dataset(
        table_path(sf_dir, "documents"),
        out,
        partition_by="source",
        hash_cols=["doc_id"],
        target_rows_per_partition=5000,
    ).to_pandas()
    return mdf.sort_values("partition_id").reset_index(drop=True)
