"""Stats + auto-selector behavior: the selector must pick sensible codecs per
column shape and must never lose to the always-available zstd fallback by more
than the trial-sampling noise (north rule: ≤ reference-writer size)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from universal_parquet_exporter_ray.codecs import encode_column
from universal_parquet_exporter_ray.selector import select_codec
from universal_parquet_exporter_ray.stats import column_stats

RNG = np.random.default_rng(7)


def test_stats_shapes():
    s = column_stats(pa.array(["aa"] * 500 + ["bb"] * 500))
    assert s.n_distinct == 2
    assert s.avg_run_len > 100
    s2 = column_stats(pa.array(RNG.integers(0, 2**60, 2000)))
    assert s2.distinct_ratio > 0.9
    s3 = column_stats(pa.array([None] * 50, type=pa.string()))
    assert s3.n_nulls == 50


def test_selector_constant():
    assert select_codec(pa.array(["x"] * 2000)).codec == "constant"


def test_selector_low_cardinality():
    arr = pa.array(RNG.choice(["py", "go", "rs"], 5000))
    assert select_codec(arr).codec in ("dict", "rle")


def test_selector_sorted_runs_prefers_rle_or_dict():
    arr = pa.array(np.sort(RNG.integers(0, 20, 5000)))
    assert select_codec(arr).codec in ("rle", "dict", "forpack")


def test_selector_narrow_ints():
    arr = pa.array(RNG.integers(5_000_000, 5_000_255, 5000))
    assert select_codec(arr).codec == "forpack"


def test_selected_never_worse_than_zstd_by_much():
    cases = [
        pa.array([" ".join(RNG.choice(["def", "ret", "imp", "val"], 30)) for _ in range(500)]),
        pa.array([bytes(RNG.bytes(20)).hex() for _ in range(1000)]),
        pa.array(RNG.integers(-100, 100, 5000)),
        pa.array(RNG.normal(0, 1, 5000)),
    ]
    for arr in cases:
        choice = select_codec(arr)
        chosen = encode_column(arr, choice.codec, choice.state)["encoded_bytes"]
        z = encode_column(arr, "zstd")["encoded_bytes"]
        assert chosen <= z * 1.30, (choice.codec, chosen, z)


def test_selector_state_reused_for_fsst():
    arr = pa.array([bytes(RNG.bytes(20)).hex() for _ in range(2000)])
    choice = select_codec(arr)
    if choice.codec.startswith("fsst"):
        assert isinstance(choice.state, list)  # trained symbol table
        row = encode_column(arr, choice.codec, choice.state)
        from universal_parquet_exporter_ray.codecs import decode_column

        assert arr.equals(decode_column(row))
