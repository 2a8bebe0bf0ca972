"""Driver-contract smoke: entry(), queries()/oracle_sql() consistency and a
few representative query runs at sf0.001 (the driver's own smoke scale)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__

    return __ray_entry__


def test_entry_flagship(entrymod):
    df = entrymod.entry()
    assert len(df) > 0
    assert df.verified.all()
    assert (df.encoded_bytes > 0).all()


def test_registry_consistency(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # a healthy share of queries have exact SQL twins
    assert len(oracles) >= 25


@pytest.mark.parametrize(
    "name", ["projection", "group_agg", "dedup_exact", "token_count", "topk"]
)
def test_query_smoke_sf0001(entrymod, sf_small, name):
    import pandas as pd
    import pyarrow as pa

    res = entrymod.queries()[name](sf_small)
    # pandas/pyarrow results (e.g. combiner_groupby's driver-side final)
    # have len(); a ray Dataset needs .count()
    n = len(res) if isinstance(res, (pd.DataFrame, pa.Table)) else res.count()
    assert n > 0
