"""Combiner-first grouped aggregation (SURVEY.md §2.5 at scale).

``Dataset.groupby().aggregate()`` sort-shuffles EVERY input row to its key
partition before reducing — correct, but for low-cardinality keys (TPC-H
Q1's 6 groups, per-nation revenue's 25) the all-to-all costs ~0.8 s of pure
coordination at any input size, and at 100 TB moves the whole corpus.  The
engine's standing pattern (VERDICT r2/r3: "push aggregation partial") is a
per-batch pandas combiner that collapses each block to at most #groups
partial rows, so only combiner-sized partials ever reach the exchange.

``combiner_groupby`` packages that pattern with a size-thresholded FINAL
reduce, mirroring ``joins.thresholded_join``: the partial stream is
materialized (object-store-light — it is combiner-sized, never
corpus-sized), its row count read from metadata, and

- below ``final_cap`` rows the final combine runs driver-side in pandas
  (the common case for low-cardinality keys; a distributed shuffle of a
  few-KB stream is pure overhead), returning a pandas DataFrame;
- above it the final combine is Ray's hash groupby over the partials
  (high-cardinality keys whose group count scales with the corpus),
  returning a Dataset.

Float determinism note: partial sums change the summation ORDER, exactly as
Ray's own block-parallel Sum does; every consumer exports sums through
``scaled_int`` fixed-point columns where a ulp of drift cannot change the
value, so the oracle hash comparison is unaffected.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

__all__ = ["combiner_groupby", "FINAL_REDUCE_CAP"]

# Partial rows below this go to a driver-side pandas combine; above it the
# final reduce stays a distributed groupby.  200k narrow rows is a few MB —
# trivially driver-safe — while corpus-scaling key spaces (user ids at
# 100 TB) blow past it and shuffle.
FINAL_REDUCE_CAP = 200_000


def combiner_groupby(
    ds,
    keys: list[str],
    *,
    sums: Optional[dict[str, str]] = None,
    means: Optional[dict[str, str]] = None,
    mins: Optional[dict[str, str]] = None,
    maxs: Optional[dict[str, str]] = None,
    count: Optional[str] = None,
    final_cap: int = FINAL_REDUCE_CAP,
):
    """Grouped SUM / AVG / MIN / MAX / COUNT(*) with per-batch partials and
    a size-thresholded final reduce.

    ``sums``/``means``/``mins``/``maxs`` map input column -> output name;
    ``count`` names a COUNT(*) output.  AVG follows SQL semantics (ignores
    nulls): each mean column carries its own non-null-count partial.  Null
    keys form a group, as in SQL GROUP BY.  Returns a pandas DataFrame
    (driver final) or a Dataset (distributed final) — both shapes are
    accepted by the oracle comparison and by ``scale_cols``.
    """
    sums = dict(sums or {})
    means = dict(means or {})
    mins = dict(mins or {})
    maxs = dict(maxs or {})
    sum_cols = {c: f"__s_{c}" for c in {**sums, **means}}
    cnt_cols = {c: f"__n_{c}" for c in means}
    min_cols = {c: f"__lo_{c}" for c in mins}
    max_cols = {c: f"__hi_{c}" for c in maxs}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        out = {}
        for c, p in sum_cols.items():
            out[p] = g[c].sum()
        for c, p in cnt_cols.items():
            out[p] = g[c].count()
        for c, p in min_cols.items():
            out[p] = g[c].min()
        for c, p in max_cols.items():
            out[p] = g[c].max()
        if count is not None:
            out["__rows"] = g.size()
        return pd.DataFrame(out).reset_index()

    # combiner-sized stream: materializing it is object-store-light and
    # makes the row count a free metadata read for the threshold decision
    partials = ds.map_batches(partial, batch_format="pandas").materialize()

    def finish(pf: pd.DataFrame) -> pd.DataFrame:
        g = pf.groupby(keys, sort=False, dropna=False)
        res = {}
        for c, name in sums.items():
            res[name] = g[sum_cols[c]].sum()
        for c, name in means.items():
            res[name] = g[sum_cols[c]].sum() / g[cnt_cols[c]].sum()
        for c, name in mins.items():
            res[name] = g[min_cols[c]].min()
        for c, name in maxs.items():
            res[name] = g[max_cols[c]].max()
        if count is not None:
            res[count] = g["__rows"].sum().astype("int64")
        return pd.DataFrame(res).reset_index()

    if partials.count() <= final_cap:
        return finish(partials.to_pandas())

    from ray.data.aggregate import Max, Min, Sum

    aggs = [Sum(p, alias_name=p) for p in sum_cols.values()]
    aggs += [Sum(p, alias_name=p) for p in cnt_cols.values()]
    aggs += [Min(p, alias_name=p) for p in min_cols.values()]
    aggs += [Max(p, alias_name=p) for p in max_cols.values()]
    if count is not None:
        aggs.append(Sum("__rows", alias_name="__rows"))
    reduced = partials.groupby(keys).aggregate(*aggs)

    def finish_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys].copy()
        for c, name in sums.items():
            out[name] = df[sum_cols[c]]
        for c, name in means.items():
            out[name] = df[sum_cols[c]] / df[cnt_cols[c]]
        for c, name in mins.items():
            out[name] = df[min_cols[c]]
        for c, name in maxs.items():
            out[name] = df[max_cols[c]]
        if count is not None:
            out[count] = df["__rows"].astype("int64")
        return out

    return reduced.map_batches(finish_batch, batch_format="pandas")
