"""Partial (combiner) aggregation: pre-reduce inside map_batches, then a
small groupby over partials.

A bare ``groupby(key).aggregate(...)`` shuffles every row; emitting one
row per (key, block) first bounds the shuffle by |keys| x |blocks| —
the scale pattern the reference never needed (its per-service counts
were driver-side ``len()`` calls, ``flat_jsons.py:254``) but a 100 TB
groupby does.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


def partial_groupby_sum(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str],
    count_alias: str | None = None,
) -> Dataset:
    """groupby(keys).sum(sum_cols) [+ row count] with per-block combining.

    Output columns keep their input names (plus ``count_alias``), so the
    caller controls naming by renaming/projecting beforehand.
    """

    def combine(batch: pa.Table) -> pa.Table:
        import os

        # one task = one core (see stages/exchange._pin_intraop_threads)
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        df = pl.from_arrow(batch)
        aggs = [pl.col(c).sum() for c in sum_cols]
        if count_alias:
            aggs.append(pl.len().cast(pl.Int64).alias(count_alias))
        return df.group_by(keys).agg(aggs).to_arrow()

    partial = ds.map_batches(combine, batch_format="pyarrow", batch_size=None)
    cols = list(sum_cols) + ([count_alias] if count_alias else [])
    aggs = [Sum(c, alias_name=c) for c in cols]
    return partial.groupby(keys).aggregate(*aggs)
