"""Keyed as-of join — an operator Ray Data lacks natively.

Semantics: for every left row, attach the right row with the greatest
``on`` value that is (strictly) less than the left's ``on`` value, within
the same ``by`` key — i.e. ``ASOF JOIN`` with ``direction=backward``.

Ray-native composition (no raw actors needed): tag both sides, conform to
a shared schema, union, ONE hash shuffle on the ``by`` key via
``grouped_apply``, then a vectorized sort + ``np.searchsorted`` per key
group. Partitioning assumption (documented per the custom-operator rule):
all rows of one ``by`` key fit in one group task — the same assumption as
any per-key window; a pathological mega-key would need range-sharding the
right side with boundary replication, which this corpus does not need.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from glue_etl_pipeline_ray.functions.groups import grouped_apply

_SIDE = "__side"


def asof_join_backward(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    left_cols: list[str],
    right_value_col: str,
    out_col: str,
    strict: bool = True,
) -> Dataset:
    """Left as-of join: ``left.on``'s nearest strictly-smaller ``right.on``
    per ``by`` key; ``right_value_col`` (from the matched right row) is
    emitted as ``out_col`` (null when no match)."""

    # resolve types driver-side: Dataset handles must not leak into UDFs
    ls = left.schema()
    left_all = dict(zip(ls.names, ls.types))
    rs = right.schema()
    rv_type = dict(zip(rs.names, rs.types))[right_value_col]
    left_types = {c: left_all[c] for c in left_cols}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_cols}
        cols[by] = t[by]
        cols[on] = t[on]
        cols["__rv"] = pa.nulls(t.num_rows, rv_type)
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: pa.nulls(n, left_types[c]) for c in left_cols}
        cols[by] = t[by]
        cols[on] = t[on]
        cols["__rv"] = t[right_value_col]
        cols[_SIDE] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    both = lt.union(rt)

    def join_group(g: pa.Table) -> pa.Table:
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        onv = g[on].to_numpy(zero_copy_only=False)
        is_r = side == 1
        r_on = onv[is_r]
        rv = g["__rv"].to_numpy(zero_copy_only=False)[is_r]
        order = np.argsort(r_on, kind="stable")
        r_on, rv = r_on[order], rv[order]
        l_idx = np.flatnonzero(~is_r)
        if len(l_idx) == 0:
            return pa.table(
                {
                    **{c: g[c].take(pa.array([], pa.int64())) for c in left_cols},
                    out_col: pa.array([], g["__rv"].type),
                }
            )
        l_on = onv[l_idx]
        pos = np.searchsorted(r_on, l_on, side="left" if strict else "right") - 1
        matched = pos >= 0
        vals = np.where(matched, rv[np.maximum(pos, 0)], None)
        out = {c: g[c].take(pa.array(l_idx, pa.int64())) for c in left_cols}
        out[out_col] = pa.array(vals.tolist(), g["__rv"].type)
        return pa.table(out)

    return grouped_apply(both, [by], join_group)
