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

# per-worker broadcast cache: ray.get deserializes on every call, and the
# sharded join's group fn runs once per (key, shard) group — thousands of
# times per partition task. Entries are aggregate-sized and die with the
# worker process.
_BROADCAST_CACHE: dict[str, object] = {}


def _get_broadcast(ref):
    import ray

    key = ref.hex()
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


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


def asof_join_backward_sharded(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    left_cols: list[str],
    right_value_col: str,
    out_col: str,
    bucket_width: int,
    strict: bool = True,
) -> Dataset:
    """Range-sharded as-of join — the mega-key path.

    Same semantics as :func:`asof_join_backward`, but no key ever needs
    to fit in one task: rows are grouped by ``(by, floor(on / width))``
    so a hot key splits across time shards. A left row's match can
    precede its shard, so a **carry-in** is precomputed: pass 1 reduces
    the right side to one (max ``on``, value) row per (key, shard) —
    thousands of tiny rows, not data rows — pass 2 prefix-maxes them
    per key into a broadcast {(key, shard) -> latest right row at or
    before the shard start}, and the final grouped join falls back to
    the carry when a shard has no earlier right row. Three waves, one
    full-data shuffle (the (key, shard) groupby); the carry table is the
    only driver-side materialization and is aggregate-sized.

    ``on`` must be numeric/datetime64-comparable; ``bucket_width`` is in
    the raw units of ``on`` (e.g. us for timestamps). ``by`` must be an
    integer key in this variant (the carry index is keyed on int64)."""
    import ray

    ls = left.schema()
    left_all = dict(zip(ls.names, ls.types))
    rs = right.schema()
    rv_type = dict(zip(rs.names, rs.types))[right_value_col]
    left_types = {c: left_all[c] for c in left_cols}
    width = np.int64(bucket_width)

    def _on_i64(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.datetime64):
            v = v.astype("datetime64[us]").astype(np.int64)
        return v.astype(np.int64)

    # ---- pass 1: per (key, shard) right-side maximum (tiny output)
    def right_max(t: pa.Table) -> pa.Table:
        onv = _on_i64(t[on])
        b = onv // width
        kb = t[by].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((onv, b, kb))
        kbs, bs, ons = kb[order], b[order], onv[order]
        last = np.r_[(kbs[1:] != kbs[:-1]) | (bs[1:] != bs[:-1]), True]
        idx = order[last]
        return pa.table(
            {
                by: t[by].take(pa.array(idx, pa.int64())),
                "__bucket": pa.array(b[idx], pa.int64()),
                "__max_on": pa.array(onv[idx], pa.int64()),
                "__rv": t[right_value_col].take(pa.array(idx, pa.int64())),
            }
        )

    agg_parts = [
        ray.get(r)
        for r in right.map_batches(
            right_max, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
    ]
    agg = pa.concat_tables(agg_parts)
    # per-batch maxima -> true maxima, then per-key prefix max across
    # shards = carry-in for the NEXT shard onward (aggregate-sized work)
    k = agg[by].to_numpy(zero_copy_only=False).astype(np.int64)
    b = agg["__bucket"].to_numpy(zero_copy_only=False)
    o = agg["__max_on"].to_numpy(zero_copy_only=False)
    order = np.lexsort((o, b, k))
    k, b, o = k[order], b[order], o[order]
    rv = agg["__rv"].take(pa.array(order, pa.int64()))
    last = np.r_[(k[1:] != k[:-1]) | (b[1:] != b[:-1]), True]
    k, b, o, rv = k[last], b[last], o[last], rv.filter(pa.array(last))
    carry: dict[tuple[int, int], tuple[int, object]] = {}
    prev_key = None
    best = None  # (on, value) of latest right row seen so far for key
    for i in range(len(k)):
        if k[i] != prev_key:
            prev_key, best = k[i], None
        if best is not None:
            carry[(int(k[i]), int(b[i]))] = best
        best = (int(o[i]), rv[i].as_py())
    # carry for shards that have LEFT rows but no right rows at all is
    # resolved per group below via a bucket-range walk over key_maxima
    key_maxima: dict[int, list[tuple[int, int, object]]] = {}
    for i in range(len(k)):
        key_maxima.setdefault(int(k[i]), []).append(
            (int(b[i]), int(o[i]), rv[i].as_py())
        )
    carry_ref = ray.put(key_maxima)

    # ---- pass 2: tag + union + (key, shard) groupby + local asof
    def tag_left(t: pa.Table) -> pa.Table:
        onv = _on_i64(t[on])
        cols = {c: t[c] for c in left_cols}
        cols[by] = t[by]
        cols["__on"] = pa.array(onv, pa.int64())
        cols["__bucket"] = pa.array(onv // width, pa.int64())
        cols["__rv"] = pa.nulls(t.num_rows, rv_type)
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        onv = _on_i64(t[on])
        cols = {c: pa.nulls(n, left_types[c]) for c in left_cols}
        cols[by] = t[by]
        cols["__on"] = pa.array(onv, pa.int64())
        cols["__bucket"] = pa.array(onv // width, pa.int64())
        cols["__rv"] = t[right_value_col]
        cols[_SIDE] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    both = lt.union(rt)

    def join_group(g: pa.Table) -> pa.Table:
        maxima = _get_broadcast(carry_ref)
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        onv = g["__on"].to_numpy(zero_copy_only=False)
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
                    out_col: pa.array([], rv_type),
                }
            )
        # carry-in: latest right row in any EARLIER shard of this key
        key = int(g[by][0].as_py())
        bucket = int(g["__bucket"][0].as_py())
        fallback = None
        for mb, _, mv in maxima.get(key, []):
            if mb < bucket:
                fallback = mv
            else:
                break
        l_on = onv[l_idx]
        pos = np.searchsorted(r_on, l_on, side="left" if strict else "right") - 1
        matched = pos >= 0
        if len(r_on):
            vals = np.where(matched, rv[np.maximum(pos, 0)], fallback)
        else:
            vals = np.full(len(l_idx), fallback, dtype=object)
        out = {c: g[c].take(pa.array(l_idx, pa.int64())) for c in left_cols}
        out[out_col] = pa.array(vals.tolist(), rv_type)
        return pa.table(out)

    return grouped_apply(both, [by, "__bucket"], join_group)
