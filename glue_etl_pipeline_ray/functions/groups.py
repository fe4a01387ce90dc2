"""Exact fine-grained groupby without per-group Ray overhead.

``Dataset.groupby(keys).map_groups(fn)`` invokes ``fn`` through Ray's
group machinery once per DISTINCT KEY — at 10^5 shingle/band buckets the
per-group overhead dwarfs the actual work (measured 10-20x). The engine's
dedup/similarity operators instead hash-partition the keys into
``num_partitions`` coarse Ray groups and walk the per-key runs *inside*
each partition task: one Ray group call per partition, plain-Python run
loop within (each run is a numpy-level op). Exact same semantics — every
distinct key is still processed as one contiguous group — with Ray group
count fixed at ~cores, independent of key cardinality.

This is the same partition-the-keys discipline as the replay exchange
(stages/exchange.py): fan-out tracks compute, not key cardinality.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# collision_runs is shared with the replay merge path (stages/merge.py)
# and the exchange combiner (stages/exchange.py) — one guard, three users
from glue_etl_pipeline_ray.hashing import collision_runs as _collision_runs
from glue_etl_pipeline_ray.hashing import key_hash_u64

_PART_COL = "__part"


def _true_key_groups(sl: pa.Table, keys: list[str]):
    """Sub-split one colliding hash run by real key values, preserving
    first-appearance order (runs are tiny; a Python walk is fine)."""
    rows = list(zip(*(sl[k].to_pylist() for k in keys)))
    groups: dict = {}
    for i, r in enumerate(rows):
        groups.setdefault(r, []).append(i)
    return [sl.take(idxs) for idxs in groups.values()]


def grouped_apply(
    ds: Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = 64,
    min_group_size: int = 1,
    passthrough_singletons: bool = False,
) -> Dataset:
    """Exact ``groupby(keys) -> fn(group)`` with Ray group count =
    ``num_partitions``. ``fn`` receives each key-group as a contiguous
    pyarrow Table (without the partition column) and must return a Table
    with a stable schema.

    Most keys in dedup workloads are singletons; calling ``fn`` for each
    would re-create the old per-group overhead in-process. So:
    ``min_group_size=2`` skips smaller runs entirely (pair generators emit
    nothing for them anyway); ``passthrough_singletons=True`` emits
    singleton rows unchanged in ONE take (for keep-first/distinct shapes,
    where fn is the identity on singletons)."""

    def add_part(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(*(batch[k] for k in keys))
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column(_PART_COL, pa.array(part, pa.int64()))

    def per_partition(part: pa.Table) -> pa.Table:
        part = part.drop_columns([_PART_COL])
        kh = key_hash_u64(*(part[k] for k in keys))
        order = np.argsort(kh, kind="stable")
        part = part.take(order)
        khs = kh[order]
        starts = np.flatnonzero(np.r_[True, khs[1:] != khs[:-1]])
        ends = np.r_[starts[1:], len(khs)]
        sizes = ends - starts
        bad = _collision_runs(part, keys, starts, ends)
        outs = []
        if passthrough_singletons:
            singles = starts[sizes == 1]
            if len(singles):
                outs.append(part.take(singles))
        floor = max(min_group_size, 2 if passthrough_singletons else 1)
        for ri in np.flatnonzero(sizes >= floor):
            s, e = int(starts[ri]), int(ends[ri])
            if bad and int(ri) in bad:
                subs = _true_key_groups(part.slice(s, e - s), keys)
            else:
                subs = [part.slice(s, e - s)]
            for g in subs:
                if g.num_rows < min_group_size:
                    if passthrough_singletons and g.num_rows == 1:
                        outs.append(g)
                    continue
                if passthrough_singletons and g.num_rows == 1:
                    outs.append(g)
                    continue
                o = fn(g)
                if o.num_rows:
                    outs.append(o)
        if not outs:  # typed empty output for schema stability (0-row in,
            outs = [fn(part.slice(0, 0))]  # so fn can't invent rows)
        return pa.concat_tables(outs)

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby(_PART_COL)
        .map_groups(per_partition, batch_format="pyarrow")
    )


def grouped_first(ds: Dataset, keys: list[str], num_partitions: int = 64) -> Dataset:
    """Exact distinct-by-keys keeping the first row per key (input order);
    singleton keys — the common case — pass through in one take."""
    return grouped_apply(
        ds,
        keys,
        lambda g: g.slice(0, 1),
        num_partitions,
        passthrough_singletons=True,
    )


def raycore_grouped_apply(
    ds: Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_groups: int = 16,
    min_group_size: int = 1,
) -> Dataset:
    """`grouped_apply` on the raw-Ray two-stage exchange instead of the
    Dataset sort-shuffle (same pattern as stages/exchange.py: map tasks
    split blocks into G hash-range slices, G reduce tasks walk per-key
    runs). ~5-10x lower shuffle overhead at materialized-input sizes;
    use when the input Dataset is already materialized (it consumes
    block refs)."""
    import ray
    import ray.data

    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    G = max(1, num_groups)

    @ray.remote
    def split(t: pa.Table, G: int):
        kh = key_hash_u64(*(t[k] for k in keys))
        g = (kh % np.uint64(G)).astype(np.int64)
        order = np.argsort(g, kind="stable")
        t = t.take(order)
        gs = g[order]
        bounds = np.searchsorted(gs, np.arange(G + 1))
        slices = [
            t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            for i in range(G)
        ]
        return tuple(slices) if G > 1 else slices[0]

    @ray.remote
    def reduce(*slices: pa.Table) -> pa.Table:
        live = [s for s in slices if s.num_rows]
        if not live:
            return fn(slices[0].slice(0, 0))
        t = live[0] if len(live) == 1 else pa.concat_tables(live)
        kh = key_hash_u64(*(t[k] for k in keys))
        order = np.argsort(kh, kind="stable")
        t = t.take(order)
        khs = kh[order]
        starts = np.flatnonzero(np.r_[True, khs[1:] != khs[:-1]])
        ends = np.r_[starts[1:], len(khs)]
        bad = _collision_runs(t, keys, starts, ends)
        outs = [
            o
            for ri, (s, e) in enumerate(zip(starts, ends))
            for g in (
                _true_key_groups(t.slice(int(s), int(e - s)), keys)
                if bad and ri in bad
                else [t.slice(int(s), int(e - s))]
            )
            if g.num_rows >= min_group_size
            for o in [fn(g)]
            if o.num_rows
        ]
        if not outs:
            outs = [fn(t.slice(0, 0))]
        return pa.concat_tables(outs)

    map_refs = [split.options(num_returns=G).remote(r, G) for r in refs]
    if G == 1:
        map_refs = [[r] for r in map_refs]
    red = [
        reduce.remote(*(map_refs[m][g] for m in range(len(map_refs))))
        for g in range(G)
    ]
    return ray.data.from_arrow_refs(red)
