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


def _walk_partition(
    part: pa.Table,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    min_group_size: int,
    passthrough_singletons: bool,
    empty_out: pa.Table | None = None,
) -> pa.Table:
    """Shared per-partition kernel for BOTH exchange paths: stable-sort
    the partition by key hash, walk the per-key runs, apply ``fn`` per
    true key group (collision-guarded). Stable argsort preserves input
    (block, row) order within a key, so "first row per key" semantics
    are identical whichever exchange delivered the partition.
    ``empty_out`` is a precomputed ``fn(typed 0-row input)`` used for
    schema stability when the partition produces nothing — the raycore
    exchange probes it once driver-side so group fns that assume >=1
    row never see an empty input on workers."""
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
        # so fn can't invent rows)
        if empty_out is not None:
            outs = [empty_out]
        else:
            try:
                outs = [fn(part.slice(0, 0))]
            except Exception as e:
                # a non-empty partition can still yield zero output
                # groups (min_group_size / singleton filtering); a fn
                # that can't take 0 rows then has no way to define the
                # output schema — fail with guidance, not a deep crash
                raise ValueError(
                    "grouped_apply: a partition produced no output "
                    "groups and fn raised on the 0-row schema probe; "
                    "make fn return a typed empty table for 0-row input"
                ) from e
    return pa.concat_tables(outs)


# A split task returns one object per (block, group) pair, so the raycore
# exchange creates num_blocks x num_groups refs. Past this cap the ref
# bookkeeping (not the data) dominates and the streaming sort-shuffle is
# the right plan — at 100 TB (~10^5-10^6 blocks) auto always picks sort.
_RAYCORE_MAX_REFS = 65536


def grouped_apply(
    ds: Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = 64,
    min_group_size: int = 1,
    passthrough_singletons: bool = False,
    exchange: str = "auto",
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
    where fn is the identity on singletons).

    ``exchange`` picks the all-to-all plan:

    - ``"sort"`` — Ray Data's streaming sort-shuffle (groupby on a hash
      partition column). Scales to any block count; pays ~seconds of
      fixed sampling/scheduling overhead regardless of data size.
    - ``"raycore"`` — the two-stage raw-task exchange (split each block
      into G hash slices, G reduce tasks). 4-5x lower fixed overhead at
      small/medium inputs, but creates blocks x G refs.
    - ``"auto"`` (default) — materialize the input (a sort-shuffle
      materializes everything at its barrier anyway, so this is not a
      streaming regression) and choose by measured block count: raycore
      while blocks x G stays under ``_RAYCORE_MAX_REFS``, else the
      streaming sort-shuffle. At 100 TB auto always degrades to sort.
    """
    if exchange not in ("auto", "sort", "raycore"):
        raise ValueError(f"unknown exchange {exchange!r}")
    if exchange != "sort":
        try:
            mat = ds.materialize()
            n_blocks = mat.num_blocks()
        except Exception:
            if exchange == "raycore":  # explicit request: fail loud,
                raise  # never silently run the 4-5x-slower sort plan
            mat = None
        empty_out = None
        if mat is not None:
            # probe fn on a typed empty input ONCE, driver-side: its
            # result is the schema-stability fallback for empty hash
            # groups. A fn that (latently) can't take 0 rows keeps the
            # sort exchange, where only non-empty partitions exist.
            try:
                sch = mat.schema()
                empty_in = getattr(sch, "base_schema", sch).empty_table()
                empty_out = fn(empty_in)
            except Exception as e:
                if exchange == "raycore":
                    raise ValueError(
                        "exchange='raycore' was requested explicitly "
                        "but fn raised on the 0-row schema probe (the "
                        "raycore plan needs a typed empty output for "
                        "empty hash groups); make fn accept a 0-row "
                        "table or use exchange='auto'/'sort'"
                    ) from e
                empty_out = None
        if mat is not None and empty_out is not None:
            if (
                exchange == "raycore"
                or n_blocks * num_partitions <= _RAYCORE_MAX_REFS
            ):
                return raycore_grouped_apply(
                    mat,
                    keys,
                    fn,
                    num_groups=num_partitions,
                    min_group_size=min_group_size,
                    passthrough_singletons=passthrough_singletons,
                    empty_out=empty_out,
                )
            ds = mat  # fall through to the streaming sort on the blocks
        elif mat is not None:
            ds = mat

    def add_part(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(*(batch[k] for k in keys))
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column(_PART_COL, pa.array(part, pa.int64()))

    def per_partition(part: pa.Table) -> pa.Table:
        return _walk_partition(
            part.drop_columns([_PART_COL]),
            keys,
            fn,
            min_group_size,
            passthrough_singletons,
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby(_PART_COL)
        .map_groups(per_partition, batch_format="pyarrow")
    )


def grouped_apply_partitions(
    ds: Dataset,
    keys: list[str],
    partition_fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = 64,
    exchange: str = "auto",
) -> Dataset:
    """Keyed exchange delivering WHOLE hash partitions to
    ``partition_fn`` (all rows of every key that hashes there, in one
    table) instead of walking per-key groups. For operators with a
    fully vectorized multi-key kernel — joins via searchsorted, segment
    reductions — where a per-key Python call (grouped_apply) would pay
    key-cardinality overhead. ``partition_fn`` must handle 0-row input
    (typed empty) and must not depend on which keys share a partition.
    Same cost-based exchange policy as :func:`grouped_apply`."""
    if exchange not in ("auto", "sort", "raycore"):
        raise ValueError(f"unknown exchange {exchange!r}")
    if exchange != "sort":
        try:
            mat = ds.materialize()
            n_blocks = mat.num_blocks()
        except Exception:
            mat = None
        if mat is not None:
            if (
                exchange == "raycore"
                or n_blocks * num_partitions <= _RAYCORE_MAX_REFS
            ):
                return _raycore_exchange_partitions(
                    mat, keys, partition_fn, num_partitions
                )
            ds = mat

    def add_part(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(*(batch[k] for k in keys))
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column(_PART_COL, pa.array(part, pa.int64()))

    def per_partition(part: pa.Table) -> pa.Table:
        return partition_fn(part.drop_columns([_PART_COL]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby(_PART_COL)
        .map_groups(per_partition, batch_format="pyarrow")
    )


def _raycore_exchange_partitions(
    ds: Dataset,
    keys: list[str],
    partition_fn: Callable[[pa.Table], pa.Table],
    num_groups: int,
) -> Dataset:
    """Two-stage raw-task exchange variant for whole-partition fns."""
    import ray
    import ray.data

    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    G = max(1, num_groups)
    # typed empty derived driver-side: when EVERY block is one of Ray's
    # zero-column empty placeholders, the in-task fallbacks below would
    # otherwise hand partition_fn a table without the key columns
    try:
        s = ds.schema(fetch_if_missing=True)
        typed_empty = pa.schema(list(zip(s.names, s.types))).empty_table()
        if not all(k in typed_empty.schema.names for k in keys):
            typed_empty = None
    except Exception:
        typed_empty = None

    @ray.remote
    def split(G: int, *tabs: pa.Table):
        live = [t for t in tabs if t.num_rows]
        if not live:
            # Ray emits zero-column placeholder blocks for empty splits
            # (the UDF is never called on them), so an empty block may
            # lack the key columns entirely — pass one through unhashed;
            # reduce drops zero-row slices.
            e = next(
                (
                    t
                    for t in tabs
                    if all(k in t.schema.names for k in keys)
                ),
                typed_empty if typed_empty is not None else tabs[0],
            ).slice(0, 0)
            return tuple(e for _ in range(G)) if G > 1 else e
        t = live[0] if len(live) == 1 else pa.concat_tables(live)
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
            base = next(
                (
                    s
                    for s in slices
                    if all(k in s.schema.names for k in keys)
                ),
                typed_empty if typed_empty is not None else slices[0],
            )
            return partition_fn(base.slice(0, 0))
        t = live[0] if len(live) == 1 else pa.concat_tables(live)
        return partition_fn(t)

    bundles = _bundle_refs(refs)
    map_refs = [
        split.options(num_returns=G).remote(G, *b) for b in bundles
    ]
    if G == 1:
        map_refs = [[r] for r in map_refs]
    red = [
        reduce.remote(*(map_refs[m][g] for m in range(len(map_refs))))
        for g in range(G)
    ]
    return ray.data.from_arrow_refs(red)


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



def _bundle_refs(refs: list) -> list[list]:
    """Group block refs into at most ~CPU-count contiguous bundles so
    the raycore split-task count (and the blocks x groups ref count)
    tracks cores, not input block count — 128 tiny blocks would
    otherwise mean 128 split tasks x G slices each. Contiguity
    preserves (block, row) order for first-row-per-key semantics."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 32)) or 32
    except Exception:
        cpus = 32
    n_bundles = max(1, min(len(refs), cpus))
    bounds = np.linspace(0, len(refs), n_bundles + 1).astype(int)
    return [
        refs[bounds[i] : bounds[i + 1]]
        for i in range(n_bundles)
        if bounds[i + 1] > bounds[i]
    ]


def raycore_grouped_apply(
    ds: Dataset,
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_groups: int = 16,
    min_group_size: int = 1,
    passthrough_singletons: bool = False,
    empty_out: pa.Table | None = None,
) -> Dataset:
    """`grouped_apply` on the raw-Ray two-stage exchange instead of the
    Dataset sort-shuffle (same pattern as stages/exchange.py: map tasks
    split blocks into G hash-range slices, G reduce tasks walk per-key
    runs). ~5x lower shuffle overhead at materialized-input sizes; it
    consumes block refs, so the input should already be materialized.
    Same kernel as the sort path (``_walk_partition``), so semantics —
    including ``passthrough_singletons`` and the collision guard — are
    identical; creates blocks x G refs, so ``grouped_apply``'s auto
    policy only picks it under ``_RAYCORE_MAX_REFS``."""
    import ray
    import ray.data

    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    G = max(1, num_groups)

    @ray.remote
    def split(G: int, *tabs: pa.Table):
        live = [t for t in tabs if t.num_rows]
        if not live:
            # Ray emits zero-column placeholder blocks for empty splits
            # (the UDF is never called on them), so an empty block may
            # lack the key columns entirely — pass one through unhashed;
            # reduce drops zero-row slices.
            e = next(
                (
                    t
                    for t in tabs
                    if all(k in t.schema.names for k in keys)
                ),
                tabs[0],
            ).slice(0, 0)
            return tuple(e for _ in range(G)) if G > 1 else e
        t = live[0] if len(live) == 1 else pa.concat_tables(live)
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
            if empty_out is not None:
                return empty_out
            # all-empty group: fn still needs a typed 0-row input for
            # schema stability; placeholder blocks may be zero-column,
            # so anchor on a slice that carries the key columns.
            base = next(
                (
                    s
                    for s in slices
                    if all(k in s.schema.names for k in keys)
                ),
                slices[0],
            )
            t = base.slice(0, 0)
        else:
            t = live[0] if len(live) == 1 else pa.concat_tables(live)
        return _walk_partition(
            t,
            keys,
            fn,
            min_group_size,
            passthrough_singletons,
            empty_out=empty_out,
        )

    bundles = _bundle_refs(refs)
    map_refs = [
        split.options(num_returns=G).remote(G, *b) for b in bundles
    ]
    if G == 1:
        map_refs = [[r] for r in map_refs]
    red = [
        reduce.remote(*(map_refs[m][g] for m in range(len(map_refs))))
        for g in range(G)
    ]
    return ray.data.from_arrow_refs(red)
