"""Distributed PageRank over an edge list (power iteration).

The third iterative-algorithm family next to k-means and the
connected-components rounds. Two execution paths share one contract
(ranks sum to 1, dangling mass redistributed, damping d,
r' = (1-d)/N + d*(M r + dangling_mass/N) — Page et al. 1999):

- ``nodes_fit_driver=True`` (default): the rank vector is DRIVER-HELD
  aggregate state (like the k-means centroid matrix). Each iteration is
  ONE ``map_batches`` pass over the edge list emitting per-block
  (dst, partial contribution) tables pre-combined with ``np.add.at`` —
  no shuffle, no join. The driver folds the partials VECTORIZED from
  Arrow block refs (one ``np.bincount`` over the concatenated partials,
  the k-means ``_combine_partials`` discipline — never ``iter_rows()``
  Python dicts), optionally through one bounded ``tree_combine``
  repartition level past ~10k blocks. Scale bound: |nodes| fits the
  driver (millions of nodes at 8 bytes/rank is fine); |edges| streams.

- ``nodes_fit_driver=False``: the billion-node path. The rank vector is
  itself a keyed ``Dataset`` ``(node, deg, rank)``; each iteration is
  one hash-shuffle equi-join (edges x per-node contributions on src)
  plus one keyed ``groupby(node)`` fold of (dst, contribution) partials
  — block-local pre-combine first, so the exchange carries at most
  |uniq dst per block| rows — and the dangling mass is one tiny scalar
  aggregate. Nothing node- or edge-scale ever lands on the driver.
  Partitioning assumption: Ray's hash shuffle distributes node keys
  evenly; a pathological all-edges-to-one-dst graph concentrates one
  group (the groupby fold for that key is a single vectorized bincount,
  so the skew cost is one task's memory, not quadratic work).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def _combine_im(t: pa.Table) -> pa.Table:
    """Fold co-located (i, m) partials: sum m per i (vectorized)."""
    i = t["i"].to_numpy(zero_copy_only=False)
    m = t["m"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(i, return_inverse=True)
    return pa.table(
        {
            "i": pa.array(uniq, pa.int64()),
            "m": pa.array(np.bincount(inv, weights=m), pa.float64()),
        }
    )


def _fold_tables(ds: Dataset, tree_combine: int | None) -> pa.Table:
    """Materialize a partial-carrying dataset and return ONE concatenated
    Arrow table of its blocks (bounded: rows-per-block x blocks), after an
    optional bounded tree-combine level for very large block counts."""
    if tree_combine:
        ds = ds.repartition(tree_combine).map_batches(
            _combine_im, batch_format="pyarrow", batch_size=None
        )
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table(
            {"i": pa.array([], pa.int64()), "m": pa.array([], pa.float64())}
        )
    return pa.concat_tables(tabs)


def pagerank(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 20,
    tree_combine: int | None = None,
    nodes_fit_driver: bool = True,
    num_partitions: int = 8,
) -> pa.Table:
    """Ranks for every node of the directed edge list. Returns an
    aggregate-sized ``(node, rank)`` table sorted by node id
    (``nodes_fit_driver=False`` returns the same table, assembled from
    the final distributed rank dataset — callers at true billion-node
    scale should use :func:`pagerank_dataset` and keep it distributed).

    Node ids must be non-negative int64; ranks sum to 1."""
    if not nodes_fit_driver:
        out = pagerank_dataset(
            edges, src_col, dst_col, damping, iters, num_partitions
        )
        t = pa.concat_tables(
            [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
            or [pa.table({"node": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.float64())})]
        ).select(["node", "rank"])
        return t.sort_by("node")

    # iterative consumer: pin the edge list in the object store ONCE
    # (spillable blocks) so the upstream pipeline — possibly a hash
    # join — is not re-executed every iteration
    edges = edges.materialize()

    # pass 1: node universe + out-degrees (block partials, driver fold
    # vectorized from Arrow refs — "i" carries the node id, "m" the degree)
    def degree_partial(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False)
        d = t[dst_col].to_numpy(zero_copy_only=False)
        uniq_s, cnt = np.unique(s, return_counts=True)
        uniq_all = np.unique(np.concatenate([s, d]))
        deg = np.zeros(len(uniq_all), np.float64)
        deg[np.searchsorted(uniq_all, uniq_s)] = cnt
        return pa.table(
            {
                "i": pa.array(uniq_all, pa.int64()),
                "m": pa.array(deg, pa.float64()),
            }
        )

    parts = _fold_tables(
        edges.map_batches(
            degree_partial, batch_format="pyarrow", batch_size=None
        ),
        tree_combine,
    )
    node_all = parts["i"].to_numpy(zero_copy_only=False)
    n = 0
    if len(node_all):
        nodes, inv = np.unique(node_all, return_inverse=True)
        deg = np.bincount(
            inv, weights=parts["m"].to_numpy(zero_copy_only=False)
        )
        n = len(nodes)
    if n == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
        )
    node_index_ref = ray.put(nodes)

    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        # contribution of each node: r/deg (0 for dangling)
        contrib = np.divide(r, deg, out=np.zeros_like(r), where=deg > 0)
        contrib_ref = ray.put(contrib)

        def push(t: pa.Table, _c=contrib_ref, _n=node_index_ref) -> pa.Table:
            c = ray.get(_c)
            idx = ray.get(_n)
            s = t[src_col].to_numpy(zero_copy_only=False)
            d = t[dst_col].to_numpy(zero_copy_only=False)
            si = np.searchsorted(idx, s)
            di = np.searchsorted(idx, d)
            sums = np.zeros(len(idx))
            np.add.at(sums, di, c[si])
            nz = np.flatnonzero(sums)
            return pa.table(
                {
                    "i": pa.array(nz, pa.int64()),
                    "m": pa.array(sums[nz], pa.float64()),
                }
            )

        folded = _fold_tables(
            edges.map_batches(push, batch_format="pyarrow", batch_size=None),
            tree_combine,
        )
        incoming = np.bincount(
            folded["i"].to_numpy(zero_copy_only=False),
            weights=folded["m"].to_numpy(zero_copy_only=False),
            minlength=n,
        )
        dangling = r[deg == 0].sum()
        r = (1.0 - damping) / n + damping * (incoming + dangling / n)

    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "rank": pa.array(r, pa.float64())}
    )


def pagerank_dataset(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 20,
    num_partitions: int = 8,
) -> Dataset:
    """Billion-node PageRank: the rank vector is a keyed Dataset
    ``(node, deg, rank)`` that never lands on the driver. Per iteration:
    one hash-shuffle join (edges x contributions on src) + one keyed
    groupby(node) folding (dst, contribution) partials + one scalar
    dangling-mass aggregate. Returns the final distributed
    ``(node, rank)`` dataset. Gated by equality with the driver-held
    path on the same graph at two partition counts
    (tests/test_pagerank.py)."""
    # iterative consumer: pin the edge blocks once (spillable), never
    # re-execute the upstream pipeline per iteration
    edges = edges.materialize()

    # node universe + out-degree: block partials then ONE keyed fold
    def degree_partial(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False)
        d = t[dst_col].to_numpy(zero_copy_only=False)
        uniq_s, cnt = np.unique(s, return_counts=True)
        uniq_all = np.unique(np.concatenate([s, d]))
        deg = np.zeros(len(uniq_all), np.float64)
        deg[np.searchsorted(uniq_all, uniq_s)] = cnt
        return pa.table(
            {
                "node": pa.array(uniq_all, pa.int64()),
                "deg": pa.array(deg, pa.float64()),
            }
        )

    universe = (
        edges.map_batches(degree_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .sum("deg")
        .map_batches(
            lambda t: pa.table(
                {"node": t["node"], "deg": pc.cast(t["sum(deg)"], pa.float64())}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .repartition(num_partitions)
        .materialize()
    )
    n = universe.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.float64())}
            )
        )

    rank = universe.map_batches(
        lambda t, _n=n: t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1.0 / _n), pa.float64())
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    for _ in range(iters):
        # tiny scalar aggregate: total rank mass parked on dangling nodes
        dangling = rank.map_batches(
            lambda t: pa.table(
                {
                    "x": pa.array(
                        [
                            float(
                                t["rank"]
                                .to_numpy(zero_copy_only=False)[
                                    t["deg"].to_numpy(zero_copy_only=False) == 0
                                ]
                                .sum()
                            )
                        ],
                        pa.float64(),
                    )
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).sum("x") or 0.0

        contrib = rank.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "c": pa.array(
                        np.divide(
                            t["rank"].to_numpy(zero_copy_only=False),
                            t["deg"].to_numpy(zero_copy_only=False),
                            out=np.zeros(t.num_rows),
                            where=t["deg"].to_numpy(zero_copy_only=False) > 0,
                        ),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).filter(lambda row: row["c"] > 0.0)

        # keyed exchange 1: edges x contributions on src (hash shuffle)
        joined = edges.select_columns([src_col, dst_col]).join(
            contrib,
            join_type="inner",
            num_partitions=num_partitions,
            on=(src_col,),
            right_on=("node",),
        )

        # block-local pre-combine: (dst -> sum c) so the groupby exchange
        # carries at most |uniq dst per block| rows, then keyed fold with
        # the universe (deg rides along via the union trick: universe rows
        # carry m=0, partial rows carry deg=0; one groupby sums both)
        def local_combine(t: pa.Table) -> pa.Table:
            d = t[dst_col].to_numpy(zero_copy_only=False)
            c = t["c"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(d, return_inverse=True)
            return pa.table(
                {
                    "node": pa.array(uniq, pa.int64()),
                    "deg": pa.array(np.zeros(len(uniq)), pa.float64()),
                    "m": pa.array(np.bincount(inv, weights=c), pa.float64()),
                }
            )

        partials = joined.map_batches(
            local_combine, batch_format="pyarrow", batch_size=None
        )
        base_rows = universe.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "deg": t["deg"],
                    "m": pa.array(np.zeros(t.num_rows), pa.float64()),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        folded = (
            base_rows.union(partials)
            .groupby("node")
            .sum(["deg", "m"])
        )

        base = (1.0 - damping) / n + damping * dangling / n

        def new_rank(t: pa.Table, _b=base, _d=damping) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"],
                    "deg": pc.cast(t["sum(deg)"], pa.float64()),
                    "rank": pa.array(
                        _b
                        + _d * t["sum(m)"].to_numpy(zero_copy_only=False),
                        pa.float64(),
                    ),
                }
            )

        rank = (
            folded.map_batches(new_rank, batch_format="pyarrow", batch_size=None)
            .repartition(num_partitions)
            .materialize()
        )

    return rank.select_columns(["node", "rank"])
