"""Distributed PageRank over an edge list (power iteration).

The third iterative-algorithm family next to k-means and the
connected-components rounds, using the same discipline the negative
result in BASELINE.md prescribes for iterative Dataset algorithms: the
rank vector is DRIVER-HELD aggregate state (like the k-means centroid
matrix), each iteration is ONE ``map_batches`` pass over the edge list
emitting per-block (dst, partial contribution) tables pre-combined with
``np.add.at`` — no shuffle, no join, no per-round block growth. The
driver folds block partials (bounded by |nodes| x blocks rows, node-id
indexed) and applies damping + dangling-mass redistribution.

Scale contract: |edges| streams (never materialized); |nodes| must fit
the driver (same bound as the centroid matrix — millions of nodes at
8 bytes/rank is fine). For billion-node graphs the rank vector itself
would hash-partition and the contribution pass become one keyed
exchange per iteration; documented, not needed at this scale.

Public recipe: Page et al. 1999; damping d, r' = (1-d)/N + d*(M r +
dangling_mass/N).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def pagerank(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 20,
) -> pa.Table:
    """Ranks for every node of the directed edge list. Returns an
    aggregate-sized ``(node, rank)`` table sorted by node id.

    Node ids must be non-negative int64; ranks sum to 1 (probability
    mass preserved each iteration, dangling mass redistributed)."""
    # pass 1: node universe + out-degrees (block partials, driver fold)
    def degree_partial(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False)
        d = t[dst_col].to_numpy(zero_copy_only=False)
        uniq_s, cnt = np.unique(s, return_counts=True)
        uniq_all = np.unique(np.concatenate([s, d]))
        deg = np.zeros(len(uniq_all), np.int64)
        deg[np.searchsorted(uniq_all, uniq_s)] = cnt
        return pa.table(
            {
                "node": pa.array(uniq_all, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
            }
        )

    deg_map: dict[int, int] = {}
    for row in edges.map_batches(
        degree_partial, batch_format="pyarrow", batch_size=None
    ).iter_rows():
        deg_map[row["node"]] = deg_map.get(row["node"], 0) + row["deg"]
    nodes = np.array(sorted(deg_map), np.int64)
    n = len(nodes)
    if n == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
        )
    deg = np.array([deg_map[x] for x in nodes], np.float64)
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

        incoming = np.zeros(n)
        for row in edges.map_batches(
            push, batch_format="pyarrow", batch_size=None
        ).iter_rows():
            incoming[row["i"]] += row["m"]
        dangling = r[deg == 0].sum()
        r = (1.0 - damping) / n + damping * (incoming + dangling / n)

    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "rank": pa.array(r, pa.float64())}
    )
