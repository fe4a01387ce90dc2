"""PageRank gates: numpy power-iteration reference, probability-mass
conservation, planted-hub ordering, dangling handling."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from glue_etl_pipeline_ray.functions.pagerank import pagerank


def _reference(src, dst, iters=20, d=0.85):
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.bincount(si, minlength=n).astype(float)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.divide(r, deg, out=np.zeros_like(r), where=deg > 0)
        incoming = np.zeros(n)
        np.add.at(incoming, di, contrib[si])
        dangling = r[deg == 0].sum()
        r = (1.0 - d) / n + d * (incoming + dangling / n)
    return nodes, r


def _edges_ds(src, dst, nparts=3):
    return rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    ).repartition(nparts)


def test_pagerank_matches_reference_and_conserves_mass(ray_session):
    rng = np.random.default_rng(2)
    src = rng.integers(0, 200, 3000)
    dst = rng.integers(0, 200, 3000)
    out = pagerank(_edges_ds(src, dst), iters=15)
    nodes, ref = _reference(src, dst, iters=15)
    assert out["node"].to_numpy().tolist() == nodes.tolist()
    got = out["rank"].to_numpy()
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # probability mass conserved


def test_pagerank_planted_hub_ranks_first(ray_session):
    # star graph: every node points at node 0 (plus a ring so nothing
    # is dangling)
    n = 50
    src = np.concatenate([np.arange(1, n), np.arange(n)])
    dst = np.concatenate([np.zeros(n - 1, np.int64), (np.arange(n) + 1) % n])
    out = pagerank(_edges_ds(src, dst), iters=25)
    ranks = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    assert max(ranks, key=ranks.get) == 0
    # node 1 inherits the hub's whole rank through the ring edge, so
    # compare against the typical node, not the hub's neighbor
    others = sorted(v for k, v in ranks.items() if k not in (0, 1))
    assert ranks[0] > 3 * others[len(others) // 2]


def test_pagerank_distributed_path_matches_driver_path(ray_session):
    """The billion-node path (rank vector as a keyed Dataset, one
    hash-join + one keyed groupby per iteration) must land the SAME
    ranks as the driver-held path on the same graph, at two partition
    counts — and conserve mass. Graph includes dangling nodes."""
    rng = np.random.default_rng(9)
    src = rng.integers(0, 80, 600)
    dst = rng.integers(0, 100, 600)  # nodes 80..99 are pure sinks
    base = pagerank(_edges_ds(src, dst), iters=6)
    for nparts in (2, 5):
        out = pagerank(
            _edges_ds(src, dst),
            iters=6,
            nodes_fit_driver=False,
            num_partitions=nparts,
        )
        assert out["node"].to_pylist() == base["node"].to_pylist(), nparts
        np.testing.assert_allclose(
            out["rank"].to_numpy(), base["rank"].to_numpy(),
            rtol=0, atol=1e-9,
        )
        assert abs(out["rank"].to_numpy().sum() - 1.0) < 1e-9


def test_pagerank_tree_combine_matches_plain(ray_session):
    """The bounded tree-combine fold level is a pure reassociation of
    float sums over disjoint (i, m) partials — results identical."""
    rng = np.random.default_rng(4)
    src = rng.integers(0, 150, 2000)
    dst = rng.integers(0, 150, 2000)
    a = pagerank(_edges_ds(src, dst, nparts=6), iters=8)
    b = pagerank(_edges_ds(src, dst, nparts=6), iters=8, tree_combine=2)
    np.testing.assert_allclose(
        a["rank"].to_numpy(), b["rank"].to_numpy(), rtol=0, atol=1e-15
    )


def test_pagerank_partition_invariant_and_dangling(ray_session):
    # node 7 is a pure sink (dangling): mass must still sum to 1 and
    # results must not depend on edge partitioning
    src = np.array([0, 1, 2, 3, 4, 5, 6] * 3, np.int64)
    dst = np.array([7] * 21, np.int64)
    a = pagerank(_edges_ds(src, dst, nparts=1), iters=10)
    b = pagerank(_edges_ds(src, dst, nparts=7), iters=10)
    ra = a["rank"].to_numpy()
    rb = b["rank"].to_numpy()
    np.testing.assert_allclose(ra, rb, rtol=0, atol=1e-15)
    assert abs(ra.sum() - 1.0) < 1e-9
    ranks = dict(zip(a["node"].to_pylist(), ra))
    assert ranks[7] == max(ra)
