"""Round-3 operator units: connected components (both execution paths
vs a brute-force BFS oracle) and vectorized PII redaction."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from glue_etl_pipeline_ray.functions.cc import (
    _cc_numpy,
    connected_components,
)
from glue_etl_pipeline_ray.functions.text import REDACT_PATTERNS, redact


def _brute_components(src, dst):
    """BFS oracle: min node id per component."""
    adj: dict[int, set[int]] = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    out = {}
    seen = set()
    for start in adj:
        if start in seen:
            continue
        stack, comp = [start], []
        seen.add(start)
        while stack:
            n = stack.pop()
            comp.append(n)
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        label = min(comp)
        for n in comp:
            out[n] = label
    return out


def _random_edges(rng, n_nodes, n_edges):
    src = rng.integers(0, n_nodes, n_edges) * 7 + 3  # sparse, non-dense ids
    dst = rng.integers(0, n_nodes, n_edges) * 7 + 3
    keep = src != dst
    return src[keep].astype(np.int64), dst[keep].astype(np.int64)


@pytest.mark.parametrize("n_nodes,n_edges", [(30, 25), (200, 120), (500, 900)])
def test_cc_numpy_matches_bfs(n_nodes, n_edges):
    rng = np.random.default_rng(n_nodes + n_edges)
    src, dst = _random_edges(rng, n_nodes, n_edges)
    got = _cc_numpy(src, dst)
    want = _brute_components(src, dst)
    mine = dict(zip(got["node"].to_pylist(), got["component"].to_pylist()))
    assert mine == want


def test_cc_long_path_graph():
    # worst case for hash-min: one long chain (max diameter)
    n = 1000
    src = np.arange(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    got = _cc_numpy(src, dst)
    assert set(got["component"].to_pylist()) == {0}
    assert got.num_rows == n


def test_cc_distributed_equals_driver_path(ray_session):
    rng = np.random.default_rng(7)
    src, dst = _random_edges(rng, 120, 90)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    drv = connected_components(edges, driver_threshold=10**9)
    dist = connected_components(edges, driver_threshold=0)
    to_map = lambda ds: {
        r["node"]: r["component"] for r in ds.take_all()
    }  # noqa: E731
    assert to_map(drv) == to_map(dist)


def test_cc_empty_edges(ray_session):
    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    )
    got = connected_components(edges)
    assert got.count() == 0


def test_redact_counts_and_replaces():
    batch = pa.table(
        {
            "id": [1, 2, 3],
            "text": [
                "mail bob@example.com or call +1 555-867-5309 now",
                "account 0042 balance 77",
                "nothing here",
            ],
        }
    )
    out = redact(batch, "text", REDACT_PATTERNS)
    texts = out["text_redacted"].to_pylist()
    assert texts[0] == "mail <EMAIL> or call <PHONE> now"
    assert texts[1] == "account <NUMID> balance <NUMID>"
    assert texts[2] == "nothing here"
    assert out["n_email"].to_pylist() == [1, 0, 0]
    assert out["n_phone"].to_pylist() == [1, 0, 0]
    assert out["n_numid"].to_pylist() == [0, 2, 0]
    # original text column replaced, not duplicated
    assert "text" not in out.column_names
