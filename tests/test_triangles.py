"""Gates for degree-ordered triangle counting (functions/triangles.py).

1. Hash-exact DuckDB oracle on the co-supplier graph: distinct
   same-order supplier pairs, triangles via the (u<v<w) triple
   self-join, per-node counts by unpivot+group.
2. Planted graphs with known closed forms: K4 (every node in 3
   triangles), C5 cycle (none), star (none — the hub closes nothing),
   and K4 plus a pendant edge (pendant in 0).
3. Duplicate/reversed/self-loop edge rows must not change counts
   (canonicalization + distinct contract).
"""

import duckdb
import numpy as np
import pyarrow as pa

import ray

import __ray_entry__ as entry
from glue_etl_pipeline_ray.functions.triangles import (
    enumerate_run_pairs,
    triangle_counts,
)

SF = "/root/testdata/sf0.001"

ORACLE_SQL = """
WITH e AS (
    SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
), tri AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
) GROUP BY node ORDER BY node
"""


def _counts(tbl) -> dict[int, int]:
    if hasattr(tbl, "to_pandas"):
        tbl = tbl.to_pandas()
    if len(tbl) == 0:
        return {}
    return dict(zip(tbl["node"].tolist(), tbl["n_tri"].tolist()))


def _edges_ds(pairs: list[tuple[int, int]]):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


def test_co_supplier_graph_matches_duckdb(ray_session):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    )
    exp = con.sql(ORACLE_SQL).df()
    got = entry.queries()["triangle_count"](SF).to_pandas()
    assert got["node"].tolist() == exp["node"].tolist()
    assert got["n_tri"].tolist() == exp["n_tri"].tolist()
    assert got["n_tri"].sum() % 3 == 0  # every triangle counted thrice
    assert len(got) > 0  # the gate is not vacuous on this input


def test_planted_k4_cycle_star(ray_session):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = _counts(triangle_counts(_edges_ds(k4)))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    c5 = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]
    assert _counts(triangle_counts(_edges_ds(c5))) == {}

    star = [(0, i) for i in range(1, 9)]
    assert _counts(triangle_counts(_edges_ds(star))) == {}

    pendant = k4 + [(4, 99)]
    got = _counts(triangle_counts(_edges_ds(pendant)))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # 99 closes nothing


def test_dirty_edge_rows_are_canonicalized(ray_session):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    dirty = (
        k4
        + [(b, a) for a, b in k4]  # reversed duplicates
        + k4 * 3  # repeated rows
        + [(2, 2), (7, 7)]  # self-loops
    )
    got = _counts(triangle_counts(_edges_ds(dirty)))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_enumerate_run_pairs_shapes():
    run, i, j = enumerate_run_pairs(np.array([3, 1, 0, 2]))
    # run 0 (size 3): (0,1),(0,2),(1,2); run 3 (size 2): (0,1)
    assert run.tolist() == [0, 0, 0, 3]
    assert i.tolist() == [0, 0, 1, 0]
    assert j.tolist() == [1, 2, 2, 1]
    run, i, j = enumerate_run_pairs(np.array([], np.int64))
    assert len(run) == len(i) == len(j) == 0


def test_hub_chunking_still_exact(ray_session):
    # a graph big enough to split into multiple wedge tasks via a tiny
    # chunk budget: monkeypatch the module constant
    import glue_etl_pipeline_ray.functions.triangles as T

    rng = np.random.default_rng(11)
    n = 60
    pairs = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(800, 2))
        if a != b
    ]
    old = T._WEDGES_PER_TASK
    try:
        T._WEDGES_PER_TASK = 64  # force many chunks
        chunked = _counts(triangle_counts(_edges_ds(pairs)))
    finally:
        T._WEDGES_PER_TASK = old
    whole = _counts(triangle_counts(_edges_ds(pairs)))
    assert chunked == whole and len(whole) > 0
