"""Gates for the round-4 breadth operators: left-outer hash join
(hash-exact vs DuckDB LEFT JOIN) and grouped HLL distinct (per-group
error bound vs exact)."""

import duckdb
import numpy as np

from glue_etl_pipeline_ray.pipelines.queries import (
    q_grouped_distinct_hll,
    q_left_outer_join,
)

SF = "/root/testdata/sf0.001"


def test_left_outer_join_matches_duckdb(ray_session):
    exp = (
        duckdb.sql(
            f"""
            SELECT c.c_custkey,
                   o.o_orderkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                       AS o_total_cents
            FROM read_parquet('{SF}/customer.parquet') c
            LEFT JOIN read_parquet('{SF}/orders.parquet') o
              ON o.o_custkey = c.c_custkey
            ORDER BY c_custkey, o_orderkey
            """
        )
        .df()
    )
    got = (
        q_left_outer_join(SF)
        .to_pandas()
        .sort_values(["c_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert list(got["c_custkey"]) == list(exp["c_custkey"])
    for c in ("o_orderkey", "o_total_cents"):
        g, e = got[c], exp[c]
        assert list(g.isna()) == list(e.isna()), c
        assert list(g.dropna().astype(np.int64)) == list(
            e.dropna().astype(np.int64)
        ), c
    # at sf0.001 every customer has orders, so null-extension is
    # covered by the synthetic test below


def test_left_outer_join_null_extends_unmatched_left(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from glue_etl_pipeline_ray.functions.groups import grouped_apply  # noqa: F401
    from glue_etl_pipeline_ray.pipelines import queries as Q

    import numpy as np
    import pyarrow.compute as pc  # noqa: F401
    import tempfile, os
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="loj_")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": pa.array(["a", "b", "c"]),
                "c_nationkey": pa.array([0, 0, 0], pa.int64()),
                "c_acctbal": pa.array([1.0, 2.0, 3.0]),
                "c_mktsegment": pa.array(["X", "X", "X"]),
            }
        ),
        os.path.join(tmp, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11], pa.int64()),
                "o_custkey": pa.array([1, 1], pa.int64()),
                "o_orderstatus": pa.array(["O", "O"]),
                "o_totalprice": pa.array([1.5, 2.5]),
                "o_orderdate": pa.array(["d", "d"]),
                "o_orderpriority": pa.array(["p", "p"]),
            }
        ),
        os.path.join(tmp, "orders.parquet"),
    )
    got = (
        Q.q_left_outer_join(tmp)
        .to_pandas()
        .sort_values(["c_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )
    # customer 1 x 2 orders; customers 2,3 null-extended
    assert list(got["c_custkey"]) == [1, 1, 2, 3]
    assert list(got["o_orderkey"].dropna().astype(np.int64)) == [10, 11]
    assert got["o_orderkey"].isna().tolist() == [False, False, True, True]
    assert got["o_total_cents"].isna().tolist() == [False, False, True, True]


def test_grouped_hll_within_error_bound(ray_session):
    exact = dict(
        duckdb.sql(
            f"""
            SELECT event_type, count(DISTINCT user_id)
            FROM read_parquet('{SF}/events.parquet') GROUP BY event_type
            """
        ).fetchall()
    )
    got = {
        r["event_type"]: r["distinct_est"]
        for r in q_grouped_distinct_hll(SF).take_all()
    }
    assert set(got) == set(exact)
    bound = 5 * 1.04 / (1 << 14) ** 0.5  # 5 sigma at p=14
    for k, est in got.items():
        assert abs(est - exact[k]) <= bound * exact[k] + 2, (
            k,
            est,
            exact[k],
        )
