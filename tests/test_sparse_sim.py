"""Gates for the exact sparse cosine all-pairs join
(functions/sparse_sim.py).

The decision is all-integer (td^2 dot^2 >= tn^2 |a|^2 |b|^2), so the
DuckDB oracle is hash-exact — dot and both squared norms compare as
int64, no tolerance. Fixtures add: identical vectors (cos = 1, the
boundary >= must keep), orthogonal vectors (must drop), a planted
boundary pair sitting EXACTLY at tau (>= must keep), and the max_df
posting-list cap (oracle mirrors the cap, so still exact).
"""

import duckdb
import numpy as np
import pyarrow as pa

import ray

import __ray_entry__ as entry
from glue_etl_pipeline_ray.functions.sparse_sim import (
    cosine_pairs_exact,
    tf_with_norms,
)

SF = "/root/testdata/sf0.001"

ORACLE = """
WITH tf AS (
    SELECT o.o_custkey AS id, l.l_partkey AS term,
           CAST(count(*) AS BIGINT) AS c
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
), norms AS (
    SELECT id, CAST(sum(c * c) AS BIGINT) AS n2 FROM tf GROUP BY 1
), dots AS (
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(sum(a.c * b.c) AS BIGINT) AS dot
    FROM tf a JOIN tf b ON a.term = b.term AND a.id < b.id
    GROUP BY 1, 2
)
SELECT id_a, id_b, dot,
       na.n2 AS norm2_a, nb.n2 AS norm2_b
FROM dots
JOIN norms na ON na.id = id_a
JOIN norms nb ON nb.id = id_b
WHERE 25 * dot * dot >= na.n2 * nb.n2
ORDER BY id_a, id_b
"""


def _sorted_rows(df):
    if len(df) == 0:
        return []
    cols = ["id_a", "id_b", "dot", "norm2_a", "norm2_b"]
    return sorted(map(tuple, df[cols].to_numpy().tolist()))


def test_copurchase_cosine_matches_duckdb(ray_session):
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF}/{t}.parquet')"
        )
    exp = con.sql(ORACLE).df()
    got = entry.queries()["copurchase_cosine"](SF).to_pandas()
    assert _sorted_rows(got) == _sorted_rows(exp)
    assert len(exp) > 100  # non-vacuous at this sf (3180 expected)


def _tf_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "term": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    ).repartition(3)


def test_planted_identical_orthogonal_boundary(ray_session):
    rows = (
        # ids 1,2: identical vectors {10:2, 11:1} -> cos 1, kept
        [(1, 10)] * 2 + [(1, 11)]
        + [(2, 10)] * 2 + [(2, 11)]
        # id 3: orthogonal {20:5} -> no shared term, no candidate
        + [(3, 20)] * 5
        # ids 4,5: exactly at tau = 3/5 : a={30:3,31:4}, b={30:4,31:3}
        # dot=24, n2=25*25, cos=24/25 ... pick the true boundary below
        + [(4, 30)] * 3 + [(4, 31)] * 4
        + [(5, 30)] * 4 + [(5, 31)] * 3
    )
    ds = _tf_ds(rows)
    tf = tf_with_norms(ds, "id", "term")
    # tau = 24/25: pair (4,5) has dot=24, n2a=n2b=25 -> cos exactly
    # 24/25; the >= boundary must KEEP it
    got = cosine_pairs_exact(tf, tau_num=24, tau_den=25).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (1, 2) in pairs  # cos 1
    assert (4, 5) in pairs  # cos == tau exactly
    assert all(3 not in p for p in pairs)
    # one notch tighter and the boundary pair must drop
    got2 = cosine_pairs_exact(
        tf_with_norms(ds, "id", "term"), tau_num=241, tau_den=250
    ).to_pandas()
    pairs2 = set(zip(got2["id_a"], got2["id_b"]))
    assert (4, 5) not in pairs2 and (1, 2) in pairs2


def test_max_df_cap_matches_capped_oracle(ray_session):
    rng = np.random.default_rng(3)
    rows = [
        (int(i), int(t))
        for i, t in zip(
            rng.integers(0, 30, 600), rng.integers(0, 12, 600)
        )
    ]
    tf = tf_with_norms(_tf_ds(rows), "id", "term")
    got = cosine_pairs_exact(
        tf, tau_num=1, tau_den=5, max_df=20
    ).to_pandas()
    con = duckdb.connect()
    con.register(
        "occ",
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "term": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
    )
    exp = con.sql(
        """
        WITH tf AS (
            SELECT id, term, CAST(count(*) AS BIGINT) AS c
            FROM occ GROUP BY 1, 2
        ), norms AS (
            SELECT id, CAST(sum(c * c) AS BIGINT) AS n2 FROM tf GROUP BY 1
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY 1
        ), dots AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(sum(a.c * b.c) AS BIGINT) AS dot
            FROM tf a JOIN tf b ON a.term = b.term AND a.id < b.id
            JOIN df ON df.term = a.term AND df.df <= 20
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, dot, na.n2 AS norm2_a, nb.n2 AS norm2_b
        FROM dots JOIN norms na ON na.id = id_a
        JOIN norms nb ON nb.id = id_b
        WHERE 25 * dot * dot >= na.n2 * nb.n2
        """
    ).df()
    assert _sorted_rows(got) == _sorted_rows(exp)
    assert len(exp) > 0


def test_random_vectors_match_duckdb(ray_session):
    rng = np.random.default_rng(17)
    for _ in range(2):
        rows = [
            (int(i), int(t))
            for i, t in zip(
                rng.integers(0, 40, 800), rng.integers(0, 25, 800)
            )
        ]
        tf = tf_with_norms(_tf_ds(rows), "id", "term")
        got = cosine_pairs_exact(tf, tau_num=1, tau_den=3).to_pandas()
        con = duckdb.connect()
        con.register(
            "occ",
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "term": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
        )
        exp = con.sql(
            """
            WITH tf AS (
                SELECT id, term, CAST(count(*) AS BIGINT) AS c
                FROM occ GROUP BY 1, 2
            ), norms AS (
                SELECT id, CAST(sum(c * c) AS BIGINT) AS n2
                FROM tf GROUP BY 1
            ), dots AS (
                SELECT a.id AS id_a, b.id AS id_b,
                       CAST(sum(a.c * b.c) AS BIGINT) AS dot
                FROM tf a JOIN tf b ON a.term = b.term AND a.id < b.id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, dot, na.n2 AS norm2_a, nb.n2 AS norm2_b
            FROM dots JOIN norms na ON na.id = id_a
            JOIN norms nb ON nb.id = id_b
            WHERE 9 * dot * dot >= na.n2 * nb.n2
            """
        ).df()
        assert _sorted_rows(got) == _sorted_rows(exp)
