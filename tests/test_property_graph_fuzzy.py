"""Hypothesis gates for the round-5 exact operators: random inputs,
DuckDB as the oracle.

- triangle_counts vs the triple-self-join on random multigraphs
  (duplicate rows, reversed edges, self-loops included by
  construction — the operator must canonicalize).
- vocab_lev1_pairs vs the quadratic ``levenshtein(a,b) = 1`` cross
  join on random short-alphabet vocabularies (a small alphabet forces
  dense deletion-variant buckets and plenty of true pairs).
"""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

import ray

from glue_etl_pipeline_ray.functions.fuzzy import vocab_lev1_pairs
from glue_etl_pipeline_ray.functions.triangles import triangle_counts


@settings(max_examples=5, deadline=None)
@given(s=st.tuples(st.integers(0, 2**31 - 1), st.integers(8, 25), st.integers(10, 250)))
def test_random_multigraph_triangles_match_duckdb(ray_session, s):
    seed, n_nodes, n_rows = s
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_rows).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_rows).astype(np.int64)
    edges = pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )
    got = triangle_counts(
        ray.data.from_arrow(edges).repartition(3), "src", "dst"
    )
    con = duckdb.connect()
    con.register("raw", edges)
    exp = con.sql(
        """
        WITH e AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ), tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1 JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node ORDER BY node
        """
    ).fetchall()
    got_rows = list(
        zip(got["node"].to_pylist(), got["n_tri"].to_pylist())
    )
    assert got_rows == [(int(a), int(b)) for a, b in exp]


@settings(max_examples=5, deadline=None)
@given(
    s=st.tuples(
        st.integers(0, 2**31 - 1), st.integers(2, 3), st.integers(5, 60)
    )
)
def test_random_vocab_lev1_matches_duckdb(ray_session, s):
    seed, alpha_n, n_words = s
    rng = np.random.default_rng(seed)
    alphabet = np.array(list("ab" + "c"[: alpha_n - 2]))
    words = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 6)))
        for _ in range(n_words)
    ]
    ds = ray.data.from_arrow(
        pa.table({"w": pa.array(words, pa.string())})
    ).repartition(3)
    got_tbl = vocab_lev1_pairs(ds, col="w", mode="values").to_pandas()
    got = (
        set(zip(got_tbl["word_a"], got_tbl["word_b"]))
        if len(got_tbl)
        else set()
    )
    con = duckdb.connect()
    con.register("vals", pa.table({"w": pa.array(words, pa.string())}))
    exp = {
        (a, b)
        for a, b in con.sql(
            """
            WITH words AS (SELECT DISTINCT w FROM vals)
            SELECT a.w, b.w FROM words a JOIN words b
            ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
               AND levenshtein(a.w, b.w) = 1
            """
        ).fetchall()
    }
    assert got == exp
