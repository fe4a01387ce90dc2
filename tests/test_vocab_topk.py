"""Vocabulary top-k gate: hash-exact vs DuckDB (outside the saturated
driver correctness window, so the oracle lives here)."""

import duckdb
import numpy as np

from glue_etl_pipeline_ray.functions.text import vocab_topk
from glue_etl_pipeline_ray.pipelines.queries import q_vocab_topk

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT u.t AS token, CAST(count(*) AS BIGINT) AS n
FROM read_parquet('{sf}/documents.parquet'),
     UNNEST(string_split(text, ' ')) AS u(t)
GROUP BY 1 ORDER BY n DESC, token ASC LIMIT {k}
"""


def test_vocab_topk_matches_duckdb(ray_session):
    got = q_vocab_topk(SF).to_pandas()
    exp = duckdb.sql(ORACLE.format(sf=SF, k=50)).df()
    assert list(got["token"]) == list(exp["token"])
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_vocab_topk_bigrams_match_duckdb(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = vocab_topk(ds, k=20, gram_n=2).to_pandas()
    exp = duckdb.sql(
        """
        WITH toks AS (
            SELECT string_split(text, ' ') AS t
            FROM read_parquet('{sf}/documents.parquet')
        ), bi AS (
            SELECT t[i] || ' ' || t[i+1] AS g
            FROM toks, UNNEST(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
        )
        SELECT g AS token, CAST(count(*) AS BIGINT) AS n
        FROM bi GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 20
        """.format(sf=SF)
    ).df()
    assert list(got["token"]) == list(exp["token"])
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
