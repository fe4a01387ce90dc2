"""Rank-family window function gate: hash-exact vs DuckDB."""

import duckdb

from glue_etl_pipeline_ray.pipelines.queries import q_rank_functions

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT event_id, user_id,
       CAST(dense_rank() OVER w AS BIGINT) AS dense_rank,
       percent_rank() OVER w AS percent_rank,
       CAST(ntile(4) OVER w2 AS BIGINT) AS tile4
FROM (SELECT event_id, user_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM read_parquet('{sf}/events.parquet'))
WINDOW w AS (PARTITION BY user_id ORDER BY cents),
       w2 AS (PARTITION BY user_id ORDER BY cents, event_id)
ORDER BY user_id, event_id
"""


def test_rank_functions_match_duckdb(ray_session):
    got = (
        q_rank_functions(SF)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(ORACLE.format(sf=SF)).df()
    assert len(got) == len(exp) > 0
    for c in ("event_id", "user_id", "dense_rank", "tile4"):
        assert list(got[c]) == list(exp[c]), c
    import numpy as np

    np.testing.assert_allclose(
        got["percent_rank"], exp["percent_rank"], rtol=0, atol=1e-15
    )


def test_rank_functions_planted_ties(ray_session):
    """Explicit tie fixture: equal cents must share dense_rank and
    percent_rank while ntile still fills tiles deterministically."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="ranks_")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(8), pa.int64()),
                "user_id": pa.array([1] * 8, pa.int64()),
                "ts": pa.array([0] * 8, pa.timestamp("us")),
                "event_type": pa.array(["view"] * 8),
                "value": pa.array(
                    [1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 3.0]
                ),
            }
        ),
        os.path.join(tmp, "events.parquet"),
    )
    got = (
        q_rank_functions(tmp)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["dense_rank"]) == [1, 1, 1, 2, 2, 3, 3, 3]
    exp_pct = [0.0] * 3 + [3 / 7] * 2 + [5 / 7] * 3
    assert list(got["percent_rank"]) == exp_pct
    assert list(got["tile4"]) == [1, 1, 2, 2, 3, 3, 4, 4]
