"""ROWS-frame window aggregate gate: hash-exact vs DuckDB."""

import duckdb

from glue_etl_pipeline_ray.pipelines.queries import q_rows_frame_agg

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS frame_sum_cents,
       CAST(count(*) OVER w AS BIGINT) AS frame_n
FROM read_parquet('{sf}/events.parquet')
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def test_rows_frame_matches_duckdb(ray_session):
    got = (
        q_rows_frame_agg(SF)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(ORACLE.format(sf=SF)).df()
    assert len(got) == len(exp) > 0
    for c in ("event_id", "user_id", "frame_sum_cents", "frame_n"):
        assert list(got[c]) == list(exp[c]), c
