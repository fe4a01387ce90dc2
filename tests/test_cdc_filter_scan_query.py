"""cdc_filter_scan gate: the predicate-pushdown read of the LWW lake
equals the DuckDB LWW window query with the same WHERE clause."""

import duckdb

from glue_etl_pipeline_ray.pipelines.queries import q_cdc_filter_scan

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS user_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY event_id DESC) AS rn
    FROM read_parquet('{sf}/events.parquet')
)
WHERE rn = 1 AND event_type <> 'error'
  AND event_type = 'purchase'
"""


def test_cdc_filter_scan_matches_duckdb(ray_session):
    got = (
        q_cdc_filter_scan(SF)
        .to_pandas()
        .sort_values(["user_id", "value_cents"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["user_id", "event_type", "value_cents"]
    exp = (
        duckdb.sql(ORACLE.format(sf=SF))
        .df()
        .sort_values(["user_id", "value_cents"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert (got["event_type"] == "purchase").all()
    assert list(got["user_id"]) == list(exp["user_id"])
    assert list(got["value_cents"]) == list(exp["value_cents"])
