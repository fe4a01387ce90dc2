"""cdc_pruned_scan gate: the projection-pushdown read of the LWW lake
equals the DuckDB LWW window query projected to the same columns."""

import duckdb

from glue_etl_pipeline_ray.pipelines.queries import q_cdc_pruned_scan

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS user_id, event_type
FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY event_id DESC) AS rn
    FROM read_parquet('{sf}/events.parquet')
)
WHERE rn = 1 AND event_type <> 'error'
"""


def test_cdc_pruned_scan_matches_duckdb(ray_session):
    got = (
        q_cdc_pruned_scan(SF)
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["user_id", "event_type"]
    exp = (
        duckdb.sql(ORACLE.format(sf=SF))
        .df()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert list(got["user_id"]) == list(exp["user_id"])
    assert list(got["event_type"]) == list(exp["event_type"])
