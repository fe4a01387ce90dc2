"""cdc_redrive query gate: the redriven lake equals a DuckDB LWW
window query over the stream with the dirt patched from the start."""

import duckdb

from glue_etl_pipeline_ray.pipelines.queries import q_cdc_redrive

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS user_id,
       event_type,
       CASE WHEN event_id % 13 = 0 THEN 0
            ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents
FROM (
    SELECT user_id, event_type, value, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY event_id DESC) AS rn
    FROM read_parquet('{sf}/events.parquet')
)
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


def test_cdc_redrive_matches_patched_stream_lww(ray_session):
    got = (
        q_cdc_redrive(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(ORACLE.format(sf=SF)).df()
    assert len(got) == len(exp) > 0
    for c in ("user_id", "event_type", "value_cents"):
        assert list(got[c]) == list(exp[c]), c
