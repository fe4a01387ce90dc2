"""cdc_reshard query gate: mid-stream scale-out is invisible to the
final state (same DuckDB LWW oracle as the uninterrupted replay)."""

import duckdb

from glue_etl_pipeline_ray.pipelines.queries import q_cdc_reshard

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS user_id,
       event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY event_id DESC) AS rn
    FROM read_parquet('{sf}/events.parquet')
)
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


def test_cdc_reshard_matches_uninterrupted_lww(ray_session):
    got = (
        q_cdc_reshard(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(ORACLE.format(sf=SF)).df()
    assert len(got) == len(exp) > 0
    for c in ("user_id", "event_type", "value_cents"):
        assert list(got[c]) == list(exp[c]), c
