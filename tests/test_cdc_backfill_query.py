"""cdc_backfill query gate: the backfilled lake equals the DuckDB LWW
window with the same derived column computed in SQL (hash-exact)."""

import duckdb
import numpy as np

from glue_etl_pipeline_ray.pipelines.queries import q_cdc_backfill

SF = "/root/testdata/sf0.001"

ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS user_id,
       event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents,
       CAST(round(value * 100) AS BIGINT) / 100.0 AS value_dollars
FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY event_id DESC) AS rn
    FROM read_parquet('{sf}/events.parquet')
)
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


def test_cdc_backfill_matches_duckdb_derived_column(ray_session):
    got = (
        q_cdc_backfill(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(ORACLE.format(sf=SF)).df()
    assert len(got) == len(exp) > 0
    for c in ("user_id", "event_type", "value_cents"):
        assert list(got[c]) == list(exp[c]), c
    assert np.allclose(got["value_dollars"], exp["value_dollars"])
