"""Interval-join gate: hash-exact vs the DuckDB BETWEEN join."""

import duckdb

from glue_etl_pipeline_ray.pipelines.queries import q_interval_join

SF = "/root/testdata/sf0.001"

ORACLE = """
WITH ev AS (
    SELECT event_id, user_id, ts, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM read_parquet('{sf}/events.parquet')
), win AS (
    SELECT user_id, ts_us AS s, ts_us + CAST(45*60 AS BIGINT)*1000000 AS e,
           event_id AS interval_id
    FROM ev WHERE user_id % 10 = 0 AND event_type = 'signup'
)
SELECT ev.user_id, ev.event_id AS left_id, win.interval_id AS right_id
FROM ev JOIN win ON ev.user_id = win.user_id
               AND ev.ts_us >= win.s AND ev.ts_us < win.e
"""


def test_interval_join_matches_duckdb(ray_session):
    got = (
        q_interval_join(SF)
        .to_pandas()
        .sort_values(["user_id", "left_id", "right_id"])
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(ORACLE.format(sf=SF))
        .df()
        .sort_values(["user_id", "left_id", "right_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ("user_id", "left_id", "right_id"):
        assert list(got[c]) == list(exp[c]), c
    # self-matches exist (a signup is inside its own window) and real
    # containment matches exist beyond them
    assert (got["left_id"] != got["right_id"]).any()
