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


def test_interval_join_mega_interval_skew(ray_session):
    """Adversarial skew: one interval spanning the whole time domain is
    replicated to every bucket, so every event pairs through it — the
    per-group sweep must stay linear (depth(+1) per event, never E x I
    materialization). Exact counts vs a closed-form oracle on 10^6
    events; completing at all (in seconds, not hours) is the bound
    evidence, since the old E x I path would build a 10^12-pair set."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from glue_etl_pipeline_ray.functions.joins import interval_join

    n = 1_000_000
    width = 3_600_000_000  # 1h buckets
    span = 200 * width  # 200-bucket domain
    rng = np.random.default_rng(13)
    ts = rng.integers(0, span, n, dtype=np.int64)
    user = np.zeros(n, np.int64)  # ONE hot key: worst-case grouping
    left = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(user),
                "ts_us": pa.array(ts),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    )
    # one global interval + 50 short sessions at known offsets
    s_short = (np.arange(50, dtype=np.int64) * 4 + 1) * width
    e_short = s_short + width // 2
    starts = np.r_[np.int64(0), s_short]
    ends = np.r_[np.int64(span), e_short]
    right = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(np.zeros(51, np.int64)),
                "s": pa.array(starts),
                "e": pa.array(ends),
                "interval_id": pa.array(np.arange(51, dtype=np.int64)),
            }
        )
    )
    out = interval_join(
        left, right, "user_id", "ts_us", "s", "e",
        left_id_col="event_id", right_id_col="interval_id",
        bucket_width_us=width,
    ).to_pandas()
    # oracle: global interval matches every event; short ones by mask
    exp_global = n
    in_short = sum(
        int(((ts >= s) & (ts < e)).sum()) for s, e in zip(s_short, e_short)
    )
    assert len(out) == exp_global + in_short
    assert (out["right_id"] == 0).sum() == exp_global
    # spot-exactness on one short interval
    k = 7
    got_k = set(out.loc[out["right_id"] == k + 1, "left_id"])
    exp_k = set(
        np.arange(n)[(ts >= s_short[k]) & (ts < e_short[k])].tolist()
    )
    assert got_k == exp_k
