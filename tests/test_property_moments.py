"""Property gate for the moment aggregates: on RANDOM event streams
(not just the fixed sf0.001 fixture), grouped_stats stays BIT-exact
against DuckDB.

Generator contract (mirrors the real table's): values are 2-decimal
floats bounded to |v| <= 1e4, because (a) the engine's cents scaling
(`round(value*100)`) is only tie-free for 2-decimal inputs — numpy
rounds half to even, DuckDB half away from zero — and (b) the int64
block partial for sum(c^2) assumes c^2 * rows_per_block < 2^63, which
the bound guarantees by ~6 orders of magnitude. Both constraints are
data contracts the 50 oracle-window queries already rely on; this test
pins that INSIDE the contract the float outputs are reproducible
bit-for-bit from any draw."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_etl_pipeline_ray.pipelines.queries import q_grouped_stats
from tests.test_moment_aggregates import SQL


@st.composite
def event_stream(draw):
    n = draw(st.integers(min_value=8, max_value=400))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    types = rng.choice(["click", "view", "purchase", "signup"], size=n)
    # 2-decimal values in [-1e4, 1e4]; mix in exact .x5 cents values so
    # the scaling itself (not rounding luck) is what keeps parity
    vals = np.round(rng.uniform(-1e4, 1e4, size=n), 2)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "user_id": rng.integers(0, 7, size=n).astype(np.int64),
            "event_type": types,
            "value": vals,
            "props": ["{}"] * n,
        }
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(df=event_stream())
def test_grouped_stats_bit_exact_on_random_streams(ray_session, tmp_path_factory, df):
    work = tmp_path_factory.mktemp("moments")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(str(work), "events.parquet"))

    got = q_grouped_stats(str(work)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{work}/events.parquet')"
    )
    exp = con.sql(SQL["grouped_stats"]).df()
    got = got.sort_values("event_type").reset_index(drop=True)
    exp = exp[list(got.columns)].sort_values("event_type").reset_index(drop=True)

    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["sum_cents"].tolist() == exp["sum_cents"].tolist()
    # the point of the exercise: float equality with NO tolerance
    for c in ("mean_cents", "var_samp_cents2"):
        g = got[c].to_numpy()
        e = exp[c].to_numpy()
        # var is NaN for single-row groups in both engines
        assert np.array_equal(g, e, equal_nan=True), c
