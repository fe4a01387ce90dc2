"""Profiler gate: exact stats match DuckDB; HLL distinct within bound."""

import duckdb
import numpy as np
import ray.data as rd

from glue_etl_pipeline_ray.functions.profile import profile_table
from glue_etl_pipeline_ray.pipelines.queries import q_profile_table

SF = "/root/testdata/sf0.001"


def test_profile_events_matches_duckdb(ray_session):
    got = q_profile_table(SF).to_pandas().set_index("column")
    for col in got.index:
        e = duckdb.sql(
            f"""SELECT count(*) AS n,
                       count(*) - count({col}) AS n_null,
                       count(DISTINCT {col}) AS nd,
                       min({col}) AS lo, max({col}) AS hi
                FROM read_parquet('{SF}/events.parquet')"""
        ).df().iloc[0]
        r = got.loc[col]
        assert r["n"] == e["n"] and r["n_null"] == e["n_null"], col
        # HLL p=12: allow 5% (3-sigma of 1.62%/sqrt-free bound)
        assert abs(r["approx_distinct"] - e["nd"]) <= max(2, 0.05 * e["nd"]), col
        if not np.isnan(r["min_num"]):
            lo, hi = e["lo"], e["hi"]
            if hasattr(lo, "timestamp"):
                lo, hi = lo.value / 1e3, hi.value / 1e3  # ns -> us
            assert float(r["min_num"]) == float(lo), col
            assert float(r["max_num"]) == float(hi), col
        else:
            assert r["min_str"] == str(e["lo"]) and r["max_str"] == str(e["hi"]), col


def test_profile_handles_nulls_and_subset(ray_session):
    import pyarrow as pa

    t = pa.table(
        {
            "a": pa.array([1, None, 3, None], pa.int64()),
            "b": pa.array(["x", "y", None, "x"], pa.string()),
        }
    )
    got = profile_table(rd.from_arrow(t), columns=["a", "b"]).to_pandas().set_index("column")
    assert got.loc["a", "n_null"] == 2 and got.loc["b", "n_null"] == 1
    assert got.loc["a", "min_num"] == 1.0 and got.loc["a", "max_num"] == 3.0
    assert got.loc["b", "min_str"] == "x" and got.loc["b", "max_str"] == "y"
    assert got.loc["b", "approx_distinct"] == 2


def test_profile_nan_does_not_poison_float_minmax(ray_session):
    """NaN is not Arrow-null (drop_null keeps it): min/max must come
    from the finite values regardless of block arrival order."""
    import pyarrow as pa

    t = pa.table(
        {
            "f": pa.array(
                [float("nan"), 1.5, float("nan"), 5.0, None, 2.0],
                pa.float64(),
            )
        }
    )
    got = (
        profile_table(rd.from_arrow(t).repartition(3), columns=["f"])
        .to_pandas()
        .set_index("column")
    )
    assert got.loc["f", "min_num"] == 1.5
    assert got.loc["f", "max_num"] == 5.0
    assert got.loc["f", "n_null"] == 1
