"""Grouped KLL gate: per-key sketch quantiles are within the rank-error
bound of the exact per-group quantiles."""

import numpy as np
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.pipelines.queries import q_grouped_quantiles_sketch

SF = "/root/testdata/sf0.001"


def test_grouped_kll_within_rank_error(ray_session):
    got = q_grouped_quantiles_sketch(SF).to_pandas()
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    df = t.to_pandas()
    df["cents"] = np.round(df["value"] * 100).astype(np.int64)
    groups = {k: np.sort(g["cents"].to_numpy()) for k, g in df.groupby("event_type")}
    assert set(got["event_type"]) == set(groups)
    for row in got.itertuples(index=False):
        vals = groups[row.event_type]
        assert row.n == len(vals)
        for q, v in ((0.5, row.p50), (0.9, row.p90)):
            rank = np.searchsorted(vals, v, side="right") / len(vals)
            assert abs(rank - q) <= 0.08, (row.event_type, q, rank)
