"""Range-sharded as-of join: equivalence with the unsharded operator on
a hot-key fixture where one key's rows span many shards (cross-shard
carry-in exercised, incl. shards with left rows but no right rows)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from glue_etl_pipeline_ray.functions.joins import (
    asof_join_backward,
    asof_join_backward_sharded,
)


def _fixture():
    rng = np.random.default_rng(17)
    n = 4000
    # key 7 is the mega key (60% of rows); keys 1-5 sparse
    keys = np.where(rng.random(n) < 0.6, 7, rng.integers(1, 6, n)).astype(np.int64)
    # right side sparse in time: long gaps force carries across shards
    on = np.sort(rng.integers(0, 1_000_000, n)).astype(np.int64)
    rng.shuffle(on)
    left = pa.table(
        {
            "k": pa.array(keys),
            "t": pa.array(on),
            "lid": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    # right side: only 5% of rows, values = their own time
    rmask = rng.random(n) < 0.05
    right = pa.table(
        {
            "k": pa.array(keys[rmask]),
            "t": pa.array(on[rmask]),
            "val": pa.array(on[rmask] * 10),
        }
    )
    return left, right


@pytest.mark.parametrize("width", [1_000, 50_000, 10_000_000, None])
def test_sharded_equals_unsharded(ray_session, width):
    left, right = _fixture()
    base = (
        asof_join_backward(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            by="k", on="t", left_cols=["lid"],
            right_value_col="val", out_col="prev",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    sharded = (
        asof_join_backward_sharded(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            by="k", on="t", left_cols=["lid"],
            right_value_col="val", out_col="prev",
            bucket_width=width,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(base) == len(sharded) == 4000
    assert base.equals(sharded), (
        base.compare(sharded).head() if len(base) == len(sharded) else "len"
    )
