"""Random-projection gate: determinism, shape, linearity, and the JL
pairwise-distance property at moderate output dim."""

import numpy as np
import ray.data as rd

from glue_etl_pipeline_ray.functions.similarity import random_projection

SF = "/root/testdata/sf0.001"


def _mat(df):
    return np.array(df["embedding"].tolist(), dtype=np.float64)


def test_projection_shape_and_determinism(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    a = random_projection(ds, out_dim=16, seed=7).to_pandas().sort_values("vec_id")
    b = random_projection(ds, out_dim=16, seed=7).to_pandas().sort_values("vec_id")
    assert _mat(a).shape[1] == 16
    assert np.array_equal(_mat(a), _mat(b))  # bit-identical across runs
    c = random_projection(ds, out_dim=16, seed=8).to_pandas().sort_values("vec_id")
    assert not np.array_equal(_mat(a), _mat(c))  # seed matters


def test_projection_preserves_pairwise_distances(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    orig = ds.to_pandas().sort_values("vec_id")
    proj = (
        random_projection(ds, out_dim=64, seed=1)
        .to_pandas()
        .sort_values("vec_id")
    )
    x, y = _mat(orig)[:100], _mat(proj)[:100]
    dx = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=2)
    dy = np.linalg.norm(y[:, None, :] - y[None, :, :], axis=2)
    iu = np.triu_indices(100, 1)
    ratio = dy[iu] / np.maximum(dx[iu], 1e-12)
    # JL at k=64: the BULK of pair distances within ~35%; allow sparse tails
    assert np.median(ratio) > 0.8 and np.median(ratio) < 1.2
    assert (np.abs(ratio - 1.0) < 0.5).mean() > 0.95
