"""Deterministic-shuffle gate: permutation, determinism, seed
sensitivity, shard balance."""

import numpy as np
import ray.data as rd

from glue_etl_pipeline_ray.functions.mixture import deterministic_shuffle

SF = "/root/testdata/sf0.001"


def _ds():
    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])


def _order(seed, n_shards=None):
    out = deterministic_shuffle(_ds(), seed=seed, n_shards=n_shards)
    df = out.to_pandas()
    return df


def test_shuffle_is_deterministic_permutation(ray_session):
    a = _order(seed=1)
    b = _order(seed=1)
    src = _ds().to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])  # same seed, same order
    assert sorted(a["doc_id"]) == sorted(src["doc_id"])  # a permutation
    assert list(a["doc_id"]) != sorted(a["doc_id"])  # actually shuffled


def test_shuffle_seed_changes_order(ray_session):
    a = _order(seed=1)
    b = _order(seed=2)
    assert list(a["doc_id"]) != list(b["doc_id"])
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_shuffle_shards_balanced_and_deterministic(ray_session):
    df = _order(seed=3, n_shards=8)
    assert set(df.columns) == {"doc_id", "shard"}
    sizes = df.groupby("shard").size()
    assert len(sizes) == 8
    # balanced in expectation: no shard more than 2x the mean at n~600
    assert sizes.max() < 2 * sizes.mean()
    # shard is a pure function of (id, seed): recompute matches
    df2 = _order(seed=3, n_shards=8)
    m1 = dict(zip(df["doc_id"], df["shard"]))
    m2 = dict(zip(df2["doc_id"], df2["shard"]))
    assert m1 == m2
