"""Product-quantization ANN: codebook trainer determinism, ADC recall
vs the exact brute-force oracle, and the pure-ADC (no re-rank) floor."""

import numpy as np
import pytest
import ray

from glue_etl_pipeline_ray.functions.similarity import (
    cosine_topk,
    pq_topk,
    train_pq_codebooks,
)
from glue_etl_pipeline_ray.pipelines.queries import _query_vectors, _t

SF_DIR = "/root/testdata/sf0.001"


def _emb(sf_dir=SF_DIR):
    return _t(sf_dir, "embeddings", ["vec_id", "embedding"])


def _topk_sets(ds):
    df = ds.to_pandas()
    return {
        int(q): set(g.sort_values("rank")["vec_id"])
        for q, g in df.groupby("query_id")
    }


def test_codebooks_deterministic_and_shaped(ray_session):
    b1 = train_pq_codebooks(_emb(), m=8, n_codes=32)
    b2 = train_pq_codebooks(_emb(), m=8, n_codes=32)
    assert b1.shape == (8, 32, 8)  # d=64 -> 8 subspaces of 8 dims
    assert np.array_equal(b1, b2)  # seeded sample + seeded Lloyd
    b3 = train_pq_codebooks(_emb(), m=8, n_codes=32, seed=99)
    assert not np.array_equal(b1, b3)  # seed actually flows


def test_indivisible_dim_raises(ray_session):
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(_emb(), m=7)


def test_pq_rerank_recall_vs_brute(ray_session):
    q, ids = _query_vectors(SF_DIR)
    brute = _topk_sets(cosine_topk(_emb(), q, ids, k=10))
    pq = _topk_sets(pq_topk(_emb(), q, ids, k=10, rerank=4))
    recalls = [
        len(brute[i] & pq.get(i, set())) / len(brute[i]) for i in brute
    ]
    # isotropic synthetic embeddings are PQ's worst case; the exact
    # re-rank over 4k ADC candidates per block recovers most of it
    assert np.mean(recalls) >= 0.7, recalls


def test_pure_adc_floor_and_rerank_improves(ray_session):
    q, ids = _query_vectors(SF_DIR)
    brute = _topk_sets(cosine_topk(_emb(), q, ids, k=10))
    adc = _topk_sets(pq_topk(_emb(), q, ids, k=10, rerank=0))
    r_adc = np.mean(
        [len(brute[i] & adc.get(i, set())) / len(brute[i]) for i in brute]
    )
    rr = _topk_sets(pq_topk(_emb(), q, ids, k=10, rerank=4))
    r_rr = np.mean(
        [len(brute[i] & rr.get(i, set())) / len(brute[i]) for i in brute]
    )
    assert r_adc >= 0.2  # quantized-only scores still find signal
    assert r_rr >= r_adc  # exact re-rank can only help


def test_pq_output_contract(ray_session):
    q, ids = _query_vectors(SF_DIR)
    df = pq_topk(_emb(), q, ids, k=10).to_pandas()
    assert list(df.columns) == ["query_id", "rank", "vec_id"]
    for _, g in df.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) == 10
    # self-matches excluded
    assert not ((df["query_id"] == df["vec_id"]).any())
