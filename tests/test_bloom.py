"""Bloom filter: no false negatives, sane fp rate, distributed build."""

import numpy as np
import pyarrow as pa

from glue_etl_pipeline_ray.functions.bloom import BloomFilter, bloom_from_dataset
from glue_etl_pipeline_ray.hashing import key_hash_u64


def test_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(9)
    members = rng.integers(0, 1 << 60, 5000).astype(np.uint64)
    others = rng.integers(0, 1 << 60, 20000).astype(np.uint64)
    others = np.setdiff1d(others, members)
    bf = BloomFilter(expected_items=5000, fp_rate=0.01)
    bf.add_hashes(members)
    assert bf.contains_hashes(members).all()  # NEVER a false negative
    fp = bf.contains_hashes(others).mean()
    assert fp < 0.03, fp  # ~1% target with slack
    assert bf.nbytes < 8 * 1024


def test_merge_equals_single_build():
    rng = np.random.default_rng(10)
    a = rng.integers(0, 1 << 60, 1000).astype(np.uint64)
    b = rng.integers(0, 1 << 60, 1000).astype(np.uint64)
    one = BloomFilter(2000, 0.01)
    one.add_hashes(np.concatenate([a, b]))
    left, right = BloomFilter(2000, 0.01), BloomFilter(2000, 0.01)
    left.add_hashes(a)
    right.add_hashes(b)
    assert np.array_equal(left.merge(right).bits, one.bits)


def test_bloom_from_dataset(ray_session):
    import ray.data as rd

    t = pa.table({"k": pa.array(list(range(500)), pa.int64())})
    ds = rd.from_arrow(t).repartition(4)
    bf = bloom_from_dataset(ds, ["k"], expected_items=500)
    h_in = key_hash_u64(t["k"])
    assert bf.contains_hashes(h_in).all()
    h_out = key_hash_u64(pa.array(list(range(10_000, 11_000)), pa.int64()))
    assert bf.contains_hashes(h_out).mean() < 0.05
