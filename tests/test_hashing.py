"""Bucket assignment must be stable across processes/runs (resume reads
bucket files written by an earlier run) — Python's salted hash() would
break this."""

import subprocess
import sys

import numpy as np
import pyarrow as pa

from glue_etl_pipeline_ray.hashing import (
    bucket_of,
    canonical_bytes,
    key_hash_u64,
    table_sha256,
)

_PROBE = (
    "from glue_etl_pipeline_ray.hashing import key_hash_u64;"
    "import numpy as np;"
    "print(key_hash_u64(np.array(['a/b','c/d'],object), np.array(['x','y'],object)).tolist())"
)


def test_hash_stable_across_processes():
    local = key_hash_u64(
        np.array(["a/b", "c/d"], object), np.array(["x", "y"], object)
    ).tolist()
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True, check=True,
        cwd="/root/repo",
    )
    assert eval(out.stdout.strip()) == local


def test_bucket_range_and_determinism():
    repos = pa.array([f"r{i}" for i in range(1000)])
    paths = pa.array([f"p{i % 7}" for i in range(1000)])
    b1 = bucket_of(64, repos, paths)
    b2 = bucket_of(64, repos, paths)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() < 64
    # reasonable spread
    assert len(set(b1.tolist())) > 32


def test_canonical_bytes_sorting_and_nulls():
    t1 = pa.table({"k": ["b", "a"], "v": [None, "x"]})
    t2 = pa.table({"k": ["a", "b"], "v": ["x", None]})
    assert canonical_bytes(t1, ["k"]) == canonical_bytes(t2, ["k"])
    assert table_sha256(t1, ["k"]) == table_sha256(t2, ["k"])
    # null is distinguishable from the string "NULL" and ""
    ta = pa.table({"k": ["a"], "v": [None]})
    tb = pa.table({"k": ["a"], "v": ["NULL"]})
    tc = pa.table({"k": ["a"], "v": [""]})
    hs = {table_sha256(x, ["k"]) for x in (ta, tb, tc)}
    assert len(hs) == 3


def test_empty_table_hash():
    t = pa.table({"k": pa.array([], pa.string())})
    assert canonical_bytes(t, ["k"]) == b""
