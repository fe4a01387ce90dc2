"""Hashed linear classifier gate: bit-exact vs a single-threaded
reference of the identical float64 expression; deterministic across
partitionings; discriminates planted token distributions."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from glue_etl_pipeline_ray.functions.classify import (
    _token_hashes,
    classifier_score,
)

SF = "/root/testdata/sf0.001"
DIM, SEED = 1 << 18, 7


def _reference(texts):
    rng = np.random.default_rng(SEED)
    w = rng.standard_normal(DIM).astype(np.float64)
    out = []
    for s in texts:
        toks = np.array((s or "").split(" "), dtype=object)
        if len(toks) == 0:
            out.append(1.0 / (1.0 + np.exp(0.0)))
            continue
        ids, owner = _token_hashes(
            toks, np.zeros(len(toks), np.int64), DIM
        )
        mean = w[ids].sum() / max(len(owner), 1)
        out.append(1.0 / (1.0 + np.exp(-mean)))
    return np.array(out)


def test_classifier_bit_exact_and_partition_stable(ray_session):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    ref = _reference(texts)

    got = (
        classifier_score(rd.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    order = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))
    np.testing.assert_allclose(
        got["score"].to_numpy(), ref[order], rtol=0, atol=5e-16
    )

    got2 = (
        classifier_score(rd.from_arrow(t).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["score"]) == list(got2["score"])


def test_classifier_separates_planted_distributions(ray_session):
    # two vocabularies -> two stable score populations, each constant
    a = ["alpha beta gamma delta"] * 50
    b = ["omega psi chi phi"] * 50
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100), pa.int64()),
                "text": pa.array(a + b, pa.string()),
            }
        )
    )
    df = classifier_score(ds).to_pandas().sort_values("doc_id")
    sa = df["score"].iloc[:50].to_numpy()
    sb = df["score"].iloc[50:].to_numpy()
    assert len(set(sa)) == 1 and len(set(sb)) == 1
    assert sa[0] != sb[0]
