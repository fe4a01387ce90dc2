"""Property-based invariants (hypothesis) for the two order-sensitive
row-reshaping operators: sequence packing and document chunking. The
deterministic unit tests pin concrete cases; these sweep arbitrary
shapes for the structural contracts."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

import ray.data as rd

from glue_etl_pipeline_ray.functions.chunk import (
    chunk_documents,
    reassemble_tokens,
)
from glue_etl_pipeline_ray.functions.pack import pack_sequences


@settings(max_examples=12, deadline=None)
@given(
    lengths=st.lists(st.integers(1, 600), min_size=1, max_size=60),
    capacity=st.integers(8, 256),
)
def test_pack_invariants(ray_session, lengths, capacity):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(lengths)), pa.int64()),
                "n_tokens": pa.array(lengths, pa.int64()),
            }
        )
    )
    rows = pack_sequences(ds, capacity=capacity).take_all()
    # exactly once
    assert sorted(r["doc_id"] for r in rows) == list(range(len(lengths)))
    fill: dict[int, list] = {}
    for r in rows:
        fill.setdefault(r["seq_id"], []).append(r)
    for members in fill.values():
        total = sum(min(r["n_tokens"], capacity) for r in members)
        assert total <= capacity
        # an oversize doc is always alone and flagged iff strictly over
        for r in members:
            if r["n_tokens"] >= capacity:
                assert len(members) == 1
                assert r["truncated"] == (r["n_tokens"] > capacity)


@settings(max_examples=12, deadline=None)
@given(
    data=st.data(),
    max_tokens=st.integers(2, 96),
)
def test_chunk_invariants(ray_session, data, max_tokens):
    overlap = data.draw(st.integers(0, max_tokens - 1))
    n_docs = data.draw(st.integers(1, 30))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    texts = [
        " ".join(f"t{rng.integers(0, 9)}" for _ in range(int(n)))
        if n > 0
        else ""
        for n in rng.integers(0, 300, n_docs)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = chunk_documents(
        ds, max_tokens=max_tokens, overlap=overlap
    ).take_all()
    by_doc: dict[int, list] = {}
    for r in out:
        assert r["n_tokens"] <= max_tokens
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["text"])
        )
    assert sorted(by_doc) == list(range(n_docs))
    for did, chunks in by_doc.items():
        want = texts[did].split(" ") if texts[did] else []
        assert reassemble_tokens(chunks, overlap) == want
