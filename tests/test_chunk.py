"""Pytest oracle for document chunking: reassembly losslessness,
overlap contract, exactly-once docs, edge sizes."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from glue_etl_pipeline_ray.functions.chunk import (
    chunk_documents,
    reassemble_tokens,
)


def _ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _words(rng, n):
    return " ".join(f"w{rng.integers(0, 50)}" for _ in range(n))


def test_chunk_reassembles_losslessly(ray_session):
    rng = np.random.default_rng(17)
    texts = [_words(rng, int(n)) for n in rng.integers(1, 400, 200)]
    texts += ["", "single", _words(rng, 64), _words(rng, 65), _words(rng, 8)]
    out = chunk_documents(_ds(texts), max_tokens=64, overlap=8).take_all()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["text"]))
    assert sorted(by_doc) == list(range(len(texts)))  # every doc present
    for did, chunks in by_doc.items():
        toks = reassemble_tokens(chunks, overlap=8)
        want = texts[did].split(" ") if texts[did] else []
        assert toks == want, did
        idxs = sorted(i for i, _ in chunks)
        assert idxs == list(range(len(idxs)))  # dense chunk indices


def test_chunk_overlap_and_size_contract(ray_session):
    rng = np.random.default_rng(23)
    text = _words(rng, 300)
    out = sorted(
        (r["chunk_idx"], r["text"], r["n_tokens"])
        for r in chunk_documents(
            _ds([text]), max_tokens=64, overlap=8
        ).take_all()
    )
    for idx, txt, n in out:
        assert n == len(txt.split(" ")) <= 64
    for (_, a, _), (_, b, _) in zip(out, out[1:]):
        at, bt = a.split(" "), b.split(" ")
        assert at[-8:] == bt[:8] or len(at) < 64  # shared overlap tokens
        assert len(bt) > 8  # successor always adds new tokens


def test_chunk_rejects_bad_overlap(ray_session):
    with pytest.raises(ValueError):
        chunk_documents(_ds(["x"]), max_tokens=8, overlap=8)


def test_chunk_query_entry_runs(ray_session):
    import __ray_entry__ as entry

    out = entry.queries()["doc_chunk"]("/root/testdata/sf0.001")
    assert out.count() >= 500  # at least one chunk per doc
