"""Substring-dup gate: distributed result equals a single-threaded
reference of the same windowing contract; planted duplicated spans are
detected per the length guarantee."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from glue_etl_pipeline_ray.functions.dedup import substring_dup_stats

SF = "/root/testdata/sf0.001"


def _reference(docs, window, stride):
    def windows(s):
        s = s or ""
        if len(s) <= window:
            return {s}
        ws = {s[o : o + window] for o in range(0, len(s) - window, stride)}
        ws.add(s[len(s) - window :])
        return ws

    count = {}
    for _, s in docs:
        for w in windows(s):
            count[w] = count.get(w, 0) + 1
    out = {}
    for doc_id, s in docs:
        ws = windows(s)
        n_dup = sum(1 for w in ws if count[w] >= 2)
        out[doc_id] = (len(ws), n_dup)
    return out


def test_matches_single_threaded_reference(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = substring_dup_stats(ds, window=40, stride=20).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    exp = _reference(docs, 40, 20)
    assert len(got) == len(exp)
    for row in got.itertuples(index=False):
        n_w, n_dup = exp[row.doc_id]
        assert (row.n_windows, row.n_dup_windows) == (n_w, n_dup), row.doc_id
        assert row.has_dup_span == (n_dup > 0)


def test_planted_duplicated_span_is_detected(ray_session):
    # two long unique docs sharing one >= window+stride-1 char span
    rng = np.random.default_rng(5)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    shared = rand_text(80)  # >= 40 + 20 - 1
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    rand_text(200) + shared + rand_text(150),
                    rand_text(180) + shared + rand_text(170),
                    rand_text(400),  # clean
                ],
                pa.string(),
            ),
        }
    )
    got = (
        substring_dup_stats(rd.from_arrow(docs), window=40, stride=20)
        .to_pandas()
        .set_index("doc_id")
    )
    assert bool(got.loc[0, "has_dup_span"])
    assert bool(got.loc[1, "has_dup_span"])
    assert not bool(got.loc[2, "has_dup_span"])
