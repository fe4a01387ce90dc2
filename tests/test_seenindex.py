"""Cross-batch novel-content filter gate: survivors match a
single-threaded set-based oracle across batches, replay is empty,
and the stage/commit window is crash-safe."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from glue_etl_pipeline_ray.state.seenindex import SeenIndex, _fp128

SF = "/root/testdata/sf0.001"


def _batches():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    # sf0.001 documents are all-unique; truncate to the first 3 tokens so
    # real duplicate CONTENT exists both within and across batches
    texts = pa.array(
        [" ".join((s or "").split(" ")[:3]) for s in t["text"].to_pylist()],
        pa.string(),
    )
    t = pa.table({"doc_id": t["doc_id"], "text": texts})
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    return [t.filter(pa.array(ids % 3 == i)) for i in range(3)]


def _oracle(batches):
    seen = set()
    out = []
    for b in batches:
        keep = []
        batch_first = {}
        for doc_id, text in sorted(
            zip(b["doc_id"].to_pylist(), b["text"].to_pylist())
        ):
            if text in seen or text in batch_first:
                continue
            batch_first[text] = doc_id
            keep.append(doc_id)
        seen.update(batch_first)
        out.append(sorted(keep))
    return out


def test_novel_filter_matches_set_oracle_across_batches(
    ray_session, tmp_path
):
    idx = SeenIndex(str(tmp_path / "seen"), num_buckets=8)
    batches = _batches()
    expected = _oracle(batches)
    for i, b in enumerate(batches):
        got = idx.filter_novel(
            rd.from_arrow(b), batch_id=i, content_col="text", seq_col="doc_id"
        ).to_pandas()
        assert sorted(got["doc_id"]) == expected[i], f"batch {i}"
        idx.commit(i)
        assert idx.watermark() == i
    # there IS cross-batch duplication in the synthetic corpus
    total_rows = sum(b.num_rows for b in batches)
    assert sum(len(e) for e in expected) < total_rows


def test_committed_batch_replays_empty(ray_session, tmp_path):
    idx = SeenIndex(str(tmp_path / "seen"), num_buckets=8)
    b = _batches()[0]
    idx.filter_novel(
        rd.from_arrow(b), batch_id=0, content_col="text", seq_col="doc_id"
    ).materialize()
    idx.commit(0)
    again = idx.filter_novel(
        rd.from_arrow(b), batch_id=0, content_col="text", seq_col="doc_id"
    ).to_pandas()
    assert len(again) == 0
    idx.commit(0)  # idempotent no-op
    assert idx.watermark() == 0


def test_crash_before_commit_is_exactly_once(ray_session, tmp_path):
    idx = SeenIndex(str(tmp_path / "seen"), num_buckets=8)
    batches = _batches()
    expected = _oracle(batches)
    # batch 0 committed normally
    idx.filter_novel(
        rd.from_arrow(batches[0]), 0, content_col="text", seq_col="doc_id"
    ).materialize()
    idx.commit(0)
    # batch 1 filtered but NOT committed (simulated crash window)
    first = idx.filter_novel(
        rd.from_arrow(batches[1]), 1, content_col="text", seq_col="doc_id"
    ).to_pandas()
    # a fresh "process" retries the same batch: identical survivors
    idx2 = SeenIndex(str(tmp_path / "seen"), num_buckets=8)
    retry = idx2.filter_novel(
        rd.from_arrow(batches[1]), 1, content_col="text", seq_col="doc_id"
    ).to_pandas()
    assert sorted(first["doc_id"]) == sorted(retry["doc_id"]) == expected[1]
    idx2.commit(1)
    # batch 2 now excludes everything batches 0-1 contributed
    got2 = idx2.filter_novel(
        rd.from_arrow(batches[2]), 2, content_col="text", seq_col="doc_id"
    ).to_pandas()
    assert sorted(got2["doc_id"]) == expected[2]


def test_fp128_halves_are_independent_streams():
    texts = pa.array([f"doc {i}" for i in range(1000)], pa.string())
    fp = _fp128(texts)
    raw = np.frombuffer(fp.tobytes(), dtype=">u8").reshape(-1, 2)
    h1, h2 = raw[:, 0], raw[:, 1]
    assert len(np.unique(fp)) == 1000
    # h2 must not be a pointwise function of h1's ordering alone:
    # rank correlation between the two streams is ~0 for independents
    r1 = np.argsort(np.argsort(h1)).astype(np.float64)
    r2 = np.argsort(np.argsort(h2)).astype(np.float64)
    corr = np.corrcoef(r1, r2)[0, 1]
    assert abs(corr) < 0.2


def test_tiebreak_without_seq_col_is_content_deterministic(
    ray_session, tmp_path
):
    """Without seq_col the survivor among equal-content rows is a pure
    function of row content (min full-row hash) — the same doc_id wins
    regardless of input row order or partitioning."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = pa.array(
        [" ".join((s or "").split(" ")[:2]) for s in t["text"].to_pylist()],
        pa.string(),
    )
    t = pa.table({"doc_id": t["doc_id"], "text": texts})

    def run(table, nparts):
        idx = SeenIndex(
            str(tmp_path / f"seen-{nparts}-{table['doc_id'][0]}"),
            num_buckets=4,
        )
        ds = rd.from_arrow(table).repartition(nparts)
        out = idx.filter_novel(ds, batch_id=0, content_col="text")
        return sorted(out.to_pandas()["doc_id"])

    fwd = run(t, 2)
    rev = run(t.take(pa.array(np.arange(t.num_rows)[::-1])), 7)
    assert fwd == rev
    # and survivors are one-per-distinct-content
    assert len(fwd) == len(set(texts.to_pylist()))
