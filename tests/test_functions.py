"""Unit tests for the training-data operators: dedup families find
planted duplicates, similarity search returns exact neighbors, text
stats are correct, multimodal plumbing round-trips."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from glue_etl_pipeline_ray.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from glue_etl_pipeline_ray.functions.multimodal import (
    FakeMediaDecoder,
    FrameSampler,
    decode_real,
)
from glue_etl_pipeline_ray.functions.similarity import cosine_topk, ivf_topk
from glue_etl_pipeline_ray.functions.text import (
    quality_stats,
    rolling_fingerprint,
    token_stats,
)


@pytest.fixture(scope="module")
def docs():
    """40 distinct docs + planted duplicates: exact (id 100), near (101:
    one token changed), unrelated vocab (102)."""
    rng = np.random.default_rng(5)
    vocab = np.array("alpha beta gamma delta eps zeta eta theta iota kappa".split())
    texts = [" ".join(vocab[rng.integers(0, 10, 60)]) for _ in range(40)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    rows.append({"doc_id": 100, "text": texts[0]})  # exact dup of 0
    near = texts[1].split(" ")
    near[30] = "CHANGED"
    rows.append({"doc_id": 101, "text": " ".join(near)})  # near dup of 1
    rows.append({"doc_id": 102, "text": "totally different words here now"})
    return rd.from_items(rows)


def test_exact_dedup_keeps_min_id(docs):
    out = exact_dedup(docs).to_pandas()
    assert len(out) == 42  # 43 rows - 1 exact dup
    assert 0 in set(out.doc_id) and 100 not in set(out.doc_id)


def test_ngram_jaccard_finds_planted_pairs(docs):
    pairs = ngram_jaccard_pairs(docs, tau_num=4, tau_den=5).to_pandas()
    got = {tuple(p) for p in pairs[["doc_id_a", "doc_id_b"]].itertuples(index=False)}
    assert (0, 100) in got  # exact dup: jaccard 1.0
    assert (1, 101) in got  # near dup: ~0.9
    # verify integer jaccard bookkeeping on the exact pair
    row = pairs[(pairs.doc_id_a == 0) & (pairs.doc_id_b == 100)].iloc[0]
    assert row.inter == row.size_a == row.size_b


def test_minhash_lsh_finds_planted_pairs(docs):
    pairs = minhash_lsh_pairs(docs, min_agree_num=1, min_agree_den=2).to_pandas()
    got = {tuple(p) for p in pairs[["doc_id_a", "doc_id_b"]].itertuples(index=False)}
    assert (0, 100) in got and (1, 101) in got
    exact = pairs[(pairs.doc_id_a == 0) & (pairs.doc_id_b == 100)].iloc[0]
    assert exact.n_agree == 128  # identical signatures


def test_simhash_finds_exact_dup(docs):
    pairs = simhash_pairs(docs).to_pandas()
    got = {tuple(p) for p in pairs[["doc_id_a", "doc_id_b"]].itertuples(index=False)}
    assert (0, 100) in got
    assert pairs[(pairs.doc_id_a == 0) & (pairs.doc_id_b == 100)].hamming.iloc[0] == 0


def test_token_and_quality_stats():
    t = pa.table({"doc_id": [1, 2], "text": ["a b b the the the", "x"]})
    out = token_stats(t)
    assert out["n_tokens"].to_pylist() == [6, 1]
    assert out["n_uniq_tokens"].to_pylist() == [3, 1]
    q = quality_stats(t)
    assert q["n_stopwords"].to_pylist() == [4, 0]  # 'a' + 3x 'the'
    assert q["is_quality"].to_pylist() == [False, False]  # stop-heavy / short


def test_rolling_fingerprint_deterministic_and_shift_invariant():
    t1 = pa.table({"doc_id": [1], "text": ["a b c d e f g h i j k l"]})
    t2 = pa.table({"doc_id": [1], "text": ["ZZ a b c d e f g h i j k l"]})
    f1 = rolling_fingerprint(t1)["rolling_fp"].to_pylist()[0]
    f1b = rolling_fingerprint(t1)["rolling_fp"].to_pylist()[0]
    assert f1 == f1b
    # min-of-windows fingerprint often survives a prefix shift (winnowing)
    f2 = rolling_fingerprint(t2)["rolling_fp"].to_pylist()[0]
    assert f1 == f2


def _vec_ds(n=50, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    return (
        rd.from_items(
            [{"vec_id": i, "embedding": m[i].tolist()} for i in range(n)]
        ),
        m,
    )


def test_cosine_topk_matches_numpy_bruteforce():
    ds, m = _vec_ds()
    q = m[:2].astype(np.float64)
    out = cosine_topk(ds, q, [0, 1], k=5).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in (0, 1):
        sims = mn @ (q[qid] / np.linalg.norm(q[qid]))
        sims[qid] = -np.inf  # exclude self
        expect = np.lexsort((np.arange(len(sims)), -sims))[:5].tolist()
        got = out[out.query_id == qid].sort_values("rank").vec_id.tolist()
        assert got == expect


def test_ivf_topk_mostly_agrees_with_exact():
    ds, m = _vec_ds(n=200)
    q = m[:3].astype(np.float64)
    exact = cosine_topk(ds, q, [0, 1, 2], k=5).to_pandas()
    approx = ivf_topk(ds, q, [0, 1, 2], k=5, n_centroids=8, nprobe=4).to_pandas()
    # recall@5 >= 0.6 across queries (approximate by construction)
    inter = 0
    for qid in (0, 1, 2):
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        inter += len(e & a)
    assert inter >= 9  # 9/15


def test_media_decoder_plumbing():
    t = pa.table(
        {"doc_id": [1, 2], "payload": [b"hello world", b""],
         "n_bytes": [11, 0]}
    )
    out = FakeMediaDecoder()(t)
    assert out["width"].to_pylist()[0] in range(64, 256)
    assert len(out["content_digest"].to_pylist()[0]) == 16
    # deterministic
    again = FakeMediaDecoder()(t)
    assert out["content_digest"].to_pylist() == again["content_digest"].to_pylist()


def test_frame_sampler_explodes_rows():
    t = pa.table({"doc_id": [7], "payload": [bytes(range(100))]})
    out = FrameSampler(n_frames=4)(t)
    assert out.num_rows == 4
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 3]
    assert all(len(b) > 0 for b in out["frame_bytes"].to_pylist())


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG")


def test_embed_cosine_pairs_brute_vs_lsh(ray_session):
    """LSH pair set must be a subset of brute-force (exact) pairs; with
    generous bands at this tiny scale it should equal it."""
    import numpy as np
    import ray.data as rd

    from glue_etl_pipeline_ray.functions.similarity import embed_cosine_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16))
    # plant near-duplicates: rows 40..49 are jittered copies of 0..9
    dup = base[:10] + rng.standard_normal((10, 16)) * 0.05
    vecs = np.vstack([base, dup])
    ds = rd.from_items(
        [
            {"vec_id": i, "embedding": vecs[i].astype("float32").tolist()}
            for i in range(len(vecs))
        ]
    )
    brute = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embed_cosine_pairs(ds, threshold=0.95, method="brute").take_all()
    }
    lsh = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embed_cosine_pairs(ds, threshold=0.95, method="lsh").take_all()
    }
    planted = {(i, i + 40) for i in range(10)}
    assert planted <= brute
    assert lsh <= brute
    assert len(lsh) >= len(brute) * 0.8


def test_hll_distinct_within_error_bound(ray_session):
    import ray.data as rd

    from glue_etl_pipeline_ray.functions.sketch import hll_distinct

    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 20_000, 100_000)  # ~19.9k distinct
    ds = rd.from_arrow(pa.table({"k": vals}))
    exact = len(set(vals.tolist()))
    res = hll_distinct(ds, ["k"], p=14)
    assert abs(res["estimate"] - exact) / exact < 3 * res["rel_error"]
