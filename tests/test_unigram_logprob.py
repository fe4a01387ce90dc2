"""Unigram-logprob gate: float64-identical (to summation-associativity
ULPs) vs a single-threaded reference; corpus-typical docs outscore
gibberish."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from glue_etl_pipeline_ray.functions.text import unigram_logprob_score
from glue_etl_pipeline_ray.pipelines.queries import q_unigram_logprob

SF = "/root/testdata/sf0.001"


def _reference(docs, min_count=1):
    from collections import Counter

    counts = Counter()
    total = 0
    for _, s in docs:
        ws = (s or "").split(" ")
        counts.update(ws)
        total += len(ws)
    out = {}
    for d, s in docs:
        ws = (s or "").split(" ")
        cnt = np.array(
            [counts[w] if counts[w] >= min_count else min_count for w in ws],
            np.float64,
        )
        lp = np.log(cnt / float(total))
        # match the engine's reduceat order exactly: reduceat sums
        # SEQUENTIALLY left-to-right (np.add.reduce would be pairwise)
        s = 0.0
        for v in lp:
            s += v
        out[d] = (len(ws), s / max(len(ws), 1))
    return out


def test_matches_single_threaded_reference(ray_session):
    got = q_unigram_logprob(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    exp = _reference(docs)
    assert len(got) == len(exp)
    for row in got.itertuples(index=False):
        n, lp = exp[row.doc_id]
        assert row.n_tokens == n
        # same float64 expression; reduceat's internal pairing may
        # differ from sequential accumulation by ~1 ULP
        assert abs(row.mean_logprob - lp) <= 1e-13 * abs(lp), row.doc_id


def test_gibberish_scores_below_typical_text(ray_session):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t["text"].to_pylist()[:50]
    gib = "xqzv jkwpf zzrtl qqnmb vvxko"  # tokens absent from the corpus
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts) + 1), pa.int64()),
            "text": pa.array(texts + [gib], pa.string()),
        }
    )
    got = (
        unigram_logprob_score(rd.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
    )
    gib_score = got.loc[len(texts), "mean_logprob"]
    typical = got.loc[: len(texts) - 1, "mean_logprob"]
    assert gib_score < typical.min()
