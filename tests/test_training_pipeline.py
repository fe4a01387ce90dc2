"""End-to-end training-data pipeline gate: stage accounting, packed-set
equality, capacity contract, determinism."""

import numpy as np
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.pipelines.queries import q_training_data_pipeline

SF = "/root/testdata/sf0.001"


def _single_threaded_survivors():
    """Reference replay of the stage chain (each stage already has its
    own distributed gate; this pins the COMPOSITION)."""
    import hashlib
    import re
    import unicodedata

    from glue_etl_pipeline_ray.functions.mixture import (
        _SPLIT_SALT,
        _unit_hash,
    )
    from glue_etl_pipeline_ray.functions.text import STOPWORDS

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    norm = []
    for d, s in rows:
        s = unicodedata.normalize("NFC", s or "").lower()
        s = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", s)
        s = re.sub(r"\s+", " ", s).strip()
        norm.append((d, s))
    qual = []
    for d, s in norm:
        toks = s.split(" ")
        n_stop = sum(1 for w in toks if w in STOPWORDS)
        if 5 <= len(toks) <= 100_000 and n_stop * 2 <= len(toks):
            qual.append((d, s, len(toks)))
    seen = {}
    for d, s, n in sorted(qual):
        fp = hashlib.md5(s.encode()).hexdigest()
        if fp not in seen:
            seen[fp] = (d, s, n)
    deduped = sorted(seen.values())
    bench_grams = set()
    for d, s in norm:
        if d % 17 == 0:
            toks = s.split(" ")
            if len(toks) < 3:
                bench_grams.add(s)
            else:
                bench_grams.update(
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                )
    clean = []
    for d, s, n in deduped:
        if d % 17 == 0:
            continue
        toks = s.split(" ")
        grams = (
            {s} if len(toks) < 3
            else {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        )
        if not (grams & bench_grams):
            clean.append((d, n))
    ids = np.array([d for d, _ in clean], np.int64)
    u = _unit_hash(ids, _SPLIT_SALT)
    return {
        int(d): int(n)
        for (d, n), uu in zip(clean, u)
        if uu < 0.9  # the train band of {train:.9, val:.05, test:.05}
    }


def test_pipeline_packs_exactly_the_surviving_train_docs(ray_session):
    got = q_training_data_pipeline(SF).to_pandas()
    expected = _single_threaded_survivors()
    assert set(got["doc_id"]) == set(expected)
    for row in got.itertuples(index=False):
        assert row.n_tokens == expected[row.doc_id]
    # capacity contract: per-sequence token sums <= 256 unless a solo
    # oversize doc (flagged truncated)
    seq = got.groupby("seq_id").agg(
        total=("n_tokens", "sum"), n=("doc_id", "count")
    )
    over = seq[seq["total"] > 256]
    assert (over["n"] == 1).all()


def test_pipeline_is_deterministic(ray_session):
    a = q_training_data_pipeline(SF).to_pandas().sort_values("doc_id")
    b = q_training_data_pipeline(SF).to_pandas().sort_values("doc_id")
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["seq_id"]) == list(b["seq_id"])
