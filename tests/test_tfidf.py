"""TF-IDF gate: the distributed pipeline must reproduce a
single-threaded reference of the same formula bit-for-bit."""

import numpy as np
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.functions.text import tfidf_topk_terms
from glue_etl_pipeline_ray.pipelines.queries import q_tfidf_terms

SF = "/root/testdata/sf0.001"


def _reference(docs, k=5, min_df=1):
    n = len(docs)
    df = {}
    for _, s in docs:
        for w in set((s or "").split(" ")):
            df[w] = df.get(w, 0) + 1
    rows = []
    for doc_id, s in docs:
        words = (s or "").split(" ")
        u, c = np.unique(np.array(words, dtype=object), return_counts=True)
        d = np.array([df[w] if df.get(w, 0) >= min_df else min_df for w in u])
        tf = c.astype(np.float64) / float(len(words))
        idf = np.log(float(n) / (1.0 + d.astype(np.float64)))
        sc = tf * idf
        top = np.lexsort((u, -sc))[:k]
        for r, i in enumerate(top, 1):
            rows.append((doc_id, u[i], r, sc[i]))
    return rows


def test_tfidf_matches_single_threaded_reference(ray_session):
    got = (
        q_tfidf_terms(SF)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    exp = _reference(docs, k=5)
    assert len(got) == len(exp)
    for (gid, gterm, grank, gscore), (eid, eterm, erank, escore) in zip(
        got.itertuples(index=False), exp
    ):
        assert (gid, gterm, grank) == (eid, eterm, erank)
        assert gscore == escore  # same fixed float64 expression


def test_tfidf_min_df_prunes_broadcast_not_ranks_of_kept_terms(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        tfidf_topk_terms(ds, k=3, min_df=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    exp = _reference(docs, k=3, min_df=2)
    assert len(got) == len(exp)
    for (gid, gterm, grank, _), (eid, eterm, erank, _) in zip(
        got.itertuples(index=False), exp
    ):
        assert (gid, gterm, grank) == (eid, eterm, erank)
