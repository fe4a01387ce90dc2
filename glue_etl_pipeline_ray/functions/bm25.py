"""Distributed BM25 retrieval over the documents table.

The lexical-retrieval primitive of training-data curation (quality
classifier seeding, targeted subset mining, RAG corpus screens):
score every document against a bounded query-term set with BM25
(Robertson/Sparck Jones; public formula) and return the global top-k.

Scale shape (all shuffle-free):

1. one Mean/Count aggregate for (N, avgdl);
2. per-term document frequencies as per-block partial counts — a
   |terms|-row table per block, folded on the driver (terms are a
   bounded query set, never corpus vocabulary);
3. one scoring pass: tokens flattened once per batch (Arrow
   ``split_pattern`` + offsets -> numpy), per-term tf via masked
   bincount over doc indices — no Python per-row loop; block-local
   top-k; the driver folds blocks x k rows.

The corpus-side cost is exactly two streaming passes; nothing
corpus-sized ever lands on the driver or in a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Sum


def _flatten_tokens(t: pa.Table, text_col: str):
    """(tokens, doc_index, doc_len) for one batch, vectorized."""
    toks = pc.split_pattern(
        pc.coalesce(t[text_col], pa.scalar("", pa.string())), " "
    )
    toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    return flat, doc_idx, lens


def bm25_topk(
    ds: Dataset,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Global top-``k`` documents by BM25 score for ``query_terms``.

    Returns an aggregate-sized pa.Table (doc_id, score) sorted by
    (score desc, doc_id asc); score ties (including zero-hit corpora
    smaller than k) break deterministically on doc_id.
    """
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    term_arr = np.array(terms, dtype=object)

    # pass 0: N and avgdl (one aggregate over token counts)
    def doclen(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(
                pc.coalesce(t[text_col], pa.scalar("", pa.string())), " "
            )
        )
        return pa.table({"dl": pc.cast(n, pa.int64())})

    stats = (
        ds.map_batches(doclen, batch_format="pyarrow", batch_size=None)
        .aggregate(Count(), Sum("dl"))
    )
    # empty-dataset aggregate contract varies by Ray version: None, or
    # {"count()": 0, "sum(dl)": None} — either way there is no corpus
    if stats is None or not stats.get("count()"):
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    n_docs = int(stats["count()"])
    avgdl = float(stats["sum(dl)"]) / max(n_docs, 1)

    # pass 1: per-term document frequency (block partials, driver fold)
    def df_partial(t: pa.Table) -> pa.Table:
        flat, doc_idx, lens = _flatten_tokens(t, text_col)
        counts = np.zeros(len(terms), np.int64)
        for ti, term in enumerate(term_arr):
            hit_docs = np.unique(doc_idx[flat == term])
            counts[ti] = len(hit_docs)
        return pa.table(
            {
                "term_idx": pa.array(np.arange(len(terms)), pa.int64()),
                "df": pa.array(counts, pa.int64()),
            }
        )

    df = np.zeros(len(terms), np.int64)
    for row in ds.map_batches(
        df_partial, batch_format="pyarrow", batch_size=None
    ).iter_rows():
        df[row["term_idx"]] += row["df"]

    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    # pass 2: score + block-local top-k
    def score_topk(t: pa.Table) -> pa.Table:
        flat, doc_idx, lens = _flatten_tokens(t, text_col)
        norm = k1 * (1.0 - b + b * lens / avgdl)
        score = np.zeros(len(lens), np.float64)
        for ti, term in enumerate(term_arr):
            tf = np.bincount(
                doc_idx[flat == term], minlength=len(lens)
            ).astype(np.float64)
            score += idf[ti] * (tf * (k1 + 1.0)) / (tf + norm)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > k:
            # (-score, id) order, NOT argpartition: under score ties the
            # partition keeps an arbitrary subset, so the global result
            # would vary with block partitioning and violate the
            # documented doc_id tie-break (the final lexsort can only
            # order survivors, never recover ids a block discarded)
            part = np.lexsort((ids, -score))[:k]
        else:
            part = np.arange(len(ids))
        return pa.table(
            {
                id_col: pa.array(ids[part], pa.int64()),
                "score": pa.array(score[part], pa.float64()),
            }
        )

    parts = ds.map_batches(
        score_topk, batch_format="pyarrow", batch_size=None
    ).take_all()  # aggregate-sized: k rows per block
    ids = np.array([r[id_col] for r in parts], np.int64)
    sc = np.array([r["score"] for r in parts], np.float64)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "score": pa.array(sc[order], pa.float64()),
        }
    )
