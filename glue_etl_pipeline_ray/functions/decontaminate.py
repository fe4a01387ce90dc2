"""Benchmark decontamination: drop/flag training documents that share
n-grams with an evaluation/benchmark set.

The standard contamination guard of LLM data pipelines (GPT-3 appendix C,
Dolma, FineWeb all ship a variant): build the set of benchmark n-grams
ONCE, broadcast it, and tag every training document whose text contains
any benchmark n-gram. Expressed Ray-Data-first:

- the benchmark side is reduced to a sorted ``uint64`` hash array by a
  REMOTE concat+unique task (the driver never materializes benchmark
  text, only holds an ObjectRef — same pattern as
  functions/similarity.py brute-force corpus assembly);
- the training side is one shuffle-free ``map_batches`` stage: all grams
  of a batch are hashed in ONE vectorized ``pd.util.hash_array`` call
  and membership is a ``searchsorted`` probe + ``np.add.reduceat``
  segment sum per document — no per-gram Python in the hot path.

At 100 TB the broadcast array is O(benchmark grams) ~ tens of MB for
real eval suites (plasma-shared per node, zero-copy into every task),
while the training scan stays embarrassingly parallel with zero
shuffles. Shingle convention matches ``dedup.ngram_jaccard_pairs``
(docs shorter than ``n`` tokens contribute their whole text as one
gram) so the DuckDB oracle in tests reproduces the tagging exactly;
hash-collision false positives are bounded by ~G^2/2^64 for G distinct
grams (negligible below ~10^8 grams; the pytest gate is hash-exact at
test scale).

Reference scope note: the reference pipeline (Gasta88/glue-etl-pipeline)
has no decontamination stage — this is part of the training-data
operator library the task brief requires beyond reference parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def _batch_gram_hashes(
    texts: list, shingle_n: int
) -> tuple[np.ndarray, np.ndarray]:
    """All (deduped-within-doc) gram hashes of a batch in one hash call.

    Returns ``(hashes, doc_lens)`` where ``hashes`` is the concatenation
    of each document's unique gram hashes and ``doc_lens[i]`` is how many
    of them belong to document i.
    """
    import pandas as pd

    grams: list[str] = []
    lens = np.zeros(len(texts), np.int64)
    for i, text in enumerate(texts):
        toks = (text or "").split(" ")
        if len(toks) < shingle_n:
            sh = {" ".join(toks)}
        else:
            sh = {
                " ".join(toks[j : j + shingle_n])
                for j in range(len(toks) - shingle_n + 1)
            }
        grams.extend(sh)
        lens[i] = len(sh)
    if not grams:
        return np.array([], np.uint64), lens
    h = pd.util.hash_array(np.array(grams, dtype=object), categorize=False)
    return h, lens


def benchmark_ngram_hashes(
    bench: Dataset,
    text_col: str = "text",
    shingle_n: int = 3,
) -> "ray.ObjectRef":
    """Sorted unique uint64 gram hashes of the benchmark set, as an
    ObjectRef to a numpy array assembled IN the object store."""

    def block_hashes(t: pa.Table) -> pa.Table:
        h, _ = _batch_gram_hashes(t[text_col].to_pylist(), shingle_n)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    parts = bench.map_batches(
        block_hashes, batch_format="pyarrow", batch_size=None
    )

    @ray.remote
    def reduce_unique(*tables: pa.Table) -> np.ndarray:
        # a fully-empty upstream can surface zero-row blocks still
        # carrying the pre-map schema — skip anything without data
        tabs = [t for t in tables if "h" in t.schema.names and t.num_rows]
        if not tabs:
            return np.array([], np.uint64)
        cat = pa.concat_tables(tabs)
        return np.unique(cat["h"].to_numpy(zero_copy_only=False))

    # one remote fold over the block partials; the driver only ever
    # holds the ObjectRef (at huge benchmark sizes, fold in a tree)
    return reduce_unique.remote(*parts.to_arrow_refs())


def decontaminate(
    train: Dataset,
    bench_hashes: "ray.ObjectRef",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    drop: bool = False,
) -> Dataset:
    """Tag (or drop) training docs sharing any n-gram with the benchmark.

    Output columns: ``id_col``, ``n_grams`` (distinct grams in the doc),
    ``n_overlap`` (how many are benchmark grams), ``contaminated``.
    With ``drop=True`` only clean rows survive and the tag columns are
    omitted (the production decontamination filter).
    """

    def tag(t: pa.Table) -> pa.Table:
        bh = ray.get(bench_hashes)  # zero-copy plasma view, once per batch
        h, lens = _batch_gram_hashes(t[text_col].to_pylist(), shingle_n)
        if len(bh) and len(h):
            pos = np.searchsorted(bh, h)
            pos[pos == len(bh)] = 0
            hit = (bh[pos] == h).astype(np.int64)
        else:
            hit = np.zeros(len(h), np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        n_overlap = np.zeros(len(lens), np.int64)
        nz = lens > 0
        if nz.any() and len(hit):
            sums = np.add.reduceat(hit, starts[nz])
            n_overlap[nz] = sums
        contaminated = n_overlap > 0
        if drop:
            return t.filter(pa.array(~contaminated))
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": pa.array(lens, pa.int64()),
                "n_overlap": pa.array(n_overlap, pa.int64()),
                "contaminated": pa.array(contaminated),
            }
        )

    return train.map_batches(tag, batch_format="pyarrow", batch_size=None)


def benchmark_embedding_matrix(
    bench: Dataset, vec_col: str = "embedding"
) -> "ray.ObjectRef":
    """L2-normalized float64 benchmark embedding matrix as an ObjectRef
    assembled IN the object store (one remote fold over block refs; the
    driver only ever holds the ref — the same broadcast discipline as
    the n-gram hash set)."""
    from glue_etl_pipeline_ray.functions.similarity import (
        _batch_matrix,
        _normalize,
    )

    @ray.remote
    def reduce_stack(*tables: pa.Table) -> np.ndarray:
        mats = [
            _batch_matrix(t, vec_col)
            for t in tables
            if vec_col in t.schema.names and t.num_rows
        ]
        if not mats:
            return np.zeros((0, 0), np.float64)
        return _normalize(np.vstack(mats))

    return reduce_stack.remote(*bench.to_arrow_refs())


def decontaminate_embed(
    train: Dataset,
    bench: Dataset,
    tau: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    drop: bool = True,
) -> Dataset:
    """Embedding-space benchmark decontamination — the SEMANTIC
    contamination guard (catches paraphrased/reworded benchmark leakage
    that n-gram overlap cannot see): keep a training row iff its max
    cosine against EVERY benchmark embedding is < ``tau``. The
    benchmark matrix (benchmark-sized = aggregate data by definition)
    broadcasts once via its object-store ref; the training side streams
    shuffle-free, one block matmul per batch. ``drop=False`` tags rows
    with ``max_bench_sim`` instead of filtering (audit mode)."""
    from glue_etl_pipeline_ray.functions.similarity import (
        _batch_matrix,
        _normalize,
    )

    ref = benchmark_embedding_matrix(bench, vec_col)

    def guard(t: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        if bm.size == 0:
            if drop:
                return t
            return t.append_column(
                "max_bench_sim",
                pa.array(np.zeros(t.num_rows), pa.float64()),
            )
        m = _normalize(_batch_matrix(t, vec_col))
        mx = (m @ bm.T).max(axis=1) if t.num_rows else np.zeros(0)
        if drop:
            return t.filter(pa.array(mx < tau))
        return t.append_column("max_bench_sim", pa.array(mx, pa.float64()))

    return train.map_batches(guard, batch_format="pyarrow", batch_size=None)
