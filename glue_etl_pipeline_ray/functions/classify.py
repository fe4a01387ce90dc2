"""Hashed-feature linear classifier scoring — the model-scoring stage
shape of production curation pipelines (fastText-style quality / domain
classifiers over CommonCrawl; public recipe: hash token n-grams into a
fixed-dim feature space, dot a weight vector, sigmoid).

Ray shape: the scorer is an ACTOR-POOL class — the weight vector loads
ONCE per actor in ``__init__`` (at real scale: a few hundred MB read
from storage, exactly the load-once-per-actor discipline the media
stages use), and ``__call__`` scores a batch fully vectorized:

    tokens -> flattened once per batch (Arrow split offsets)
           -> unigram + bigram 64-bit hashes mod dim   (numpy)
           -> per-token weight lookup w[h]             (one gather)
           -> per-doc sum via bincount on doc index    (no row loop)
           -> mean-pool, sigmoid

No shuffle, no driver materialization; the only state is the per-actor
weight vector. With no trained model shippable in this environment the
weights are a seeded deterministic vector — a pure function of
``(seed, dim)``, so every actor builds the identical model and the
output is reproducible (the same contract as the JL projection)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

_MULT = np.uint64(0x9E3779B97F4A7C15)
_BI_SALT = np.uint64(0xC2B2AE3D27D4EB4F)


def _token_hashes(flat: np.ndarray, doc_idx: np.ndarray, dim: int):
    """(hashed feature ids, their doc index) for unigrams + bigrams."""
    import pandas as pd

    h = pd.util.hash_array(flat, categorize=False)
    uni = h % np.uint64(dim)
    # bigram = mix(h_i, h_{i+1}) for adjacent tokens of the SAME doc
    same = doc_idx[1:] == doc_idx[:-1]
    with np.errstate(over="ignore"):
        bi = ((h[:-1] * _MULT) ^ (h[1:] * _BI_SALT)) % np.uint64(dim)
    return (
        np.concatenate([uni, bi[same]]),
        np.concatenate([doc_idx, doc_idx[:-1][same]]),
    )


class HashedLinearScorer:
    """Actor-pool callable: score documents with a hashed-feature
    linear model. Weights built once per actor in ``__init__``."""

    def __init__(
        self,
        dim: int = 1 << 18,
        seed: int = 7,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal(dim).astype(np.float64)
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        # one shared tokenization kernel with BM25: the whitespace-split
        # convention is load-bearing for oracle parity across operators
        from glue_etl_pipeline_ray.functions.bm25 import _flatten_tokens

        flat, doc_idx, lens = _flatten_tokens(t, self.text_col)
        if len(flat):
            ids, owner = _token_hashes(flat, doc_idx, self.dim)
            sums = np.bincount(owner, weights=self.w[ids], minlength=len(lens))
            counts = np.bincount(owner, minlength=len(lens))
        else:
            sums = np.zeros(len(lens))
            counts = np.zeros(len(lens))
        mean = sums / np.maximum(counts, 1)
        score = 1.0 / (1.0 + np.exp(-mean))
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "score": pa.array(score, pa.float64()),
            }
        )


def classifier_score(
    ds: Dataset,
    dim: int = 1 << 18,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
) -> Dataset:
    """Score every document with the hashed linear model (actor pool;
    weights load once per actor). The pool autoscales 1..concurrency —
    a FIXED pool of N would deadlock a session with exactly N CPUs
    (N idle actors hold every slot while the pool waits for full
    strength)."""
    return ds.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs=dict(
            dim=dim, seed=seed, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )
