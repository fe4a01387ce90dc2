"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: the query matrix is broadcast ONCE via
  ``ray.put`` (never re-shipped per batch); each ``map_batches`` task
  does one numpy matmul for its block and emits only its block-local
  top-k, so the final per-query merge sees k rows per block, not the
  corpus.
- IVF variant: coarse k-means centroids (built deterministically from a
  sample), rows assigned to their nearest centroid bucket; a query
  probes only the ``nprobe`` closest buckets. Same top-k contract,
  sub-linear scanned volume — the 100 TB path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def _make_final_topk(k: int):
    """Shared per-query reduce for every ANN path (brute / IVF /
    project-rerank): fold block-local candidates to the global top-k
    with the (-sim, id) tie-break, emitting (query_id, rank, vec_id).
    One definition so the three search paths' output contracts cannot
    silently diverge."""

    def final_topk(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        s = group["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array(
                    [group["query_id"][0].as_py()] * len(order), pa.int64()
                ),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
                "vec_id": pa.array(ids[order], pa.int64()),
            }
        )

    return final_topk


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_topk(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> Dataset:
    """Top-k rows by cosine similarity per query vector.

    Returns ``(query_id, rank, vec_id)`` — rank 1..k, ties broken by
    vec_id ascending (deterministic).
    """
    qn = _normalize(np.asarray(queries, np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids, np.int64)))

    def block_topk(batch: pa.Table) -> pa.Table:
        qm, qids = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = m @ qm.T  # (rows, nq)
        out_q, out_id, out_sim = [], [], []
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            mask = ids != qids[qi] if exclude_self else np.ones(len(ids), bool)
            cand_ids, cand_s = ids[mask], s[mask]
            # block-local top-k: sort by (-sim, id)
            order = np.lexsort((cand_ids, -cand_s))[:k]
            out_q.extend([qids[qi]] * len(order))
            out_id.extend(cand_ids[order].tolist())
            out_sim.extend(cand_s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )

    partial = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    return partial.groupby("query_id").map_groups(_make_final_topk(k), batch_format="pyarrow")


# ------------------------------------------------------------------- IVF


def _sample_matrix(
    ds: Dataset, vec_col: str, sample_limit: int
) -> np.ndarray:
    """Deterministic bounded sample of a vector column as a float64
    matrix — a content-hash threshold over the vector bytes, not
    ``limit()`` (the first blocks of a sorted/clustered input all come
    from one region; a one-region sample cannot represent the corpus).
    Shared by every sampled trainer (coarse k-means, PQ codebooks)."""
    n_total = ds.count()
    sample_ds = ds
    # oversample 1.3x so the post-filter limit() still fills up; when
    # frac would clamp to 1.0 (n_total <= 1.3x the limit) skip the
    # filter pass entirely — a keep-everything hash scan is pure waste,
    # and uint64(2**64) overflows
    frac = 1.3 * sample_limit / max(n_total, 1)
    if n_total > sample_limit and frac < 1.0:
        thresh = np.uint64(int(frac * float(2**64)))

        def hsample(t: pa.Table) -> pa.Table:
            m = _batch_matrix(t, vec_col).astype(np.float32, copy=False)
            u = np.ascontiguousarray(m).view(np.uint32)
            h = np.zeros(len(m), np.uint64)
            mult = np.uint64(0x9E3779B97F4A7C15)
            with np.errstate(over="ignore"):
                for j in range(u.shape[1]):
                    h = (h * mult) ^ u[:, j].astype(np.uint64)
            return t.filter(pa.array(h < thresh))

        sample_ds = ds.map_batches(
            hsample, batch_format="pyarrow", batch_size=None
        )
    sample = sample_ds.limit(sample_limit).to_pandas()
    if len(sample) == 0:  # degenerate content (all-identical vectors)
        sample = ds.limit(sample_limit).to_pandas()
    if len(sample) == 0:
        raise ValueError(
            "vector sample: input dataset has no rows — cannot train "
            "from an empty corpus"
        )
    return np.stack(sample[vec_col].to_numpy()).astype(np.float64)


def build_centroids(
    ds: Dataset,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_limit: int = 10_000,
    iters: int = 5,
    seed: int = 42,
    init: str = "random",
) -> np.ndarray:
    """Deterministic coarse k-means over a bounded sample (Lloyd, few
    iterations, seeded init). The sample is the only driver-side
    materialization; assignment streams. ``init="greedy"`` uses
    farthest-first traversal (deterministic k-means++: first point
    seeded-random, each next = the sample point with max min-distance
    to chosen centroids) — immune to two seeds landing in one natural
    cluster, which plain random init cannot recover from (a Lloyd
    centroid that loses all members never moves again).

    The sample is a deterministic content-hash threshold over the
    vector bytes, not ``limit()`` — the first blocks of a sorted or
    clustered input all come from one region, and a one-region sample
    can never seed the other regions' centroids."""
    m = _normalize(_sample_matrix(ds, vec_col, sample_limit))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(m))
    if init == "greedy":
        chosen = [int(rng.integers(len(m)))]
        min_sim = m @ m[chosen[0]]
        while len(chosen) < k:
            nxt = int(np.argmin(min_sim))  # farthest = lowest cosine
            chosen.append(nxt)
            min_sim = np.maximum(min_sim, m @ m[nxt])
        cent = m[chosen].copy()
    else:
        cent = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """IVF-bucketed approximate top-k: scan only rows whose centroid is
    among each query's ``nprobe`` nearest centroids."""
    cent = build_centroids(ds, n_centroids, vec_col)
    qn = _normalize(np.asarray(queries, np.float64))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((cent, qn, np.asarray(query_ids, np.int64), probes))

    def block_topk(batch: pa.Table) -> pa.Table:
        cm, qm, qids, pr = ray.get(ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        row_cent = (m @ cm.T).argmax(axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(qm.shape[0]):
            probe_mask = np.isin(row_cent, pr[qi])
            probe_mask &= ids != qids[qi]
            if not probe_mask.any():
                continue
            s = m[probe_mask] @ qm[qi]
            cand = ids[probe_mask]
            order = np.lexsort((cand, -s))[: k]
            out_q.extend([qids[qi]] * len(order))
            out_id.extend(cand[order].tolist())
            out_sim.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )

    partial = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    return partial.groupby("query_id").map_groups(_make_final_topk(k), batch_format="pyarrow")


def embed_cosine_pairs(
    ds: Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "brute",
    n_planes: int = 12,
    seed: int = 42,
) -> Dataset:
    """Embedding-cosine near-duplicate pairs: all ``(id_a < id_b)`` with
    cosine similarity >= ``threshold``.

    - ``method="brute"``: the normalized corpus (ids + matrix) is
      broadcast once via ``ray.put``; each block does one matmul against
      it and emits only its above-threshold pairs (``a < b`` dedups the
      symmetric hits). O(N^2 / blocks) scanned — the exact baseline.
    - ``method="lsh"``: seeded random-hyperplane signature buckets rows
      (near-identical vectors collide); pairwise cosine only within a
      bucket, then exact pair-dedup. Sub-quadratic — the 100 TB path
      (recall < 1 by construction; rows-only oracle).
    """
    if method == "brute":
        # pin the input ONCE: to_arrow_refs() executes the upstream
        # pipeline to build the broadcast corpus, and the block scan
        # below would otherwise re-execute it from scratch
        ds = ds.materialize()
        # assemble the broadcast corpus IN the object store: block refs go
        # to one remote concat task and the (ids, matrix) result stays
        # remote — the driver never materializes the corpus (round 1
        # ray.get all blocks to the driver first)
        refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()

        @ray.remote
        def _assemble(*parts: pa.Table):
            corpus = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
            ids_all = corpus[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return ids_all, _normalize(_batch_matrix(corpus, vec_col))

        ref = _assemble.remote(*refs)

        def block_pairs(batch: pa.Table) -> pa.Table:
            ids_c, m_c = ray.get(ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            sims = m @ m_c.T
            bi, cj = np.nonzero(sims >= threshold)
            a = ids[bi]
            b = ids_c[cj]
            keep = a < b
            return pa.table(
                {
                    "vec_id_a": pa.array(a[keep], pa.int64()),
                    "vec_id_b": pa.array(b[keep], pa.int64()),
                }
            )

        return ds.map_batches(block_pairs, batch_format="pyarrow", batch_size=None)

    # banded hyperplane LSH: L tables of r planes each; a pair collides if
    # it matches in ANY table (recall ~ 1-(1-p^r)^L, p = 1 - theta/pi).
    # rows explode x L, groupby (table, bucket), exact cosine in-bucket,
    # then exact pair dedup — same band structure as minhash_lsh_pairs.
    n_tables, r = 12, max(2, n_planes // 3)

    class AddBuckets:
        """Actor-pool stage: the (seeded, deterministic — identical in
        every actor) hyperplane matrix is generated ONCE per actor on
        first use, not per batch (round-1 regenerated it each call)."""

        def __init__(self):
            self.planes: np.ndarray | None = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, vec_col))
            if self.planes is None:
                p_rng = np.random.default_rng(seed)
                self.planes = p_rng.standard_normal((m.shape[1], n_tables * r))
            bits = (m @ self.planes) >= 0
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            out_id, out_bucket = [], []
            pow2 = 1 << np.arange(r, dtype=np.int64)
            for t in range(n_tables):
                h = bits[:, t * r : (t + 1) * r] @ pow2
                out_id.append(ids)
                out_bucket.append((np.int64(t) << np.int64(48)) | h)
            emb = batch[vec_col].combine_chunks()
            n = len(ids)
            idx = np.tile(np.arange(n), n_tables)
            return pa.table(
                {
                    id_col: pa.array(np.concatenate(out_id), pa.int64()),
                    "__lsh": pa.array(np.concatenate(out_bucket), pa.int64()),
                    vec_col: emb.take(pa.array(idx)),
                }
            )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) < 2:
            return pa.table(
                {"vec_id_a": pa.array([], pa.int64()), "vec_id_b": pa.array([], pa.int64())}
            )
        m = _normalize(_batch_matrix(group, vec_col))
        sims = m @ m.T
        ii, jj = np.nonzero(sims >= threshold)
        a, b = ids[ii], ids[jj]
        keep = a < b
        return pa.table(
            {
                "vec_id_a": pa.array(a[keep], pa.int64()),
                "vec_id_b": pa.array(b[keep], pa.int64()),
            }
        )

    from glue_etl_pipeline_ray.functions.groups import grouped_apply, grouped_first

    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        # autoscale from 1: a fixed pool equal to the cluster size would
        # starve the downstream shuffle tasks on small clusters
        AddBuckets, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    )
    pairs = grouped_apply(bucketed, ["__lsh"], bucket_pairs, min_group_size=2)
    return grouped_first(pairs, ["vec_id_a", "vec_id_b"])


class RandomProjection:
    """Actor-pool stage: Johnson-Lindenstrauss random projection of the
    embedding column to ``out_dim`` — the dimension-reduction scale
    path in front of brute/IVF ANN (project once, search in the small
    space, re-rank survivors in the original space if needed).

    The Gaussian projection matrix is a pure function of
    ``(seed, d_in)``: built lazily on the first batch (d_in read from
    the data), identical in every actor and every retry — no state to
    ship, no RNG drift. Per batch: one matmul. Zero shuffles.
    """

    def __init__(
        self,
        out_dim: int = 16,
        vec_col: str = "embedding",
        seed: int = 0,
        normalize: bool = False,
    ):
        self.out_dim = out_dim
        self.vec_col = vec_col
        self.seed = seed
        self.normalize = normalize
        self._mat: np.ndarray | None = None

    def _matrix(self, d_in: int) -> np.ndarray:
        if self._mat is None:
            rng = np.random.default_rng((self.seed, d_in, self.out_dim))
            self._mat = rng.standard_normal((d_in, self.out_dim)) / np.sqrt(
                self.out_dim
            )
        return self._mat

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.vec_col)
        proj = m @ self._matrix(m.shape[1])
        if self.normalize:
            proj = _normalize(proj)
        cols = {
            n: batch[n] for n in batch.schema.names if n != self.vec_col
        }
        cols[self.vec_col] = pa.array(proj.tolist(), pa.list_(pa.float64()))
        return pa.table(cols)


def random_projection(
    ds: Dataset,
    out_dim: int = 16,
    vec_col: str = "embedding",
    seed: int = 0,
    normalize: bool = False,
    concurrency: int = 4,
) -> Dataset:
    return ds.map_batches(
        RandomProjection,
        fn_constructor_kwargs=dict(
            out_dim=out_dim, vec_col=vec_col, seed=seed, normalize=normalize
        ),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )


def project_rerank_topk(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    out_dim: int = 16,
    candidates: int = 50,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """Project-then-search ANN: search in the ``out_dim`` JL-projected
    space for ``candidates`` per query (cheap matmuls over small
    vectors), then re-rank ONLY the candidate rows in the original
    space. Same output contract as :func:`cosine_topk`
    (query_id, rank, vec_id).

    The projection matrix is the same pure function of (seed, d_in)
    ``RandomProjection`` uses, so the corpus-side actor stage and the
    driver-side query projection can never drift. Cost: one projected
    scan + one filtered full-dim scan; the candidate set
    (nq x candidates id pairs) is the only broadcast.
    """
    q = np.asarray(queries, np.float64)
    rng = np.random.default_rng((seed, q.shape[1], out_dim))
    mat = rng.standard_normal((q.shape[1], out_dim)) / np.sqrt(out_dim)

    projected = random_projection(
        ds, out_dim=out_dim, vec_col=vec_col, seed=seed
    )
    cand = cosine_topk(
        projected,
        q @ mat,
        query_ids,
        k=candidates,
        vec_col=vec_col,
        id_col=id_col,
    )

    @ray.remote
    def assemble(*tables: pa.Table):
        tabs = [t for t in tables if t.num_rows]
        if not tabs:
            return {}
        cat = pa.concat_tables(tabs)
        out: dict[int, set] = {}
        for qid, vid in zip(
            cat["query_id"].to_numpy(zero_copy_only=False),
            cat["vec_id"].to_numpy(zero_copy_only=False),
        ):
            out.setdefault(int(qid), set()).add(int(vid))
        return out

    cand_ref = assemble.remote(*cand.to_arrow_refs())
    qn = _normalize(q)
    q_ref = ray.put((qn, np.asarray(query_ids, np.int64)))

    def rerank_block(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cand_ref)
        qm, qids = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        out_q, out_id, out_sim = [], [], []
        for qi in range(qm.shape[0]):
            wanted = cmap.get(int(qids[qi]), set())
            mask = np.isin(ids, np.fromiter(wanted, np.int64, len(wanted)))
            if not mask.any():
                continue
            sims = m[mask] @ qm[qi]
            out_q.extend([qids[qi]] * int(mask.sum()))
            out_id.extend(ids[mask].tolist())
            out_sim.extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )

    scored = ds.map_batches(
        rerank_block, batch_format="pyarrow", batch_size=None
    )
    return scored.groupby("query_id").map_groups(
        _make_final_topk(k), batch_format="pyarrow"
    )


# ------------------------------------------- product quantization (PQ)


def train_pq_codebooks(
    ds: Dataset,
    m: int = 8,
    n_codes: int = 32,
    vec_col: str = "embedding",
    sample_limit: int = 10_000,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Product-quantization codebooks, shape ``(m, n_codes, d/m)``:
    vectors are L2-normalized first (so ADC dot products approximate the
    cosine), then each of the ``m`` subspaces gets an independent seeded
    Lloyd k-means over the shared deterministic content-hash sample
    (``_sample_matrix`` — the only driver-side materialization; the
    corpus itself never leaves the cluster for training)."""
    mat = _normalize(_sample_matrix(ds, vec_col, sample_limit))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub_d = d // m
    rng = np.random.default_rng(seed)
    k = min(n_codes, len(mat))
    books = np.zeros((m, n_codes, sub_d), np.float64)
    for j in range(m):
        x = np.ascontiguousarray(mat[:, j * sub_d : (j + 1) * sub_d])
        cent = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(iters):
            # Euclidean argmin via -2x.c + |c|^2 (|x|^2 constant per row)
            d2 = -2.0 * (x @ cent.T) + (cent**2).sum(1)[None, :]
            assign = d2.argmin(1)
            for c in range(k):
                sel = x[assign == c]
                if len(sel):
                    cent[c] = sel.mean(0)
        books[j, :k] = cent
        if k < n_codes:  # degenerate tiny sample: pad with the first code
            books[j, k:] = cent[0]
    return books


def pq_topk(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    n_codes: int = 32,
    rerank: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """ADC product-quantization top-k — the compressed-domain ANN scale
    path. Corpus vectors quantize to ``m`` uint8 codes (float32 d=64 at
    m=8: 256 bytes -> 8 bytes, 32x), and each query scores a block with
    ONE (m x n_codes) lookup table: gathers + adds, no per-row matmul —
    at 100 TB the codes table is what you persist and scan. The top
    ``rerank*k`` ADC candidates per (query, block) are re-scored exactly
    against the block's full vectors (the classic ADC + exact re-rank;
    ``rerank=0`` returns pure ADC scores), then the shared per-query
    reduce folds block-local candidates to the global top-k. Encode and
    scan fuse into one corpus pass here; recall gate vs the brute-force
    oracle in tests/test_pq.py."""
    books = train_pq_codebooks(ds, m, n_codes, vec_col=vec_col)
    sub_d = books.shape[2]
    qn = _normalize(np.asarray(queries, np.float64))
    # per-query ADC lookup tables: lut[q, j, c] = q_sub_j . book[j, c]
    luts = np.einsum("qjd,jcd->qjc", qn.reshape(len(qn), m, sub_d), books)
    ref = ray.put((books, luts, np.asarray(query_ids, np.int64), qn))

    def block_topk(batch: pa.Table) -> pa.Table:
        bks, lut, qids, qm = ray.get(ref)
        x = _normalize(_batch_matrix(batch, vec_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        xs = x.reshape(n, m, sub_d)
        codes = np.empty((n, m), np.int64)
        for j in range(m):
            d2 = -2.0 * (xs[:, j] @ bks[j].T) + (bks[j] ** 2).sum(1)[None, :]
            codes[:, j] = d2.argmin(1)
        sub_idx = np.arange(m, dtype=np.int64)[None, :]
        out_q, out_id, out_sim = [], [], []
        for qi in range(lut.shape[0]):
            adc = lut[qi][sub_idx, codes].sum(1)  # (n,) gathers + adds
            cand = np.nonzero(ids != qids[qi])[0]
            if not len(cand):
                continue
            take = min(len(cand), max(k, rerank * k) if rerank else k)
            top = cand[np.lexsort((ids[cand], -adc[cand]))[:take]]
            if rerank:
                exact = x[top] @ qm[qi]
                order = np.lexsort((ids[top], -exact))[:k]
                sel, sims = top[order], exact[order]
            else:
                sel, sims = top[:k], adc[top[:k]]
            out_q.extend([qids[qi]] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_sim.extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )

    partial = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    return partial.groupby("query_id").map_groups(
        _make_final_topk(k), batch_format="pyarrow"
    )
