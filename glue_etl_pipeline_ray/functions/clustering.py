"""Distributed embedding clustering + semantic dedup (SemDeDup-style).

- ``kmeans``: full-dataset Lloyd's iterations, Ray-Data-first — each
  iteration is ONE ``map_batches`` pass emitting per-centroid partial
  sums (k x d per block, aggregate-sized), folded on the driver into
  the next centroid matrix. No shuffle at all; the only driver-side
  state is the k x d centroid matrix (the same partial/fold discipline
  as the sketches and heavy-hitters). Seeded sample init via
  ``similarity.build_centroids`` keeps it deterministic.
- ``semantic_dedup``: the SemDeDup recipe (Abbas et al., 2023,
  arXiv:2303.09540 — public): cluster the corpus, then WITHIN each
  cluster drop items whose cosine similarity to an already-kept item
  exceeds a threshold, keeping the lowest id (deterministic greedy).
  The within-cluster pass is a ``grouped_apply`` over the cluster id —
  one hash shuffle; per-cluster work streams ascending-id blocks
  against the running kept-set (block x block float32 matmuls, never
  the |c| x |c| matrix), and ``n_clusters="auto"`` scales k with corpus
  size so a cluster's rows fit a task (the paper's many-centroid
  regime)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from glue_etl_pipeline_ray.functions.similarity import (
    _batch_matrix,
    _normalize,
    build_centroids,
)


def _combine_partials(t: pa.Table) -> pa.Table:
    """Fold co-located per-block partials: sum counts / sim / vec sums
    per cluster id (vectorized)."""
    cl = t["cluster"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(cl, return_inverse=True)
    vecs = t["vec_sum"].combine_chunks()
    m = vecs.flatten().to_numpy(zero_copy_only=False).reshape(len(vecs), -1)
    sums = np.zeros((len(uniq), m.shape[1]))
    np.add.at(sums, inv, m)
    return pa.table(
        {
            "cluster": pa.array(uniq, pa.int64()),
            "count": pa.array(
                np.bincount(
                    inv, weights=t["count"].to_numpy(zero_copy_only=False)
                ).astype(np.int64),
                pa.int64(),
            ),
            "sim_sum": pa.array(
                np.bincount(
                    inv, weights=t["sim_sum"].to_numpy(zero_copy_only=False)
                ),
                pa.float64(),
            ),
            "vec_sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
        }
    )


def kmeans(
    ds: Dataset,
    n_clusters: int = 10,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    tree_combine: int | None = None,
) -> tuple[np.ndarray, Dataset, list[float]]:
    """Lloyd's k-means over the full dataset (cosine / spherical).

    Returns ``(centroids, assignments, objective_per_iter)`` where
    ``assignments`` is a streaming Dataset ``(id, cluster, sim)`` and
    the objective is mean cosine similarity to the assigned centroid
    (monotone non-decreasing under spherical Lloyd's).

    The driver pull per iteration is k rows per BLOCK. At large block
    counts (>~10k blocks: k x blocks x d floats lands on the driver)
    pass ``tree_combine=P`` to fold the partials through one bounded
    repartition level first — the driver then sees k x P rows
    regardless of input size. Off by default: at small block counts
    the extra shuffle costs more than it saves.
    """
    # pin the input ONCE so the upstream pipeline is not re-executed on
    # every Lloyd iteration (centroid init + iters + final assignment
    # each scan ds; same discipline as pagerank/connected_components)
    ds = ds.materialize()
    cent = build_centroids(ds, n_clusters, vec_col, seed=seed, init="greedy")
    objective: list[float] = []
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            sims = m @ c.T
            assign = sims.argmax(axis=1)
            k, d = c.shape
            sums = np.zeros((k, d))
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            simsum = np.bincount(
                assign, weights=sims[np.arange(len(m)), assign], minlength=k
            )
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k), pa.int64()),
                    "count": pa.array(counts, pa.int64()),
                    "sim_sum": pa.array(simsum, pa.float64()),
                    "vec_sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                }
            )

        parts_ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        if tree_combine:
            parts_ds = parts_ds.repartition(tree_combine).map_batches(
                _combine_partials, batch_format="pyarrow", batch_size=None
            )
        parts = parts_ds.take_all()  # aggregate-sized: k rows per block/part
        k, d = cent.shape
        sums = np.zeros((k, d))
        counts = np.zeros(k, np.int64)
        simsum = 0.0
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["vec_sum"])
            counts[r["cluster"]] += r["count"]
            simsum += r["sim_sum"]
        n = counts.sum()
        objective.append(float(simsum / max(n, 1)))
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent = _normalize(cent)

    final_ref = ray.put(cent)

    def assign_out(batch: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ c.T
        a = sims.argmax(axis=1)
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "cluster": pa.array(a, pa.int64()),
                "sim": pa.array(sims[np.arange(len(m)), a], pa.float64()),
            }
        )

    assignments = ds.map_batches(
        assign_out, batch_format="pyarrow", batch_size=None
    )
    return cent, assignments, objective


def semantic_dedup(
    ds: Dataset,
    n_clusters: int | str = 10,
    threshold: float = 0.99,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    block_rows: int = 4096,
    target_cluster_rows: int = 100_000,
) -> Dataset:
    """SemDeDup: drop embeddings nearly identical (cosine >= threshold)
    to a kept item in the SAME k-means cluster; keep the lowest id of
    each near-dup chain. Returns ``(id, cluster, keep)`` for every row.

    Scale levers (two, independent):

    - The within-cluster pass streams the cluster in ascending-id
      blocks of ``block_rows`` against the RUNNING KEPT-SET — the
      largest transient is a block x block (or block x kept-block)
      float32 matmul, never the |c| x |c| matrix, so a skewed cluster
      cannot blow a task's heap quadratically. Exact: identical output
      to the one-shot greedy (kept rows suppress later rows; dropped
      rows suppress nothing).
    - ``n_clusters="auto"`` scales k with corpus size so E[|c|] ~=
      ``target_cluster_rows`` (the paper keeps clusters small by using
      many centroids, arXiv:2303.09540); the per-task group table and
      kept-set stay O(target * d).

    Cross-cluster near-dups are missed by construction (the paper's
    trade-off) — raise quality via ``iters``, not by shrinking clusters
    below near-dup diameter."""
    # pin once: count + kmeans passes + the tag pass all scan ds
    ds = ds.materialize()
    if n_clusters == "auto":
        n_clusters = max(16, int(np.ceil(ds.count() / target_cluster_rows)))
    cent, _, _ = kmeans(ds, n_clusters, iters, vec_col, id_col, seed)
    ref = ray.put(cent)

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        a = (m @ c.T).argmax(axis=1)
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "cluster": pa.array(a, pa.int64()),
                vec_col: batch[vec_col],
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        m = (
            _normalize(_batch_matrix(g, vec_col))[order]
            .astype(np.float32, copy=False)
        )
        ids_s = ids[order]
        n = len(ids_s)
        keep = np.ones(n, bool)
        kept_blocks: list[np.ndarray] = []  # running kept-set, <=B rows each
        for s in range(0, n, block_rows):
            blk = m[s : s + block_rows]
            b = len(blk)
            # 1) suppress by the running kept-set, one bounded matmul per
            # kept block; rows already suppressed drop out of later
            # matmuls so work shrinks as suppression accumulates
            alive = np.ones(b, bool)
            for kb in kept_blocks:
                live = np.flatnonzero(alive)
                if not len(live):
                    break
                hit = (blk[live] @ kb.T >= threshold).any(axis=1)
                alive[live[hit]] = False
            # 2) intra-block greedy among still-alive rows (ascending
            # id; suppressed rows suppress nothing — chain semantics)
            live = np.flatnonzero(alive)
            if len(live):
                sub = blk[live]
                sims = sub @ sub.T  # bounded: <= B x B
                a = np.ones(len(live), bool)
                rng_idx = np.arange(len(live))
                for i in range(len(live)):
                    if a[i]:
                        a[(sims[i] >= threshold) & (rng_idx > i)] = False
                keep[s + live[~a]] = False
                kept_blocks.append(sub[a])
            keep[s + np.flatnonzero(~alive)] = False
        return pa.table(
            {
                id_col: pa.array(ids_s, pa.int64()),
                "cluster": pa.array(
                    np.full(n, g["cluster"][0].as_py()), pa.int64()
                ),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    return grouped_apply(tagged, ["cluster"], dedup_cluster)
