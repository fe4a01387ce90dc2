"""Sequence packing for LLM training-data preparation.

Packs documents into fixed-capacity token sequences (the standard
pre-training step: concatenate short docs up to the context length so
no batch slot is wasted). Bin packing is inherently order-dependent, so
determinism comes from fixing the order, not the execution: docs are
hash-sharded by id into ``num_shards`` fixed shards (independent of Ray
block boundaries), and each shard packs ITS OWN docs sorted by
(-tokens, id) with greedy first-fit-decreasing. Same input -> same
packing, regardless of parallelism, block splits, or retries — the same
determinism discipline as the replay exchange.

One hash shuffle (the shard groupby); per-shard FFD walks each doc once
(per-doc work is inherent to packing, as with bigram counting —
``queries.q_doc_repetition``). Oversize docs (> capacity) become solo
sequences flagged ``truncated`` — the caller decides split-vs-drop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from glue_etl_pipeline_ray.functions.groups import grouped_apply
from glue_etl_pipeline_ray.hashing import key_hash_u64

# seq_id = shard * SHARD_STRIDE + local bin index (stable, collision-free
# for < 2^32 bins per shard)
SHARD_STRIDE = 1 << 32


def pack_sequences(
    ds: Dataset,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_shards: int = 64,
) -> Dataset:
    """Assign every doc to a packed sequence of at most ``capacity``
    tokens. Returns ``(doc_id, seq_id, n_tokens, truncated)`` — one row
    per input doc, every doc packed exactly once."""

    def shard(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = (key_hash_u64(ids) % np.uint64(num_shards)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                tokens_col: pc_cast_int64(t[tokens_col]),
                "shard": pa.array(sh, pa.int64()),
            }
        )

    def pack_shard(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        toks = g[tokens_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -toks))  # FFD: big first, id tie-break
        shard_id = int(g["shard"][0].as_py())
        bins_free: list[int] = []
        assign = np.empty(len(ids), np.int64)
        trunc = np.zeros(len(ids), bool)
        for pos in order.tolist():
            t = int(toks[pos])
            if t >= capacity:
                bins_free.append(0)  # oversize: solo bin, full
                assign[pos] = len(bins_free) - 1
                trunc[pos] = t > capacity
                continue
            placed = False
            # first fit over open bins; bounded scan because FFD fills
            # bins front-to-back and closes them quickly at real ratios
            for b, free in enumerate(bins_free):
                if free >= t:
                    bins_free[b] = free - t
                    assign[pos] = b
                    placed = True
                    break
            if not placed:
                bins_free.append(capacity - t)
                assign[pos] = len(bins_free) - 1
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "seq_id": pa.array(
                    shard_id * SHARD_STRIDE + assign, pa.int64()
                ),
                tokens_col: pa.array(toks, pa.int64()),
                "truncated": pa.array(trunc, pa.bool_()),
            }
        )

    sharded = ds.map_batches(shard, batch_format="pyarrow", batch_size=None)
    return grouped_apply(sharded, ["shard"], pack_shard)


def pc_cast_int64(col) -> pa.ChunkedArray:
    import pyarrow.compute as pc

    return pc.cast(col, pa.int64())


def packing_stats(packed: Dataset, capacity: int) -> dict:
    """Aggregate fill-efficiency stats (driver-side fold of per-sequence
    partials — aggregate-sized)."""
    import pyarrow.compute as pc

    def per_seq(t: pa.Table) -> pa.Table:
        seq = t["seq_id"].to_numpy(zero_copy_only=False)
        tok = t["n_tokens"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(seq, return_inverse=True)
        return pa.table(
            {
                "seq_id": pa.array(uniq, pa.int64()),
                "tokens": pa.array(
                    np.bincount(inv, weights=np.minimum(tok, capacity))
                    .astype(np.int64),
                    pa.int64(),
                ),
                "docs": pa.array(np.bincount(inv), pa.int64()),
            }
        )

    # seq_ids never span shards, and grouped_apply emits each shard
    # contiguously — but blocks may split a shard, so re-aggregate
    per = grouped_apply(
        packed.map_batches(per_seq, batch_format="pyarrow"),
        ["seq_id"],
        lambda g: pa.table(
            {
                "seq_id": g["seq_id"].slice(0, 1),
                "tokens": pa.array(
                    [pc.sum(g["tokens"]).as_py()], pa.int64()
                ),
                "docs": pa.array([pc.sum(g["docs"]).as_py()], pa.int64()),
            }
        ),
    )
    rows = per.take_all()
    total = sum(r["tokens"] for r in rows)
    return {
        "n_sequences": len(rows),
        "total_tokens": int(total),
        "mean_fill": float(total / (len(rows) * capacity)) if rows else 0.0,
        "mean_docs_per_seq": float(
            sum(r["docs"] for r in rows) / len(rows)
        ) if rows else 0.0,
    }
