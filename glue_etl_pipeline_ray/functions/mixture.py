"""Dataset splitting and source-mixture sampling for training-data prep.

Both operators are shuffle-free and retry-stable: membership is a pure
function of the row's id hash (the same determinism discipline as
``queries.q_hash_sample``), so re-runs, retries, and any parallelism
produce identical output — no RNG state, no random_shuffle.

- ``hash_split``: train/val/test assignment by mapping a stable 64-bit
  id hash onto cumulative weight ranges. Splits are exactly disjoint
  and exhaustive by construction.
- ``mixture_sample``: downsample each source to hit target mixture
  proportions (the static data-mixing step of LLM pipelines; weights
  a la DoReMi are an input here, not learned). Per-source keep rates
  are derived from observed source counts (one tiny aggregate) and the
  most-constraining source is kept whole, so the sample is as large as
  the target mixture allows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

from glue_etl_pipeline_ray.hashing import key_hash_u64

# splits draw from a different hash stream than sampling, so composing
# mixture_sample + hash_split doesn't correlate membership
_SPLIT_SALT = np.uint64(0xA076_1D64_78BD_642F)
_MIX_SALT = np.uint64(0xE703_7ED1_A0B4_28DB)


def _unit_hash(ids: np.ndarray, salt: np.uint64) -> np.ndarray:
    """Stable uniform [0, 1) per id."""
    with np.errstate(over="ignore"):
        h = key_hash_u64(ids) * salt
    return h.astype(np.float64) / float(2**64)


def hash_split(
    ds: Dataset,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> Dataset:
    """Append a ``split`` column assigning each row to one named split
    with probability proportional to its weight — deterministic in the
    row id, disjoint and exhaustive."""
    names = list(weights)
    total = float(sum(weights.values()))
    edges = np.cumsum([weights[n] / total for n in names])
    edges[-1] = 1.0 + 1e-9  # closed top edge

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        u = _unit_hash(ids, _SPLIT_SALT)
        slot = np.searchsorted(edges, u, side="right")
        labels = np.array(names, dtype=object)[slot]
        return t.append_column("split", pa.array(labels, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def mixture_sample(
    ds: Dataset,
    proportions: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> tuple[Dataset, dict]:
    """Deterministically thin each source so the surviving rows match
    the target mixture ``proportions``. Sources absent from
    ``proportions`` are dropped. Returns ``(sampled_ds, plan)`` where
    ``plan`` records observed counts, per-source keep rates, and the
    expected output size.

    The binding source (smallest observed/target ratio) keeps rate 1.0;
    every other source is hash-thinned relative to it. One Count
    aggregate over the source column is the only extra pass.

    ``weight_col`` (e.g. a token count): targets are interpreted as
    proportions of total WEIGHT, not row count — the token-budget
    mixing labs actually do (a source of long documents contributes
    fewer docs for the same token share). Keep decisions stay per-row
    hash-deterministic; the achieved weight mixture matches in
    expectation with the exact same retry-stability."""
    if weight_col is not None:
        from ray.data.aggregate import Sum

        counts = {
            r[source_col]: r[f"sum({weight_col})"]
            for r in ds.groupby(source_col).aggregate(Sum(weight_col)).take_all()
        }
    else:
        counts = {
            r[source_col]: r["count()"]
            for r in ds.groupby(source_col).aggregate(Count()).take_all()
        }
    if any(w < 0 for w in proportions.values()):
        raise ValueError("proportions must be non-negative")
    pos = {s: float(w) for s, w in proportions.items() if w > 0}
    if not pos:
        raise ValueError("proportions need at least one positive weight")
    # zero-weight sources simply fall to thin()'s default rate 0.0
    # (dropped), same as a source not listed at all — dividing by their
    # share would be a ZeroDivisionError
    total_target = sum(pos.values())
    shares = {s: w / total_target for s, w in pos.items()}
    missing = [s for s in shares if counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"sources in proportions but not in data: {missing}")
    # the binding source caps the achievable sample size N:
    # keep_s = share_s * N / count_s <= 1 for all s
    n_out = min(counts[s] / shares[s] for s in shares)
    rates = {s: min(1.0, shares[s] * n_out / counts[s]) for s in shares}

    rate_arr = dict(rates)

    def thin(t: pa.Table) -> pa.Table:
        src = t[source_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        u = _unit_hash(ids, _MIX_SALT)
        # null sources get rate 0.0 like any unlisted source — np.unique
        # would TypeError sorting None against str
        valid = np.array([s is not None for s in src], dtype=bool)
        r = np.zeros(len(src), np.float64)
        if valid.any():
            sv = src[valid]
            uniq, inv = np.unique(sv, return_inverse=True)
            r[valid] = np.array([rate_arr.get(s, 0.0) for s in uniq])[inv]
        return t.filter(pa.array(u < r))

    expect = int(sum(rates[s] * counts[s] for s in rates))
    plan = {
        "counts": counts,
        "rates": rates,
        "unit": weight_col or "rows",
        # counts are in `unit` units: with weight_col set this is the
        # expected surviving WEIGHT (e.g. tokens), not a row count
        "expected_kept": expect,
        **({} if weight_col else {"expected_rows": expect}),
    }
    return ds.map_batches(thin, batch_format="pyarrow", batch_size=None), plan


def deterministic_shuffle(
    ds: Dataset,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int | None = None,
) -> Dataset:
    """Seeded, retry-stable global shuffle for training-order
    randomization.

    ``random_shuffle()`` is a full exchange whose output ORDER differs
    per run and per retry — a failed 100 TB shuffle cannot resume, and
    a re-run trains on a different order. This operator instead sorts
    by a stable per-row hash mixed with ``seed``: the result is one
    deterministic pseudorandom permutation per seed — identical across
    runs/retries/parallelism (resumable writes), epoch k = seed k, and
    the sort's range-partitioned exchange is the same all-to-all cost
    class as random_shuffle. With ``n_shards`` each row also gets a
    ``shard`` column (hash mod n_shards, balanced in expectation) so
    downstream writers can emit one file per shard and a failed run
    skips finished shards.
    """
    with np.errstate(over="ignore"):  # modular 2^64 mix, overflow intended
        salt = np.uint64(0xD6E8_FEB8_6659_FD93) * np.uint64(2 * seed + 1)

    def key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = key_hash_u64(ids) * salt
        t = t.append_column("__shuffle_key", pa.array(h, pa.uint64()))
        if n_shards:
            t = t.append_column(
                "shard",
                pa.array((h % np.uint64(n_shards)).astype(np.int64)),
            )
        return t

    keyed = ds.map_batches(key, batch_format="pyarrow", batch_size=None)
    # tie-break on the id itself: 64-bit hash collisions are expected
    # at the 10^10-row target (and certain for duplicate ids), and the
    # sort exchange gives colliding rows no stable relative order
    # across retries — the resume/epoch contract needs a total order
    out = keyed.sort(["__shuffle_key", id_col])
    return out.map_batches(
        lambda t: t.drop_columns(["__shuffle_key"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def per_key_cap(
    ds: Dataset,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> Dataset:
    """Cap every key group at ``k`` rows (the per-domain/source cap that
    stops one crawl domain from dominating a corpus — Dolma-style).

    Selection is deterministic and retry-stable: within a key, rows rank
    by ``md5(id)`` (a seedless uniform order, reproducible in SQL), and
    only the k smallest survive. Pre-combine keeps at most k rows per
    (key, block) BEFORE the shuffle, so the exchange carries
    O(k x keys x blocks) rows however large the groups are; the final
    per-key cut runs in collision-guarded hash partitions (Ray group
    count independent of key cardinality).
    """
    import hashlib

    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    def rank_tag(t: pa.Table) -> pa.Table:
        r = np.array(
            [
                hashlib.md5(str(v).encode()).hexdigest()
                for v in t[id_col].to_pylist()
            ],
            dtype=object,
        )
        return t.append_column("__r", pa.array(r, pa.string()))

    def block_cap(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[key_col].to_pylist(), dtype=object)
        ranks = np.asarray(t["__r"].to_pylist(), dtype=object)
        order = np.lexsort((ranks, keys))
        keys_s = keys[order]
        starts = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1]])
        ends = np.r_[starts[1:], len(keys_s)]
        keep = np.concatenate(
            [order[s : min(e, s + k)] for s, e in zip(starts, ends)]
        ) if len(starts) else np.array([], np.int64)
        return t.take(pa.array(np.sort(keep)))

    def final_cap(g: pa.Table) -> pa.Table:
        ranks = np.asarray(g["__r"].to_pylist(), dtype=object)
        order = np.argsort(ranks, kind="stable")[:k]
        return g.take(pa.array(np.sort(order)))

    pre = ds.map_batches(
        rank_tag, batch_format="pyarrow", batch_size=None
    ).map_batches(block_cap, batch_format="pyarrow", batch_size=None)
    return grouped_apply(
        pre, [key_col], final_cap, num_partitions=num_partitions
    ).drop_columns(["__r"])
