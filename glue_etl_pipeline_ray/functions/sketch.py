"""Mergeable sketches: HyperLogLog distinct counting at shuffle-free cost.

The reference has no approximate aggregates (SURVEY.md 2.5); at 10^10
events an exact COUNT(DISTINCT key) is a full shuffle, while a HLL
register set is a fixed 2^p bytes per block, combined by elementwise max
— the classic mergeable-sketch pattern: ``map_batches`` emits one
register row per block (the partial), a tiny reduce folds them.

Standard HLL (Flajolet et al. 2007): p index bits, registers =
max(leading-zero-count + 1) of the remaining 64-p bits; bias-corrected
harmonic mean, linear counting for the small regime. Expected relative
error ~= 1.04 / sqrt(2^p)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from glue_etl_pipeline_ray.hashing import key_hash_u64


def _registers(h: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # leading zeros of the remaining 64-p bits (values nonzero by the
    # pad): position of the highest set bit via float64 log2 — exact for
    # the exponent range we need; rho = lz + 1
    lz = 64 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64) - 1
    rho = np.minimum(lz + 1, 64 - p + 1)
    regs = np.zeros(m, np.int8)
    np.maximum.at(regs, idx, rho.astype(np.int8))
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small regime
    return float(est)


def hll_distinct(ds: Dataset, cols: list[str], p: int = 14) -> dict:
    """Approximate COUNT(DISTINCT cols): per-block registers (one
    ``map_batches`` pass, no shuffle), folded by max on the driver
    (2^p bytes per block — at 10^10 rows the reduce is still trivial).

    Returns {"estimate": float, "p": p, "rel_error": ~1.04/sqrt(2^p)}."""

    def block_regs(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(*(batch[c] for c in cols))
        return pa.table({"regs": pa.array([_registers(h, p).tobytes()], pa.binary())})

    parts = ds.map_batches(block_regs, batch_format="pyarrow", batch_size=None)
    regs = np.zeros(1 << p, np.int8)
    for row in parts.take_all():
        regs = np.maximum(regs, np.frombuffer(row["regs"], np.int8))
    return {
        "estimate": _estimate(regs, p),
        "p": p,
        "rel_error": 1.04 / (1 << p) ** 0.5,
    }
