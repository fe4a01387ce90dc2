"""One-pass table profiling: per-column null counts, min/max, and
approximate distinct cardinality over any Dataset.

The data-observability analog of the reference's per-event profiling
(``ef_ingestion_etl/data_profiling.py`` validates rows; this profiles
COLUMNS): one ``map_batches`` pass emits an aggregate-sized partial per
(column, block) — counts, typed min/max, and HLL registers — and the
driver folds them. NO shuffle at any size; the fold sees
columns x blocks rows of ~KB each.

Typed min/max ride in a two-lane union (numeric/temporal in a float64
lane with timestamps as epoch-micros, strings in a utf8 lane) so one
stable partial schema covers every column type.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from glue_etl_pipeline_ray.functions.sketch import _estimate, _registers
from glue_etl_pipeline_ray.hashing import key_hash_u64

_HLL_P = 12


def _col_partial(name: str, col: pa.ChunkedArray) -> dict:
    n = len(col)
    n_null = col.null_count
    valid = col.drop_null()
    row = {
        "column": name,
        "n": n,
        "n_null": n_null,
        "min_num": None,
        "max_num": None,
        "min_str": None,
        "max_str": None,
        "regs": np.zeros(1 << _HLL_P, np.int8).tobytes(),
    }
    if len(valid) == 0:
        return row
    t = col.type
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
        # NaN is not Arrow-null, so drop_null keeps it — exclude it from
        # min/max or one NaN poisons the whole fold (Python min(nan, x)
        # is order-dependent); NaN still counts toward cardinality
        finite = v[~np.isnan(v)]
        if len(finite):
            row["min_num"] = float(finite.min())
            row["max_num"] = float(finite.max())
        hashed = key_hash_u64(valid)
    elif pa.types.is_timestamp(t) or pa.types.is_date(t):
        v = valid.cast(pa.int64()).to_numpy(zero_copy_only=False)
        row["min_num"], row["max_num"] = float(v.min()), float(v.max())
        hashed = key_hash_u64(v)
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        v = np.asarray(valid.to_pylist(), dtype=object)
        row["min_str"], row["max_str"] = str(v.min()), str(v.max())
        hashed = key_hash_u64(valid)
    else:  # nested/binary: cardinality only
        hashed = key_hash_u64(
            np.asarray([str(x) for x in valid.to_pylist()], dtype=object)
        )
    row["regs"] = _registers(hashed, _HLL_P).tobytes()
    return row


def profile_table(ds: Dataset, columns: list[str] | None = None) -> pa.Table:
    """Profile ``columns`` (default: all) in one streaming pass.

    Returns one row per column: n, n_null, min/max (numeric lane as
    float64 — timestamps are epoch-micros —, string lane as utf8) and
    HLL approx distinct (p=12, ~1.6% rel. error).
    """

    def partials(t: pa.Table) -> pa.Table:
        cols = columns or t.schema.names
        rows = [_col_partial(c, t[c].combine_chunks()) for c in cols]
        return pa.table(
            {
                "column": pa.array([r["column"] for r in rows], pa.string()),
                "n": pa.array([r["n"] for r in rows], pa.int64()),
                "n_null": pa.array([r["n_null"] for r in rows], pa.int64()),
                "min_num": pa.array([r["min_num"] for r in rows], pa.float64()),
                "max_num": pa.array([r["max_num"] for r in rows], pa.float64()),
                "min_str": pa.array([r["min_str"] for r in rows], pa.string()),
                "max_str": pa.array([r["max_str"] for r in rows], pa.string()),
                "regs": pa.array([r["regs"] for r in rows], pa.binary()),
            }
        )

    parts = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=None
    ).take_all()  # aggregate-sized: one ~4KB row per (column, block)

    by_col: dict[str, dict] = {}
    for r in parts:
        a = by_col.setdefault(
            r["column"],
            {
                "n": 0,
                "n_null": 0,
                "min_num": None,
                "max_num": None,
                "min_str": None,
                "max_str": None,
                "regs": np.zeros(1 << _HLL_P, np.int8),
            },
        )
        a["n"] += r["n"]
        a["n_null"] += r["n_null"]
        for key, fold in (("min_num", min), ("max_num", max),
                          ("min_str", min), ("max_str", max)):
            v = r[key]
            if v is not None:
                a[key] = v if a[key] is None else fold(a[key], v)
        a["regs"] = np.maximum(
            a["regs"], np.frombuffer(r["regs"], np.int8)
        )

    names = list(by_col)
    return pa.table(
        {
            "column": pa.array(names, pa.string()),
            "n": pa.array([by_col[c]["n"] for c in names], pa.int64()),
            "n_null": pa.array([by_col[c]["n_null"] for c in names], pa.int64()),
            "min_num": pa.array([by_col[c]["min_num"] for c in names], pa.float64()),
            "max_num": pa.array([by_col[c]["max_num"] for c in names], pa.float64()),
            "min_str": pa.array([by_col[c]["min_str"] for c in names], pa.string()),
            "max_str": pa.array([by_col[c]["max_str"] for c in names], pa.string()),
            "approx_distinct": pa.array(
                [
                    int(round(_estimate(by_col[c]["regs"], _HLL_P)))
                    for c in names
                ],
                pa.int64(),
            ),
        }
    )
