"""Sorted writes + min/max file skipping: the data-skipping read path
for range scans.

The lake's hash-bucket layout serves point lookups (``ReplayEngine.
lookup``) but cannot prune a RANGE predicate — every bucket holds every
value range. The classic answer (Parquet zone maps, Delta/Iceberg file
stats, z-ordering's 1-D special case) is to keep range-queried datasets
SORTED on the scan column and skip whole files by their min/max:

- ``sorted_write``: one range-partitioned sort exchange, then plain
  Parquet files whose per-file (min, max) of the sort column are
  collected into a manifest sidecar. Files are bounded by
  ``rows_per_file`` so a failed write resumes at file granularity and
  no file is unboundedly large.
- ``pruned_read``: consult the manifest (O(files) driver work on
  aggregate-sized metadata — never data rows), open ONLY overlapping
  files, apply the exact predicate vectorized inside ``map_batches``.

At 100 TB a sorted table scan for a 1% range touches ~1% of files; the
manifest for a million files is a few MB. The manifest is derived
purely from Parquet footer statistics, so it can be rebuilt from the
files alone (no trust in the writer).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset


def sorted_write(
    ds: Dataset,
    out_dir: str,
    sort_col: str,
    rows_per_file: int = 100_000,
) -> dict:
    """Sort by ``sort_col``, write Parquet, return + persist the
    per-file min/max manifest."""
    os.makedirs(out_dir, exist_ok=True)
    ds.sort(sort_col).write_parquet(
        out_dir, min_rows_per_file=rows_per_file, max_rows_per_file=rows_per_file
    )
    manifest = build_manifest(out_dir, sort_col)
    with open(os.path.join(out_dir, "_skipping_manifest.json"), "w") as f:
        json.dump(manifest, f, default=str)
    return manifest


def build_manifest(out_dir: str, sort_col: str) -> dict:
    """Per-file (min, max) of ``sort_col`` from Parquet footer stats —
    rebuildable from the files alone."""
    files = {}
    for path in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().get_field_index(sort_col)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo, hi = None, None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        files[os.path.basename(path)] = [lo, hi]
    return {"sort_col": sort_col, "files": files}


def pruned_read(
    out_dir: str,
    sort_col: str,
    lo,
    hi,
    columns: list[str] | None = None,
) -> tuple[Dataset, int, int]:
    """Range scan ``lo <= sort_col <= hi`` reading only overlapping
    files. Returns ``(dataset, n_files_read, n_files_total)``."""
    mpath = os.path.join(out_dir, "_skipping_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest.get("sort_col") != sort_col:
            manifest = build_manifest(out_dir, sort_col)
    else:
        manifest = build_manifest(out_dir, sort_col)

    keep = []
    for name, (fmin, fmax) in manifest["files"].items():
        # stats missing -> cannot prove non-overlap, must read
        if fmin is None or fmax is None or not (
            _lt(hi, fmin) or _lt(fmax, lo)
        ):
            keep.append(os.path.join(out_dir, name))
    total = len(manifest["files"])
    if not keep:
        empty = rd.from_arrow(
            pq.read_table(
                os.path.join(out_dir, next(iter(manifest["files"]))),
                columns=columns,
            ).slice(0, 0)
        )
        return empty, 0, total

    ds = rd.read_parquet(keep, columns=columns)

    def exact(t: pa.Table) -> pa.Table:
        v = t[sort_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((v >= lo) & (v <= hi)))

    return (
        ds.map_batches(exact, batch_format="pyarrow", batch_size=None),
        len(keep),
        total,
    )


def _lt(a, b) -> bool:
    """a < b with parquet-stat values that may come back as strings
    from the JSON manifest (timestamps serialize via default=str)."""
    if isinstance(a, str) or isinstance(b, str):
        return str(a) < str(b)
    return a < b


# --------------------------------------------------------------- z-order


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 32 bits of x to the even bit positions
    (standard Morton-code bit twiddling, vectorized uint64)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _zvalue(a: np.ndarray, b: np.ndarray, bounds: dict) -> np.ndarray:
    """Interleave the 32-bit normalized positions of a and b."""

    def norm(v, lo, hi):
        span = max(hi - lo, 1)
        scaled = (v.astype(np.float64) - lo) / span * float(0xFFFFFFFF)
        return np.clip(scaled, 0, 0xFFFFFFFF).astype(np.uint64)

    na = norm(a, *bounds["a"])
    nb = norm(b, *bounds["b"])
    return (_part1by1(na) << np.uint64(1)) | _part1by1(nb)


def zorder_write(
    ds: Dataset,
    out_dir: str,
    cols: tuple[str, str],
    rows_per_file: int = 100_000,
) -> dict:
    """Z-order (Morton-curve) clustering on TWO integer columns: files
    become tight boxes in BOTH dimensions, so a range predicate on
    EITHER column (or a 2-D box) prunes files — the multi-column
    data-skipping layout a single-column sort can't give (Delta's
    OPTIMIZE ZORDER BY). One stats aggregate for the normalization
    bounds + one sort exchange; the manifest records per-file min/max
    for both columns from Parquet footer stats."""
    from ray.data.aggregate import Max, Min

    a_col, b_col = cols
    os.makedirs(out_dir, exist_ok=True)
    stats = ds.aggregate(
        *[agg for c in cols for agg in (Min(c), Max(c))]
    )
    bounds = {
        "a": (stats[f"min({a_col})"], stats[f"max({a_col})"]),
        "b": (stats[f"min({b_col})"], stats[f"max({b_col})"]),
    }

    def add_z(t: pa.Table) -> pa.Table:
        z = _zvalue(
            t[a_col].to_numpy(zero_copy_only=False),
            t[b_col].to_numpy(zero_copy_only=False),
            bounds,
        )
        return t.append_column("__z", pa.array(z, pa.uint64()))

    keyed = ds.map_batches(add_z, batch_format="pyarrow", batch_size=None)
    keyed.sort("__z").map_batches(
        lambda t: t.drop_columns(["__z"]),
        batch_format="pyarrow",
        batch_size=None,
    ).write_parquet(
        out_dir,
        min_rows_per_file=rows_per_file,
        max_rows_per_file=rows_per_file,
    )
    manifest = {
        "zorder_cols": list(cols),
        "columns": {c: build_manifest(out_dir, c)["files"] for c in cols},
    }
    with open(os.path.join(out_dir, "_skipping_manifest.json"), "w") as f:
        json.dump(manifest, f, default=str)
    return manifest


def pruned_read_box(
    out_dir: str,
    predicates: dict,
    columns: list[str] | None = None,
) -> tuple[Dataset, int, int]:
    """Read only files whose per-column [min, max] overlaps EVERY
    ``col: (lo, hi)`` predicate; exact filter applied vectorized.
    Works over a ``zorder_write`` (or any) layout with a multi-column
    manifest."""
    with open(os.path.join(out_dir, "_skipping_manifest.json")) as f:
        manifest = json.load(f)
    per_col = manifest["columns"]
    names = list(next(iter(per_col.values())).keys())
    keep = []
    for name in names:
        ok = True
        for c, (lo, hi) in predicates.items():
            fmin, fmax = per_col[c][name]
            if fmin is None or fmax is None:
                continue  # unknown stats: cannot prune on this column
            if _lt(hi, fmin) or _lt(fmax, lo):
                ok = False
                break
        if ok:
            keep.append(os.path.join(out_dir, name))
    total = len(names)
    if not keep:
        empty = rd.from_arrow(
            pq.read_table(os.path.join(out_dir, names[0]), columns=columns)
            .slice(0, 0)
        )
        return empty, 0, total

    ds = rd.read_parquet(keep, columns=columns)

    def exact(t: pa.Table) -> pa.Table:
        mask = np.ones(t.num_rows, bool)
        for c, (lo, hi) in predicates.items():
            v = t[c].to_numpy(zero_copy_only=False)
            mask &= (v >= lo) & (v <= hi)
        return t.filter(pa.array(mask))

    return (
        ds.map_batches(exact, batch_format="pyarrow", batch_size=None),
        len(keep),
        total,
    )


def compact_files(
    out_dir: str,
    sort_col: str,
    target_rows: int = 1_000_000,
) -> dict:
    """Bin-pack small sorted files into ~``target_rows`` files (the
    OPTIMIZE step): streaming writes and per-batch appends leave many
    small files whose per-file overhead (footers, open latency, manifest
    width) eventually dominates; compaction restores big-file scans
    while PRESERVING the range-clustered layout, so pruning keeps
    working.

    Plan: group ADJACENT files (by manifest min) greedily up to
    ``target_rows`` (row counts from footers — no data read on the
    driver); each multi-file group merges in its own Ray task
    (read -> re-sort by ``sort_col``, which also heals overlapping
    ranges from multiple sorted appends -> one file); singletons are
    left untouched. Deterministic output names; manifest rebuilt from
    footer stats afterward, so a crash mid-compaction is repaired by
    rebuilding (old + new files both prune correctly — compaction never
    changes CONTENT, only packing).
    """
    import ray

    mpath = os.path.join(out_dir, "_skipping_manifest.json")
    manifest = build_manifest(out_dir, sort_col)
    names = sorted(
        manifest["files"],
        key=lambda n: (manifest["files"][n][0] is None, manifest["files"][n][0]),
    )
    counts = {
        n: pq.ParquetFile(os.path.join(out_dir, n)).metadata.num_rows
        for n in names
    }
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for n in names:
        if cur and cur_rows + counts[n] > target_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(n)
        cur_rows += counts[n]
    if cur:
        groups.append(cur)

    @ray.remote
    def merge(paths: list[str], out: str) -> None:
        tabs = [pq.read_table(p) for p in paths]
        cat = pa.concat_tables(tabs)
        v = cat[sort_col].to_numpy(zero_copy_only=False)
        cat = cat.take(pa.array(np.argsort(v, kind="stable")))
        tmp = out + ".tmp"
        pq.write_table(cat, tmp)
        os.replace(tmp, out)

    jobs = []
    merged_groups = []
    for gi, g in enumerate(groups):
        if len(g) < 2:
            continue
        out = os.path.join(out_dir, f"compact-{gi:05d}-{len(g):04d}.parquet")
        jobs.append(merge.remote([os.path.join(out_dir, n) for n in g], out))
        merged_groups.append(g)
    ray.get(jobs)
    for g in merged_groups:
        for n in g:
            os.remove(os.path.join(out_dir, n))
    manifest = build_manifest(out_dir, sort_col)
    with open(mpath, "w") as f:
        json.dump(manifest, f, default=str)
    return manifest
