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

import datetime as _dt
import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset


def _write_manifest(mpath: str, manifest: dict) -> None:
    """Atomic manifest commit: the rename is the single point at which a
    new live-file set becomes visible (compaction relies on this)."""
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, default=str)
    os.replace(tmp, mpath)


def sorted_write(
    ds: Dataset,
    out_dir: str,
    sort_col: str,
    rows_per_file: int = 100_000,
) -> dict:
    """Sort by ``sort_col``, write Parquet, return + persist the
    per-file min/max manifest.

    Appends to a dir with a COMMITTED manifest extend that manifest's
    live set with only the newly written files — never a directory
    glob: a compaction that crashed after its commit leaves superseded
    inputs on disk, and a glob would resurrect them (double-counting
    every superseded row) and drop the compaction bookkeeping."""
    os.makedirs(out_dir, exist_ok=True)
    mpath = os.path.join(out_dir, "_skipping_manifest.json")
    before = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(out_dir, "*.parquet"))
    }
    ds.sort(sort_col).write_parquet(
        out_dir, min_rows_per_file=rows_per_file, max_rows_per_file=rows_per_file
    )
    new_names = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(out_dir, "*.parquet"))
        if os.path.basename(p) not in before
    ]
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
        if "files" in prev and prev.get("sort_col") == sort_col:
            add = build_manifest(out_dir, sort_col, names=new_names)
            manifest = {
                **prev,
                "kind": prev.get("kind") if prev.get("kind") else add["kind"],
                "files": {**prev["files"], **add["files"]},
            }
        else:
            # different scan column (or a zorder manifest): re-derive
            # stats over committed live + new files, carrying the
            # compaction bookkeeping through the rebuild
            live = (
                list(prev["files"])
                if "files" in prev
                else list(next(iter(prev["columns"].values())))
            )
            manifest = build_manifest(
                out_dir, sort_col, names=live + new_names
            )
            for k in ("compaction_gen", "superseded"):
                if k in prev:
                    manifest[k] = prev[k]
    else:
        manifest = build_manifest(out_dir, sort_col)
    _write_manifest(mpath, manifest)
    return manifest


def _col_kind(field_type: pa.DataType) -> str | None:
    """Collapse an Arrow type to the comparison kind recorded in the
    manifest, so pruning can coerce JSON-round-tripped stat values back
    to the column's real ordering instead of comparing strings."""
    if pa.types.is_integer(field_type):
        return "int"
    if pa.types.is_floating(field_type):
        return "float"
    if (
        pa.types.is_timestamp(field_type)
        or pa.types.is_date(field_type)
        or pa.types.is_time(field_type)
    ):
        return "timestamp"
    if pa.types.is_string(field_type) or pa.types.is_large_string(field_type):
        return "str"
    return None


def _file_minmax(path: str, sort_col: str) -> tuple:
    """(min, max, kind) of ``sort_col`` from one file's footer stats."""
    md = pq.ParquetFile(path).metadata
    schema = md.schema.to_arrow_schema()
    idx = schema.get_field_index(sort_col)
    if idx < 0:
        # get_field_index's -1 sentinel would silently classify the
        # LAST column and then crash (or mis-stat) downstream
        raise KeyError(
            f"column {sort_col!r} not in {os.path.basename(path)} "
            f"(has {schema.names})"
        )
    kind = _col_kind(schema.field(idx).type)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None, None, kind
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return lo, hi, kind


def build_manifest(
    out_dir: str, sort_col: str, names: list[str] | None = None
) -> dict:
    """Per-file (min, max) of ``sort_col`` from Parquet footer stats —
    rebuildable from the files alone. Only for initial builds / healing:
    compaction treats the COMMITTED manifest as the live-file source of
    truth (see ``compact_files``); pass ``names`` to restrict the stats
    rebuild to a committed live set (never glob past one)."""
    if names is None:
        paths = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    else:
        paths = [os.path.join(out_dir, n) for n in sorted(names)]
    files = {}
    kind = None
    for path in paths:
        lo, hi, kind = _file_minmax(path, sort_col)
        files[os.path.basename(path)] = [lo, hi]
    return {"sort_col": sort_col, "kind": kind, "files": files}


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
        if manifest.get("sort_col") != sort_col or "kind" not in manifest:
            # re-derive stats for a different scan column, but only over
            # the COMMITTED live set — never glob past a manifest
            # (zorder manifests list files under per-column "columns")
            names = (
                list(manifest["files"])
                if "files" in manifest
                else list(next(iter(manifest["columns"].values())))
            )
            manifest = build_manifest(out_dir, sort_col, names=names)
    else:
        manifest = build_manifest(out_dir, sort_col)

    kind = manifest.get("kind")
    keep = []
    for name, (fmin, fmax) in manifest["files"].items():
        # stats missing -> cannot prove non-overlap, must read
        if fmin is None or fmax is None or not (
            _lt(hi, fmin, kind) or _lt(fmax, lo, kind)
        ):
            keep.append(os.path.join(out_dir, name))
    total = len(manifest["files"])
    if not keep:
        # footer-only schema read: the zero-overlap case must not pay a
        # full data read of the first file just to type an empty table
        sch = pq.read_schema(
            os.path.join(out_dir, next(iter(manifest["files"])))
        )
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table()), 0, total

    ds = rd.read_parquet(keep, columns=columns)

    def exact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[sort_col]
        mask = pc.and_(
            pc.greater_equal(col, pa.scalar(lo, col.type)),
            pc.less_equal(col, pa.scalar(hi, col.type)),
        )
        return t.filter(mask)

    return (
        ds.map_batches(exact, batch_format="pyarrow", batch_size=None),
        len(keep),
        total,
    )


def _coerce(v, kind):
    """Coerce a stat/predicate value (possibly JSON-round-tripped to
    str) back to the column's comparison domain; raise if impossible."""
    if kind == "int" or kind == "float":
        if isinstance(v, bool):
            raise ValueError("bool is not a numeric stat")
        return float(v)
    if kind == "timestamp":
        if isinstance(v, (_dt.datetime, _dt.date)):
            ts = v if isinstance(v, _dt.datetime) else _dt.datetime(
                v.year, v.month, v.day
            )
        elif isinstance(v, str):
            # json default=str renders "YYYY-MM-DD HH:MM:SS[.ffffff]"
            ts = _dt.datetime.fromisoformat(v.replace(" ", "T"))
        elif isinstance(v, (int, float)):
            raise ValueError("ambiguous numeric timestamp")
        else:
            raise ValueError(f"cannot coerce {type(v)} to timestamp")
        return ts.replace(tzinfo=None)
    if kind == "str":
        if not isinstance(v, str):
            raise ValueError("non-string predicate on a string column")
        return v
    raise ValueError(f"unknown column kind {kind!r}")


def _lt(a, b, kind=None) -> bool:
    """Strict a < b, used ONLY to prove a file range does not overlap
    the predicate. Both sides are coerced to the column's declared kind
    first (lexicographic str(9) > str(10) mis-orders numbers and mixed
    timestamp renderings); anything un-coercible returns False =
    "cannot prove non-overlap", i.e. the file is kept, never dropped."""
    try:
        return _coerce(a, kind) < _coerce(b, kind)
    except (ValueError, TypeError):
        return False


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
    per_col = {c: build_manifest(out_dir, c) for c in cols}
    manifest = {
        "zorder_cols": list(cols),
        "kinds": {c: per_col[c]["kind"] for c in cols},
        "columns": {c: per_col[c]["files"] for c in cols},
    }
    _write_manifest(os.path.join(out_dir, "_skipping_manifest.json"), manifest)
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
    kinds = manifest.get("kinds", {})
    names = list(next(iter(per_col.values())).keys())
    keep = []
    for name in names:
        ok = True
        for c, (lo, hi) in predicates.items():
            fmin, fmax = per_col[c][name]
            if fmin is None or fmax is None:
                continue  # unknown stats: cannot prune on this column
            if _lt(hi, fmin, kinds.get(c)) or _lt(fmax, lo, kinds.get(c)):
                ok = False
                break
        if ok:
            keep.append(os.path.join(out_dir, name))
    total = len(names)
    if not keep:
        sch = pq.read_schema(os.path.join(out_dir, names[0]))
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table()), 0, total

    ds = rd.read_parquet(keep, columns=columns)

    def exact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = None
        for c, (lo, hi) in predicates.items():
            col = t[c]
            m = pc.and_(
                pc.greater_equal(col, pa.scalar(lo, col.type)),
                pc.less_equal(col, pa.scalar(hi, col.type)),
            )
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

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

    Crash safety: the COMMITTED manifest is the source of truth for the
    live file set (``pruned_read`` serves from it, never from a glob).
    The protocol is: (0) sweep any ``*.parquet`` not reachable from the
    committed manifest — those are leftovers of a crashed compaction,
    never live data; (1) merge each group into a staging dir; (2) move
    staged outputs into place (still invisible — not in the manifest);
    (3) COMMIT by atomically replacing the manifest with the new live
    set; (4) delete superseded inputs. A crash before (3) changes
    nothing observable (the sweep cleans the orphans on re-run); a crash
    after (3) leaves superseded inputs on disk that the manifest no
    longer references, so reads never double-count and the next run
    sweeps them. Output names carry a generation counter from the
    manifest so two successive compactions can never collide on a live
    file name.

    Plan: group ADJACENT files (by manifest min) greedily up to
    ``target_rows`` (row counts from footers — no data read on the
    driver); each multi-file group merges in its own Ray task
    (read -> re-sort by ``sort_col``, which also heals overlapping
    ranges from multiple sorted appends -> one file); singletons are
    left untouched.
    """
    import ray

    mpath = os.path.join(out_dir, "_skipping_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest.get("sort_col") != sort_col or "kind" not in manifest:
            names = (
                list(manifest["files"])
                if "files" in manifest
                else list(next(iter(manifest["columns"].values())))
            )
            rebuilt = build_manifest(out_dir, sort_col, names=names)
            # the stats rebuild must not reset the generation counter
            # (a reset re-uses compact-g names and step (2)'s replace
            # would overwrite a LIVE committed file pre-commit) nor
            # drop the superseded list the sweep deletes by name
            for k in ("compaction_gen", "superseded"):
                if k in manifest:
                    rebuilt[k] = manifest[k]
            manifest = rebuilt
    else:
        manifest = build_manifest(out_dir, sort_col)

    # (0) orphan sweep — deletes ONLY files compaction provably owns:
    # (a) names the committed manifest recorded as superseded inputs
    # (a crash between commit and cleanup left them behind), and
    # (b) ``compact-g*`` outputs not in the live set (a crash between
    # stage-move and commit left them behind; the prefix is this
    # function's own naming scheme). A file added out-of-band (a plain
    # ds.write_parquet, a manual copy, a second writer) matches
    # neither and is PRESERVED — reported under ``"foreign"`` in the
    # return value, never destroyed.
    live = set(manifest["files"])
    superseded_prev = set(manifest.get("superseded", []))
    swept: list[str] = []
    foreign: list[str] = []
    for path in glob.glob(os.path.join(out_dir, "*.parquet")):
        name = os.path.basename(path)
        if name in live:
            continue
        if name in superseded_prev or name.startswith("compact-g"):
            os.remove(path)
            swept.append(name)
        else:
            foreign.append(name)
    staging = os.path.join(out_dir, "_compact_staging")
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)

    gen = int(manifest.get("compaction_gen", 0)) + 1
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

    # (1) merge into staging
    jobs = []
    plan: list[tuple[list[str], str | None]] = []  # (group, merged name)
    for gi, g in enumerate(groups):
        if len(g) < 2:
            plan.append((g, None))
            continue
        out_name = f"compact-g{gen:04d}-{gi:05d}-{len(g):04d}.parquet"
        jobs.append(
            merge.remote(
                [os.path.join(out_dir, n) for n in g],
                os.path.join(staging, out_name),
            )
        )
        plan.append((g, out_name))
    ray.get(jobs)

    # (2) move staged outputs into place — not yet in the manifest,
    # so still invisible to readers
    for _, out_name in plan:
        if out_name is not None:
            os.replace(
                os.path.join(staging, out_name),
                os.path.join(out_dir, out_name),
            )
    shutil.rmtree(staging, ignore_errors=True)

    # (3) COMMIT: new live set in one atomic manifest replace
    new_files = {}
    for g, out_name in plan:
        if out_name is None:
            new_files[g[0]] = manifest["files"][g[0]]
        else:
            lo, hi, _ = _file_minmax(os.path.join(out_dir, out_name), sort_col)
            new_files[out_name] = [lo, hi]
    manifest = {
        "sort_col": sort_col,
        "kind": manifest.get("kind"),
        "compaction_gen": gen,
        "files": new_files,
        # inputs replaced by this generation — recorded AT the commit
        # so a crash before step (4) leaves them deletable by name on
        # the next run (the sweep never guesses from a glob)
        "superseded": sorted(
            n for g, out_name in plan if out_name is not None for n in g
        ),
    }
    _write_manifest(mpath, manifest)

    # (4) post-commit cleanup of superseded inputs (crash here leaves
    # unreferenced orphans only — swept BY NAME by the next run)
    for g, out_name in plan:
        if out_name is not None:
            for n in g:
                os.remove(os.path.join(out_dir, n))
    return {**manifest, "swept": swept, "foreign": foreign}
