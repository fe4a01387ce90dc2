"""Data-skipping gate: pruned range scans equal full-scan filters and
actually skip files."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from glue_etl_pipeline_ray.functions.skipping import (
    build_manifest,
    pruned_read,
    sorted_write,
)

SF = "/root/testdata/sf0.001"


def _events_cents(tmp_path):
    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "value_cents": pc.cast(
                    pc.round(pc.multiply(t["value"], 100)), pa.int64()
                ),
            }
        )

    ds = ev.map_batches(cents, batch_format="pyarrow", batch_size=None)
    out = str(tmp_path / "lake")
    manifest = sorted_write(ds, out, "value_cents", rows_per_file=256)
    return ds, out, manifest


def test_pruned_scan_equals_full_filter_and_skips(ray_session, tmp_path):
    ds, out, manifest = _events_cents(tmp_path)
    assert len(manifest["files"]) > 3  # bounded files -> several of them
    lo, hi = 1000, 1900
    got, n_read, n_total = pruned_read(out, "value_cents", lo, hi)
    gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
    full = ds.to_pandas()
    exp = (
        full[(full["value_cents"] >= lo) & (full["value_cents"] <= hi)]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(gdf["event_id"]) == list(exp["event_id"])
    assert (
        gdf["value_cents"].to_numpy() == exp["value_cents"].to_numpy()
    ).all()
    assert 0 < n_read < n_total  # skipping actually happened


def test_pruned_scan_boundaries_inclusive(ray_session, tmp_path):
    ds, out, _ = _events_cents(tmp_path)
    full = ds.to_pandas()
    lo = int(full["value_cents"].min())
    hi = int(full["value_cents"].max())
    got, n_read, n_total = pruned_read(out, "value_cents", lo, hi)
    assert got.count() == len(full)
    assert n_read == n_total


def test_pruned_scan_empty_range(ray_session, tmp_path):
    _, out, _ = _events_cents(tmp_path)
    got, n_read, _ = pruned_read(
        out, "value_cents", 10_000_000, 20_000_000
    )
    assert n_read == 0
    assert got.count() == 0


def test_manifest_rebuildable_from_footers(ray_session, tmp_path):
    import os

    _, out, manifest = _events_cents(tmp_path)
    os.remove(os.path.join(out, "_skipping_manifest.json"))
    rebuilt = build_manifest(out, "value_cents")
    assert rebuilt["files"] == {
        k: [int(a), int(b)] for k, (a, b) in manifest["files"].items()
    }


def test_zorder_box_scan_prunes_both_dimensions(ray_session, tmp_path):
    from glue_etl_pipeline_ray.functions.skipping import (
        pruned_read_box,
        zorder_write,
    )

    ev = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value_cents": pc.cast(
                    pc.round(pc.multiply(t["value"], 100)), pa.int64()
                ),
            }
        )

    ds = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)
    out = str(tmp_path / "zlake")
    manifest = zorder_write(
        ds, out, ("user_id", "value_cents"), rows_per_file=128
    )
    assert len(manifest["columns"]["user_id"]) > 4

    full = ds.to_pandas()
    u_lo, u_hi = 10, 40
    v_lo, v_hi = 1000, 3000
    got, n_read, n_total = pruned_read_box(
        out, {"user_id": (u_lo, u_hi), "value_cents": (v_lo, v_hi)}
    )
    gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = (
        full[
            full["user_id"].between(u_lo, u_hi)
            & full["value_cents"].between(v_lo, v_hi)
        ]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(gdf["event_id"]) == list(exp["event_id"])
    assert 0 < n_read < n_total  # the 2-D box pruned files

    # single-dimension predicates prune too (z-order keeps BOTH tight).
    # Narrow probes: Ray sort's sampled range boundaries shift file
    # stats run-to-run, and a wide single-dim range can marginally
    # touch every file on an unlucky layout (the once-per-suite flake
    # documented in r3) — a tight range keeps the margin decisive
    # while still proving per-dimension pruning.
    _, n_read_u, _ = pruned_read_box(out, {"user_id": (10, 15)})
    _, n_read_v, _ = pruned_read_box(out, {"value_cents": (1000, 1400)})
    assert n_read_u < n_total
    assert n_read_v < n_total


def test_compaction_preserves_content_and_pruning(ray_session, tmp_path):
    from glue_etl_pipeline_ray.functions.skipping import compact_files

    ds, out, before = _events_cents(tmp_path)
    full = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    n_before = len(before["files"])
    after = compact_files(out, "value_cents", target_rows=700)
    assert 1 < len(after["files"]) < n_before  # actually packed
    # content identical
    got, n_read, n_total = pruned_read(
        out, "value_cents", int(full["value_cents"].min()),
        int(full["value_cents"].max()),
    )
    gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(gdf["event_id"]) == list(full["event_id"])
    # pruning still works on the packed layout
    _, n_read2, n_total2 = pruned_read(out, "value_cents", 1000, 1500)
    assert 0 < n_read2 < n_total2


def test_compaction_crash_windows_never_double_count(ray_session, tmp_path):
    """Both crash windows of compact_files leave reads exact: the
    committed manifest is the source of truth, orphans are swept."""
    import os
    import shutil

    from glue_etl_pipeline_ray.functions.skipping import compact_files

    ds, out, before = _events_cents(tmp_path)
    full = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    lo, hi = int(full["value_cents"].min()), int(full["value_cents"].max())

    # window A: crash AFTER a merged output landed in out_dir but BEFORE
    # the manifest commit — fake it by copying a live file to a
    # compact-style name the manifest doesn't reference
    some_live = next(iter(before["files"]))
    orphan = os.path.join(out, "compact-g0001-00000-0002.parquet")
    shutil.copyfile(os.path.join(out, some_live), orphan)
    got, _, _ = pruned_read(out, "value_cents", lo, hi)
    assert got.count() == len(full)  # reads serve from the manifest

    after = compact_files(out, "value_cents", target_rows=700)
    assert not os.path.exists(orphan)  # orphan swept, name regenerated
    got, _, _ = pruned_read(out, "value_cents", lo, hi)
    gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(gdf["event_id"]) == list(full["event_id"])

    # window B: crash AFTER the manifest commit but BEFORE superseded
    # inputs were deleted — fake it by restoring an old (superseded)
    # live file alongside the committed compacted set
    old_name = next(n for n in before["files"] if n in set(before["files"]) - set(after["files"]))
    # regenerate the superseded file's bytes from the surviving data
    sub = full[ (full["value_cents"] >= int(before["files"][old_name][0]))
              & (full["value_cents"] <= int(before["files"][old_name][1])) ]
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(sub, preserve_index=False),
                   os.path.join(out, old_name))
    got, _, _ = pruned_read(out, "value_cents", lo, hi)
    assert got.count() == len(full)  # still exact: manifest ignores it
    compact_files(out, "value_cents", target_rows=700)
    assert not os.path.exists(os.path.join(out, old_name))  # swept
    got, _, _ = pruned_read(out, "value_cents", lo, hi)
    gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(gdf["event_id"]) == list(full["event_id"])


def test_compaction_killed_between_rename_and_commit(ray_session, tmp_path):
    """TRUE injected kill in the window the r4 ADVICE flagged: merged
    outputs have been renamed into out_dir but the manifest commit
    never ran. Reads must stay exact (the committed manifest is the
    truth), and the re-run must sweep the orphaned outputs by its own
    naming scheme and complete the compaction."""
    import glob
    import os

    import pytest

    import glue_etl_pipeline_ray.functions.skipping as sk

    ds, out, before = _events_cents(tmp_path)
    full = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    lo, hi = int(full["value_cents"].min()), int(full["value_cents"].max())

    real = sk._write_manifest

    def crash_at_commit(mpath, manifest):
        raise RuntimeError("injected kill before manifest commit")

    sk._write_manifest = crash_at_commit
    try:
        with pytest.raises(RuntimeError, match="injected kill"):
            sk.compact_files(out, "value_cents", target_rows=700)
    finally:
        sk._write_manifest = real

    # the crash left renamed compact outputs next to the live files
    orphans = glob.glob(os.path.join(out, "compact-g*.parquet"))
    assert orphans, "crash window should leave renamed outputs behind"
    # but reads never double-count: the committed manifest is the truth
    got, _, _ = pruned_read(out, "value_cents", lo, hi)
    gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(gdf["event_id"]) == list(full["event_id"])

    # re-run sweeps the orphans (they match compaction's own naming
    # scheme) and completes; reads still exact, files actually packed
    after = sk.compact_files(out, "value_cents", target_rows=700)
    assert set(after["swept"]) == {os.path.basename(p) for p in orphans}
    assert 1 < len(after["files"]) < len(before["files"])
    got, _, _ = pruned_read(out, "value_cents", lo, hi)
    gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(gdf["event_id"]) == list(full["event_id"])


def test_compaction_sweep_preserves_out_of_band_files(ray_session, tmp_path):
    """The orphan sweep deletes ONLY files compaction owns (its own
    compact-g* outputs and manifest-recorded superseded inputs). A
    parquet file someone else dropped into the directory — a plain
    write_parquet, a manual copy — must survive and be reported as
    foreign, never destroyed (the r4 ADVICE finding: the old sweep
    removed ANY unreferenced *.parquet)."""
    import os

    import pyarrow.parquet as pq

    from glue_etl_pipeline_ray.functions.skipping import compact_files

    ds, out, before = _events_cents(tmp_path)
    stranger = os.path.join(out, "external-export.parquet")
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), stranger)

    after = compact_files(out, "value_cents", target_rows=700)
    assert os.path.exists(stranger)  # preserved
    assert "external-export.parquet" in after["foreign"]
    assert "external-export.parquet" not in after["files"]
    # the compaction itself still happened and reads stay exact
    assert 1 < len(after["files"]) < len(before["files"])
    full = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    got, _, _ = pruned_read(
        out, "value_cents", int(full["value_cents"].min()),
        int(full["value_cents"].max()),
    )
    gdf = got.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(gdf["event_id"]) == list(full["event_id"])
    # a second compaction still leaves the foreign file alone
    after2 = compact_files(out, "value_cents", target_rows=700)
    assert os.path.exists(stranger)
    assert "external-export.parquet" in after2["foreign"]


def test_pruning_typed_comparisons_timestamp_and_numeric_strings(
    ray_session, tmp_path
):
    """_lt coerces JSON-round-tripped stats to the column's kind: a
    timestamp column pruned via its ISO-string manifest stats must not
    false-drop files, and numeric-string orderings never apply."""
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2025, 1, 1)
    n = 3000
    df = pd.DataFrame(
        {
            "i": np.arange(n, dtype=np.int64),
            "ts": [base + dt.timedelta(minutes=int(k)) for k in range(n)],
        }
    )
    ds = rd.from_pandas(df)
    out = str(tmp_path / "tslake")
    manifest = sorted_write(ds, out, "ts", rows_per_file=512)
    assert manifest["kind"] == "timestamp"
    assert len(manifest["files"]) > 3
    lo = base + dt.timedelta(minutes=1000)
    hi = base + dt.timedelta(minutes=1999)
    got, n_read, n_total = pruned_read(out, "ts", lo, hi)
    gdf = got.to_pandas()
    assert len(gdf) == 1000  # exact — no false prune
    assert 0 < n_read < n_total  # and it actually pruned

    # numeric column whose stats JSON-serialize as ints stays exact even
    # when the predicate arrives as numeric strings of differing width
    # ("9" > "10" lexicographically — the old failure mode)
    df2 = pd.DataFrame({"v": np.arange(5, 5000, dtype=np.int64)})
    out2 = str(tmp_path / "numlake")
    sorted_write(rd.from_pandas(df2), out2, "v", rows_per_file=512)
    got2, n_read2, n_total2 = pruned_read(out2, "v", 9, 10)
    assert sorted(got2.to_pandas()["v"]) == [9, 10]
    assert n_read2 < n_total2


def test_append_after_crashed_compaction_does_not_resurrect_superseded(
    ray_session, tmp_path
):
    """A compaction that crashed between its commit and its cleanup
    leaves superseded inputs on disk; a later sorted_write append must
    extend the COMMITTED manifest with only its new files — a directory
    glob would resurrect the superseded inputs (double-counting every
    row) and drop the compaction bookkeeping."""
    import os
    import shutil

    from glue_etl_pipeline_ray.functions.skipping import compact_files

    ds, out, before = _events_cents(tmp_path)
    full = ds.to_pandas()
    lo, hi = int(full["value_cents"].min()), int(full["value_cents"].max())

    # keep copies so we can simulate the crash window after the fact
    backup = str(tmp_path / "backup")
    shutil.copytree(out, backup)
    after = compact_files(out, "value_cents", target_rows=700)
    assert after["compaction_gen"] == 1 and after["superseded"]
    # crash between commit and cleanup: superseded inputs reappear
    for n in after["superseded"]:
        shutil.copyfile(os.path.join(backup, n), os.path.join(out, n))

    # the append: 100 extra rows in a fresh value range
    extra = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(
                    np.arange(10_000_000, 10_000_100, dtype=np.int64)
                ),
                "value_cents": pa.array(
                    np.arange(hi + 10, hi + 110, dtype=np.int64)
                ),
            }
        )
    )
    manifest = sorted_write(extra, out, "value_cents", rows_per_file=256)
    # bookkeeping preserved, superseded NOT resurrected into the live set
    assert manifest["compaction_gen"] == 1
    assert set(manifest["superseded"]) == set(after["superseded"])
    assert not (set(after["superseded"]) & set(manifest["files"]))
    got, _, _ = pruned_read(out, "value_cents", lo, hi + 200)
    assert got.count() == len(full) + 100  # no double-counting

    # the next compaction sweeps the leftovers by name and bumps the
    # generation so output names can never collide with live files
    again = compact_files(out, "value_cents", target_rows=700)
    assert again["compaction_gen"] == 2
    assert set(after["superseded"]) <= set(again["swept"])
    got, _, _ = pruned_read(out, "value_cents", lo, hi + 200)
    assert got.count() == len(full) + 100


def test_compaction_gen_survives_scan_column_rederive(ray_session, tmp_path):
    """compact_files on a DIFFERENT scan column re-derives stats from
    the committed live set; the rebuilt manifest must keep the
    generation counter — a reset would re-use compact-g file names and
    overwrite a live committed file before the commit point."""
    from glue_etl_pipeline_ray.functions.skipping import compact_files

    ds, out, _ = _events_cents(tmp_path)
    n_full = ds.count()
    compact_files(out, "value_cents", target_rows=700)
    after = compact_files(out, "event_id", target_rows=1400)
    assert after["compaction_gen"] == 2
    got, _, _ = pruned_read(out, "event_id", -(1 << 62), 1 << 62)
    assert got.count() == n_full


def test_unknown_scan_column_raises_by_name(ray_session, tmp_path):
    import pytest

    _, out, _ = _events_cents(tmp_path)
    with pytest.raises(KeyError, match="typo_col"):
        pruned_read(out, "typo_col", 0, 1)
