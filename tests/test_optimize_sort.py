"""optimize_sort: a pure permutation — sha-invariant in both modes,
files actually clustered, crash-safe rerun, scans unchanged, and the
shared one-rewrite-per-watermark ledger enforced."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine, _where_mask
from glue_etl_pipeline_ray.spec import repo_file_spec


def _gen(tmp_path, **kw):
    kw.setdefault("n_events", 4000)
    kw.setdefault("n_batches", 3)
    kw.setdefault("seed", 51)
    return generate_change_events(str(tmp_path), n_repos=10, n_paths=30, **kw)


@pytest.mark.parametrize("state_mode", ["rewrite", "delta"])
def test_optimize_sort_sha_invariant_and_clustered(
    tmp_path, ray_session, state_mode
):
    meta = _gen(tmp_path)
    eng = ReplayEngine(
        repo_file_spec(num_buckets=8), str(tmp_path / "lake"),
        state_mode=state_mode,
    )
    eng.replay(meta["events_dir"])
    sha = eng.final_sha256()
    before = eng.scan([("lang", "==", "py")]).count()

    s = eng.optimize_sort("lang")
    assert s["kind"] == "optimize_sort" and s["buckets"] > 0
    assert eng.final_sha256() == sha  # pure permutation
    assert eng.fsck()["ok"]
    assert eng.scan([("lang", "==", "py")]).count() == before

    # files are actually clustered: within each committed state file the
    # non-null lang values are non-decreasing, nulls at the end
    versions = (
        eng.ckpt.bucket_versions
        if state_mode == "rewrite"
        else {b: d["base"] for b, d in eng.ckpt.bucket_deltas.items()}
    )
    checked = 0
    for b, v in versions.items():
        t = pq.read_table(
            os.path.join(str(tmp_path / "lake"), f"part-{b:05d}-v{v:05d}.parquet"),
            columns=["lang"],
        )
        vals = t["lang"].to_pylist()
        tail_nulls = [x is None for x in vals]
        if any(tail_nulls):
            first_null = tail_nulls.index(True)
            assert all(tail_nulls[first_null:]), "nulls must be at the end"
            vals = vals[:first_null]
        assert vals == sorted(vals)
        checked += 1
    assert checked > 0

    # a fresh engine over the same lake reads the optimized pointers
    eng2 = ReplayEngine(
        repo_file_spec(num_buckets=8), str(tmp_path / "lake"),
        state_mode=state_mode,
    )
    assert eng2.final_sha256() == sha


def test_optimize_sort_crash_rerun_and_ledger(tmp_path, ray_session):
    meta = _gen(tmp_path, seed=52)
    eng = ReplayEngine(repo_file_spec(num_buckets=8), str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    sha = eng.final_sha256()
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.optimize_sort("lang", _fail_before_commit=True)
    # crash left only orphans; lake still reads pre-optimize state
    assert eng.final_sha256() == sha
    eng.optimize_sort("lang")
    assert eng.final_sha256() == sha
    # shared ledger: second rewrite at the same watermark refuses
    with pytest.raises(ValueError, match="already rewritten"):
        eng.optimize_sort("lang")
    with pytest.raises(ValueError, match="unknown sort column"):
        ReplayEngine(
            repo_file_spec(num_buckets=8), str(tmp_path / "lake")
        ).optimize_sort("nope")


def test_part_name_format_assumption(tmp_path, ray_session):
    # the clustered-file check above hardcodes the part naming scheme;
    # pin it so a rename breaks loudly here, not silently there
    meta = _gen(tmp_path, seed=53, n_batches=1)
    eng = ReplayEngine(repo_file_spec(num_buckets=8), str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    b, v = next(iter(eng.ckpt.bucket_versions.items()))
    assert os.path.exists(
        os.path.join(str(tmp_path / "lake"), f"part-{b:05d}-v{v:05d}.parquet")
    )


def test_optimize_sort_produces_prunable_row_groups(tmp_path, ray_session):
    meta = _gen(tmp_path, seed=54, n_events=20000, n_batches=1)
    eng = ReplayEngine(repo_file_spec(num_buckets=2), str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    eng.optimize_sort("lang", row_group_rows=64)
    total = matching = 0
    for b, v in eng.ckpt.bucket_versions.items():
        pf = pq.ParquetFile(
            os.path.join(str(tmp_path / "lake"), f"part-{b:05d}-v{v:05d}.parquet")
        )
        idx = pf.schema_arrow.names.index("lang")
        assert pf.metadata.num_row_groups > 2  # bounded groups exist
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(idx).statistics
            total += 1
            # all-null groups (the tombstone tail) have no min/max and
            # are trivially prunable for any comparison predicate
            if st is not None and st.min is not None and st.min <= "py" <= st.max:
                matching += 1
    # clustered + bounded groups => a point predicate overlaps only a
    # strict subset of row groups: the scanner has something to skip
    assert 0 < matching < total
