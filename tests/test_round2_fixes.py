"""Round-2 hardening: empty-chunk routing, work budget, compaction vs
time travel, hash-collision group identity."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _events(tmp_path, **kw):
    kw.setdefault("n_events", 3000)
    kw.setdefault("n_repos", 12)
    kw.setdefault("n_paths", 30)
    kw.setdefault("n_batches", 4)
    kw.setdefault("seed", 23)
    return generate_change_events(str(tmp_path), **kw)


def test_event_filter_draining_whole_chunks(tmp_path):
    """A route filter that matches NO rows of some batches must not crash
    the map task (round-1 bug: empty boolean mask in the fused reduce)."""

    def _route_none_for_half(t: pa.Table) -> pa.Table:
        # org0 only; several chunks/batches contain zero org0 rows
        return t.filter(pc.starts_with(pc.fill_null(t["repo"], ""), "org0/"))

    meta = _events(tmp_path, n_repos=2, zipf_a=3.0)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(
        spec, str(tmp_path / "lake"), event_filter=_route_none_for_half
    )
    eng.replay(meta["events_dir"])

    odir = tmp_path / "oracle_events"
    os.makedirs(odir)
    for f in meta["files"]:
        pq.write_table(
            _route_none_for_half(pq.read_table(f)), str(odir / os.path.basename(f))
        )
    oracle = replay_oracle(spec, str(odir))
    assert eng.final_sha256() == oracle["sha256"]


def test_filter_matching_nothing_at_all(tmp_path):
    meta = _events(tmp_path, n_batches=2)
    spec = repo_file_spec(num_buckets=4)

    def _nothing(t: pa.Table) -> pa.Table:
        return t.slice(0, 0)

    eng = ReplayEngine(spec, str(tmp_path / "lake"), event_filter=_nothing)
    r = eng.replay(meta["events_dir"])
    assert r["applied_batches"] == [0, 1]
    assert eng.final_table().num_rows == 0


def test_capped_runs_equal_one_uncapped_run(tmp_path):
    """O2 analog: N capped runs converge to the same sha256 as one
    uncapped run (reference work-list cap,
    update_workflow_properties.py:152-160)."""
    meta = _events(tmp_path)
    spec = repo_file_spec(num_buckets=8)
    oracle = replay_oracle(spec, meta["events_dir"])

    eng = ReplayEngine(spec, str(tmp_path / "lake_capped"))
    applied = []
    for _ in range(10):
        r = eng.replay(meta["events_dir"], max_batches=1)
        applied += r["applied_batches"]
        if not r["applied_batches"]:
            break
    assert applied == [0, 1, 2, 3]
    assert eng.final_sha256() == oracle["sha256"]

    # byte-budget variant: each run takes batches until ~1200 events seen
    eng2 = ReplayEngine(spec, str(tmp_path / "lake_budget"))
    for _ in range(10):
        if not eng2.replay(meta["events_dir"], max_events=1200)["applied_batches"]:
            break
    assert eng2.final_sha256() == oracle["sha256"]


def test_compact_preserves_history_when_gc_disabled(tmp_path):
    """compact() on a history-retaining lake must not delete files that
    time-travel snapshot pointers still reference (round-1 bug)."""
    meta = _events(tmp_path, delete_frac=0.3)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])
    h_asof_1 = eng.final_sha256(as_of=1)
    eng.compact()
    # as-of read still works after compaction (old versions retained)
    assert eng.final_sha256(as_of=1) == h_asof_1


def test_grouped_apply_splits_real_key_collisions():
    """Distinct keys in the same hash run must not be conflated: feed the
    collision guard a fabricated run spanning two real keys."""
    import numpy as np

    from glue_etl_pipeline_ray.functions.groups import (
        _collision_runs,
        _true_key_groups,
    )

    t = pa.table({"k": ["a", "a", "b", "c", "c"], "v": [1, 2, 3, 4, 5]})
    # pretend rows 0-2 hashed into one run (a,a,b = collision) and 3-4
    # into another (c,c = clean)
    starts, ends = np.array([0, 3]), np.array([3, 5])
    bad = _collision_runs(t, ["k"], starts, ends)
    assert bad == {0}
    subs = _true_key_groups(t.slice(0, 3), ["k"])
    assert [g["k"].to_pylist() for g in subs] == [["a", "a"], ["b"]]
    assert [g["v"].to_pylist() for g in subs] == [[1, 2], [3]]

    # all-clean partition reports None
    starts2, ends2 = np.array([0, 2, 3]), np.array([2, 3, 5])
    assert _collision_runs(t, ["k"], starts2, ends2) is None


def test_grouped_apply_null_keys_not_conflated_with_values():
    import numpy as np

    from glue_etl_pipeline_ray.functions.groups import _collision_runs

    t = pa.table({"k": [None, None, "x"], "v": [1, 2, 3]})
    starts, ends = np.array([0]), np.array([3])
    assert _collision_runs(t, ["k"], starts, ends) == {0}
    t2 = pa.table({"k": pa.array([None, None], pa.string()), "v": [1, 2]})
    assert _collision_runs(t2, ["k"], np.array([0]), np.array([2])) is None
