"""TIMESTAMP AS OF: commit wall-clocks recorded in the checkpoint
manifest resolve a timestamp to the latest batch committed at or before
it (Delta-Lake ``TIMESTAMP AS OF`` convention), composing with the
existing batch-id time travel."""

import os

import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _pin_commit_clocks(eng, times):
    """Deterministic clocks: overwrite commit_ts per batch id."""
    m = eng.ckpt._m
    for bid_s, summ in m["batches"].items():
        summ["commit_ts"] = times[int(bid_s)]
    eng.ckpt._write(m)


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_resolve_as_of_picks_latest_at_or_before(tmp_path, mode, ray_session):
    meta = generate_change_events(str(tmp_path), n_events=1200, n_batches=3, seed=41)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(
        spec, str(tmp_path / "lake"), state_mode=mode, gc_old_versions=False
    )
    eng.replay(meta["events_dir"])
    # every commit recorded a wall-clock
    assert all(
        "commit_ts" in s for s in eng.ckpt._m["batches"].values()
    )
    _pin_commit_clocks(eng, {0: 1000.0, 1: 2000.0, 2: 3000.0})

    assert eng.resolve_as_of(1000.0) == 0  # exact hit
    assert eng.resolve_as_of(1999.9) == 0  # between commits -> earlier
    assert eng.resolve_as_of(2000.0) == 1
    assert eng.resolve_as_of(10_000.0) == 2  # after tip -> tip
    with pytest.raises(ValueError, match="precedes the first commit"):
        eng.resolve_as_of(999.9)

    # composes with batch-id time travel: the resolved snapshot IS the
    # as-of snapshot
    bid = eng.resolve_as_of(2500.0)
    assert bid == 1
    assert eng.final_sha256(as_of=bid) == eng.final_sha256(as_of=1)


def test_resolve_survives_fresh_process_reload(tmp_path, ray_session):
    """commit_ts persists in the manifest: a fresh engine resolves the
    same timestamps."""
    meta = generate_change_events(str(tmp_path), n_events=800, n_batches=2, seed=42)
    spec = repo_file_spec(num_buckets=4)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake, gc_old_versions=False)
    eng.replay(meta["events_dir"])
    _pin_commit_clocks(eng, {0: 10.0, 1: 20.0})
    fresh = ReplayEngine(spec, lake, gc_old_versions=False)
    assert fresh.resolve_as_of(15.0) == 0
    assert fresh.resolve_as_of(20.0) == 1


def test_commit_clocks_are_monotone_across_dml(tmp_path, ray_session):
    """Batches commit in id order, so recorded clocks are monotone —
    including DML commits, which go through the same commit path."""
    import pyarrow.compute as pc

    meta = generate_change_events(str(tmp_path), n_events=900, n_batches=2, seed=43)
    spec = repo_file_spec(num_buckets=4)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    eng.delete_where(lambda t: pc.equal(t["lang"], "md"))
    b = eng.ckpt._m["batches"]
    ts = [b[str(i)]["commit_ts"] for i in sorted(int(k) for k in b)]
    assert ts == sorted(ts)
    assert str(eng.ckpt.watermark) in b  # the DML batch has a clock too


def test_history_reports_operations(tmp_path, ray_session):
    """history(): one metadata row per commit, newest first, with the
    DML kind persisted (a fresh engine reads the same log)."""
    import pyarrow.compute as pc

    meta = generate_change_events(str(tmp_path), n_events=900, n_batches=2, seed=44)
    spec = repo_file_spec(num_buckets=4)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake)
    eng.replay(meta["events_dir"])
    eng.delete_where(lambda t: pc.equal(t["lang"], "md"))
    eng.merge_into(
        __import__("pyarrow").table(
            {
                "repo": ["x/y"], "path": ["a.py"], "commit": ["ab" * 20],
                "lang": ["py"], "content": ["z"],
            }
        )
    )
    h = ReplayEngine(spec, lake).history()  # fresh engine: persisted log
    assert h["batch_id"].to_pylist() == [3, 2, 1, 0]
    assert h["operation"].to_pylist() == ["merge", "delete", "ingest", "ingest"]
    assert all(t == sorted(h["commit_ts"].to_pylist(), reverse=True)[i]
               for i, t in enumerate(h["commit_ts"].to_pylist()))
    assert h["n_deletes"][1].as_py() > 0


def test_history_annotation_self_heals(tmp_path, ray_session):
    """Crash between commit and the history annotation: resume_dml (or
    any later DML entry) recovers the kind from the stage manifest."""
    import pyarrow.compute as pc

    meta = generate_change_events(str(tmp_path), n_events=800, n_batches=2, seed=45)
    spec = repo_file_spec(num_buckets=4)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake)
    eng.replay(meta["events_dir"])
    s = eng.delete_where(lambda t: pc.equal(t["lang"], "md"))
    bid = s["batch_id"]
    # simulate the crash window: drop the persisted annotation
    m = eng.ckpt._m
    del m["batches"][str(bid)]["dml"]
    eng.ckpt._write(m)
    fresh = ReplayEngine(spec, lake)
    assert fresh.resume_dml() is None  # nothing pending...
    h = fresh.history()  # ...but the kind is healed from the stage manifest
    op = {r["batch_id"]: r["operation"] for r in h.to_pylist()}
    assert op[bid] == "delete"
