"""Exactly-once semantics (FIXTURES.md F6): replay-twice and
kill-and-resume must both yield the identical final sha256 — the fix for
the reference's at-least-once append hazard (SURVEY.md 2.9)."""

import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _setup(tmp_path, **kw):
    meta = generate_change_events(
        str(tmp_path), n_events=2400, n_repos=10, n_paths=30, n_batches=3,
        seed=11, **kw
    )
    spec = repo_file_spec(num_buckets=8)
    oracle = replay_oracle(spec, meta["events_dir"])
    return meta, spec, oracle


def test_replay_twice_identical(tmp_path):
    meta, spec, oracle = _setup(tmp_path)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    h1 = eng.final_sha256()
    # second full replay: all batches committed -> all skipped, state unchanged
    r2 = ReplayEngine(spec, str(tmp_path / "lake")).replay(meta["events_dir"])
    assert r2["applied_batches"] == []
    assert ReplayEngine(spec, str(tmp_path / "lake")).final_sha256() == h1
    assert h1 == oracle["sha256"]


def test_reapply_committed_batch_is_noop(tmp_path):
    """Force re-application of an already-committed batch (simulating a
    crash between sink promotion and checkpoint commit): idempotent."""
    meta, spec, oracle = _setup(tmp_path)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    h1 = eng.final_sha256()
    from glue_etl_pipeline_ray.pipelines.replay import discover_batches

    batches = discover_batches(meta["events_dir"])
    for bid, files in batches:  # re-apply every batch, out of order too
        eng.apply_batch(bid, files)
    assert eng.final_sha256() == h1 == oracle["sha256"]


def test_kill_and_resume(tmp_path):
    meta, spec, oracle = _setup(tmp_path)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.replay(meta["events_dir"], fail_before_commit_of=1)
    # crash happened AFTER batch 1's sink promotion but BEFORE its commit
    assert eng.ckpt.watermark == 0
    # fresh engine (new process analog) resumes: re-runs batch 1, then 2
    eng2 = ReplayEngine(spec, str(tmp_path / "lake"))
    r = eng2.replay(meta["events_dir"])
    assert r["applied_batches"] == [1, 2]
    assert eng2.final_sha256() == oracle["sha256"]


def test_old_update_cannot_resurrect_deleted_key(tmp_path):
    """Tombstone semantics: re-applying a batch whose UPDATE precedes a
    later batch's DELETE must not bring the key back."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    spec = repo_file_spec(num_buckets=4)
    ev_dir = tmp_path / "events"
    os.makedirs(ev_dir)

    def w(bid, rows):
        pq.write_table(pa.table(rows), str(ev_dir / f"batch={bid:05d}.parquet"))

    c = "a" * 40
    w(0, {"seq": [1], "batch_id": [0], "op": ["INSERT"], "repo": ["o/r"],
          "path": ["f.py"], "commit": [c], "lang": ["py"], "content": ["v1"],
          })
    w(1, {"seq": [2], "batch_id": [1], "op": ["DELETE"], "repo": ["o/r"],
          "path": ["f.py"], "commit": [None], "lang": [None], "content": [None],
          })
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(str(ev_dir))
    assert eng.final_table().num_rows == 0
    # re-apply batch 0 (stale writer): key must stay deleted
    eng.apply_batch(0, [str(ev_dir / "batch=00000.parquet")])
    assert eng.final_table().num_rows == 0
