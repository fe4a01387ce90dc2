"""state_mode="delta": LSM delta sink (O(batch) merges, fold-on-read,
background compaction) must match the oracle and the rewrite mode."""

import glob
import os

import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _gen(tmp_path, **kw):
    defaults = dict(n_events=6000, n_repos=12, n_paths=40, n_batches=6, seed=21,
                    delete_frac=0.15, dirty_frac=0.04, evolve_from_batch=4)
    defaults.update(kw)
    return generate_change_events(str(tmp_path), **defaults)


def test_delta_matches_oracle_and_rewrite(tmp_path):
    meta = _gen(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    oracle = replay_oracle(spec, meta["events_dir"])

    d = ReplayEngine(spec, str(tmp_path / "lake_d"), state_mode="delta",
                     fold_threshold=3)
    d.replay(meta["events_dir"])
    assert d.final_sha256() == oracle["sha256"]
    assert d.final_dataset().count() == oracle["n_live"]

    r = ReplayEngine(spec, str(tmp_path / "lake_r"))
    r.replay(meta["events_dir"])
    assert r.final_sha256() == d.final_sha256()

    # folding actually happened (fold_threshold=3 over 6 batches)
    bd = d.ckpt.bucket_deltas
    assert any(x["base"] is not None for x in bd.values())


def test_delta_crash_resume_idempotent(tmp_path):
    meta = _gen(tmp_path, n_batches=5)
    spec = repo_file_spec(num_buckets=16)
    oracle = replay_oracle(spec, meta["events_dir"])
    lake = str(tmp_path / "lake")

    eng = ReplayEngine(spec, lake, state_mode="delta", fold_threshold=3)
    with pytest.raises(RuntimeError):
        eng.replay(meta["events_dir"], fail_before_commit_of=2)
    assert eng.ckpt.watermark == 1

    eng2 = ReplayEngine(spec, lake, state_mode="delta", fold_threshold=3)
    r = eng2.replay(meta["events_dir"])
    assert r["applied_batches"] == [2, 3, 4]
    assert eng2.final_sha256() == oracle["sha256"]

    eng3 = ReplayEngine(spec, lake, state_mode="delta", fold_threshold=3)
    assert eng3.replay(meta["events_dir"])["applied_batches"] == []
    assert eng3.final_sha256() == oracle["sha256"]


def test_delta_compact_folds_everything(tmp_path):
    meta = _gen(tmp_path, n_batches=4)
    spec = repo_file_spec(num_buckets=16)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake, state_mode="delta", fold_threshold=100)
    eng.replay(meta["events_dir"])
    sha = eng.final_sha256()

    res = eng.compact()  # fold all + drop tombstones
    assert res["compacted_buckets"] > 0
    assert eng.final_sha256() == sha
    # no delta files remain; manifest has bases only
    assert glob.glob(os.path.join(lake, "delta-*.parquet")) == []
    assert all(len(d["deltas"]) == 0 for d in eng.ckpt.bucket_deltas.values())
    # a fresh engine over the compacted lake reads the same state
    eng2 = ReplayEngine(spec, lake, state_mode="delta")
    assert eng2.final_sha256() == sha


def test_delta_time_travel_with_history(tmp_path):
    import shutil

    meta = _gen(tmp_path, n_batches=4)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), state_mode="delta",
                       fold_threshold=2, gc_old_versions=False)
    eng.replay(meta["events_dir"])

    for as_of in (0, 1, 2, 3):
        prefix = tmp_path / f"prefix{as_of}" / "events"
        os.makedirs(prefix)
        for b in range(as_of + 1):
            name = f"batch={b:05d}.parquet"
            shutil.copy(os.path.join(meta["events_dir"], name), prefix / name)
        oracle = replay_oracle(spec, str(prefix))
        assert eng.final_sha256(as_of=as_of) == oracle["sha256"], as_of
