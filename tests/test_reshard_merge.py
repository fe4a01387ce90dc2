"""Scale-IN reshard gate (``reshard(mode="merge")``): merging bucket
families is content-neutral (sha equality), resumes replay
exactly-once on the smaller bucket count in BOTH state modes, carries
tombstones and the DLQ, composes with a later split, and rejects
non-divisor factors."""

import glob
import os

import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _stream(tmp_path, dirty_frac=0.02):
    meta = generate_change_events(
        str(tmp_path / "gen"), n_events=9000, n_batches=6, n_repos=20,
        n_paths=50, delete_frac=0.12, dirty_frac=dirty_frac, seed=33,
    )
    return meta["events_dir"]


def test_merge_rewrite_preserves_state_and_resumes(ray_session, tmp_path):
    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(ev, max_batches=4)
    sha_pre = eng.final_sha256()

    eng2 = eng.reshard(str(tmp_path / "lake2"), factor=4, mode="merge")
    assert eng2.spec.num_buckets == 4
    assert eng2.ckpt.watermark == eng.ckpt.watermark == 3
    assert eng2.final_sha256() == sha_pre  # merge is content-neutral
    # the new lake really is coarser: at most 4 part files
    parts = glob.glob(os.path.join(str(tmp_path / "lake2"), "part-*.parquet"))
    assert 0 < len(parts) <= 4

    out = eng2.replay(ev)
    assert out["applied_batches"] == [4, 5]
    assert eng2.final_sha256() == replay_oracle(spec, ev)["sha256"]

    # point lookups hash with the new bucket count
    live = eng2.final_table()
    keys = list(
        zip(live["repo"].to_pylist()[:5], live["path"].to_pylist()[:5])
    )
    got = eng2.lookup(keys)
    assert got.num_rows == len(keys)


def test_merge_delta_mode_and_fsck(ray_session, tmp_path):
    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(
        spec, str(tmp_path / "dlake"), state_mode="delta", fold_threshold=2
    )
    eng.replay(ev, max_batches=4)
    sha_pre = eng.final_sha256()

    eng2 = eng.reshard(str(tmp_path / "dlake2"), factor=2, mode="merge")
    assert eng2.spec.num_buckets == 8
    assert eng2.final_sha256() == sha_pre
    r = eng2.fsck()
    assert r["ok"] and not r["missing"]

    out = eng2.replay(ev)
    assert out["applied_batches"] == [4, 5]
    assert eng2.final_sha256() == replay_oracle(spec, ev)["sha256"]


def test_merge_then_split_round_trip(ray_session, tmp_path):
    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(ev)
    sha = eng.final_sha256()
    merged = eng.reshard(str(tmp_path / "m"), factor=4, mode="merge")
    assert merged.spec.num_buckets == 2
    back = merged.reshard(str(tmp_path / "s"), factor=4, mode="split")
    assert back.spec.num_buckets == 8
    assert merged.final_sha256() == sha
    assert back.final_sha256() == sha


def test_merge_carries_dlq(ray_session, tmp_path):
    ev = _stream(tmp_path, dirty_frac=0.05)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(ev)
    eng2 = eng.reshard(str(tmp_path / "lake2"), factor=2, mode="merge")
    # the quarantine queue moved with the lake: redrive still works
    # (rows re-quarantine exactly once under the new batch, sha no-op)
    sha = eng2.final_sha256()
    res = eng2.redrive_dlq()
    assert res["n_redriven"] > 0
    assert eng2.final_sha256() == sha  # all rows were truly unfixable


def test_merge_rejects_non_divisor(ray_session, tmp_path):
    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(ev, max_batches=2)
    with pytest.raises(ValueError, match="divide"):
        eng.reshard(str(tmp_path / "bad"), factor=3, mode="merge")
    with pytest.raises(ValueError, match="mode"):
        eng.reshard(str(tmp_path / "bad2"), factor=2, mode="shrink")
