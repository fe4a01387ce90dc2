"""CDF-driven replication: replaying ONLY the change feed on top of a
downstream lake must reproduce the upstream live table exactly —
through deletes, schema evolution, differing bucket counts, crash
windows, and repeated syncs."""

import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.pipelines.replicate import replicate
from glue_etl_pipeline_ray.spec import repo_file_spec


def _gen(tmp_path, **kw):
    defaults = dict(n_events=8000, n_repos=15, n_paths=40, n_batches=6,
                    seed=61, delete_frac=0.2, dirty_frac=0.03,
                    evolve_from_batch=4)
    defaults.update(kw)
    return generate_change_events(str(tmp_path), **defaults)


@pytest.mark.parametrize("dst_mode", ["rewrite", "delta"])
def test_incremental_replication_reaches_src_sha(ray_session, tmp_path, dst_mode):
    """Two staged syncs (the second crossing the evolution boundary) into
    a replica with a DIFFERENT bucket count; replica sha == source sha."""
    meta = _gen(tmp_path)
    src = ReplayEngine(repo_file_spec(num_buckets=16),
                       str(tmp_path / "src"), gc_old_versions=False)
    dst = ReplayEngine(repo_file_spec(num_buckets=8),
                       str(tmp_path / "dst"), state_mode=dst_mode)
    staging = str(tmp_path / "staging")

    src.replay(meta["events_dir"], max_batches=3)
    s1 = replicate(src, dst, staging)
    assert s1["applied_batches"] == [2]
    assert dst.final_sha256() == src.final_sha256()

    src.replay(meta["events_dir"])  # batches 3-5, through the evolution
    s2 = replicate(src, dst, staging)
    assert s2["applied_batches"] == [5]
    assert dst.final_sha256() == src.final_sha256()
    assert dst.final_table().num_rows == src.final_table().num_rows

    # no-op sync: nothing new upstream
    s3 = replicate(src, dst, staging)
    assert s3["applied_batches"] == []
    assert dst.final_sha256() == src.final_sha256()

    # committed staged syncs are garbage-collected
    import glob
    import os
    assert glob.glob(os.path.join(staging, "batch=*")) == []


def test_replication_resumes_after_crash_between_stage_and_commit(
    ray_session, tmp_path
):
    """A replicate that dies after staging but before the destination
    commit is completed by the next call (exactly-once via dst's gate)."""
    meta = _gen(tmp_path, n_batches=4, evolve_from_batch=99)
    src = ReplayEngine(repo_file_spec(num_buckets=8),
                       str(tmp_path / "src"), gc_old_versions=False)
    dst = ReplayEngine(repo_file_spec(num_buckets=8), str(tmp_path / "dst"))
    staging = str(tmp_path / "staging")
    src.replay(meta["events_dir"])

    real_replay = dst.replay
    dst.replay = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError):
        replicate(src, dst, staging)
    dst.replay = real_replay

    # second call restages the same content and finishes the sync
    s = replicate(src, dst, staging)
    assert s["applied_batches"] == [3]
    assert dst.final_sha256() == src.final_sha256()
