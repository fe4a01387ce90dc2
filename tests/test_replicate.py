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


def _write_event_batch(ev_dir, b, rows):
    """rows: list of (seq, op, repo, path, content)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(ev_dir, exist_ok=True)
    seqs, ops, repos, paths, contents = zip(*rows)
    n = len(rows)
    t = pa.table(
        {
            "seq": pa.array(seqs, pa.int64()),
            "batch_id": pa.array([b] * n, pa.int64()),
            "op": pa.array(ops, pa.string()),
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(["a" * 40] * n, pa.string()),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(contents, pa.string()),
            "event_id": pa.array([f"ev-{s}" for s in seqs], pa.string()),
            "ts": pa.array([1_700_000_000_000 + s for s in seqs], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(ev_dir, f"batch={b:05d}.parquet"))


def test_stale_staged_sync_from_crashed_older_target_is_purged(
    ray_session, tmp_path
):
    """A sync staged at target t1 that crashed before commit must NOT be
    replayed next to the fresh (from, t2] feed: a key whose value at t2
    reverted to its from-value has no row in the fresh net feed, so the
    stale feed's intermediate value would win — permanent divergence."""
    import os

    ev = str(tmp_path / "events")
    _write_event_batch(ev, 0, [(0, "INSERT", "r/r0", "src/a.py", "A")])
    _write_event_batch(ev, 1, [(1, "UPDATE", "r/r0", "src/a.py", "B")])
    _write_event_batch(
        ev,
        2,
        [
            (2, "UPDATE", "r/r0", "src/a.py", "A"),  # revert to A
            (3, "INSERT", "r/r1", "src/b.py", "C"),  # keeps feed non-empty
        ],
    )
    src = ReplayEngine(repo_file_spec(num_buckets=4), str(tmp_path / "src"),
                       gc_old_versions=False)
    dst = ReplayEngine(repo_file_spec(num_buckets=4), str(tmp_path / "dst"))
    staging = str(tmp_path / "staging")

    src.replay(ev, max_batches=1)
    replicate(src, dst, staging)  # dst@0: key = A

    src.replay(ev, max_batches=1)  # wm=1: key = B
    real_replay = dst.replay
    dst.replay = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError):
        replicate(src, dst, staging)  # stages batch=00001, dies
    dst.replay = real_replay
    assert os.path.isdir(os.path.join(staging, "batch=00001"))

    src.replay(ev)  # wm=2: key reverted to A
    s = replicate(src, dst, staging)
    assert s["applied_batches"] == [2]  # the stale 1 was purged, not applied
    assert not os.path.isdir(os.path.join(staging, "batch=00001"))
    assert dst.final_sha256() == src.final_sha256()
    t = dst.final_table().to_pylist()
    assert {r["repo"]: r["content"] for r in t} == {"r/r0": "A", "r/r1": "C"}


def test_replication_into_spec_with_renamed_meta_columns(
    ray_session, tmp_path
):
    """The staged events must use the DESTINATION spec's op/seq column
    names — hardcoded "op"/"seq" would be null-filled by evolution,
    resurrecting deletes and breaking LWW on the replica."""
    import dataclasses

    meta = _gen(tmp_path, n_batches=3, evolve_from_batch=99)
    src = ReplayEngine(repo_file_spec(num_buckets=8),
                       str(tmp_path / "src"), gc_old_versions=False)
    base = repo_file_spec(num_buckets=4)
    dst_spec = dataclasses.replace(
        base,
        seq_col="commit_seq",
        op_col="operation",
        rules=tuple(
            dataclasses.replace(
                r,
                col={"seq": "commit_seq", "op": "operation"}.get(r.col, r.col),
            )
            for r in base.rules
        ),
    )
    dst = ReplayEngine(dst_spec, str(tmp_path / "dst"))
    staging = str(tmp_path / "staging")
    src.replay(meta["events_dir"])
    replicate(src, dst, staging)
    assert dst.final_sha256() == src.final_sha256()
    assert dst.final_table().num_rows == src.final_table().num_rows
