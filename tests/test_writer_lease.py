"""Single-writer lease: a second live writer raises instead of racing
the manifest; a dead holder's lock is taken over after ttl; the lease
is reentrant within one engine and released between calls."""

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec
from glue_etl_pipeline_ray.state.lease import ConcurrentWriter, WriterLease


def _events(work: str, n: int = 60, n_batches: int = 2) -> str:
    rng = np.random.default_rng(5)
    ev = os.path.join(work, "events")
    os.makedirs(ev)
    seq = np.arange(n, dtype=np.int64)
    for b in range(n_batches):
        m = seq % n_batches == b
        t = pa.table(
            {
                "seq": pa.array(seq[m]),
                "batch_id": pa.array(np.full(int(m.sum()), b, np.int64)),
                "op": pa.array(["INSERT"] * int(m.sum()), pa.string()),
                "repo": pa.array(
                    [f"org/r{int(x) % 5}" for x in seq[m]], pa.string()
                ),
                "path": pa.array(
                    [f"f{int(x) % 7}.py" for x in seq[m]], pa.string()
                ),
                "commit": pa.array(["ab" * 20] * int(m.sum()), pa.string()),
                "lang": pa.array(["py"] * int(m.sum()), pa.string()),
                "content": pa.array(
                    [f"c{int(x)}" for x in seq[m]], pa.string()
                ),
            }
        )
        pq.write_table(t, os.path.join(ev, f"batch={b:05d}.parquet"))
    return ev


def test_second_live_writer_raises(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    ev = _events(str(tmp_path))
    eng = ReplayEngine(repo_file_spec(num_buckets=4), lake, writer_lease=True)
    # simulate writer #1 mid-operation: its lease is live on disk
    other = WriterLease(lake, owner="other-host:123:aa").acquire()
    with pytest.raises(ConcurrentWriter, match="other-host:123:aa"):
        eng.replay(ev)
    # nothing was committed under contention
    assert eng.ckpt.watermark == -1
    other.release()
    eng.replay(ev)  # released -> proceeds
    assert eng.ckpt.watermark == 1
    # the per-call lease does not linger after the call
    assert not os.path.exists(os.path.join(lake, "_checkpoint", "WRITER_LOCK"))


def test_stale_lock_taken_over(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    ev = _events(str(tmp_path))
    eng = ReplayEngine(
        repo_file_spec(num_buckets=4), lake, writer_lease=True, lease_ttl_s=60
    )
    WriterLease(lake, owner="dead-host:9:bb").acquire()
    lock = os.path.join(lake, "_checkpoint", "WRITER_LOCK")
    old = time.time() - 3600
    os.utime(lock, (old, old))  # holder died an hour ago
    eng.replay(ev)  # takeover, then normal run
    assert eng.ckpt.watermark == 1
    assert not os.path.exists(lock)


def test_reentrant_through_redrive(ray_session, tmp_path):
    """redrive_dlq calls replay internally; the lease must not deadlock
    or self-collide."""
    lake = str(tmp_path / "lake")
    ev = _events(str(tmp_path))
    eng = ReplayEngine(repo_file_spec(num_buckets=4), lake, writer_lease=True)
    eng.replay(ev)
    out = eng.redrive_dlq()  # empty DLQ -> no-op, but walks the guard
    assert out["n_redriven"] == 0
    # compact + backfill also guard themselves
    eng.compact()
    eng.backfill(lambda t: t)
    assert eng.fsck()["ok"]


def test_same_owner_reacquire_refreshes(tmp_path):
    lake = str(tmp_path / "lake")
    os.makedirs(os.path.join(lake, "_checkpoint"))
    lease = WriterLease(lake, owner="me:1:cc", ttl_s=60)
    lease.acquire()
    lock = os.path.join(lake, "_checkpoint", "WRITER_LOCK")
    old = time.time() - 50
    os.utime(lock, (old, old))
    lease.acquire()  # same owner: refresh, not conflict
    assert time.time() - os.stat(lock).st_mtime < 5
    # a DIFFERENT owner still conflicts while fresh
    with pytest.raises(ConcurrentWriter):
        WriterLease(lake, owner="you:2:dd", ttl_s=60).acquire()
    lease.release()
    WriterLease(lake, owner="you:2:dd", ttl_s=60).acquire()


def test_dml_surfaces_hold_the_lease(ray_session, tmp_path):
    """delete_where / update_where / merge_into / restore are mutating
    calls: a second live writer makes each raise ConcurrentWriter, and
    after release every one proceeds (reentrant through the inner
    replay)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lake = str(tmp_path / "lake")
    ev = _events(str(tmp_path))
    eng = ReplayEngine(
        repo_file_spec(num_buckets=4), lake, writer_lease=True,
        gc_old_versions=False,
    )
    eng.replay(ev)
    wm = eng.ckpt.watermark
    src = pa.table(
        {"repo": ["x/y"], "path": ["a.py"], "commit": ["ab" * 20],
         "lang": ["py"], "content": ["z"]}
    )
    calls = [
        lambda: eng.delete_where(lambda t: pc.equal(t["lang"], "md")),
        lambda: eng.update_where(
            lambda t: pc.equal(t["lang"], "py"),
            lambda r: {"content": r["content"]},
        ),
        lambda: eng.merge_into(src),
        lambda: eng.restore(wm - 1),
    ]
    other = WriterLease(lake, owner="other-host:9:bb").acquire()
    for call in calls:
        with pytest.raises(ConcurrentWriter):
            call()
    assert eng.ckpt.watermark == wm  # nothing committed under contention
    other.release()
    for call in calls:
        call()
    assert eng.ckpt.watermark > wm
    assert not os.path.exists(os.path.join(lake, "_checkpoint", "WRITER_LOCK"))
