"""Compaction (tombstone GC) and time-travel (as-of) reads."""

import os
import shutil

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _gen(tmp_path, **kw):
    defaults = dict(n_events=4000, n_repos=12, n_paths=40, n_batches=4, seed=9,
                    delete_frac=0.25)
    defaults.update(kw)
    return generate_change_events(str(tmp_path), **defaults)


def test_compact_drops_tombstones_preserves_live_state(tmp_path):
    meta = _gen(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    sha_before = eng.final_sha256()
    n_live = eng.final_table().num_rows

    res = eng.compact()
    assert res["dropped_tombstones"] > 0
    assert eng.final_sha256() == sha_before
    assert eng.final_table().num_rows == n_live

    # state files now hold exactly the live rows (no tombstones left)
    import pyarrow.parquet as pq
    total_state = sum(
        pq.ParquetFile(f).metadata.num_rows for f in eng._state_files()
    )
    assert total_state == n_live

    # a resume after compaction is a no-op with the same sha
    eng2 = ReplayEngine(spec, str(tmp_path / "lake"))
    r = eng2.replay(meta["events_dir"])
    assert r["applied_batches"] == []
    assert eng2.final_sha256() == sha_before


def test_time_travel_matches_prefix_oracle(tmp_path):
    meta = _gen(tmp_path, n_batches=4)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])

    for as_of in (0, 1, 2, 3):
        # oracle over only the first as_of+1 batches
        prefix = tmp_path / f"prefix{as_of}"
        os.makedirs(prefix / "events")
        for b in range(as_of + 1):
            name = f"batch={b:05d}.parquet"
            shutil.copy(
                os.path.join(meta["events_dir"], name), prefix / "events" / name
            )
        oracle = replay_oracle(spec, str(prefix / "events"))
        assert eng.final_sha256(as_of=as_of) == oracle["sha256"], as_of

    # full state equals the no-as_of read
    assert eng.final_sha256(as_of=3) == eng.final_sha256()


def test_time_travel_returns_historical_schema(tmp_path):
    """A snapshot BEFORE a schema evolution must come back with the
    schema the table had then — not today's columns null-backfilled."""
    meta = _gen(tmp_path, n_batches=6, evolve_from_batch=4, seed=31)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])
    assert eng.ckpt.evolved  # evolution really happened

    prefix = tmp_path / "prefix" / "events"
    os.makedirs(prefix)
    for b in range(4):
        name = f"batch={b:05d}.parquet"
        shutil.copy(os.path.join(meta["events_dir"], name), prefix / name)
    oracle = replay_oracle(spec, str(prefix))
    assert eng.final_sha256(as_of=3) == oracle["sha256"]
    assert eng.final_table(as_of=3).schema.names == oracle["table"].schema.names


def test_gc_orphans_removes_crash_leftovers(tmp_path):
    meta = _gen(tmp_path, n_batches=4)
    spec = repo_file_spec(num_buckets=16)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake)
    try:
        eng.replay(meta["events_dir"], fail_before_commit_of=1)
    except RuntimeError:
        pass
    # batches 1..3 (pipelined) may have written uncommitted version files
    eng2 = ReplayEngine(spec, lake)
    n = eng2.gc_orphans()
    assert n >= 0  # orphans (if any) removed; manifest files untouched
    # resume still reaches the oracle state
    eng2.replay(meta["events_dir"])
    oracle = replay_oracle(spec, meta["events_dir"])
    assert eng2.final_sha256() == oracle["sha256"]
    # after full commit, nothing is an orphan
    assert ReplayEngine(spec, lake).gc_orphans() == 0


def test_gc_orphans_preserves_committed_backfill_history(tmp_path):
    """A committed backfill's files live in the 10^9+wm version
    namespace — always numbered above any watermark — so the plain
    'version > watermark' orphan test would delete them once later
    batches advance the bucket pointers past them, destroying the
    time-travel history a keep-history lake promised."""
    import glob as _glob
    import pyarrow as pa
    import pyarrow.compute as pc

    meta = _gen(tmp_path, n_batches=4)
    spec = repo_file_spec(num_buckets=8)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake, gc_old_versions=False)
    eng.replay(meta["events_dir"], max_batches=3)  # wm=2

    def add_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "content_len",
            pc.cast(pc.fill_null(pc.utf8_length(t["content"]), 0), pa.int64()),
        )

    eng.backfill(add_len)
    eng.replay(meta["events_dir"])  # batch 3 advances pointers past some
    bf_files = set(_glob.glob(os.path.join(lake, "part-*-v10000000*.parquet")))
    assert bf_files, "backfill produced namespace files"
    sha_tip = eng.final_sha256()
    sha_pre = eng.final_sha256(as_of=2)  # pre-backfill snapshot

    assert ReplayEngine(spec, lake, gc_old_versions=False).gc_orphans() == 0
    assert set(_glob.glob(os.path.join(lake, "part-*-v10000000*.parquet"))) == bf_files
    eng2 = ReplayEngine(spec, lake, gc_old_versions=False)
    assert eng2.final_sha256() == sha_tip
    assert eng2.final_sha256(as_of=2) == sha_pre


def test_backfill_dropping_existing_column_raises(tmp_path):
    """A transform that forgets a payload column must fail loudly, not
    silently null that column across every live row in the lake."""
    import pytest

    meta = _gen(tmp_path, n_batches=2)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    sha = eng.final_sha256()

    def drop_content(t):
        return t.drop_columns(["content"])

    with pytest.raises(Exception, match="dropped existing column"):
        eng.backfill(drop_content)
    # nothing committed: state unchanged
    assert ReplayEngine(spec, str(tmp_path / "lake")).final_sha256() == sha


def test_replay_summary_separates_deferred_from_committed(tmp_path):
    """Batches the max_batches budget cut are 'deferred', never listed
    as 'skipped_committed' — that field promised safely-applied work."""
    meta = _gen(tmp_path, n_batches=4)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    s1 = eng.replay(meta["events_dir"], max_batches=2)
    assert s1["applied_batches"] == [0, 1]
    assert s1["skipped_committed"] == []
    assert s1.get("deferred") == [2, 3]
    s2 = eng.replay(meta["events_dir"])
    assert s2["applied_batches"] == [2, 3]
    assert s2["skipped_committed"] == [0, 1]
    assert "deferred" not in s2


def test_reshard_forwards_writer_lease(tmp_path):
    meta = _gen(tmp_path, n_batches=2)
    spec = repo_file_spec(num_buckets=4)
    eng = ReplayEngine(
        spec, str(tmp_path / "lake"), writer_lease=True, lease_ttl_s=120.0
    )
    eng.replay(meta["events_dir"])
    new = eng.reshard(str(tmp_path / "lake2"), factor=2)
    assert new.writer_lease is True
    assert new.lease_ttl_s == 120.0
    assert new.final_sha256() == eng.final_sha256()
