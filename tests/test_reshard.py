"""Bucket re-sharding gate: the blue/green split preserves state
byte-for-byte (sha equality), carries tombstones, resumes replay
exactly-once on the new bucket count in BOTH state modes, and serves
point lookups under the new hash."""

import numpy as np

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _stream(tmp_path):
    meta = generate_change_events(
        str(tmp_path / "gen"), n_events=9000, n_batches=6, n_repos=20,
        n_paths=50, delete_frac=0.12, dirty_frac=0.02, seed=21,
    )
    return meta["events_dir"]


def test_reshard_rewrite_preserves_state_and_resumes(ray_session, tmp_path):
    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(ev, max_batches=4)
    sha_pre = eng.final_sha256()

    eng2 = eng.reshard(str(tmp_path / "lake2"), factor=2)
    assert eng2.spec.num_buckets == 32
    assert eng2.ckpt.watermark == eng.ckpt.watermark == 3
    assert eng2.final_sha256() == sha_pre  # split is content-neutral

    # remaining batches replay on the NEW lake, exactly-once
    out = eng2.replay(ev)
    assert out["applied_batches"] == [4, 5]
    oracle = replay_oracle(spec, ev)
    assert eng2.final_sha256() == oracle["sha256"]

    # point lookups hash with the new bucket count
    live = eng2.final_table()
    keys = list(
        zip(live["repo"].to_pylist()[:5], live["path"].to_pylist()[:5])
    )
    got = eng2.lookup(keys)
    assert got.num_rows == len(keys)
    assert set(zip(got["repo"].to_pylist(), got["path"].to_pylist())) == set(
        keys
    )


def test_reshard_delta_mode_preserves_and_resumes(ray_session, tmp_path):
    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(
        spec, str(tmp_path / "dlake"), state_mode="delta", fold_threshold=2
    )
    eng.replay(ev, max_batches=4)
    sha_pre = eng.final_sha256()

    eng2 = eng.reshard(str(tmp_path / "dlake2"), factor=4)
    assert eng2.spec.num_buckets == 64
    assert eng2.final_sha256() == sha_pre

    out = eng2.replay(ev)
    assert out["applied_batches"] == [4, 5]
    assert eng2.final_sha256() == replay_oracle(spec, ev)["sha256"]


def test_reshard_carries_tombstones(ray_session, tmp_path):
    """A deleted key's tombstone must survive the reshard so a stale
    (lower-seq) update replayed afterwards still loses LWW."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    spec = repo_file_spec(num_buckets=4)
    ev = str(tmp_path / "events")
    os.makedirs(ev)

    def batch(bid, rows):
        cols = {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "batch_id": pa.array([bid] * len(rows), pa.int64()),
            "op": pa.array([r[1] for r in rows]),
            "repo": pa.array([r[2] for r in rows]),
            "path": pa.array([r[3] for r in rows]),
            "commit": pa.array(["a" * 40] * len(rows)),
            "lang": pa.array(
                [None if r[1] == "DELETE" else "py" for r in rows]
            ),
            "content": pa.array(
                [None if r[1] == "DELETE" else "x" for r in rows]
            ),
            "event_id": pa.array([f"e{r[0]}" for r in rows]),
            "ts": pa.array([r[0] for r in rows], pa.int64()),
        }
        pq.write_table(
            pa.table(cols), os.path.join(ev, f"batch={bid:05d}.parquet")
        )

    batch(0, [(1, "INSERT", "r", "p"), (5, "DELETE", "r", "p")])
    eng = ReplayEngine(spec, str(tmp_path / "tlake"))
    eng.replay(ev)
    assert eng.final_table().num_rows == 0

    eng2 = eng.reshard(str(tmp_path / "tlake2"))
    # stale update (seq 3 < tombstone seq 5) arrives after the reshard
    batch(1, [(3, "UPDATE", "r", "p")])
    eng2.replay(ev)
    assert eng2.final_table().num_rows == 0  # tombstone still wins


def test_reshard_then_bounded_retention_continues(ray_session, tmp_path):
    """A resharded delta lake with retain_batches keeps replaying,
    folding and purging correctly from the seeded manifest (empty
    fold_history, bases at the reshard watermark)."""
    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(
        spec, str(tmp_path / "rlake"), state_mode="delta",
        fold_threshold=2, retain_batches=2,
    )
    eng.replay(ev, max_batches=2)
    eng2 = eng.reshard(str(tmp_path / "rlake2"), factor=2)
    assert eng2.retain_batches == 2
    out = eng2.replay(ev)
    assert out["applied_batches"] == [2, 3, 4, 5]
    assert eng2.final_sha256() == replay_oracle(spec, ev)["sha256"]
    # within-window time travel still works on the new lake
    sha_tip = eng2.final_sha256()
    sha_prev = eng2.final_sha256(as_of=4)
    assert sha_prev != "" and isinstance(sha_prev, str)
    # outside the window raises (history starts fresh at the reshard)
    import pytest

    with pytest.raises((ValueError, NotImplementedError)):
        eng2.final_sha256(as_of=1)
    assert eng2.final_sha256() == sha_tip  # reads didn't disturb state


def test_reshard_time_travel_anchors_on_base(ray_session, tmp_path):
    """As-of reads on a resharded lake must return the SAME snapshot
    the uninterrupted lake serves — the reshard seeds its lineage with
    per-bucket base records so buckets untouched after the reshard are
    not silently dropped (the r4 ADVICE repro: as_of=4 returned 634 of
    727 rows). As-of older than the reshard base raises: that history
    stays with the old lake."""
    import pytest

    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    for mode, kw in (
        ("delta", {"state_mode": "delta", "fold_threshold": 2,
                   "gc_old_versions": False}),
        ("rewrite", {"gc_old_versions": False}),
    ):
        # uninterrupted reference lake over the full stream
        ref = ReplayEngine(spec, str(tmp_path / f"ref_{mode}"), **kw)
        ref.replay(ev)

        eng = ReplayEngine(spec, str(tmp_path / f"a_{mode}"), **kw)
        eng.replay(ev, max_batches=2)  # commits batches 0, 1
        eng2 = eng.reshard(str(tmp_path / f"a2_{mode}"), factor=2)
        eng2.replay(ev)  # batches 2..5 on the new lake

        # tip and every post-reshard snapshot match the uninterrupted lake
        assert eng2.final_sha256() == ref.final_sha256(), mode
        for as_of in (1, 2, 4):  # 1 == the reshard base itself
            assert (
                eng2.final_sha256(as_of=as_of)
                == ref.final_sha256(as_of=as_of)
            ), (mode, as_of)
            assert (
                eng2.final_table(as_of=as_of).num_rows
                == ref.final_table(as_of=as_of).num_rows
            ), (mode, as_of)

        # pre-reshard history raises loudly, never a partial table
        with pytest.raises(ValueError, match="reshard base"):
            eng2.final_sha256(as_of=0)


def test_fsck_clean_after_reshard_both_modes(ray_session, tmp_path):
    ev = _stream(tmp_path)
    spec = repo_file_spec(num_buckets=8)
    for mode in ("rewrite", "delta"):
        eng = ReplayEngine(
            spec, str(tmp_path / f"fl_{mode}"), state_mode=mode
        )
        eng.replay(ev, max_batches=3)
        eng2 = eng.reshard(str(tmp_path / f"fl2_{mode}"), factor=2)
        r = eng2.fsck()
        assert r["ok"] and not r["missing"] and not r["orphans"], (mode, r)
        eng2.replay(ev)
        r = eng2.fsck()
        assert r["ok"] and not r["missing"], (mode, r)

def test_reshard_carries_dlq_for_later_redrive(ray_session, tmp_path):
    """The DLQ must survive a reshard: rows quarantined BEFORE the
    re-bucketing are redriven from the NEW lake afterwards, landing the
    patched-stream oracle sha. Without the carry, every pre-reshard
    quarantined row silently drops out of the repair loop."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    meta = generate_change_events(
        str(tmp_path / "gen"), n_events=4000, n_batches=3, n_repos=12,
        n_paths=30, delete_frac=0.1, dirty_frac=0.05, seed=33,
    )
    ev = meta["events_dir"]
    spec = repo_file_spec(num_buckets=8)

    FIX = "recovered content"

    def fixer(t: pa.Table) -> pa.Table:
        is_up = pc.is_in(t["op"], value_set=pa.array(["INSERT", "UPDATE"]))
        needs = pc.and_(is_up, pc.is_null(t["content"]))
        return t.set_column(
            t.column_names.index("content"), "content",
            pc.if_else(needs, pa.scalar(FIX), t["content"]),
        )

    for mode in ("rewrite", "delta"):
        eng = ReplayEngine(
            spec, str(tmp_path / f"q_{mode}"), state_mode=mode,
            fold_threshold=2,
        )
        eng.replay(ev)
        n_dlq = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(
                _os.path.join(eng.lake_dir, "_dlq", "**", "*.parquet"),
                recursive=True,
            )
        )
        assert n_dlq > 0

        eng2 = eng.reshard(str(tmp_path / f"q2_{mode}"), factor=2)
        out = eng2.redrive_dlq(fixer=fixer)
        assert out["n_redriven"] == n_dlq, mode

        # control: redrive on the UN-resharded lake gives the same state
        ctrl = ReplayEngine(
            spec, str(tmp_path / f"qc_{mode}"), state_mode=mode,
            fold_threshold=2,
        )
        ctrl.replay(ev)
        ctrl.redrive_dlq(fixer=fixer)
        assert eng2.final_sha256() == ctrl.final_sha256(), mode
