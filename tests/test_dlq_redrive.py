"""DLQ redrive gate: recovered rows land exactly where the stream
would have put them (oracle equality on a patched stream), still-bad
rows re-quarantine once, the operation is exactly-once under re-runs,
and source DLQ dirs are pruned."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


FIX = "recovered content"


def _fixer(t: pa.Table) -> pa.Table:
    """Backfill null content on upsert ops (repairs 'not_null:content')."""
    is_upsert = pc.is_in(
        t["op"], value_set=pa.array(["INSERT", "UPDATE"])
    )
    needs = pc.and_(is_upsert, pc.is_null(t["content"]))
    content = pc.if_else(needs, pa.scalar(FIX), t["content"])
    return t.set_column(
        t.column_names.index("content"), "content", content
    )


def _patched_oracle_sha(spec, ev_dir, tmp_path):
    """Oracle over the SAME stream with the fixer pre-applied to the
    event files — the state the stream would have produced had the
    fixable rows never been dirty."""
    patched = str(tmp_path / "patched_events")
    os.makedirs(patched, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(ev_dir, "batch=*.parquet"))):
        t = _fixer(pq.read_table(f))
        pq.write_table(t, os.path.join(patched, os.path.basename(f)))
    return replay_oracle(spec, patched)


def test_redrive_recovers_fixable_rows_to_oracle_state(
    ray_session, tmp_path
):
    spec = repo_file_spec()
    work = str(tmp_path / "gen")
    meta = generate_change_events(
        work, n_events=8000, n_batches=4, dirty_frac=0.05, seed=13
    )
    ev = meta["events_dir"]
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake)
    eng.replay(ev)
    dlq_before = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(lake, "_dlq", "**", "*.parquet"),
                           recursive=True)
    )
    assert dlq_before > 0

    out = eng.redrive_dlq(fixer=_fixer)
    assert out["n_redriven"] == dlq_before
    assert out["batch_id"] == 4  # next id in the checkpoint sequence

    o = _patched_oracle_sha(spec, ev, tmp_path)
    assert eng.final_sha256() == o["sha256"]

    # still-bad rows (enum/regex errors the fixer can't repair) are
    # re-quarantined exactly once, under the redrive batch only
    dlq_files = glob.glob(
        os.path.join(lake, "_dlq", "**", "*.parquet"), recursive=True
    )
    remaining = (
        pa.concat_tables([pq.read_table(f) for f in dlq_files])
        if dlq_files
        else None
    )
    assert remaining is not None and remaining.num_rows == len(o["dlq"])
    assert all("batch=00004" in f for f in dlq_files)

    # exactly-once: a second redrive (nothing fixable left) leaves the
    # state sha and the DLQ row count unchanged
    sha1 = eng.final_sha256()
    out2 = eng.redrive_dlq(fixer=_fixer)
    assert out2["n_redriven"] == remaining.num_rows
    assert eng.final_sha256() == sha1
    dlq_after2 = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(lake, "_dlq", "**", "*.parquet"),
                           recursive=True)
    )
    assert dlq_after2 == remaining.num_rows


def test_redrive_without_fixer_requeues_everything(ray_session, tmp_path):
    spec = repo_file_spec()
    work = str(tmp_path / "gen")
    meta = generate_change_events(
        work, n_events=3000, n_batches=2, dirty_frac=0.04, seed=5
    )
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake, state_mode="delta")
    eng.replay(meta["events_dir"])
    sha0 = eng.final_sha256()
    n0 = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(lake, "_dlq", "**", "*.parquet"),
                           recursive=True)
    )
    out = eng.redrive_dlq()  # no fixer: every row fails again
    assert out["n_redriven"] == n0
    assert eng.final_sha256() == sha0  # state untouched
    n1 = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(lake, "_dlq", "**", "*.parquet"),
                           recursive=True)
    )
    assert n1 == n0  # requeued once, not duplicated


def test_redrive_crash_after_commit_before_cleanup_is_idempotent(
    ray_session, tmp_path
):
    """Crash window: the redrive batch COMMITS but the source-DLQ
    cleanup never runs. The re-run must (a) not change state (same-seq
    re-application is an LWW no-op), (b) still prune the source dirs,
    (c) end with the same sha and DLQ rows as a never-crashed redrive."""
    spec = repo_file_spec()
    meta = generate_change_events(
        str(tmp_path / "gen"), n_events=6000, n_batches=3, dirty_frac=0.05,
        seed=29,
    )
    ev = meta["events_dir"]

    # control: the never-crashed redrive
    lake_c = str(tmp_path / "lake_control")
    eng_c = ReplayEngine(spec, lake_c)
    eng_c.replay(ev)
    eng_c.redrive_dlq(fixer=_fixer)
    sha_control = eng_c.final_sha256()
    dlq_control = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(lake_c, "_dlq", "**", "*.parquet"),
                           recursive=True)
    )

    # crashed run: replay() commits the redrive batch, then we raise
    # before redrive_dlq's cleanup executes
    lake = str(tmp_path / "lake_crash")
    eng = ReplayEngine(spec, lake)
    eng.replay(ev)

    real_replay = ReplayEngine.replay

    def replay_then_crash(self, *a, **kw):
        out = real_replay(self, *a, **kw)
        raise RuntimeError("injected crash after redrive commit")

    ReplayEngine.replay = replay_then_crash
    try:
        import pytest

        with pytest.raises(RuntimeError, match="injected crash"):
            eng.redrive_dlq(fixer=_fixer)
    finally:
        ReplayEngine.replay = real_replay

    # the redrive batch IS committed; the source DLQ was NOT cleaned
    assert eng.ckpt.watermark == 3
    src_rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(
            os.path.join(lake, "_dlq", "batch=0000[0-2]", "*.parquet")
        )
    )
    assert src_rows > 0  # cleanup never happened

    # recovery: plain re-run
    eng2 = ReplayEngine(spec, lake)
    eng2.redrive_dlq(fixer=_fixer)
    assert eng2.final_sha256() == sha_control
    dlq_after = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(lake, "_dlq", "**", "*.parquet"),
                           recursive=True)
    )
    assert dlq_after == dlq_control

def test_fixer_dropped_rows_stay_quarantined(ray_session, tmp_path):
    """A fixer that DROPS unrecoverable rows must leave them in the
    source DLQ — the cleanup set is computed from the table actually
    written to the redrive batch, not from what was read (the r4
    ADVICE finding: purging pre-fixer seqs silently lost dropped rows
    without them ever re-entering the pipeline). A later redrive with
    a better fixer can still recover them."""
    spec = repo_file_spec()
    meta = generate_change_events(
        str(tmp_path / "gen"), n_events=6000, n_batches=3, dirty_frac=0.05,
        seed=41,
    )
    ev = meta["events_dir"]
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake)
    eng.replay(ev)

    dlq_files = glob.glob(
        os.path.join(lake, "_dlq", "**", "*.parquet"), recursive=True
    )
    dlq0 = pa.concat_tables(
        [pq.read_table(f).drop_columns(["error"]) for f in dlq_files],
        promote_options="permissive",
    )
    seqs0 = sorted(set(dlq0["seq"].to_pylist()))
    assert len(seqs0) > 4
    drop_set = set(seqs0[: len(seqs0) // 2])  # "unrecoverable" half

    def dropping_fixer(t: pa.Table) -> pa.Table:
        keep = pa.array(
            [s not in drop_set for s in t["seq"].to_pylist()]
        )
        return _fixer(t.filter(keep))

    sha_before = eng.final_sha256()
    out = eng.redrive_dlq(fixer=dropping_fixer)
    assert out["n_redriven"] == len(seqs0) - len(drop_set)

    # every dropped seq is still quarantined under its ORIGINAL batch
    remaining_src = pa.concat_tables(
        [
            pq.read_table(f)
            for f in glob.glob(
                os.path.join(lake, "_dlq", "batch=0000[0-2]", "*.parquet")
            )
        ],
        promote_options="permissive",
    )
    assert set(remaining_src["seq"].to_pylist()) == drop_set

    # second redrive with the full fixer recovers them: final state ==
    # a single full-fixer redrive on a control lake
    eng.redrive_dlq(fixer=_fixer)
    lake_c = str(tmp_path / "lake_control")
    eng_c = ReplayEngine(spec, lake_c)
    eng_c.replay(ev)
    eng_c.redrive_dlq(fixer=_fixer)
    assert eng.final_sha256() == eng_c.final_sha256()
    assert eng.final_sha256() != sha_before  # the recovery really landed


def test_dedup_first_by_survives_int32_offset_overflow():
    """The 10^9-lake probe regression: a DLQ whose string payload
    exceeds 2 GiB crashes ``Table.take`` with 'offset overflow while
    concatenating arrays' (take concatenates every chunk into one
    int32-offset array). The dedup must stay chunk-preserving. Builds
    ~2.2 GiB of strings across chunks — the smallest table that
    reproduces the take failure mode."""
    import numpy as np

    from glue_etl_pipeline_ray.pipelines.replay import dedup_first_by

    blob = "x" * 100_000
    rows_per_chunk, n_chunks = 2_000, 12  # 12 x 0.19 GiB = 2.23 GiB
    n = rows_per_chunk * n_chunks
    seq = np.arange(n, dtype=np.int64)
    seq[1] = seq[0]  # one duplicate -> the fast path can't shortcut
    chunks = [
        pa.table(
            {
                "seq": pa.array(
                    seq[i * rows_per_chunk : (i + 1) * rows_per_chunk]
                ),
                "content": pa.array([blob] * rows_per_chunk),
            }
        )
        for i in range(n_chunks)
    ]
    t = pa.concat_tables(chunks)
    # sanity: take on this table IS the failure mode we guard against
    out = dedup_first_by(t, "seq")
    assert out.num_rows == n - 1
    assert out["seq"].to_numpy(zero_copy_only=False)[0] == seq[0]
    del t, out, chunks
