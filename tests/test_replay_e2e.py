"""End-to-end: parallel Ray replay must match the single-threaded oracle
bit-for-bit (sha256 of the canonically-sorted live table) — the engine's
strict upgrade of the reference's shape-only e2e oracle
(``run_e2e_test.py:102-116``, SURVEY.md B3)."""

import os

import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec
from glue_etl_pipeline_ray.state.lineage import read_lineage


@pytest.mark.parametrize(
    "kw",
    [
        dict(n_events=2000, n_batches=2, seed=1),
        dict(n_events=3000, n_batches=3, seed=2, evolve_from_batch=2),
        dict(n_events=2500, n_batches=5, seed=3, dirty_frac=0.1, delete_frac=0.2),
        dict(n_events=1500, n_batches=1, seed=4, dirty_frac=0.0, delete_frac=0.0),
    ],
)
def test_engine_matches_oracle(tmp_path, kw):
    meta = generate_change_events(str(tmp_path), n_repos=12, n_paths=40, **kw)
    spec = repo_file_spec(num_buckets=16)
    oracle = replay_oracle(spec, meta["events_dir"])
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    assert eng.final_sha256() == oracle["sha256"]
    assert eng.final_table().num_rows == oracle["n_live"]
    # dead-letter channel: engine quarantines exactly what the oracle does
    last = eng.ckpt._m["batches"]
    n_dlq = sum(b["n_dead_lettered"] for b in last.values())
    assert n_dlq == oracle["n_dead_lettered"]


def test_final_dataset_streaming_view_matches(tmp_path):
    meta = generate_change_events(str(tmp_path), n_events=2000, n_batches=2, seed=9)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    ds_rows = eng.final_dataset().count()
    assert ds_rows == eng.final_table().num_rows


def test_lineage_written_and_consistent(tmp_path):
    meta = generate_change_events(str(tmp_path), n_events=2000, n_batches=2, seed=5)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    recs = read_lineage(str(tmp_path / "lake"))
    summaries = [r for r in recs if r["kind"] == "batch_summary"]
    buckets = [r for r in recs if r["kind"] == "bucket"]
    assert [s["batch_id"] for s in summaries] == [0, 1]
    for s in summaries:
        bs = [b for b in buckets if b["batch_id"] == s["batch_id"]]
        assert sum(b["n_events"] for b in bs) == s["n_merged_events"]
        assert all(len(b["sha256"]) == 64 for b in bs)
    # final live rows equals last batch's lineage n_live
    assert summaries[-1]["n_live"] == eng.final_table().num_rows


def test_exchange_paths_identical(tmp_path):
    """raycore (raw-Ray map-side-partition shuffle) and groupby (Dataset
    sort-shuffle) exchanges must produce byte-identical lake state."""
    meta = generate_change_events(
        str(tmp_path), n_events=3000, n_repos=12, n_paths=40, n_batches=3,
        seed=7, evolve_from_batch=2, dirty_frac=0.05, delete_frac=0.15,
    )
    spec = repo_file_spec(num_buckets=16)
    shas = {}
    for mode in ("raycore", "groupby"):
        eng = ReplayEngine(spec, str(tmp_path / f"lake_{mode}"), exchange=mode)
        eng.replay(meta["events_dir"])
        shas[mode] = eng.final_sha256()
    assert shas["raycore"] == shas["groupby"]
    oracle = replay_oracle(spec, meta["events_dir"])
    assert shas["raycore"] == oracle["sha256"]
