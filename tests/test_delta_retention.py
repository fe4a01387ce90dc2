"""Delta-mode bounded retention (retain_batches=N): time travel inside
the window equals the keep-everything truth, reads outside the window
fail loudly, storage is actually bounded, and the tip is sha-exact."""

import glob
import os

import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.hashing import table_sha256
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _gen(tmp_path, **kw):
    defaults = dict(n_events=8000, n_repos=12, n_paths=40, n_batches=8,
                    seed=33, delete_frac=0.15, dirty_frac=0.04,
                    evolve_from_batch=5)
    defaults.update(kw)
    return generate_change_events(str(tmp_path), **defaults)


def _delta_files(lake):
    return [
        f for f in glob.glob(os.path.join(lake, "*.parquet"))
        if "delta" in os.path.basename(f) or "gdelta" in os.path.basename(f)
    ] + glob.glob(os.path.join(lake, "part-*.parquet"))


def test_delta_retention_window_matches_keep_everything(tmp_path):
    meta = _gen(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    oracle = replay_oracle(spec, meta["events_dir"])

    # ground truth: keep-everything engine (folds are caches only)
    truth = ReplayEngine(
        spec, str(tmp_path / "lake_keep"), state_mode="delta",
        fold_threshold=2, gc_old_versions=False,
    )
    truth.replay(meta["events_dir"])

    ret = ReplayEngine(
        spec, str(tmp_path / "lake_ret"), state_mode="delta",
        fold_threshold=2, retain_batches=3,
    )
    ret.replay(meta["events_dir"])
    assert ret.final_sha256() == oracle["sha256"]
    # folds actually happened (else retention exercised nothing)
    assert any(v["base"] is not None for v in ret.ckpt.bucket_deltas.values())

    wm = ret.ckpt.watermark
    horizon = wm - 3
    for as_of in range(horizon, wm + 1):
        a = ret.final_sha256(as_of=as_of)
        b = truth.final_sha256(as_of=as_of)
        assert a == b, f"as_of={as_of}"

    with pytest.raises(ValueError, match="retention window"):
        ret.final_table(as_of=horizon - 1)


def test_delta_retention_bounds_storage(tmp_path):
    meta = _gen(tmp_path)
    spec = repo_file_spec(num_buckets=16)

    keep = ReplayEngine(
        spec, str(tmp_path / "lake_keep"), state_mode="delta",
        fold_threshold=2, gc_old_versions=False,
    )
    keep.replay(meta["events_dir"])
    ret = ReplayEngine(
        spec, str(tmp_path / "lake_ret"), state_mode="delta",
        fold_threshold=2, retain_batches=2,
    )
    ret.replay(meta["events_dir"])
    n_keep = len(_delta_files(str(tmp_path / "lake_keep")))
    n_ret = len(_delta_files(str(tmp_path / "lake_ret")))
    assert 0 < n_ret < n_keep  # retired files were actually purged
    # nothing the manifest points at was deleted: tip still reads
    assert ret.final_dataset().count() == keep.final_dataset().count()


def test_delta_retention_lookup_time_travel(tmp_path):
    meta = _gen(tmp_path, n_batches=8)
    spec = repo_file_spec(num_buckets=16)
    truth = ReplayEngine(
        spec, str(tmp_path / "lake_keep"), state_mode="delta",
        fold_threshold=2, gc_old_versions=False,
    )
    truth.replay(meta["events_dir"])
    ret = ReplayEngine(
        spec, str(tmp_path / "lake_ret"), state_mode="delta",
        fold_threshold=2, retain_batches=2,
    )
    ret.replay(meta["events_dir"])
    wm = ret.ckpt.watermark
    as_of = wm - 2  # the horizon edge: earlier deltas are purged
    # purges + folds must BOTH have happened for this to prove anything
    assert ret.ckpt._m.get("fold_history")
    hist = truth.final_table(as_of=as_of)
    keys = [
        tuple(hist[c][i].as_py() for c in spec.key_cols)
        for i in range(0, hist.num_rows, max(1, hist.num_rows // 20))
    ]
    got = ret.lookup(keys, as_of=as_of)
    exp = truth.lookup(keys, as_of=as_of)
    assert table_sha256(got, spec.key_cols) == table_sha256(exp, spec.key_cols)


def test_delta_retention_crash_resume(tmp_path):
    meta = _gen(tmp_path, n_batches=6)
    spec = repo_file_spec(num_buckets=16)
    oracle = replay_oracle(spec, meta["events_dir"])
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        spec, lake, state_mode="delta", fold_threshold=2, retain_batches=2
    )
    with pytest.raises(RuntimeError):
        eng.replay(meta["events_dir"], fail_before_commit_of=3)
    eng2 = ReplayEngine(
        spec, lake, state_mode="delta", fold_threshold=2, retain_batches=2
    )
    eng2.replay(meta["events_dir"])
    assert eng2.final_sha256() == oracle["sha256"]


def test_delta_retention_change_feed_in_window(tmp_path):
    from glue_etl_pipeline_ray.stages.merge import CHANGE_TYPE_COL

    meta = _gen(tmp_path, n_batches=8)
    spec = repo_file_spec(num_buckets=16)
    truth = ReplayEngine(
        spec, str(tmp_path / "lake_keep"), state_mode="delta",
        fold_threshold=2, gc_old_versions=False,
    )
    truth.replay(meta["events_dir"])
    ret = ReplayEngine(
        spec, str(tmp_path / "lake_ret"), state_mode="delta",
        fold_threshold=2, retain_batches=3,
    )
    ret.replay(meta["events_dir"])
    wm = ret.ckpt.watermark
    a = ret.changes_table(wm - 2, wm)
    b = truth.changes_table(wm - 2, wm)
    key = spec.key_cols + (CHANGE_TYPE_COL,)
    assert table_sha256(a, key) == table_sha256(b, key)
    assert a.num_rows > 0


def test_view_lagging_past_window_resyncs_from_snapshot(tmp_path):
    """A materialized view that misses the retention window must rebuild
    from the snapshot instead of failing — and equal a never-lagged
    view."""
    from glue_etl_pipeline_ray.pipelines.ivm import MaterializedView

    meta = _gen(tmp_path, n_batches=8)
    spec = repo_file_spec(num_buckets=16)
    ret = ReplayEngine(
        spec, str(tmp_path / "lake"), state_mode="delta",
        fold_threshold=2, retain_batches=2,
    )
    # replay the first half; sync the view at that point
    ret.replay(meta["events_dir"], max_batches=3)
    view = MaterializedView(ret, "by_lang", ["lang"], [])
    view.refresh()
    assert view.watermark == 2
    # replay the rest: the view's watermark falls out of the window
    ret.replay(meta["events_dir"])
    wm = ret.ckpt.watermark
    assert view.watermark < wm - 2
    got = view.refresh()
    # ground truth: a fresh view over the same engine tip
    fresh = MaterializedView(ret, "by_lang_fresh", ["lang"], [])
    exp = fresh.refresh()
    assert got.equals(exp)
    assert view.watermark == wm
