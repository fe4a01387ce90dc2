"""Follow mode: a producer thread lands batch files (atomic renames)
while the engine tails the directory; the follower must converge to the
full-stream oracle sha and drain everything before honoring the stop
marker. Downstream hooks (view refresh / replication) ride along via
on_commit."""

import os
import shutil
import threading
import time

import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.ivm import MaterializedView
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _gen(tmp_path, **kw):
    defaults = dict(n_events=6000, n_repos=15, n_paths=40, n_batches=6,
                    seed=71, delete_frac=0.2, dirty_frac=0.03,
                    evolve_from_batch=4)
    defaults.update(kw)
    return generate_change_events(str(tmp_path), **defaults)


def _producer(src_dir, live_dir, stop_file, delay=0.15):
    """Land batches one at a time with atomic renames, then drop the
    stop marker — deliberately RIGHT after the last rename, so a
    follower that checks stop before draining would lose data."""
    os.makedirs(live_dir, exist_ok=True)
    for name in sorted(os.listdir(src_dir)):
        if not name.startswith("batch="):
            continue
        tmp = os.path.join(live_dir, f".tmp.{name}")
        shutil.copy(os.path.join(src_dir, name), tmp)
        os.replace(tmp, os.path.join(live_dir, name))
        time.sleep(delay)
    with open(stop_file, "w") as f:
        f.write("done")


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_follow_converges_to_oracle(ray_session, tmp_path, mode):
    meta = _gen(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    live = str(tmp_path / "live")
    stop = str(tmp_path / "STOP")
    oracle = replay_oracle(spec, meta["events_dir"])

    t = threading.Thread(
        target=_producer, args=(meta["events_dir"], live, stop)
    )
    eng = ReplayEngine(spec, str(tmp_path / f"lake_{mode}"), state_mode=mode,
                       gc_old_versions=False, fold_threshold=2)
    view = MaterializedView(eng, "by_lang", ["lang"])
    refreshed = []
    t.start()
    try:
        s = eng.follow(
            live, poll_interval_s=0.05, stop_file=stop,
            on_commit=lambda _s: refreshed.append(view.refresh().num_rows),
        )
    finally:
        t.join()
    assert s["applied_batches"] == list(range(6))
    assert eng.final_sha256() == oracle["sha256"]
    # the on_commit hook ran at least once per poll cycle that applied
    # work, and the view ends exactly at the final snapshot's aggregate
    assert refreshed, "on_commit never ran"
    assert view.watermark == 5
    import duckdb

    con = duckdb.connect()
    con.register("t", eng.final_table())
    exp = con.execute(
        "SELECT lang, count(*) n FROM t GROUP BY lang ORDER BY lang"
    ).fetchall()
    got = list(zip(view.table()["lang"].to_pylist(),
                   view.table()["n_rows"].to_pylist()))
    assert sorted(got) == sorted(exp)


def test_follow_idle_timeout(ray_session, tmp_path):
    """With no producer and no stop file, follow exits on idle timeout."""
    meta = _gen(tmp_path, n_batches=2, n_events=500, evolve_from_batch=99)
    spec = repo_file_spec(num_buckets=4)
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    t0 = time.monotonic()
    s = eng.follow(meta["events_dir"], poll_interval_s=0.05,
                   idle_timeout_s=0.3)
    assert s["applied_batches"] == [0, 1]
    assert time.monotonic() - t0 < 30
    assert eng.final_sha256() == replay_oracle(spec, meta["events_dir"])["sha256"]
