"""Lake fsck + metrics rollup gates."""

import os

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _lake(tmp_path, **kw):
    meta = generate_change_events(
        str(tmp_path / "gen"), n_events=5000, n_batches=3, dirty_frac=0.03,
        seed=17,
    )
    eng = ReplayEngine(repo_file_spec(num_buckets=8),
                       str(tmp_path / "lake"), **kw)
    eng.replay(meta["events_dir"])
    return eng, meta


def test_fsck_clean_then_orphan_then_missing(ray_session, tmp_path):
    eng, _ = _lake(tmp_path)
    r = eng.fsck()
    assert r["ok"] and not r["missing"] and not r["orphans"]
    assert r["n_referenced"] > 0

    # orphan: an uncommitted file from a "crashed" batch
    orphan = os.path.join(eng.lake_dir, "part-00000-v00099.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    r = eng.fsck()
    assert r["ok"] and r["orphans"] == ["part-00000-v00099.parquet"]
    os.remove(orphan)

    # missing: a referenced state file deleted out-of-band
    victim = sorted(
        f for f in os.listdir(eng.lake_dir) if f.endswith(".parquet")
    )[0]
    os.remove(os.path.join(eng.lake_dir, victim))
    r = eng.fsck()
    assert not r["ok"] and victim in r["missing"]


def test_fsck_delta_mode_clean(ray_session, tmp_path):
    eng, _ = _lake(tmp_path, state_mode="delta", fold_threshold=2)
    r = eng.fsck()
    assert r["ok"] and not r["missing"], r


def test_fsck_delta_retention_retired_not_orphans(ray_session, tmp_path):
    eng, _ = _lake(
        tmp_path, state_mode="delta", fold_threshold=2, retain_batches=2
    )
    r = eng.fsck()
    assert r["ok"] and not r["missing"], r
    # retired-but-unpurged files must not be flagged as orphans
    assert not r["orphans"], r


def test_metrics_rollup_matches_oracle_counts(ray_session, tmp_path):
    eng, meta = _lake(tmp_path)
    o = replay_oracle(repo_file_spec(), meta["events_dir"])
    m = eng.metrics()
    assert m["watermark"] == 2 and m["n_batches"] == 3
    assert m["totals"]["n_events"] == 5000
    assert m["totals"]["n_dead_lettered"] == o["n_dead_lettered"]
    assert m["n_live"] == o["n_live"]
    assert set(m["per_batch"]) == {0, 1, 2}
