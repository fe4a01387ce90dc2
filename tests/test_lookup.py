"""Point-lookup read path: bucket-pruned key probes must return exactly
the oracle's rows for those keys — present keys verbatim, deleted and
never-seen keys absent — in both state modes, plus time travel in
rewrite mode."""

import pyarrow as pa
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _oracle_rows(oracle_table: pa.Table, keys):
    want = {tuple(k) for k in keys}
    rows = [
        r
        for r in oracle_table.to_pylist()
        if (r["repo"], r["path"]) in want
    ]
    return sorted(rows, key=lambda r: (r["repo"], r["path"]))


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_lookup_matches_oracle(tmp_path, mode):
    meta = generate_change_events(
        str(tmp_path), n_events=3000, n_batches=3, n_repos=10, n_paths=30,
        delete_frac=0.15, seed=21,
    )
    spec = repo_file_spec(num_buckets=16)
    oracle = replay_oracle(spec, meta["events_dir"])
    eng = ReplayEngine(spec, str(tmp_path / "lake"), state_mode=mode)
    eng.replay(meta["events_dir"])

    live = oracle["table"].to_pylist()
    present = [(live[0]["repo"], live[0]["path"]),
               (live[-1]["repo"], live[-1]["path"]),
               (live[len(live) // 2]["repo"], live[len(live) // 2]["path"])]
    live_keys = {(r["repo"], r["path"]) for r in live}
    # a key that was deleted (seen in events but not live), if any
    import pyarrow.parquet as pq
    import glob, os

    ev = pa.concat_tables(
        [pq.read_table(f) for f in sorted(
            glob.glob(os.path.join(meta["events_dir"], "batch=*.parquet")))]
    )
    seen = set(zip(ev["repo"].to_pylist(), ev["path"].to_pylist()))
    deleted = next(iter(seen - live_keys))
    missing = ("no-such-repo", "no/such/path.py")

    got = eng.lookup(present + [deleted, missing])
    assert got.to_pylist() == _oracle_rows(oracle["table"], present)

    # empty probe and all-absent probe
    assert eng.lookup([]).num_rows == 0
    assert eng.lookup([missing, deleted]).num_rows == 0


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_lookup_time_travel(tmp_path, mode):
    meta = generate_change_events(
        str(tmp_path), n_events=2000, n_batches=4, n_repos=8, n_paths=20,
        seed=33,
    )
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(
        spec, str(tmp_path / "lake"), gc_old_versions=False,
        state_mode=mode,
    )
    eng.replay(meta["events_dir"])
    old = eng.final_table(as_of=1)
    # pick a key whose content CHANGED between as_of=1 and the tip
    new = eng.final_table()
    old_map = {
        (r["repo"], r["path"]): r["content"] for r in old.to_pylist()
    }
    new_map = {
        (r["repo"], r["path"]): r["content"] for r in new.to_pylist()
    }
    changed = next(
        k for k, v in old_map.items() if k in new_map and new_map[k] != v
    )
    got_old = eng.lookup([changed], as_of=1)
    got_new = eng.lookup([changed])
    assert got_old.num_rows == got_new.num_rows == 1
    assert got_old["content"][0].as_py() == old_map[changed]
    assert got_new["content"][0].as_py() == new_map[changed]


def test_lookup_delta_as_of_requires_retention(tmp_path):
    meta = generate_change_events(
        str(tmp_path), n_events=1000, n_batches=2, seed=5
    )
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(
        spec, str(tmp_path / "lake"), state_mode="delta"
    )  # gc_old_versions defaults True -> history not reconstructible
    eng.replay(meta["events_dir"])
    with pytest.raises(NotImplementedError):
        eng.lookup([("r", "p")], as_of=0)
