"""Bloom lookup sidecars: absent-key lookups skip bucket reads, results
are identical with and without filters, and stale filters (any later
commit) are ignored rather than trusted."""

import pyarrow.parquet as pq
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec


def _gen(tmp_path, **kw):
    kw.setdefault("n_events", 4000)
    kw.setdefault("n_batches", 3)
    kw.setdefault("seed", 61)
    kw.setdefault("delete_frac", 0.2)
    return generate_change_events(str(tmp_path), n_repos=10, n_paths=30, **kw)


def _some_live_keys(eng, n=5):
    t = eng.final_table()
    return list(
        zip(t["repo"].to_pylist()[:n], t["path"].to_pylist()[:n])
    )


@pytest.mark.parametrize("state_mode", ["rewrite", "delta"])
def test_filters_skip_absent_keys_and_preserve_results(
    tmp_path, ray_session, state_mode
):
    meta = _gen(tmp_path)
    eng = ReplayEngine(
        repo_file_spec(num_buckets=8), str(tmp_path / "lake"),
        state_mode=state_mode,
    )
    eng.replay(meta["events_dir"])
    present = _some_live_keys(eng)
    absent = [(f"no-such-repo-{i}", f"no/path/{i}.py") for i in range(6)]

    base = eng.lookup(present + absent, use_filters=False)
    s = eng.build_lookup_filters()
    assert s["buckets"] > 0 and s["bytes"] > 0

    # identical results, filters on
    got = eng.lookup(present + absent)
    assert got.equals(base)
    assert len(got) == len(present)

    # pure-miss lookup: every touched bucket is skipped, zero reads
    empty = eng.lookup(absent)
    assert empty.num_rows == 0
    st = eng._last_lookup_stats
    assert st["buckets_touched"] == 0 and st["buckets_skipped"] > 0

    # present keys never skip their own bucket (no false negatives)
    hit = eng.lookup(present)
    assert hit.equals(eng.lookup(present, use_filters=False))
    assert len(hit) == len(present)


def test_stale_filters_are_ignored(tmp_path, ray_session):
    meta = _gen(tmp_path, seed=62)
    eng = ReplayEngine(repo_file_spec(num_buckets=8), str(tmp_path / "lake"))
    eng.replay(meta["events_dir"], max_batches=2)
    eng.build_lookup_filters()
    # advance the lake: the filters' anchors no longer match
    eng.replay(meta["events_dir"])
    present = _some_live_keys(eng, n=8)
    got = eng.lookup(present)
    assert got.equals(eng.lookup(present, use_filters=False))
    assert len(got) == len(present)
    # nothing skipped: stale anchors disqualify every filter
    assert eng._last_lookup_stats["buckets_skipped"] == 0
    # rebuilding re-arms the skip path
    eng.build_lookup_filters()
    absent = [(f"ghost-{i}", "x.py") for i in range(5)]
    assert eng.lookup(absent).num_rows == 0
    assert eng._last_lookup_stats["buckets_skipped"] > 0


def test_filters_exclude_deleted_keys(tmp_path, ray_session):
    meta = _gen(tmp_path, seed=63, delete_frac=0.4)
    eng = ReplayEngine(repo_file_spec(num_buckets=8), str(tmp_path / "lake"))
    eng.replay(meta["events_dir"])
    # find a deleted key from the raw events: appears in events but not live
    import glob

    ev = pq.read_table(
        sorted(glob.glob(meta["events_dir"] + "/*.parquet"))[0],
        columns=["repo", "path"],
    )
    live = {
        (r, p)
        for r, p in zip(
            eng.final_table()["repo"].to_pylist(),
            eng.final_table()["path"].to_pylist(),
        )
    }
    dead = [
        (r, p)
        for r, p in zip(ev["repo"].to_pylist(), ev["path"].to_pylist())
        if (r, p) not in live
    ][:5]
    assert dead, "fixture must delete some keys"
    eng.build_lookup_filters()
    assert eng.lookup(dead).num_rows == 0
    assert eng.lookup(dead, use_filters=False).num_rows == 0
