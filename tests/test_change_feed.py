"""Change data feed: ``ReplayEngine.changes_table(from, to)`` must emit
exactly the net insert/update/delete set between the two snapshots, in
both state modes, matching a brute-force diff of the prefix oracles."""

import os
import shutil

import pyarrow.compute as pc
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec
from glue_etl_pipeline_ray.stages.merge import CHANGE_TYPE_COL


def _gen(tmp_path, **kw):
    defaults = dict(n_events=8000, n_repos=15, n_paths=40, n_batches=6, seed=47,
                    delete_frac=0.2, dirty_frac=0.03, evolve_from_batch=4)
    defaults.update(kw)
    return generate_change_events(str(tmp_path), **defaults)


def _prefix_oracle(spec, events_dir, tmp_path, upto):
    prefix = tmp_path / f"pfx{upto}"
    os.makedirs(prefix, exist_ok=True)
    for b in range(upto + 1):
        name = f"batch={b:05d}.parquet"
        shutil.copy(os.path.join(events_dir, name), prefix / name)
    return replay_oracle(spec, str(prefix))


def _brute_diff(spec, old_t, new_t):
    """Key -> full-row dicts; diff them (the obviously-correct oracle)."""
    def rows(t):
        return {
            tuple(r[k] for k in spec.key_cols): r
            for r in t.to_pylist()
        }

    old, new = rows(old_t), rows(new_t)
    out = {}
    for k, r in new.items():
        if k not in old:
            out[k] = ("insert", r)
        elif any(old[k].get(c) != r.get(c) for c in r):
            out[k] = ("update", r)
    for k, r in old.items():
        if k not in new:
            out[k] = ("delete", r)
    return out


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_change_feed_matches_brute_diff(ray_session, tmp_path, mode):
    meta = _gen(tmp_path)
    spec = repo_file_spec(num_buckets=16)
    lake = str(tmp_path / f"lake_{mode}")
    eng = ReplayEngine(spec, lake, state_mode=mode, gc_old_versions=False,
                       fold_threshold=2)
    eng.replay(meta["events_dir"])

    o_old = _prefix_oracle(spec, meta["events_dir"], tmp_path, 2)
    o_new = _prefix_oracle(spec, meta["events_dir"], tmp_path, 5)
    # conform the pre-evolution old snapshot up to the to-schema
    from glue_etl_pipeline_ray.stages.evolve import conform

    to_schema = spec.canonical_schema(eng.ckpt.evolved_as_of(5))
    expected = _brute_diff(
        spec, conform(o_old["table"], to_schema), conform(o_new["table"], to_schema)
    )

    feed = eng.changes_table(2, 5)
    assert set(feed.schema.names) == set(to_schema.names) | {CHANGE_TYPE_COL}
    got = {
        tuple(r[k] for k in spec.key_cols): (r[CHANGE_TYPE_COL], r)
        for r in feed.to_pylist()
    }
    assert set(got) == set(expected)
    for k, (ct, row) in got.items():
        ect, erow = expected[k]
        assert ct == ect, (k, ct, ect)
        payload_cols = [c for c in to_schema.names]
        assert {c: row[c] for c in payload_cols} == {
            c: erow[c] for c in payload_cols
        }, k

    # feed row count is sane: every changed key appears exactly once
    assert feed.num_rows == len(expected)


def test_change_feed_from_empty_equals_snapshot(ray_session, tmp_path):
    """from_batch=-1 diffs against the empty table: all-inserts equal to
    the full live snapshot."""
    meta = _gen(tmp_path, n_batches=4, evolve_from_batch=99)
    spec = repo_file_spec(num_buckets=16)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])

    feed = eng.changes_table(-1, 3)
    assert set(feed[CHANGE_TYPE_COL].to_pylist()) == {"insert"}
    live = eng.final_table()
    assert feed.num_rows == live.num_rows
    assert feed.drop_columns([CHANGE_TYPE_COL]).sort_by(
        [(k, "ascending") for k in spec.key_cols]
    ).equals(live.sort_by([(k, "ascending") for k in spec.key_cols]))


def test_change_feed_validates_range(ray_session, tmp_path):
    meta = _gen(tmp_path, n_batches=3, evolve_from_batch=99)
    spec = repo_file_spec(num_buckets=8)
    eng = ReplayEngine(spec, str(tmp_path / "lake"), gc_old_versions=False)
    eng.replay(meta["events_dir"])
    with pytest.raises(ValueError):
        eng.changes_table(2, 2)
    with pytest.raises(ValueError):
        eng.changes_table(0, 99)

    gc_eng = ReplayEngine(spec, str(tmp_path / "lake2"))
    gc_eng.replay(meta["events_dir"])
    with pytest.raises(NotImplementedError):
        gc_eng.changes_table(0, 2)
