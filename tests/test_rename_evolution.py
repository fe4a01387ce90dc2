"""Column-mapping schema evolution (Delta/Iceberg column-mapping analog,
round 5): a source-side column RENAME keeps landing in one canonical
lake column via ``TableSpec.renames``; ``ignored_cols`` keeps explicitly
dropped columns from evolving into the lake schema.

Gates: engine sha == oracle sha on the renamed stream (both state
modes) == sha of the equivalent un-renamed stream; ambiguity raises in
BOTH implementations; crash/resume across the rename boundary;
ignored noise column never reaches the final schema.
"""

import dataclasses
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec

GEN = dict(
    n_events=6000,
    n_batches=5,
    evolve_from_batch=1,
    dirty_frac=0.03,
    seed=911,
)


def _renamed_spec():
    return dataclasses.replace(
        repo_file_spec(), renames=(("sz_bytes", "size_bytes"),)
    )


def test_rename_era_matches_unrenamed_stream(ray_session, tmp_path):
    # same seed/params, one stream renames the evolved column from
    # batch 3 on — final state must be IDENTICAL
    plain = generate_change_events(str(tmp_path / "plain"), **GEN)
    renamed = generate_change_events(
        str(tmp_path / "renamed"), rename_from_batch=3, **GEN
    )
    spec = _renamed_spec()
    o_plain = replay_oracle(repo_file_spec(), plain["events_dir"])
    o_ren = replay_oracle(spec, renamed["events_dir"])
    assert o_ren["sha256"] == o_plain["sha256"]
    assert dict(o_ren["evolved"])["size_bytes"] == "int64"

    for mode in ("rewrite", "delta"):
        eng = ReplayEngine(
            spec, str(tmp_path / f"lake_{mode}"), state_mode=mode
        )
        eng.replay(renamed["events_dir"])
        assert eng.final_sha256() == o_plain["sha256"], mode


def test_rename_crash_resume_across_boundary(ray_session, tmp_path):
    renamed = generate_change_events(
        str(tmp_path / "r"), rename_from_batch=3, **GEN
    )
    spec = _renamed_spec()
    oracle = replay_oracle(spec, renamed["events_dir"])
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(spec, lake)
    with pytest.raises(RuntimeError):
        eng.replay(renamed["events_dir"], fail_before_commit_of=3)
    eng2 = ReplayEngine(spec, lake)
    out = eng2.replay(renamed["events_dir"])
    assert out["applied_batches"] == [3, 4]
    assert eng2.final_sha256() == oracle["sha256"]


def test_ambiguous_rename_raises_both_implementations(
    ray_session, tmp_path
):
    # hand-build a batch carrying BOTH sz_bytes and size_bytes
    gen = generate_change_events(str(tmp_path / "g"), **GEN)
    f = gen["files"][2]
    t = pq.read_table(f)
    bad = t.append_column(
        "sz_bytes", t["size_bytes"]
    ) if "size_bytes" in t.column_names else None
    assert bad is not None
    bad_dir = tmp_path / "bad_events"
    os.makedirs(bad_dir)
    for src in gen["files"]:
        name = os.path.basename(src)
        if src == f:
            pq.write_table(bad, str(bad_dir / name))
        else:
            pq.write_table(pq.read_table(src), str(bad_dir / name))
    spec = _renamed_spec()
    with pytest.raises(ValueError, match="ambiguous"):
        replay_oracle(spec, str(bad_dir))
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    with pytest.raises(Exception, match="ambiguous"):
        eng.replay(str(bad_dir))


def test_rename_of_base_column_feeds_validation(ray_session, tmp_path):
    # upstream renames a BASE column (content -> file_content): rules
    # (content non-null on upsert) must still dead-letter post-rename
    gen = generate_change_events(str(tmp_path / "g"), **GEN)
    ren_dir = tmp_path / "ren_events"
    os.makedirs(ren_dir)
    for src in gen["files"]:
        t = pq.read_table(src)
        t = t.rename_columns(
            ["file_content" if n == "content" else n for n in t.column_names]
        )
        pq.write_table(t, str(ren_dir / os.path.basename(src)))
    spec = dataclasses.replace(
        repo_file_spec(), renames=(("file_content", "content"),)
    )
    oracle_plain = replay_oracle(repo_file_spec(), gen["events_dir"])
    oracle_ren = replay_oracle(spec, str(ren_dir))
    assert oracle_ren["sha256"] == oracle_plain["sha256"]
    assert oracle_ren["n_dead_lettered"] == oracle_plain["n_dead_lettered"]
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(str(ren_dir))
    assert eng.final_sha256() == oracle_plain["sha256"]


def test_ignored_cols_never_evolve_in(ray_session, tmp_path):
    noisy = generate_change_events(
        str(tmp_path / "n"), noise_col_from_batch=2, **GEN
    )
    plain = generate_change_events(str(tmp_path / "p"), **GEN)
    spec = dataclasses.replace(
        repo_file_spec(), ignored_cols=("__ingest_ts",)
    )
    o_noisy = replay_oracle(spec, noisy["events_dir"])
    o_plain = replay_oracle(repo_file_spec(), plain["events_dir"])
    assert "__ingest_ts" not in o_noisy["table"].column_names
    assert o_noisy["sha256"] == o_plain["sha256"]
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(noisy["events_dir"])
    assert eng.final_sha256() == o_plain["sha256"]
    # without the ignore list the column WOULD evolve in (guard that the
    # fixture actually exercises the path)
    o_evolved = replay_oracle(repo_file_spec(), noisy["events_dir"])
    assert "__ingest_ts" in dict(o_evolved["evolved"])


def test_chained_rename_rejected():
    spec = dataclasses.replace(
        repo_file_spec(), renames=(("a", "b"), ("b", "c"))
    )
    with pytest.raises(ValueError, match="chained"):
        _ = spec.rename_map
