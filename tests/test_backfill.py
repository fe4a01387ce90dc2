"""Lake-wide backfill (round 5): recompute or add a derived column
across every bucket as a crash-safe in-place version bump — per-row
``seq`` untouched, one atomic manifest commit, one backfill per
watermark, schema-evolution registration for added columns.

Oracle: apply the same transform to the single-threaded oracle's final
table and compare sha256 of the canonically-sorted live rows.
"""


import pyarrow as pa
import pyarrow.compute as pc
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.hashing import table_sha256
from glue_etl_pipeline_ray.oracle import replay_oracle
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec

GEN = dict(
    n_events=6000, n_batches=4, evolve_from_batch=2, dirty_frac=0.02,
    seed=313,
)


def _make_upper_lang():
    # returned as a CLOSURE so Ray cloudpickles it by value — a
    # module-level test function would pickle by reference to a module
    # the workers can't import
    def upper_lang(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("lang"),
            "lang",
            pc.utf8_upper(t["lang"]),
        )

    return upper_lang


def _make_add_content_len():
    def add_content_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "content_len",
            pc.cast(
                pc.fill_null(pc.utf8_length(t["content"]), 0), pa.int64()
            ),
        )

    return add_content_len


def _oracle_table(events_dir, spec=None):
    return replay_oracle(spec or repo_file_spec(), events_dir)["table"]


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_backfill_recompute_matches_transformed_oracle(
    ray_session, tmp_path, mode
):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"), state_mode=mode)
    eng.replay(gen["events_dir"])
    out = eng.backfill(_make_upper_lang())
    assert out["kind"] == "backfill" and out["buckets"] > 0
    want = _make_upper_lang()(_oracle_table(gen["events_dir"]))
    want = want.sort_by([(k, "ascending") for k in spec.key_cols])
    assert eng.final_sha256() == table_sha256(want, spec.key_cols)
    # seq values untouched: a subsequent batch replay is a plain no-op
    again = eng.replay(gen["events_dir"])
    assert again["applied_batches"] == []
    assert eng.final_sha256() == table_sha256(want, spec.key_cols)


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_backfill_adds_column_as_schema_evolution(
    ray_session, tmp_path, mode
):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"), state_mode=mode)
    eng.replay(gen["events_dir"])
    eng.backfill(_make_add_content_len())
    assert ("content_len", "int64") in eng.ckpt.evolved
    want = _make_add_content_len()(_oracle_table(gen["events_dir"]))
    want = want.sort_by([(k, "ascending") for k in spec.key_cols])
    assert eng.final_sha256() == table_sha256(want, spec.key_cols)
    # a FRESH engine on the same lake sees the evolved schema
    eng2 = ReplayEngine(spec, str(tmp_path / "lake"), state_mode=mode)
    assert "content_len" in eng2.final_table().column_names


def test_backfill_crash_before_commit_then_rerun(ray_session, tmp_path):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(gen["events_dir"])
    pre_sha = eng.final_sha256()
    with pytest.raises(RuntimeError, match="injected"):
        eng.backfill(_make_add_content_len(), _fail_before_commit=True)
    # nothing committed: pointers unchanged, table unchanged
    eng2 = ReplayEngine(spec, str(tmp_path / "lake"))
    assert eng2.final_sha256() == pre_sha
    assert eng2.ckpt.backfills == []
    # re-run completes from pristine inputs (orphans overwritten)
    eng2.backfill(_make_add_content_len())
    want = _make_add_content_len()(_oracle_table(gen["events_dir"]))
    want = want.sort_by([(k, "ascending") for k in spec.key_cols])
    assert eng2.final_sha256() == table_sha256(want, spec.key_cols)
    assert eng2.fsck()["ok"]


def test_backfill_once_per_watermark_then_again_after_batch(
    ray_session, tmp_path
):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(gen["events_dir"], max_batches=3)
    eng.backfill(_make_upper_lang())
    with pytest.raises(ValueError, match="already backfilled"):
        eng.backfill(_make_upper_lang())
    # advancing the watermark re-arms it
    eng.replay(gen["events_dir"])
    out = eng.backfill(_make_upper_lang())
    assert out["watermark"] == 3


def test_backfill_rejects_key_and_rowcount_changes(ray_session, tmp_path):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    eng = ReplayEngine(repo_file_spec(), str(tmp_path / "lake"))
    eng.replay(gen["events_dir"])

    def mangle_keys(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("repo"),
            "repo",
            pc.utf8_upper(t["repo"]),
        )

    with pytest.raises(Exception, match="key column"):
        eng.backfill(mangle_keys)

    def drop_rows(t: pa.Table) -> pa.Table:
        return t.slice(0, max(0, t.num_rows - 1))

    with pytest.raises(Exception, match="row count"):
        eng.backfill(drop_rows)


def test_backfill_time_travel_on_history_lake(ray_session, tmp_path):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(
        spec, str(tmp_path / "lake"), gc_old_versions=False
    )
    eng.replay(gen["events_dir"])
    wm = eng.ckpt.watermark
    pre_sha = eng.final_sha256(as_of=wm)
    eng.backfill(_make_add_content_len())
    # tip has the new column; the pre-backfill snapshot does not
    assert "content_len" in eng.final_table().column_names
    old = eng.final_table(as_of=wm)
    assert "content_len" not in old.column_names
    assert table_sha256(old, spec.key_cols) == pre_sha


def test_backfill_delta_retention_keeps_window_time_travel(
    ray_session, tmp_path
):
    # delta + retain_batches: the superseded bases are the only source
    # for within-window as-of reads — backfill must RETIRE them (purge
    # at horizon), never delete them outright
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(
        spec,
        str(tmp_path / "lake"),
        state_mode="delta",
        retain_batches=4,
    )
    eng.replay(gen["events_dir"])
    wm = eng.ckpt.watermark
    pre_sha = eng.final_sha256(as_of=wm)

    def add_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "content_len",
            pc.cast(
                pc.fill_null(pc.utf8_length(t["content"]), 0), pa.int64()
            ),
        )

    eng.backfill(add_len)
    # within-window snapshot still resolves to the pre-backfill state
    old = eng.final_table(as_of=wm)
    assert "content_len" not in old.column_names
    assert table_sha256(old, spec.key_cols) == pre_sha
    assert eng.fsck()["ok"]
