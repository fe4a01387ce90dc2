"""export_snapshot (round 5): the serving handoff — live table as
plain partitioned Parquet + manifest, incremental by touched bucket.

Gates: full-export content equality vs final_table (both state modes);
incremental export rewrites ONLY touched buckets yet equals a fresh
full export; backfill/schema evolution force a full pass; a missing
part file self-heals.
"""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from glue_etl_pipeline_ray.gen import generate_change_events
from glue_etl_pipeline_ray.hashing import table_sha256
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import repo_file_spec

GEN = dict(
    n_events=6000, n_batches=4, evolve_from_batch=2, dirty_frac=0.02,
    seed=555,
)


def _read_export(out_dir, key_cols):
    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    tabs = [pq.read_table(f) for f in files]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return None
    return pa.concat_tables(tabs).sort_by(
        [(k, "ascending") for k in key_cols]
    )


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_full_export_equals_final_table(ray_session, tmp_path, mode):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"), state_mode=mode)
    eng.replay(gen["events_dir"])
    out = eng.export_snapshot(str(tmp_path / "exp"))
    assert out["full"] and out["reused_buckets"] == 0
    got = _read_export(str(tmp_path / "exp"), spec.key_cols)
    want = eng.final_table()
    assert table_sha256(got, spec.key_cols) == table_sha256(
        want, spec.key_cols
    )
    man = json.load(open(tmp_path / "exp" / "_export_manifest.json"))
    assert man["watermark"] == eng.ckpt.watermark
    assert out["rows"] == want.num_rows


def test_incremental_export_rewrites_only_touched(ray_session, tmp_path):
    # evolve_from_batch=1: the schema is fully evolved before the first
    # export — otherwise the second export correctly takes the full
    # path (schema change forces it; covered by the backfill test)
    gen = generate_change_events(
        str(tmp_path / "w"), **{**GEN, "evolve_from_batch": 1}
    )
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(gen["events_dir"], max_batches=2)
    exp = str(tmp_path / "exp")
    first = eng.export_snapshot(exp)
    assert first["full"]
    eng.replay(gen["events_dir"])  # batches 2..3
    second = eng.export_snapshot(exp)
    assert not second["full"]
    # something reused, something rewritten (the stream touches a
    # subset of buckets per batch at this size)
    assert second["exported_buckets"] + second["reused_buckets"] == len(
        json.load(open(os.path.join(exp, "_export_manifest.json")))[
            "buckets"
        ]
    )
    got = _read_export(exp, spec.key_cols)
    # equality vs a from-scratch full export of the same lake
    full_dir = str(tmp_path / "exp_full")
    eng.export_snapshot(full_dir, incremental=False)
    want = _read_export(full_dir, spec.key_cols)
    assert table_sha256(got, spec.key_cols) == table_sha256(
        want, spec.key_cols
    )


def test_backfill_forces_full_export(ray_session, tmp_path):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(gen["events_dir"])
    exp = str(tmp_path / "exp")
    eng.export_snapshot(exp)

    def add_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "content_len",
            pc.cast(
                pc.fill_null(pc.utf8_length(t["content"]), 0), pa.int64()
            ),
        )

    eng.backfill(add_len)
    out = eng.export_snapshot(exp)
    assert out["full"]
    got = _read_export(exp, spec.key_cols)
    assert "content_len" in got.column_names
    assert table_sha256(got, spec.key_cols) == table_sha256(
        eng.final_table(), spec.key_cols
    )


def test_foreign_lake_manifest_forces_full(ray_session, tmp_path):
    # Two lakes with the same spec, watermark count, and evolved set
    # but DIFFERENT rows (different seed). Exporting lake B into lake
    # A's out_dir must take the full path — incremental reuse keyed
    # only on watermark/evolved would silently keep A's files.
    spec = repo_file_spec()
    gen_a = generate_change_events(str(tmp_path / "wa"), **GEN)
    eng_a = ReplayEngine(spec, str(tmp_path / "lake_a"))
    eng_a.replay(gen_a["events_dir"])
    gen_b = generate_change_events(
        str(tmp_path / "wb"), **{**GEN, "seed": 556}
    )
    eng_b = ReplayEngine(spec, str(tmp_path / "lake_b"))
    eng_b.replay(gen_b["events_dir"])
    exp = str(tmp_path / "exp")
    eng_a.export_snapshot(exp)
    # plant a foreign file (out-of-band writer) and a stale owned-name
    # file for a bucket neither lake populates: the full pass must
    # preserve the former and sweep the latter
    foreign = os.path.join(exp, "extra_report.parquet")
    pq.write_table(pa.table({"x": [1]}), foreign)
    stale = os.path.join(exp, "part-99999.parquet")
    pq.write_table(pa.table({"x": [1]}), stale)
    out = eng_b.export_snapshot(exp)  # incremental=True, foreign prior
    assert out["full"] and out["stale_removed"] >= 1
    assert os.path.exists(foreign)
    assert not os.path.exists(stale)
    got = _read_export(exp, spec.key_cols)
    assert table_sha256(got, spec.key_cols) == table_sha256(
        eng_b.final_table(), spec.key_cols
    )


def test_missing_part_file_self_heals(ray_session, tmp_path):
    gen = generate_change_events(str(tmp_path / "w"), **GEN)
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(gen["events_dir"])
    exp = str(tmp_path / "exp")
    eng.export_snapshot(exp)
    victim = sorted(glob.glob(os.path.join(exp, "part-*.parquet")))[0]
    os.remove(victim)
    out = eng.export_snapshot(exp)  # incremental; nothing touched
    assert not out["full"] and out["exported_buckets"] >= 1
    # the healed bucket is re-served under the NEW manifest (a fresh
    # generation-versioned name — never an in-place rewrite); every
    # manifest-referenced file must exist
    man = json.load(open(os.path.join(exp, "_export_manifest.json")))
    for v in man["buckets"].values():
        assert os.path.exists(os.path.join(exp, v["file"]))
    got = _read_export(exp, spec.key_cols)
    assert table_sha256(got, spec.key_cols) == table_sha256(
        eng.final_table(), spec.key_cols
    )


def test_reexport_never_overwrites_prior_manifest_files(ray_session, tmp_path):
    """Torn-re-export safety: a later export must write touched buckets
    under NEW generation-versioned names — a reader (or crash) holding
    the prior manifest can never observe a referenced file's content
    change under it. At rest the directory holds exactly the new
    manifest's files."""
    gen = generate_change_events(
        str(tmp_path / "w"), n_events=4000, n_batches=3, seed=13
    )
    spec = repo_file_spec()
    eng = ReplayEngine(spec, str(tmp_path / "lake"))
    eng.replay(gen["events_dir"], max_batches=2)
    exp = str(tmp_path / "exp")
    eng.export_snapshot(exp)
    man1 = json.load(open(os.path.join(exp, "_export_manifest.json")))

    eng.replay(gen["events_dir"])  # batch 2 touches some buckets
    out = eng.export_snapshot(exp)
    assert not out["full"] and out["exported_buckets"] >= 1
    man2 = json.load(open(os.path.join(exp, "_export_manifest.json")))
    assert man2["gen"] == man1["gen"] + 1
    touched = {
        b for b, v in man2["buckets"].items()
        if b in man1["buckets"] and v != man1["buckets"][b]
    }
    assert touched, "expected at least one re-exported bucket"
    for b in touched:
        assert man2["buckets"][b]["file"] != man1["buckets"][b]["file"], (
            f"bucket {b} was rewritten in place under the prior manifest"
        )
    # at rest: directory == new manifest exactly (glob consumers clean)
    on_disk = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(exp, "part-*.parquet"))
    }
    assert on_disk == {v["file"] for v in man2["buckets"].values()}
