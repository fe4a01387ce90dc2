"""Round-2 additions: resumable event-file ETL (chunk completion
markers) and real PNG frame sampling."""

import glob
import json
import os

import numpy as np
import pytest

from glue_etl_pipeline_ray.pipelines.eventfile_etl import (
    EventTableSpec,
    run_eventfile_etl,
)


def _spec():
    import pyarrow as pa

    return EventTableSpec(
        service="svc",
        kind="event",
        schema=pa.schema(
            [("event_id", pa.string()), ("date_time", pa.string()),
             ("k", pa.int64())]
        ),
        project=lambda d: {"k": d["evaluation"]["k"]},
    )


def _blobs(tmp_path, n_files=6, per_file=5):
    paths = []
    for fi in range(n_files):
        evs = "".join(
            json.dumps(
                {
                    "id": f"f{fi}e{i}",
                    "time": f"2022-05-{fi + 1:02d}T10:00:00Z",
                    "detail": {
                        "type": "EFEvaluationEvent",
                        "evaluation": {"service": "svc", "k": fi * 10 + i},
                    },
                }
            )
            for i in range(per_file)
        )
        p = tmp_path / f"ef-{fi:03d}"
        p.write_text(evs)
        paths.append(str(p))
    return paths


def test_resume_skips_completed_chunks(ray_session, tmp_path):
    paths = _blobs(tmp_path)
    out = str(tmp_path / "out")
    c1 = run_eventfile_etl(paths, [_spec()], out, files_per_task=2, resume=True)
    assert c1["chunks_run"] == 3 and c1["chunks_skipped"] == 0
    assert c1["tables"]["SVC_EVENT"] == 30

    # full resume: everything skipped, counts reconstructed from markers
    c2 = run_eventfile_etl(paths, [_spec()], out, files_per_task=2, resume=True)
    assert c2["chunks_run"] == 0 and c2["chunks_skipped"] == 3
    assert c2["tables"] == c1["tables"]
    assert c2["partitions"] == c1["partitions"]

    # crash simulation: one chunk's marker missing -> only it re-runs
    os.remove(os.path.join(out, "_progress", "chunk-00001.json"))
    c3 = run_eventfile_etl(paths, [_spec()], out, files_per_task=2, resume=True)
    assert c3["chunks_run"] == 1 and c3["chunks_skipped"] == 2
    assert c3["tables"] == c1["tables"]

    # input change invalidates the marker (signature mismatch)
    with open(paths[0], "a") as f:
        f.write(
            json.dumps(
                {
                    "id": "extra",
                    "time": "2022-05-01T11:00:00Z",
                    "detail": {
                        "type": "EFEvaluationEvent",
                        "evaluation": {"service": "svc", "k": 999},
                    },
                }
            )
        )
    c4 = run_eventfile_etl(paths, [_spec()], out, files_per_task=2, resume=True)
    assert c4["chunks_run"] == 1 and c4["chunks_skipped"] == 2
    assert c4["tables"]["SVC_EVENT"] == 31


def test_input_change_purges_stale_partitions(ray_session, tmp_path):
    """If a chunk's input changes AND its events move to different
    partitions, the old run's files must not survive as stale data."""
    import pyarrow.dataset as pads

    def write_blob(day):
        (tmp_path / "ef-000").write_text(
            json.dumps(
                {
                    "id": "e0",
                    "time": f"2022-06-{day:02d}T09:00:00Z",
                    "detail": {"type": "EFEvaluationEvent",
                               "evaluation": {"service": "svc", "k": 1}},
                }
            )
        )

    out = str(tmp_path / "out")
    day1 = os.path.join(out, "SVC_EVENT", "**", "day=1", "*", "*.parquet")
    write_blob(1)
    run_eventfile_etl([str(tmp_path / "ef-000")], [_spec()], out, resume=True)
    assert glob.glob(day1, recursive=True)

    write_blob(2)  # same chunk id, event now lands on day=2
    c = run_eventfile_etl([str(tmp_path / "ef-000")], [_spec()], out, resume=True)
    assert c["chunks_run"] == 1
    # the day=1 file is gone; total table content = exactly one row
    assert not glob.glob(day1, recursive=True)
    t = pads.dataset(os.path.join(out, "SVC_EVENT"), partitioning="hive").to_table()
    assert t.num_rows == 1 and t["event_id"].to_pylist() == ["e0"]


def test_png_frame_sampler_splits_on_signatures():
    from glue_etl_pipeline_ray.functions.multimodal import PngFrameSampler
    from glue_etl_pipeline_ray.functions.png import png_decode, png_encode

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, (4 + i, 5, 3), dtype=np.uint8) for i in range(5)
    ]
    payload = b"".join(png_encode(f) for f in frames)
    sampler = PngFrameSampler(stride=2)
    parts = sampler.split_frames(payload)
    assert len(parts) == 5
    for raw, orig in zip(parts, frames):
        assert np.array_equal(png_decode(raw), orig)


def test_frame_sample_real_pipeline(ray_session):
    from glue_etl_pipeline_ray.pipelines.queries import q_frame_sample_real

    res = q_frame_sample_real("/root/testdata/sf0.001").to_pandas()
    assert res["error"].isna().all()
    # every doc emits ceil(n_frames / 2) sampled frames, n_frames = 2 + id%4
    got = res.groupby("doc_id").size()
    for did, n in got.items():
        assert n == -(-(2 + did % 4) // 2), did
    assert (res["frame_idx"] % 2 == 0).all()
    assert (res["width"] == 6).all() and (res["height"] == 6).all()
    # spot-check one frame's pixel stats against the pre-encode array
    from glue_etl_pipeline_ray.functions.png import pixel_stats

    row = res.iloc[0]
    rng = np.random.default_rng(int(row["doc_id"]) + 1_000_000)
    # regenerate frames up to the sampled index
    for _ in range(int(row["frame_idx"]) + 1):
        arr = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    assert int(row["pixel_sum"]) == pixel_stats(arr)["pixel_sum"]


def test_lineage_manifest_written_and_consistent(ray_session, tmp_path):
    """The ETL writes a deterministic run-level lineage manifest whose
    tallies match the returned counts (A2/S8 analog)."""
    import pyarrow.dataset as pads

    paths = _blobs(tmp_path, n_files=4)
    out = str(tmp_path / "out")
    counts = run_eventfile_etl(paths, [_spec()], out, files_per_task=2)
    manifests = glob.glob(os.path.join(out, "_lineage", "run-*.json"))
    assert len(manifests) == 1
    m = json.load(open(manifests[0]))
    assert m["tables"] == counts["tables"]
    assert m["dead_lettered"] == counts["dead_lettered"]
    assert m["n_files"] == 4 and m["n_chunks"] == 2
    # manifest tallies match what's actually on disk
    t = pads.dataset(os.path.join(out, "SVC_EVENT"), partitioning="hive").to_table()
    assert t.num_rows == m["tables"]["SVC_EVENT"]
    # identical rerun overwrites the same manifest (no proliferation)
    run_eventfile_etl(paths, [_spec()], out, files_per_task=2)
    assert len(glob.glob(os.path.join(out, "_lineage", "run-*.json"))) == 1


def test_resume_sweeps_stale_tail_chunks_when_input_shrinks(
    ray_session, tmp_path
):
    """Re-running with FEWER input files must purge the prior run's
    tail-chunk outputs and markers — otherwise plain-glob consumers read
    rows from files no longer in the input."""
    paths = _blobs(tmp_path, n_files=6)
    out = str(tmp_path / "out")
    run_eventfile_etl(paths, [_spec()], out, files_per_task=2, resume=True)
    assert os.path.exists(
        os.path.join(out, "_progress", "chunk-00002.json")
    )

    # shrink to the first 2 files (one chunk)
    c = run_eventfile_etl(paths[:2], [_spec()], out, files_per_task=2,
                          resume=True)
    assert c["chunks_skipped"] == 1  # chunk 0 unchanged
    # tail chunks' markers and data files are gone
    markers = sorted(os.listdir(os.path.join(out, "_progress")))
    assert markers == ["chunk-00000.json"]
    data = glob.glob(os.path.join(out, "SVC_EVENT", "**", "*.parquet"),
                     recursive=True)
    assert all("part-c00000" in os.path.basename(f) for f in data), data
    # surviving rows are exactly the first 2 files' events
    import pyarrow.parquet as pq

    ks = sorted(pq.read_table(data)["k"].to_pylist())
    assert ks == sorted([fi * 10 + i for fi in range(2) for i in range(5)])


def test_resume_purges_outputs_of_unmarked_crashed_chunk(
    ray_session, tmp_path
):
    """A chunk that crashed after writing outputs but before its marker
    must not leave phantom partition files when its input changes: the
    resume path sweeps part-c{ci} names for every chunk it re-runs."""
    paths = _blobs(tmp_path, n_files=4)
    out = str(tmp_path / "out")
    run_eventfile_etl(paths, [_spec()], out, files_per_task=2, resume=True)

    # simulate the crash window: marker for chunk 1 lost
    os.remove(os.path.join(out, "_progress", "chunk-00001.json"))
    # change chunk 1's input so the re-run lands in DIFFERENT partitions
    evs = json.dumps(
        {
            "id": "zz0",
            "time": "2030-12-31T23:00:00Z",
            "detail": {
                "type": "EFEvaluationEvent",
                "evaluation": {"service": "svc", "k": 999},
            },
        }
    )
    with open(paths[2], "w") as f:
        f.write(evs)
    with open(paths[3], "w") as f:
        f.write("")

    run_eventfile_etl(paths, [_spec()], out, files_per_task=2, resume=True)
    data = glob.glob(os.path.join(out, "SVC_EVENT", "**", "*.parquet"),
                     recursive=True)
    c1 = [p for p in data if "part-c00001" in os.path.basename(p)]
    # exactly one chunk-1 file, in the NEW partition — no phantoms
    assert len(c1) == 1 and "year=2030" in c1[0], c1
    import pyarrow.parquet as pq

    assert pq.read_table(c1[0])["k"].to_pylist() == [999]


def test_time_acceptance_is_row_independent(ray_session, tmp_path):
    """A non-ISO timestamp must dead-letter regardless of which other
    events share its chunk (the parse path is probed per process, not
    gated on the chunk's parse results)."""

    def ev(i, time):
        return json.dumps(
            {
                "id": f"x{i}",
                "time": time,
                "detail": {
                    "type": "EFEvaluationEvent",
                    "evaluation": {"service": "svc", "k": i},
                },
            }
        )

    # chunk A: non-ISO alone; chunk B: non-ISO next to a valid ISO row
    pa_ = tmp_path / "ef-a"
    pa_.write_text(ev(0, "05/14/2024 10:00"))
    pb = tmp_path / "ef-b"
    pb.write_text(ev(1, "05/14/2024 10:00") + ev(2, "2022-01-01T00:00:00Z"))
    out = str(tmp_path / "outti")
    c = run_eventfile_etl(
        [str(pa_), str(pb)], [_spec()], out, files_per_task=1
    )
    # both non-ISO rows dead-letter identically; only the ISO row lands
    assert c["dead_lettered"] == 2
    assert c["tables"]["SVC_EVENT"] == 1
