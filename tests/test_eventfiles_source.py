"""Concatenated-JSON source: every byte lands in exactly one of
{event row, dead-letter row} — no drops (ref bug B2), no duplicates
(ref bug B1)."""

import json
import os

from glue_etl_pipeline_ray.sources.eventfiles import (
    read_event_files,
    split_concat_json,
)


def test_split_well_formed_stream():
    evs = [{"id": f"e{i}", "source": "app.event.file", "detail": {"k": i}} for i in range(5)]
    blob = "".join(json.dumps(e) for e in evs)  # NO delimiters
    events, bad = split_concat_json(blob)
    assert [e["id"] for e in events] == [f"e{i}" for i in range(5)]
    assert bad == []


def test_split_malformed_spans_dead_letter_not_drop_not_duplicate():
    good = [{"id": "a", "detail": {"k": 1}}, {"id": "b", "detail": {"k": 2}}]
    blob = (
        json.dumps(good[0])
        + '{"broken": '          # truncated object
        + json.dumps(good[1])
        + "garbage-tail"
    )
    events, bad = split_concat_json(blob)
    ids = [e["id"] for e in events]
    # B1 fix: 'a' and 'b' each appear exactly once
    assert ids == ["a", "b"]
    # B2 fix: both malformed spans are captured, not dropped.
    # Note: the truncated '{"broken": ' span swallows the next '{' while
    # resyncing, so the bad spans are non-empty and cover the junk bytes.
    assert len(bad) >= 1
    assert any("broken" in s for s in bad)
    assert any("garbage-tail" in s for s in bad)


def test_split_empty_and_whitespace():
    assert split_concat_json("") == ([], [])
    events, bad = split_concat_json("   \n ")
    assert events == [] and bad == []


def test_read_event_files_dataset(ray_session, tmp_path):
    evs = [
        {"id": f"e{i}", "source": "app.event.file", "time": f"t{i}",
         "detail": {"type": "EFPredictionEvent", "n": i}}
        for i in range(6)
    ]
    f1 = tmp_path / "ef-1"
    f1.write_text("".join(json.dumps(e) for e in evs[:4]) + "<<corrupt>>")
    f2 = tmp_path / "ef-2"
    f2.write_text("".join(json.dumps(e) for e in evs[4:]))

    ds = read_event_files([str(f1), str(f2)])
    rows = ds.take_all()
    ok = [r for r in rows if r["error"] is None]
    dlq = [r for r in rows if r["error"] is not None]
    assert sorted(r["id"] for r in ok) == [f"e{i}" for i in range(6)]
    assert len(dlq) == 1 and "corrupt" in dlq[0]["raw"]
    # nested payload round-trips as canonical JSON
    assert json.loads(ok[0]["detail_json"])["type"] == "EFPredictionEvent"
    # lineage: rows carry their source file
    assert {os.path.basename(r["source_file"]) for r in ok} == {"ef-1", "ef-2"}
