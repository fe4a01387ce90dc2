"""Property-based event-file ETL: random envelope streams (valid / dirty
/ unknown-service / corrupt spans, arbitrary chunking) through
`run_eventfile_etl` with the production six-table specs must equal a
sequential single-loop evaluation of the same contract."""

import glob
import json
import os
import uuid

import pyarrow.dataset as pads
from hypothesis import given, settings, strategies as st

from glue_etl_pipeline_ray.pipelines.event_schemas import reference_table_specs
from glue_etl_pipeline_ray.pipelines.eventfile_etl import (
    classify,
    run_eventfile_etl,
)
from glue_etl_pipeline_ray.sources.eventfiles import split_concat_json


def _envelope(rng):
    """A random envelope biased toward microone events with assorted
    violations mixed in."""
    kinds = ["m1_event_old", "m1_event_new", "m1_pred", "m3_event",
             "unknown", "broken"]
    kind = rng.choice(kinds, p=[0.3, 0.2, 0.15, 0.15, 0.1, 0.1])
    eid = f"e{rng.integers(0, 1 << 30):08x}"
    t = (
        f"2022-{int(rng.integers(1, 13)):02d}-{int(rng.integers(1, 29)):02d}"
        f"T{int(rng.integers(0, 24)):02d}:{int(rng.integers(0, 60)):02d}:00Z"
    )
    base = {
        "version": "0", "id": eid, "source": "app.event.file",
        "account": "123", "time": t, "region": "eu-west-1",
    }
    ts = int(rng.integers(1, 1 << 40))
    if kind.startswith("m1_event"):
        ev = {
            "template_ef_version": "1.0", "id": eid, "shape_id": "s",
            "timestamp": ts, "reporter": "user",
            "type": str(rng.choice(["PUBLISH", "DELETE", "RETRACT"],
                                   p=[0.6, 0.2, 0.2])),
            "payload": {
                "text": "t",
                "paragraph": int(rng.integers(0, 9))
                if rng.random() < 0.7 else None,
                "slide": None,
            },
        }
        if kind == "m1_event_old":
            ev["prediction_id"] = f"p#{eid}#microone"
        else:
            ev["prediction_id"] = None
            ev["service"] = "microone"
        if rng.random() < 0.1:
            del ev["payload"]["text"]  # required-at-depth violation
        return {**base, "detail-type": "EFEvaluationEvent",
                "detail": {"id": eid, "type": "EFEvaluationEvent",
                           "timestamp": ts, "partitionKey": "pk",
                           "evaluation": ev}}
    if kind == "m1_pred":
        pred = {
            "id": eid, "shape_id": "s", "service": "microone",
            "timestamp": ts,
            "service_version": {"software": "1", "model": "m"},
            "input": {"paragraphs": ["p1"],
                      "sentences_scores": [{"score": int(rng.integers(-1, 3)),
                                            "sentence": "s"}]},
            "output": {"summary": ["x"]},
        }
        if rng.random() < 0.15:
            pred["service"] = "microNINE"  # enum violation
        return {**base, "detail-type": "EFPredictionEvent",
                "detail": {"id": eid, "type": "EFPredictionEvent",
                           "timestamp": ts, "partitionKey": "pk",
                           "prediction": pred}}
    if kind == "m3_event":
        ev = {
            "template_ef_version": "1.0", "id": eid, "shape_id": "s",
            "prediction_id": None, "service": "microthree",
            "timestamp": ts, "reporter": "builder", "type": "SEARCH_IMAGE",
            "payload": {"text": "t", "media_id": int(rng.integers(0, 99)),
                        "media_type": "IMAGE", "medialib": "MYLIB",
                        "query": str(rng.choice(["null", "q"]))
                        if rng.random() < 0.5 else ["a", "b"],
                        "tags": "solo" if rng.random() < 0.5 else ["x"],
                        "caption": None},
        }
        return {**base, "detail-type": "EFEvaluationEvent",
                "detail": {"id": eid, "type": "EFEvaluationEvent",
                           "timestamp": ts, "partitionKey": "pk",
                           "evaluation": ev}}
    if kind == "unknown":
        return {**base, "detail-type": "EFEvaluationEvent",
                "detail": {"id": eid, "type": "EFEvaluationEvent",
                           "timestamp": ts, "partitionKey": "pk",
                           "evaluation": {"service": "imageTagging",
                                          "prediction_id": None}}}
    return {**base, "detail": "not-a-dict"}


def _sequential_reference(blobs, specs):
    """One python loop over all events: the expected per-table clean
    counts + expected event_id routing, independent of chunking/Ray."""
    by_key = {(s.service, s.kind): s for s in specs}
    table_ids: dict[str, list] = {s.name: [] for s in specs}
    dlq = 0
    for blob in blobs:
        events, bad = split_concat_json(blob)
        dlq += len(bad)
        for ev in events:
            if str(ev.get("source", "")).lower() != "app.event.file":
                dlq += 1
                continue
            detail = ev.get("detail")
            if not isinstance(detail, dict):
                dlq += 1
                continue
            service, kind = classify(detail)
            spec = by_key.get((service, kind))
            if spec is None:
                dlq += 1
                continue
            ok, _ = spec.validator.validate(ev)
            if not ok:
                dlq += 1
                continue
            table_ids[spec.name].append(detail["id"])
    return table_ids, dlq


@st.composite
def stream(draw):
    return (
        draw(st.integers(10, 120)),
        draw(st.integers(1, 5)),
        draw(st.integers(0, 2**31 - 1)),
    )


@settings(max_examples=5, deadline=None)
@given(s=stream())
def test_random_envelopes_match_sequential_reference(ray_session, s):
    import numpy as np

    n, n_files, seed = s
    rng = np.random.default_rng(seed)
    work = f"/tmp/gepr_etlprop_{uuid.uuid4().hex[:12]}"
    os.makedirs(work)
    blobs, paths = [], []
    for fi in range(n_files):
        parts = [json.dumps(_envelope(rng)) for _ in range(n // n_files + 1)]
        if rng.random() < 0.3:
            parts.insert(int(rng.integers(0, len(parts))), "##corrupt##")
        blob = "".join(parts)
        blobs.append(blob)
        p = os.path.join(work, f"ef-{fi:03d}")
        with open(p, "w") as f:
            f.write(blob)
        paths.append(p)

    specs = reference_table_specs()
    expected_ids, expected_dlq = _sequential_reference(blobs, specs)
    out = os.path.join(work, "out")
    counts = run_eventfile_etl(
        paths, specs, out, files_per_task=int(rng.integers(1, 4)),
        require_source="app.event.file",
    )
    assert counts["dead_lettered"] == expected_dlq
    for spec in specs:
        assert counts["tables"][spec.name] == len(expected_ids[spec.name]), spec.name
        files = glob.glob(os.path.join(out, spec.name, "**", "*.parquet"),
                          recursive=True)
        got = (
            sorted(
                pads.dataset(os.path.join(out, spec.name), partitioning="hive")
                .to_table(columns=["id"])["id"].to_pylist()
            )
            if files
            else []
        )
        assert got == sorted(expected_ids[spec.name]), spec.name
