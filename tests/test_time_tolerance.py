"""ADVICE fix gate: event times with fractional seconds or offsets must
parse (the reference's Spark cast tolerates them); unparseable times
dead-letter with error="time" instead of crashing the run."""

import glob
import json

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.pipelines.eventfile_etl import (
    EventTableSpec,
    run_eventfile_etl,
)


def _spec():
    return EventTableSpec(
        service="svc",
        kind="event",
        schema=pa.schema(
            [("event_id", pa.string()), ("date_time", pa.string())]
        ),
        project=lambda d: {},
    )


def _ev(i, t):
    return json.dumps(
        {
            "id": f"e{i}",
            "time": t,
            "detail": {"type": "EFEvaluationEvent",
                       "evaluation": {"service": "svc"}},
        }
    )


def test_time_variants_parse_and_bad_times_dead_letter(ray_session, tmp_path):
    blob = "".join(
        [
            _ev(0, "2022-04-27T15:46:23Z"),          # canonical
            _ev(1, "2022-04-27T15:46:23.123Z"),      # fractional seconds
            _ev(2, "2022-04-27T17:46:23+02:00"),     # offset (= 15:46 UTC)
            _ev(3, "not-a-time"),                     # unparseable -> DLQ
            _ev(4, "2022-13-45T99:99:99Z"),           # invalid fields -> DLQ
        ]
    )
    (tmp_path / "ef-1").write_text(blob)
    out = tmp_path / "out"
    counts = run_eventfile_etl([str(tmp_path / "ef-1")], [_spec()], str(out))

    assert counts["tables"]["SVC_EVENT"] == 3
    assert counts["dead_lettered"] == 2
    dlq = pq.read_table(glob.glob(str(out / "_dlq" / "*.parquet"))[0])
    assert dlq["__error"].to_pylist() == ["time", "time"]

    t = pads.dataset(str(out / "SVC_EVENT"), partitioning="hive").to_table()
    rows = {
        r["event_id"]: (r["year"], r["month"], r["day"], r["hour"])
        for r in t.to_pylist()
    }
    # all three valid variants land in the same UTC hour partition
    assert rows == {
        "e0": (2022, 4, 27, 15),
        "e1": (2022, 4, 27, 15),
        "e2": (2022, 4, 27, 15),
    }
