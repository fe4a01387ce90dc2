"""Golden parity: replay the reference's REAL e2e fixture blobs through
`run_eventfile_etl` with all six production table specs and assert
row-for-row content equality — including the nested ``struct`` /
``list<struct>`` columns — against the reference's committed expected
Parquet (``test/end_to_end_tests/data/expected/``).

This is a strict upgrade of the reference's own e2e check, which only
compares (row count, column count) (``run_e2e_test.py:102-116``, bug B3).

Fixture counts (derived by replaying the reference semantics over its
own inputs): 111 events in 7 blobs -> 61 clean (13 MICROONE_EVENT,
2 MICROONE_PRED, 1 MICROTWO_EVENT, 2 MICROTWO_PRED, 18 MICROTHREE_EVENT,
25 MICROTHREE_PRED), 30 dead-lettered by validation, 20 unknown-service
(imageTagging / semanticImageMatcher — dropped-by-crash in the
reference, bug B2; dead-lettered here)."""

import glob
import os

import pyarrow.dataset as pads
import pytest

from glue_etl_pipeline_ray.pipelines.event_schemas import reference_table_specs
from glue_etl_pipeline_ray.pipelines.eventfile_etl import run_eventfile_etl

REF = "/root/reference/test/end_to_end_tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def etl_out(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("ref_parity")
    paths = sorted(glob.glob(f"{REF}/input/*"))
    assert len(paths) == 7
    counts = run_eventfile_etl(
        paths,
        reference_table_specs(),
        str(out),
        files_per_task=2,  # >1 chunk: exercises the deterministic fan-out
        require_source="app.event.file",
    )
    return out, counts


def _read_hive(root: str):
    return pads.dataset(root, partitioning="hive").to_table()


def _canon(t):
    t = t.drop_columns(
        [c for c in ("year", "month", "day", "hour") if c in t.column_names]
    )
    return t.sort_by([("id", "ascending"), ("unix_timestamp", "ascending")])


@pytest.mark.parametrize("table", ["MICROONE_EVENT", "MICROONE_PRED"])
def test_golden_content_equality(etl_out, table):
    out, _ = etl_out
    expected = _read_hive(f"{REF}/expected/{table}.parquet")
    mine = _read_hive(str(out / table))
    a = _canon(mine).select(_canon(expected).column_names)  # golden col order
    b = _canon(expected)
    assert a.schema.equals(b.schema), f"{table} schema mismatch:\n{a.schema}\nvs\n{b.schema}"
    if not a.equals(b):
        diffs = [c for c in a.column_names if not a[c].equals(b[c])]
        raise AssertionError(f"{table} content mismatch in columns {diffs}")


def test_golden_partition_layout(etl_out):
    """The derived y/m/d/h hive layout matches the golden layout."""
    out, _ = etl_out
    for table in ("MICROONE_EVENT", "MICROONE_PRED"):
        exp = {
            os.path.relpath(os.path.dirname(p), f"{REF}/expected/{table}.parquet")
            for p in glob.glob(
                f"{REF}/expected/{table}.parquet/**/*.parquet", recursive=True
            )
        }
        got = {
            os.path.relpath(os.path.dirname(p), str(out / table))
            for p in glob.glob(str(out / table / "**" / "*.parquet"), recursive=True)
        }
        assert got == exp, table


def test_all_six_tables_routed(etl_out):
    _, counts = etl_out
    assert counts["tables"] == {
        "MICROONE_EVENT": 13,
        "MICROONE_PRED": 2,
        "MICROTWO_EVENT": 1,
        "MICROTWO_PRED": 2,
        "MICROTHREE_EVENT": 18,
        "MICROTHREE_PRED": 25,
    }
    # 30 validation failures + 20 unknown-service events, all dead-lettered
    assert counts["dead_lettered"] == 50


def test_per_event_audit_stream(etl_out):
    """M14 (VERDICT r2 item 5): one structured audit record per event —
    pass or fail — the analog of the reference's per-event PROFILER line
    (``data_profiling.py:180-189``) / ES docs (``process_logs.py:140-190``,
    sample ``data_observability/data/es_logs.jsonl``). The 7 fixture
    blobs hold 111 events: 61 pass, 30 dirty (validation), 20
    unknown-service."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out, counts = etl_out
    parts = sorted(glob.glob(str(out / "_audit" / "part-c*.parquet")))
    assert len(parts) > 1  # per-chunk files, idempotent naming
    t = pads.dataset(parts).to_table()
    assert t.num_rows == 111 == counts["audited"]
    passed = t.filter(pc.field("passed"))
    failed = t.filter(pc.invert(pc.field("passed")))
    assert passed.num_rows == 61
    errors = failed["error"].to_pylist()
    assert sum(e == "unroutable" for e in errors) == 20  # unknown service
    assert sum(e.startswith("validation: ") for e in errors) == 30
    # every record names its event and source file (auditors ask "what
    # happened to event X in file Y")
    assert t.filter(pc.is_null(t["event_id"])).num_rows == 0
    assert t.filter(pc.is_null(t["event_file"])).num_rows == 0
    # per-table pass tallies match the routed counts exactly
    for spec_name, n in counts["tables"].items():
        service, _, kind = spec_name.rpartition("_")
        kind_full = {"EVENT": "event", "PRED": "prediction"}[kind]
        got = passed.filter(
            pc.and_(
                pc.equal(passed["service"], service.lower()),
                pc.equal(passed["kind"], kind_full),
            )
        ).num_rows
        assert got == n, (spec_name, got, n)


def test_rerun_is_idempotent(etl_out):
    """Deterministic chunk -> file naming: re-running over the same input
    rewrites identical files (no append duplication — ref hazard 2.9)."""
    out, counts = etl_out
    before = sorted(glob.glob(str(out / "**" / "*.parquet"), recursive=True))
    counts2 = run_eventfile_etl(
        sorted(glob.glob(f"{REF}/input/*")),
        reference_table_specs(),
        str(out),
        files_per_task=2,
        require_source="app.event.file",
    )
    after = sorted(glob.glob(str(out / "**" / "*.parquet"), recursive=True))
    assert before == after
    assert counts2["tables"] == counts["tables"]
    exp = _canon(_read_hive(f"{REF}/expected/MICROONE_PRED.parquet"))
    got = _canon(_read_hive(str(out / "MICROONE_PRED"))).select(exp.column_names)
    assert got.equals(exp)
