"""Unit tests for the vectorized validator + dead-letter channel.

Mirrors the reference's validation unit tests
(``test/unit_tests/test_data_profiling.py``): pass/fail per rule kind,
plus the engine guarantee the reference lacks (bugs B1/B2): every row
lands in exactly one of {clean, dead-letter}."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from glue_etl_pipeline_ray.spec import Rule, TableSpec, repo_file_spec
from glue_etl_pipeline_ray.stages.validate import ValidateFn


def _events(**over) -> pa.Table:
    base = {
        "seq": [1, 2, 3, 4],
        "batch_id": [0, 0, 0, 0],
        "op": ["INSERT", "UPDATE", "DELETE", "UPDATE"],
        "repo": ["o/r", "o/r", "o/r", "o/r2"],
        "path": ["a.py", "b.py", "a.py", "c.py"],
        "commit": ["a" * 40, "b" * 40, "c" * 40, "d" * 40],
        "lang": ["py", "py", None, "py"],
        "content": ["x = 1", "y = 2", None, "z = 3"],
    }
    base.update(over)
    return pa.table(base)


@pytest.fixture
def spec():
    return repo_file_spec(num_buckets=8)


def test_all_clean_pass(tmp_path, spec):
    v = ValidateFn(spec, str(tmp_path / "dlq"))
    out = v(_events())
    assert out.num_rows == 4
    assert not glob.glob(str(tmp_path / "dlq" / "*.parquet"))


@pytest.mark.parametrize(
    "over,bad_rows,err_substr",
    [
        ({"repo": ["o/r", None, "o/r", "o/r"]}, [2], "not_null:repo"),
        ({"op": ["INSERT", "TAG_IMAGE", "DELETE", "UPDATE"]}, [2], "enum:op"),
        ({"commit": ["a" * 40, "zz", "c" * 40, "d" * 40]}, [2], "regex:commit"),
        ({"lang": ["py", "klingon", None, "py"]}, [2], "enum:lang"),
        ({"content": ["x", None, None, "z"]}, [2], "not_null:content"),
    ],
)
def test_each_failure_mode_dead_letters(tmp_path, spec, over, bad_rows, err_substr):
    v = ValidateFn(spec, str(tmp_path / "dlq"))
    t = _events(**over)
    clean = v(t)
    dlq_files = glob.glob(str(tmp_path / "dlq" / "*.parquet"))
    dlq = pa.concat_tables([pq.read_table(f) for f in dlq_files])
    # exactly-one-of guarantee
    assert clean.num_rows + dlq.num_rows == t.num_rows
    assert dlq["seq"].to_pylist() == bad_rows
    assert err_substr in dlq["error"].to_pylist()[0]


def test_delete_may_omit_payload(tmp_path, spec):
    v = ValidateFn(spec, str(tmp_path / "dlq"))
    out = v(_events())
    assert 3 in out["seq"].to_pylist()  # DELETE row with null content passes


def test_missing_required_column_entirely(tmp_path, spec):
    t = _events().drop_columns(["commit"])
    v = ValidateFn(spec, str(tmp_path / "dlq"))
    clean = v(t)
    # commit is DELETE-nullable: only the DELETE row survives
    assert clean["seq"].to_pylist() == [3]


def test_multiple_errors_joined(tmp_path, spec):
    v = ValidateFn(spec, str(tmp_path / "dlq"))
    t = _events(
        repo=[None, "o/r", "o/r", "o/r"],
        commit=["bad", "b" * 40, "c" * 40, "d" * 40],
    )
    v(t)
    dlq = pq.read_table(glob.glob(str(tmp_path / "dlq" / "*.parquet"))[0])
    err = dlq["error"].to_pylist()[0]
    assert "not_null:repo" in err and "regex:commit" in err


def test_dlq_write_is_idempotent(tmp_path, spec):
    v = ValidateFn(spec, str(tmp_path / "dlq"))
    t = _events(lang=["py", "klingon", None, "py"])
    v(t)
    v(t)  # retried task
    files = glob.glob(str(tmp_path / "dlq" / "*.parquet"))
    assert len(files) == 1
    assert pq.read_table(files[0]).num_rows == 1


def test_range_rule(tmp_path):
    spec = TableSpec(
        name="t",
        key_cols=("k",),
        base_cols=(("v", "double"),),
        rules=(Rule("v", "range", lo=0.0, hi=10.0),),
    )
    t = pa.table({"k": ["a", "b", "c"], "seq": [1, 2, 3],
                  "op": ["INSERT"] * 3, "v": [5.0, -1.0, None]})
    # dlq-less validation must refuse to silently drop the dirty row
    with pytest.raises(ValueError, match="no dlq_dir"):
        ValidateFn(spec, None)(t)
    out = ValidateFn(spec, str(tmp_path / "dlq"))(t)
    assert out["k"].to_pylist() == ["a", "c"]  # null tolerated, -1 rejected
