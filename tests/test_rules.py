"""Nested anyof validation: the reference's test_data_profiling.py
scenarios (:25-155 old/new/neither envelope acceptance, :157-251
prediction pass + allowed-enum fail) against the engine's DocValidator
and the re-expressed six-table schemas."""

import copy

import pytest

from glue_etl_pipeline_ray.pipelines.event_schemas import _validation_schemas
from glue_etl_pipeline_ray.stages.rules import DocValidator

SCHEMAS = _validation_schemas()


def _event_envelope(evaluation: dict) -> dict:
    return {
        "version": "0",
        "id": "ee412e96-45e2-7a35-7d06-83f254728373",
        "detail-type": "EFEvaluationEvent",
        "source": "app.event.file",
        "account": "767115741234",
        "time": "2021-11-17T20:37:06Z",
        "region": "eu-west-1",
        "resources": [],
        "detail": {
            "id": "9d38ef9e-9ac2-4960-a356-d47018bdf42d",
            "type": "EFEvaluationEvent",
            "timestamp": 1637181418425,
            "partitionKey": "3fb1d9a8-1535-4dfc-966c-67bda8a99bd1",
            "evaluation": evaluation,
            "tags": {"region": "eu-west-1"},  # unknown field: must pass
        },
    }


def _microone_eval(**over) -> dict:
    base = {
        "template_ef_version": "1.0",
        "id": "9d38ef9e-9ac2-4960-a356-d47018bdf42d",
        "shape_id": "3fb1d9a8-1535-4dfc-966c-67bda8a99bd1",
        "timestamp": 1637181418425,
        "reporter": "user",
        "type": "PUBLISH",
        "payload": {"text": "The Waterfall approach.", "paragraph": 5,
                    "slide": "gn"},
    }
    base.update(over)
    return base


def test_old_style_event_passes():
    """prediction_id present (service derivable from its suffix), no
    service attribute — anyof_schema variant 0."""
    v = DocValidator(SCHEMAS[("microone", "event")])
    ok, errors = v.validate(
        _event_envelope(_microone_eval(prediction_id="3fb1...#microone"))
    )
    assert ok and errors == []


def test_new_style_event_passes():
    """service present, prediction_id explicitly null — variant 1."""
    v = DocValidator(SCHEMAS[("microone", "event")])
    ok, errors = v.validate(
        _event_envelope(_microone_eval(prediction_id=None, service="microone"))
    )
    assert ok and errors == []


def test_neither_style_fails():
    """prediction_id null AND no service: fails both variants."""
    v = DocValidator(SCHEMAS[("microone", "event")])
    ok, errors = v.validate(_event_envelope(_microone_eval(prediction_id=None)))
    assert not ok and len(errors) > 0


def test_event_enum_violation_fails():
    v = DocValidator(SCHEMAS[("microone", "event")])
    bad = _event_envelope(
        _microone_eval(prediction_id="x#microone", type="RETRACT")
    )
    ok, _ = v.validate(bad)
    assert not ok


def _microone_pred() -> dict:
    return {
        "version": "0",
        "id": "aa412e96-45e2-7a35-7d06-83f254728373",
        "detail-type": "EFPredictionEvent",
        "source": "app.event.file",
        "account": "767115741234",
        "time": "2021-11-17T20:37:06Z",
        "region": "eu-west-1",
        "detail": {
            "id": "9d38ef9e",
            "type": "EFPredictionEvent",
            "timestamp": 1637181418425,
            "partitionKey": "3fb1d9a8",
            "prediction": {
                "service_version": {"software": "1.0.0", "model": "pegasus"},
                "id": "9d38ef9e",
                "shape_id": "3fb1d9a8",
                "service": "microone",
                "timestamp": 1637181418425,
                "input": {
                    "paragraphs": ["p1", "p2"],
                    # real-data field name; flows through unvalidated due
                    # to the reference schema's sentence_scores typo
                    "sentences_scores": [{"score": -1, "sentence": "s"}],
                },
                "output": {"summary": ["s1"]},
            },
        },
    }


def test_prediction_passes():
    v = DocValidator(SCHEMAS[("microone", "prediction")])
    ok, errors = v.validate(_microone_pred())
    assert ok and errors == []


def test_prediction_allowed_enum_fail():
    v = DocValidator(SCHEMAS[("microone", "prediction")])
    bad = _microone_pred()
    bad["detail"]["prediction"]["service"] = "microfour"
    ok, errors = v.validate(bad)
    assert not ok
    assert any("service" in e and "unallowed" in e for e in errors)


def test_prediction_nested_type_fail():
    v = DocValidator(SCHEMAS[("microone", "prediction")])
    bad = _microone_pred()
    bad["detail"]["prediction"]["input"]["paragraphs"] = ["ok", 7]
    ok, errors = v.validate(bad)
    assert not ok
    assert any("paragraphs" in e for e in errors)


def test_required_missing_at_depth():
    v = DocValidator(SCHEMAS[("microone", "prediction")])
    bad = _microone_pred()
    del bad["detail"]["prediction"]["output"]["summary"]
    ok, errors = v.validate(bad)
    assert not ok
    assert any("summary" in e and "required" in e for e in errors)


def test_cerberus_type_semantics():
    """integer accepts any Integral; float widens to ints; boolean is
    strict; null needs nullable."""
    v = DocValidator(
        {
            "i": {"type": "integer"},
            "f": {"type": "float"},
            "b": {"type": "boolean"},
            "n": {"type": "string", "nullable": True},
            "m": {"type": "string"},
        }
    )
    assert v({"i": 3, "f": 3, "b": True, "n": None})
    assert v({"f": 3.5})
    assert not v({"i": 3.5})
    assert not v({"b": 1})
    assert not v({"m": None})
    # unknown fields pass (allow_unknown=True, the reference default)
    assert v({"zzz": object()})


def test_anyof_union_types():
    """microthree media_id: string OR integer, nullable
    (dependencies/microthree_event.json:112-122)."""
    rules = SCHEMAS[("microthree", "event")]["detail"]["schema"]["evaluation"]
    v_payload = rules["anyof_schema"][1]["payload"]["schema"]
    v = DocValidator(v_payload)
    base = {"text": "t", "medialib": "MYLIB", "query": "q"}
    assert v({**base, "media_id": "abc"})
    assert v({**base, "media_id": 123})
    assert v({**base, "media_id": None})
    assert not v({**base, "media_id": 1.5})
    # query: list<string> or string, required
    assert v({**base, "query": ["a", None]})
    assert not v({**base, "query": 7})
    missing = dict(base)
    del missing["query"]
    assert not v(missing)


def test_validator_does_not_mutate_input():
    v = DocValidator(SCHEMAS[("microone", "event")])
    doc = _event_envelope(_microone_eval(prediction_id="x#microone"))
    snapshot = copy.deepcopy(doc)
    v.validate(doc)
    assert doc == snapshot


def test_media_fixup_with_populated_index():
    """J1/M11 with a real media list: canonical {lib}/{id}/{file} keys,
    first match wins on duplicates, no match falls back to the raw id,
    ADD_TAG nulls the media fields (flat_jsons.py:139-183)."""
    from glue_etl_pipeline_ray.pipelines.event_schemas import make_media_fixup

    fix = make_media_fixup(
        "mediabucket",
        [
            "MYLIB/img-1/a.jpg",
            "MYLIB/img-1/b.jpg",  # second match must lose
            "EXTERNALLIB/img-2/c.png",
            "junk-without-slashes",
        ],
    )

    def ev(media_id, lib="MYLIB", typ="SEARCH_IMAGE"):
        return {
            "evaluation": {
                "type": typ,
                "payload": {"media_id": media_id, "medialib": lib,
                            "media_type": "IMAGE", "caption": "c"},
            }
        }

    d = fix(ev("img-1"))
    assert d["evaluation"]["payload"]["media_id"] == "s3://mediabucket/MYLIB/img-1/a.jpg"
    assert d["evaluation"]["payload"]["search_match"] is None

    d = fix(ev("img-2", lib="EXTERNALLIB"))
    assert d["evaluation"]["payload"]["media_id"] == "s3://mediabucket/EXTERNALLIB/img-2/c.png"

    # no match: raw id kept (left-outer fallback)
    d = fix(ev("img-404"))
    assert d["evaluation"]["payload"]["media_id"] == "img-404"

    # ADD_TAG: media fields nulled, lookup skipped entirely
    d = fix(ev("img-1", typ="ADD_TAG"))
    p = d["evaluation"]["payload"]
    assert p["media_id"] is None and p["media_type"] is None and p["caption"] is None

    # missing media_id/medialib: event untouched
    d = fix({"evaluation": {"type": "PUBLISH", "payload": {"text": "t"}}})
    assert "media_id" not in d["evaluation"]["payload"]
