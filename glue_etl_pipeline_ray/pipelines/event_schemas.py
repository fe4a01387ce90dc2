"""The reference's six logical tables as declarative EventTableSpecs.

Each spec bundles the three contracts the reference spreads over three
files (its 2.10 extension surface):

- the **validation schema** (``dependencies/{service}_{kind}.json``,
  re-expressed via builders below for :class:`stages.rules.DocValidator`
  — shared envelope + per-service bodies, old/new ``anyof_schema``
  variants for evaluation events);
- the **fix-ups** (``flat_jsons.py:44-183``: M6 score int->float, M7
  paragraph int->str, M8/M9 null backfill, M10 str->list promotion,
  M11 media-URI enrichment);
- the **projection** to the final flat-or-nested column contract
  (``convert_to_parquet.py:58-159`` SQL), with the authoritative Arrow
  schemas — including the nested ``struct`` / ``list<struct>`` columns
  confirmed by the reference's committed expected Parquet
  (``test/end_to_end_tests/data/expected/MICROONE_PRED.parquet``).

Deliberately preserved reference quirks (parity over tidiness):

- the ``sentence_scores`` field-name typo in the microone prediction
  schema (``dependencies/microone_prediction.json:102``) — real data
  uses ``sentences_scores``, which therefore flows through UNVALIDATED
  thanks to ``allow_unknown``; "fixing" the typo would change which
  events dead-letter;
- evaluation envelopes accept old-style (required ``prediction_id``,
  optional ``service``) OR new-style (required ``service``, nullable
  ``prediction_id``) bodies via ``anyof_schema``
  (``microone_event.json:59-187``);
- media enrichment falls back to the raw ``media_id`` when no media key
  matches (left-outer-with-fallback, ``flat_jsons.py:165-169``).
"""

from __future__ import annotations

from numbers import Integral

import pyarrow as pa

from glue_etl_pipeline_ray.pipelines.eventfile_etl import EventTableSpec
from glue_etl_pipeline_ray.stages.rules import DocValidator

# --------------------------------------------------------------------------
# validation-schema builders (dependencies/*.json re-expressed)
# --------------------------------------------------------------------------


def _req(ty: str, **kw) -> dict:
    return {"type": ty, "required": True, **kw}


def _envelope(detail_type: str, body_field: str, body_rules: dict) -> dict:
    """The shared outer envelope every schema file repeats
    (e.g. ``dependencies/microone_event.json:1-55``)."""
    return {
        "version": _req("string"),
        "id": _req("string"),
        "detail-type": _req("string", allowed=[detail_type]),
        "source": _req("string"),
        "account": _req("string"),
        "time": _req("string"),
        "region": _req("string"),
        "detail": _req(
            "dict",
            schema={
                "id": _req("string"),
                "type": _req("string", allowed=[detail_type]),
                "timestamp": _req("integer"),
                "partitionKey": _req("string"),
                body_field: body_rules,
            },
        ),
    }


def _eval_body(service: str, types: list[str], reporters: list[str],
               payload: dict) -> dict:
    """Old/new evaluation-body variants (``microone_event.json:59-187``):
    old style requires ``prediction_id`` (service optional), new style
    requires ``service`` (prediction_id nullable)."""

    def base() -> dict:
        return {
            "template_ef_version": _req("string"),
            "id": _req("string"),
            "shape_id": _req("string"),
            "timestamp": _req("integer"),
            "reporter": _req("string", allowed=reporters),
            "type": _req("string", allowed=types),
            "payload": _req("dict", schema=payload),
        }

    old = base()
    old["prediction_id"] = _req("string")
    old["service"] = {"type": "string", "allowed": [service]}
    new = base()
    new["prediction_id"] = {"type": "string", "nullable": True}
    new["service"] = _req("string", allowed=[service])
    return {"type": "dict", "required": True, "anyof_schema": [old, new]}


def _pred_body(service: str, extra: dict, input_schema: dict,
               output_schema: dict) -> dict:
    """Prediction bodies are single-variant (``microone_prediction.json:56-91``)."""
    return _req(
        "dict",
        schema={
            "id": _req("string"),
            "shape_id": _req("string"),
            "service": _req("string", allowed=[service]),
            "timestamp": _req("integer"),
            "input": _req("dict", schema=input_schema),
            "output": _req("dict", schema=output_schema),
            **extra,
        },
    )


_SERVICE_VERSION_RULES = _req(
    "dict", schema={"software": {"type": "string"}, "model": {"type": "string"}}
)

_NULLABLE_STR = {"type": "string", "nullable": True}


def _validation_schemas() -> dict[tuple[str, str], dict]:
    """(service, kind) -> envelope schema; semantics bit-matched to
    ``dependencies/*.json`` (six files) via the golden-parity e2e test."""
    microone_event_payload = {
        "text": _req("string"),
        "paragraph": _req("integer", nullable=True),
        "slide": _NULLABLE_STR,
    }
    microthree_event_payload = {
        "text": _req("string"),
        "media_id": {
            "nullable": True,
            "anyof": [{"type": "string"}, {"type": "integer"}],
        },
        "media_type": {**_NULLABLE_STR, "allowed": ["IMAGE", "VIDEO"]},
        "medialib": _req(
            "string", nullable=True, allowed=["MYLIB", "EXTERNALLIB"]
        ),
        "query": {
            "required": True,
            "nullable": True,
            "anyof": [
                {"type": "list", "schema": {"type": "string", "nullable": True}},
                {"type": "string", "nullable": True},
            ],
        },
        "tags": {
            "type": "list",
            "nullable": True,
            "schema": {"type": "string", "nullable": True},
        },
        "caption": _NULLABLE_STR,
    }
    # microone_prediction.json:91-194 (note the sentence_scores typo)
    microone_pred_input = {
        "paragraphs": _req("list", schema={"type": "string"}),
        "sentence_scores": {  # sic — see module docstring
            "type": "list",
            "nullable": True,
            "schema": {
                "type": "dict",
                "nullable": True,
                "schema": {
                    "sentence": _NULLABLE_STR,
                    "score": {"type": "float", "nullable": True},
                },
            },
        },
    }
    microone_pred_output = {
        "summary": _req("list", schema={"type": "string"}),
        "metadata": {
            "type": "list",
            "nullable": True,
            "schema": {
                "type": "dict",
                "nullable": True,
                "schema": {
                    "filtered_sentences": {
                        "type": "list",
                        "nullable": True,
                        "schema": {"type": "string", "nullable": True},
                    },
                    "scores": {
                        "type": "list",
                        "nullable": True,
                        "schema": {"type": "float", "nullable": True},
                    },
                    "idx": {"type": "integer", "nullable": True},
                },
            },
        },
        "skipped_paragraphs": {
            "type": "list",
            "nullable": True,
            "schema": {
                "type": "dict",
                "nullable": True,
                "schema": {
                    "text": _NULLABLE_STR,
                    "index": {"type": "integer", "nullable": True},
                    "language": _NULLABLE_STR,
                    "text_language": _NULLABLE_STR,
                    "original_paragraph": {"type": "boolean", "nullable": True},
                },
            },
        },
    }
    return {
        ("microone", "event"): _envelope(
            "EFEvaluationEvent",
            "evaluation",
            _eval_body(
                "microone",
                ["PUBLISH", "DELETE", "DELETE SLIDE"],
                ["user"],
                microone_event_payload,
            ),
        ),
        ("microone", "prediction"): _envelope(
            "EFPredictionEvent",
            "prediction",
            _pred_body(
                "microone",
                {"service_version": _SERVICE_VERSION_RULES},
                microone_pred_input,
                microone_pred_output,
            ),
        ),
        ("microtwo", "event"): _envelope(
            "EFEvaluationEvent",
            "evaluation",
            _eval_body(
                "microtwo", ["PUBLISH"], ["user", "builder"],
                {"text": _req("string")},
            ),
        ),
        ("microtwo", "prediction"): _envelope(
            "EFPredictionEvent",
            "prediction",
            _pred_body(
                "microtwo",
                {"service_version": _SERVICE_VERSION_RULES},
                {"transcript": _req("string")},
                {"microtwo": _req("list", schema={"type": "string"})},
            ),
        ),
        ("microthree", "event"): _envelope(
            "EFEvaluationEvent",
            "evaluation",
            _eval_body(
                "microthree",
                ["ADD_TAG", "SEARCH_IMAGE", "PUBLISH"],
                ["user", "builder"],
                microthree_event_payload,
            ),
        ),
        ("microthree", "prediction"): _envelope(
            "EFPredictionEvent",
            "prediction",
            _pred_body(
                "microthree",
                {
                    "context": _req(
                        "dict",
                        schema={
                            "paragraph": {"type": "integer"},
                            "sentence": {"type": "integer"},
                        },
                    )
                },
                {"paragraph": _req("string")},
                {
                    "sentence": _req("string"),
                    "search_terms": _req("list", schema={"type": "string"}),
                    "scores": _req("list", schema={"type": "float"}),
                },
            ),
        ),
    }


# --------------------------------------------------------------------------
# fix-ups (flat_jsons.py:44-183 analogs; operate on the detail dict)
# --------------------------------------------------------------------------


def _fix_scores_to_float(detail: dict) -> dict:
    """M6: int scores -> float; absent sentences_scores -> None
    (``flat_jsons.py:44-63``). Note: operates on the REAL data field
    ``sentences_scores``, as the reference does."""
    inp = detail["prediction"]["input"]
    if "sentences_scores" in inp:
        for ss in inp["sentences_scores"] or []:
            if isinstance(ss.get("score"), Integral):
                ss["score"] = float(ss["score"])
    else:
        inp["sentences_scores"] = None
    return detail


def _fix_backfill_metadata(detail: dict) -> dict:
    """M8 (``flat_jsons.py:85-96``)."""
    detail["prediction"]["output"].setdefault("metadata", None)
    return detail


def _fix_backfill_skipped(detail: dict) -> dict:
    """M9 (``flat_jsons.py:99-110``)."""
    detail["prediction"]["output"].setdefault("skipped_paragraphs", None)
    return detail


def _fix_paragraph_to_str(detail: dict) -> dict:
    """M7: microone events, paragraph int -> str, DELETE skipped
    (``flat_jsons.py:66-82``)."""
    ev = detail["evaluation"]
    if ev["type"] != "DELETE":
        p = ev["payload"].get("paragraph")
        if isinstance(p, Integral) and not isinstance(p, bool):
            ev["payload"]["paragraph"] = str(p)
    return detail


def _fix_query_and_tags(detail: dict) -> dict:
    """M10: query/tags string -> [string], literal "null" -> []
    (``flat_jsons.py:113-136``)."""
    payload = detail["evaluation"]["payload"]
    for f in ("query", "tags"):
        v = payload.get(f)
        if isinstance(v, str):
            payload[f] = [] if v == "null" else [v]
    return detail


def make_media_fixup(media_bucket: str = "media", all_medias=()):
    """M11/J1: replace ``media_id`` with the first matching media URI
    (``flat_jsons.py:139-183``). The reference scans the whole key list
    per event (O(M) substring match); media keys follow the canonical
    ``{lib}/{id}/{file}`` layout (listed via ``glob('*/*/*')``,
    ``flat_jsons.py:40``), so we precompute a ``{lib}/{id} -> first URI``
    index ONCE here (this closure is shipped by value to every worker —
    the ST2 broadcast) and look up O(1) per event. First match wins; no
    match falls back to the raw id (left-outer-with-fallback)."""
    index: dict[str, str] = {}
    for key in all_medias:
        parts = key.split("/")
        if len(parts) >= 2:
            index.setdefault(f"{parts[0]}/{parts[1]}", f"s3://{media_bucket}/{key}")

    def fix(detail: dict) -> dict:
        ev = detail["evaluation"]
        payload = ev["payload"]
        if ev["type"] != "ADD_TAG":
            if "media_id" in payload and "medialib" in payload:
                lookup = f'{payload["medialib"]}/{payload["media_id"]}'
                payload["media_id"] = index.get(lookup, payload["media_id"])
                payload["search_match"] = None
        else:
            payload["media_id"] = None
            payload["media_type"] = None
            payload["caption"] = None
        return detail

    return fix


# --------------------------------------------------------------------------
# output schemas + projections (convert_to_parquet.py:58-159 SQL contracts)
# --------------------------------------------------------------------------

_SERVICE_VERSION = pa.struct([("model", pa.string()), ("software", pa.string())])
_SENTENCES_SCORES = pa.list_(
    pa.struct([("score", pa.float64()), ("sentence", pa.string())])
)
_OUTPUT_METADATA = pa.list_(
    pa.struct(
        [
            ("filtered_sentences", pa.list_(pa.string())),
            ("idx", pa.int64()),
            ("scores", pa.list_(pa.float64())),
        ]
    )
)
_SKIPPED_PARAGRAPHS = pa.list_(
    pa.struct(
        [
            ("index", pa.int64()),
            ("language", pa.string()),
            ("original_paragraph", pa.bool_()),
            ("text", pa.string()),
            ("text_language", pa.string()),
        ]
    )
)
_CONTEXT = pa.struct([("paragraph", pa.int64()), ("sentence", pa.int64())])


def _get(d, *path):
    for p in path:
        d = d.get(p) if isinstance(d, dict) else None
    return d


def _as_str(v):
    """Spark's inference coerces mixed int/string JSON columns to string
    (the media_id fallback can be a raw int id)."""
    return v if v is None or isinstance(v, str) else str(v)


_EVAL_COMMON = [
    ("account", pa.string()),
    ("id", pa.string()),
    ("partition_key", pa.string()),
    ("prediction_id", pa.string()),
    ("reporter", pa.string()),
    ("event_type", pa.string()),
    ("unix_timestamp", pa.int64()),
    ("shape_id", pa.string()),
]


def _eval_common(detail: dict) -> dict:
    ev = detail["evaluation"]
    return {
        "id": detail.get("id"),
        "partition_key": detail.get("partitionKey"),
        "prediction_id": ev.get("prediction_id"),
        "reporter": ev.get("reporter"),
        "event_type": ev.get("type"),
        "unix_timestamp": ev.get("timestamp"),
        "shape_id": ev.get("shape_id"),
    }


_PRED_COMMON = [
    ("account", pa.string()),
    ("id", pa.string()),
    ("partition_key", pa.string()),
    ("service", pa.string()),
    ("service_version", _SERVICE_VERSION),
    ("unix_timestamp", pa.int64()),
    ("shape_id", pa.string()),
]


def _pred_common(detail: dict) -> dict:
    pred = detail["prediction"]
    return {
        "id": detail.get("id"),
        "partition_key": detail.get("partitionKey"),
        "service": pred.get("service"),
        "service_version": pred.get("service_version"),
        "unix_timestamp": pred.get("timestamp"),
        "shape_id": pred.get("shape_id"),
    }


def reference_table_specs(
    media_bucket: str = "media", all_medias=()
) -> list[EventTableSpec]:
    """All six logical tables (``convert_to_parquet.py:50-57``)."""
    v = {k: DocValidator(s) for k, s in _validation_schemas().items()}

    def microone_event_project(d: dict) -> dict:
        out = _eval_common(d)
        p = _get(d, "evaluation", "payload") or {}
        out.update(
            paragraph=_as_str(p.get("paragraph")),
            slide=p.get("slide"),
            text=p.get("text"),
        )
        return out

    def microone_pred_project(d: dict) -> dict:
        out = _pred_common(d)
        pred = d["prediction"]
        out.update(
            input_paragraphs=_get(pred, "input", "paragraphs"),
            input_sentences_scores=_get(pred, "input", "sentences_scores"),
            output_summary=_get(pred, "output", "summary"),
            output_metadata=_get(pred, "output", "metadata"),
            output_skipped_paragraphs=_get(pred, "output", "skipped_paragraphs"),
        )
        return out

    def microtwo_event_project(d: dict) -> dict:
        out = _eval_common(d)
        out["payload_text"] = _get(d, "evaluation", "payload", "text")
        return out

    def microtwo_pred_project(d: dict) -> dict:
        out = _pred_common(d)
        pred = d["prediction"]
        out.update(
            transcript=_get(pred, "input", "transcript"),
            headline=_get(pred, "output", "microtwo"),
        )
        return out

    def microthree_event_project(d: dict) -> dict:
        out = _eval_common(d)
        p = _get(d, "evaluation", "payload") or {}
        out.update(
            payload_text=p.get("text"),
            payload_query=p.get("query"),
            payload_search_terms=p.get("search_terms"),
            payload_media_id=_as_str(p.get("media_id")),
            payload_media_type=p.get("media_type"),
            payload_medialib=p.get("medialib"),
            payload_search_match=_as_str(p.get("search_match")),
            payload_tags=p.get("tags"),
            payload_caption=p.get("caption"),
        )
        return out

    def microthree_pred_project(d: dict) -> dict:
        out = _pred_common(d)
        pred = d["prediction"]
        out.update(
            context=pred.get("context"),
            paragraph=_get(pred, "input", "paragraph"),
            scores=_get(pred, "output", "scores"),
            search_terms=_get(pred, "output", "search_terms"),
            sentence=_get(pred, "output", "sentence"),
        )
        return out

    media_fix = make_media_fixup(media_bucket, all_medias)

    return [
        EventTableSpec(
            service="microone",
            kind="event",
            table_name="MICROONE_EVENT",
            validator=v[("microone", "event")],
            fixups=(_fix_paragraph_to_str,),
            schema=pa.schema(
                [
                    ("account", pa.string()),
                    ("id", pa.string()),
                    ("partition_key", pa.string()),
                    ("prediction_id", pa.string()),
                    ("unix_timestamp", pa.int64()),
                    ("shape_id", pa.string()),
                    ("event_type", pa.string()),
                    ("reporter", pa.string()),
                    ("paragraph", pa.string()),
                    ("slide", pa.string()),
                    ("text", pa.string()),
                    ("date_time", pa.string()),
                ]
            ),
            project=microone_event_project,
        ),
        EventTableSpec(
            service="microone",
            kind="prediction",
            table_name="MICROONE_PRED",
            validator=v[("microone", "prediction")],
            fixups=(
                _fix_scores_to_float,
                _fix_backfill_metadata,
                _fix_backfill_skipped,
            ),
            schema=pa.schema(
                _PRED_COMMON
                + [
                    ("input_paragraphs", pa.list_(pa.string())),
                    ("input_sentences_scores", _SENTENCES_SCORES),
                    ("output_summary", pa.list_(pa.string())),
                    ("output_metadata", _OUTPUT_METADATA),
                    ("output_skipped_paragraphs", _SKIPPED_PARAGRAPHS),
                    ("date_time", pa.string()),
                ]
            ),
            project=microone_pred_project,
        ),
        EventTableSpec(
            service="microtwo",
            kind="event",
            table_name="MICROTWO_EVENT",
            validator=v[("microtwo", "event")],
            schema=pa.schema(
                _EVAL_COMMON + [("payload_text", pa.string()), ("date_time", pa.string())]
            ),
            project=microtwo_event_project,
        ),
        EventTableSpec(
            service="microtwo",
            kind="prediction",
            table_name="MICROTWO_PRED",
            validator=v[("microtwo", "prediction")],
            schema=pa.schema(
                _PRED_COMMON
                + [
                    ("transcript", pa.string()),
                    ("headline", pa.list_(pa.string())),
                    ("date_time", pa.string()),
                ]
            ),
            project=microtwo_pred_project,
        ),
        EventTableSpec(
            service="microthree",
            kind="event",
            table_name="MICROTHREE_EVENT",
            validator=v[("microthree", "event")],
            fixups=(media_fix, _fix_query_and_tags),
            schema=pa.schema(
                _EVAL_COMMON
                + [
                    ("payload_text", pa.string()),
                    ("payload_query", pa.list_(pa.string())),
                    ("payload_search_terms", pa.list_(pa.string())),
                    ("payload_media_id", pa.string()),
                    ("payload_media_type", pa.string()),
                    ("payload_medialib", pa.string()),
                    ("payload_search_match", pa.string()),
                    ("payload_tags", pa.list_(pa.string())),
                    ("payload_caption", pa.string()),
                    ("date_time", pa.string()),
                ]
            ),
            project=microthree_event_project,
        ),
        EventTableSpec(
            service="microthree",
            kind="prediction",
            table_name="MICROTHREE_PRED",
            validator=v[("microthree", "prediction")],
            schema=pa.schema(
                [
                    ("account", pa.string()),
                    ("id", pa.string()),
                    ("partition_key", pa.string()),
                    ("service", pa.string()),
                    ("service_version", _SERVICE_VERSION),
                    ("unix_timestamp", pa.int64()),
                    ("shape_id", pa.string()),
                    ("context", _CONTEXT),
                    ("paragraph", pa.string()),
                    ("scores", pa.list_(pa.float64())),
                    ("search_terms", pa.list_(pa.string())),
                    ("sentence", pa.string()),
                    ("date_time", pa.string()),
                ]
            ),
            project=microthree_pred_project,
        ),
    ]
