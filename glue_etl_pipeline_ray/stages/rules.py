"""Nested document validation: the reference's Cerberus contract, self-contained.

The reference profiles every raw event envelope against per-(service,kind)
Cerberus schemas with ``allow_unknown=True`` (open-world: unknown fields
pass) before anything else touches it (``data_profiling.py:46-58``; schema
documents ``dependencies/*.json``). The rule subset those six schemas
actually use is: ``type`` (string/integer/float/boolean/dict/list),
``required``, ``nullable``, ``allowed``, ``schema`` (sub-document rules on
a dict, element rules on a list), ``anyof`` (alternative rule-sets) and
``anyof_schema`` (alternative sub-document schemas — the old/new envelope
version mechanism, e.g. ``dependencies/microone_event.json:59-187``).

:class:`DocValidator` implements exactly that subset with Cerberus's
semantics (verified bit-for-bit against the reference's committed golden
outputs in tests/test_reference_fixture_parity.py):

- a missing field only fails when ``required``;
- ``None`` passes iff ``nullable`` and short-circuits the other rules;
- type ``integer`` accepts any Integral, ``float`` accepts float AND
  Integral (Cerberus's documented widening), ``boolean`` only bool;
- ``allowed`` on a list value checks every element;
- an alternative set (``anyof``/``anyof_schema``) passes if at least one
  alternative validates.

This is per-event Python by necessity (events arrive as parsed JSON
dicts); the stage holding a compiled validator set is an actor-pool
``map_batches`` class so schemas are built once per worker (ST1 analog,
``data_profiling.py:141-144``). Columnar inputs use the vectorized
``stages/validate.py`` rules instead.
"""

from __future__ import annotations

from numbers import Integral

_TYPES = {
    "string": lambda v: isinstance(v, str),
    "integer": lambda v: isinstance(v, Integral),
    "float": lambda v: isinstance(v, (float, Integral)),
    "boolean": lambda v: isinstance(v, bool),
    "dict": lambda v: isinstance(v, dict),
    "list": lambda v: isinstance(v, list),
}


class DocValidator:
    """Validate nested dicts against a Cerberus-style schema document.

    ``validate(doc) -> (ok, errors)`` where ``errors`` is a list of
    dotted-path strings ("detail.evaluation.type: unallowed value X") —
    enough for dead-letter diagnostics without replicating Cerberus's
    nested error-dict shape.
    """

    __slots__ = ("schema", "allow_unknown")

    def __init__(self, schema: dict, allow_unknown: bool = True):
        self.schema = schema
        self.allow_unknown = allow_unknown

    # ------------------------------------------------------------- public
    def validate(self, doc) -> tuple[bool, list[str]]:
        errors: list[str] = []
        self._check_doc(doc, self.schema, "", errors)
        return (not errors, errors)

    def __call__(self, doc) -> bool:
        ok, _ = self.validate(doc)
        return ok

    # ------------------------------------------------------------ internal
    def _check_doc(self, doc, schema: dict, path: str, errors: list[str]) -> None:
        if not isinstance(doc, dict):
            errors.append(f"{path or '<root>'}: must be of dict type")
            return
        for fname, rules in schema.items():
            fpath = f"{path}.{fname}" if path else fname
            if fname not in doc:
                if rules.get("required", False):
                    errors.append(f"{fpath}: required field")
                continue
            self._check_value(doc[fname], rules, fpath, errors)
        if not self.allow_unknown:
            for k in doc:
                if k not in schema:
                    fpath = f"{path}.{k}" if path else k
                    errors.append(f"{fpath}: unknown field")

    def _check_value(self, value, rules: dict, path: str, errors: list[str]) -> None:
        if value is None:
            if not rules.get("nullable", False):
                errors.append(f"{path}: null value not allowed")
            return
        ty = rules.get("type")
        if ty is not None and not _TYPES[ty](value):
            errors.append(f"{path}: must be of {ty} type")
            return  # type failure short-circuits the value rules (Cerberus)
        allowed = rules.get("allowed")
        if allowed is not None:
            vals = value if isinstance(value, list) else [value]
            bad = [v for v in vals if v not in allowed]
            if bad:
                errors.append(f"{path}: unallowed value {bad[0]!r}")
        sub = rules.get("schema")
        if sub is not None:
            if isinstance(value, dict):
                self._check_doc(value, sub, path, errors)
            elif isinstance(value, list):
                for i, el in enumerate(value):
                    self._check_value(el, sub, f"{path}[{i}]", errors)
            else:
                errors.append(f"{path}: schema rule needs a dict or list value")
        anyof_schema = rules.get("anyof_schema")
        if anyof_schema is not None and not self._any_ok(
            value, [{"schema": s} for s in anyof_schema]
        ):
            errors.append(f"{path}: no anyof_schema alternative validated")
        anyof = rules.get("anyof")
        if anyof is not None and not self._any_ok(value, anyof):
            errors.append(f"{path}: no anyof alternative validated")

    def _any_ok(self, value, alternatives: list[dict]) -> bool:
        for alt in alternatives:
            errs: list[str] = []
            self._check_value(value, alt, "", errs)
            if not errs:
                return True
        return False
