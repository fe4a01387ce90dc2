"""Table specification: keys, schema, validation rules, partitioning.

The reference pipeline hard-codes its per-(service, type) contract in three
places (Cerberus schemas in ``dependencies/*.json``, fix-up functions in
``flat_jsons.py``, SQL projections in ``convert_to_parquet.py:58-159``).
Here the whole contract lives in one declarative ``TableSpec``; pipeline
stages are generic over it (SURVEY.md 2.10 "engine equivalent").
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# Arrow types the spec/schema-evolution registry may carry, as a
# JSON-serializable string grammar so the checkpoint manifest can
# round-trip them:  scalar | list<T> | struct<name:T,name2:T2>
# (nested arbitrarily — the reference's final schemas carry 2-deep
# list<struct<...list<...>>> columns, e.g. MICROONE_PRED
# ``output_metadata``, SURVEY.md 1.2).
_TYPE_BY_NAME: dict[str, pa.DataType] = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int64": pa.int64(),
    "int32": pa.int32(),
    "int16": pa.int16(),
    "int8": pa.int8(),
    "double": pa.float64(),
    "float": pa.float32(),
    "bool": pa.bool_(),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ms]": pa.timestamp("ms"),
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at angle-bracket depth 0."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def type_from_name(name: str) -> pa.DataType:
    name = name.strip()
    if name in _TYPE_BY_NAME:
        return _TYPE_BY_NAME[name]
    if name.startswith("list<") and name.endswith(">"):
        return pa.list_(type_from_name(name[5:-1]))
    if name.startswith("struct<") and name.endswith(">"):
        fields = []
        for part in _split_top(name[7:-1]):
            fname, _, ftype = part.partition(":")
            if not _ or not fname:
                raise ValueError(f"malformed struct field: {part!r}")
            fields.append(pa.field(fname.strip(), type_from_name(ftype)))
        return pa.struct(fields)
    raise ValueError(f"unsupported evolved-column type: {name}")


def type_name(dtype: pa.DataType) -> str:
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype):
        return f"list<{type_name(dtype.value_type)}>"
    if pa.types.is_struct(dtype):
        inner = ",".join(f"{f.name}:{type_name(f.type)}" for f in dtype)
        return f"struct<{inner}>"
    s = str(dtype)
    if s not in _TYPE_BY_NAME:
        raise ValueError(f"unsupported evolved-column type: {s}")
    return s


OPS = ("INSERT", "UPDATE", "DELETE")


@dataclass(frozen=True)
class Rule:
    """One vectorized validation rule over a change-event column.

    ``col`` may be a dotted path into nested struct columns
    (``meta.idx``) — resolved with vectorized ``pc.struct_field`` in the
    engine and a dict walk in the oracle (stages/validate._resolve_col).

    Declarative analog of a Cerberus schema entry
    (reference ``data_profiling.py:46-58`` + ``dependencies/*.json``):

    - ``kind="not_null"``     -> column must be non-null
    - ``kind="enum"``         -> non-null values must be in ``allowed``
    - ``kind="regex"``        -> non-null values must fully match ``pattern``
    - ``kind="range"``        -> non-null numeric values in [lo, hi]

    ``nullable_for_ops``: ops for which a null is accepted even under
    ``not_null`` (reference analog: DELETE events carry no payload,
    ``flat_jsons.py:77-78``).
    """

    col: str
    kind: str
    allowed: tuple = ()
    pattern: str = ""
    lo: float = float("-inf")
    hi: float = float("inf")
    nullable_for_ops: tuple[str, ...] = ()

    @property
    def error(self) -> str:
        return f"{self.kind}:{self.col}"


@dataclass(frozen=True)
class TableSpec:
    """Contract for one upserted lake table.

    key_cols  : primary key (reference analog: ``(repo, path)`` per
                BASELINE.json input_hint).
    seq_col   : total commit order; LWW tiebreaker (analog of the sorted
                file work-list, ``update_workflow_properties.py:146-150``).
    op_col    : INSERT/UPDATE/DELETE discriminator (analog of
                ``detail.type`` routing, ``flat_jsons.py:186-201``).
    batch_col : micro-batch id = checkpoint granularity (analog of the
                per-run ``event_files`` list).
    base_cols : non-key payload columns, name -> Arrow type name, in
                canonical output order.
    rules     : validation rules; a row failing any rule dead-letters.
    num_buckets: hash buckets for the keyed shuffle + sink files. One
                output file per bucket -> size this so ~100 MB-1 GB per
                bucket file at target scale (e.g. 2**16 buckets at 100 TB).
    """

    name: str
    key_cols: tuple[str, ...]
    base_cols: tuple[tuple[str, str], ...]
    seq_col: str = "seq"
    op_col: str = "op"
    batch_col: str = "batch_id"
    rules: tuple[Rule, ...] = ()
    num_buckets: int = 64
    extra_meta_cols: tuple[str, ...] = field(default=())  # carried to DLQ only
    # column-mapping schema evolution (Delta/Iceberg "column mapping"
    # analog): incoming batches whose source renamed a column keep
    # landing in ONE canonical lake column. (source_name, canonical)
    # pairs; applied before validation, so rules and keys see canonical
    # names. A canonical name must not itself be a rename source.
    renames: tuple[tuple[str, str], ...] = ()
    # columns the downstream has explicitly dropped: ingest ignores them
    # (never evolves them in) instead of growing the lake schema
    ignored_cols: tuple[str, ...] = ()
    # payload columns whose values are per-event-unique (commit shas,
    # event ids): caching replayers must never intern these — the cache
    # would retain every value ever applied, not just the live set
    unique_cols: tuple[str, ...] = ()

    @property
    def base_col_names(self) -> tuple[str, ...]:
        return tuple(n for n, _ in self.base_cols)

    @property
    def rename_map(self) -> dict[str, str]:
        """source -> canonical, validated: no chained renames (a
        canonical target must not itself be a rename source) and no
        renaming of the engine's own meta columns."""
        m = dict(self.renames)
        meta = {self.seq_col, self.op_col, self.batch_col}
        targets: dict[str, str] = {}
        for src, dst in m.items():
            if dst in m:
                raise ValueError(
                    f"chained rename {src!r} -> {dst!r} -> {m[dst]!r}"
                )
            if src in meta or dst in meta:
                raise ValueError(f"cannot rename meta column: {src}->{dst}")
            if dst in targets:
                raise ValueError(
                    f"two sources rename to {dst!r}: "
                    f"{targets[dst]!r} and {src!r}"
                )
            targets[dst] = src
        return m

    def base_type(self, name: str) -> pa.DataType:
        for n, t in self.base_cols:
            if n == name:
                return type_from_name(t)
        raise KeyError(name)

    def canonical_cols(self, evolved: tuple[tuple[str, str], ...] = ()) -> list[str]:
        """Key cols first, then base payload, then evolved in first-seen
        order (FIXTURES.md F5 canonical layout)."""
        return [*self.key_cols, *self.base_col_names, *(n for n, _ in evolved)]

    def canonical_schema(
        self, evolved: tuple[tuple[str, str], ...] = ()
    ) -> pa.Schema:
        fields = [pa.field(k, pa.string()) for k in self.key_cols]
        fields += [pa.field(n, type_from_name(t)) for n, t in self.base_cols]
        fields += [pa.field(n, type_from_name(t)) for n, t in evolved]
        return pa.schema(fields)


def repo_file_spec(num_buckets: int = 64) -> TableSpec:
    """The flagship table per BASELINE.json input_hint: a lake of
    source-code files keyed on (repo, path)."""
    return TableSpec(
        name="repo_files",
        key_cols=("repo", "path"),
        base_cols=(("commit", "string"), ("lang", "string"), ("content", "string")),
        rules=(
            Rule("repo", "not_null"),
            Rule("path", "not_null"),
            Rule("seq", "not_null"),
            Rule("op", "not_null"),
            Rule("op", "enum", allowed=OPS),
            Rule("commit", "not_null", nullable_for_ops=("DELETE",)),
            Rule("commit", "regex", pattern=r"[0-9a-f]{40}"),
            Rule(
                "lang",
                "enum",
                allowed=("py", "js", "java", "go", "rs", "md"),
            ),
            Rule("content", "not_null", nullable_for_ops=("DELETE",)),
        ),
        num_buckets=num_buckets,
        extra_meta_cols=("event_id", "ts"),
        unique_cols=("commit",),
    )
