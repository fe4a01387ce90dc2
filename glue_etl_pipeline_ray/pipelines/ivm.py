"""Incremental materialized-view maintenance over a ReplayEngine lake.

A :class:`MaterializedView` keeps a grouped COUNT/SUM aggregate of the
live table current by folding the engine's change data feed
(``ReplayEngine.changes_dataset`` with update pre-images) instead of
re-aggregating the snapshot: each refresh costs O(rows changed since the
last refresh), never O(state) — the property that makes a 10^10-row lake
with a trickle of changes cheap to keep summarized.

Delta math (the classic counting algorithm for self-maintainable
aggregates): every change row carries a sign — ``insert`` /
``update_postimage`` add, ``delete`` / ``update_preimage`` retract — and
per group the view folds

- ``n_rows   += sign``                         (COUNT(*))
- ``sum_<c>  += sign * value``                 (SUM(c), null -> 0)
- ``nnz_<c>  += sign * (value IS NOT NULL)``   (non-null contribution count)

``nnz`` reproduces SQL's SUM-over-all-nulls-is-NULL semantics exactly:
the published sum is masked to null whenever ``nnz == 0``. Groups whose
``n_rows`` reaches 0 vanish from the view. An update that moves a row
between groups retracts from the old group and adds to the new one via
its pre/post pair. COUNT and integer SUM are exact; float SUM retraction
is exact in value but, like any incremental float fold, not
bit-reproducible against a fresh re-aggregation order.

Scale shape: the signed partial aggregate runs INSIDE each per-bucket
diff task (one chained Ray task per bucket, no extra shuffle — the feed
already shares the sink's bucket layout); the driver folds only
aggregate-sized partials (bounded by group cardinality, not data rows).
The view itself is assumed aggregate-sized — the standard materialized-
view contract; a view too big for one node would use the engine's
exchange to reduce the same partials, which this module does not need.

State is persisted per refresh under ``<lake>/_views/<name>/`` as one
parquet (written atomically) whose filename carries the batch watermark
it reflects, so a crashed or restarted process resumes from the last
durable view and refresh stays idempotent.

MIN/MAX are deliberately unsupported: they are not self-maintainable
under deletes (a retraction can expose a second-place value the view
never stored) — refusing them loudly beats silently wrong results.
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from glue_etl_pipeline_ray.stages.merge import CHANGE_TYPE_COL, write_atomic

_ADD_TYPES = ("insert", "update_postimage")
_RETRACT_TYPES = ("delete", "update_preimage")
_N_COL = "n_rows"


def _sum_col(c: str) -> str:
    return f"sum_{c}"


def _nnz_col(c: str) -> str:
    return f"__nnz_{c}"


def _sum_type(t: pa.DataType) -> pa.DataType:
    return pa.int64() if pa.types.is_integer(t) else pa.float64()


def signed_partial(
    changes: pa.Table, group_cols: list[str], sum_cols: list[str]
) -> pa.Table:
    """Signed per-group deltas for one slice of a change feed (the
    per-bucket kernel; also the full fold for a bootstrap feed).

    Requires a PRE-IMAGE feed (``update_preimages=True``): a plain
    ``update`` row is a post-image with no retraction partner, so
    folding it as either sign silently corrupts counts and sums —
    reject it loudly instead."""
    ct = changes[CHANGE_TYPE_COL]
    if changes.num_rows and not pc.all(
        pc.is_in(ct, value_set=pa.array(_ADD_TYPES + _RETRACT_TYPES))
    ).as_py():
        raise ValueError(
            "signed_partial needs a pre-image change feed "
            "(changes_dataset(..., update_preimages=True)); plain "
            "'update' rows cannot be folded as signed deltas"
        )
    sign = pc.if_else(
        pc.is_in(ct, value_set=pa.array(_ADD_TYPES)),
        pa.scalar(1, pa.int64()),
        pa.scalar(-1, pa.int64()),
    )
    missing_g = [c for c in group_cols if c not in changes.column_names]
    if missing_g:
        raise ValueError(
            f"group column(s) {missing_g} not in the table schema (yet): "
            "views can group only on present columns"
        )
    cols = {c: changes[c] for c in group_cols}
    cols[_N_COL] = sign
    for c in sum_cols:
        # a sum column that hasn't evolved into the schema yet is all-null
        # (zero contribution, zero non-null count) — so a view created
        # before the column appears folds correctly through the evolution
        v = (
            changes[c]
            if c in changes.column_names
            else pa.nulls(changes.num_rows, pa.int64())
        )
        st = _sum_type(v.type)
        cols[_sum_col(c)] = pc.multiply_checked(
            sign if st == pa.int64() else pc.cast(sign, st),
            pc.cast(pc.fill_null(v, 0), st),
        )
        cols[_nnz_col(c)] = pc.multiply_checked(
            sign, pc.cast(pc.is_valid(v), pa.int64())
        )
    flat = pa.table(cols)
    agg = flat.group_by(group_cols).aggregate(
        [(c, "sum") for c in flat.column_names if c not in group_cols]
    )
    return agg.rename_columns(
        [re.sub(r"_sum$", "", c) if c not in group_cols else c
         for c in agg.column_names]
    )


@ray.remote
def _partial_task(group_cols, sum_cols, changes: pa.Table) -> pa.Table:
    return signed_partial(changes, group_cols, sum_cols)


class MaterializedView:
    """A persisted grouped COUNT/SUM view kept current via the change
    data feed. ``refresh()`` folds only the changes since the view's own
    watermark; the first refresh bootstraps from the ``from_batch=-1``
    feed (the full snapshot as an insert stream, still per-bucket)."""

    def __init__(
        self,
        engine,
        name: str,
        group_cols: list[str] | tuple[str, ...],
        sum_cols: list[str] | tuple[str, ...] = (),
    ):
        if not re.fullmatch(r"[A-Za-z0-9_.-]+", name):
            raise ValueError(f"unsafe view name: {name!r}")
        bad = set(sum_cols) & set(group_cols)
        if bad:
            raise ValueError(f"columns both grouped and summed: {sorted(bad)}")
        self.engine = engine
        self.name = name
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.view_dir = os.path.join(engine.lake_dir, "_views", name)

    # ------------------------------------------------------- persistence
    def _state_files(self) -> list[tuple[int, str]]:
        out = []
        for p in glob.glob(os.path.join(self.view_dir, "view-v*.parquet")):
            m = re.search(r"view-v(-?\d+)\.parquet$", p)
            if m:
                out.append((int(m.group(1)), p))
        return sorted(out)

    @property
    def watermark(self) -> int:
        """Engine batch id this view reflects (-1 = never refreshed)."""
        files = self._state_files()
        return files[-1][0] if files else -1

    def _load_state(self) -> tuple[int, pa.Table | None]:
        files = self._state_files()
        if not files:
            return -1, None
        wm, path = files[-1]
        return wm, pq.read_table(path)

    # ----------------------------------------------------------- refresh
    def refresh(self) -> pa.Table:
        """Fold changes since the view watermark; persist; return the
        published view (group cols + n_rows + masked sums).

        A view that lagged past the engine's ``retain_batches`` window
        (or attached to an engine with no history) cannot get a change
        feed for the gap — instead of failing, it REBUILDS from the
        current snapshot (every live row folded as an insert, one
        distributed pass, O(state) once) and is incremental again from
        there. This is the documented consumer contract: sync within
        the window and pay O(changes); lag past it and pay one
        snapshot-sized resync, never a wrong answer."""
        target = self.engine.ckpt.watermark
        wm, state = self._load_state()
        if target <= wm:
            return self.table()
        # decide resync-vs-incremental up front: only the DRIVER-side
        # history gate inside _changes_refs may divert to a resync; the
        # remote partial execution stays outside the except so a genuine
        # data/aggregation bug (RayTaskError, ArrowInvalid overflow)
        # surfaces instead of silently becoming an O(state) rebuild
        try:
            refs = self.engine._changes_refs(wm, target, update_preimages=True)
        except (ValueError, NotImplementedError):
            refs = None
        if refs is not None:
            partials = ray.get(
                [_partial_task.remote(self.group_cols, self.sum_cols, r)
                 for r in refs]
            )
        else:
            state = None  # full resync: discard the stale fold
            from glue_etl_pipeline_ray.stages.merge import CHANGE_TYPE_COL

            gc, sc = self.group_cols, self.sum_cols

            def as_inserts(t: pa.Table) -> pa.Table:
                t = t.append_column(
                    CHANGE_TYPE_COL,
                    pa.array(["insert"] * t.num_rows, pa.string()),
                )
                return signed_partial(t, gc, sc)

            partials = ray.get(
                self.engine.final_dataset()
                .map_batches(as_inserts, batch_format="pyarrow", batch_size=None)
                .to_arrow_refs()
            )
        pieces = [p for p in partials if p.num_rows]
        if state is not None and state.num_rows:
            pieces.append(state)
        if pieces:
            comb = pa.concat_tables(pieces, promote_options="permissive")
            folded = comb.group_by(self.group_cols).aggregate(
                [(c, "sum") for c in comb.column_names
                 if c not in self.group_cols]
            )
            folded = folded.rename_columns(
                [re.sub(r"_sum$", "", c) if c not in self.group_cols else c
                 for c in folded.column_names]
            )
            folded = folded.filter(pc.not_equal(folded[_N_COL], 0))
            folded = folded.sort_by(
                [(c, "ascending") for c in self.group_cols]
            )
        else:
            folded = self._empty_state()
        os.makedirs(self.view_dir, exist_ok=True)
        write_atomic(
            os.path.join(self.view_dir, f"view-v{target:05d}.parquet"), folded
        )
        for v, path in self._state_files():
            if v < target:
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass
        return self.table()

    def _empty_state(self) -> pa.Table:
        sch = self.engine.spec.canonical_schema(
            self.engine.ckpt.evolved_as_of(max(self.engine.ckpt.watermark, 0))
            if self.engine.ckpt.watermark >= 0
            else ()
        )
        names = set(sch.names)
        fields = []
        for c in self.group_cols:
            if c not in names:
                raise ValueError(
                    f"group column {c!r} not in the table schema (yet): "
                    "views can group only on present columns"
                )
            fields.append(sch.field(c))
        fields.append(pa.field(_N_COL, pa.int64()))
        for c in self.sum_cols:
            # a sum column that hasn't evolved in yet folds as all-null
            # int64 (see signed_partial) — the empty state mirrors that
            # instead of crashing on a view created before the column
            st = _sum_type(sch.field(c).type) if c in names else pa.int64()
            fields.append(pa.field(_sum_col(c), st))
            fields.append(pa.field(_nnz_col(c), pa.int64()))
        return pa.schema(fields).empty_table()

    # ------------------------------------------------------------ output
    def table(self) -> pa.Table:
        """The published view: group cols + ``n_rows`` + one ``sum_<c>``
        per sum column, with SQL null semantics (sum over an all-null
        group is null). Aggregate-sized by contract."""
        _, state = self._load_state()
        if state is None:
            state = self._empty_state()
        out = {c: state[c] for c in self.group_cols}
        out[_N_COL] = state[_N_COL]
        for c in self.sum_cols:
            out[_sum_col(c)] = pc.if_else(
                pc.equal(state[_nnz_col(c)], 0),
                pa.nulls(state.num_rows, state[_sum_col(c)].type),
                state[_sum_col(c)],
            )
        return pa.table(out)
