"""Operator-coverage query pipelines over the driver testdata tables.

One function per operator family from SURVEY.md section 2 plus the
training-data operators (dedup / similarity / text / multimodal). Each
takes ``sf_dir`` and returns a Dataset / pyarrow Table whose column
NAMES and integer-exact values match the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` (aggregates are computed on integer cents
 / scaled ints so no float summation-order hashing risk).

Ray is initialised by the caller (driver/bench/tests) — nothing here
calls ``ray.init``.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from glue_etl_pipeline_ray.functions.agg import partial_groupby_sum
from glue_etl_pipeline_ray.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from glue_etl_pipeline_ray.functions.multimodal import FakeMediaDecoder, FrameSampler
from glue_etl_pipeline_ray.functions.similarity import (
    cosine_topk,
    embed_cosine_pairs,
    ivf_topk,
)
from glue_etl_pipeline_ray.functions.text import (
    LangId,
    md5_fingerprint,
    quality_stats,
    rolling_fingerprint,
    token_stats,
)
from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
from glue_etl_pipeline_ray.spec import Rule, TableSpec
from glue_etl_pipeline_ray.stages.evolve import conform
from glue_etl_pipeline_ray.stages.validate import make_flag_fn


def _t(sf_dir: str, name: str, columns: list[str] | None = None):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _cents(col, scale: int = 100) -> pa.ChunkedArray:
    return pc.cast(pc.round(pc.multiply(col, scale)), pa.int64())


# ======================================================== CDC core (events)

EVENT_ENUM = ("click", "view", "purchase", "signup")


def user_state_spec() -> TableSpec:
    """CDC view of the ``events`` stream: key=user_id, seq=event_id,
    op derived from event_type (signup->INSERT, error->DELETE,
    else UPDATE) — the M2/M5 service+type extraction analog."""
    return TableSpec(
        name="user_state",
        key_cols=("user_id",),
        base_cols=(("event_type", "string"), ("value_cents", "int64")),
        rules=(
            Rule("user_id", "not_null"),
            Rule("seq", "not_null"),
            Rule("op", "not_null"),
            Rule("op", "enum", allowed=("INSERT", "UPDATE", "DELETE")),
        ),
        num_buckets=16,
    )


def _events_as_cdc(
    sf_dir: str, out_dir: str, n_batches: int = 2, dirty_mod: int | None = None
) -> str:
    """Derive a change-event stream from the events table (Ray-side) and
    lay it out as per-batch parquet for the replayer."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])

    def to_cdc(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        op = pc.if_else(
            pc.equal(et, "error"),
            pa.nulls(t.num_rows, pa.string()).fill_null("DELETE"),
            pc.if_else(
                pc.equal(et, "signup"),
                pa.nulls(t.num_rows, pa.string()).fill_null("INSERT"),
                pa.nulls(t.num_rows, pa.string()).fill_null("UPDATE"),
            ),
        )
        eid = t["event_id"].to_numpy()
        vc = _cents(t["value"])
        if dirty_mod:
            # deterministic dirt: null payload on every dirty_mod-th
            # event (quarantined by the strict spec, recovered by redrive)
            vc = pc.if_else(
                pa.array(eid % dirty_mod == 0),
                pa.nulls(t.num_rows, pa.int64()),
                pc.cast(vc, pa.int64()),
            )
        return pa.table(
            {
                "seq": t["event_id"],
                "batch_id": pa.array(eid % n_batches, pa.int64()),
                "op": op,
                "user_id": pc.cast(t["user_id"], pa.string()),
                "event_type": et,
                "value_cents": vc,
            }
        )

    staged = os.path.join(out_dir, "staged")
    ds.map_batches(to_cdc, batch_format="pyarrow", batch_size=None).write_parquet(
        staged, partition_cols=["batch_id"]
    )
    ev_dir = os.path.join(out_dir, "events")
    os.makedirs(ev_dir, exist_ok=True)
    for d in os.listdir(staged):  # hive dirs batch_id=N -> batch=NNNNN
        if d.startswith("batch_id="):
            b = int(d.split("=")[1])
            os.rename(
                os.path.join(staged, d), os.path.join(ev_dir, f"batch={b:05d}")
            )
    return ev_dir


def q_cdc_lww_upsert(sf_dir: str) -> pa.Table:
    """Flagship: full replay of the derived change stream -> live table."""
    work = tempfile.mkdtemp(prefix="gepr_cdc_")
    ev_dir = _events_as_cdc(sf_dir, work)
    eng = ReplayEngine(user_state_spec(), os.path.join(work, "lake"))
    eng.replay(ev_dir)
    return eng.final_table()


def q_cdc_pruned_scan(sf_dir: str):
    """Projection-pushdown scan of the LWW lake: replay the change
    stream, then read ONLY (user_id, event_type) — the payload column
    never leaves the Parquet files (final_dataset(columns=...), 24.5%
    of bytes measured on the 10^9 lake). Gate: pytest (hash-exact vs
    the DuckDB LWW window query projected to the same two columns,
    tests/test_cdc_pruned_scan_query.py)."""
    work = tempfile.mkdtemp(prefix="gepr_cdc_ps_")
    ev_dir = _events_as_cdc(sf_dir, work)
    eng = ReplayEngine(user_state_spec(), os.path.join(work, "lake"))
    eng.replay(ev_dir)
    return eng.final_dataset(columns=["user_id", "event_type"])


def q_cdc_change_feed(sf_dir: str) -> pa.Table:
    """Change data feed (Delta-Lake ``table_changes`` analog): replay the
    derived 4-batch change stream with history retained, then emit the
    NET insert/update/delete set between the batch-1 and batch-3
    snapshots. Shuffle-free: both snapshots share the sink's bucket
    layout, one diff task per bucket (stages/merge.py snapshot_diff)."""
    work = tempfile.mkdtemp(prefix="gepr_cdf_")
    ev_dir = _events_as_cdc(sf_dir, work, n_batches=4)
    eng = ReplayEngine(
        user_state_spec(), os.path.join(work, "lake"), gc_old_versions=False
    )
    eng.replay(ev_dir)
    feed = eng.changes_table(1, 3)
    return feed.rename_columns(
        [c if c != "_change_type" else "change_type" for c in feed.schema.names]
    )


def q_cdc_incremental_view(sf_dir: str) -> pa.Table:
    """Incremental materialized-view maintenance: bootstrap a grouped
    COUNT/SUM view from the batch-1 snapshot, replay two more batches,
    then REFRESH it by folding only the change data feed (pre/post-image
    pairs) — the view never re-reads the final snapshot, yet must equal
    an aggregate computed directly over it (pipelines/ivm.py)."""
    from glue_etl_pipeline_ray.pipelines.ivm import MaterializedView

    work = tempfile.mkdtemp(prefix="gepr_ivm_")
    ev_dir = _events_as_cdc(sf_dir, work, n_batches=4)
    eng = ReplayEngine(
        user_state_spec(), os.path.join(work, "lake"), gc_old_versions=False
    )
    eng.replay(ev_dir, max_batches=2)
    view = MaterializedView(
        eng, "by_type", ["event_type"], sum_cols=["value_cents"]
    )
    view.refresh()  # bootstrap at watermark 1
    eng.replay(ev_dir)  # batches 2-3
    return view.refresh()  # incremental fold of changes(1, 3) only


def q_cdc_replicate(sf_dir: str) -> pa.Table:
    """CDF-driven downstream sync: replay the derived change stream into
    a source lake in two stages, replicating the NET changes into a
    second lake (different bucket count) after each stage via the change
    feed only. The replica's live table must equal the LWW snapshot —
    i.e. the feed is a complete delta (pipelines/replicate.py)."""
    from glue_etl_pipeline_ray.pipelines.replicate import replicate

    work = tempfile.mkdtemp(prefix="gepr_repl_")
    ev_dir = _events_as_cdc(sf_dir, work, n_batches=4)
    src = ReplayEngine(
        user_state_spec(), os.path.join(work, "src"), gc_old_versions=False
    )
    import dataclasses

    dst_spec = dataclasses.replace(user_state_spec(), num_buckets=8)
    dst = ReplayEngine(dst_spec, os.path.join(work, "dst"))
    staging = os.path.join(work, "staging")
    src.replay(ev_dir, max_batches=2)
    replicate(src, dst, staging)
    src.replay(ev_dir)
    replicate(src, dst, staging)
    return dst.final_table()


def q_cdc_dead_letter(sf_dir: str):
    """Dead-letter routing as a query: rows failing the event rules, with
    the engine's error strings (M3/M4 analog, fixing B2: nothing drops)."""
    spec = TableSpec(
        name="events_quality",
        key_cols=("event_id",),
        base_cols=(),
        rules=(
            Rule("event_type", "enum", allowed=EVENT_ENUM),
            Rule("value", "range", lo=0.0, hi=90.0),
        ),
    )
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])
    flagged = ds.map_batches(
        make_flag_fn(spec), batch_format="pyarrow", batch_size=None
    )
    return flagged.select_columns(["event_id", "error"])


def q_event_audit(sf_dir: str):
    """Per-event audit stream (M14, the round-2 gap): one record per
    event — PASS or FAIL — with the joined error string, the analog of
    the reference's PROFILER line per event
    (``data_profiling.py:180-189``: ``EventId|HasPassed|...|Errors``,
    parsed into ES docs by ``process_logs.py:140-190``). Same vectorized
    rule kernel as the dead-letter query, ``invalid_only=False`` so
    clean events get audit rows too. Zero shuffle."""
    spec = TableSpec(
        name="events_audit",
        key_cols=("event_id",),
        base_cols=(),
        rules=(
            Rule("event_type", "enum", allowed=EVENT_ENUM),
            Rule("value", "range", lo=0.0, hi=90.0),
        ),
    )
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])
    audited = ds.map_batches(
        make_flag_fn(spec, invalid_only=False),
        batch_format="pyarrow",
        batch_size=None,
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "passed": pc.cast(pc.is_null(t["error"]), pa.int64()),
                "error": pc.fill_null(t["error"], ""),
            }
        )

    return audited.map_batches(fmt, batch_format="pyarrow", batch_size=None)


# ============================================= flatten / project / normalize


def q_flatten_project_json(sf_dir: str):
    """M12 analog: project a nested (JSON) field to a flat typed column,
    vectorized regex extraction — no Python JSON loop."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "props"])

    def flatten(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"], "k": k}
        )

    return ds.map_batches(flatten, batch_format="pyarrow", batch_size=None)


def q_partition_derive(sf_dir: str):
    """M13 analog: year/month/day/hour partition columns + counts."""
    ds = _t(sf_dir, "events", ["ts"])

    def derive(t: pa.Table) -> pa.Table:
        ts = t["ts"]
        return pa.table(
            {
                "year": pc.cast(pc.year(ts), pa.int64()),
                "month": pc.cast(pc.month(ts), pa.int64()),
                "day": pc.cast(pc.day(ts), pa.int64()),
                "hour": pc.cast(pc.hour(ts), pa.int64()),
            }
        )

    derived = ds.map_batches(derive, batch_format="pyarrow", batch_size=None)
    return partial_groupby_sum(
        derived, ["year", "month", "day", "hour"], [], count_alias="n_events"
    )


def q_type_normalize(sf_dir: str):
    """M6/M7 analog: float->int-cents recast + case normalization."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type_uc": pc.utf8_upper(t["event_type"]),
                "value_cents": _cents(t["value"]),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=None)


def q_schema_union_backfill(sf_dir: str):
    """M8/M9 analog: union of two differently-shaped projections with the
    evolve stage null-backfilling the missing column."""
    cutoff = pa.scalar(np.datetime64("2024-02-01T00:00:00", "us"))
    target = pa.schema(
        [("event_id", pa.int64()), ("value_cents", pa.int64()), ("extra", pa.string())]
    )
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value", "ts"])

    def old_shape(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["ts"], cutoff))
        out = pa.table({"event_id": t["event_id"], "value_cents": _cents(t["value"])})
        return conform(out, target)  # extra backfilled null

    def new_shape(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["ts"], cutoff))
        out = pa.table(
            {
                "event_id": t["event_id"],
                "value_cents": _cents(t["value"]),
                "extra": t["event_type"],
            }
        )
        return conform(out, target)

    old = ds.map_batches(old_shape, batch_format="pyarrow", batch_size=None)
    new = ds.map_batches(new_shape, batch_format="pyarrow", batch_size=None)
    return old.union(new)


# ============================================================ joins / anti


def broadcast_lookup(
    ds, key_col: str, lut_keys: pa.Array, lut_values: pa.Array,
    out_col: str, fallback: str = "null",
):
    """J1 analog (``flat_jsons.py:156-174``): broadcast small-side lookup
    as a zero-shuffle map stage. The (keys, values) arrays ship ONCE via
    ``ray.put``; each batch does one vectorized ``pc.index_in`` + ``take``
    — no per-row Python. ``fallback`` (left-outer semantics on a miss,
    like the reference keeping the raw media id): "null" -> null,
    "key" -> the stringified probe key."""
    ref = ray.put((lut_keys, lut_values))

    def lookup(t: pa.Table) -> pa.Table:
        keys, values = ray.get(ref)
        idx = pc.index_in(t[key_col], keys)  # null where missing
        out = pc.take(values, idx)
        if fallback == "key":
            out = pc.if_else(
                pc.is_null(idx), pc.cast(t[key_col], pa.string()), out
            )
        return t.append_column(out_col, out)

    return ds.map_batches(lookup, batch_format="pyarrow", batch_size=None)


def q_broadcast_lookup_join(sf_dir: str):
    """Two-hop dimension lookup (nation->region) broadcast once, O(1)
    vectorized lookups per batch, zero shuffle on the fact side; only the
    tiny (region, count) partials shuffle."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    # compose nation->region on the driver (both dims are tiny)
    ridx = pc.index_in(nation["n_regionkey"], region["r_regionkey"])
    keys = nation["n_nationkey"].combine_chunks()
    values = pc.take(region["r_name"].combine_chunks(), ridx)
    ds = broadcast_lookup(
        _t(sf_dir, "customer", ["c_nationkey"]),
        "c_nationkey", keys, values, "region_name",
    ).select_columns(["region_name"])
    return partial_groupby_sum(ds, ["region_name"], [], count_alias="n_customers")


def _anti_join_plan(sf_dir: str, use_bloom: bool):
    """Two exact anti-join plans (customers with no event activity):

    - **direct**: two-sided hash-partitioned anti-join — both sides
      shuffle once on the key, each partition task drops probe keys that
      saw any build row. No driver-side key collection (round 1
      broadcast a driver-collected key set).
    - **bloom**: the build side is first compressed into a ~KB Bloom
      filter (per-block partials OR-merged, ``functions/bloom.py``) and
      broadcast; probe rows the filter rules out are *definitely*
      inactive (no false negatives) and stream straight to the output
      with ZERO shuffle; only the "maybe active" residual —
      |build-distinct| + fp x |probe| rows — goes through the direct
      plan. Worth its extra build pass once the probe side dwarfs the
      build side (the 100 TB shape); at small scale direct wins.
    """
    from glue_etl_pipeline_ray.functions.groups import grouped_apply
    from glue_etl_pipeline_ray.hashing import key_hash_u64

    def tag(ds, col: str, side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "c_custkey": pc.cast(t[col], pa.int64()),
                    "__side": pa.array(
                        np.full(t.num_rows, side, np.int8), pa.int8()
                    ),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow", batch_size=None)

    def anti(group: pa.Table) -> pa.Table:
        side = group["__side"]
        if pc.min(side).as_py() == 0:  # any build row -> key is active
            return group.slice(0, 0).select(["c_custkey"])
        return group.select(["c_custkey"])

    build = tag(_t(sf_dir, "events", ["user_id"]), "user_id", 0)
    probe = _t(sf_dir, "customer", ["c_custkey"])
    if not use_bloom:
        return grouped_apply(
            build.union(tag(probe, "c_custkey", 1)), ["c_custkey"], anti
        )

    from glue_etl_pipeline_ray.functions.bloom import bloom_from_dataset

    n_build = pq.ParquetFile(
        os.path.join(sf_dir, "events.parquet")
    ).metadata.num_rows
    bloom = bloom_from_dataset(
        _t(sf_dir, "events", ["user_id"]), ["user_id"],
        expected_items=n_build, fp_rate=0.01,
    )
    bref = ray.put(bloom)

    def split(maybe_side: bool):
        def f(t: pa.Table) -> pa.Table:
            bl = ray.get(bref)
            keys = pc.cast(t["c_custkey"], pa.int64())
            maybe = bl.contains_hashes(key_hash_u64(keys))
            mask = pa.array(maybe if maybe_side else ~maybe)
            return pa.table({"c_custkey": keys.filter(mask)})

        return f

    definite = probe.map_batches(split(False), batch_format="pyarrow",
                                 batch_size=None)
    residual = probe.map_batches(split(True), batch_format="pyarrow",
                                 batch_size=None).map_batches(
        lambda t: t.append_column(
            "__side", pa.array(np.ones(t.num_rows, np.int8), pa.int8())
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    exact_residual = grouped_apply(build.union(residual), ["c_custkey"], anti)
    return definite.union(exact_residual)


def q_anti_join_inactive(sf_dir: str):
    """Stats-based plan choice (parquet metadata only): the Bloom
    prefilter pays for its extra build pass when the probe side is much
    larger than the build side; otherwise the single-shuffle direct plan
    wins. Both plans are exact and both stay oracle-gated
    (``anti_join_bloom`` forces the bloom plan)."""
    meta = lambda t: pq.ParquetFile(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet")
    ).metadata.num_rows
    use_bloom = meta("customer") > 4 * meta("events")
    return _anti_join_plan(sf_dir, use_bloom=use_bloom)


def q_anti_join_bloom(sf_dir: str):
    return _anti_join_plan(sf_dir, use_bloom=True)


# ========================================================== aggregations


def q_classify_counts(sf_dir: str):
    """M5/A1/A2 analog: demux counts per event class."""
    ds = _t(sf_dir, "events", ["event_type"])
    return partial_groupby_sum(ds, ["event_type"], [], count_alias="n")


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with per-block combining.
    All measures are scaled integers (cents / basis points) so the
    engine and the SQL oracle agree bit-for-bit."""
    ds = _t(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-01T00:00:00", "us"))

    def measures(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        qty = _cents(t["l_quantity"])
        price = _cents(t["l_extendedprice"])
        disc = _cents(t["l_discount"])
        tax = _cents(t["l_tax"])
        disc_e4 = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()), disc))
        charge_e6 = pc.multiply(disc_e4, pc.add(pa.scalar(100, pa.int64()), tax))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty_x100": qty,
                "sum_base_cents": price,
                "sum_disc_e4": disc_e4,
                "sum_charge_e6": charge_e6,
            }
        )

    m = ds.map_batches(measures, batch_format="pyarrow", batch_size=None)
    return partial_groupby_sum(
        m,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty_x100", "sum_base_cents", "sum_disc_e4", "sum_charge_e6"],
        count_alias="count_order",
    )


def q_topk_users(sf_dir: str):
    """O-class analog: top-10 users by total spend, deterministic
    tie-break by user_id."""
    ds = _t(sf_dir, "events", ["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "total_cents": _cents(t["value"])})

    totals = partial_groupby_sum(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        ["total_cents"],
    )
    return totals.sort(["total_cents", "user_id"], descending=[True, False]).limit(10)


# ==================================================== documents / text ops


def q_dedup_exact(sf_dir: str):
    return exact_dedup(_t(sf_dir, "documents"))


def q_dedup_segments(sf_dir: str):
    """Sub-document exact dedup with span removal (ExactSubstr's cut
    step at 16-token-segment granularity): corpus-wide first occurrence
    of every distinct segment survives, documents reassemble from their
    surviving segments. Gate: pytest (hash-exact vs a DuckDB
    unnest/row_number/string_agg oracle, tests/test_segment_dedup.py)."""
    from glue_etl_pipeline_ray.functions.dedup import segment_dedup

    return segment_dedup(
        _t(sf_dir, "documents", ["doc_id", "text"]), seg_tokens=16
    )


def q_doc_fingerprint(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        md5_fingerprint, batch_format="pyarrow", batch_size=None
    ).select_columns(["doc_id", "fp"])


def q_token_stats(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        token_stats, batch_format="pyarrow", batch_size=None
    ).select_columns(["doc_id", "n_tokens", "n_uniq_tokens"])


def q_quality(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        quality_stats, batch_format="pyarrow", batch_size=None
    ).select_columns(["doc_id", "n_tokens", "n_stopwords", "is_quality"])


def q_lang_id(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        LangId,
        batch_format="pyarrow",
        batch_size=256,  # split the single input block across the pool
        concurrency=(1, 4),
    ).select_columns(["doc_id", "pred_lang"])


def q_rolling_fingerprint(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        rolling_fingerprint, batch_format="pyarrow", batch_size=None
    ).select_columns(["doc_id", "rolling_fp"])


def q_dedup_ngram_jaccard(sf_dir: str):
    return ngram_jaccard_pairs(
        _t(sf_dir, "documents", ["doc_id", "text"]), tau_num=4, tau_den=5
    )


def q_dedup_minhash(sf_dir: str):
    return minhash_lsh_pairs(_t(sf_dir, "documents", ["doc_id", "text"]))


def q_dedup_simhash(sf_dir: str):
    return simhash_pairs(_t(sf_dir, "documents", ["doc_id", "text"]))


# ============================================================= embeddings


def _query_vectors(sf_dir: str, n: int = 5):
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    t = t.filter(pc.less(t["vec_id"], n)).sort_by("vec_id")
    mat = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
    return mat, t["vec_id"].to_pylist()


def q_ann_cosine_topk(sf_dir: str):
    q, ids = _query_vectors(sf_dir)
    return cosine_topk(_t(sf_dir, "embeddings", ["vec_id", "embedding"]), q, ids, k=10)


def q_ann_ivf_topk(sf_dir: str):
    q, ids = _query_vectors(sf_dir)
    return ivf_topk(_t(sf_dir, "embeddings", ["vec_id", "embedding"]), q, ids, k=10)


# ============================================================ multimodal


def q_media_decode(sf_dir: str):
    """Binary-column decode plumbing (stubbed codec): documents text ->
    opaque payload bytes -> actor-pool decode -> typed metadata."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_binary(t: pa.Table) -> pa.Table:
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            }
        )

    binary = ds.map_batches(to_binary, batch_format="pyarrow", batch_size=None)
    decoded = binary.map_batches(
        FakeMediaDecoder,
        batch_format="pyarrow",
        batch_size=256,  # binary payloads dominate memory: small batches
        concurrency=(1, 8),
    )
    return decoded.select_columns(
        ["doc_id", "n_bytes", "width", "height", "content_digest"]
    )


def synth_png_payloads(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic PNG fixture per row: a seeded-noise RGB image whose
    shape/content derive from the row id (same discipline as the
    driver's synthetic tables — no external data), REAL-encoded via
    functions/png.py. Every 97th payload is corrupted to exercise the
    decode dead-letter path."""
    from glue_etl_pipeline_ray.functions.png import png_encode

    payloads = []
    for did in t[id_col].to_pylist():
        rng = np.random.default_rng(did)
        h, w = 8 + did % 9, 8 + (did // 3) % 9
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = png_encode(arr)
        if did % 97 == 0:
            p = p[: len(p) // 2]  # truncated -> decode error
        payloads.append(p)
    return pa.table(
        {id_col: t[id_col], "payload": pa.array(payloads, pa.binary())}
    )


def q_media_decode_real(sf_dir: str):
    """REAL codec path (no stub): PNG payloads decoded by the native
    decoder (zlib inflate + scanline defilter), emitting actual pixel
    statistics; corrupt payloads land in the ``error`` column instead of
    killing the run."""
    from glue_etl_pipeline_ray.functions.multimodal import PngDecoder

    ds = _t(sf_dir, "documents", ["doc_id"])
    binary = ds.map_batches(
        synth_png_payloads, batch_format="pyarrow", batch_size=256
    )
    return binary.map_batches(
        PngDecoder, batch_format="pyarrow", batch_size=128, concurrency=(1, 8)
    )


def synth_video_payloads(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic multi-frame 'video' per row: 2-5 seeded-noise PNG
    frames concatenated back-to-back."""
    from glue_etl_pipeline_ray.functions.png import png_encode

    payloads = []
    for did in t[id_col].to_pylist():
        rng = np.random.default_rng(did + 1_000_000)
        n_frames = 2 + did % 4
        payloads.append(
            b"".join(
                png_encode(rng.integers(0, 256, (6, 6, 3), dtype=np.uint8))
                for _ in range(n_frames)
            )
        )
    return pa.table(
        {id_col: t[id_col], "payload": pa.array(payloads, pa.binary())}
    )


def q_frame_sample_real(sf_dir: str):
    """REAL frame sampling + decode chain: multi-PNG payloads split on
    container boundaries (every 2nd frame kept), each sampled frame
    decoded natively to pixel stats — the video keyframe-extract ->
    feature-extract pipeline with a working codec."""
    from glue_etl_pipeline_ray.functions.multimodal import (
        PngDecoder,
        PngFrameSampler,
    )

    ds = _t(sf_dir, "documents", ["doc_id"])
    # chained actor pools autoscale from 1 so the two stages + the
    # upstream read tasks can't reserve every CPU of a small cluster
    # (fixed pools of 2+2 deadlock a 4-cpu test session)
    frames = ds.map_batches(
        synth_video_payloads, batch_format="pyarrow", batch_size=256
    ).map_batches(
        PngFrameSampler,
        fn_constructor_kwargs=dict(stride=2),
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 8),
    )
    return frames.map_batches(
        PngDecoder, batch_format="pyarrow", batch_size=128, concurrency=(1, 8)
    )


def q_media_embed_real(sf_dir: str):
    """REAL decode -> feature-extraction chain: PNG payloads decoded
    natively, RGB-histogram embeddings emitted as ``list<float>`` —
    the shape a batched GPU model stage has, with a working codec and a
    pixel-level pytest oracle (corrupt payloads carry error instead of
    killing the task)."""
    from glue_etl_pipeline_ray.functions.multimodal import PngHistogramEmbedder

    ds = _t(sf_dir, "documents", ["doc_id"])
    binary = ds.map_batches(
        synth_png_payloads, batch_format="pyarrow", batch_size=256
    )
    return binary.map_batches(
        PngHistogramEmbedder, batch_format="pyarrow", batch_size=128,
        concurrency=(1, 8),
    )


def q_frame_sample(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_binary(t: pa.Table) -> pa.Table:
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    frames = ds.map_batches(
        to_binary, batch_format="pyarrow", batch_size=None
    ).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def meta(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "frame_idx": t["frame_idx"],
                "frame_bytes_len": pc.cast(
                    pc.binary_length(t["frame_bytes"]), pa.int64()
                ),
            }
        )

    return frames.map_batches(meta, batch_format="pyarrow", batch_size=None)


def q_dedup_embed_cosine(sf_dir: str):
    """Embedding-cosine near-dup pairs, exact brute-force baseline
    (block x broadcast-corpus matmul)."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embed_cosine_pairs(ds, threshold=0.5, method="brute")


def q_dedup_embed_lsh(sf_dir: str):
    """Embedding-cosine near-dup pairs via banded hyperplane LSH —
    the sub-quadratic 100 TB path (recall < 1 by construction)."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embed_cosine_pairs(ds, threshold=0.5, method="lsh")


def promote_union_column(values: list) -> pa.ListArray:
    """M10 kernel (``flat_jsons.py:113-136``): union-typed values
    (list | scalar string | literal "null" | None) -> canonical
    ``list<string>``: "null"/None -> [], scalar -> [scalar]."""
    promoted = [
        []
        if v is None or v == "null"
        else (v if isinstance(v, list) else [v])
        for v in values
    ]
    return pa.array(promoted, pa.list_(pa.string()))


def q_str_list_promote(sf_dir: str):
    """M10 analog over a REAL union-typed JSON value: each event's
    ``props`` JSON is parsed (genuinely — ``json.loads`` per row, the
    only faithful decode for a union-typed field) and its ``k`` value is
    re-shaped into the reference's wire forms (list / bare scalar /
    literal "null"), then promoted by the generic kernel. The wire SHAPE
    is selected by the first hex digit of ``md5(props)`` — a content
    hash each side computes independently (hashlib here, DuckDB ``md5``
    in the oracle), so the oracle's CASE cannot share the synthesis
    arithmetic; it states the contract over the raw column."""
    import hashlib
    import json

    ds = _t(sf_dir, "events", ["event_id", "props"])

    def promote(t: pa.Table) -> pa.Table:
        props = t["props"].to_pylist()
        ks = [json.loads(p)["k"] for p in props]
        # the union-typed wire value, as the reference receives it
        # (flat_jsons.py:113-136: query may arrive as list, scalar string,
        # or the literal string "null"); shape chosen by content hash
        sels = [
            int(hashlib.md5(p.encode()).hexdigest()[0], 16) % 3 for p in props
        ]
        raw = [
            [f"k{k}", "x"] if s == 0 else (f"k{k}" if s == 1 else "null")
            for k, s in zip(ks, sels)
        ]
        tags = promote_union_column(raw)
        return pa.table(
            {
                "event_id": t["event_id"],
                "n_tags": pc.cast(pc.list_value_length(tags), pa.int64()),
                "tags_joined": pc.binary_join(tags, ","),
            }
        )

    return ds.map_batches(promote, batch_format="pyarrow", batch_size=None)


def q_nested_project(sf_dir: str):
    """M12/nested-types gate: build genuine nested columns (a
    ``struct<k,type>`` and a ``list<struct<k,v_cents>>``) from the raw
    rows with vectorized Arrow constructors, then project fields back
    OUT of them with ``pc.struct_field`` / ``pc.list_flatten`` — proving
    the engine round-trips nested values, while the output stays flat
    for the hash-exact oracle comparison."""
    import json

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value", "props"])

    def build_and_project(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ks = pa.array(
            [json.loads(p)["k"] for p in t["props"].to_pylist()], pa.int64()
        )
        meta = pa.StructArray.from_arrays(
            [ks, t["event_type"].combine_chunks()], names=["k", "type"]
        )
        pair = pa.StructArray.from_arrays(
            [ks, _cents(t["value"]).combine_chunks()], names=["k", "v_cents"]
        )
        pairs = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32)), pair
        )
        # project back out of the nested intermediates
        return pa.table(
            {
                "event_id": t["event_id"],
                "prop_k": pc.struct_field(meta, "k"),
                "meta_type": pc.struct_field(meta, "type"),
                "first_v_cents": pc.struct_field(pc.list_flatten(pairs), "v_cents"),
            }
        )

    return ds.map_batches(build_and_project, batch_format="pyarrow",
                          batch_size=None)


def q_partitioned_write(sf_dir: str):
    """S7 analog (``convert_to_parquet.py:224,236-238``): derive
    year/month/day, write hive-partitioned Parquet, then PROVE the
    round-trip by re-reading the partitioned lake and counting per
    partition (partition values come back from directory names)."""
    import shutil as _shutil

    ds = _t(sf_dir, "events", ["event_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        ts = t["ts"]
        return pa.table(
            {
                "event_id": t["event_id"],
                "year": pc.cast(pc.year(ts), pa.int64()),
                "month": pc.cast(pc.month(ts), pa.int64()),
                "day": pc.cast(pc.day(ts), pa.int64()),
            }
        )

    out_dir = tempfile.mkdtemp(prefix="gepr_partwrite_")
    try:
        ds.map_batches(derive, batch_format="pyarrow", batch_size=None).write_parquet(
            out_dir, partition_cols=["year", "month", "day"]
        )
        back = rd.read_parquet(out_dir)

        def cast_parts(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "year": pc.cast(t["year"], pa.int64()),
                    "month": pc.cast(t["month"], pa.int64()),
                    "day": pc.cast(t["day"], pa.int64()),
                }
            )

        casted = back.map_batches(cast_parts, batch_format="pyarrow", batch_size=None)
        result = partial_groupby_sum(
            casted, ["year", "month", "day"], [], count_alias="n_events"
        )
        # materialize before deleting the temp lake (skip the empty
        # zero-column blocks Ray emits for key-less partitions)
        import pyarrow as _pa

        parts = [ray.get(r) for r in result.to_arrow_refs()]
        parts = [t for t in parts if t.num_columns > 0]
        return _pa.concat_tables(parts)
    finally:
        _shutil.rmtree(out_dir, ignore_errors=True)


def q_tumbling_window(sf_dir: str):
    """Streaming-style tumbling window (1h) aggregate per event_type:
    window derivation is a stateless map (M13 generalization), the
    aggregate pre-combines per block before one small shuffle."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        # cast to second precision: arrow strftime's %S emits fractional
        # digits for us-precision timestamps, duckdb's does not
        w = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.timestamp("s"))
        return pa.table(
            {
                "window_start": pc.strftime(w, format="%Y-%m-%d %H:%M:%S"),
                "event_type": t["event_type"],
                "value_cents": _cents(t["value"]),
            }
        )

    derived = ds.map_batches(derive, batch_format="pyarrow", batch_size=None)
    return partial_groupby_sum(
        derived,
        ["window_start", "event_type"],
        ["value_cents"],
        count_alias="n_events",
    )


def q_session_windows(sf_dir: str):
    """Gap-based session windows (30 min) per user — genuinely stateful
    ordered-window semantics: one shuffle on user_id, then fully
    vectorized per-user session assignment (sort by ts, split where the
    gap exceeds the timeout, aggregate per session)."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    gap_us = 30 * 60 * 1_000_000
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def sessions(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        ts = group["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        tsv = ts[order].astype(np.int64)
        cents = (
            np.round(group["value"].to_numpy(zero_copy_only=False) * 100)
            .astype(np.int64)[order]
        )
        brk = np.r_[True, np.diff(tsv) > gap_us]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(tsv)]
        uid = group["user_id"][0].as_py()
        start_strs = [
            str(np.datetime64(int(tsv[s]), "us")).replace("T", " ")
            for s in starts
        ]
        return pa.table(
            {
                "user_id": pa.array([uid] * len(starts), pa.int64()),
                "session_start": pa.array(start_strs, pa.string()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "sum_cents": pa.array(
                    np.add.reduceat(cents, starts), pa.int64()
                ),
            }
        )

    return grouped_apply(ds, ["user_id"], sessions)


def q_asof_prev_order(sf_dir: str):
    """As-of join (operator Ray Data lacks): for every order, the date of
    the customer's most recent STRICTLY earlier order (null for the
    first). One hash shuffle on the key + vectorized searchsorted per
    group — see functions/joins.py for the partitioning assumption."""
    from glue_etl_pipeline_ray.functions.joins import asof_join_backward

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders_r = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    joined = asof_join_backward(
        orders,
        orders_r,
        by="o_custkey",
        on="o_orderdate",
        left_cols=["o_orderkey"],
        right_value_col="o_orderdate",
        out_col="prev_ts",
    )

    def fmt(t: pa.Table) -> pa.Table:
        prev = pc.strftime(pc.cast(t["prev_ts"], pa.timestamp("s")), format="%Y-%m-%d")
        return pa.table({"o_orderkey": t["o_orderkey"], "prev_order_date": prev})

    return joined.map_batches(fmt, batch_format="pyarrow", batch_size=None)


def q_asof_prev_order_sharded(sf_dir: str):
    """Range-sharded as-of join — the mega-key path (no per-key
    fits-one-task assumption): rows group by (key, ~90-day shard) and a
    carry-in table of per-shard right maxima resolves cross-shard
    matches. Same oracle as the unsharded variant."""
    from glue_etl_pipeline_ray.functions.joins import asof_join_backward_sharded

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders_r = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    joined = asof_join_backward_sharded(
        orders,
        orders_r,
        by="o_custkey",
        on="o_orderdate",
        left_cols=["o_orderkey"],
        right_value_col="o_orderdate",
        out_col="prev_ts",
        # width derived from right-side stats (span / >=64 shards): the
        # ~7-year order span shards to ~40-day buckets at sf0.1, plenty
        # of cross-shard carry traffic
        bucket_width=None,
    )

    def fmt(t: pa.Table) -> pa.Table:
        prev = pc.strftime(pc.cast(t["prev_ts"], pa.timestamp("s")), format="%Y-%m-%d")
        return pa.table({"o_orderkey": t["o_orderkey"], "prev_order_date": prev})

    return joined.map_batches(fmt, batch_format="pyarrow", batch_size=None)


def q_hash_join_orders(sf_dir: str):
    """Large-large equi-join: orders x customer via Ray Data's native
    hash-shuffle join (both sides partitioned on the key), then a keyed
    aggregate. The broadcast variant (q_broadcast_lookup_join) is for
    small sides; this is the genuine all-to-all path."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    # partition count tracks data volume (~200k rows per partition from
    # parquet metadata), not a constant: per-partition overhead dominates
    # small joins (8 parts measured 1.9x faster than 32 at sf0.1) while
    # big joins need the spread
    n_rows = pq.ParquetFile(os.path.join(sf_dir, "orders.parquet")).metadata.num_rows
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=max(8, min(256, n_rows // 200_000)),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    c = joined.map_batches(to_cents, batch_format="pyarrow", batch_size=None)
    return partial_groupby_sum(
        c, ["c_mktsegment"], ["price_cents"], count_alias="n_orders"
    )


def q_token_stats_bpe(sf_dir: str):
    """BPE-style regex token counting (actor pool, pattern compiled once
    per actor) — the 'whitespace + BPE-ish regex' token-count pair."""
    from glue_etl_pipeline_ray.functions.text import BpeTokenCount

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        BpeTokenCount, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )


def q_media_resize(sf_dir: str):
    """Multimodal chain: decode (actor pool) -> resize (actor pool) —
    binary payload in, typed thumbnail metadata out."""
    from glue_etl_pipeline_ray.functions.multimodal import FakeResizer

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_binary(t: pa.Table) -> pa.Table:
        payloads = [(x or "").encode("utf-8") for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            }
        )

    binary = ds.map_batches(to_binary, batch_format="pyarrow", batch_size=None)
    decoded = binary.map_batches(
        FakeMediaDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )
    return decoded.map_batches(
        FakeResizer, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )


def q_media_embed(sf_dir: str):
    """Multimodal feature extraction: frame-sample (actor pool) ->
    batched embed (the GPU-stage stub) -> per-doc feature count + L1 norm
    in scaled ints (deterministic across float orders)."""
    from glue_etl_pipeline_ray.functions.multimodal import FrameSampler, embed_bytes

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_binary(t: pa.Table) -> pa.Table:
        payloads = [(x or "").encode("utf-8") for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    frames = (
        ds.map_batches(to_binary, batch_format="pyarrow", batch_size=None)
        .map_batches(FrameSampler, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))
        .map_batches(embed_bytes(), batch_format="pyarrow", batch_size=256)
    )

    def summarize(t: pa.Table) -> pa.Table:
        feats = t["feature"].combine_chunks()
        flat = feats.flatten().to_numpy(zero_copy_only=False)
        n = len(feats)
        dims = np.diff(feats.offsets.to_numpy(zero_copy_only=False))
        l1 = np.add.reduceat(np.abs(flat), feats.offsets.to_numpy(zero_copy_only=False)[:-1]) if n else np.array([])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "frame_idx": t["frame_idx"],
                "feat_dim": pa.array(dims, pa.int64()),
                "l1_e4": pa.array(np.round(l1 * 10_000).astype(np.int64), pa.int64()),
            }
        )

    return frames.map_batches(summarize, batch_format="pyarrow", batch_size=None)


def q_distinct_users(sf_dir: str):
    """Exact distinct count (the shuffle path the HLL sketch avoids)."""
    from glue_etl_pipeline_ray.functions.groups import grouped_first

    ds = _t(sf_dir, "events", ["user_id"])
    distinct = grouped_first(ds, ["user_id"])

    def count(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    parts = distinct.map_batches(count, batch_format="pyarrow", batch_size=None)
    total = sum(r["n"] for r in parts.take_all())
    return pa.table({"n_distinct_users": pa.array([total], pa.int64())})


def q_distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct count: one shuffle-free pass, 2^14 registers
    per block folded by max (rel. error ~0.8%); verified within bounds
    against the exact count in tests (rows-only gate here — the estimate
    is intentionally not bit-equal to SQL)."""
    from glue_etl_pipeline_ray.functions.sketch import hll_distinct

    ds = _t(sf_dir, "events", ["user_id"])
    res = hll_distinct(ds, ["user_id"])
    return pa.table(
        {
            "estimate": pa.array([int(round(res["estimate"]))], pa.int64()),
            "p": pa.array([res["p"]], pa.int64()),
        }
    )


def q_topk_per_group(sf_dir: str):
    """Top-3 orders by price per customer — keyed top-k without a global
    sort: one hash shuffle, vectorized per-key partial sort."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    def top3(g: pa.Table) -> pa.Table:
        price = g["price_cents"].to_numpy(zero_copy_only=False)
        keys = g["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -price))[:3]
        out = g.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1), pa.int64())
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    return grouped_apply(prepped, ["o_custkey"], top3)


def q_cumsum_per_user(sf_dir: str):
    """Ordered window function: running sum of value per user by event
    time — one hash shuffle on the key, vectorized cumsum per group."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cumsum(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        cents = (
            np.round(g["value"].to_numpy(zero_copy_only=False) * 100)
            .astype(np.int64)[order]
        )
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": g["user_id"].take(pa.array(order)),
                "running_cents": pa.array(np.cumsum(cents), pa.int64()),
            }
        )

    return grouped_apply(ds, ["user_id"], cumsum)


def q_sliding_window_30m(sf_dir: str):
    """RANGE-frame sliding window (a bounded range self-join with an
    equality key): per event, the count and sum of the same user's
    events in the trailing 30 minutes INCLUDING ts-peers (SQL RANGE
    frame semantics). One hash shuffle on the key; per group a sort +
    two vectorized ``searchsorted`` probes + a prefix-sum difference —
    no per-row loop, no pairwise join materialization."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    win = np.timedelta64(30, "m")

    def slide(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts_s = ts[order]
        cents = (
            np.round(g["value"].to_numpy(zero_copy_only=False) * 100)
            .astype(np.int64)[order]
        )
        lo = np.searchsorted(ts_s, ts_s - win, side="left")
        hi = np.searchsorted(ts_s, ts_s, side="right")  # peers included
        csum = np.r_[0, np.cumsum(cents)]
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": g["user_id"].take(pa.array(order)),
                "n_last_30m": pa.array(hi - lo, pa.int64()),
                "cents_last_30m": pa.array(csum[hi] - csum[lo], pa.int64()),
            }
        )

    return grouped_apply(ds, ["user_id"], slide)


def q_grouped_quantiles(sf_dir: str):
    """Exact per-group quantiles (discrete): median and p90 of the event
    value per event type. Groups are hash-partitioned; each group sorts
    its own values (never a global sort). Discrete quantile = element at
    ``ceil(n*q)-1`` of the sorted run — bit-identical to DuckDB's
    ``quantile_disc``. For quantiles over 10^10 rows per group, swap the
    in-group sort for a t-digest/KLL sketch (approximate) or a
    distributed selection pass; exact is right at per-group scale."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def quants(g: pa.Table) -> pa.Table:
        cents = np.sort(
            np.round(g["value"].to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )
        )
        n = len(cents)
        if n == 0:  # typed empty for the empty-partition schema probe
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "p50_cents": pa.array([], pa.int64()),
                    "p90_cents": pa.array([], pa.int64()),
                }
            )
        pick = lambda q: int(cents[int(np.ceil(n * q)) - 1])  # noqa: E731
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "p50_cents": pa.array([pick(0.5)], pa.int64()),
                "p90_cents": pa.array([pick(0.9)], pa.int64()),
            }
        )

    return grouped_apply(ds, ["event_type"], quants)


def q_value_quantiles_hist(sf_dir: str):
    """Global exact quantiles WITHOUT a sort: integer-domain values
    collapse to a (value -> count) histogram — pre-combined inside every
    map task, so the only shuffle moves ~|distinct values| tiny rows —
    and quantile_disc ranks are read off the cumulative counts in one
    final pass. This is the 100 TB path for quantiles over bounded
    integer domains (cents, token counts, sizes): mergeable partials,
    no global sort, exact answers (for unbounded/float domains swap the
    histogram for a KLL/t-digest sketch and accept approximation)."""
    ds = _t(sf_dir, "events", ["value"])

    hist = partial_groupby_sum(
        ds.map_batches(
            lambda t: pa.table({"cents": _cents(t["value"])}),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["cents"],
        [],
        count_alias="cnt",
    )
    h = hist.to_arrow_refs()
    # ~|distinct| rows, tiny by design; skip the empty zero-column
    # blocks Ray emits for key-less groupby partitions
    parts = [t for t in ray.get(h) if t.num_columns > 0]
    t = pa.concat_tables(parts) if parts else pa.table(
        {"cents": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )
    t = t.sort_by("cents")
    vals = t["cents"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(t["cnt"].to_numpy(zero_copy_only=False))
    n = int(cum[-1]) if len(cum) else 0

    def pick(q: float):
        if n == 0:
            return None
        idx = int(np.ceil(n * q)) - 1  # quantile_disc rank
        return int(vals[np.searchsorted(cum, idx, side="right")])

    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "p50_cents": pa.array([pick(0.5)], pa.int64()),
            "p90_cents": pa.array([pick(0.9)], pa.int64()),
            "p99_cents": pa.array([pick(0.99)], pa.int64()),
        }
    )


def q_value_quantiles_sketch(sf_dir: str):
    """Global approximate quantiles via the mergeable KLL sketch — the
    scale path for UNBOUNDED / float domains where the exact
    value-histogram (``q_value_quantiles_hist``) doesn't apply: one
    ``map_batches`` pass emits an O(k log n)-float partial per block,
    the driver folds them, NO shuffle at any size. Rows-only gate; the
    rank-error bound vs the exact path is asserted in
    tests/test_sketch_kll.py."""
    from glue_etl_pipeline_ray.functions.sketch import kll_quantiles

    ds = _t(sf_dir, "events", ["value"])
    cents = ds.map_batches(
        lambda t: pa.table({"cents": _cents(t["value"])}),
        batch_format="pyarrow",
        batch_size=None,
    )
    res = kll_quantiles(cents, "cents", [0.5, 0.9, 0.99], k=256)
    return pa.table(
        {
            "n": pa.array([res["n"]], pa.int64()),
            "p50_cents": pa.array([int(res["quantiles"][0.5])], pa.int64()),
            "p90_cents": pa.array([int(res["quantiles"][0.9])], pa.int64()),
            "p99_cents": pa.array([int(res["quantiles"][0.99])], pa.int64()),
        }
    )


def q_semi_join_active(sf_dir: str):
    """Semi-join (EXISTS): customers WITH event activity — the
    complement of the bucketed anti-join, same two-sided hash-partition
    plan (round 1 had only the anti side)."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    def tag(col: str, side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "c_custkey": pc.cast(t[col], pa.int64()),
                    "__side": pa.array(
                        np.full(t.num_rows, side, np.int8), pa.int8()
                    ),
                }
            )

        return f

    build = _t(sf_dir, "events", ["user_id"]).map_batches(
        tag("user_id", 0), batch_format="pyarrow", batch_size=None
    )
    probe = _t(sf_dir, "customer", ["c_custkey"]).map_batches(
        tag("c_custkey", 1), batch_format="pyarrow", batch_size=None
    )

    def semi(group: pa.Table) -> pa.Table:
        side = group["__side"]
        probe_rows = group.filter(pc.equal(side, 1)).select(["c_custkey"])
        if pc.min(side).as_py() != 0:  # no build row -> key inactive
            return probe_rows.slice(0, 0)
        return probe_rows

    return grouped_apply(build.union(probe), ["c_custkey"], semi)


def q_topk_users_sketch(sf_dir: str):
    """Shuffle-free heavy-hitter top-k (SpaceSaving-style mergeable
    partials with a deterministic error bound) — the sketch companion to
    the exact `topk_users`, like HLL pairs with `distinct_users`. With
    ``partial_m`` comfortably above the distinct-key count the bound
    collapses to zero and the result is exact (asserted by the pytest
    gate against the exact query)."""
    from glue_etl_pipeline_ray.functions.sketch import heavy_hitters

    ds = _t(sf_dir, "events", ["user_id", "value"]).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "cents": _cents(t["value"])}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    # partial_m above the key cardinality -> zero slack -> exact result
    # (near-uniform keys have no true heavy hitters; on skewed data a
    # small m suffices — bound behavior unit-tested in test_groups.py)
    return heavy_hitters(ds, "user_id", k=10, partial_m=256, weight_col="cents")


def q_user_event_paths(sf_dir: str):
    """Ordered collect per key (the string_agg/collect_list family): each
    user's event-type sequence in (ts, event_id) order, joined with '>'.
    One hash shuffle; per-group vectorized sort + join — the
    clickstream-path shape."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def collect(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        path = ">".join(
            g["event_type"].take(pa.array(order, pa.int64())).to_pylist()
        )
        return pa.table(
            {
                "user_id": g["user_id"].slice(0, 1),
                "n_events": pa.array([g.num_rows], pa.int64()),
                "event_path": pa.array([path], pa.string()),
            }
        )

    return grouped_apply(ds, ["user_id"], collect)


def q_pivot_counts(sf_dir: str):
    """Pivot / conditional aggregation: per user, one count column per
    event class — expressed as vectorized conditional partials inside
    map_batches feeding ONE tiny keyed groupby (no per-class passes)."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def widen(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        cols = {"user_id": t["user_id"]}
        for cls in EVENT_ENUM:
            m = pc.fill_null(pc.equal(et, cls), False)
            cols[f"n_{cls}"] = pc.cast(m, pa.int64())
        cols["cents_purchase"] = pc.if_else(
            pc.fill_null(pc.equal(et, "purchase"), False),
            _cents(t["value"]),
            pa.nulls(t.num_rows, pa.int64()).fill_null(0),
        )
        return pa.table(cols)

    wide = ds.map_batches(widen, batch_format="pyarrow", batch_size=None)
    return partial_groupby_sum(
        wide,
        ["user_id"],
        [f"n_{c}" for c in EVENT_ENUM] + ["cents_purchase"],
    )


def q_doc_repetition(sf_dir: str):
    """Gopher/C4-style repetition quality signals per document: total
    bigrams, duplicated bigrams, and the hottest bigram's count — the
    standard filters for boilerplate/looped text in training-data
    curation. Embarrassingly parallel (per-doc Counter inside
    map_batches, no shuffle at all); docs with < 2 tokens drop (no
    bigrams), matching the oracle."""
    from collections import Counter

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def rep(t: pa.Table) -> pa.Table:
        ids, total, dup, top = [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (text or "").split(" ")
            if len(toks) < 2:
                continue
            c = Counter(zip(toks, toks[1:]))
            n = len(toks) - 1
            ids.append(did)
            total.append(n)
            dup.append(n - len(c))
            top.append(max(c.values()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(total, pa.int64()),
                "n_dup_bigrams": pa.array(dup, pa.int64()),
                "top_bigram_n": pa.array(top, pa.int64()),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow", batch_size=None)


def q_hash_sample(sf_dir: str):
    """Deterministic content-hash sampling (~1/8 of documents): rows whose
    md5(text) starts below 0x20 — reproducible across runs/engines (the
    scale-safe alternative to random_shuffle-based sampling: no shuffle,
    no RNG state, stable under retries)."""
    import hashlib

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def sample(t: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5((x or "").encode("utf-8")).hexdigest() < "20"
            for x in t["text"].to_pylist()
        ]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=None)

# ==================================================== round-3 additions


def q_dedup_clusters(sf_dir: str):
    """Duplicate CLUSTERS, not just pairs: connected components over the
    exact n-gram-Jaccard duplicate graph; every clustered doc labeled
    with the min doc_id of its component (the canonical representative a
    keep-one dedup would retain). Pairs are the aggregate-sized OUTPUT
    of the dedup pass, so the component fold is a vectorized numpy
    hash-min below the audited threshold and MapReduce-style distributed
    label-propagation rounds above it (functions/cc.py)."""
    from glue_etl_pipeline_ray.functions.cc import connected_components

    pairs = ngram_jaccard_pairs(
        _t(sf_dir, "documents", ["doc_id", "text"]), tau_num=4, tau_den=5
    )
    comp = connected_components(pairs, "doc_id_a", "doc_id_b")
    return comp.map_batches(
        lambda t: pa.table(
            {"doc_id": t["node"], "cluster_id": t["component"]}
        ),
        batch_format="pyarrow",
    )


def q_pii_redact(sf_dir: str):
    """PII-style redaction over a string column: digit-run identifiers
    replaced by ``<NUMID>`` with per-row match counts — pure RE2 kernels
    (``pc.replace_substring_regex`` / ``count_substring_regex``), no
    Python loop; zero shuffle. EMAIL/PHONE patterns ship in
    ``functions/text.REDACT_PATTERNS``; the gate exercises NUMID because
    the synthetic corpus has digit identifiers but no emails."""
    from glue_etl_pipeline_ray.functions.text import redact

    ds = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    return ds.map_batches(
        lambda t: redact(t, "c_name", {"NUMID": r"[0-9]+"}),
        batch_format="pyarrow",
        batch_size=None,
    )


def q_lag_lead(sf_dir: str):
    """LAG/LEAD window functions: each event's previous and next value
    (in cents) within its user's event_id order — one hash shuffle on
    the key, vectorized shift per group, NULL at the partition edges."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def shift(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")
        cents = (
            np.round(g["value"].to_numpy(zero_copy_only=False) * 100)
            .astype(np.int64)[order]
        )
        n = len(cents)
        prev = np.roll(cents, 1)
        nxt = np.roll(cents, -1)
        edge_first = np.zeros(n, bool)
        edge_last = np.zeros(n, bool)
        if n:
            edge_first[0] = True
            edge_last[n - 1] = True
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": g["user_id"].take(pa.array(order)),
                "prev_cents": pa.array(prev, pa.int64(), mask=edge_first),
                "next_cents": pa.array(nxt, pa.int64(), mask=edge_last),
            }
        )

    return grouped_apply(ds, ["user_id"], shift)


# value bands in integer cents: [lo, hi) — a literal broadcast table,
# mirrored by the oracle's VALUES list
VALUE_BANDS_CENTS = (
    (0, 0, 1500),
    (1, 1500, 3000),
    (2, 3000, 4500),
    (3, 4500, 6000),
    (4, 6000, 7500),
    (5, 7500, 9100),
)


def q_range_band_join(sf_dir: str):
    """Broadcast RANGE join (non-equi): assign each event to the value
    band whose [lo, hi) interval contains it. The band table is tiny and
    sorted, so the join is a per-batch ``np.searchsorted`` against the
    broadcast bound arrays — zero shuffle, no per-row loop; out-of-band
    rows drop (inner-join semantics). The general pattern for joining a
    stream against reference intervals (rate tiers, time buckets, IP
    ranges) without an all-to-all exchange."""
    ds = _t(sf_dir, "events", ["event_id", "value"])
    los = np.array([b[1] for b in VALUE_BANDS_CENTS], np.int64)
    his = np.array([b[2] for b in VALUE_BANDS_CENTS], np.int64)
    ids = np.array([b[0] for b in VALUE_BANDS_CENTS], np.int64)

    def assign(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        slot = np.searchsorted(los, cents, side="right") - 1
        ok = (slot >= 0) & (cents < his[np.clip(slot, 0, len(his) - 1)])
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()).filter(
                    pa.array(ok)
                ),
                "band_id": pa.array(ids[slot[ok]], pa.int64()),
                "value_cents": pa.array(cents[ok], pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def q_rollup_agg(sf_dir: str):
    """ROLLUP / multi-level aggregate: (year, month), (year), and grand
    totals from ONE pass — per-block partials are pre-combined inside
    map_batches, and the coarser levels are folded from the finest
    level's aggregate-sized partials on the driver (never a second scan,
    never a second shuffle). Sentinel -1 marks rolled-up levels so the
    grouping columns stay non-null int64."""
    ds = _t(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        yr = ts.astype("datetime64[Y]").astype(np.int64) + 1970
        mo = ts.astype(np.int64) % 12 + 1
        cents = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        ym = yr * 100 + mo
        uniq, inv = np.unique(ym, return_inverse=True)
        return pa.table(
            {
                "ym": pa.array(uniq, pa.int64()),
                "n": pa.array(np.bincount(inv), pa.int64()),
                "cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # aggregate-sized: one row per (block, month)
    ym = np.array([r["ym"] for r in parts], np.int64)
    n = np.array([r["n"] for r in parts], np.int64)
    cents = np.array([r["cents"] for r in parts], np.int64)
    uniq, inv = np.unique(ym, return_inverse=True)
    n_m = np.bincount(inv, weights=n).astype(np.int64)
    c_m = np.bincount(inv, weights=cents).astype(np.int64)
    yrs, yinv = np.unique(uniq // 100, return_inverse=True)
    n_y = np.bincount(yinv, weights=n_m).astype(np.int64)
    c_y = np.bincount(yinv, weights=c_m).astype(np.int64)
    year_col = np.concatenate([uniq // 100, yrs, [-1]])
    month_col = np.concatenate(
        [uniq % 100, np.full(len(yrs), -1), [-1]]
    )
    return pa.table(
        {
            "year": pa.array(year_col, pa.int64()),
            "month": pa.array(month_col, pa.int64()),
            "n_events": pa.array(
                np.concatenate([n_m, n_y, [n_m.sum()]]), pa.int64()
            ),
            "sum_value_cents": pa.array(
                np.concatenate([c_m, c_y, [c_m.sum()]]), pa.int64()
            ),
        }
    )


def q_grouped_mode(sf_dir: str):
    """Per-key MODE with a deterministic tie-break (most frequent
    event_type per user; ties -> lexicographically smallest type): one
    hash shuffle, per-group ``np.unique`` counting — the categorical
    argmax aggregate SQL spells as row_number-over-count."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def mode(g: pa.Table) -> pa.Table:
        et = g["event_type"].to_numpy(zero_copy_only=False)
        vals, counts = np.unique(et, return_counts=True)
        best = int(np.argmax(counts))  # first max = smallest type (sorted)
        return pa.table(
            {
                "user_id": g["user_id"].slice(0, 1),
                "mode_type": pa.array([str(vals[best])], pa.string()),
                "n": pa.array([int(counts[best])], pa.int64()),
            }
        )

    return grouped_apply(ds, ["user_id"], mode)


def q_embed_kmeans(sf_dir: str):
    """Distributed spherical k-means over the embedding column: each
    Lloyd iteration is ONE map_batches pass emitting k x d partial sums
    (aggregate-sized), folded on the driver — no shuffle. Gate: pytest
    asserts the objective is monotone and assignments deterministic
    (tests/test_clustering_pack.py)."""
    from glue_etl_pipeline_ray.functions.clustering import kmeans

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, assignments, _ = kmeans(ds, n_clusters=10, iters=5)
    return assignments


def q_dedup_semantic(sf_dir: str):
    """SemDeDup (cluster -> within-cluster cosine prune, keep lowest
    id): the embedding-space near-dup pass used for training-data
    curation. Gate: pytest plants exact-duplicate vectors and asserts
    exactly one survivor per group."""
    from glue_etl_pipeline_ray.functions.clustering import semantic_dedup

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup(ds, n_clusters=10, threshold=0.995)


def q_sequence_pack(sf_dir: str):
    """LLM sequence packing: documents greedily packed (FFD) into
    512-token sequences, deterministic under any parallelism via fixed
    hash shards. Gate: pytest asserts exactly-once packing, capacity
    respected, determinism (tests/test_clustering_pack.py)."""
    from glue_etl_pipeline_ray.functions.pack import pack_sequences

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    counted = ds.map_batches(toks, batch_format="pyarrow", batch_size=None)
    return pack_sequences(counted, capacity=512)


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split (90/5/5): membership is a
    pure function of the doc id's stable hash — shuffle-free,
    retry-stable, disjoint + exhaustive by construction. Gate: pytest
    (proportions, determinism, disjointness)."""
    from glue_etl_pipeline_ray.functions.mixture import hash_split

    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    return hash_split(ds, {"train": 0.9, "val": 0.05, "test": 0.05})


def q_mixture_sample(sf_dir: str):
    """Source-weighted mixture sampling (the static data-mixing step of
    LLM pipelines): thin each source by a derived keep-rate so the
    survivors match the target mixture; binding source kept whole. One
    Count aggregate + a shuffle-free hash filter. Gate: pytest
    (achieved proportions within tolerance, determinism)."""
    from glue_etl_pipeline_ray.functions.mixture import mixture_sample

    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    # overweight src0, keep a tail of others, drop the rest
    target = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    sampled, _plan = mixture_sample(ds, target)
    return sampled


def q_doc_chunk(sf_dir: str):
    """Document chunking into 64-token windows with 8-token overlap —
    flat row expansion, no shuffle, chunk identity (doc_id, chunk_idx)
    deterministic under any parallelism. Gate: pytest (losslessness via
    reassembly, overlap contract, exactly-once docs)."""
    from glue_etl_pipeline_ray.functions.chunk import chunk_documents

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, max_tokens=64, overlap=8)


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped 3-way join + aggregate + top-k (the classic
    multi-join composition): BUILDING-segment customers' unshipped
    orders ranked by revenue. Plan: the filtered customer key set is
    tiny -> broadcast semi-join filter on orders (no shuffle); the
    doubly-filtered orders side (segment x date cut) is small too ->
    assembled sorted in the object store and broadcast, so the
    orders x lineitem step is a map-side lookup join (no actor-pool
    join spin) and the only shuffle carries (orderkey, rev) partials;
    order attrs re-attach by searchsorted on the aggregate-sized
    result; global top-10 via block-local top-10s folded on the
    driver (never a global sort). A non-selective dimension side
    falls back to the native hash join (the hash_join_orders plan).
    Revenue uses floor(price*(1-disc)*100) so both engines compute
    identical int64 cents (floor has no round-half ambiguity)."""
    import datetime

    cutoff = datetime.datetime(1998, 6, 1)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    key_ref = ray.put(
        np.sort(
            pa.concat_tables(ray.get(keys.to_arrow_refs()))["c_custkey"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    )

    orders = _t(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                           "o_orderpriority"]
    )

    def filt_orders(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        m = (od < np.datetime64(cutoff)) & np.isin(ck, ks)
        t = t.filter(pa.array(m))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    o = orders.map_batches(filt_orders, batch_format="pyarrow", batch_size=None)

    # the doubly-filtered orders side is small (segment x date cut):
    # assemble it sorted IN the object store and broadcast — the
    # orders x lineitem step becomes a map-side lookup join, no second
    # actor-pool join spin, and the aggregate shuffle carries only
    # (orderkey, rev) partials. Fallback for a non-selective dimension
    # side is the native hash join (the hash_join_orders plan).
    @ray.remote
    def assemble_orders(*tables: pa.Table):
        tabs = [t for t in tables if t.num_rows]
        if not tabs:
            return (
                np.array([], np.int64),
                np.array([], "datetime64[us]"),
                np.array([], object),
            )
        cat = pa.concat_tables(tabs)
        ok = cat["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ok)
        return (
            ok[order],
            cat["o_orderdate"].to_numpy(zero_copy_only=False)[order],
            np.asarray(cat["o_orderpriority"].to_pylist(), object)[order],
        )

    o_ref = assemble_orders.remote(*o.to_arrow_refs())

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice",
                                 "l_discount", "l_shipdate"])

    def filt_lines(t: pa.Table) -> pa.Table:
        ok_sorted, _, _ = ray.get(o_ref)
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(sd > np.datetime64(cutoff)))
        lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
        if len(ok_sorted):
            pos = np.searchsorted(ok_sorted, lk)
            pos[pos == len(ok_sorted)] = 0
            m = ok_sorted[pos] == lk
        else:
            m = np.zeros(len(lk), bool)
        t = t.filter(pa.array(m))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_cents": pa.array(rev, pa.int64()),
            }
        )

    l = li.map_batches(filt_lines, batch_format="pyarrow", batch_size=None)
    order_rev = partial_groupby_sum(
        l, ["l_orderkey"], ["rev_cents"], count_alias="n_lines"
    )

    def attach_order_attrs(t: pa.Table) -> pa.Table:
        ok_sorted, dates, prios = ray.get(o_ref)
        lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ok_sorted, lk)  # every key is present
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "o_orderdate": pa.array(dates[pos], pa.timestamp("us")),
                "o_orderpriority": pa.array(prios[pos], pa.string()),
                "rev_cents": t["rev_cents"],
                "n_lines": t["n_lines"],
            }
        )

    agg = order_rev.map_batches(
        attach_order_attrs, batch_format="pyarrow", batch_size=None
    )
    # global top-10: the aggregate is keyed by order -> block-local
    # top-10s then one driver fold (k rows per block, never a sort)
    def block_top(t: pa.Table) -> pa.Table:
        rev = t["rev_cents"].to_numpy(zero_copy_only=False)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -rev))[:10]
        return t.take(pa.array(order))

    parts = agg.map_batches(
        block_top, batch_format="pyarrow", batch_size=None
    ).take_all()
    import pandas as pd

    df = pd.DataFrame(parts)
    if df.empty:
        return pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
                "rev_cents": pa.array([], pa.int64()),
            }
        )
    df = df.sort_values(
        ["rev_cents", "l_orderkey"], ascending=[False, True]
    ).head(10)
    return pa.table(
        {
            "l_orderkey": pa.array(df["l_orderkey"], pa.int64()),
            "o_orderdate": pa.array(
                df["o_orderdate"].astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(df["o_orderpriority"], pa.string()),
            "rev_cents": pa.array(df["rev_cents"], pa.int64()),
        }
    )


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (the GPT-3/Dolma contamination guard):
    docs with ``doc_id % 17 == 0`` play the held-out benchmark; every
    other doc is tagged with how many of its distinct 3-gram shingles
    appear anywhere in the benchmark. One broadcast of the benchmark's
    sorted gram-hash array (remote-assembled, driver holds only the
    ObjectRef) + one shuffle-free vectorized scan over the training
    side. Gate: pytest (hash-exact vs a DuckDB shingle join at sf0.01;
    the driver window is saturated by the 50 hash-exact queries, so
    this rides the pytest-DuckDB gate instead)."""
    from glue_etl_pipeline_ray.functions.decontaminate import (
        benchmark_ngram_hashes,
        decontaminate,
    )

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    def _split(want_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 17 == 0) == want_bench
            return t.filter(pa.array(m))

        return f

    bench = docs.map_batches(_split(True), batch_format="pyarrow", batch_size=None)
    train = docs.map_batches(_split(False), batch_format="pyarrow", batch_size=None)
    ref = benchmark_ngram_hashes(bench, shingle_n=3)
    return decontaminate(train, ref, shingle_n=3)


def q_vocab_topk(sf_dir: str):
    """Corpus vocabulary: the 50 most frequent whitespace tokens with
    exact counts (vocab-building / corpus inspection). Per-block
    np.unique partials -> bounded hash-partition sum -> local top-k per
    partition -> driver fold of n_parts x k rows; shuffle volume is
    distinct-(token, block) partials, never raw tokens. Gate: pytest
    (hash-exact vs DuckDB unnest+count at sf0.001; rides outside the
    saturated 50-entry driver window)."""
    from glue_etl_pipeline_ray.functions.text import vocab_topk

    return vocab_topk(
        _t(sf_dir, "documents", ["text"]), text_col="text", k=50
    )


def q_shuffle_train_order(sf_dir: str):
    """Seeded deterministic global shuffle (training-order
    randomization): sort by a salted stable row hash — one
    range-partitioned exchange, identical permutation across
    runs/retries (epoch k = seed k), 16 balanced output shards for
    resumable writes. Gate: pytest (permutation + determinism +
    seed-sensitivity + shard balance; order is seed-defined so no SQL
    oracle exists by construction)."""
    from glue_etl_pipeline_ray.functions.mixture import deterministic_shuffle

    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    return deterministic_shuffle(ds, seed=1, n_shards=16)


def q_range_scan_pruned(sf_dir: str):
    """Data-skipping range scan: events sorted by integer value_cents
    into bounded Parquet files + a per-file min/max manifest (zone
    maps); a 10%-selectivity range then opens only overlapping files.
    Gate: pytest (result equality vs a full-scan filter AND an actual
    files-skipped assertion; the write side is the one range-partition
    sort exchange)."""
    from glue_etl_pipeline_ray.functions.skipping import (
        pruned_read,
        sorted_write,
    )

    ev = _t(sf_dir, "events", ["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t["event_id"], "value_cents": _cents(t["value"])}
        )

    out = tempfile.mkdtemp(prefix="gepr_skip_")
    sorted_write(
        ev.map_batches(cents, batch_format="pyarrow", batch_size=None),
        out,
        "value_cents",
        rows_per_file=2048,
    )
    ds, _read, _total = pruned_read(out, "value_cents", 1000, 1900)
    return ds


def q_embed_project(sf_dir: str):
    """Johnson-Lindenstrauss random projection of the embedding column
    to 16 dims — the dimension-reduction scale path in front of ANN
    (project once, search small, re-rank survivors in full dim). The
    Gaussian matrix is a pure function of (seed, d_in): built lazily
    per actor, identical across actors/retries. Gate: pytest
    (determinism, linearity, JL pairwise-distance preservation at
    out_dim=64)."""
    from glue_etl_pipeline_ray.functions.similarity import random_projection

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return random_projection(ds, out_dim=16, seed=7)


def q_tfidf_terms(sf_dir: str):
    """Per-document top-5 TF-IDF keywords: one bounded DF shuffle (same
    shape as vocab_topk), DF arrays broadcast once, shuffle-free
    scoring pass. Gate: pytest (bit-exact vs a single-threaded
    reference implementation of the same fixed formula, incl. the
    min_df pruning contract)."""
    from glue_etl_pipeline_ray.functions.text import tfidf_topk_terms

    return tfidf_topk_terms(
        _t(sf_dir, "documents", ["doc_id", "text"]), k=5
    )


def q_zorder_box_scan(sf_dir: str):
    """Z-order (Morton-curve) clustering on (user_id, value_cents) +
    2-D box scan: files become tight boxes in BOTH dimensions, so
    range predicates on either column prune files — the multi-column
    layout a single sort can't give (Delta's OPTIMIZE ZORDER BY).
    Gate: pytest (full-scan equality, pruning in both dimensions)."""
    from glue_etl_pipeline_ray.functions.skipping import (
        pruned_read_box,
        zorder_write,
    )

    ev = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value_cents": _cents(t["value"]),
            }
        )

    out = tempfile.mkdtemp(prefix="gepr_zorder_")
    zorder_write(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=None),
        out,
        ("user_id", "value_cents"),
        rows_per_file=2048,
    )
    ds, _read, _total = pruned_read_box(
        out, {"user_id": (10, 40), "value_cents": (1000, 3000)}
    )
    return ds


def q_novel_content_filter(sf_dir: str):
    """Streaming cross-batch exact dedup (the "novel content only"
    ingest filter): three simulated arrival batches run through the
    persistent SeenIndex — fingerprints hash-bucketed and versioned
    like the lake, probe + fold touch only buckets present in the
    batch, exactly-once stage/commit. Returns the union of survivors
    with their batch ids. Gate: pytest (set-based oracle across
    batches, committed-batch replay empty, crash-window retry
    identity)."""
    from glue_etl_pipeline_ray.state.seenindex import SeenIndex

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def truncate(t: pa.Table) -> pa.Table:
        texts = pa.array(
            [" ".join((s or "").split(" ")[:3]) for s in t["text"].to_pylist()],
            pa.string(),
        )
        return pa.table({"doc_id": t["doc_id"], "text": texts})

    short = docs.map_batches(truncate, batch_format="pyarrow", batch_size=None)
    idx = SeenIndex(tempfile.mkdtemp(prefix="gepr_seen_"), num_buckets=16)
    outs = []
    for i in range(3):
        batch = short.map_batches(
            lambda t, i=i: t.filter(
                pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False) % 3 == i
                )
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        novel = idx.filter_novel(
            batch, batch_id=i, content_col="text", seq_col="doc_id"
        ).map_batches(
            lambda t, i=i: t.append_column(
                "batch", pa.array(np.full(t.num_rows, i, np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        outs.append(novel.materialize())
        idx.commit(i)
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def q_dedup_substring(sf_dir: str):
    """Substring-level duplicated-span tagging (the ExactSubstr
    stand-in, arXiv:2107.06499): char windows shared by >= 2 docs mark
    both docs. Detects any cross-doc duplicated substring of length
    >= window + stride - 1. Two scans + one bounded fingerprint-count
    exchange; only DUPLICATED window fingerprints are broadcast. Gate:
    pytest (exact match vs a single-threaded reference of the same
    windowing contract + planted-duplication recall)."""
    from glue_etl_pipeline_ray.functions.dedup import substring_dup_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return substring_dup_stats(ds, window=40, stride=20)


def q_grouped_quantiles_sketch(sf_dir: str):
    """Per-event-type approximate quantiles via mergeable KLL partials
    — the grouped-quantile scale path for unbounded/float domains (the
    exact path sorts each group in one task; this never materializes a
    group). One partial per (key, block), one bounded partial shuffle.
    Gate: pytest (per-group rank-error bound vs exact quantiles)."""
    from glue_etl_pipeline_ray.functions.sketch import grouped_kll_quantiles

    ev = _t(sf_dir, "events", ["event_type", "value"])
    cents = ev.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "cents": _cents(t["value"])}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return grouped_kll_quantiles(
        cents, "event_type", "cents", [0.5, 0.9], k=256
    )


def q_profile_table(sf_dir: str):
    """One-pass column profiling of the events table (nulls, typed
    min/max, HLL approx distinct per column) — the data-observability
    sweep run before ingesting any new source. NO shuffle: one partial
    per (column, block), driver fold of ~KB rows. Gate: pytest (exact
    n/null/min/max vs DuckDB; HLL distinct within the p=12 error
    bound)."""
    from glue_etl_pipeline_ray.functions.profile import profile_table

    return profile_table(_t(sf_dir, "events"))


def q_text_normalize(sf_dir: str):
    """Text cleaning ahead of dedup/tokenization: NFC -> lowercase ->
    control-strip -> whitespace collapse -> trim, all pyarrow RE2/utf8
    kernels, zero shuffle. Gate: pytest (hash-exact vs the equivalent
    DuckDB expression chain, plus a unicode/control-char fixture)."""
    from glue_etl_pipeline_ray.functions.text import normalize_text

    return normalize_text(_t(sf_dir, "documents", ["doc_id", "text"]))


def q_ann_project_rerank(sf_dir: str):
    """Project-then-search ANN composition: JL-project corpus + queries
    to 24 dims with the same (seed, d_in)-derived matrix, take 150
    candidates per query in the cheap space, re-rank only those rows at
    full dimension. One projected scan + one filtered full-dim scan;
    the candidate id set is the only broadcast. Parameter note
    (measured): the driver's synthetic embeddings are ISOTROPIC, the
    worst case for projection (neighbors nearly equidistant) — 16d/50c
    gives only 0.36 recall@10 here, 24d/150c gives 0.86; clustered real
    embeddings fare far better at smaller budgets. Gate: pytest
    (recall@10 vs exact brute top-10)."""
    from glue_etl_pipeline_ray.functions.similarity import project_rerank_topk

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qs = (
        ds.map_batches(
            lambda t: t.filter(
                pa.array(t["vec_id"].to_numpy(zero_copy_only=False) < 5)
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(qs["embedding"].to_numpy()).astype(np.float64)
    return project_rerank_topk(
        ds, queries, qs["vec_id"].tolist(), k=10, out_dim=24, candidates=150
    )


def q_training_data_pipeline(sf_dir: str):
    """End-to-end training-data prep — the composition the operator
    library exists for, as ONE streaming pipeline: normalize ->
    quality-filter -> exact dedup -> benchmark decontamination (drop)
    -> train split -> FFD sequence packing. Stage order is the
    standard corpus recipe (clean before dedup so case/whitespace
    variants collapse; decontaminate after dedup so the n-gram scan
    sees each content once; split before packing so sequences never
    mix splits). Gate: pytest (stage-accounting invariants, packed-set
    equality with the surviving train docs, capacity contract,
    end-to-end determinism)."""
    from glue_etl_pipeline_ray.functions.decontaminate import (
        benchmark_ngram_hashes,
        decontaminate,
    )
    from glue_etl_pipeline_ray.functions.dedup import exact_dedup
    from glue_etl_pipeline_ray.functions.mixture import hash_split
    from glue_etl_pipeline_ray.functions.pack import pack_sequences
    from glue_etl_pipeline_ray.functions.text import (
        normalize_text,
        quality_stats,
    )

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    norm = normalize_text(docs).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text": t["text_norm"]}),
        batch_format="pyarrow",
        batch_size=None,
    )
    quality = norm.map_batches(
        quality_stats, batch_format="pyarrow", batch_size=None
    ).map_batches(
        lambda t: t.filter(t["is_quality"]).select(
            ["doc_id", "text", "n_tokens"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    deduped = exact_dedup(quality)

    def _bench_split(want: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % 17 == 0) == want))

        return f

    bench = norm.map_batches(
        _bench_split(True), batch_format="pyarrow", batch_size=None
    )
    train_side = deduped.map_batches(
        _bench_split(False), batch_format="pyarrow", batch_size=None
    )
    clean = decontaminate(
        train_side, benchmark_ngram_hashes(bench), drop=True
    )
    split = hash_split(clean, {"train": 0.9, "val": 0.05, "test": 0.05})
    train = split.map_batches(
        lambda t: t.filter(pc.equal(t["split"], "train")).select(
            ["doc_id", "n_tokens"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return pack_sequences(train, capacity=256)


def q_interval_join(sf_dir: str):
    """Large-large temporal containment join (event-in-window): 45-min
    windows opened at every signup event of every 10th user, joined to
    ALL events of that user falling inside [start, end). Time-bucketed
    with interval replication (each left row in exactly ONE bucket, so
    pairs co-locate exactly once — no output dedup), one union + one
    (key, bucket) shuffle, vectorized sweep per group. Gate: pytest
    (hash-exact vs the DuckDB BETWEEN join at sf0.001)."""
    from glue_etl_pipeline_ray.functions.joins import interval_join

    ev = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    left = ev.map_batches(
        lambda t: t.select(["user_id", "ts", "event_id"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    def windows(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        m = (uid % 10 == 0) & (et == "signup")
        t = t.filter(pa.array(m))
        s = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "start": pa.array(s, pa.int64()),
                "end": pa.array(s + 45 * 60 * 1_000_000, pa.int64()),
                "interval_id": t["event_id"],
            }
        )

    right = ev.map_batches(windows, batch_format="pyarrow", batch_size=None)
    out = interval_join(
        left, right, key="user_id", ts_col="ts",
        start_col="start", end_col="end",
    )
    return out


def q_domain_cap(sf_dir: str):
    """Per-source document cap (at most 10 docs per source — the
    crawl-domain cap that stops one domain from dominating a corpus):
    deterministic md5(id) ranking, block-level pre-cap bounding the
    shuffle to k rows per (key, block), collision-guarded per-key final
    cut. Gate: pytest (hash-exact vs a DuckDB row_number-over-md5
    query)."""
    from glue_etl_pipeline_ray.functions.mixture import per_key_cap

    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    return per_key_cap(ds, key_col="source", k=10)


def q_unigram_logprob(sf_dir: str):
    """Corpus-unigram log-probability scoring (the CCNet/perplexity
    quality-filter shape with a self-built unigram LM): one bounded
    count shuffle + one broadcast + one shuffle-free scoring scan.
    Gate: pytest (bit-exact vs a single-threaded reference of the same
    fixed float64 expression, incl. the min_count pruning contract and
    the outlier-ordering property)."""
    from glue_etl_pipeline_ray.functions.text import unigram_logprob_score

    return unigram_logprob_score(
        _t(sf_dir, "documents", ["doc_id", "text"])
    )


def q_bm25_topk(sf_dir: str):
    """BM25 top-20 retrieval over documents for a fixed query-term set
    (the lexical retrieval primitive of targeted-subset mining / RAG
    screens): (N, avgdl) aggregate + per-term DF block partials + one
    shuffle-free scoring pass with block-local top-k, driver folds
    blocks x k rows. Gate: pytest (DuckDB BM25 expression, scores to
    1e-9, exact id ranking)."""
    from glue_etl_pipeline_ray.functions.bm25 import bm25_topk

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, ["data", "row", "value"], k=20)


def q_left_outer_join(sf_dir: str):
    """Left-outer hash join: every customer with each of their orders,
    order columns null for order-less customers (the join type the
    engine's equi/semi/anti family lacked). Two-sided hash-partition on
    the key through the collision-guarded grouped_apply — the
    large-large plan; the probe side can't broadcast because LEFT rows
    must survive without a match. Gate: pytest (DuckDB LEFT JOIN,
    hash-exact)."""
    from glue_etl_pipeline_ray.functions.joins import left_outer_join

    cust = _t(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t["c_custkey"], pa.int64())}),
        batch_format="pyarrow",
        batch_size=None,
    )
    orders = _t(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_total_cents": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return left_outer_join(cust, orders, on="c_custkey")


def q_grouped_distinct_hll(sf_dir: str):
    """Per-event-type approximate distinct users (grouped HLL): 2^p-byte
    register partials per (key, block), one partial-sized shuffle, max
    fold per key — grouped COUNT(DISTINCT) without moving data rows.
    Gate: pytest (per-group estimate within the 1.04/sqrt(2^p) bound of
    the exact DuckDB distinct)."""
    from glue_etl_pipeline_ray.functions.sketch import grouped_hll_distinct

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    return grouped_hll_distinct(ds, "event_type", ["user_id"], p=14)


def q_cdc_redrive(sf_dir: str) -> pa.Table:
    """DLQ redrive closing the quarantine loop: replay a change stream
    whose every 13th event carries a null payload (dead-lettered by a
    strict not_null rule), then redrive the DLQ with a fixer that
    backfills the payload — recovered rows apply with their ORIGINAL
    seq, so the final table equals LWW over the never-dirty stream.
    Gate: pytest (hash-exact vs a DuckDB window query over the patched
    stream, tests/test_cdc_redrive_query.py)."""
    work = tempfile.mkdtemp(prefix="gepr_redrive_")
    ev_dir = _events_as_cdc(sf_dir, work, dirty_mod=13)
    base = user_state_spec()
    spec = TableSpec(
        name=base.name,
        key_cols=base.key_cols,
        base_cols=base.base_cols,
        rules=base.rules
        + (Rule("value_cents", "not_null", nullable_for_ops=("DELETE",)),),
        num_buckets=base.num_buckets,
    )
    eng = ReplayEngine(spec, os.path.join(work, "lake"))
    eng.replay(ev_dir)

    def fixer(t: pa.Table) -> pa.Table:
        vc = pc.fill_null(t["value_cents"], 0)
        return t.set_column(
            t.column_names.index("value_cents"), "value_cents", vc
        )

    eng.redrive_dlq(fixer=fixer)
    return eng.final_table()


def q_cdc_reshard(sf_dir: str) -> pa.Table:
    """Mid-stream bucket scale-out: replay batch 0 at 16 buckets,
    reshard to 32 (local per-bucket split, no shuffle), replay batch 1
    on the new layout — the final table must equal the uninterrupted
    LWW replay. Gate: pytest (hash-exact vs the same DuckDB window
    query as cdc_lww_upsert, tests/test_cdc_reshard_query.py)."""
    work = tempfile.mkdtemp(prefix="gepr_reshard_")
    ev_dir = _events_as_cdc(sf_dir, work)
    eng = ReplayEngine(user_state_spec(), os.path.join(work, "lake"))
    eng.replay(ev_dir, max_batches=1)
    eng2 = eng.reshard(os.path.join(work, "lake2"), factor=2)
    eng2.replay(ev_dir)
    return eng2.final_table()


def q_cdc_backfill(sf_dir: str) -> pa.Table:
    """Lake-wide backfill surface: replay the CDC stream, then derive a
    new ``value_dollars`` column across every bucket as a crash-safe
    in-place version bump (``ReplayEngine.backfill`` — seq untouched,
    one atomic manifest commit, added column registered as schema
    evolution). Gate: pytest (hash-exact vs the DuckDB LWW window with
    the same derived column, tests/test_cdc_backfill_query.py)."""
    work = tempfile.mkdtemp(prefix="gepr_backfill_")
    ev_dir = _events_as_cdc(sf_dir, work)
    eng = ReplayEngine(user_state_spec(), os.path.join(work, "lake"))
    eng.replay(ev_dir)

    def add_dollars(t: pa.Table) -> pa.Table:
        return t.append_column(
            "value_dollars",
            pc.divide(
                pc.cast(t["value_cents"], pa.float64()), 100.0
            ),
        )

    eng.backfill(add_dollars)
    return eng.final_table()


def q_cdc_delete_where(sf_dir: str) -> pa.Table:
    """Predicate DELETE over the live LWW table (``delete_where``):
    the engine scans live buckets, synthesizes DELETE change events
    for every matching row (seqs above the lake's max), stages them
    crash-safely under ``_dml/`` and commits them through the normal
    exactly-once replay — the Delta-Lake ``DELETE FROM ... WHERE``
    analog. Here: purge every live 'click' row. Oracle: the LWW window
    snapshot with the predicate's complement."""
    work = tempfile.mkdtemp(prefix="gepr_dml_del_")
    ev_dir = _events_as_cdc(sf_dir, work)
    eng = ReplayEngine(user_state_spec(), os.path.join(work, "lake"))
    eng.replay(ev_dir)
    eng.delete_where(lambda t: pc.equal(t["event_type"], "click"))
    return eng.final_table()


def q_cdc_update_where(sf_dir: str) -> pa.Table:
    """Predicate UPDATE (``update_where``): rewrite matching live rows
    by committing synthesized UPDATE events carrying the transformed
    payload — validation, change feed, time travel and replicas all see
    an ordinary batch. Here: +1000 cents on every live 'purchase' row.
    Oracle: the LWW snapshot with a CASE rewrite."""
    work = tempfile.mkdtemp(prefix="gepr_dml_upd_")
    ev_dir = _events_as_cdc(sf_dir, work)
    eng = ReplayEngine(user_state_spec(), os.path.join(work, "lake"))
    eng.replay(ev_dir)
    eng.update_where(
        lambda t: pc.equal(t["event_type"], "purchase"),
        lambda rows: {"value_cents": pc.add(rows["value_cents"], 1000)},
    )
    return eng.final_table()


def q_cdc_merge_into(sf_dir: str) -> pa.Table:
    """MERGE INTO / snapshot-apply (``merge_into``): replay the CDC
    stream, then merge a source snapshot — the live 'purchase' rows
    with +500 cents — with ``delete_unmatched=True``, so the live table
    becomes exactly that source. Upserts and unmatched-key deletes are
    synthesized CDC events through the exactly-once replay (same
    ``_dml/`` staging contract as delete_where/update_where). Gate:
    pytest (hash-exact vs the DuckDB LWW window filtered+rewritten the
    same way, tests/test_dml_queries.py)."""
    work = tempfile.mkdtemp(prefix="gepr_merge_")
    ev_dir = _events_as_cdc(sf_dir, work)
    eng = ReplayEngine(user_state_spec(), os.path.join(work, "lake"))
    eng.replay(ev_dir)
    live = eng.final_table()
    src = live.filter(pc.equal(live["event_type"], "purchase"))
    src = src.set_column(
        src.schema.get_field_index("value_cents"),
        "value_cents",
        pc.add(src["value_cents"], 500),
    )
    eng.merge_into(src, delete_unmatched=True)
    return eng.final_table()


def q_cdc_restore(sf_dir: str) -> pa.Table:
    """RESTORE TO VERSION (``restore``): replay the 4-batch CDC stream
    with history retained, then roll the live table back to the batch-1
    snapshot — a MERGE of the time-travel snapshot with unmatched-key
    deletes, committed as an ordinary batch (history preserved, change
    feed shows the rollback). Gate: pytest (hash-exact vs the DuckDB
    LWW window restricted to batches <= 1, tests/test_dml_queries.py)."""
    work = tempfile.mkdtemp(prefix="gepr_restore_")
    ev_dir = _events_as_cdc(sf_dir, work, n_batches=4)
    eng = ReplayEngine(
        user_state_spec(), os.path.join(work, "lake"), gc_old_versions=False
    )
    eng.replay(ev_dir)
    eng.restore(1)
    return eng.final_table()


def q_rows_frame_agg(sf_dir: str):
    """ROWS-frame window aggregate (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW): per event, the sum and count of the user's last 3
    values in event_id order — the fixed-row-count companion to the
    RANGE-frame ``sliding_window_30m``. One hash shuffle on the key;
    per group a sort + prefix-sum difference, no per-row loop.
    Gate: pytest (hash-exact vs the DuckDB ROWS-frame window,
    tests/test_rows_frame.py)."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])
    k = 2  # preceding rows

    def frame(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")
        cents = (
            np.round(g["value"].to_numpy(zero_copy_only=False) * 100)
            .astype(np.int64)[order]
        )
        n = len(cents)
        csum = np.concatenate(([0], np.cumsum(cents)))
        lo = np.maximum(np.arange(n) - k, 0)
        frame_sum = csum[np.arange(n) + 1] - csum[lo]
        frame_n = np.arange(n) + 1 - lo
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": g["user_id"].take(pa.array(order)),
                "frame_sum_cents": pa.array(frame_sum, pa.int64()),
                "frame_n": pa.array(frame_n, pa.int64()),
            }
        )

    return grouped_apply(ds, ["user_id"], frame)


def q_classifier_score(sf_dir: str):
    """Hashed-feature linear classifier scoring (the fastText-style
    quality/domain classifier stage): actor-pool model scoring with the
    weight vector built once per actor, fully vectorized hashing +
    gather + bincount per batch. Gate: pytest (bit-exact vs a
    single-threaded reference of the same fixed float64 expression;
    determinism across partitionings, tests/test_classifier.py)."""
    from glue_etl_pipeline_ray.functions.classify import classifier_score

    return classifier_score(_t(sf_dir, "documents", ["doc_id", "text"]))


def q_rank_functions(sf_dir: str):
    """Rank-family window functions in one pass: per user, each event's
    dense_rank and percent_rank over value cents (ties RANK together —
    the tie semantics are the point of the family) plus ntile(4) over
    the (cents, event_id) total order (ntile needs a deterministic tie
    order to be well-defined). One hash shuffle on the key, one argsort
    + vectorized rank math per group, no per-row loop. Gate: pytest
    (hash-exact vs the DuckDB window trio, tests/test_rank_functions.py,
    incl. a planted-ties fixture)."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply

    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def ranks(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = np.round(
            g["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.lexsort((eid, cents))
        c_s, e_s = cents[order], eid[order]
        n = len(c_s)
        pos = np.arange(n)
        # rank ties on cents ONLY (rank/dense_rank/percent_rank are
        # about equal sort keys; event_id only serializes ntile below)
        new_run = np.r_[True, c_s[1:] != c_s[:-1]]
        run_first = np.maximum.accumulate(np.where(new_run, pos, 0))
        rank = run_first + 1
        # dense_rank: 1 + number of distinct smaller keys
        dense = np.cumsum(new_run)
        # percent_rank = (rank - 1) / (n - 1), 0 for single-row groups
        pct = (rank - 1) / max(n - 1, 1)
        # ntile(4): first (n % 4) tiles get ceil(n/4) rows (SQL rule)
        tiles = 4
        base, rem = divmod(n, tiles)
        sizes = np.full(tiles, base) + (np.arange(tiles) < rem)
        tile = np.repeat(np.arange(1, tiles + 1), sizes)[:n]
        return pa.table(
            {
                "event_id": pa.array(e_s, pa.int64()),
                "user_id": g["user_id"].take(pa.array(order)),
                "dense_rank": pa.array(dense, pa.int64()),
                "percent_rank": pa.array(pct, pa.float64()),
                "tile4": pa.array(tile, pa.int64()),
            }
        )

    return grouped_apply(ds, ["user_id"], ranks)


def q_pagerank_suppliers(sf_dir: str):
    """PageRank over the customer->supplier purchase graph (orders x
    lineitem edges, both directions so influence flows both ways): which
    suppliers/customers sit centrally in the trade network.

    Plan: orders is a DATA-scale table, so the orderkey->custkey lookup
    is a hash-shuffle equi-join (both sides partitioned on orderkey,
    grouped_apply exchange), never a driver-side broadcast build. Node ids use a parity encoding (customer=2k,
    supplier=2k+1) that is provably collision-free at every scale
    factor. PageRank itself: driver-held rank vector + one shuffle-free
    map pass per iteration, partials folded vectorized from Arrow block
    refs (the k-means partial-fold discipline). Gate: pytest (numpy
    power-iteration reference within 1e-12, mass conservation,
    planted-hub ordering, distributed-path equality,
    tests/test_pagerank.py)."""
    from glue_etl_pipeline_ray.functions.pagerank import pagerank

    from glue_etl_pipeline_ray.functions.joins import inner_join

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    # grouped_apply-exchange inner join (vs the native Dataset.join the
    # hash_join_orders query demonstrates): same hash-partitioned plan,
    # ~2x lower fixed overhead at this scale via the cost-based
    # exchange. 16 partitions: the join output feeds 11 iterative map
    # passes, so block count = partition count is a per-pass task-count
    # knob, not just a join knob
    joined = inner_join(li, orders, on="l_orderkey", num_partitions=16)

    def to_edges(t: pa.Table) -> pa.Table:
        cust = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sup = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # disjoint id spaces by parity: customers even, suppliers odd
        cust_node = cust * 2
        sup_node = sup * 2 + 1
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([cust_node, sup_node]), pa.int64()
                ),
                "dst": pa.array(
                    np.concatenate([sup_node, cust_node]), pa.int64()
                ),
            }
        )

    edges = joined.map_batches(to_edges, batch_format="pyarrow", batch_size=None)
    return pagerank(edges, iters=10)


def q_dedup_fuzzy_keep_one(sf_dir: str):
    """Corpus-level fuzzy dedup with cluster-representative retention —
    the standard keep-one recipe composed end-to-end: exact
    n-gram-Jaccard duplicate pairs -> connected components -> each
    cluster keeps its min doc_id -> one shuffle-free filter pass emits
    the surviving corpus (same output shape as ``dedup_exact``).

    Scale shape: the drop set (clustered docs that are NOT their
    cluster's representative) is dedup OUTPUT — aggregate-sized by the
    same argument as ``q_dedup_clusters`` — so it ships ONCE via
    ``ray.put`` as a sorted int64 array and every batch filters with one
    vectorized ``np.searchsorted`` membership probe; the corpus itself
    never shuffles. Gate: hash-exact DuckDB recursive-CTE equivalent
    (``tests/test_fuzzy_keep_one.py``)."""
    from glue_etl_pipeline_ray.functions.cc import connected_components

    pairs = ngram_jaccard_pairs(
        _t(sf_dir, "documents", ["doc_id", "text"]), tau_num=4, tau_den=5
    )
    comp = connected_components(pairs, "doc_id_a", "doc_id_b")
    drop_parts = ray.get(
        comp.map_batches(
            lambda t: t.filter(
                pc.invert(pc.equal(t["node"], t["component"]))
            ).select(["node"]),
            batch_format="pyarrow",
            batch_size=None,
        ).to_arrow_refs()
    )
    drop = np.unique(
        pa.concat_tables(drop_parts)["node"].to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    drop_ref = ray.put(drop)

    def keep(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(d, ids)
        pos_c = np.minimum(pos, max(len(d) - 1, 0))
        dropped = (d[pos_c] == ids) if len(d) else np.zeros(len(ids), bool)
        return t.filter(pa.array(~dropped))

    docs = _t(
        sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"]
    )
    return docs.map_batches(keep, batch_format="pyarrow", batch_size=None)


# ===================================================== moment aggregates


def q_grouped_stats(sf_dir: str):
    """Grouped second-moment aggregate (count / sum / mean / sample
    variance) from ONE pass of exact integer partials — the A1/A2
    tally family (reference data_profiling.py:176-189) extended to
    true statistics.

    Exactness contract (what makes a float-valued aggregate
    hash-exact against DuckDB): per-block partials keep cents and
    cents^2 as int64 (both fit for any plausible block size), the
    driver fold uses Python arbitrary-precision ints — mirroring
    DuckDB's HUGEINT sums — and only the FINAL mean and variance
    perform a correctly-rounded int->float64 cast plus one IEEE
    division, the exact op sequence the oracle SQL spells out. No
    Welford drift, no order dependence: the partials are commutative
    integer sums."""
    import math  # noqa: F401  (parity with q_corr_qty_price)

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        c = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keys, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        s = np.zeros(len(keys), np.int64)
        s2 = np.zeros(len(keys), np.int64)
        np.add.at(s, inv, c)  # int64 accumulation: exact, unlike
        np.add.at(s2, inv, c * c)  # bincount's float64 weights
        return pa.table(
            {
                "k": pa.array([str(x) for x in keys], pa.string()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "s2": pa.array(s2, pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # aggregate-sized: one row per (block, event_type)
    acc: dict[str, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["k"], [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["s"])
        a[2] += int(r["s2"])
    keys = sorted(acc)
    n_l, s_l, mean_l, var_l = [], [], [], []
    for k in keys:
        n, s, s2 = acc[k]
        n_l.append(n)
        s_l.append(s)
        mean_l.append(float(s) / float(n))
        # sample variance is undefined for n < 2: null, matching the
        # oracle's explicit CASE (DuckDB would also NULL the 0-divide)
        var_l.append(
            float(n * s2 - s * s) / float(n * (n - 1)) if n > 1 else None
        )
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_events": pa.array(n_l, pa.int64()),
            "sum_cents": pa.array(s_l, pa.int64()),
            "mean_cents": pa.array(mean_l, pa.float64()),
            "var_samp_cents2": pa.array(var_l, pa.float64()),
        }
    )


def q_corr_qty_price(sf_dir: str):
    """Per-group Pearson correlation (lineitem quantity vs price) from
    ONE pass of exact integer moment partials — no second scan, no
    shuffle; the five sums (n, Sx, Sy, Sxx, Sxy, Syy) are the
    classic mergeable covariance sketch.

    Scaling: x = floor(quantity*100), y = floor(price) whole dollars
    so the per-block int64 squares can never overflow (y^2 <= 1.1e10
    per row; ~5M-row blocks stay < 2^63). floor — not round — because
    DuckDB rounds half away from zero while numpy rounds half to even,
    and 2-decimal prices floored to dollars hit exact .5 ties; floor
    of the identical double is unambiguous in both engines. The driver
    fold is Python-int exact; corr = num / sqrt(vx * vy) is evaluated
    in the SAME IEEE op order the oracle SQL uses, so the float output
    is bit-equal."""
    import math

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        f = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        keys, inv = np.unique(f, return_inverse=True)
        out = {"k": pa.array([str(v) for v in keys], pa.string())}
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        cols = {"sx": x, "sy": y, "sxx": x * x, "sxy": x * y, "syy": y * y}
        out["n"] = pa.array(n, pa.int64())
        for name, v in cols.items():
            a = np.zeros(len(keys), np.int64)
            np.add.at(a, inv, v)
            out[name] = pa.array(a, pa.int64())
        return pa.table(out)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    acc: dict[str, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["k"], [0, 0, 0, 0, 0, 0])
        for i, f in enumerate(("n", "sx", "sy", "sxx", "sxy", "syy")):
            a[i] += int(r[f])
    keys = sorted(acc)
    rows = {
        "l_returnflag": [],
        "n_rows": [],
        "cov_numer": [],
        "var_x_numer": [],
        "var_y_numer": [],
        "corr_xy": [],
    }
    for k in keys:
        n, sx, sy, sxx, sxy, syy = acc[k]
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        rows["l_returnflag"].append(k)
        rows["n_rows"].append(n)
        rows["cov_numer"].append(float(num))
        rows["var_x_numer"].append(float(vx))
        rows["var_y_numer"].append(float(vy))
        # constant column -> zero variance -> corr undefined: null,
        # matching DuckDB's x/0.0 -> NULL semantics
        denom = math.sqrt(float(vx) * float(vy))
        rows["corr_xy"].append(float(num) / denom if denom > 0 else None)
    return pa.table(
        {
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "cov_numer": pa.array(rows["cov_numer"], pa.float64()),
            "var_x_numer": pa.array(rows["var_x_numer"], pa.float64()),
            "var_y_numer": pa.array(rows["var_y_numer"], pa.float64()),
            "corr_xy": pa.array(rows["corr_xy"], pa.float64()),
        }
    )


def q_cube_agg(sf_dir: str):
    """CUBE(l_returnflag, l_linestatus): all four grouping sets —
    (f,s), (f,*), (*,s), (*,*) — from ONE pass. Like q_rollup_agg,
    the finest level is pre-combined inside map_batches (one row per
    block x group, aggregate-sized) and every coarser level is folded
    from those partials on the driver; the full table is scanned
    exactly once and never shuffled. Rolled-up levels carry the '*'
    sentinel so the grouping columns stay non-null strings."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t["l_returnflag"], t["l_linestatus"], "|"
        ).to_numpy(zero_copy_only=False)
        q = np.round(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keys, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        s = np.zeros(len(keys), np.int64)
        np.add.at(s, inv, q)
        return pa.table(
            {
                "k": pa.array([str(v) for v in keys], pa.string()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    fine: dict[tuple[str, str], list[int]] = {}
    for r in parts:
        f, s = r["k"].split("|", 1)
        a = fine.setdefault((f, s), [0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["s"])
    cube: dict[tuple[str, str], list[int]] = {}
    for (f, s), (n, q) in fine.items():
        for key in ((f, s), (f, "*"), ("*", s), ("*", "*")):
            a = cube.setdefault(key, [0, 0])
            a[0] += n
            a[1] += q
    keys = sorted(cube)
    return pa.table(
        {
            "l_returnflag": pa.array([k[0] for k in keys], pa.string()),
            "l_linestatus": pa.array([k[1] for k in keys], pa.string()),
            "n_rows": pa.array([cube[k][0] for k in keys], pa.int64()),
            "sum_qty_x100": pa.array([cube[k][1] for k in keys], pa.int64()),
        }
    )


def q_scd2_history(sf_dir: str):
    """SCD Type-2 dimension history: per (user) key ordered by event
    seq, each event becomes a validity interval [valid_from, valid_to)
    with -1 marking the open (current) interval — the CDC lake's
    change-history materialization (the LWW upsert keeps only the LAST
    interval; this keeps them all).

    Shape: ONE keyed exchange; each hash partition is processed by a
    fully VECTORIZED kernel (lexsort + shifted compare — no per-key
    Python), so cost is O(rows log rows_per_partition) and no partition
    ever sees more than its key-hash share."""
    from glue_etl_pipeline_ray.functions.groups import grouped_apply_partitions

    ds = _t(sf_dir, "events", ["user_id", "event_id", "event_type", "value"])

    def intervals(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, uid))
        uid, eid = uid[order], eid[order]
        et = t["event_type"].take(pa.array(order))
        cents = _cents(t["value"].take(pa.array(order)))
        same_next = np.zeros(len(uid), bool)
        if len(uid):
            same_next[:-1] = uid[1:] == uid[:-1]
        valid_to = np.full(len(uid), -1, np.int64)
        if len(uid):
            valid_to[:-1] = np.where(same_next[:-1], eid[1:], -1)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_type": et,
                "value_cents": cents,
                "valid_from": pa.array(eid, pa.int64()),
                "valid_to": pa.array(valid_to, pa.int64()),
                "is_current": pa.array(valid_to == -1, pa.bool_()),
            }
        )

    return grouped_apply_partitions(ds, ["user_id"], intervals)


def q_full_outer_join(sf_dir: str):
    """FULL OUTER join of two aggregates over the same source (per
    (user, day) click cells vs purchase cells, with per-side counts
    and a both/left_only/right_only indicator — (user, day) because
    the synthetic data is dense at user granularity, so only the
    finer key produces genuinely unmatched rows on BOTH sides).

    Re-expressed Ray-native: because both sides derive from ONE table,
    the full-outer collapses to a single grouped aggregate — each block
    emits per-cell (clicks, purchases) count partials and the keyed
    fold is the join; unmatched sides fall out as zero counts. One scan
    + one aggregate-sized exchange instead of two scans + an outer-join
    shuffle; the DuckDB gate spells the literal FULL OUTER JOIN to pin
    the semantics."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            t["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cell = uid * 1_000_000 + day  # day < 1e6 forever; collision-free
        keys, inv = np.unique(cell, return_inverse=True)
        clicks = np.bincount(
            inv, weights=(et == "click"), minlength=len(keys)
        ).astype(np.int64)
        purch = np.bincount(
            inv, weights=(et == "purchase"), minlength=len(keys)
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(keys // 1_000_000, pa.int64()),
                "epoch_day": pa.array(keys % 1_000_000, pa.int64()),
                "n_clicks": pa.array(clicks, pa.int64()),
                "n_purchases": pa.array(purch, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    folded = partial_groupby_sum(
        parts, ["user_id", "epoch_day"], ["n_clicks", "n_purchases"]
    )

    def finish(t: pa.Table) -> pa.Table:
        c = t["n_clicks"].to_numpy(zero_copy_only=False)
        p = t["n_purchases"].to_numpy(zero_copy_only=False)
        keep = (c > 0) | (p > 0)
        side = np.where(
            (c > 0) & (p > 0), "both", np.where(c > 0, "left_only", "right_only")
        )
        t = t.append_column("side", pa.array(side, pa.string()))
        return t.filter(pa.array(keep))

    return folded.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ============================================== round-5 session-2 additions


def q_vocab_lev1(sf_dir: str):
    """Near-miss key detection: all pairs of DISTINCT part names at
    edit distance exactly 1 — the fuzzy-matching / typo-clustering
    step of entity resolution, via the FastSS deletion-neighborhood
    EQUI-join (functions/fuzzy.py) instead of the quadratic
    levenshtein cross join the predicate naively demands.

    Scale shape: the corpus is touched once (distinct-term partials);
    every later stage is vocabulary-sized. Gate: hash-exact DuckDB
    ``levenshtein(a,b) = 1`` oracle + a planted-typo fixture covering
    substitution/insertion/deletion (tests/test_vocab_lev1.py)."""
    from glue_etl_pipeline_ray.functions.fuzzy import vocab_lev1_pairs

    return vocab_lev1_pairs(
        _t(sf_dir, "part", ["p_name"]), col="p_name", mode="values"
    )


def q_triangle_count(sf_dir: str):
    """Per-supplier triangle counts over the co-supplier graph (two
    suppliers are adjacent iff they ship lines of the same order) —
    the graph-statistics kernel (local clustering / community
    features) beside q_pagerank_suppliers' centrality.

    Plan: ONE keyed exchange on l_orderkey builds the distinct edge
    set (per-partition vectorized pair enumeration over per-order
    supplier runs — pairs bounded by order width, the same per-group
    arithmetic as the interval join's sweep); triangle_counts then
    runs the degree-ordered wedge check with the edge CSR broadcast
    once and tasks sized by cumulative wedge count
    (functions/triangles.py — hot-hub safe by the O(m^1.5) orientation
    bound). Gate: hash-exact DuckDB triple-self-join oracle + planted
    graphs (tests/test_triangles.py)."""
    from glue_etl_pipeline_ray.functions.groups import (
        grouped_apply_partitions,
    )
    from glue_etl_pipeline_ray.functions.triangles import (
        enumerate_run_pairs,
        triangle_counts,
    )

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def order_pairs(part: pa.Table) -> pa.Table:
        ok = part["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = part["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ok) == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        order = np.lexsort((sk, ok))
        ok_s, sk_s = ok[order], sk[order]
        # drop repeated (order, supplier) rows, then enumerate each
        # order's supplier pairs (ascending within run -> src < dst)
        first = np.r_[True, (ok_s[1:] != ok_s[:-1]) | (sk_s[1:] != sk_s[:-1])]
        ok_d, sk_d = ok_s[first], sk_s[first]
        starts = np.flatnonzero(np.r_[True, ok_d[1:] != ok_d[:-1]])
        sizes = np.diff(np.r_[starts, len(ok_d)])
        run_idx, i, j = enumerate_run_pairs(sizes)
        u = sk_d[starts[run_idx] + i]
        v = sk_d[starts[run_idx] + j]
        key = np.unique((u << np.int64(32)) | v)
        return pa.table(
            {
                "src": pa.array(key >> np.int64(32), pa.int64()),
                "dst": pa.array(key & np.int64((1 << 32) - 1), pa.int64()),
            }
        )

    edges = grouped_apply_partitions(
        li, ["l_orderkey"], order_pairs, num_partitions=32
    )
    return triangle_counts(edges, "src", "dst")


def q_bpe_train(sf_dir: str):
    """Tokenizer construction: learn the corpus's top-40 BPE merges
    (pair, merged token, weighted count) — the training step whose
    OUTPUT functions/text.py's BpeTokenCount consumes.

    Shape: one distributed word-count pass over the corpus, then the
    word vocabulary lives hash-sharded as persistent Ray task state;
    each of the 40 rounds exchanges only pair-count partials (bounded
    by distinct adjacent pairs) and one broadcast merge decision —
    corpus rows are never rescanned (functions/bpe.py). Gate: exact
    merge-sequence equality vs the single-process textbook
    implementation on this corpus + planted tie/overlap fixtures
    (tests/test_bpe.py)."""
    from glue_etl_pipeline_ray.functions.bpe import bpe_train

    return bpe_train(
        _t(sf_dir, "documents", ["text"]), text_col="text", n_merges=40
    )


def q_copurchase_cosine(sf_dir: str):
    """Customer co-purchase similarity: all customer pairs whose
    part-basket count vectors have cosine >= 0.2 — the
    collaborative-filtering / kNN-graph edge list, via the exact
    integer all-pairs formulation (functions/sparse_sim.py: one
    inverted-index exchange on the part, one pair-fold exchange, the
    threshold decided in int64 cross-multiplication, never a float).

    Baskets come from one hash equi-join (lineitem x orders); the
    (id, term, c, n2) vectors build in a single keyed exchange so the
    squared norm rides into the index instead of joining an id-scale
    norms table onto the pairs. Gate: hash-exact DuckDB oracle
    (tests/test_sparse_sim.py; 3180 pairs at sf0.001)."""
    from glue_etl_pipeline_ray.functions.joins import inner_join
    from glue_etl_pipeline_ray.functions.sparse_sim import (
        cosine_pairs_exact,
        tf_with_norms,
    )

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    joined = inner_join(li, orders, on="l_orderkey", num_partitions=16)
    tf = tf_with_norms(joined, "o_custkey", "l_partkey")
    return cosine_pairs_exact(tf, tau_num=1, tau_den=5)


def synth_phash_dup_payloads(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic PNG fixture with PLANTED visual near-duplicates:
    rows with ``doc_id % 10 == 1`` re-encode doc_id-1's seeded image
    with three +/-1 single-channel pixel tweaks (imperceptible — the
    re-encode/resize/crop-robustness class pHash exists for). Every
    97th payload is truncated to exercise the decode dead-letter path
    (a corrupted member drops its planted pair — the pytest oracle
    accounts for both rules)."""
    from glue_etl_pipeline_ray.functions.png import png_encode

    payloads = []
    for did in t[id_col].to_pylist():
        base_id = did - 1 if did % 10 == 1 else did
        rng = np.random.default_rng(base_id)
        h, w = 16 + base_id % 9, 16 + (base_id // 3) % 9
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if did != base_id:
            tweak = np.random.default_rng(did)
            arr = arr.copy()
            for _ in range(3):
                y, x, c = (
                    int(tweak.integers(0, h)),
                    int(tweak.integers(0, w)),
                    int(tweak.integers(0, 3)),
                )
                arr[y, x, c] = np.uint8(
                    min(255, max(0, int(arr[y, x, c]) + 1))
                )
        p = png_encode(arr)
        if did % 97 == 0:
            p = p[: len(p) // 2]  # truncated -> decode dead-letter
        payloads.append(p)
    return pa.table(
        {id_col: t[id_col], "payload": pa.array(payloads, pa.binary())}
    )


def q_dedup_phash(sf_dir: str):
    """Perceptual-hash image near-dup detection over the REAL codec:
    PNG payloads -> native decode -> 64-bit pHash (grayscale, box-mean
    32x32, 2-D DCT, median threshold; DCT basis built once per actor)
    -> 4x16-bit pigeonhole banding -> exact hamming verify (<= 3)
    inside band buckets. The image-side sibling of simhash dedup: one
    keyed exchange over 4 rows/image regardless of corpus size; decode
    failures dead-letter upstream and never enter the pair graph.

    Rows-only driver gate; the planted-pair recall/precision oracle is
    tests/test_phash.py (pairs = exactly the synthesized near-dups
    whose members both decode)."""
    from glue_etl_pipeline_ray.functions.dedup import hamming_pairs
    from glue_etl_pipeline_ray.functions.multimodal import PngPerceptualHasher

    ds = _t(sf_dir, "documents", ["doc_id"])
    binary = ds.map_batches(
        synth_phash_dup_payloads, batch_format="pyarrow", batch_size=256
    )
    hashed = binary.map_batches(
        PngPerceptualHasher,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 8),
    )
    return hamming_pairs(hashed, "phash", max_hamming=3)


def q_ann_pq_topk(sf_dir: str):
    """Product-quantization ANN (ADC + exact re-rank): the
    compressed-domain third leg of the ANN family next to brute
    (`ann_cosine_topk`), IVF (`ann_ivf_topk`) and JL project-rerank
    (`ann_project_rerank`). Codebooks train on the deterministic
    content-hash sample; blocks score via per-query lookup-table
    gathers over 8 uint8 codes/vector (32x fewer bytes than float32
    d=64 — the corpus representation you'd persist and scan at 100 TB).
    Rows-only driver gate; recall@10-vs-brute oracle in
    tests/test_pq.py."""
    from glue_etl_pipeline_ray.functions.similarity import pq_topk

    q, ids = _query_vectors(sf_dir)
    return pq_topk(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), q, ids, k=10
    )


def q_cdc_filter_scan(sf_dir: str):
    """Predicate-pushdown scan of the LWW lake: replay the change
    stream, then ``scan(where=[("event_type", "==", "purchase")])`` —
    the filter rides into the Parquet scanner so row groups whose
    statistics exclude the value never decompress, and pre-evolution
    files are skipped whole. Gate: hash-exact vs the DuckDB LWW window
    query with the same WHERE."""
    work = tempfile.mkdtemp(prefix="gepr_cdc_fs_")
    ev_dir = _events_as_cdc(sf_dir, work)
    eng = ReplayEngine(user_state_spec(), os.path.join(work, "lake"))
    eng.replay(ev_dir)
    return eng.scan([("event_type", "==", "purchase")])


def q_decontaminate_embed(sf_dir: str):
    """Embedding-space benchmark decontamination (the semantic sibling
    of `decontaminate`): vectors with ``vec_id % 17 == 0`` play the
    held-out benchmark; every other vector survives iff its max cosine
    against the whole benchmark is < 0.4. One object-store broadcast of
    the (aggregate-sized) benchmark matrix + one shuffle-free block
    matmul per training batch. Gate: pytest hash-exact vs DuckDB's
    ``list_cosine_similarity`` NOT-EXISTS anti-join (the driver window
    is saturated, so this rides the pytest-DuckDB gate)."""
    from glue_etl_pipeline_ray.functions.decontaminate import (
        decontaminate_embed,
    )

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _side(want_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % 17 == 0) == want_bench))

        return f

    bench = ds.map_batches(_side(True), batch_format="pyarrow", batch_size=None)
    train = ds.map_batches(_side(False), batch_format="pyarrow", batch_size=None)
    kept = decontaminate_embed(train, bench, tau=0.4)
    return kept.map_batches(
        lambda t: t.select(["vec_id"]), batch_format="pyarrow", batch_size=None
    )


def q_dedup_phash_keep_one(sf_dir: str):
    """Image-corpus keep-one dedup composed end-to-end over the REAL
    codec: pHash near-dup pairs (``dedup_phash``) -> connected
    components -> each visual cluster keeps its min doc_id -> one
    shuffle-free filter pass over the image corpus. The multimodal
    sibling of ``dedup_fuzzy_keep_one``, with the same scale shape: the
    drop set is dedup OUTPUT (aggregate-sized), shipped once via
    ``ray.put``; the corpus never shuffles. Decode dead-letters keep
    their rows (they carry ``error``, are in no cluster, and survive to
    be quarantined by the caller — never silently dropped). Gate:
    pytest set-oracle from the planted-duplicate fixture."""
    from glue_etl_pipeline_ray.functions.cc import connected_components
    from glue_etl_pipeline_ray.functions.dedup import hamming_pairs
    from glue_etl_pipeline_ray.functions.multimodal import PngPerceptualHasher

    ds = _t(sf_dir, "documents", ["doc_id"])
    binary = ds.map_batches(
        synth_phash_dup_payloads, batch_format="pyarrow", batch_size=256
    )
    hashed = binary.map_batches(
        PngPerceptualHasher,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 8),
    ).materialize()  # hashed once, read by both the pair join and the filter
    pairs = hamming_pairs(hashed, "phash", max_hamming=3)
    comp = connected_components(pairs, "doc_id_a", "doc_id_b")
    drop_parts = ray.get(
        comp.map_batches(
            lambda t: t.filter(
                pc.invert(pc.equal(t["node"], t["component"]))
            ).select(["node"]),
            batch_format="pyarrow",
            batch_size=None,
        ).to_arrow_refs()
    )
    drop = np.unique(
        pa.concat_tables(drop_parts)["node"].to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    drop_ref = ray.put(drop)

    def keep(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(d, ids)
        pos_c = np.minimum(pos, max(len(d) - 1, 0))
        dropped = (d[pos_c] == ids) if len(d) else np.zeros(len(ids), bool)
        return t.filter(pa.array(~dropped))

    return hashed.map_batches(keep, batch_format="pyarrow", batch_size=None)


def q_topk_per_group_sketch(sf_dir: str):
    """Per-user top event types via the GROUPED SpaceSaving-style
    sketch (`functions/sketch.grouped_heavy_hitters`): per-(group,
    block) truncated exact partials with dropped-mass bounds, one
    bounded exchange on the group column, per-group fold with
    [count_min, count_max]. With partial_m >= the per-user event-type
    cardinality the slack is 0 and the output is exact — gated
    hash-exact vs DuckDB's row_number window in
    tests/test_grouped_hh.py (window saturated, pytest gate)."""
    from glue_etl_pipeline_ray.functions.sketch import grouped_heavy_hitters

    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    out = grouped_heavy_hitters(
        ds, "user_id", "event_type", k=3, partial_m=32
    )
    return out
