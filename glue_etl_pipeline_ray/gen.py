"""Deterministic synthetic fixtures: source-repo table + change-event stream.

Implements FIXTURES.md F1-F4 (seeded, in-repo, no external data):

- F1 key space: ``repo = org{i}/repo{j}`` Zipf-skewed (hot-repo skew
  fixture), ``path = src/dir{a}/file{b}.{ext}``.
- F2 change events: ``(seq, batch_id, op, repo, path, commit, lang,
  content, event_id, ts)`` in global ``seq`` order, split into per-batch
  Parquet files ``events/batch=NNNNN.parquet`` (batch = checkpoint
  granularity, analog of the reference's per-run ``event_files`` list,
  ``update_workflow_properties.py:160``).
- F3 dirty events: null keys / bad commit hex / unknown op / out-of-enum
  lang / null content on upsert (analog of the e2e inputs' malformed +
  unknown-service events, ``data_profiling.py:102-110,190-202``).
- F4 schema evolution: batches >= ``evolve_from_batch`` carry an extra
  ``size_bytes:int64`` column (analog of null-backfilled new fields,
  ``flat_jsons.py:85-110``).

Content strings come from a seeded pool (``content_pool``) so generating
1e7+ events stays vectorized; a few pool entries are very wide
(wide-record fixture).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "def class return import for while if else try except lambda yield "
    "async await self none true false print range len dict list set map "
    "filter sum min max open read write close json parse encode decode"
).split()

_EXTS = {"py": "py", "js": "js", "java": "java", "go": "go", "rs": "rs", "md": "md"}
_LANGS = list(_EXTS)


def make_content_pool(rng: np.random.Generator, size: int, avg_tokens: int = 40) -> np.ndarray:
    """Seeded pool of pseudo-code strings; log-normal lengths, a few huge."""
    lens = np.maximum(3, rng.lognormal(np.log(avg_tokens), 0.8, size).astype(int))
    lens[:: max(1, size // 50)] *= 20  # wide-record rows
    words = np.array(_WORDS)
    out = np.empty(size, dtype=object)
    for i, n in enumerate(lens):
        out[i] = " ".join(words[rng.integers(0, len(words), n)])
    return out


def _hex40(rng: np.random.Generator, n: int) -> np.ndarray:
    """n deterministic 40-hex commit ids (vectorized)."""
    raw = rng.integers(0, 1 << 60, size=(n, 3), dtype=np.int64)
    return np.array(
        ["%015x%015x%010x" % (a, b, c & 0xFFFFFFFFFF) for a, b, c in raw],
        dtype=object,
    )


_HEX_DIGITS = np.frombuffer(b"0123456789abcdef", np.uint8)
_DEC_DIGITS = np.frombuffer(b"0123456789", np.uint8)


_DIGIT_CHUNK = 1 << 18  # rows per block: keeps x + the strided output
# window cache-resident — whole-column strided digit writes re-touch
# DRAM w times and collapse under concurrent generator tasks
# (measured 5.7x slower at 6-way parallelism)


def _hex_mat(v: np.ndarray, w: int) -> np.ndarray:
    """(n, w) uint8 matrix of the w-digit zero-padded hex of each value
    — the vectorized equivalent of ``"%0{w}x" % v`` (same characters)."""
    out = np.empty((len(v), w), np.uint8)
    for s in range(0, len(v), _DIGIT_CHUNK):
        x = v[s : s + _DIGIT_CHUNK].astype(np.uint64)
        sub = out[s : s + _DIGIT_CHUNK]
        for i in range(w - 1, -1, -1):
            sub[:, i] = _HEX_DIGITS[(x & np.uint64(0xF)).astype(np.intp)]
            x >>= np.uint64(4)
    return out


def _dec_mat(v: np.ndarray, w: int) -> np.ndarray:
    """(n, w) uint8 matrix, zero-padded decimal (``"%0{w}d" % v``)."""
    out = np.empty((len(v), w), np.uint8)
    for s in range(0, len(v), _DIGIT_CHUNK):
        x = v[s : s + _DIGIT_CHUNK].astype(np.uint64)
        sub = out[s : s + _DIGIT_CHUNK]
        for i in range(w - 1, -1, -1):
            sub[:, i] = _DEC_DIGITS[(x % np.uint64(10)).astype(np.intp)]
            x //= np.uint64(10)
    return out


def _fixed_width_strings(mat: np.ndarray):
    """Zero-copy Arrow string array from an (n, w) uint8 char matrix.

    ``pa.string()`` offsets are int32: a batch whose total chars exceed
    2^31 would silently wrap ``np.arange(..., dtype=np.int32)`` into
    corrupt offsets, so past that bound the matrix is emitted as a
    ChunkedArray of int32-safe slices instead (a 40-char column crosses
    it at ~53M rows per batch — reachable with a low n_batches at the
    10^9+ scales this generator serves)."""
    n, w = mat.shape
    if (n + 1) * w <= _MAX_STR_CHARS:
        offsets = np.arange(0, (n + 1) * w, w, dtype=np.int32)
        return pa.Array.from_buffers(
            pa.string(),
            n,
            [None, pa.py_buffer(offsets), pa.py_buffer(np.ascontiguousarray(mat))],
        )
    rows_per_chunk = max(1, (_MAX_STR_CHARS - w) // w)
    chunks = [
        _fixed_width_strings(mat[s : s + rows_per_chunk])
        for s in range(0, n, rows_per_chunk)
    ]
    return pa.chunked_array(chunks)


# int32 offset ceiling for pa.string(); module-level so the chunked
# path is unit-testable without a 2 GiB fixture
_MAX_STR_CHARS = np.iinfo(np.int32).max


def _hex40_arrow(rng: np.random.Generator, n: int) -> pa.Array:
    """Same draws and characters as :func:`_hex40`, built columnar:
    digit-table extraction instead of a per-row ``%``-format loop
    (8.4 us/row -> ~0.5 us/row; the 10^9-soak generator bottleneck)."""
    raw = rng.integers(0, 1 << 60, size=(n, 3), dtype=np.int64)
    return _fixed_width_strings(
        np.hstack(
            [
                _hex_mat(raw[:, 0], 15),
                _hex_mat(raw[:, 1], 15),
                _hex_mat(raw[:, 2] & 0xFFFFFFFFFF, 10),
            ]
        )
    )


def generate_change_events(
    out_dir: str,
    n_events: int = 10_000,
    n_repos: int = 20,
    n_paths: int = 50,
    n_batches: int = 4,
    dirty_frac: float = 0.02,
    delete_frac: float = 0.08,
    evolve_from_batch: int | None = None,
    zipf_a: float = 1.3,
    content_pool_size: int = 2_000,
    seed: int = 42,
    row_group_size: int = 16_384,
    rename_from_batch: int | None = None,
    renamed_source: str = "sz_bytes",
    noise_col_from_batch: int | None = None,
) -> dict:
    """Write per-batch Parquet change-event files; return metadata.

    ``rename_from_batch``: batches >= it carry the evolved column under
    the upstream's NEW name ``renamed_source`` instead of ``size_bytes``
    (same values) — the column-rename fixture; replay with a spec whose
    ``renames=((renamed_source, "size_bytes"),)`` must produce the same
    final state as the un-renamed stream. ``noise_col_from_batch``:
    batches >= it carry an extra ``__ingest_ts`` column for the
    ``ignored_cols`` fixture."""
    rng = np.random.default_rng(seed)
    pool = make_content_pool(rng, content_pool_size)

    # F1 key space: Zipf over repos => hot-repo skew
    repo_idx = np.minimum(rng.zipf(zipf_a, n_events) - 1, n_repos - 1)
    path_idx = rng.integers(0, n_paths, n_events)
    ext_idx = path_idx % len(_LANGS)
    repos = np.array([f"org{i % 7}/repo{i}" for i in range(n_repos)], dtype=object)[repo_idx]
    paths = np.array(
        [f"src/dir{j % 10}/file{j}.{_LANGS[j % len(_LANGS)]}" for j in range(n_paths)],
        dtype=object,
    )[path_idx]
    langs = np.array(_LANGS, dtype=object)[ext_idx]

    seq = np.arange(n_events, dtype=np.int64)
    batch_size = -(-n_events // n_batches)
    batch_id = seq // batch_size
    op = np.where(rng.random(n_events) < delete_frac, "DELETE", "UPSERT").astype(object)
    first = rng.random(n_events) < 0.3
    op[(op == "UPSERT") & first] = "INSERT"
    op[op == "UPSERT"] = "UPDATE"
    commit = _hex40(rng, n_events)
    content = pool[rng.integers(0, content_pool_size, n_events)].copy()
    content[op == "DELETE"] = None
    lang = langs.copy()
    lang[op == "DELETE"] = None
    event_id = np.array([f"ev-{s:012d}-{rng.integers(0, 1 << 30):08x}" for s in seq], dtype=object)
    ts = (1_700_000_000_000 + seq * 137).astype(np.int64)

    # F3 dirty injection. Positions are drawn over ALL rows, DELETEs
    # included (a dirty row always dead-letters, so engine and oracle
    # agree either way) — which means delete_frac is nominal PRE-dirt:
    # mode-4 dirt on a DELETE row turns it into a dead-lettered UPDATE.
    # Kept as-is deliberately: the seeded draws are a reproducibility
    # contract (the recorded soak shas depend on them).
    n_dirty = int(n_events * dirty_frac)
    dirty_pos = rng.choice(n_events, size=n_dirty, replace=False) if n_dirty else np.array([], int)
    repos_d, commit_d, lang_d, content_d, op_d = (repos, commit, lang, content, op)
    for k, pos in enumerate(dirty_pos):
        mode = k % 5
        if mode == 0:
            repos_d[pos] = None  # missing required key
        elif mode == 1:
            commit_d[pos] = "not-a-sha"  # bad hex
        elif mode == 2:
            op_d[pos] = "TAG_IMAGE"  # unknown op (reference bug B2 analog)
        elif mode == 3:
            lang_d[pos] = "klingon"  # out-of-enum
        else:
            op_d[pos] = "UPDATE"
            content_d[pos] = None  # null payload on upsert

    ev_dir = os.path.join(out_dir, "events")
    os.makedirs(ev_dir, exist_ok=True)
    files = []
    for b in range(n_batches):
        m = batch_id == b
        cols = {
            "seq": pa.array(seq[m]),
            "batch_id": pa.array(batch_id[m]),
            "op": pa.array(op[m], pa.string()),
            "repo": pa.array(repos[m], pa.string()),
            "path": pa.array(paths[m], pa.string()),
            "commit": pa.array(commit[m], pa.string()),
            "lang": pa.array(lang[m], pa.string()),
            "content": pa.array(content[m], pa.string()),
            "event_id": pa.array(event_id[m], pa.string()),
            "ts": pa.array(ts[m]),
        }
        if evolve_from_batch is not None and b >= evolve_from_batch:
            sb = np.array([len(c) if c is not None else 0 for c in content[m]], np.int64)
            name = (
                renamed_source
                if rename_from_batch is not None and b >= rename_from_batch
                else "size_bytes"
            )
            cols[name] = pa.array(sb)
        if noise_col_from_batch is not None and b >= noise_col_from_batch:
            cols["__ingest_ts"] = pa.array(
                np.full(int(m.sum()), 1_700_000_000 + b, np.int64)
            )
        f = os.path.join(ev_dir, f"batch={b:05d}.parquet")
        # small row groups = the fan-out unit for the raw-Ray exchange
        pq.write_table(pa.table(cols), f, row_group_size=row_group_size)
        files.append(f)

    return {
        "events_dir": ev_dir,
        "files": files,
        "n_events": n_events,
        "n_batches": n_batches,
        "batch_ids": list(range(n_batches)),
    }


def generate_change_events_parallel(
    out_dir: str,
    n_events: int = 10_000,
    n_repos: int = 20,
    n_paths: int = 50,
    n_batches: int = 4,
    dirty_frac: float = 0.02,
    delete_frac: float = 0.08,
    evolve_from_batch: int | None = None,
    zipf_a: float = 1.3,
    content_pool_size: int = 2_000,
    seed: int = 42,
    row_group_size: int = 16_384,
    num_cpus_per_task: int = 4,
    batch_ids: "list[int] | range | None" = None,
) -> dict:
    """Parallel fixture generator: one Ray task per batch, each batch
    drawn from its own ``default_rng([seed, batch])`` stream — so the
    output is deterministic for a given seed AND independent of task
    scheduling, but is a DIFFERENT (equally valid) stream than the
    serial :func:`generate_change_events` at the same seed (the serial
    path draws one global RNG sequence; recorded soak sha256s are tied
    to whichever generator produced the stream).

    Exists because the serial generator's per-row string formatting
    (event ids, commit hexes) is the 10^8+ soak bottleneck (~1530 s at
    1e8); here those loops run per-batch across the cluster. The
    content pool is built once on the driver and broadcast via
    ``ray.put``. ``num_cpus_per_task`` bounds concurrent generators so
    peak memory (each task holds one batch's object-string columns)
    stays within the node.

    Same fixture semantics as the serial path (FIXTURES.md F1-F4):
    Zipf hot-repo key skew, INSERT/UPDATE/DELETE mix, per-batch dirty
    injection cycling the five dirt modes, ``size_bytes`` evolution
    from ``evolve_from_batch``. Schema is identical to the serial
    generator's (gated by tests/test_gen_parallel.py).

    ``batch_ids`` generates only that subset of the global batch range
    (default ``range(n_batches)``). Because every batch draws from its
    own ``default_rng([seed, batch])`` stream and ``seq``/``ts`` derive
    from the batch id, generating in segments yields byte-identical
    files to a single full run — the disk-bounded 10^9+ soak generates,
    replays, and deletes one segment at a time
    (gated by tests/test_gen_parallel.py::test_segmented_equals_full)."""
    import ray

    rng = np.random.default_rng(seed)
    pool_ref = ray.put(make_content_pool(rng, content_pool_size))
    repos_all = np.array(
        [f"org{i % 7}/repo{i}" for i in range(n_repos)], dtype=object
    )
    paths_all = np.array(
        [f"src/dir{j % 10}/file{j}.{_LANGS[j % len(_LANGS)]}" for j in range(n_paths)],
        dtype=object,
    )
    langs_all = np.array(_LANGS, dtype=object)

    ev_dir = os.path.join(out_dir, "events")
    os.makedirs(ev_dir, exist_ok=True)
    batch_size = -(-n_events // n_batches)

    @ray.remote(num_cpus=num_cpus_per_task)
    def gen_batch(b: int, pool: np.ndarray) -> tuple[str, int]:
        brng = np.random.default_rng([seed, b])
        # clamp: when n_batches > n_events the tail batches are empty —
        # the serial path writes empty files, a negative m would crash
        lo = min(b * batch_size, n_events)
        hi = min(n_events, lo + batch_size)
        m = hi - lo
        seq = np.arange(lo, hi, dtype=np.int64)
        repo_idx = np.minimum(brng.zipf(zipf_a, m) - 1, n_repos - 1)
        path_idx = brng.integers(0, n_paths, m)
        repos = repos_all[repo_idx]
        paths = paths_all[path_idx]
        lang = langs_all[path_idx % len(_LANGS)].copy()
        op = np.where(
            brng.random(m) < delete_frac, "DELETE", "UPSERT"
        ).astype(object)
        first = brng.random(m) < 0.3
        op[(op == "UPSERT") & first] = "INSERT"
        op[op == "UPSERT"] = "UPDATE"
        # same draws, same characters as the serial path's _hex40 /
        # f-string event ids — only the construction is columnar (the
        # per-row %-format loops were the 10^9-soak bottleneck)
        commit = _hex40_arrow(brng, m)
        content = pool[brng.integers(0, content_pool_size, m)].copy()
        content[op == "DELETE"] = None
        lang[op == "DELETE"] = None
        rnd = brng.integers(0, 1 << 30, m)
        event_id = _fixed_width_strings(
            np.hstack(
                [
                    np.broadcast_to(
                        np.frombuffer(b"ev-", np.uint8), (m, 3)
                    ),
                    _dec_mat(seq, 12),
                    np.broadcast_to(np.frombuffer(b"-", np.uint8), (m, 1)),
                    _hex_mat(rnd, 8),
                ]
            )
        )
        ts = 1_700_000_000_000 + seq * 137
        n_dirty = int(m * dirty_frac)
        if n_dirty:
            import pyarrow.compute as pc

            dirty_pos = brng.choice(m, size=n_dirty, replace=False)
            bad_commit = np.zeros(m, bool)
            for k, pos in enumerate(dirty_pos):
                mode = k % 5
                if mode == 0:
                    repos[pos] = None
                elif mode == 1:
                    bad_commit[pos] = True
                elif mode == 2:
                    op[pos] = "TAG_IMAGE"
                elif mode == 3:
                    lang[pos] = "klingon"
                else:
                    op[pos] = "UPDATE"
                    content[pos] = None
            if bad_commit.any():
                commit = pc.if_else(
                    pa.array(bad_commit), pa.scalar("not-a-sha"), commit
                )
        content_arr = pa.array(content, pa.string())
        cols = {
            "seq": pa.array(seq),
            "batch_id": pa.array(np.full(m, b, np.int64)),
            "op": pa.array(op, pa.string()),
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": commit,
            "lang": pa.array(lang, pa.string()),
            "content": content_arr,
            "event_id": event_id,
            "ts": pa.array(ts),
        }
        if evolve_from_batch is not None and b >= evolve_from_batch:
            import pyarrow.compute as pc

            # len(content) in characters, 0 for null — content is ASCII
            # so utf8_length == python len (gated by the parity test)
            cols["size_bytes"] = pc.fill_null(
                pc.cast(pc.utf8_length(content_arr), pa.int64()), 0
            )
        f = os.path.join(ev_dir, f"batch={b:05d}.parquet")
        tmp = f"{f}.tmp.{os.getpid()}"
        pq.write_table(pa.table(cols), tmp, row_group_size=row_group_size)
        os.replace(tmp, f)
        return f, m

    ids = list(batch_ids) if batch_ids is not None else list(range(n_batches))
    results = ray.get([gen_batch.remote(b, pool_ref) for b in ids])
    return {
        "events_dir": ev_dir,
        "files": [f for f, _ in results],
        "n_events": int(sum(m for _, m in results)),
        "n_batches": n_batches,
        "batch_ids": ids,
    }
