"""Persistent cross-batch content dedup: the "novel content only" filter.

A 100 TB ingest never sees its corpus at once — batches arrive forever,
and exact dedup must hold ACROSS batches without re-scanning history.
This is the streaming complement of ``functions/dedup.exact_dedup``
(which dedups one static dataset): a hash-bucketed, versioned index of
every content fingerprint ever committed, maintained with the same
exactly-once discipline as the replay lake (deterministic staged files,
atomic manifest commit, idempotent retries).

Per batch:
- ``filter_novel``: fingerprint every row (two independent SipHash-64
  streams = one 128-bit key, vectorized — no per-row hashlib), bucket
  by fingerprint, and per TOUCHED bucket: drop rows whose fingerprint
  is already committed (sorted-array probe against that bucket's index
  file) and keep only the first occurrence (min ``seq_col``) within the
  batch. Novel fingerprints are STAGED per bucket under deterministic
  names — a retry rewrites identical bytes.
- ``commit``: folds staged fingerprints into versioned per-bucket index
  files and advances the manifest watermark atomically; crash between
  stage and commit is finished by the next call (at-least-once window,
  exactly-once outcome).

Cost shape: probe + fold touch only buckets present in the batch, each
O(bucket index) sequential I/O — identical to the lake's rewrite-mode
merge; the per-batch work is O(batch + touched state), never O(corpus
scan). Index rows are 16 bytes per unique content ever seen.

Collision safety: 128 bits → birthday bound ~n^2/2^129; at 10^12 unique
contents the false-merge probability is < 1e-14 (vs ~3 expected
collisions for a single u64, which is why the fingerprint is doubled).
"""

from __future__ import annotations

import glob
import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

from glue_etl_pipeline_ray.hashing import key_hash_u64

def _fp128(col) -> np.ndarray:
    """128-bit fingerprint as big-endian ``|S16`` (sortable, probe-able
    with plain numpy searchsorted).

    The two 64-bit halves are INDEPENDENT SipHash streams (distinct
    16-byte keys), not a remix of one — a collision must happen in both
    streams at once for two contents to merge."""
    import pandas as pd

    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = col.to_numpy(zero_copy_only=False)
    arr = np.asarray(col, dtype=object)
    h1 = key_hash_u64(arr)  # pandas default key
    h2 = pd.util.hash_array(arr, hash_key="gepr-seen-index!", categorize=False)
    out = np.empty(len(h1), dtype=[("a", ">u8"), ("b", ">u8")])
    out["a"], out["b"] = h1, h2
    return out.view("S16").reshape(-1)


class SeenIndex:
    """Hash-bucketed persistent fingerprint index with batch commits."""

    def __init__(self, index_dir: str, num_buckets: int = 64):
        self.dir = index_dir
        self.num_buckets = num_buckets
        os.makedirs(os.path.join(self.dir, "_staged"), exist_ok=True)
        self._manifest_path = os.path.join(self.dir, "manifest.json")

    # ------------------------------------------------------- manifest

    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"watermark": -1, "bucket_versions": {}}

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir)
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)

    def watermark(self) -> int:
        return self._manifest()["watermark"]

    def _index_path(self, bucket: int, version: int) -> str:
        return os.path.join(
            self.dir, f"seen-{bucket:05d}-v{version:05d}.parquet"
        )

    # ---------------------------------------------------------- filter

    def filter_novel(
        self,
        ds: Dataset,
        batch_id: int,
        content_col: str = "content",
        seq_col: str | None = None,
    ) -> Dataset:
        """Rows of ``ds`` whose content was never committed before and
        occurs for the first time within this batch. Ties (same content
        fingerprint) break by min ``seq_col`` when given; without one,
        by min deterministic full-row hash — a pure function of row
        CONTENT, so re-execution at any parallelism keeps the same
        survivor (intra-group arrival order from a Ray groupby is not
        contractually stable and is never relied on; the only remaining
        ambiguity is rows whose full-row hashes collide, or rows with
        unhashable nested columns, where pass ``seq_col``). Stages the
        batch's novel fingerprints; call :meth:`commit` after the
        survivors are durably consumed.

        If ``batch_id <= watermark`` the batch was already committed:
        returns an empty dataset (exactly-once replay semantics).
        """
        m = self._manifest()
        committed = int(m["watermark"])
        versions = {int(k): int(v) for k, v in m["bucket_versions"].items()}
        index_dir, nb = self.dir, self.num_buckets
        already = batch_id <= committed
        stage_dir = os.path.join(self.dir, "_staged", f"batch={batch_id:05d}")
        os.makedirs(stage_dir, exist_ok=True)

        def add_bucket(t: pa.Table) -> pa.Table:
            fp = _fp128(t[content_col])
            bucket = (
                np.frombuffer(fp.tobytes(), dtype=">u8")[::2]
                % np.uint64(nb)
            ).astype(np.int64)
            t = t.append_column("__fp", pa.array(fp.astype("O"), pa.binary()))
            return t.append_column("__bucket", pa.array(bucket))

        def probe(group: pa.Table) -> pa.Table:
            if already or group.num_rows == 0:
                return group.slice(0, 0).drop_columns(["__fp", "__bucket"])
            bucket = int(group["__bucket"][0].as_py())
            fp = np.array(group["__fp"].to_pylist(), dtype="S16")
            # first occurrence within the batch
            if seq_col is not None:
                seq = group[seq_col].to_numpy(zero_copy_only=False)
                order = np.lexsort((seq, fp))
            else:
                # deterministic content-derived tie-break: survivor is
                # the row with min full-row hash, stable across runs
                # and parallelism (groupby arrival order is not)
                try:
                    import pandas as pd

                    aux = pd.util.hash_pandas_object(
                        group.drop_columns(["__fp", "__bucket"]).to_pandas(),
                        index=False,
                    ).to_numpy()
                    order = np.lexsort((aux, fp))
                except TypeError:  # unhashable nested column
                    order = np.argsort(fp, kind="stable")
            sfp = fp[order]
            first = np.r_[True, sfp[1:] != sfp[:-1]]
            keep_rows = order[first]
            kfp = sfp[first]
            # drop fingerprints already committed for this bucket
            ver = versions.get(bucket)
            if ver is not None:
                seen = (
                    pq.read_table(
                        os.path.join(
                            index_dir, f"seen-{bucket:05d}-v{ver:05d}.parquet"
                        )
                    )["fp"]
                    .to_numpy(zero_copy_only=False)
                    .astype("S16")
                )
                pos = np.searchsorted(seen, kfp)
                pos[pos == len(seen)] = 0
                novel = seen[pos] != kfp if len(seen) else np.ones(len(kfp), bool)
            else:
                novel = np.ones(len(kfp), bool)
            keep_rows, kfp = keep_rows[novel], kfp[novel]
            # stage this bucket's novel fingerprints (idempotent name +
            # deterministic content: retries rewrite identical bytes)
            staged = pa.table(
                {"fp": pa.array(np.sort(kfp).astype("O"), pa.binary())}
            )
            tmp_fd, tmp_p = tempfile.mkstemp(dir=stage_dir)
            os.close(tmp_fd)
            pq.write_table(staged, tmp_p)
            os.replace(
                tmp_p, os.path.join(stage_dir, f"bucket={bucket:05d}.parquet")
            )
            out = group.take(pa.array(np.sort(keep_rows)))
            return out.drop_columns(["__fp", "__bucket"])

        keyed = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        return keyed.groupby("__bucket").map_groups(
            probe, batch_format="pyarrow"
        )

    # ---------------------------------------------------------- commit

    def commit(self, batch_id: int) -> None:
        """Fold batch ``batch_id``'s staged fingerprints into the
        versioned bucket index files and advance the watermark.
        Idempotent: recommitting a committed batch is a no-op; a crash
        mid-fold re-folds deterministically (same bytes, same names)."""
        m = self._manifest()
        if batch_id <= int(m["watermark"]):
            return
        stage_dir = os.path.join(self.dir, "_staged", f"batch={batch_id:05d}")
        versions = {int(k): int(v) for k, v in m["bucket_versions"].items()}
        for path in sorted(glob.glob(os.path.join(stage_dir, "bucket=*.parquet"))):
            bucket = int(os.path.basename(path)[len("bucket=") : -len(".parquet")])
            new = pq.read_table(path)["fp"].to_numpy(zero_copy_only=False)
            old_ver = versions.get(bucket)
            if old_ver is not None:
                old = pq.read_table(self._index_path(bucket, old_ver))[
                    "fp"
                ].to_numpy(zero_copy_only=False)
                merged = np.unique(
                    np.concatenate([old.astype("S16"), new.astype("S16")])
                )
            else:
                merged = np.unique(new.astype("S16"))
            out = self._index_path(bucket, batch_id)
            tmp_fd, tmp_p = tempfile.mkstemp(dir=self.dir)
            os.close(tmp_fd)
            pq.write_table(
                pa.table({"fp": pa.array(merged.astype("O"), pa.binary())}),
                tmp_p,
            )
            os.replace(tmp_p, out)
            versions[bucket] = batch_id
        m["bucket_versions"] = {str(k): v for k, v in versions.items()}
        m["watermark"] = batch_id
        self._write_manifest(m)
        # GC: staged files + superseded index versions
        for path in glob.glob(os.path.join(stage_dir, "*")):
            os.remove(path)
        try:
            os.rmdir(stage_dir)
        except OSError:
            pass
        for path in glob.glob(os.path.join(self.dir, "seen-*.parquet")):
            base = os.path.basename(path)
            b = int(base[5:10])
            v = int(base[12:17])
            if versions.get(b) != v:
                os.remove(path)
