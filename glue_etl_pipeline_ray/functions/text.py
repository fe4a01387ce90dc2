"""Text analysis over a documents table: tokenization stats, quality
scoring, language ID, fingerprints.

All batch functions are vectorized (polars / pyarrow.compute); the
whitespace tokenizer is defined as *split on a single space* so the
DuckDB oracle (``string_split(text, ' ')``) computes the identical
tokenization. Stats are integers/booleans only — no float hashing risk
in the correctness gate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# a deterministic stopword set drawn from the synthetic corpus vocabulary
STOPWORDS = ("the", "a", "data", "value", "row")

# stopword profiles for the n-gram language-ID heuristic (public-knowledge
# function word lists; scores are deterministic token-membership counts)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo", "ta"),
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    import polars as pl

    df = pl.from_arrow(batch)
    toks = pl.col(text_col).str.split(" ")
    out = df.with_columns(
        toks.list.len().cast(pl.Int64).alias("n_tokens"),
        toks.list.n_unique().cast(pl.Int64).alias("n_uniq_tokens"),
    )
    return out.to_arrow()


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / stopword-count quality signals + a boolean keep-gate."""
    import polars as pl

    df = pl.from_arrow(batch)
    toks = pl.col(text_col).str.split(" ")
    df = df.with_columns(
        toks.list.len().cast(pl.Int64).alias("n_tokens"),
        toks.list.eval(pl.element().is_in(list(STOPWORDS)))
        .list.sum()
        .cast(pl.Int64)
        .alias("n_stopwords"),
    )
    df = df.with_columns(
        (
            (pl.col("n_tokens") >= 5)
            & (pl.col("n_tokens") <= 100_000)
            & (pl.col("n_stopwords") * 2 <= pl.col("n_tokens"))
        ).alias("is_quality")
    )
    return df.to_arrow()


class LangId:
    """Actor-pool language-ID stage: profiles prepared once per actor
    (``__init__``), scored per batch (ST1-style stateful stage)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {lang: frozenset(ws) for lang, ws in LANG_PROFILES.items()}
        self.order = sorted(self.profiles)  # deterministic tie-break

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        preds = []
        for t in texts:
            toks = (t or "").split(" ")
            best, best_score = "en", -1
            for lang in self.order:
                s = sum(1 for w in toks if w in self.profiles[lang])
                if s > best_score:
                    best, best_score = lang, s
            preds.append(best)
        return batch.append_column("pred_lang", pa.array(preds, pa.string()))


def md5_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint = md5 hex (matches DuckDB ``md5(text)``).
    Hashing is inherently per-row; hashlib runs at C speed."""
    fps = [
        hashlib.md5((t or "").encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("fp", pa.array(fps, pa.string()))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text", window: int = 8) -> pa.Table:
    """Rabin-Karp-style rolling hash over tokens -> int64 document
    fingerprint (min of window hashes; winnowing-lite). Deterministic."""
    B = 1_000_003
    MASK = 0xFFFFFFFFFFFFFFFF
    fps = []
    for t in batch[text_col].to_pylist():
        toks = (t or "").split(" ")
        hs = [hash_token(w) for w in toks]
        if len(hs) < window:
            fp = 0
            for h in hs:
                fp = (fp * B + h) & MASK
        else:
            arr = np.array(hs, dtype=np.uint64)
            roll = np.zeros(len(hs) - window + 1, dtype=np.uint64)
            for i in range(window):  # window is a small constant
                roll = roll * np.uint64(B) + arr[i : len(hs) - window + 1 + i]
            fp = int(roll.min())
        fps.append(fp >> 1)
    return batch.append_column("rolling_fp", pa.array(fps, pa.int64()))


def hash_token(w: str) -> int:
    """FNV-1a 64-bit: stable across processes (no salted hash())."""
    h = 0xCBF29CE484222325
    for b in w.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# PII-style redaction patterns (RE2 syntax — pyarrow's regex engine IS
# RE2, and DuckDB's regexp_replace is RE2 too, so the oracle runs the
# byte-identical pattern). EMAIL/PHONE are the canonical pair; the
# correctness gate exercises NUMID because the synthetic corpus carries
# digit-run identifiers (TPC-H ``Customer#000000042``) but no emails.
REDACT_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "PHONE": r"\+?[0-9][0-9\-. ]{7,}[0-9]",
    "NUMID": r"[0-9]+",
}


def redact(
    batch: pa.Table,
    text_col: str,
    patterns: dict[str, str],
    count_cols: bool = True,
) -> pa.Table:
    """Vectorized PII redaction: each pattern's matches are replaced by
    ``<LABEL>`` via ``pc.replace_substring_regex`` (RE2 kernels — no
    Python loop). Optionally emits ``n_<label>`` match-count columns,
    each counted on the text as that pattern sees it. Patterns are
    applied in dict order and later patterns see earlier replacements,
    so a span never double-counts — order sensitive patterns (PHONE
    before NUMID) accordingly."""
    import pyarrow.compute as pc

    col = batch[text_col]
    out = batch
    for label, pat in patterns.items():
        if count_cols:
            out = out.append_column(
                f"n_{label.lower()}",
                pc.cast(pc.count_substring_regex(col, pat), pa.int64()),
            )
        col = pc.replace_substring_regex(col, pat, f"<{label}>")
    idx = out.schema.get_field_index(text_col)
    return out.set_column(idx, f"{text_col}_redacted", col)


BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


class BpeTokenCount:
    """Actor-pool token counter with a BPE-style pre-tokenizer regex
    (GPT-2-ish, simplified to an RE2-compatible class set so the DuckDB
    oracle runs the SAME pattern). Pattern compiled once per actor."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.pat = re.compile(BPE_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [
            len(self.pat.findall(t or "")) for t in batch[self.text_col].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(counts, pa.int64()),
            }
        )


def vocab_topk(
    ds,
    text_col: str = "text",
    k: int = 50,
    gram_n: int = 1,
    n_parts: int = 64,
) -> pa.Table:
    """Corpus-level vocabulary statistics: the k most frequent tokens
    (or ``gram_n``-grams) with exact counts — the vocab-building /
    corpus-inspection step of a training-data pipeline.

    Plan: per-block ``np.unique`` partials compress the token stream
    ~100x before any movement; partials hash-partition by token into
    ``n_parts`` groups (bounded Ray group count, independent of vocab
    cardinality); each group sums its tokens vectorized and emits only
    its LOCAL top-k (globally sufficient: every global top-k token's
    total lives in exactly one partition); the driver folds
    n_parts x k rows. Total shuffle volume: distinct-(token, block)
    partials, never raw tokens. Ties break (count desc, token asc) so
    the result is deterministic and oracle-comparable.
    """
    import numpy as np

    from glue_etl_pipeline_ray.hashing import key_hash_u64

    def partials(t: pa.Table) -> pa.Table:
        toks: list = []
        for s in t[text_col].to_pylist():
            words = (s or "").split(" ")
            if gram_n == 1:
                toks.extend(words)
            elif len(words) >= gram_n:
                toks.extend(
                    " ".join(words[i : i + gram_n])
                    for i in range(len(words) - gram_n + 1)
                )
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.array(toks, dtype=object), return_counts=True)
        part = (
            key_hash_u64(pa.array(u, pa.string())) % np.uint64(n_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "token": pa.array(u, pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
                "__part": pa.array(part, pa.int64()),
            }
        )

    def local_topk(g: pa.Table) -> pa.Table:
        tok = np.asarray(g["token"].to_pylist(), dtype=object)
        cnt = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(tok)
        tok, cnt = tok[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        totals = np.add.reduceat(cnt, starts)
        utok = tok[starts]
        top = np.lexsort((utok, -totals))[:k]
        return pa.table(
            {
                "token": pa.array(utok[top], pa.string()),
                "n": pa.array(totals[top], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(local_topk, batch_format="pyarrow")
        .take_all()
    )
    tok = np.array([r["token"] for r in parts], dtype=object)
    cnt = np.array([r["n"] for r in parts], dtype=np.int64)
    top = np.lexsort((tok, -cnt))[:k]
    return pa.table(
        {
            "token": pa.array(tok[top], pa.string()),
            "n": pa.array(cnt[top], pa.int64()),
        }
    )


def tfidf_topk_terms(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
    n_parts: int = 64,
):
    """Per-document top-k TF-IDF terms (keyword extraction / quality
    features over the whole corpus).

    Two passes, both bounded:
    1. document frequencies — per-block partials of (token, #docs in
       block containing it) compress before ONE hash-partition sum
       (same shuffle shape as :func:`vocab_topk`); the resulting
       (token-hash, df) arrays are broadcast ONCE via ``ray.put``.
       ``min_df`` prunes the broadcast's long tail — the scale lever
       when vocab cardinality grows (rare terms below min_df keep
       idf as if df = min_df, preserving rank order among kept terms).
    2. scoring — shuffle-free ``map_batches``: per doc, token counts
       via np.unique, tf = count/len, idf = ln(N / (1 + df)), emit the
       top-k (score desc, term asc — deterministic).

    Output: (id_col, term, rank, score). ``score`` is float64 computed
    by one fixed expression so a single-threaded oracle reproduces it
    bit-for-bit.
    """
    import numpy as np

    import ray

    from glue_etl_pipeline_ray.hashing import key_hash_u64

    n_docs = ds.count()

    def df_partials(t: pa.Table) -> pa.Table:
        toks: list = []
        for s in t[text_col].to_pylist():
            toks.extend(set((s or "").split(" ")))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.array(toks, dtype=object), return_counts=True)
        return pa.table(
            {
                "token": pa.array(u, pa.string()),
                "df": pa.array(c.astype(np.int64), pa.int64()),
                "__part": pa.array(
                    (key_hash_u64(pa.array(u, pa.string()))
                     % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    def df_sum(g: pa.Table) -> pa.Table:
        tok = np.asarray(g["token"].to_pylist(), dtype=object)
        cnt = g["df"].to_numpy(zero_copy_only=False)
        order = np.argsort(tok)
        tok, cnt = tok[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        totals = np.add.reduceat(cnt, starts)
        keep = totals >= min_df
        utok = tok[starts][keep]
        h = key_hash_u64(pa.array(utok, pa.string())) if len(utok) else np.array([], np.uint64)
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "df": pa.array(totals[keep], pa.int64()),
            }
        )

    dfs = (
        ds.map_batches(df_partials, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(df_sum, batch_format="pyarrow")
    )

    @ray.remote
    def assemble(*tables: pa.Table):
        tabs = [t for t in tables if "h" in t.schema.names and t.num_rows]
        if not tabs:
            return np.array([], np.uint64), np.array([], np.int64)
        cat = pa.concat_tables(tabs)
        h = cat["h"].to_numpy(zero_copy_only=False)
        d = cat["df"].to_numpy(zero_copy_only=False)
        order = np.argsort(h)
        return h[order], d[order]

    df_ref = assemble.remote(*dfs.to_arrow_refs())

    def score(t: pa.Table) -> pa.Table:
        hs, dfv = ray.get(df_ref)
        out_id, out_term, out_rank, out_score = [], [], [], []
        for doc_id, s in zip(
            t[id_col].to_pylist(), t[text_col].to_pylist()
        ):
            words = (s or "").split(" ")
            u, c = np.unique(np.array(words, dtype=object), return_counts=True)
            th = key_hash_u64(pa.array(u, pa.string()))
            pos = np.searchsorted(hs, th)
            if len(hs):
                pos[pos == len(hs)] = 0
                found = hs[pos] == th
                d = np.where(found, dfv[pos] if len(dfv) else 0, min_df)
            else:
                d = np.full(len(u), min_df, np.int64)
            tf = c.astype(np.float64) / float(len(words))
            idf = np.log(float(n_docs) / (1.0 + d.astype(np.float64)))
            sc = tf * idf
            top = np.lexsort((u, -sc))[:k]
            out_id.extend([doc_id] * len(top))
            out_term.extend(u[top])
            out_rank.extend(range(1, len(top) + 1))
            out_score.extend(sc[top])
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "term": pa.array(np.array(out_term, dtype=object), pa.string()),
                "rank": pa.array(out_rank, pa.int64()),
                "score": pa.array(out_score, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def normalize_text(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    nfc: bool = True,
    collapse_ws: bool = True,
):
    """Standard text cleaning ahead of dedup/tokenization: unicode NFC
    normalization, lowercasing, control-char strip, whitespace collapse
    + trim — pyarrow.compute kernels (RE2 + utf8 transforms) with zero
    shuffle. Order matters and is fixed (NFC -> lower -> strip controls
    -> collapse -> trim) so the output is deterministic and
    oracle-comparable.

    NFC note: this pyarrow build's ``utf8_normalize`` decomposes but
    never re-composes (NFC comes back as NFD), so composition runs
    through ``unicodedata`` — but ONLY for the rows a vectorized
    non-ASCII prefilter selects; ASCII text (the bulk of most corpora)
    never leaves the Arrow fast path.
    """
    import unicodedata

    def clean(t: pa.Table) -> pa.Table:
        s = t[text_col]
        if nfc:
            non_ascii = pc.fill_null(
                pc.match_substring_regex(s, r"[^\x00-\x7f]"), False
            )
            sc = s.combine_chunks()
            mask = non_ascii.combine_chunks()
            idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            if len(idx):
                # normalize ONLY the selected rows and scatter them back
                # (replace_with_mask) — the unselected majority stays on
                # the zero-copy Arrow path instead of round-tripping the
                # whole column through Python lists
                sel = sc.take(pa.array(idx, pa.int64())).to_pylist()
                repl = pa.array(
                    [
                        v if v is None else unicodedata.normalize("NFC", v)
                        for v in sel
                    ],
                    pa.string(),
                )
                s = pa.chunked_array(
                    [pc.replace_with_mask(sc, mask, repl)]
                )
        if lowercase:
            s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
        if collapse_ws:
            s = pc.replace_substring_regex(s, r"\s+", " ")
            s = pc.utf8_trim_whitespace(s)
        return pa.table({id_col: t[id_col], "text_norm": s})

    return ds.map_batches(clean, batch_format="pyarrow", batch_size=None)


def unigram_logprob_score(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    n_parts: int = 64,
):
    """Corpus-unigram log-probability scoring — the CCNet/perplexity
    quality filter's shape with a self-built unigram LM: docs whose
    tokens are corpus-typical score high, gibberish/outliers low.

    Pass 1 builds the unigram table with the ``vocab_topk`` shuffle
    shape (per-block np.unique partials -> bounded hash-partition sums)
    and broadcasts (sorted token-hash, count) arrays plus the corpus
    total ONCE; tokens below ``min_count`` are pruned from the
    broadcast (the scale lever) but still counted in the total, and
    score as count ``min_count``. Pass 2 is shuffle-free: one
    vectorized hash + searchsorted per batch, per-doc mean via
    ``np.add.reduceat``.

    Output: (id_col, n_tokens, mean_logprob) with
    ``logprob(tok) = ln(count(tok) / total)`` in float64 — one fixed
    expression a single-threaded oracle reproduces to within summation
    -associativity ULPs (the count table and total are exact integers).
    """
    import ray

    from glue_etl_pipeline_ray.hashing import key_hash_u64

    def ug_partials(t: pa.Table) -> pa.Table:
        toks: list = []
        for s in t[text_col].to_pylist():
            toks.extend((s or "").split(" "))
        if not toks:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "__part": pa.array([], pa.int64()),
                }
            )
        u, c = np.unique(np.array(toks, dtype=object), return_counts=True)
        return pa.table(
            {
                "token": pa.array(u, pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
                "__part": pa.array(
                    (key_hash_u64(pa.array(u, pa.string()))
                     % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    def ug_sum_group(g: pa.Table) -> pa.Table:
        tok = np.asarray(g["token"].to_pylist(), dtype=object)
        cnt = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(tok)
        tok, cnt = tok[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        totals = np.add.reduceat(cnt, starts)
        pt = int(totals.sum())  # includes the pruned tail: the corpus
        keep = totals >= min_count  # total must count EVERY token
        if keep.any():
            h = key_hash_u64(pa.array(tok[starts][keep], pa.string()))
            n = totals[keep]
        else:  # sentinel row (n=0) so the partition total still ships
            h = np.array([0], np.uint64)
            n = np.array([0], np.int64)
        # pt rides on exactly ONE row per group: downstream blocks may
        # pack several groups together, so a per-row constant could not
        # be disambiguated — a one-row carrier sums correctly regardless
        pt_col = np.zeros(len(n), np.int64)
        pt_col[0] = pt
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "n": pa.array(n, pa.int64()),
                "part_total": pa.array(pt_col, pa.int64()),
            }
        )

    counts = (
        ds.map_batches(ug_partials, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(ug_sum_group, batch_format="pyarrow")
    )

    @ray.remote
    def ug_assemble(*tables: pa.Table):
        tabs = [t for t in tables if "h" in t.schema.names and t.num_rows]
        if not tabs:
            return np.array([], np.uint64), np.array([], np.int64), 0
        # part_total is nonzero on exactly one row per group: plain sum
        total = sum(
            int(pa.compute.sum(t["part_total"]).as_py() or 0) for t in tabs
        )
        cat = pa.concat_tables([t.select(["h", "n"]) for t in tabs])
        h = cat["h"].to_numpy(zero_copy_only=False)
        n = cat["n"].to_numpy(zero_copy_only=False)
        real = n > 0  # drop the sentinel rows
        h, n = h[real], n[real]
        order = np.argsort(h)
        return h[order], n[order], total

    ref = ug_assemble.remote(*counts.to_arrow_refs())

    def ug_score(t: pa.Table) -> pa.Table:
        import pandas as pd

        hs, ns, total = ray.get(ref)
        out_n = np.zeros(t.num_rows, np.int64)
        out_lp = np.zeros(t.num_rows, np.float64)
        toks_all: list = []
        lens = np.zeros(t.num_rows, np.int64)
        for i, s in enumerate(t[text_col].to_pylist()):
            ws = (s or "").split(" ")
            toks_all.extend(ws)
            lens[i] = len(ws)
        if toks_all and total:
            h = pd.util.hash_array(
                np.array(toks_all, dtype=object), categorize=False
            )
            pos = np.searchsorted(hs, h)
            if len(hs):
                pos[pos == len(hs)] = 0
                found = hs[pos] == h
                cnt = np.where(
                    found, ns[pos] if len(ns) else min_count, min_count
                )
            else:
                cnt = np.full(len(h), min_count, np.int64)
            lp = np.log(cnt.astype(np.float64) / float(total))
            ends = np.cumsum(lens)
            starts = ends - lens
            nz = lens > 0
            sums = np.zeros(t.num_rows, np.float64)
            if nz.any():
                sums[nz] = np.add.reduceat(lp, starts[nz])
            out_n = lens
            out_lp = np.where(nz, sums / np.maximum(lens, 1), 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(out_n, pa.int64()),
                "mean_logprob": pa.array(out_lp, pa.float64()),
            }
        )

    return ds.map_batches(ug_score, batch_format="pyarrow", batch_size=None)
