"""Document chunking: split long documents into fixed-size token
windows with overlap (the standard pretraining / retrieval prep step —
the row-EXPANSION dual of sequence packing's row-combination).

Pure flat row expansion inside ``map_batches`` — one doc in,
``ceil(max(n - overlap, 1) / stride)`` chunks out, no shuffle, chunk
identity = (doc_id, chunk_idx) so output is deterministic under any
parallelism. Per-doc tokenization is inherent per-string work (same
adjudication as bigram counting, ``queries.q_doc_repetition``).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset


def chunk_documents(
    ds: Dataset,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Windowed chunks over the whitespace tokenization: each chunk has
    at most ``max_tokens`` tokens; consecutive chunks of one doc share
    exactly ``overlap`` tokens (the final chunk may be shorter and is
    never a pure suffix of the previous one — a doc yields a new chunk
    only while uncovered tokens remain). Empty docs yield one empty
    chunk so every input doc appears in the output.

    Output: ``(doc_id, chunk_idx, n_tokens, text)``.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def expand(t: pa.Table) -> pa.Table:
        out_id, out_idx, out_n, out_txt = [], [], [], []
        for did, text in zip(
            t[id_col].to_pylist(), t[text_col].to_pylist()
        ):
            toks = (text or "").split(" ") if text else []
            n = len(toks)
            if n == 0:
                out_id.append(did)
                out_idx.append(0)
                out_n.append(0)
                out_txt.append("")
                continue
            idx = 0
            for start in range(0, max(n - overlap, 1), stride):
                piece = toks[start : start + max_tokens]
                out_id.append(did)
                out_idx.append(idx)
                out_n.append(len(piece))
                out_txt.append(" ".join(piece))
                idx += 1
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "text": pa.array(out_txt, pa.string()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=None)


def reassemble_tokens(chunks: list[tuple[int, str]], overlap: int) -> list[str]:
    """Test helper: invert chunking — concatenate ordered chunks
    dropping each successor's leading ``overlap`` tokens."""
    toks: list[str] = []
    for idx, text in sorted(chunks):
        part = text.split(" ") if text else []
        toks.extend(part if idx == 0 else part[overlap:])
    return toks
