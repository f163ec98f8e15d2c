"""Fixed-size document chunking with overlap (training-data / retrieval
prep): each document becomes ceil chunks of ``chunk_chars`` codepoints
starting every ``stride`` codepoints, so consecutive chunks overlap by
``chunk_chars - stride``.  The last chunk is clipped at the text end;
every codepoint is covered; a document shorter than one chunk (including
empty) yields exactly one chunk.

Shuffle-free flat-map: chunking is block-local (`map_batches` emitting
more rows than it takes), so it streams at any scale.  The kernel is
vectorized per CHUNK LEVEL, not per row: level i slices every document
that has an i-th chunk with one ``utf8_slice_codeunits`` call (codepoint
semantics, matching SQL ``substring``), so the Python loop is bounded by
max-chunks-per-doc in the batch, never row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import utf8_filled


def n_chunks_for(lens: np.ndarray, chunk_chars: int,
                 stride: int) -> np.ndarray:
    """1 chunk if len <= chunk_chars, else 1 + ceil((len-chunk)/stride)."""
    extra = np.maximum(lens - chunk_chars, 0)
    return (1 + -(-extra // stride)).astype(np.int64)


def chunk_batch(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id", chunk_chars: int = 500,
                stride: int = 400) -> pa.Table:
    if not 0 < stride <= chunk_chars:
        raise ValueError("need 0 < stride <= chunk_chars")
    text = utf8_filled(batch.column(text_col))
    lens = pc.utf8_length(text).to_numpy().astype(np.int64)
    nch = n_chunks_for(lens, chunk_chars, stride)
    parts: list[pa.Table] = []
    for i in range(int(nch.max()) if len(nch) else 0):
        mask = nch > i
        sub_ids = batch.column(id_col).filter(pa.array(mask))
        sub_text = text.filter(pa.array(mask))
        s = i * stride
        parts.append(pa.table({
            id_col: sub_ids,
            "chunk_idx": pa.array(
                np.full(len(sub_ids), i, dtype=np.int64)),
            "chunk_text": pc.utf8_slice_codeunits(sub_text, s,
                                                  s + chunk_chars),
        }))
    if not parts:
        return pa.table({id_col: batch.column(id_col).slice(0, 0),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string())})
    return pa.concat_tables(parts)


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    chunk_chars: int = 500, stride: int = 400):
    """Dataset of (id, chunk_idx, chunk_text) rows, one per chunk."""
    return ds.map_batches(chunk_batch, batch_format="pyarrow",
                          fn_kwargs={"text_col": text_col,
                                     "id_col": id_col,
                                     "chunk_chars": chunk_chars,
                                     "stride": stride})
