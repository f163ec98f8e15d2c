"""Paragraph-level exact deduplication (RefinedWeb / C4 style).

Removes every repeated occurrence of a paragraph across the whole corpus,
keeping only its first occurrence by ``(doc_id, para_idx)``, and rewrites
each document from its surviving paragraphs.  Boilerplate repeated across
millions of pages (cookie banners, navigation, copyright footers) is the
target — the per-document text changes, unlike document-level dedup which
only drops whole rows.

Ray-Data-first plan — document text crosses the wire exactly ONCE:

1. ``explode_paragraph_keys`` (map_batches, combiner): split each doc on
   the delimiter, fingerprint every paragraph of length >= ``min_chars``
   with TWO independent vectorized 64-bit rolling hashes (128 combined
   bits — collision-safe at 10^11+ paragraphs), pack the occurrence order
   key ``doc_id * 2^20 + para_idx`` into one int64, and keep only the
   block-local minimum per fingerprint.  Output rows are 3 int64s; the
   paragraph TEXT never leaves the block.
2. ``groupby([fp1, fp2]).min(packed)`` — the only corpus-wide exchange,
   24-byte rows, vectorized Arrow aggregation.
3. ``collect_keep_lists``: coarse-bucket the winners by ``doc_id % P``
   and build one ``(doc_id, keep_idxs: list<int32>)`` row per document
   inside a vectorized map_groups kernel (sort + offsets, no Python
   per-doc loop; groups are buckets, not documents).
4. ``apply_keep``: ``docs.join(keep_lists, on=doc_id)`` (left outer,
   one-to-one — this is the single shuffle that moves document text),
   then a vectorized batch kernel re-splits the text, keeps winning +
   short paragraphs, and reassembles with ``pc.binary_join``.

Packing limits (asserted): ``para_idx < 2^20`` per document and
``0 <= doc_id < 2^43`` — ~10^4 billion documents, ample at 100 TB.

No reference analogue (the reference is a language detector); this is one
of the beyond-reference training-data operators (SURVEY.md extras).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import fingerprint64_array

# Second independent rolling-hash multiplier (first is models.HASH_MULT =
# 0x100000001B3); any odd 64-bit constant works.
PARA_MULT2 = np.uint64(0x9E3779B97F4A7C15)

_IDX_BITS = 20
_IDX_MASK = (1 << _IDX_BITS) - 1
_MAX_DOC_ID = 1 << (63 - _IDX_BITS)


def _split_offsets(col: pa.Array | pa.ChunkedArray, delim: str):
    """Split a string column; return (flat paragraph array, row lengths)."""
    parts = pc.split_pattern(pc.fill_null(col, ""), delim)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    return flat, counts.astype(np.int64)


def explode_paragraph_keys(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id", delim: str = "\n",
                           min_chars: int = 1) -> pa.Table:
    """Stage 1: (fp1, fp2, packed) per dedupable paragraph, block-local
    min-per-fingerprint combiner applied.  Short paragraphs
    (< ``min_chars`` chars) are exempt from dedup and emit nothing."""
    empty = pa.table({"fp1": pa.array([], pa.int64()),
                      "fp2": pa.array([], pa.int64()),
                      "packed": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    flat, counts = _split_offsets(batch.column(text_col), delim)
    # int64 BEFORE the shift: a narrower source dtype (int32 doc_id)
    # would wrap in native arithmetic and pack silently-wrong keys
    doc_ids = batch.column(id_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if len(doc_ids) and (doc_ids.min() < 0 or doc_ids.max() >= _MAX_DOC_ID):
        raise ValueError(f"doc_id out of packing range [0, 2^43): "
                         f"{doc_ids.min()}..{doc_ids.max()}")
    if counts.max(initial=0) > _IDX_MASK:
        raise ValueError(f"document has > 2^{_IDX_BITS} paragraphs")
    parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    para_idx = np.arange(len(flat), dtype=np.int64) - starts[parent]

    nchars = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = nchars >= min_chars
    if not keep.any():
        return empty
    flat = flat.filter(pa.array(keep))
    parent, para_idx = parent[keep], para_idx[keep]

    fp1 = fingerprint64_array(flat).view(np.int64)
    fp2 = fingerprint64_array(flat, mult=PARA_MULT2).view(np.int64)
    packed = (doc_ids[parent] << _IDX_BITS) | para_idx

    # Block-local combiner: min packed per (fp1, fp2).
    order = np.lexsort((packed, fp2, fp1))
    fp1s, fp2s, packeds = fp1[order], fp2[order], packed[order]
    first = np.concatenate((
        [True], (fp1s[1:] != fp1s[:-1]) | (fp2s[1:] != fp2s[:-1])))
    return pa.table({"fp1": pa.array(fp1s[first]),
                     "fp2": pa.array(fp2s[first]),
                     "packed": pa.array(packeds[first])})


def _keep_lists_group(batch: pa.Table) -> pa.Table:
    """Winners of one coarse bucket → one (doc_id, keep_idxs) row per doc.
    Vectorized: sort by packed, split on doc boundary via offsets.

    ``keep_idxs`` is the doc's winning paragraph indices as little-endian
    int32 BYTES (Acero hash join — which backs ray.data.Dataset.join —
    does not accept list columns as payload, but binary works)."""
    packed = np.sort(batch.column("packed").to_numpy(zero_copy_only=False))
    if len(packed) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "keep_idxs": pa.array([], pa.binary())})
    doc = packed >> _IDX_BITS
    idx = (packed & _IDX_MASK).astype("<i4")
    boundary = np.concatenate(([True], doc[1:] != doc[:-1]))
    offsets = np.concatenate(
        (np.flatnonzero(boundary), [len(doc)])).astype(np.int32) * 4
    blobs = pa.Array.from_buffers(
        pa.binary(), len(offsets) - 1,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(idx.tobytes())])
    return pa.table({"doc_id": pa.array(doc[boundary]), "keep_idxs": blobs})


def collect_keep_lists(winners, num_buckets: int = 64):
    """Stage 3: winners (fp1, fp2, packed) → (doc_id, keep_idxs).  The
    groupby key is the coarse bucket (``num_buckets`` groups), so the
    map_groups kernel runs per bucket, not per document."""
    def _bucket(batch: pa.Table) -> pa.Table:
        packed = batch.column("packed")
        doc = pc.shift_right(packed, _IDX_BITS)
        bucket = pc.cast(
            pc.bit_wise_and(doc, num_buckets - 1), pa.int32())
        return pa.table({"packed": packed, "bucket": bucket})
    return (winners.map_batches(_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: _keep_lists_group(g),
                        batch_format="pyarrow"))


def _apply_keep_batch(batch: pa.Table, text_col: str, id_col: str,
                      delim: str, min_chars: int) -> pa.Table:
    """Stage 4 kernel: re-split, keep (winner ∪ short) paragraphs,
    reassemble with pc.binary_join.  ``keep_idxs`` may be null (doc had no
    dedupable paragraph → keep everything short)."""
    out_cols = [c for c in batch.schema.names if c != "keep_idxs"]
    if batch.num_rows == 0:
        return batch.select(out_cols)
    flat, counts = _split_offsets(batch.column(text_col), delim)
    parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    para_idx = np.arange(len(flat), dtype=np.int64) - starts[parent]

    nchars = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = nchars < min_chars  # short paragraphs always survive

    # Winner membership: flatten this batch's keep_idxs next to its rows.
    kl = pc.fill_null(batch.column("keep_idxs"), b"")
    if isinstance(kl, pa.ChunkedArray):
        kl = kl.combine_chunks()
    ln = (pc.binary_length(kl).to_numpy(zero_copy_only=False)
          .astype(np.int64) // 4)
    kflat = np.frombuffer(b"".join(kl.to_pylist()), dtype="<i4")
    kparent = np.repeat(np.arange(len(ln), dtype=np.int64), ln)
    winner_keys = (kparent << _IDX_BITS) | kflat.astype(np.int64)
    para_keys = (parent << _IDX_BITS) | para_idx
    keep |= np.isin(para_keys, winner_keys, assume_unique=False)

    kept_counts = np.bincount(parent[keep], minlength=len(counts))
    offsets = np.concatenate(
        ([0], np.cumsum(kept_counts))).astype(np.int32)
    kept_lists = pa.ListArray.from_arrays(
        pa.array(offsets), flat.filter(pa.array(keep)))
    text = pc.binary_join(kept_lists, delim)
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, text).select(out_cols)


def paragraph_dedup(docs, text_col: str = "text", id_col: str = "doc_id",
                    delim: str = "\n", min_chars: int = 1,
                    num_partitions: int = 8, num_buckets: int = 64):
    """Corpus-wide first-occurrence paragraph dedup; returns the documents
    Dataset with ``text_col`` rewritten (schema unchanged)."""
    kw = {"text_col": text_col, "id_col": id_col,
          "delim": delim, "min_chars": min_chars}
    exploded = docs.map_batches(explode_paragraph_keys,
                                batch_format="pyarrow", fn_kwargs=kw)
    winners = (exploded.groupby(["fp1", "fp2"]).min("packed")
               .rename_columns({"min(packed)": "packed"})
               .select_columns(["packed"]))
    keep_lists = collect_keep_lists(winners, num_buckets=num_buckets)
    # Coalesce away the schema-less empty blocks groupby/map_groups can
    # emit — a join against such a block fails with "no match for
    # FieldRef" (same workaround as dedup.connected_components).
    keep_lists = keep_lists.repartition(num_partitions)
    joined = docs.join(keep_lists, "left_outer", num_partitions,
                       on=(id_col,), right_on=("doc_id",))
    return joined.map_batches(_apply_keep_batch, batch_format="pyarrow",
                              fn_kwargs=kw)


def remove_frequent_lines(docs, min_df: int = 5, text_col: str = "text",
                          id_col: str = "doc_id", delim: str = "\n",
                          max_boiler_lines: int = 2_000_000):
    """C4/RefinedWeb-style BOILERPLATE LINE REMOVAL: any line occurring in
    ``min_df`` or more distinct documents (nav bars, cookie banners, legal
    footers) is dropped from every document; documents whose every line is
    boilerplate disappear from the output.

    Census pass: per-batch combiner emits (line fingerprint, distinct-doc
    partial count) — per-document de-duplication happens inside the batch,
    so the exchange carries the batch's line VOCABULARY, never the lines
    themselves; a groupby sums the partials and the ``>= min_df``
    survivors (the boilerplate set — tiny by construction: a line present
    in min_df docs across a 10^10-doc corpus is rare) broadcast once via
    ``ray.put``.  Apply pass: shuffle-free map_batches drops flagged lines
    and reassembles with ``pc.binary_join``.  Same 64-bit fingerprint
    collision caveat as exact dedup: a collision could drop one innocent
    line; the DuckDB oracle comparison would catch it.

    ``max_boiler_lines`` guards the broadcast: more survivors than this
    raises rather than silently shipping an oversized set.
    """
    import ray

    from ..functions.textstats import fingerprint64_array

    def census(batch: pa.Table) -> pa.Table:
        flat, counts = _split_offsets(batch.column(text_col), delim)
        fps = fingerprint64_array(flat).view(np.int64)
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        # distinct (doc, line) inside the batch
        keep = np.ones(len(fps), dtype=bool)
        order = np.lexsort((fps, row))
        fo, ro = fps[order], row[order]
        keep[order[1:]] = (fo[1:] != fo[:-1]) | (ro[1:] != ro[:-1])
        vals, cnts = np.unique(fps[keep], return_counts=True)
        return pa.table({"line_fp": pa.array(vals),
                         "n": pa.array(cnts.astype(np.int64))})

    freq = (docs.map_batches(census, batch_format="pyarrow")
            .groupby("line_fp").sum("n")
            .rename_columns({"sum(n)": "df"})
            .filter(expr=f"df >= {min_df}")
            .select_columns(["line_fp"]))
    boiler = np.sort(np.concatenate(
        [b.column("line_fp").to_numpy() for b in
         (ray.get(r) for r in freq.to_arrow_refs()) if b.num_rows]
        or [np.array([], dtype=np.int64)]))
    if len(boiler) > max_boiler_lines:
        raise ValueError(
            f"{len(boiler)} boilerplate lines exceed the broadcast budget "
            f"({max_boiler_lines}); raise min_df or the budget")
    boiler_ref = ray.put(boiler)

    def apply(batch: pa.Table) -> pa.Table:
        bad = ray.get(boiler_ref)
        flat, counts = _split_offsets(batch.column(text_col), delim)
        fps = fingerprint64_array(flat).view(np.int64)
        if len(bad):
            pos = np.clip(np.searchsorted(bad, fps), 0, len(bad) - 1)
            keep = bad[pos] != fps
        else:
            keep = np.ones(len(fps), dtype=bool)
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        new_counts = np.bincount(row[keep], minlength=len(counts))
        offsets = np.concatenate([[0], np.cumsum(new_counts)])
        kept = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            flat.filter(pa.array(keep)))
        text = pc.binary_join(kept, pa.scalar(delim))
        out = batch.set_column(
            batch.schema.get_field_index(text_col), text_col, text)
        return out.filter(pa.array(new_counts > 0))

    return docs.map_batches(apply, batch_format="pyarrow")
