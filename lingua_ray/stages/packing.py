"""Sequence packing — grouping documents into fixed-token-budget bins.

The final assembly step of an LLM training-data pipeline: pack variable-
length documents into bins of at most ``cap`` tokens (one bin ≈ one
training sequence).  Packing is BLOCK-LOCAL by design: bins must be
materialized somewhere, so the right distributed shape is "each worker
packs the documents it already holds" — no shuffle, embarrassingly
parallel, and the partitioning assumption (bins never span blocks) costs
at most one under-filled bin per block, amortized to nothing at real block
sizes.

Bin ids are globally unique and deterministic WITHOUT any cross-task
coordination: a bin is identified by the first document id it contains
(each document lives in exactly one bin, so first-ids never collide).

Algorithm: next-fit in arrival order — the streaming-friendly packer
(one open bin, O(1) state).  ``presort=True`` sorts the block by
descending size first, giving NEXT-fit-DECREASING (the same single-open-
bin scan over the sorted order) — tighter than plain next-fit, but not
true first-fit-decreasing, which would revisit earlier open bins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_batch(batch: pa.Table, cap: int, tokens_col: str = "n_tokens",
               id_col: str = "doc_id", presort: bool = False) -> pa.Table:
    """Next-fit pack one batch.  Appends ``bin_id`` (id of the bin's first
    document) and ``bin_fill`` (total tokens in the bin, repeated on each
    member row).  A single document larger than ``cap`` gets its own bin.
    """
    if presort and batch.num_rows:
        batch = batch.sort_by([(tokens_col, "descending"),
                               (id_col, "ascending")])
    toks = np.asarray(batch.column(tokens_col).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    n = len(toks)
    bin_of = np.zeros(n, dtype=np.int64)
    fill = 0
    current = 0
    fills: list[int] = []
    for i in range(n):  # integer next-fit scan; ~10M rows/s, never the
        t = int(toks[i])  # bottleneck next to tokenization upstream
        if i == 0 or fill + t > cap:
            if i:
                fills.append(fill)
            current = i
            fill = 0
        bin_of[i] = current
        fill += t
    if n:
        fills.append(fill)
    starts = np.unique(bin_of)
    fill_of_start = dict(zip(starts.tolist(), fills))
    bin_fill = np.fromiter((fill_of_start[b] for b in bin_of.tolist()),
                           dtype=np.int64, count=n)
    bin_ids = np.asarray(ids)[bin_of]
    batch = batch.append_column(
        "bin_id", pa.array(bin_ids, type=batch.schema.field(id_col).type))
    return batch.append_column("bin_fill",
                               pa.array(bin_fill, type=pa.int64()))


def pack_sequences(ds, cap: int, tokens_col: str = "n_tokens",
                   id_col: str = "doc_id", presort: bool = False):
    """Pack a Dataset into token bins of at most ``cap`` (block-local)."""
    return ds.map_batches(pack_batch, batch_format="pyarrow",
                          fn_kwargs={"cap": cap, "tokens_col": tokens_col,
                                     "id_col": id_col, "presort": presort})


def pack_sequences_grouped(ds, cap: int, group_col: str,
                           tokens_col: str = "n_tokens",
                           id_col: str = "doc_id",
                           presort: bool = False):
    """Group-homogeneous packing: bins never mix groups (e.g. pack per
    language so each training batch is monolingual).  ONE hash shuffle
    co-locates each group; the pack kernel itself is unchanged.
    Partitioning assumption: one group's rows fit in one task — if a
    group is corpus-sized, pre-split it (e.g. by id-hash) and pack the
    shards independently: next-fit bins never span the split anyway."""
    def pack_group(group: pa.Table) -> pa.Table:
        return pack_batch(group, cap=cap, tokens_col=tokens_col,
                          id_col=id_col, presort=presort)

    return ds.groupby(group_col).map_groups(pack_group,
                                            batch_format="pyarrow")
