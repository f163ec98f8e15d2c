"""Skew-proof aggregation: salted two-stage groupby-sum.

A plain ``groupby(key).sum()`` sends every row of a hot key to ONE
reduce task — with 5 event types over 10^12 events, five tasks do all
the work.  Salting splits each key into ``salt`` sub-keys for the first
(wide) aggregation, so reduce parallelism is keys × salt regardless of
skew, then a second groupby over the tiny salted partials removes the
salt.  With the per-batch combiner in front, stage 1's exchange is
already ≤ keys × salt rows per block.

Sums are integer (caller scales floats to fixed-point first) so the
result is bit-identical no matter how the additions associate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def salted_sum(ds, key_col: str, value_col: str, salt: int = 16):
    """Dataset of (key_col, ``sum_<value_col>``) — exact integer sums,
    reduce parallelism ≥ distinct-keys × salt."""
    from ray.data.aggregate import Sum
    out_col = f"sum_{value_col}"

    def combine(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        vals = batch.column(value_col).to_numpy().astype(np.int64)
        enc = (keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
               else keys).dictionary_encode()
        kidx = enc.indices.to_numpy().astype(np.int64)
        # deterministic-irrelevant salt: spread rows round-robin so the
        # per-(key, salt) partials stay balanced within the block too
        s = np.arange(len(vals), dtype=np.int64) % salt
        comp = kidx * salt + s
        sums = np.zeros(len(enc.dictionary) * salt, dtype=np.int64)
        np.add.at(sums, comp, vals)
        # emit cells that were TOUCHED, not cells that are nonzero — a key
        # whose block-local partial sums to 0 (all-zero values, or +x/-x in
        # one cell) must still reach stage 2, exactly like SQL SUM
        counts = np.zeros(len(enc.dictionary) * salt, dtype=np.int64)
        np.add.at(counts, comp, 1)
        nz = np.flatnonzero(counts)
        return pa.table({
            key_col: enc.dictionary.take(pa.array(nz // salt)),
            "__salt": pa.array(nz % salt),
            out_col: pa.array(sums[nz]),
        })

    stage1 = ds.map_batches(combine, batch_format="pyarrow") \
        .groupby([key_col, "__salt"]).aggregate(Sum(out_col)) \
        .rename_columns({f"sum({out_col})": out_col})
    stage2 = stage1.groupby(key_col).sum(out_col) \
        .rename_columns({f"sum({out_col})": out_col})
    return stage2
