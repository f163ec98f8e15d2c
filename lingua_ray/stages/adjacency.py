"""Skew-bounded adjacent-pair extraction over a dense per-key ordinal.

The adjacency primitive behind transcript lag/transition analyses
(reference semantics: LAG OVER (PARTITION BY key ORDER BY ordinal)).  A
plain ``groupby(key).map_groups`` hands one task the whole group — a
mega-conversation with 10^8 turns is one task's memory.  Instead the
ordinal is bucketed (``ordinal // bucket_size``) so no group ever
exceeds ``bucket_size + 1`` rows, and the pair that crosses a bucket
boundary is recovered by CLONING each bucket's first row (``ordinal %
bucket_size == 0``) into the previous bucket before the shuffle: the
clone sorts last in the previous bucket, completing its final pair,
while in its home bucket it is first and so begins no duplicate pair.
One map_batches + ONE (key, bucket)-keyed shuffle, no second stitch
pass, ~1/bucket_size row duplication.

Contract: ``order_col`` must be a DENSE ordinal per key (0..n-1, the
natural contract for assembled transcripts' turn_idx).  With sparse
ordinals a gap spanning a whole empty bucket would silently drop the
pair across it — callers with sparse orders must first densify (rank)
or fall back to a boundary-stitch second pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BUCKET = "__bucket"


def adjacent_pairs(ds, key_col: str, order_col: str,
                   value_cols: list[str], bucket_size: int = 100_000):
    """Dataset of adjacency pairs: one row per consecutive (ordinal i,
    i+1) pair within each key, columns ``key_col``, ``prev_<order_col>``,
    ``<order_col>``, and ``prev_<v>`` / ``<v>`` for each value column."""
    cols = [order_col, *value_cols]

    def add_buckets(batch: pa.Table) -> pa.Table:
        o = batch.column(order_col).cast(pa.int64()).to_numpy()
        home = o // bucket_size
        out = batch.append_column(_BUCKET, pa.array(home))
        starts = (o % bucket_size == 0) & (home > 0)
        if not starts.any():
            return out
        clone = batch.filter(pa.array(starts)).append_column(
            _BUCKET, pa.array(home[starts] - 1))
        return pa.concat_tables([out, clone])

    def pairs_group(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column(order_col).to_numpy(),
                           kind="stable")
        g = group.take(pa.array(order))
        n = g.num_rows
        out = {key_col: g.column(key_col).slice(1)}
        for c in cols:
            out["prev_" + c] = g.column(c).slice(0, max(n - 1, 0))
            out[c] = g.column(c).slice(1)
        return pa.table(out)

    return (ds.map_batches(add_buckets, batch_format="pyarrow")
              .groupby([key_col, _BUCKET])
              .map_groups(pairs_group, batch_format="pyarrow"))
