"""Global ordered prefix sum without a global sort.

``SUM(value) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)`` — the
sequence-packing / budget-cutoff primitive — seems to demand a total
order, but only range-LOCAL order is ever needed once exclusive range
offsets are known:

1. sample pass: each block contributes a few evenly-spaced sorted keys;
   the pooled sample's quantiles become ``n_ranges - 1`` boundaries.
   Boundaries affect load balance ONLY — the result is exact for any
   choice, so sampling luck cannot corrupt values.
2. per-range totals: a per-block combiner (group_by range inside
   map_batches) then one tiny ``n_ranges``-row groupby; the driver takes
   the exclusive prefix over ranges (``n_ranges`` numbers).
3. one range-keyed shuffle of (key, value) pairs; each range task sorts
   its ~n/n_ranges keys with ``pc.sort_indices`` (vectorized Arrow
   string sort, no per-row Python) and adds offset + local cumsum.

Partitioning assumptions: keys are UNIQUE (ties across a boundary would
be split arbitrarily — callers cumsum over aggregated keys, which are
unique by construction), and no single range overflows a task — true
when boundaries come from the data's own sample; a pathological
all-equal-key input degenerates to one range, which uniqueness excludes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_RANGE = "__r"


def global_cumsum(ds, order_col: str, value_col: str,
                  n_ranges: int = 64, sample_per_block: int = 64):
    """Dataset of (order_col, value_col, ``cum``) — ``cum`` the inclusive
    running total of ``value_col`` under ``ORDER BY order_col``."""

    def sample(batch: pa.Table) -> pa.Table:
        keys = batch.column(order_col).combine_chunks()
        idx = pc.sort_indices(keys)
        take = np.unique(np.linspace(
            0, len(idx) - 1, num=min(sample_per_block, len(idx)),
            dtype=np.int64)) if len(idx) else np.array([], dtype=np.int64)
        return pa.table({order_col: keys.take(idx.take(pa.array(take)))})

    # The pooled sample is driver-side; cap it so a 10^6-block input
    # cannot ship S x n_blocks keys to the driver.  limit() keeps the
    # EARLIEST blocks' samples — a biased sample can only unbalance the
    # ranges, never corrupt values (offsets are exact for any bounds).
    pooled = (ds.map_batches(sample, batch_format="pyarrow")
                .limit(262_144).take_all())
    keys = sorted(r[order_col] for r in pooled)
    if len(keys) > 1:
        cut = np.unique(np.linspace(0, len(keys) - 1,
                                    num=min(n_ranges + 1, len(keys)),
                                    dtype=np.int64))[1:-1]
        bounds = sorted({keys[i] for i in cut})
    else:
        bounds = []

    def assign(batch: pa.Table) -> pa.Table:
        k = batch.column(order_col)
        r = np.zeros(batch.num_rows, dtype=np.int64)
        for b in bounds:   # <= n_ranges vectorized passes, no row loop
            r += np.asarray(pc.greater_equal(k, b).combine_chunks()
                            .to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({
            _RANGE: pa.array(r),
            order_col: k,
            "__v": batch.column(value_col).cast(pa.int64())})

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def range_partials(batch: pa.Table) -> pa.Table:
        return batch.select([_RANGE, "__v"]).group_by(_RANGE).aggregate(
            [("__v", "sum")]).rename_columns([_RANGE, "__v"])

    totals = {int(r[_RANGE]): int(r["__v"]) for r in
              assigned.map_batches(range_partials, batch_format="pyarrow")
              .groupby(_RANGE).sum("__v")
              .rename_columns([_RANGE, "__v"]).take_all()}
    offsets = np.zeros(len(bounds) + 1, dtype=np.int64)
    acc = 0
    for r in range(len(bounds) + 1):
        offsets[r] = acc
        acc += totals.get(r, 0)

    def cum_range(group: pa.Table) -> pa.Table:
        off = offsets[int(group.column(_RANGE)[0].as_py())]
        idx = pc.sort_indices(group.column(order_col).combine_chunks())
        g = group.take(idx)
        cum = off + np.cumsum(g.column("__v").to_numpy())
        return pa.table({order_col: g.column(order_col),
                         value_col: g.column("__v"),
                         "cum": pa.array(cum)})

    return assigned.groupby(_RANGE).map_groups(
        cum_range, batch_format="pyarrow")
