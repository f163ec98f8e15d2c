"""Generic as-of join over Ray Data: for every left row, the most recent
right row with the same key and timestamp <= (backward) or >= (forward)
the left timestamp.

Ray Data has no native as-of join; this composes one from the primitives
the brief allows: tag each side, union the two (minimal, column-pruned)
datasets, hash-shuffle ONCE by the join key (`groupby(by)`), and run a
vectorized searchsorted merge inside `map_groups`.  Both sides move over
the wire exactly once, co-partitioned by key — the same exchange a hash
join would do, with no sort barrier (each group sorts locally).

Both sides are pruned to the same `(by, on, *keep)` column set so the
union's schemas align; rename columns upstream if the sides differ.

Partitioning assumption: one key's rows fit in one task (documented in
SCALE.md).  A mega-key (one user with ~10^8 events) would need
time-bucket salting — split the right side into coarse time buckets,
duplicate each left row into its own and the previous bucket, then keep
the per-row max match; not needed at the current data shapes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SIDE = "__asof_side"


def _minimal(ds, cols: list[str], side: int):
    """Column-prune to ``cols`` and tag the side."""

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        return t.append_column(
            _SIDE, pa.array(np.full(t.num_rows, side, dtype=np.int8)))

    return ds.map_batches(tag, batch_format="pyarrow")


def asof_group(group: pa.Table, by: str, on: str, keep: list[str],
               right_suffix: str = "_right",
               direction: str = "backward") -> pa.Table:
    """Vectorized as-of merge for one key's rows (both sides tagged)."""

    side = group.column(_SIDE).to_numpy()
    lmask, rmask = side == 0, side == 1
    on_vals = group.column(on).to_numpy()
    lv, rv = on_vals[lmask], on_vals[rmask]

    left_cols = [by, on] + keep
    right_cols = [on] + keep
    if not lv.size or not rv.size:
        return pa.table(
            {**{c: pa.array([], type=group.column(c).type)
                for c in left_cols},
             **{c + right_suffix: pa.array([], type=group.column(c).type)
                for c in right_cols}})

    order = np.argsort(rv, kind="stable")
    rv_sorted = rv[order]
    if direction == "backward":
        # rightmost right row with rv <= lv
        idx = np.searchsorted(rv_sorted, lv, side="right") - 1
        hit = idx >= 0
    else:
        # leftmost right row with rv >= lv
        idx = np.searchsorted(rv_sorted, lv, side="left")
        hit = idx < len(rv_sorted)
        idx = np.minimum(idx, len(rv_sorted) - 1)

    # inner join: drop left rows with no match
    l_rows = np.flatnonzero(lmask)[hit]
    r_rows = np.flatnonzero(rmask)[order[idx[hit]]]

    l_idx, r_idx = pa.array(l_rows), pa.array(r_rows)
    cols: dict[str, pa.Array] = {
        c: group.column(c).take(l_idx) for c in left_cols}
    for c in right_cols:
        cols[c + right_suffix] = group.column(c).take(r_idx)
    return pa.table(cols)


def asof_join(left, right, by: str, on: str, keep: list[str],
              right_suffix: str = "_right", direction: str = "backward"):
    """As-of join two Ray Datasets (inner, most-recent-match semantics)."""

    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    cols = [by, on] + keep
    tagged = _minimal(left, cols, 0).union(_minimal(right, cols, 1))

    def merge(group: pa.Table) -> pa.Table:
        return asof_group(group, by, on, keep, right_suffix, direction)

    return tagged.groupby(by).map_groups(merge, batch_format="pyarrow")
