"""Greedy corpus selection under a global budget.

"Take documents in descending score order until the token budget is
spent" is a global prefix-sum over a sorted corpus — but it does NOT
need a global sort.  The (score, total_cost, count) histogram (combiner
→ groupby → driver cumsum, KBs for a bounded-cardinality score) locates
the BOUNDARY score: every row scoring above it is in, every row below
is out, and only the boundary-score rows (one histogram bucket) need
id-ordered tie-breaking — they are gathered, sorted by id, and admitted
until the remainder of the budget is spent.  Selection is then a
shuffle-free broadcast-threshold filter.

Semantics match the SQL window form exactly::

    SELECT id FROM (
      SELECT id, sum(cost) OVER (ORDER BY score DESC, id) AS cum ...)
    WHERE cum <= budget
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def select_under_budget(ds, score_col: str, cost_col: str, budget: int,
                        id_col: str = "doc_id"):
    """Dataset of (id, score, cost) rows: the greedy prefix by
    (score desc, id asc) whose running cost stays ≤ ``budget``."""

    def hist(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy().astype(np.int64)
        c = batch.column(cost_col).to_numpy().astype(np.int64)
        uv, inv = np.unique(s, return_inverse=True)
        # integer accumulation: float-weighted bincount would lose
        # exactness once a bucket's total cost crosses 2^53
        bucket_cost = np.zeros(len(uv), dtype=np.int64)
        np.add.at(bucket_cost, inv, c)
        return pa.table({
            "score": pa.array(uv),
            "cost": pa.array(bucket_cost),
        })

    rows = ds.map_batches(hist, batch_format="pyarrow") \
        .groupby("score").sum("cost").take_all()
    if not rows:
        # keep the documented (id, score, cost) output schema on empty
        from ..stages.util import empty_typed_dataset
        return empty_typed_dataset(
            ds, {id_col: None, score_col: None, cost_col: None})
    rows.sort(key=lambda r: -r["score"])
    scores = np.array([r["score"] for r in rows], dtype=np.int64)
    costs = np.array([r["sum(cost)"] for r in rows], dtype=np.int64)
    cum = np.cumsum(costs)
    # last bucket whose FULL inclusion stays within budget
    k = int(np.searchsorted(cum, budget, side="right"))
    full_cut = int(scores[k - 1]) if k > 0 else None
    spent = int(cum[k - 1]) if k > 0 else 0
    boundary = int(scores[k]) if k < len(scores) else None

    cols = [id_col, score_col, cost_col]

    def keep_full(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        if full_cut is None:
            return t.slice(0, 0)
        s = t.column(score_col).to_numpy().astype(np.int64)
        return t.filter(pa.array(s >= full_cut))

    kept = ds.map_batches(keep_full, batch_format="pyarrow")
    if boundary is None:
        return kept

    # boundary bucket: gather ONLY rows at that exact score (one
    # histogram bucket), admit in id order until the budget is spent
    def at_boundary(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        s = t.column(score_col).to_numpy().astype(np.int64)
        return t.filter(pa.array(s == boundary))

    brows = ds.map_batches(at_boundary, batch_format="pyarrow").take_all()
    brows.sort(key=lambda r: r[id_col])
    remaining = budget - spent
    admit = []
    for r in brows:
        if r[cost_col] > remaining:
            break
        remaining -= r[cost_col]
        admit.append(r)
    if not admit:
        return kept
    import ray.data
    # schema from the SOURCE dataset, not a hardcoded int64 triple — the
    # id column may be a string (or any type); a mismatched schema would
    # crash from_pylist or poison the union
    base = ds.schema().base_schema
    btbl = pa.Table.from_pylist(
        admit, schema=pa.schema([base.field(c) for c in cols]))
    return kept.union(ray.data.from_arrow(btbl))
