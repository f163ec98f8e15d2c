"""Global row_number / ntile without a global sort.

``row_number() OVER (ORDER BY value, id)`` seems to demand a total
order, but it decomposes: rank(row) = (# rows with smaller value)
+ (rank of id among rows with the SAME value).  The first term comes
from the broadcast cumulative (value, count) histogram; the second
needs tied rows co-located — ONE hash shuffle keyed on the value, with
only (value, id) 16-byte pairs on the wire, never payload columns.

``ntile(k)`` follows from the rank by the SQL remainder rule (first
``n % k`` tiles get one extra row).

Partitioning assumption: one VALUE's ties fit in one task — true for
bounded-cardinality columns (lengths, scores).  A pathological
all-one-value column degenerates to a single task; salt by id-hash and
merge offsets if that ever matters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ntile_of_rank(rn: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL ntile: first n%k tiles have ceil(n/k) rows, the rest floor."""
    q, r = divmod(n, k)
    if q == 0:  # fewer rows than tiles: tile = rank
        return rn.copy()
    big = r * (q + 1)
    out = np.where(rn <= big, (rn - 1) // (q + 1) + 1,
                   r + (rn - big - 1) // q + 1)
    return out.astype(np.int64)


def global_row_number(ds, value_col: str, id_col: str, ntile: int | None = None):
    """Dataset of (id, value, rn[, tile]) — ``rn`` is the 1-based global
    row number under (value asc, id asc)."""
    import ray

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy().astype(np.int64)
        uv, uc = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv),
                         "cnt": pa.array(uc.astype(np.int64))})

    rows = ds.map_batches(hist, batch_format="pyarrow") \
        .groupby("v").sum("cnt").take_all()
    if not rows:
        # empty input still gets the DOCUMENTED output schema, not the
        # source schema (downstream select/union crash otherwise)
        from ..stages.util import empty_typed_dataset
        cols = {id_col: None, value_col: None, "rn": pa.int64()}
        if ntile is not None:
            cols["tile"] = pa.int64()
        return empty_typed_dataset(ds, cols)
    rows.sort(key=lambda r: r["v"])
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["sum(cnt)"] for r in rows], dtype=np.int64)
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    n = int(cnts.sum())
    ref = ray.put((vals, below))

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.select([value_col, id_col])

    def rank_group(group: pa.Table) -> pa.Table:
        v_arr, b_arr = ray.get(ref)
        ids = group.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")
        g = group.take(pa.array(order))
        v0 = int(g.column(value_col)[0].as_py())
        base = int(b_arr[np.searchsorted(v_arr, v0)])
        rn = base + np.arange(1, g.num_rows + 1, dtype=np.int64)
        out = {id_col: g.column(id_col),
               value_col: g.column(value_col),
               "rn": pa.array(rn)}
        if ntile is not None:
            out["tile"] = pa.array(_ntile_of_rank(rn, n, ntile))
        return pa.table(out)

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby(value_col).map_groups(rank_group, batch_format="pyarrow")
