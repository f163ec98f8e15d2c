"""Wide↔long reshaping and moment-based normalization.

``melt`` (UNPIVOT): block-local flat-map — no shuffle, streams at any
scale.  ``zscore_column``: the classic distributed-moments pattern —
each block emits (n, sum, sumsq), the driver folds three numbers, and
normalization is a shuffle-free map with broadcast scalars.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def melt_batch(batch: pa.Table, id_cols: list[str], value_cols: list[str],
               var_col: str = "variable",
               val_col: str = "value") -> pa.Table:
    """UNPIVOT: one output row per (input row, value column)."""
    parts = []
    for c in value_cols:
        cols = {ic: batch.column(ic) for ic in id_cols}
        cols[var_col] = pa.array([c] * batch.num_rows, pa.string())
        cols[val_col] = batch.column(c).cast(pa.float64())
        parts.append(pa.table(cols))
    if not parts:
        return pa.table({ic: batch.column(ic).slice(0, 0)
                         for ic in id_cols})
    return pa.concat_tables(parts)


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_col: str = "variable", val_col: str = "value"):
    return ds.map_batches(melt_batch, batch_format="pyarrow",
                          fn_kwargs={"id_cols": id_cols,
                                     "value_cols": value_cols,
                                     "var_col": var_col,
                                     "val_col": val_col})


def column_moments(ds, value_col: str) -> tuple[int, float, float]:
    """(n, mean, stddev_pop) via a (n, sum, sumsq) per-block combiner —
    three numbers per block on the wire."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy().astype(np.float64)
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "s": pa.array([float(v.sum())], pa.float64()),
                         "s2": pa.array([float((v * v).sum())],
                                        pa.float64())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        return 0, 0.0, 0.0
    s = sum(r["s"] for r in rows)
    s2 = sum(r["s2"] for r in rows)
    mean = s / n
    var = max(s2 / n - mean * mean, 0.0)
    return n, mean, float(np.sqrt(var))


def zscore_column(ds, value_col: str, out_col: str = "z",
                  ndigits: int = 6):
    """Attach ``(x - mean) / stddev_pop`` rounded to ``ndigits``;
    stddev 0 yields 0."""
    _, mean, std = column_moments(ds, value_col)

    def attach(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy().astype(np.float64)
        z = np.zeros_like(v) if std == 0.0 else (v - mean) / std
        return batch.append_column(out_col,
                                   pa.array(np.round(z, ndigits)))

    return ds.map_batches(attach, batch_format="pyarrow")
