"""ROLLUP-style hierarchical count aggregation.

``rollup_counts(ds, keys)`` produces the same rows as SQL
``GROUP BY ROLLUP (k1, k2, ...)`` counting rows: one row per finest
(k1..kn) combination, plus subtotal rows per prefix with the collapsed
keys NULL, plus one grand-total row (all keys NULL).

Scale shape: the CORPUS is aggregated exactly once — a per-batch
combiner emits partial (k1..kn, n) counts, one hash groupby sums them.
Every coarser level is then derived by re-aggregating the previous
level's output, whose size is bounded by key cardinality, not corpus
rows; those groupbys are exchanges of tiny tables.
"""

from __future__ import annotations

import pyarrow as pa


def _count_partial(batch: pa.Table, keys: list[str]) -> pa.Table:
    t = pa.TableGroupBy(batch.select(keys), keys).aggregate([([], "count_all")])
    return t.rename_columns(keys + ["n"])


def rollup_counts(ds, keys: list[str]):
    """Dataset of (k1..kn nullable, n) rollup rows."""
    from ray.data.aggregate import Sum

    finest = ds.map_batches(_count_partial, batch_format="pyarrow",
                            fn_kwargs={"keys": keys}) \
        .groupby(keys).aggregate(Sum("n")) \
        .rename_columns({"sum(n)": "n"}).materialize()

    key_types = {f.name: f.type for f in
                 (finest.schema().base_schema if hasattr(finest.schema(),
                                                         "base_schema")
                  else finest.schema())}

    def null_fill(cols: list[str]):
        """Re-attach the collapsed keys as typed nulls."""
        def fn(batch: pa.Table) -> pa.Table:
            out = {}
            for k in keys:
                out[k] = (batch.column(k) if k in batch.column_names
                          else pa.nulls(batch.num_rows,
                                        type=key_types[k]))
            out["n"] = batch.column("n")
            return pa.table(out)
        return fn

    levels = [finest]
    prev = finest
    for i in range(len(keys) - 1, -1, -1):
        kept = keys[:i]
        if kept:
            coarser = prev.groupby(kept).aggregate(Sum("n")) \
                .rename_columns({"sum(n)": "n"})
        else:
            total = int(prev.sum("n") or 0)
            coarser_tbl = pa.table(
                {"n": pa.array([total], pa.int64())})
            import ray.data
            coarser = ray.data.from_arrow(coarser_tbl)
        coarser = coarser.map_batches(null_fill(kept),
                                      batch_format="pyarrow").materialize()
        levels.append(coarser)
        prev = coarser

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out
