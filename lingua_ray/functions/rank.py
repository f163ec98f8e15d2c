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

_RANGE = "__r"  # range-id column of partitioned_row_number's one shuffle


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


def partitioned_row_number(ds, part_col: str, value_col: str, id_col: str,
                           ntile: int | None = None, n_ranges: int = 64,
                           sample_per_block: int = 64,
                           spill_input: str | None = None):
    """``row_number() OVER (PARTITION BY part ORDER BY value, id)`` (and
    optional ``ntile(k)`` over the same window) WITHOUT a global sort and
    WITHOUT the bounded-value-cardinality assumption ``global_row_number``
    makes — values may be continuous (quality scores, perplexities).

    Three passes, one shuffle:

    1. per-partition totals — a tiny combiner + groupby (assumption:
       PARTITION cardinality fits the driver: languages, sources, tiers —
       not values);
    2. sampled range boundaries on the COMPOSITE key (part, value, id) +
       per-(range, part) counts → exclusive per-part offsets.  Because id
       is part of the boundary key the order is total, so equal
       (part, value) rows may split across ranges freely — each range's
       local sort plus the offset is still the exact global rank.
       Boundaries affect load balance only, never values.
    3. ONE range-keyed shuffle of (part, value, id) triples (never
       payload columns); each range task lexsorts its ~n/n_ranges rows
       and adds the broadcast offset; ``ntile`` follows from the rank and
       the per-part total by the SQL remainder rule.

    The triple table is consumed three times (sample, counts, rank).
    Ray Datasets are lazy, so when ``ds``'s upstream is expensive (a
    scoring pass over every document) pass ``spill_input`` (a name
    keying the input) to spill the PROJECTED 24-byte triples to parquet
    once and re-read per consumer — otherwise the upstream re-executes
    per pass (the sessionize/lang_switch_stats spill convention).
    """
    import ray

    ds = ds.select_columns([part_col, value_col, id_col])
    if spill_input is not None:
        from ..stages.spill import spill
        ds = spill(ds, "prank", spill_input)

    def sample(batch: pa.Table) -> pa.Table:
        t = batch.select([part_col, value_col, id_col])
        if t.num_rows == 0:
            return t
        idx = _composite_order(t, part_col, value_col, id_col)
        take = np.unique(np.linspace(0, len(idx) - 1,
                                     num=min(sample_per_block, len(idx)),
                                     dtype=np.int64))
        return t.take(pa.array(idx[take]))

    pooled = (ds.map_batches(sample, batch_format="pyarrow")
              .limit(262_144).take_all())
    keys = sorted((r[part_col], r[value_col], r[id_col]) for r in pooled)
    if not keys:
        from ..stages.util import empty_typed_dataset
        cols = {id_col: None, part_col: None, value_col: None,
                "rn": pa.int64()}
        if ntile is not None:
            cols["tile"] = pa.int64()
        return empty_typed_dataset(ds, cols)
    cut = np.unique(np.linspace(0, len(keys) - 1,
                                num=min(n_ranges + 1, len(keys)),
                                dtype=np.int64))[1:-1]
    bounds = sorted({keys[i] for i in cut})

    def assign(batch: pa.Table) -> pa.Table:
        t = batch.select([part_col, value_col, id_col])
        p = np.asarray(t.column(part_col).to_numpy(zero_copy_only=False))
        v = t.column(value_col).to_numpy()
        i = t.column(id_col).to_numpy()
        r = np.zeros(t.num_rows, dtype=np.int32)
        for bp, bv, bi in bounds:
            ge = (p > bp) | ((p == bp) & ((v > bv) | ((v == bv)
                                                     & (i >= bi))))
            r += ge.astype(np.int32)
        return t.append_column(_RANGE, pa.array(r))

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # typed empty: pa.array(np.unique(<empty object array>))
            # would yield a null-typed part column and break schema
            # unification in the downstream groupby
            return pa.table({
                _RANGE: pa.array([], pa.int32()),
                part_col: pa.array([], batch.schema.field(part_col).type),
                "cnt": pa.array([], pa.int64())})
        r = batch.column(_RANGE).to_numpy().astype(np.int64)
        p = np.asarray(batch.column(part_col).to_numpy(zero_copy_only=False))
        uniq_p, codes = np.unique(p, return_inverse=True)
        key = r * len(uniq_p) + codes
        uk, uc = np.unique(key, return_counts=True)
        return pa.table({
            _RANGE: pa.array((uk // len(uniq_p)).astype(np.int32)),
            part_col: pa.array(uniq_p[uk % len(uniq_p)]),
            "cnt": pa.array(uc.astype(np.int64))})

    cnt_rows = (assigned.map_batches(counts, batch_format="pyarrow")
                .groupby([_RANGE, part_col]).sum("cnt").take_all())
    per_part: dict = {}
    for row in sorted(cnt_rows, key=lambda r: (r[part_col], r[_RANGE])):
        part = row[part_col]
        per_part.setdefault(part, []).append(
            (row[_RANGE], int(row["sum(cnt)"])))
    offsets: dict = {}
    totals: dict = {}
    for part, lst in per_part.items():
        acc = 0
        for rng, c in lst:
            offsets[(rng, part)] = acc
            acc += c
        totals[part] = acc
    ref = ray.put((offsets, totals))

    def rank_range(group: pa.Table) -> pa.Table:
        offs, tot = ray.get(ref)
        rng = int(group.column(_RANGE)[0].as_py())
        order = _composite_order(group, part_col, value_col, id_col)
        g = group.take(pa.array(order))
        p = np.asarray(g.column(part_col).to_numpy(zero_copy_only=False))
        n = g.num_rows
        starts = np.flatnonzero(
            np.concatenate([[True], p[1:] != p[:-1]]))
        local = np.arange(n, dtype=np.int64)
        local -= np.repeat(starts, np.diff(np.concatenate([starts, [n]])))
        base = np.array([offs[(rng, p[s])] for s in starts], dtype=np.int64)
        rn = local + 1 + np.repeat(
            base, np.diff(np.concatenate([starts, [n]])))
        out = {id_col: g.column(id_col), part_col: g.column(part_col),
               value_col: g.column(value_col), "rn": pa.array(rn)}
        if ntile is not None:
            tile = np.empty(n, dtype=np.int64)
            pos = np.concatenate([starts, [n]])
            for j, s in enumerate(starts):
                e = pos[j + 1]
                tile[s:e] = _ntile_of_rank(rn[s:e], tot[p[s]], ntile)
            out["tile"] = pa.array(tile)
        return pa.table(out)

    return assigned.groupby(_RANGE).map_groups(rank_range,
                                               batch_format="pyarrow")


def _composite_order(t: pa.Table, part_col: str, value_col: str,
                     id_col: str) -> np.ndarray:
    """Ascending (part, value, id) row order; string parts are
    dictionary-encoded through np.unique so lexsort never sees object
    dtype (np.unique's code order is numpy string order — the same
    comparison the range-boundary assignment uses)."""
    p = np.asarray(t.column(part_col).to_numpy(zero_copy_only=False))
    _, codes = np.unique(p, return_inverse=True)
    return np.lexsort((t.column(id_col).to_numpy(),
                       t.column(value_col).to_numpy(), codes))
