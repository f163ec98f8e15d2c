"""Skew-bounded per-key-ordinal primitives: adjacent pairs and prefix sums.

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

Contract: for :func:`adjacent_pairs` and :func:`rolling_join`,
``order_col`` must be a DENSE ordinal per key (0..n-1, the natural
contract for assembled transcripts' turn_idx).  With sparse ordinals a
gap spanning a whole empty bucket would silently drop the pair across
it — callers with sparse orders must first densify (rank) or fall back
to a boundary-stitch second pass.  :func:`bounded_cumsum` has NO such
requirement: its bucket offsets are exact sums over whatever ordinals
exist, so sparse orders (e.g. ranking only the tool turns of a
conversation) are fine — tested in test_adjacency.py.
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


def rolling_join(ds, key_col: str, order_col: str, text_col: str,
                 k: int, sep: str = "\n", bucket_size: int = 100_000):
    """Skew-bounded per-key rolling window assembly (``string_agg(text,
    sep) OVER (PARTITION BY key ORDER BY ordinal ROWS BETWEEN k PRECEDING
    AND CURRENT ROW)``): one row per input row with a ``context`` column
    joining the up-to-``k`` preceding texts plus the row's own.

    The context-window op of transcript processing (each turn sees its
    recent history).  Same bucketing as :func:`adjacent_pairs`, but the
    halo runs the other way: each bucket's LAST ``k`` rows are cloned
    into the NEXT bucket, where they sort first and supply the preceding
    texts for that bucket's head rows without emitting output themselves.
    No group ever exceeds ``bucket_size + k`` rows, and the extra text
    shipped is ``k/bucket_size`` of the corpus.  Window assembly is
    all-vectorized: a repeat/arange flat gather index into the sorted
    group, wrapped as a ListArray and joined with ``pc.binary_join``.

    Same DENSE-ordinal contract as the other primitives here.  Requires
    ``k < bucket_size`` (a window deeper than a bucket would need halo
    from two buckets back).
    """
    import pyarrow.compute as pc
    if k >= bucket_size:
        raise ValueError("rolling_join needs k < bucket_size")
    B = bucket_size
    _HALO = "__halo"

    def add_buckets(batch: pa.Table) -> pa.Table:
        o = batch.column(order_col).cast(pa.int64()).to_numpy()
        home = o // B
        out = batch.append_column(_BUCKET, pa.array(home)).append_column(
            _HALO, pa.array(np.zeros(len(o), dtype=bool)))
        tail = o % B >= B - k
        if not tail.any():
            return out
        clone = batch.filter(pa.array(tail)).append_column(
            _BUCKET, pa.array(home[tail] + 1)).append_column(
            _HALO, pa.array(np.ones(int(tail.sum()), dtype=bool)))
        return pa.concat_tables([out, clone])

    def ctx_group(group: pa.Table) -> pa.Table:
        o = group.column(order_col).cast(pa.int64()).to_numpy()
        order = np.argsort(o, kind="stable")
        g = group.take(pa.array(order))
        o = o[order]
        halo = np.asarray(g.column(_HALO).to_numpy(zero_copy_only=False))
        home = np.flatnonzero(~halo)
        if len(home) == 0:      # clones spilled into an empty next bucket
            return pa.table({
                key_col: pa.array([], type=group.schema.field(key_col).type),
                order_col: pa.array([], type=pa.int64()),
                "context": pa.array([], type=pa.string())})
        # window length per home row: its own row + up to k preceding
        # ordinals; with a dense ordinal the halo guarantees they are all
        # present in this group, so positions home[i]-lens+1 .. home[i]
        lens = np.minimum(o[home] + 1, k + 1)
        starts = home - lens + 1
        if len(starts) and starts.min() < 0:
            # fail loudly at the contract, not with an ArrowIndexError
            # three frames deep in a worker
            raise ValueError(
                "rolling_join requires DENSE 0-based per-key ordinals "
                "(see docstring): a window reaches before this bucket's "
                "rows, which only happens when ordinals have gaps or a "
                "key does not start at 0")
        # flat gather: concat of [starts[i] .. home[i]] ranges
        flat = (np.arange(int(lens.sum()))
                - np.repeat(np.cumsum(lens) - lens, lens)
                + np.repeat(starts, lens))
        gathered = g.column(text_col).take(pa.array(flat))
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            gathered.combine_chunks().cast(pa.string()))
        ctx = pc.binary_join(lst, sep)
        idx = pa.array(home)
        return pa.table({key_col: g.column(key_col).take(idx),
                         order_col: pa.array(o[home], type=pa.int64()),
                         "context": ctx})

    return (ds.map_batches(add_buckets, batch_format="pyarrow")
              .groupby([key_col, _BUCKET])
              .map_groups(ctx_group, batch_format="pyarrow"))


def bounded_cumsum(ds, key_col: str, order_col: str, value_col: str,
                   bucket_size: int = 100_000,
                   max_total: int | None = None):
    """Skew-bounded per-key running total (``SUM ... OVER (PARTITION BY
    key ORDER BY ordinal) ROWS UNBOUNDED PRECEDING``): returns a Dataset
    with columns ``key_col``, ``order_col``, ``cum`` (int64, inclusive).

    Plan (three stages, no group ever holds more than one BUCKET of
    rows, so a 10^8-turn mega-key never lands in one task):

    1. per-block combiner: (key, ordinal // B) partial sums — the first
       shuffle carries one tiny row per (key, bucket, block);
    2. per-key exclusive prefix over BUCKET partials (a key contributes
       ~n/B rows here — 1/bucket_size of its data, the same duplication
       bound as :func:`adjacent_pairs`);
    3. offset rows are unioned with the raw rows and a (key,
       bucket)-keyed groupby adds ``offset + within-bucket cumsum``.

    ``max_total`` prunes: buckets whose exclusive offset already exceeds
    it can contain no row with ``cum <= max_total`` (values must be
    non-negative), so their offset rows are dropped in stage 2 and stage
    3 emits nothing for them — a budget-truncation scan of a mega-key
    does per-group work only on its head buckets.
    """
    B = bucket_size

    def partials(batch: pa.Table) -> pa.Table:
        o = batch.column(order_col).cast(pa.int64()).to_numpy()
        t = pa.table({key_col: batch.column(key_col),
                      _BUCKET: pa.array(o // B),
                      "__v": batch.column(value_col).cast(pa.int64())})
        return t.group_by([key_col, _BUCKET]).aggregate(
            [("__v", "sum")]).rename_columns([key_col, _BUCKET, "__v"])

    def offsets(group: pa.Table) -> pa.Table:
        b = group.column(_BUCKET).to_numpy()
        v = group.column("__v").to_numpy()
        ub, inv = np.unique(b, return_inverse=True)
        sums = np.zeros(len(ub), dtype=np.int64)
        np.add.at(sums, inv, v)
        off = np.concatenate([[0], np.cumsum(sums)[:-1]])
        if max_total is not None:
            keep = off <= max_total
            ub, off = ub[keep], off[keep]
        key = group.column(key_col)[0].as_py()
        return pa.table({
            key_col: pa.array([key] * len(ub),
                              type=group.schema.field(key_col).type),
            _BUCKET: pa.array(ub, type=pa.int64()),
            order_col: pa.array(np.full(len(ub), -1), type=pa.int64()),
            "__v": pa.array(off, type=pa.int64()),
            "__is_off": pa.array(np.ones(len(ub), dtype=bool))})

    def tag_rows(batch: pa.Table) -> pa.Table:
        o = batch.column(order_col).cast(pa.int64()).to_numpy()
        return pa.table({key_col: batch.column(key_col),
                         _BUCKET: pa.array(o // B),
                         order_col: pa.array(o, type=pa.int64()),
                         "__v": batch.column(value_col).cast(pa.int64()),
                         "__is_off": pa.array(np.zeros(len(o), dtype=bool))})

    def cum_group(group: pa.Table) -> pa.Table:
        is_off = np.asarray(group.column("__is_off").to_numpy(
            zero_copy_only=False))
        key_type = group.schema.field(key_col).type
        empty = pa.table({key_col: pa.array([], type=key_type),
                          order_col: pa.array([], type=pa.int64()),
                          "cum": pa.array([], type=pa.int64())})
        if not is_off.any():          # bucket pruned by max_total
            return empty
        off = int(group.column("__v").to_numpy()[is_off][0])
        rows = group.filter(pa.array(~is_off))
        if rows.num_rows == 0:        # offset row for an all-elsewhere key
            return empty
        o = rows.column(order_col).to_numpy()
        order = np.argsort(o, kind="stable")
        cum = off + np.cumsum(rows.column("__v").to_numpy()[order])
        return pa.table({key_col: rows.column(key_col).take(pa.array(order)),
                         order_col: pa.array(o[order], type=pa.int64()),
                         "cum": pa.array(cum, type=pa.int64())})

    parts = ds.map_batches(partials, batch_format="pyarrow")
    offs = parts.groupby(key_col).map_groups(offsets,
                                             batch_format="pyarrow")
    rows = ds.map_batches(tag_rows, batch_format="pyarrow")
    return rows.union(offs).groupby([key_col, _BUCKET]).map_groups(
        cum_group, batch_format="pyarrow")
