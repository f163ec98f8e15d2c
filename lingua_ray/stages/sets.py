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


def _tag_left(left, schema: pa.Schema):
    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([f.name for f in schema])
        return t.append_column(
            _SIDE, pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    return left.map_batches(tag, batch_format="pyarrow")


def _tag_right_keys(right, on: str, right_on: str, schema: pa.Schema):
    """Combiner: distinct right keys per batch, left columns null-padded."""

    def tag(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.column(right_on))
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

    tagged = _tag_left(left, schema).union(
        _tag_right_keys(right, on, right_on or on, schema))

    def pick(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE).to_numpy()
        has_right = bool((side == 1).any())
        body = group.drop_columns([_SIDE])
        if has_right == keep_if_right_present:
            return body.filter(pa.array(side == 0))
        return body.slice(0, 0)

    return tagged.groupby(on).map_groups(pick, batch_format="pyarrow")


def semi_join(left, right, on: str, right_on: str | None = None):
    """Left rows whose key appears in ``right`` (distributed EXISTS)."""
    return _filter_join(left, right, on, right_on,
                        keep_if_right_present=True)


def anti_join(left, right, on: str, right_on: str | None = None):
    """Left rows whose key does NOT appear in ``right`` (NOT EXISTS)."""
    return _filter_join(left, right, on, right_on,
                        keep_if_right_present=False)
