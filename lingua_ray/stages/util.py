"""Shared Arrow batch helpers for stage functions."""

from __future__ import annotations

import pyarrow as pa


def set_column(batch: pa.Table, name: str, arr) -> pa.Table:
    """Append a column, replacing any existing column of the same name (input
    tables may already carry columns like ``lang`` or ``n_chars``)."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    if name in batch.schema.names:
        return batch.set_column(batch.schema.get_field_index(name), name, arr)
    return batch.append_column(name, arr)
