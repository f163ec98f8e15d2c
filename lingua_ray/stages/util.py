"""Shared Arrow batch helpers for stage functions."""

from __future__ import annotations

import pyarrow as pa


def md5_hex_ranks(ids) -> list[str]:
    """``hashlib.md5(str(id)).hexdigest()`` per id — THE shared rank
    primitive all deterministic sampling/splitting/shuffling stages and
    their DuckDB oracles (``md5(CAST(id AS VARCHAR))``) depend on.  Any
    change here desynchronizes every [SQL-verified] parity claim that
    cites consistent md5-of-id rank — don't."""
    import hashlib
    return [hashlib.md5(str(i).encode()).hexdigest() for i in ids]


def round_half_away(x, ndigits: int = 6):
    """DuckDB ``round()`` parity: half AWAY from zero.  ``np.round`` is
    half-to-even and silently diverges from every [SQL-verified] oracle
    whenever the unrounded value is an exactly-representable
    x.xxxxxx5 — which ratios with small power-of-two denominators
    (97/128, i/2^k unions, b/2^k ranks) actually produce (caught live by
    the sf0.1 gate on min-max normalization)."""
    import numpy as np
    s = 10.0 ** ndigits
    v = np.asarray(x, dtype=np.float64) * s
    return np.sign(v) * np.floor(np.abs(v) + 0.5) / s


def utf8_filled(col) -> pa.Array:
    """Text column with nulls as '' — tolerating the NULL-TYPED blocks
    Ray Data emits when every value in a block is null (fill_null has no
    kernel for the null type; cast first)."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    return pc.fill_null(col, "") if col.null_count else col


def empty_typed_dataset(ds, cols: dict):
    """Zero-row Dataset with an explicit schema — Ray Data derives no
    schema from zero blocks, so driver-side reduces that hit empty input
    must hand back a typed literal.  ``cols`` maps column name to a
    ``pa.DataType``, or ``None`` to inherit that column's type from
    ``ds``'s schema."""
    import ray.data
    base = ds.schema().base_schema
    return ray.data.from_arrow(pa.table(
        {name: pa.array([], base.field(name).type if typ is None else typ)
         for name, typ in cols.items()}))


def topk_by_score(batch: pa.Table, score_col: str, id_col: str,
                  k: int) -> pa.Table:
    """The k rows with the largest ``score_col`` (ties: ``id_col``
    ascending) — one Arrow multi-key sort, any id/score type, no Python
    row loop."""
    import pyarrow.compute as pc
    if batch.num_rows <= k:
        return batch
    idx = pc.sort_indices(batch, sort_keys=[(score_col, "descending"),
                                            (id_col, "ascending")])
    return batch.take(idx.slice(0, k))


def topk_reduce(ds, score_col: str, id_col: str, k: int,
                n_reduce: int = 16) -> pa.Table:
    """Global top-k of a (id, score) Dataset: per-block top-k → one
    salted tree-reduce level → driver merge.  k-safe for any row
    partitioning (a row dropped from a block's top-k is beaten by ≥ k
    rows there, so it cannot be in the global top-k); the driver sees
    ≤ n_reduce × k rows no matter how many blocks the input has."""
    import numpy as np

    base = ds.schema().base_schema
    schema = pa.schema([(id_col, base.field(id_col).type),
                        (score_col, base.field(score_col).type)])
    numeric_id = pa.types.is_integer(schema.field(id_col).type)

    local = ds.map_batches(topk_by_score, batch_format="pyarrow",
                           fn_kwargs={"score_col": score_col,
                                      "id_col": id_col, "k": k})

    def _salt(batch: pa.Table) -> pa.Table:
        if numeric_id:
            s = (batch.column(id_col).to_numpy() % n_reduce).astype("int32")
        else:  # string/other ids: hash-salt instead of numeric modulo
            from ..functions.textstats import fingerprint64_array
            s = (fingerprint64_array(
                pc_cast_string(batch.column(id_col)))
                % np.uint64(n_reduce)).astype("int32")
        return batch.append_column("salt", pa.array(s))

    def _topk_group(group: pa.Table) -> pa.Table:
        return topk_by_score(group.drop_columns(["salt"]), score_col,
                             id_col, k)

    reduced = (local.map_batches(_salt, batch_format="pyarrow")
               .groupby("salt").map_groups(_topk_group,
                                           batch_format="pyarrow"))
    t = pa.Table.from_pylist(reduced.take_all(), schema=schema)
    return topk_by_score(t, score_col, id_col, k)


def pc_cast_string(col) -> pa.Array:
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.cast(col, pa.string())


def set_column(batch: pa.Table, name: str, arr) -> pa.Table:
    """Append a column, replacing any existing column of the same name (input
    tables may already carry columns like ``lang`` or ``n_chars``)."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    if name in batch.schema.names:
        return batch.set_column(batch.schema.get_field_index(name), name, arr)
    return batch.append_column(name, arr)
