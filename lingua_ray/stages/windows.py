"""Event-time window operators over the events stream table.

The reference is a pure batch library with no streaming concepts
(SURVEY.md §2.8); these are the training-data-pipeline window operators a
100-TB event log needs, expressed Ray-Data-first:

* **Tumbling windows** — bucket inside ``map_batches`` (pure function of
  the timestamp), then a tiny ``groupby(bucket)`` — the shuffle carries
  one row per (bucket, key), never the events (see ``events_hourly``).
* **Session windows** (gap-based) — ``groupby(user).map_groups``: the
  exchange co-locates each user's events; the per-group kernel is a
  vectorized sort + gap-diff + reduceat.  Partitioning assumption: one
  user's events fit in one group (a hot user costs one O(n log n) sort in
  one task, nothing else — same skew argument as order restoration).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sessionize_group(batch: pa.Table, gap_seconds: float = 1800.0,
                     key_col: str = "user_id",
                     ts_col: str = "ts") -> pa.Table:
    """One user's events → one row per session.

    A session breaks where the time since the previous event exceeds
    ``gap_seconds``.  Emits (key, session_start, session_end, n_events);
    fully vectorized (sort → diff → cumsum boundary ids → reduceat).
    """
    ts_type = batch.schema.field(ts_col).type
    key_type = batch.schema.field(key_col).type
    if batch.num_rows == 0:
        return pa.table({
            key_col: pa.array([], type=key_type),
            "session_start": pa.array([], type=ts_type),
            "session_end": pa.array([], type=ts_type),
            "n_events": pa.array([], type=pa.int64()),
        })
    batch = batch.sort_by([(ts_col, "ascending")])
    ts = batch.column(ts_col).to_numpy()          # datetime64[us]
    gaps = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
    brk = np.concatenate([[True], gaps > int(gap_seconds * 1_000_000)])
    starts = np.flatnonzero(brk)
    ends = np.concatenate([starts[1:], [len(ts)]])
    key = batch.column(key_col)[0]
    n = len(starts)
    return pa.table({
        key_col: pa.array([key.as_py()] * n, type=key_type),
        "session_start": pa.array(ts[starts], type=ts_type),
        "session_end": pa.array(ts[ends - 1], type=ts_type),
        "n_events": pa.array((ends - starts).astype(np.int64)),
    })


def sessionize(ds, gap_seconds: float = 1800.0, key_col: str = "user_id",
               ts_col: str = "ts"):
    """Gap-based session windows over an events Dataset."""
    return ds.groupby(key_col).map_groups(
        sessionize_group, batch_format="pyarrow",
        fn_kwargs={"gap_seconds": gap_seconds, "key_col": key_col,
                   "ts_col": ts_col})
