"""Conversation assembly: turn rows → one concatenated document per
conversation, in turn order — the context-assembly step between a
cleaned turn table and sequence packing.

ONE hash shuffle keyed on the conversation id co-locates each
conversation; the per-group kernel is a vectorized argsort + Arrow
``binary_join`` (no Python string loop).  Partitioning assumption: one
conversation fits in one task — transcripts are bounded (thousands of
turns), unlike corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def assemble_conversations(ds, conv_col: str = "conv_id",
                           idx_col: str = "turn_idx",
                           text_col: str = "text", sep: str = "\n"):
    """Dataset of (conv_col, n_turns, text): turns joined by ``sep`` in
    ascending ``idx_col`` order."""

    def join_group(group: pa.Table) -> pa.Table:
        idx = group.column(idx_col).to_numpy()
        order = np.argsort(idx, kind="stable")
        texts = pc.fill_null(group.column(text_col), "").take(
            pa.array(order))
        texts = (texts.combine_chunks()
                 if isinstance(texts, pa.ChunkedArray) else texts)
        # parquet readers often hand back large_string; binary_join has
        # no list<large_string> kernel
        texts = texts.cast(pa.string())
        lst = pa.ListArray.from_arrays(
            pa.array([0, len(texts)], pa.int32()), texts)
        joined = pc.binary_join(lst, sep)
        return pa.table({
            conv_col: group.column(conv_col).slice(0, 1),
            "n_turns": pa.array([group.num_rows], pa.int64()),
            text_col: joined,
        })

    pruned = ds.select_columns([conv_col, idx_col, text_col])
    return pruned.groupby(conv_col).map_groups(join_group,
                                               batch_format="pyarrow")
