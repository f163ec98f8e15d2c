"""Global row_number / ntile vs pandas oracle, with ties and skew."""

import numpy as np
import pandas as pd
import pyarrow as pa

from lingua_ray.functions.rank import _ntile_of_rank, global_row_number


def test_ntile_remainder_rule():
    rn = np.arange(1, 11)
    # 10 rows, 3 tiles: sizes 4, 3, 3
    assert list(_ntile_of_rank(rn, 10, 3)) == \
        [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    # fewer rows than tiles: tile = rank
    assert list(_ntile_of_rank(np.arange(1, 4), 3, 10)) == [1, 2, 3]


def test_global_row_number_matches_pandas(ray_session):
    import ray.data
    rng = np.random.default_rng(41)
    v = rng.integers(0, 30, 2000)  # heavy ties
    ids = rng.permutation(2000).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "n_chars": pa.array(v.astype(np.int64))})
    got = pd.DataFrame(global_row_number(
        ray.data.from_arrow(t).repartition(7), "n_chars", "doc_id",
        ntile=10).take_all()).sort_values("doc_id", ignore_index=True)
    df = t.to_pandas().sort_values(["n_chars", "doc_id"],
                                   ignore_index=True)
    df["rn"] = np.arange(1, len(df) + 1)
    df["tile"] = _ntile_of_rank(df["rn"].to_numpy(), len(df), 10)
    want = df.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "rn", "tile"]], want[["doc_id", "rn", "tile"]])
