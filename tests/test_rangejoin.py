"""Range (interval) join: broadcast and bucketed variants against a
brute-force oracle, including overlapping intervals, unmatched rows,
and bucket boundaries landing exactly on interval endpoints."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lingua_ray.stages.rangejoin import (broadcast_range_join,
                                         bucketed_range_join)


def _left_table(n=500, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "row_id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.uniform(-10.0, 110.0, n)),
    })


_INTERVALS = pa.table({
    "lo": pa.array([0.0, 20.0, 50.0, 50.0, 90.0], pa.float64()),
    "hi": pa.array([30.0, 60.0, 50.0, 100.0, 95.0], pa.float64()),
    "band": pa.array(["a", "b", "empty", "c", "d"]),
})


def _brute(left: pa.Table, ivl: pa.Table, how: str) -> pd.DataFrame:
    lt, it = left.to_pandas(), ivl.to_pandas()
    out = []
    for _, r in lt.iterrows():
        hits = it[(it["lo"] <= r["v"]) & (r["v"] < it["hi"])]
        if len(hits) == 0:
            if how == "left":
                out.append({"row_id": r["row_id"], "v": r["v"],
                            "band": None})
            continue
        for _, h in hits.iterrows():
            out.append({"row_id": r["row_id"], "v": r["v"],
                        "band": h["band"]})
    return pd.DataFrame(out, columns=["row_id", "v", "band"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(by=["row_id", "band"],
                          na_position="last", ignore_index=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_matches_bruteforce(ray_session, how):
    import ray.data
    left = ray.data.from_arrow(_left_table()).repartition(4)
    got = broadcast_range_join(left, _INTERVALS, "v",
                               how=how).to_pandas()
    want = _brute(_left_table(), _INTERVALS, how)
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_broadcast_left_keeps_unmatched(ray_session):
    import ray.data
    left = ray.data.from_arrow(_left_table())
    got = broadcast_range_join(left, _INTERVALS, "v",
                               how="left").to_pandas()
    # values outside every interval (e.g. < 0 or >= 100) must survive
    n_out = int(((got["v"] < 0) | (got["v"] >= 100)).sum())
    assert n_out > 0
    assert got.loc[(got["v"] < 0) | (got["v"] >= 100), "band"].isna().all()


def test_broadcast_no_match_at_all(ray_session):
    import ray.data
    far = pa.table({"row_id": pa.array([1, 2], pa.int64()),
                    "v": pa.array([-500.0, 900.0])})
    ds = broadcast_range_join(ray.data.from_arrow(far), _INTERVALS, "v")
    # the per-block schema survives even when every row is dropped
    # (Dataset.to_pandas() on an all-empty dataset loses columns, so
    # assert on the dataset schema, which is the actual contract)
    assert ds.schema().names == ["row_id", "v", "band"]
    assert ds.count() == 0


@pytest.mark.parametrize("boundaries", [
    [50.0],                       # one cut, ON an interval endpoint
    [0.0, 30.0, 60.0, 100.0],     # cuts on every endpoint
    [13.0, 47.0, 81.0],           # cuts nowhere near endpoints
])
def test_bucketed_equals_broadcast(ray_session, boundaries):
    import ray.data
    left = ray.data.from_arrow(_left_table()).repartition(4)
    got = bucketed_range_join(left, _INTERVALS, "v",
                              boundaries).to_pandas()
    want = _brute(_left_table(), _INTERVALS, "inner")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_bucketed_fuzzed_boundaries(ray_session):
    """Random interval tables and random boundary grids must always
    reproduce the brute-force join — boundary placement is correctness-
    irrelevant by construction."""
    import ray.data
    rng = np.random.default_rng(23)
    left = _left_table(n=120, seed=3)
    for trial in range(5):
        n_ivl = int(rng.integers(1, 8))
        lo = rng.uniform(-20, 100, n_ivl)
        hi = lo + rng.uniform(0, 60, n_ivl)
        ivl = pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                        "band": pa.array([f"b{i}" for i in range(n_ivl)])})
        cuts = np.sort(rng.uniform(-30, 130, int(rng.integers(1, 6))))
        cuts = np.unique(cuts)
        got = bucketed_range_join(
            ray.data.from_arrow(left).repartition(3), ivl, "v",
            list(cuts)).to_pandas()
        want = _brute(left, ivl, "inner")
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)


def test_bucketed_rejects_bad_boundaries(ray_session):
    import ray.data
    left = ray.data.from_arrow(_left_table())
    with pytest.raises(ValueError):
        bucketed_range_join(left, _INTERVALS, "v", [])
    with pytest.raises(ValueError):
        bucketed_range_join(left, _INTERVALS, "v", [5.0, 5.0])


def test_column_collision_raises(ray_session):
    import ray.data
    bad = _INTERVALS.append_column("v", pa.array([0.0] * 5))
    with pytest.raises(ValueError):
        bucketed_range_join(ray.data.from_arrow(_left_table()), bad, "v",
                            [50.0])
