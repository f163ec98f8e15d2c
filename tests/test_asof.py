"""As-of join operator: vectorized group kernel + Dataset composition
vs DuckDB's native ASOF JOIN."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lingua_ray.stages.asof import _SIDE, asof_group

SF = "/root/testdata/sf0.001"


def _group(l_ts, r_ts, l_ids=None, r_ids=None):
    l_ids = l_ids if l_ids is not None else list(range(len(l_ts)))
    r_ids = r_ids if r_ids is not None else list(
        range(100, 100 + len(r_ts)))
    return pa.table({
        "k": pa.array(["u"] * (len(l_ts) + len(r_ts))),
        "t": pa.array(list(l_ts) + list(r_ts), type=pa.int64()),
        "event_id": pa.array(list(l_ids) + list(r_ids), type=pa.int64()),
        _SIDE: pa.array([0] * len(l_ts) + [1] * len(r_ts),
                        type=pa.int8()),
    })


def test_backward_picks_most_recent_at_or_before():
    out = asof_group(_group([5, 15, 2], [3, 10, 20]), "k", "t",
                     ["event_id"])
    got = {r["event_id"]: (r["t_right"], r["event_id_right"])
           for r in out.to_pylist()}
    assert got == {0: (3, 100), 1: (10, 101), 2: (None, None)} or \
        got == {0: (3, 100), 1: (10, 101)}
    # left row at t=2 has no match (inner join drops it)
    assert 2 not in got


def test_backward_equal_ts_matches():
    out = asof_group(_group([10], [10]), "k", "t", ["event_id"])
    assert out.to_pylist() == [{"k": "u", "t": 10, "event_id": 0,
                                "t_right": 10, "event_id_right": 100}]


def test_forward_picks_earliest_at_or_after():
    out = asof_group(_group([5, 25], [3, 10, 20]), "k", "t",
                     ["event_id"], direction="forward")
    got = {r["event_id"]: r["t_right"] for r in out.to_pylist()}
    assert got == {0: 10}  # t=25 has nothing after it


def test_empty_sides_keep_schema():
    empty_right = asof_group(_group([1, 2], []), "k", "t", ["event_id"])
    assert empty_right.num_rows == 0
    assert empty_right.column_names == ["k", "t", "event_id",
                                        "t_right", "event_id_right"]
    empty_left = asof_group(_group([], [1]), "k", "t", ["event_id"])
    assert empty_left.num_rows == 0


def test_kernel_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    l_ts = rng.integers(0, 1000, 50).tolist()
    r_ts = rng.integers(0, 1000, 80).tolist()
    out = asof_group(_group(l_ts, r_ts), "k", "t", ["event_id"])
    got = {r["event_id"]: r["t_right"] for r in out.to_pylist()}
    for i, lt in enumerate(l_ts):
        at_or_before = [rt for rt in r_ts if rt <= lt]
        if at_or_before:
            assert got[i] == max(at_or_before)
        else:
            assert i not in got


def test_events_attribution_matches_duckdb_asof(ray_session):
    import __ray_entry__ as E

    got = E.queries()["events_attribution"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(E.oracle_sql()["events_attribution"]).df()
    got = got[sorted(got.columns)].sort_values(
        by=list(sorted(got.columns)), ignore_index=True)
    want = want[sorted(want.columns)].sort_values(
        by=list(sorted(want.columns)), ignore_index=True)
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
