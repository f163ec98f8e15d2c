"""Session-window operator (gap-based event-time windows)."""

import numpy as np
import pyarrow as pa
import pytest

from lingua_ray.stages.windows import sessionize_group


def _events(user, minutes):
    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = [base + np.timedelta64(int(m * 60_000_000), "us") for m in minutes]
    return pa.table({
        "user_id": pa.array([user] * len(minutes), type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def test_sessionize_group_gap_splits():
    # gaps: 10min (same), 40min (break), 5min (same)
    t = _events("u1", [0, 10, 50, 55])
    out = sessionize_group(t, gap_seconds=1800.0)
    assert out.column("n_events").to_pylist() == [2, 2]
    starts = out.column("session_start").to_pylist()
    ends = out.column("session_end").to_pylist()
    assert starts[0].minute == 0 and ends[0].minute == 10
    assert starts[1].minute == 50 and ends[1].minute == 55


def test_sessionize_group_unsorted_input_and_exact_gap():
    # exactly 30min gap is NOT a break (strict >)
    t = _events("u2", [30, 0, 60.0001])
    out = sessionize_group(t, gap_seconds=1800.0)
    assert out.column("n_events").to_pylist() == [2, 1]


def test_sessionize_group_single_and_empty():
    out = sessionize_group(_events("u3", [5]), gap_seconds=1800.0)
    assert out.column("n_events").to_pylist() == [1]
    empty = sessionize_group(_events("u", []).slice(0, 0))
    assert empty.num_rows == 0
    assert empty.column_names == ["user_id", "session_start",
                                  "session_end", "n_events"]


def test_sessionize_dataset(ray_session):
    import ray.data
    from lingua_ray.stages.windows import sessionize
    t = pa.concat_tables([_events("a", [0, 10, 100]),
                          _events("b", [0, 200])])
    out = sessionize(ray.data.from_arrow(t), gap_seconds=1800.0).take_all()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user["a"]) == [1, 2]
    assert sorted(per_user["b"]) == [1, 1]


def test_funnel_count_formula_matches_greedy():
    """The ballot-style prefix-slack identity behind events_funnel_count
    equals the greedy earliest-match counter on random sequences."""
    import random

    import numpy as np

    def greedy(seq):
        c1 = c2 = c3 = 0
        for e in seq:
            if e == "v":
                c1 += 1
            elif e == "c" and c2 < c1:
                c2 += 1
            elif e == "p" and c3 < c2:
                c3 += 1
        return c3

    def formula(seq):
        et = np.array(seq)
        if len(et) == 0:
            return 0
        v = np.cumsum(et == "v")
        c = np.cumsum(et == "c")
        p = np.cumsum(et == "p")
        m2 = c - np.maximum(np.maximum.accumulate(c - v), 0)
        return int(p[-1] - max(np.max(p - m2), 0))

    rng = random.Random(7)
    for _ in range(20000):
        seq = [rng.choice("vcpx") for _ in range(rng.randint(0, 15))]
        assert greedy(seq) == formula(seq), seq


def test_events_retention_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = E.queries()["events_retention"](sf).to_pandas()
    got = got[sorted(got.columns)].sort_values(
        by=sorted(got.columns), ignore_index=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(E.oracle_sql()["events_retention"]).df()
    want = want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
