"""Per-group exact quantiles vs a numpy brute-force oracle, including
negative values, single-row groups, and partitioning independence."""

import numpy as np
import pyarrow as pa

from lingua_ray.functions.quantiles import (grouped_quantiles,
                                            quantile_hist_batch)

_QS = {"p50": 0.5, "p90": 0.9, "p99": 0.99}


def _oracle(keys, vals, q):
    out = {}
    for k in np.unique(keys):
        v = np.sort(vals[keys == k])
        rank = max(1, int(np.ceil(q * len(v))))
        out[k] = int(v[rank - 1])
    return out


def _fixture(n=5000, seed=5):
    rng = np.random.default_rng(seed)
    keys = rng.choice(["en", "de", "fr", "zz"], n, p=[0.6, 0.25, 0.1499,
                                                      0.0001])
    vals = rng.integers(-50, 4000, n)
    return keys, vals


def test_hist_batch_counts_pairs():
    t = pa.table({"k": ["a", "a", "b", "a"],
                  "v": pa.array([-3, -3, 7, 5], pa.int64())})
    h = quantile_hist_batch(t, "k", "v")
    rows = {(r["k"], r["v"]): r["cnt"] for r in h.to_pylist()}
    assert rows == {("a", -3): 2, ("a", 5): 1, ("b", 7): 1}


def test_hist_batch_wide_range_no_wrap():
    """Values spanning more than 2**63 used to wrap in `vals - vmin`
    BEFORE the overflow guard ran, corrupting the fast path's composite
    ids; the range check must happen in Python ints."""
    lo, hi = -2**62, 2**62
    t = pa.table({"k": ["a", "b", "a", "b"],
                  "v": pa.array([lo, lo, hi, hi], pa.int64())})
    h = quantile_hist_batch(t, "k", "v")
    rows = {(r["k"], r["v"]): r["cnt"] for r in h.to_pylist()}
    assert rows == {("a", lo): 1, ("a", hi): 1,
                    ("b", lo): 1, ("b", hi): 1}


def test_exact_quantiles_empty_input(ray_session):
    import ray.data
    from lingua_ray.functions.quantiles import exact_quantiles
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array([], pa.int64())}))
    n, out = exact_quantiles(ds, "v", {"p50": 0.5})
    assert n == 0 and out == {"p50": 0}


def test_grouped_quantiles_matches_bruteforce(ray_session):
    import ray.data
    keys, vals = _fixture()
    t = pa.table({"lang": pa.array(keys), "n_chars": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(7)
    got = {r["lang"]: r for r in
           grouped_quantiles(ds, "lang", "n_chars", _QS).take_all()}
    for name, q in _QS.items():
        want = _oracle(keys, vals, q)
        for k, v in want.items():
            assert got[k][name] == v, (name, k)
    for k in np.unique(keys):
        assert got[k]["n"] == int((keys == k).sum())


def test_partitioning_independence(ray_session):
    import ray.data
    keys, vals = _fixture(n=800, seed=9)
    t = pa.table({"lang": pa.array(keys), "n_chars": pa.array(vals)})
    a = sorted(grouped_quantiles(ray.data.from_arrow(t).repartition(1),
                                 "lang", "n_chars", _QS).take_all(),
               key=lambda r: r["lang"])
    b = sorted(grouped_quantiles(ray.data.from_arrow(t).repartition(13),
                                 "lang", "n_chars", _QS).take_all(),
               key=lambda r: r["lang"])
    assert a == b
