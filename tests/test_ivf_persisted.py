"""Persisted IVF index: build (partitioned-by-list parquet) then probe
with directory pruning; recall vs brute force on clustered data."""

import numpy as np
import pyarrow as pa

from lingua_ray.stages.ann import (ivf_build_index, ivf_query_index,
                                   knn_bruteforce)


def _clustered(n=2000, dim=16, n_clusters=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_clusters, dim))
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + rng.normal(0, 0.05, (n, dim))
    return x


def _dataset(x):
    import ray.data
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.array(list(x)),
    })
    return ray.data.from_arrow(t).repartition(6)


def test_ivf_persisted_probe_recall(ray_session, tmp_path):
    x = _clustered()
    ds = _dataset(x)
    idx = str(tmp_path / "ivf")
    c = ivf_build_index(ds, idx, n_list=8)
    assert c.shape == (8, 16)
    # partition directories exist — the probe reads a strict subset
    import os
    lists = sorted(os.listdir(str(tmp_path / "ivf" / "lists")))
    assert len(lists) == 8 and lists[0].startswith("list_id=")

    q = x[123]
    got = ivf_query_index(idx, q, k=10, n_probe=2)
    want = knn_bruteforce(_dataset(x), q, k=10)
    got_ids = set(got.column("vec_id").to_pylist())
    want_ids = set(want.column("vec_id").to_pylist())
    # clustered data + 2-probe: recall must be high, query itself found
    assert 123 in got_ids
    assert len(got_ids & want_ids) >= 8


def test_ivf_probe_reads_subset(ray_session, tmp_path):
    x = _clustered(n=600, seed=11)
    idx = str(tmp_path / "ivf2")
    ivf_build_index(_dataset(x), idx, n_list=8)
    got = ivf_query_index(idx, x[5], k=5, n_probe=1)
    assert got.num_rows == 5


def test_ivf_append_makes_new_vectors_findable(ray_session, tmp_path):
    """Vectors appended to a persisted IVF index (assigned with the
    frozen build-time centroids) must be returned by later probes."""
    from lingua_ray.stages.ann import ivf_append_index

    x = _clustered()
    idx = str(tmp_path / "ivf")
    ivf_build_index(_dataset(x), idx, n_list=8)
    # the appended vector sits exactly on a probe point
    probe = x[42]
    extra = probe + 1e-4
    import ray.data
    inc = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([999_999], pa.int64()),
        "embedding": pa.array([list(extra)]),
    }))
    ivf_append_index(inc, idx)
    got = ivf_query_index(idx, probe, k=3, n_probe=2)
    ids = got.column("vec_id").to_pylist()
    assert 999_999 in ids


def test_ivf_repeated_appends_never_starve_topk(ray_session, tmp_path):
    """4x re-appending the same near-query vectors (blessed crash-retry
    behavior) must not crowd unique ids out of the top-k: the query
    over-fetch doubles until k UNIQUE ids are returned."""
    from lingua_ray.stages.ann import ivf_append_index

    x = _clustered(n=300, n_clusters=2)
    idx = str(tmp_path / "ivf-dups")
    ivf_build_index(_dataset(x), idx, n_list=2)
    probe = x[7]
    import ray.data
    inc = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(500, 508, dtype=np.int64)),
        "embedding": pa.array([list(probe + 1e-5 * (i + 1))
                               for i in range(8)]),
    }))
    for _ in range(4):          # >= 3 copies of each appended vector
        ivf_append_index(inc, idx)
    got = ivf_query_index(idx, probe, k=10, n_probe=2)
    ids = got.column("vec_id").to_pylist()
    assert len(ids) == 10
    assert len(set(ids)) == 10, "duplicate ids crowded out unique ones"
    assert set(range(500, 508)) <= set(ids)
