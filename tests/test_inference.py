"""Batched linear-probe inference (stages/inference.py)."""

import math

import numpy as np
import pyarrow as pa

from lingua_ray.stages.inference import (LinearScorer, golden_weights,
                                         score_embeddings)


def _table(n=40, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    emb = rng.randn(n, dim).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
    }), emb


def test_golden_weights_integer_exact():
    w = golden_weights(5)
    for i in range(5):
        assert w[i] == ((i * 2654435761) % 2 ** 32) / 2.0 ** 32 - 0.5
    assert (np.abs(w) <= 0.5).all()


def test_linear_scorer_matches_scalar_math():
    t, emb = _table()
    w = golden_weights(8)
    out = LinearScorer(w, bias=0.1)(t)
    got = out.column("score").to_pylist()
    for r in range(t.num_rows):
        z = sum(float(emb[r, j]) * w[j] for j in range(8)) + 0.1
        expect = round(1.0 / (1.0 + math.exp(-z)), 6)
        assert abs(got[r] - expect) < 1e-9


def test_score_embeddings_broadcast_and_filter(ray_session):
    import ray.data
    t, emb = _table(n=100)
    ds = ray.data.from_arrow(t).repartition(4)
    scored = score_embeddings(ds, dim=8, bias=0.1, concurrency=2).take_all()
    assert len(scored) == 100
    by_id = {r["vec_id"]: r["score"] for r in scored}
    direct = LinearScorer(golden_weights(8), bias=0.1)(t)
    for v, s in zip(direct.column("vec_id").to_pylist(),
                    direct.column("score").to_pylist()):
        assert by_id[v] == s  # actor-pool path == direct path
    kept = score_embeddings(ray.data.from_arrow(t), dim=8, bias=0.1,
                            keep_above=0.5).take_all()
    assert kept and all(r["score"] > 0.5 for r in kept)
    assert {r["vec_id"] for r in kept} == {
        v for v, s in by_id.items() if s > 0.5}


def test_fit_ridge_matches_closed_form(ray_session):
    """Distributed sufficient-statistics ridge == numpy closed form on
    the same data, independent of partitioning."""
    import numpy as np
    import pyarrow as pa

    from lingua_ray.stages.inference import fit_ridge

    ray = ray_session
    rng = np.random.RandomState(4)
    n, d = 300, 8
    X = rng.randn(n, d)
    w_true = rng.randn(d)
    y = (X @ w_true + 0.1 * rng.randn(n) > 0).astype(np.int32)
    t = pa.table({
        "embedding": pa.array([row.tolist() for row in X.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(y)})
    ds = ray.data.from_arrow(t).repartition(7)
    got = fit_ridge(ds, d, l2=0.5)
    Xd = X.astype(np.float32).astype(np.float64)
    want = np.linalg.solve(Xd.T @ Xd + 0.5 * np.eye(d),
                           Xd.T @ y.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_fit_pca_matches_closed_form(ray_session):
    """Distributed sufficient-statistics PCA == numpy eigh of the same
    covariance, independent of partitioning, with canonical signs."""
    import numpy as np
    import pyarrow as pa

    from lingua_ray.stages.inference import fit_pca, project_embeddings

    ray = ray_session
    rng = np.random.RandomState(11)
    n, d, k = 400, 6, 3
    # anisotropic data so eigenvalues separate cleanly
    X = rng.randn(n, d) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1]) \
        + rng.randn(d)
    t = pa.table({
        "vec_id": pa.array(np.arange(n)),
        "embedding": pa.array([r.tolist() for r in X.astype(np.float32)],
                              pa.list_(pa.float32()))})
    Xd = X.astype(np.float32).astype(np.float64)
    want_mean = Xd.mean(axis=0)
    cov = np.cov(Xd, rowvar=False)
    wv, vecs = np.linalg.eigh(cov)
    order = np.argsort(wv)[::-1][:k]
    want_vals = wv[order]
    want_comps = vecs[:, order].T
    flip = np.sign(want_comps[np.arange(k),
                              np.abs(want_comps).argmax(axis=1)])
    want_comps = want_comps * flip[:, None]

    for parts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        mean, vals, comps = fit_pca(ds, d, k)
        np.testing.assert_allclose(mean, want_mean, atol=1e-9)
        np.testing.assert_allclose(vals, want_vals, atol=1e-8)
        np.testing.assert_allclose(comps, want_comps, atol=1e-8)

    # projection: orthogonal components, decreasing variance, matches
    # the direct (X - mean) @ W^T
    ds = ray.data.from_arrow(t).repartition(5)
    rows = project_embeddings(ds, mean, comps).take_all()
    got = np.array([[r[f"p{c}"] for c in range(k)]
                    for r in sorted(rows, key=lambda r: r["vec_id"])])
    np.testing.assert_allclose(got, (Xd - mean) @ comps.T, atol=1e-9)
    v = got.var(axis=0, ddof=1)
    assert v[0] > v[1] > v[2]
    np.testing.assert_allclose(comps @ comps.T, np.eye(k), atol=1e-9)
