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
