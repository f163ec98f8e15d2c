"""Budget-bounded greedy selection vs the SQL-window scalar oracle,
including boundary-bucket tie-breaking and degenerate budgets."""

import numpy as np
import pyarrow as pa

from lingua_ray.functions.budget import select_under_budget


def _oracle(ids, scores, costs, budget):
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))
    out, cum = [], 0
    for i in order:
        cum += costs[i]
        if cum > budget:
            break
        out.append(ids[i])
    return sorted(out)


def _fixture(n=3000, seed=23):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    scores = rng.integers(0, 40, n)  # heavy ties → boundary bucket matters
    costs = rng.integers(1, 50, n)
    return ids, scores, costs


def _run(ids, scores, costs, budget, parts=7):
    import ray.data
    t = pa.table({"doc_id": pa.array(ids),
                  "score": pa.array(scores.astype(np.int64)),
                  "cost": pa.array(costs.astype(np.int64))})
    ds = ray.data.from_arrow(t).repartition(parts)
    out = select_under_budget(ds, "score", "cost", budget).take_all()
    return sorted(r["doc_id"] for r in out)


def test_matches_scalar_oracle(ray_session):
    ids, scores, costs = _fixture()
    budget = int(costs.sum()) // 3
    assert _run(ids, scores, costs, budget) == \
        _oracle(ids, scores, costs, budget)


def test_various_budgets(ray_session):
    ids, scores, costs = _fixture(n=500, seed=29)
    total = int(costs.sum())
    for budget in (0, 1, total // 10, total - 1, total, total + 100):
        assert _run(ids, scores, costs, budget) == \
            _oracle(ids, scores, costs, budget), budget


def test_partitioning_independent(ray_session):
    ids, scores, costs = _fixture(n=800, seed=31)
    budget = int(costs.sum()) // 2
    assert _run(ids, scores, costs, budget, parts=1) == \
        _run(ids, scores, costs, budget, parts=13)


def test_budget_string_ids(ray_session):
    """Non-int64 id columns must survive the boundary-bucket rebuild."""
    import pyarrow as pa
    import ray.data

    from lingua_ray.functions.budget import select_under_budget

    t = pa.table({"doc_id": ["d0", "d1", "d2", "d3"],
                  "score": [3, 3, 2, 2],
                  "cost": [4, 4, 4, 4]})
    out = select_under_budget(ray.data.from_arrow(t), "score", "cost",
                              budget=12, id_col="doc_id")
    got = sorted(r["doc_id"] for r in out.take_all())
    # full buckets: score 3 (cost 8); boundary score 2 admits d2 only
    assert got == ["d0", "d1", "d2"]
