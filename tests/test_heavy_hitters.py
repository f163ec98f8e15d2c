"""Misra-Gries heavy hitters: truncation bound, end-to-end exactness vs
the exact top-k path, planted-skew detection, and the k-too-small guard."""

import numpy as np
import pyarrow as pa
import pytest

from lingua_ray.functions.sketches import (MG_TOTAL_KEY, heavy_hitters,
                                           mg_summary_batch, mg_truncate)
from lingua_ray.functions.textstats import word_counts_topk


def test_mg_truncate_bound():
    # after truncation every kept count is within total/(k+1) of exact,
    # and any item with exact > total/(k+1) survives
    rng = np.random.default_rng(3)
    counts = rng.zipf(1.5, 2000).astype(np.int64)
    words = pa.array([f"w{i}" for i in range(len(counts))])
    k = 64
    kept_w, kept_c = mg_truncate(words, counts, k)
    total = int(counts.sum())
    kept = dict(zip(kept_w.to_pylist(), kept_c))
    assert len(kept) <= k
    for i, c in enumerate(counts):
        got = kept.get(f"w{i}", 0)
        assert got <= c
        assert got >= c - total / (k + 1)


def test_mg_summary_sentinel_carries_block_total():
    t = pa.table({"text": ["a b c", "a a", None, ""]})
    out = mg_summary_batch(t, k=100)
    d = dict(zip(out.column("word").to_pylist(),
                 out.column("n").to_pylist()))
    # "a b c"=3 words, "a a"=2, null→""=1 empty token, ""=1 empty token
    assert d[MG_TOTAL_KEY] == 7
    assert d["a"] == 3


def _skewed_docs(n=4000, seed=11):
    # zipfian token draw, like real text: the top ranks are genuinely
    # heavy so the MG certificate holds at moderate k
    rng = np.random.default_rng(seed)
    vocab = np.array([f"tok{i:04d}" for i in range(3000)])
    texts = []
    for i in range(n):
        ranks = np.minimum(rng.zipf(1.3, 12) - 1, len(vocab) - 1)
        words = list(vocab[ranks])
        if i % 3 == 0:
            words += ["the", "the", "of"]
        texts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(texts)})


def test_heavy_hitters_equals_exact_topk(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_skewed_docs()).repartition(8)
    got = heavy_hitters(ds, m=20, k=2048)
    want = word_counts_topk(ray.data.from_arrow(_skewed_docs()), k=20)
    assert got.column("word").to_pylist() == want.column("word").to_pylist()
    assert got.column("n").to_pylist() == want.column("n").to_pylist()


def test_heavy_hitters_planted(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_skewed_docs()).repartition(8)
    top = heavy_hitters(ds, m=10, k=2048)
    words = top.column("word").to_pylist()
    # planted boosts land in the top-10 alongside the zipf head
    assert "the" in words and "of" in words


def test_heavy_hitters_k_too_small_raises(ray_session):
    import ray.data
    # 4000 distinct words once each: nothing clears the N/(k+1) slack
    flat = pa.table({"text": [f"u{i}" for i in range(4000)]})
    ds = ray.data.from_arrow(flat).repartition(4)
    with pytest.raises(ValueError, match="increase k"):
        heavy_hitters(ds, m=5, k=8)


def test_heavy_hitters_empty_corpus(ray_session):
    import ray.data
    ds = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = heavy_hitters(ds, m=5, k=64)
    assert out.num_rows == 0
