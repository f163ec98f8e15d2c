"""Bigram PMI: combiner vs scalar oracle (doc boundaries, empties),
end-to-end PMI values vs a pure-python reference, partitioning
independence."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from lingua_ray.functions.collocations import (bigram_count_local,
                                               pmi_bigrams)


def _scalar_bigrams(texts):
    c = Counter()
    for t in texts:
        ws = (t or "").split(" ")
        c.update(zip(ws, ws[1:]))
    return c


def _scalar_pmi(texts, min_count):
    bg = _scalar_bigrams(texts)
    uni = Counter(w for t in texts for w in (t or "").split(" "))
    n1, n2 = sum(uni.values()), sum(bg.values())
    out = {}
    for (a, b), n in bg.items():
        if n >= min_count:
            out[(a, b)] = (n, round(math.log(
                (n / n2) / ((uni[a] / n1) * (uni[b] / n1))), 6))
    return out


def test_bigram_combiner_respects_doc_boundaries():
    texts = ["a b c", "c a", "", None, "x"]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = {(r["w1"], r["w2"]): r["n"]
           for r in bigram_count_local(t).to_pylist()}
    # None→"" and "" contribute no pairs; no ("c","c") across docs
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1}


def test_bigram_combiner_empty_tokens():
    t = pa.table({"text": ["a  b"]})  # double space → empty middle token
    got = {(r["w1"], r["w2"]): r["n"]
           for r in bigram_count_local(t).to_pylist()}
    assert got == {("a", ""): 1, ("", "b"): 1}


def _corpus(n=600, seed=4):
    rng = np.random.default_rng(seed)
    vocab = ["the", "quick", "brown", "fox", "jumps", "over", "dog"]
    return [" ".join(rng.choice(vocab, rng.integers(2, 20)))
            for _ in range(n)]


def test_pmi_matches_scalar(ray_session):
    import ray.data
    texts = _corpus()
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts)})).repartition(6)
    got = {(r["w1"], r["w2"]): (r["n2"], r["pmi"])
           for r in pmi_bigrams(ds, min_count=5).take_all()}
    want = _scalar_pmi(texts, 5)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) <= 1e-6, k


def test_pmi_partitioning_independent(ray_session):
    import ray.data
    texts = _corpus(n=200, seed=8)
    t = pa.table({"text": pa.array(texts)})
    a = sorted(map(tuple, (r.values() for r in pmi_bigrams(
        ray.data.from_arrow(t).repartition(1), min_count=3).take_all())))
    b = sorted(map(tuple, (r.values() for r in pmi_bigrams(
        ray.data.from_arrow(t).repartition(11), min_count=3).take_all())))
    assert a == b


def test_pmi_empty_corpus(ray_session):
    import ray.data
    ds = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    assert pmi_bigrams(ds).take_all() == []
