"""KL(source ‖ corpus) vs a pure-python oracle; identical-distribution
sources give ~0, shifted sources give positive divergence."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from lingua_ray.functions.divergence import source_kl


def _scalar_kl(sources, texts):
    per = {}
    for s, t in zip(sources, texts):
        per.setdefault(s, Counter()).update((t or "").split(" "))
    glob = Counter()
    for c in per.values():
        glob.update(c)
    gtot = sum(glob.values())
    out = {}
    for s, c in per.items():
        tot = sum(c.values())
        kl = sum((n / tot) * math.log((n / tot) / (glob[w] / gtot))
                 for w, n in c.items())
        out[s] = round(kl, 6)
    return out


def test_source_kl_matches_scalar(ray_session):
    import ray.data
    rng = np.random.default_rng(33)
    vocab_a = ["alpha", "beta", "gamma", "delta"]
    vocab_b = ["alpha", "omega", "sigma"]
    sources, texts = [], []
    for i in range(900):
        shifted = i % 3 == 0
        v = vocab_b if shifted else vocab_a
        sources.append("shifted" if shifted else "base")
        texts.append(" ".join(rng.choice(v, 15)))
    t = pa.table({"source": pa.array(sources), "text": pa.array(texts)})
    got = {r["source"]: r["kl"] for r in
           source_kl(ray.data.from_arrow(t).repartition(6)).take_all()}
    want = _scalar_kl(sources, texts)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 2e-6, k
    assert got["shifted"] > 0.1  # genuinely divergent source


def test_single_source_is_zero(ray_session):
    import ray.data
    t = pa.table({"source": pa.array(["only"] * 50),
                  "text": pa.array(["a b c"] * 50)})
    out = source_kl(ray.data.from_arrow(t)).take_all()
    assert len(out) == 1 and abs(out[0]["kl"]) < 1e-9
