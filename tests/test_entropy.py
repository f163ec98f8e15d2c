"""entropy_batch vs a scalar oracle (known values, ties, empty/null)."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from lingua_ray.stages.quality import entropy_batch


def _scalar(text):
    c = Counter((text or "").split(" "))
    tot = sum(c.values())
    ent = -sum((n / tot) * math.log(n / tot) for n in c.values())
    hapax = sum(1 for n in c.values() if n == 1)
    return round(ent, 6), hapax


def test_known_values():
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["a a a a", "a b c d", "", None])})
    out = entropy_batch(t)
    ent = out.column("entropy").to_pylist()
    hap = out.column("n_hapax").to_pylist()
    assert ent[0] == 0.0 and hap[0] == 0          # one word 4×
    assert abs(ent[1] - round(math.log(4), 6)) <= 1e-6 and hap[1] == 4
    # "" and null → a single empty token each: entropy 0, hapax 1
    assert ent[2] == 0.0 and hap[2] == 1
    assert ent[3] == 0.0 and hap[3] == 1


def test_fuzzed_matches_scalar():
    rng = np.random.default_rng(61)
    vocab = ["w%d" % i for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 60)))
             for _ in range(300)]
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(texts)})
    out = entropy_batch(t)
    for i, text in enumerate(texts):
        ent, hap = _scalar(text)
        assert abs(out.column("entropy")[i].as_py() - ent) <= 1e-6
        assert out.column("n_hapax")[i].as_py() == hap
