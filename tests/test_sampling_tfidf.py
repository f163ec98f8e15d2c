"""Stratified sampling (stages/sampling.py) + TF-IDF (stages/tfidf.py)."""

import hashlib
import math
from collections import Counter

import pyarrow as pa


def _docs():
    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "lang": ["en", "de", "fr"][i % 3],
                     "text": f"word{i % 7} word{i % 5} common tail"})
    return rows


def _naive_sample(rows, k):
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    out = {}
    for lang, ids in by_lang.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(
            str(i).encode()).hexdigest(), i))[:k]
        out[lang] = ranked
    return out


def test_stratified_sample_consistent(ray_session):
    import ray.data
    from lingua_ray.stages.sampling import stratified_sample
    rows = _docs()
    expect = _naive_sample(rows, 5)
    for parts in (1, 4):  # selection independent of partitioning
        ds = ray.data.from_items(rows).repartition(parts)
        out = stratified_sample(ds, key_col="lang", k=5).take_all()
        got = {}
        for r in sorted(out, key=lambda r: (r["lang"], r["rn"])):
            got.setdefault(r["lang"], []).append(r["doc_id"])
        assert got == expect, f"parts={parts}"
        assert all(r["rn"] >= 1 for r in out)


def test_stratified_sample_small_stratum(ray_session):
    import ray.data
    from lingua_ray.stages.sampling import stratified_sample
    rows = [{"doc_id": 1, "lang": "xx", "text": "t"}]
    out = stratified_sample(ray.data.from_items(rows),
                            key_col="lang", k=10).take_all()
    assert len(out) == 1 and out[0]["rn"] == 1


def test_tfidf_matches_naive(ray_session):
    import ray.data
    from lingua_ray.stages.tfidf import tfidf_scores
    rows = _docs()
    ds = ray.data.from_items(rows).repartition(3)
    out = tfidf_scores(ds, concurrency=2).take_all()
    n = len(rows)
    df = Counter()
    for r in rows:
        for w in set(r["text"].split(" ")):
            df[w] += 1
    by_id = {r["doc_id"]: r["tfidf"] for r in out}
    for r in rows:
        expect = sum(math.log(n / df[w]) for w in r["text"].split(" "))
        assert abs(by_id[r["doc_id"]] - round(expect, 6)) < 1e-9


def test_tfidf_empty_and_null_text(ray_session):
    import ray.data
    from lingua_ray.stages.tfidf import tfidf_scores
    rows = [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": None},
            {"doc_id": 2, "text": "a a b"}]
    out = tfidf_scores(ray.data.from_items(rows), concurrency=2).take_all()
    by_id = {r["doc_id"]: r["tfidf"] for r in out}
    # "" and None both tokenize to [""] (df=2 of 3 docs)
    assert by_id[0] == by_id[1] == round(math.log(3 / 2), 6)
    assert by_id[2] > 0


def test_hash_sample_deterministic_and_nested(ray_session):
    import ray.data
    from lingua_ray.stages.sampling import hash_sample
    rows = [{"doc_id": i} for i in range(2000)]
    ids = {}
    for rate in (0.25, 0.5, 1.0):
        for parts in (1, 5):
            ds = ray.data.from_items(rows).repartition(parts)
            got = sorted(r["doc_id"]
                         for r in hash_sample(ds, rate).take_all())
            ids.setdefault(rate, got)
            assert got == ids[rate], f"rate={rate} parts={parts}"
    assert ids[1.0] == [r["doc_id"] for r in rows]
    # nested property: lower rates select subsets of higher rates
    assert set(ids[0.25]) <= set(ids[0.5])
    # rates roughly honored (md5 is uniform; 2000 trials, ±6%)
    assert abs(len(ids[0.5]) / 2000 - 0.5) < 0.06
    assert abs(len(ids[0.25]) / 2000 - 0.25) < 0.06


def test_mix_corpora_labels_and_rates(ray_session):
    import ray.data
    from lingua_ray.stages.sampling import hash_sample, mix_corpora
    a = ray.data.from_items([{"doc_id": i} for i in range(500)])
    b = ray.data.from_items([{"doc_id": i} for i in range(500, 1000)])
    out = mix_corpora([("a", a, 1.0), ("b", b, 0.5)]).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert by_src["a"] == set(range(500))
    expect_b = {r["doc_id"] for r in hash_sample(b, 0.5).take_all()}
    assert by_src["b"] == expect_b


def test_split_assign_deterministic_and_sized(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from lingua_ray.stages.sampling import split_assign
    t = pa.table({"doc_id": pa.array(np.arange(5000, dtype=np.int64))})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in
         split_assign(ray.data.from_arrow(t).repartition(3),
                      fr).take_all()}
    b = {r["doc_id"]: r["split"] for r in
         split_assign(ray.data.from_arrow(t).repartition(11),
                      fr).take_all()}
    assert a == b  # partitioning-independent
    from collections import Counter
    c = Counter(a.values())
    assert abs(c["train"] / 5000 - 0.8) < 0.03
    assert abs(c["val"] / 5000 - 0.1) < 0.02
    assert abs(c["test"] / 5000 - 0.1) < 0.02


def _es_brute(rows, k):
    """Brute-force Efraimidis–Spirakis selection: global k smallest keys."""
    keyed = []
    for r in rows:
        if r["w"] <= 0:
            continue
        v = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:13], 16)
        keyed.append((-math.log((v + 1) / 2.0 ** 52) / r["w"], r["doc_id"]))
    return [i for _, i in sorted(keyed)[:k]]


def test_weighted_sample_pure_parity():
    """Combiner + finalize (no Ray) equals the brute-force selection,
    on any batch split, with zero/negative weights excluded."""
    from lingua_ray.stages.sampling import weighted_sample  # noqa: F401
    from lingua_ray.stages import sampling as S
    rows = [{"doc_id": i, "w": float((i * 7) % 11 - 1)} for i in range(200)]
    expect = _es_brute(rows, 25)
    t = pa.table({"doc_id": pa.array([r["doc_id"] for r in rows],
                                     pa.int64()),
                  "w": pa.array([r["w"] for r in rows], pa.float64())})
    for cut in (1, 37, 100):
        parts = [t.slice(s, cut) for s in range(0, t.num_rows, cut)]
        partials = []
        for p in parts:
            w = p.column("w").to_numpy(zero_copy_only=False)
            q = p.filter(pa.array(w > 0))
            keys = S._es_keys(q.column("doc_id").to_pylist(),
                              q.column("w").to_pylist())
            q = q.append_column("_key", pa.array(keys, pa.float64()))
            partials.append(S._smallest_k(q, "doc_id", 25))
        merged = S._smallest_k(pa.concat_tables(partials), "doc_id", 25)
        got = merged.column("doc_id").to_pylist()
        assert got == expect, f"cut={cut}"


def test_weighted_sample_ray(ray_session):
    import ray.data
    from lingua_ray.stages.sampling import weighted_sample
    rows = [{"doc_id": i, "w": float(i % 9)} for i in range(300)]
    expect = _es_brute(rows, 30)
    for parts in (1, 5):
        ds = ray.data.from_items(rows).repartition(parts)
        out = weighted_sample(ds, k=30, weight_col="w").take_all()
        out.sort(key=lambda r: r["rn"])
        assert [r["doc_id"] for r in out] == expect, f"parts={parts}"
        assert [r["rn"] for r in out] == list(range(1, 31))
        assert all(r["w"] > 0 for r in out)
