"""Dedup and similarity-search operator tests (single-process + Ray)."""

import numpy as np
import pyarrow as pa
import pytest

from lingua_ray.stages.ann import (BruteForceTopK, bucket_ids, hyperplanes,
                                   knn_bruteforce, neardup_pairs_group)
from lingua_ray.stages.dedup import (bucket_pairs_group, jaccard,
                                     lsh_band_batch, minhash_signature_batch,
                                     simhash_batch)


def _docs(texts):
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.large_string()),
    })


BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight")


def test_minhash_near_duplicates_bucket_together():
    texts = [
        BASE,
        BASE.replace("tonight", "today"),          # near-dup of 0
        "completely different text about database query engines and sorting",
        BASE,                                       # exact dup of 0
    ]
    t = minhash_signature_batch(_docs(texts))
    bands = lsh_band_batch(t)
    import pandas as pd
    df = bands.to_pandas()
    pairs = set()
    for (_, _), g in df.groupby(["band", "band_hash"]):
        ids = sorted(g["doc_id"])
        for i in ids[1:]:
            pairs.add((ids[0], i))
    assert (0, 3) in pairs            # exact dup always collides
    assert (0, 1) in pairs            # near-dup collides in some band
    assert not any(2 in p for p in pairs)


def test_minhash_deterministic():
    t1 = minhash_signature_batch(_docs([BASE]))
    t2 = minhash_signature_batch(_docs(["x", BASE]))
    assert t1.column("minhash")[0].as_py() == t2.column("minhash")[1].as_py()


def test_simhash_hamming_close_for_neardups():
    t = simhash_batch(_docs([BASE, BASE.replace("tonight", "today"),
                             "unrelated short junk text"]))
    h = np.array(t.column("simhash").to_pylist(), dtype=np.int64).view(np.uint64)
    d01 = bin(int(h[0] ^ h[1])).count("1")
    d02 = bin(int(h[0] ^ h[2])).count("1")
    assert d01 < d02
    assert d01 <= 12


def test_jaccard():
    assert jaccard(BASE, BASE) == 1.0
    assert jaccard(BASE, "zzzz qqqq") < 0.05
    assert 0.5 < jaccard(BASE, BASE.replace("tonight", "today")) < 1.0


def test_bucket_pairs_group():
    g = pa.table({"doc_id": pa.array([7, 3, 9], type=pa.int64())})
    out = bucket_pairs_group(g)
    assert out.column("doc_id").to_pylist() == [7, 9]
    assert out.column("dup_of").to_pylist() == [3, 3]


def test_brute_force_topk_local():
    rng = np.random.RandomState(0)
    emb = rng.standard_normal((50, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(50), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1)), 8),
    })
    scorer = BruteForceTopK(emb[17], k=5)
    out = scorer(t)
    # the query vector itself must be the top hit
    best = max(zip(out.column("cos").to_pylist(),
                   out.column("vec_id").to_pylist()))
    assert best[1] == 17
    assert best[0] == pytest.approx(1.0)


def test_knn_bruteforce_ray(ray_session):
    ray = ray_session
    rng = np.random.RandomState(1)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(200), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1)), 16),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    top = knn_bruteforce(ds, emb[42], k=7)
    ids = top.column("vec_id").to_pylist()
    assert ids[0] == 42
    # verify against numpy ground truth
    m = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    q = m[42]
    want = np.argsort(-(m @ q), kind="stable")[:7].tolist()
    assert set(ids) == set(want)


def test_neardup_pairs():
    rng = np.random.RandomState(2)
    base = rng.standard_normal(8).astype(np.float32)
    emb = np.stack([base, base + 0.001, rng.standard_normal(8)]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array([10, 20, 30], type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1)), 8),
    })
    out = neardup_pairs_group(t, threshold=0.99)
    assert out.column("vec_id").to_pylist() == [20]
    assert out.column("dup_of").to_pylist() == [10]


def test_hyperplane_buckets_deterministic():
    m = np.random.RandomState(3).standard_normal((20, 12))
    p = hyperplanes(12, 8)
    b1, b2 = bucket_ids(m, p), bucket_ids(m, hyperplanes(12, 8))
    assert (b1 == b2).all()
    assert b1.max() < 256


def test_multimodal_stub_stages(ray_session):
    ray = ray_session
    from lingua_ray.stages.multimodal import (AudioFeaturizer, ImageDecoder,
                                              make_fake_media_table)
    t = make_fake_media_table(64)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(ImageDecoder, batch_format="pyarrow", batch_size=16,
                         concurrency=2, num_cpus=1)
    out = out.map_batches(AudioFeaturizer, batch_format="pyarrow",
                          batch_size=16, concurrency=2, num_cpus=1)
    res = out.take_batch(100, batch_format="pyarrow")
    assert res.num_rows == 64
    for col in ("width", "height", "mean_luma", "duration_s", "rms"):
        assert col in res.schema.names
    # deterministic fake: same payload -> same features
    a = ImageDecoder()(t.slice(0, 4))
    b = ImageDecoder()(t.slice(0, 4))
    assert a.equals(b)
    with pytest.raises(NotImplementedError):
        ImageDecoder(real=True)
