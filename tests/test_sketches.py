"""HyperLogLog distinct counting: accuracy vs exact, merge associativity,
partitioning independence."""

import numpy as np
import pyarrow as pa


def test_hll_accuracy_synthetic():
    from lingua_ray.functions.sketches import (hll_estimate,
                                               hll_registers_for_words)
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(20000)]
    texts = [" ".join(rng.choice(vocab, size=50)) for _ in range(2000)]
    batch = pa.table({"text": pa.array(texts)})
    regs = np.frombuffer(
        hll_registers_for_words(batch).column("registers")[0].as_py(),
        dtype=np.uint8)
    exact = len({w for t in texts for w in t.split(" ")})
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.03


def test_hll_merge_equals_single_pass():
    from lingua_ray.functions.sketches import (hll_merge,
                                               hll_registers_for_words)
    texts = [f"alpha beta gamma w{i}" for i in range(500)]
    whole = pa.table({"text": pa.array(texts)})
    blob_whole = hll_registers_for_words(whole).column("registers")[0].as_py()
    parts = [pa.table({"text": pa.array(texts[i::3])}) for i in range(3)]
    blobs = [hll_registers_for_words(t).column("registers")[0].as_py()
             for t in parts]
    merged = hll_merge(blobs)
    assert merged.tobytes() == blob_whole


def test_hll_empty_and_null():
    from lingua_ray.functions.sketches import (hll_estimate,
                                               hll_registers_for_words)
    batch = pa.table({"text": pa.array([], pa.string())})
    regs = np.frombuffer(
        hll_registers_for_words(batch).column("registers")[0].as_py(),
        dtype=np.uint8)
    assert hll_estimate(regs) < 1e-9 or regs.max() == 0


def test_distinct_count_hll_ray(ray_session):
    import duckdb
    import ray.data
    from lingua_ray.functions.sketches import distinct_count_hll
    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["text"]).repartition(4)
    est = distinct_count_hll(ds)
    exact = duckdb.sql(
        f"SELECT count(DISTINCT w) FROM (SELECT unnest(string_split(text,"
        f" ' ')) AS w FROM read_parquet('{sf}/documents.parquet'))"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05
