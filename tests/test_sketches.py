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


def test_distinct_count_hll_tree_fold_matches_flat(ray_session):
    """The distributed merge level (tree_fanin) is an exact rearrangement
    of the associative register max-fold: same estimate as the flat
    driver-side fold on any partitioning."""
    import ray.data
    from lingua_ray.functions.sketches import distinct_count_hll
    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["text"]).repartition(8)
    flat = distinct_count_hll(ds)
    tree = distinct_count_hll(ds, tree_fanin=3)
    assert tree == flat


def test_bloom_no_false_negatives_and_low_fp():
    import numpy as np
    from lingua_ray.functions.sketches import (bloom_block, bloom_contains,
                                               bloom_params)
    rng = np.random.default_rng(0)
    members = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
    m, k = bloom_params(len(members))
    bm = bloom_block(members, m, k)
    assert bloom_contains(members, bm, k).all()          # zero false negatives
    probes = rng.integers(0, 2**63, 50000, dtype=np.int64).astype(np.uint64)
    fresh = probes[~np.isin(probes, members)]
    assert bloom_contains(fresh, bm, k).mean() < 0.02    # FP ~0.8% design


def test_bloom_block_merge_commutes():
    import numpy as np
    from lingua_ray.functions.sketches import bloom_block, bloom_params
    a = np.arange(100, dtype=np.uint64)
    b = np.arange(100, 200, dtype=np.uint64)
    m, k = bloom_params(200)
    whole = bloom_block(np.concatenate([a, b]), m, k)
    merged = bloom_block(a, m, k) | bloom_block(b, m, k)
    assert (whole == merged).all()


def test_bloom_fold_tree_bounds_driver_rows(ray_session):
    """The distributed OR-merge level leaves at most tree_fanin bitmap
    rows for the driver (bytes bounded by bitmap-size × fan-in, never ×
    n_blocks) and is byte-identical to the flat fold — OR is
    associative, so any fold tree commutes."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from lingua_ray.functions.sketches import (bloom_block, bloom_fold,
                                               bloom_or_batch, bloom_params)
    rng = np.random.default_rng(7)
    fps = rng.integers(0, 2**63, 4000, dtype=np.int64).astype(np.uint64)
    m, k = bloom_params(len(fps))

    def per_block(batch: pa.Table) -> pa.Table:
        b = batch.column("fp").to_numpy().astype(np.uint64)
        return pa.table({"bitmap":
                         pa.array([bloom_block(b, m, k).tobytes()],
                                  pa.binary())})

    per_block_ds = (ray.data.from_arrow(pa.table({"fp": fps.astype(np.int64)}))
                    .repartition(40)
                    .map_batches(per_block, batch_format="pyarrow"))
    # the tree level is what bounds the driver: ≤ fanin rows survive it
    fanin = 4
    merged = per_block_ds.repartition(fanin).map_batches(
        bloom_or_batch, batch_format="pyarrow", batch_size=None)
    assert merged.count() <= fanin
    tree = bloom_fold(per_block_ds, m, tree_fanin=fanin)
    flat = bloom_fold(per_block_ds, m, tree_fanin=None)
    assert (tree == flat).all()
    assert (tree == bloom_block(fps, m, k)).all()


def test_bloom_or_batch_empty_block_is_typed():
    """repartition(fanin) can hand bloom_or_batch an empty block; it must
    return a binary-typed empty table, not a null-typed column."""
    import pyarrow as pa
    from lingua_ray.functions.sketches import bloom_or_batch
    out = bloom_or_batch(pa.table({"bitmap": pa.array([], pa.binary())}))
    assert out.num_rows == 0
    assert out.schema.field("bitmap").type == pa.binary()


def test_incremental_bloom_contains_exact_result(ray_session):
    """Bloom variant drops a SUPERSET of what the exact anti-join drops
    (no false negatives), and over-drops at most ~2% (false positives)."""
    import __ray_entry__ as E
    sf = "/root/testdata/sf0.001"
    exact = {r["doc_id"] for r in E.queries()["dedup_incremental"](sf).take_all()}
    bloom = {r["doc_id"] for r in
             E.queries()["dedup_incremental_bloom"](sf).take_all()}
    assert bloom <= exact                     # survivors only shrink via FPs
    assert len(exact - bloom) <= max(2, int(0.02 * len(exact)))


def test_floor_log2_exact_near_powers_of_two():
    """float64 log2 rounds 2^k - 1 up for large k; the integer path must
    not (rho would collapse to 0 and the register write would vanish)."""
    import numpy as np

    from lingua_ray.functions.sketches import _floor_log2_u64

    w = np.array([1, 2, 3, 2**49, 2**50 - 1, 2**50, 2**62 - 1,
                  2**63 - 1, 2**63, 2**64 - 1], dtype=np.uint64)
    got = _floor_log2_u64(w).tolist()
    want = [int(x).bit_length() - 1 for x in w.tolist()]
    assert got == want
