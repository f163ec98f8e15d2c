"""Global row_number / ntile vs pandas oracle, with ties and skew."""

import numpy as np
import pandas as pd
import pyarrow as pa

from lingua_ray.functions.rank import _ntile_of_rank, global_row_number


def test_ntile_remainder_rule():
    rn = np.arange(1, 11)
    # 10 rows, 3 tiles: sizes 4, 3, 3
    assert list(_ntile_of_rank(rn, 10, 3)) == \
        [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    # fewer rows than tiles: tile = rank
    assert list(_ntile_of_rank(np.arange(1, 4), 3, 10)) == [1, 2, 3]


def test_global_row_number_matches_pandas(ray_session):
    import ray.data
    rng = np.random.default_rng(41)
    v = rng.integers(0, 30, 2000)  # heavy ties
    ids = rng.permutation(2000).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "n_chars": pa.array(v.astype(np.int64))})
    got = pd.DataFrame(global_row_number(
        ray.data.from_arrow(t).repartition(7), "n_chars", "doc_id",
        ntile=10).take_all()).sort_values("doc_id", ignore_index=True)
    df = t.to_pandas().sort_values(["n_chars", "doc_id"],
                                   ignore_index=True)
    df["rn"] = np.arange(1, len(df) + 1)
    df["tile"] = _ntile_of_rank(df["rn"].to_numpy(), len(df), 10)
    want = df.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "rn", "tile"]], want[["doc_id", "rn", "tile"]])


def test_partitioned_row_number_matches_duckdb(ray_session):
    """Skewed partitions + continuous values + duplicate (part, value)
    pairs straddling range boundaries, forced through MANY ranges."""
    import duckdb
    import ray.data

    from lingua_ray.functions.rank import partitioned_row_number

    rng = np.random.RandomState(7)
    n = 2000
    part = rng.choice(["en", "de", "fr", "megalang"], size=n,
                      p=[0.1, 0.1, 0.1, 0.7])
    value = rng.randint(0, 50, size=n).astype(np.int64)  # heavy ties
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"lang": pa.array(part.tolist()), "v": pa.array(value),
                  "doc_id": pa.array(ids)})

    got = partitioned_row_number(
        ray.data.from_arrow(t).repartition(13), "lang", "v", "doc_id",
        ntile=3, n_ranges=16, sample_per_block=8).to_pandas()
    got = got.sort_values(["lang", "v", "doc_id"],
                          ignore_index=True)[["lang", "v", "doc_id",
                                              "rn", "tile"]]

    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT lang, v, doc_id,
          CAST(row_number() OVER w AS BIGINT) AS rn,
          CAST(ntile(3) OVER w AS BIGINT) AS tile
        FROM t WINDOW w AS (PARTITION BY lang ORDER BY v, doc_id)
        ORDER BY lang, v, doc_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_partitioned_row_number_empty(ray_session):
    import ray.data

    from lingua_ray.functions.rank import partitioned_row_number

    t = pa.table({"lang": pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.int64()),
                  "doc_id": pa.array([], type=pa.int64())})
    out = partitioned_row_number(ray.data.from_arrow(t), "lang", "v",
                                 "doc_id", ntile=3)
    assert out.count() == 0


def test_ccnet_ppl_buckets_semantics(ray_session):
    """Real-perplexity terciles: every (lang) partition's buckets are
    contiguous rank ranges with the SQL ntile size rule, and head ppl
    <= tail ppl within each language."""
    import pandas as pd  # noqa: F401  (kept for symmetry with siblings)

    import __ray_entry__ as E

    out = E.queries()["ccnet_ppl_buckets"]("/root/testdata/sf0.001") \
        .to_pandas()
    assert len(out) == 500
    for lang, g in out.groupby("lang"):
        g = g.sort_values("rn")
        n = len(g)
        q, r = divmod(n, 3)
        sizes = g.groupby("bucket").size()
        if q > 0:
            expect = {"head": q + (1 if r >= 1 else 0),
                      "middle": q + (1 if r >= 2 else 0), "tail": q}
            assert {k: sizes.get(k, 0) for k in expect} == expect
        head = g[g.bucket == "head"]["ppl_u"]
        tail = g[g.bucket == "tail"]["ppl_u"]
        if len(head) and len(tail):
            assert head.max() <= tail.min()


def test_topk_reduce_string_ids(ray_session):
    """The shared k-safe reduction must handle non-int64 id columns
    (hash-salted tree level, schema derived from the input)."""
    import ray.data

    from lingua_ray.stages.util import topk_reduce

    rows = [{"name": f"doc{i:03d}", "score": float(i % 17)}
            for i in range(200)]
    t = topk_reduce(ray.data.from_items(rows).repartition(7),
                    "score", "name", k=5)
    assert t.column("score").to_pylist() == [16.0] * 5
    # ties broken by id ascending
    assert t.column("name").to_pylist() == [
        "doc016", "doc033", "doc050", "doc067", "doc084"]
