"""Persistent fingerprint index: build / probe / append lifecycle, exact
NOT-EXISTS semantics vs a brute-force set oracle, and real directory
pruning (untouched buckets are never listed)."""

import numpy as np
import pyarrow as pa
import pytest

from lingua_ray.stages.dedup_index import (append_to_index,
                                           build_fingerprint_index,
                                           dedup_against_index)


def _table(ids, texts):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture()
def corpus(ray_session, tmp_path):
    ray = ray_session
    rng = np.random.RandomState(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    base_texts = [" ".join(rng.choice(words, 5)) + f" #{i}"
                  for i in range(200)]
    base = ray.data.from_arrow(_table(range(200), base_texts))
    idx_dir = str(tmp_path / "fp-index")
    build_fingerprint_index(base, idx_dir, n_buckets=16)
    return ray, base_texts, idx_dir


def test_dedup_against_index_not_exists_semantics(corpus):
    ray, base_texts, idx_dir = corpus
    # new batch: 30 dups of base texts + 20 fresh
    new_texts = base_texts[:30] + [f"fresh document {i}" for i in range(20)]
    new = ray.data.from_arrow(_table(range(1000, 1050), new_texts))
    out = dedup_against_index(new, idx_dir, n_buckets=16).to_pandas()
    want = {1000 + i for i, t in enumerate(new_texts)
            if t not in set(base_texts)}
    assert set(out["doc_id"]) == want
    assert sorted(out.columns) == ["doc_id", "text"]


def test_append_then_rededup_is_empty(corpus, ray_session):
    ray, base_texts, idx_dir = corpus
    fresh = [f"only in increment {i}" for i in range(25)]
    new = ray.data.from_arrow(_table(range(2000, 2025), fresh))
    survivors = dedup_against_index(new, idx_dir, n_buckets=16)
    assert survivors.count() == 25
    append_to_index(survivors, idx_dir, n_buckets=16)
    again = dedup_against_index(
        ray.data.from_arrow(_table(range(3000, 3025), fresh)),
        idx_dir, n_buckets=16)
    assert again.count() == 0
    # double-append of the same docs must stay harmless (crash-retry)
    append_to_index(new, idx_dir, n_buckets=16)
    assert dedup_against_index(
        ray.data.from_arrow(_table(range(4000, 4025), fresh)),
        idx_dir, n_buckets=16).count() == 0


def test_probe_reads_only_touched_buckets(corpus, monkeypatch):
    ray, base_texts, idx_dir = corpus
    import ray.data as rd

    seen_paths = []
    orig = rd.read_parquet

    def spy(paths, *a, **k):
        seen_paths.append(paths)
        return orig(paths, *a, **k)

    monkeypatch.setattr(rd, "read_parquet", spy)
    one = ray.data.from_arrow(_table([9000], ["a single probe doc"]))
    dedup_against_index(one, idx_dir, n_buckets=16).count()
    read = [p for call in seen_paths for p in
            (call if isinstance(call, list) else [call])]
    buckets = {p.split("bucket=")[1].split("/")[0]
               for p in read if "bucket=" in p}
    assert len(buckets) == 1        # one doc -> one touched bucket
