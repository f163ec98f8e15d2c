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


@pytest.fixture()
def minhash_index(ray_session, tmp_path):
    from lingua_ray.stages.dedup_index import build_minhash_index

    ray = ray_session
    rng = np.random.RandomState(11)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur",
             "adipiscing", "elit", "sed", "do", "eiusmod", "tempor"]
    base_texts = [" ".join(rng.choice(words, 30)) for _ in range(120)]
    base = ray.data.from_arrow(_table(range(120), base_texts))
    idx_dir = str(tmp_path / "mh-index")
    build_minhash_index(base, idx_dir, num_perm=64, num_bands=16,
                        n_buckets=32)
    return ray, base_texts, idx_dir


def test_neardup_probe_finds_planted_edits(minhash_index):
    """Probe docs that are one-word edits of indexed docs must surface as
    (probe, base) pairs with high estimated Jaccard; fresh docs must
    not match anything."""
    from lingua_ray.stages.dedup_index import neardup_against_index

    ray, base_texts, idx_dir = minhash_index
    edited = [t.replace(t.split()[0], "EDITED", 1) for t in base_texts[:5]]
    fresh = [f"totally new probe content number {i} xyzzy" for i in range(5)]
    probe = ray.data.from_arrow(_table(range(500, 510), edited + fresh))
    out = neardup_against_index(probe, idx_dir, threshold=0.5,
                                num_perm=64, num_bands=16,
                                n_buckets=32).to_pandas()
    got = {(r.doc_id, r.dup_of) for r in out.itertuples()}
    for i in range(5):
        assert (500 + i, i) in got, (i, sorted(got))
    assert all(d < 505 for d, _ in got), "fresh probes must not match"
    assert (out["est_jaccard"] >= 0.5).all()


def test_neardup_probe_empty_and_no_match_paths(minhash_index):
    from lingua_ray.stages.dedup_index import neardup_against_index

    ray, _, idx_dir = minhash_index
    none = ray.data.from_arrow(_table([], []))
    assert neardup_against_index(none, idx_dir, num_perm=64,
                                 num_bands=16, n_buckets=32).count() == 0
    unrelated = ray.data.from_arrow(_table(
        [900], ["qwerty uiop asdf ghjkl zxcv bnm unrelated probe"]))
    out = neardup_against_index(unrelated, idx_dir, threshold=0.5,
                                num_perm=64, num_bands=16,
                                n_buckets=32)
    assert out.count() == 0


def test_minhash_append_then_probe_finds_new_history(minhash_index):
    """Appending an increment to the MinHash index makes later probes
    match near-copies of the APPENDED docs too."""
    from lingua_ray.stages.dedup_index import (append_to_minhash_index,
                                               neardup_against_index)

    ray, _, idx_dir = minhash_index
    inc = ["purple monkey dishwasher random increment doc " * 3 + str(i)
           for i in range(3)]
    append_to_minhash_index(
        ray.data.from_arrow(_table(range(600, 603), inc)),
        idx_dir, num_perm=64, num_bands=16, n_buckets=32)
    probe_text = inc[1].replace("purple", "EDITED", 1)
    out = neardup_against_index(
        ray.data.from_arrow(_table([700], [probe_text])),
        idx_dir, threshold=0.5, num_perm=64, num_bands=16,
        n_buckets=32).to_pandas()
    assert 601 in set(out["dup_of"])


def test_mismatched_hyperparameters_refused(corpus, minhash_index):
    """Probing or appending with different hyperparameters than the
    build must raise, not silently miss duplicates."""
    from lingua_ray.stages.dedup_index import (append_to_index,
                                               append_to_minhash_index,
                                               dedup_against_index,
                                               neardup_against_index)

    ray, _, idx_dir = corpus
    probe = ray.data.from_arrow(_table([1], ["x"]))
    with pytest.raises(ValueError, match="hyperparameters"):
        dedup_against_index(probe, idx_dir, n_buckets=128)
    with pytest.raises(ValueError, match="hyperparameters"):
        append_to_index(probe, idx_dir, n_buckets=32)
    _, _, mh_dir = minhash_index
    with pytest.raises(ValueError, match="hyperparameters"):
        neardup_against_index(probe, mh_dir, num_perm=64, num_bands=8,
                              n_buckets=32)
    with pytest.raises(ValueError, match="hyperparameters"):
        append_to_minhash_index(probe, mh_dir, num_perm=128,
                                num_bands=16, n_buckets=32)


def test_interrupted_build_leaves_rejectable_index(ray_session, tmp_path,
                                                   monkeypatch):
    """The meta file is the build's commit marker: if the partitioned
    write crashes mid-build, no meta exists and every probe/append
    refuses the directory instead of silently missing duplicates."""
    import lingua_ray.stages.dedup_index as di

    ray = ray_session
    base = ray.data.from_arrow(_table(range(10),
                                      [f"doc {i}" for i in range(10)]))
    idx_dir = str(tmp_path / "crashed-fp")

    def boom(*a, **k):
        raise RuntimeError("simulated mid-build crash")

    monkeypatch.setattr(di, "_append_fps", boom)
    with pytest.raises(RuntimeError):
        build_fingerprint_index(base, idx_dir, n_buckets=16)
    monkeypatch.undo()
    with pytest.raises(FileNotFoundError):
        dedup_against_index(base, idx_dir, n_buckets=16)
    with pytest.raises(FileNotFoundError):
        append_to_index(base, idx_dir, n_buckets=16)
    # a completed build writes the marker and probes fine
    build_fingerprint_index(base, idx_dir, n_buckets=16)
    assert dedup_against_index(base, idx_dir, n_buckets=16).count() == 0


def test_interrupted_minhash_build_rejected(ray_session, tmp_path,
                                            monkeypatch):
    import lingua_ray.stages.dedup_index as di

    ray = ray_session
    base = ray.data.from_arrow(_table(range(10),
                                      [f"some text {i}" for i in range(10)]))
    idx_dir = str(tmp_path / "crashed-mh")

    def boom(*a, **k):
        raise RuntimeError("simulated mid-build crash")

    monkeypatch.setattr(di, "_band_bucket_batch", boom)
    with pytest.raises(Exception):
        di.build_minhash_index(base, idx_dir, n_buckets=8)
    monkeypatch.undo()
    with pytest.raises(FileNotFoundError):
        di.neardup_against_index(base, idx_dir, n_buckets=8)
