"""Persisted BM25 index lifecycle: build → pruned probe parity with the
in-pipeline pass, commit-marker refusal, hyperparameter refusal."""

import os

import pyarrow as pa
import pytest


@pytest.fixture()
def corpus_ds(ray_session):
    import ray.data
    rows = [{"doc_id": i,
             "text": " ".join(["alpha", "beta", "gamma", "delta"]
                              [j % 4] for j in range(i % 7 + 3))}
            for i in range(40)]
    return ray.data.from_items(rows)


def test_indexed_probe_matches_inline(ray_session, corpus_ds, tmp_path):
    from lingua_ray.stages.bm25 import (bm25_query_index, bm25_topk,
                                        build_bm25_index)

    idx = str(tmp_path / "idx")
    build_bm25_index(corpus_ds, idx)
    inline = bm25_topk(corpus_ds, ("alpha", "gamma"), k=10)
    probed = bm25_query_index(corpus_ds, idx, ("alpha", "gamma"), k=10)
    assert inline.to_pydict() == probed.to_pydict()


def test_missing_meta_refused(ray_session, corpus_ds, tmp_path):
    from lingua_ray.stages.bm25 import (_META_FILE, bm25_query_index,
                                        build_bm25_index)

    idx = str(tmp_path / "idx")
    build_bm25_index(corpus_ds, idx)
    os.remove(os.path.join(idx, _META_FILE))  # simulate interrupted build
    with pytest.raises(FileNotFoundError):
        bm25_query_index(corpus_ds, idx, ("alpha",))


def test_mismatched_buckets_refused(ray_session, corpus_ds, tmp_path):
    from lingua_ray.stages.bm25 import bm25_query_index, build_bm25_index

    idx = str(tmp_path / "idx")
    build_bm25_index(corpus_ds, idx, n_buckets=64)
    with pytest.raises(ValueError):
        bm25_query_index(corpus_ds, idx, ("alpha",), n_buckets=32)


def test_probe_reads_only_touched_buckets(ray_session, corpus_ds,
                                          tmp_path, monkeypatch):
    """Directory-pruning spy: the probe's parquet path list must only
    name the query terms' buckets (the probe reads the index directly
    via pyarrow with a pushed-down term filter — no Ray job)."""
    import pyarrow.parquet as pq_mod

    from lingua_ray.stages import bm25

    idx = str(tmp_path / "idx")
    bm25.build_bm25_index(corpus_ds, idx)
    seen = []
    orig = pq_mod.read_table

    def spy(paths, **kw):
        seen.append(list(paths) if isinstance(paths, list) else [paths])
        return orig(paths, **kw)

    monkeypatch.setattr(pq_mod, "read_table", spy)
    bm25.bm25_query_index(corpus_ds, idx, ("alpha",), k=5)
    import numpy as np
    th = bm25._term_hashes(("alpha",))
    want = {int(h) % 64 for h in th.view(np.uint64)}
    index_reads = [p for ps in seen for p in ps if "bucket=" in p]
    assert index_reads, "probe read no index partitions"
    got = {int(p.split("bucket=")[1].split("/")[0]) for p in index_reads}
    assert got == want
