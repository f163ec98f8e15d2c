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


def test_duplicate_query_terms_equal_distinct(ray_session, corpus_ds,
                                              tmp_path):
    """A duplicated query term must neither double its df in the stats
    groupby nor double its score contribution — entry points dedupe."""
    from lingua_ray.stages.bm25 import (bm25_query_index, bm25_topk,
                                        build_bm25_index)

    distinct = bm25_topk(corpus_ds, ("alpha", "gamma"), k=10)
    dup = bm25_topk(corpus_ds, ("alpha", "gamma", "alpha"), k=10)
    assert dup.to_pydict() == distinct.to_pydict()

    idx = str(tmp_path / "idx")
    build_bm25_index(corpus_ds, idx)
    probed = bm25_query_index(corpus_ds, idx,
                              ("alpha", "gamma", "alpha"), k=10)
    assert probed.to_pydict() == distinct.to_pydict()


def test_stats_local_vectorized_df_matches_scalar(ray_session):
    """The np.isin/lexsort df combiner equals the obvious per-term
    distinct-row count on a corpus with repeats inside documents."""
    import numpy as np
    from lingua_ray.stages.bm25 import _term_hashes, bm25_stats_local
    from lingua_ray.stages.tfidf import _doc_word_hashes

    batch = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["alpha alpha beta", "beta gamma", "", "alpha  beta"]})
    terms = ("alpha", "beta", "zeta")
    out = bm25_stats_local(batch, terms)
    th = _term_hashes(terms)
    wh, rows = _doc_word_hashes(batch, "text", "doc_id")
    wh = wh.view(np.int64)
    want = [len(np.unique(rows[wh == t])) for t in th]
    got = dict(zip(out.column("key").to_pylist(),
                   out.column("df").to_pylist()))
    assert [got[int(t)] for t in th] == want == [2, 3, 0]
