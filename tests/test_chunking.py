"""Document chunking: coverage/overlap invariants, unicode codepoint
semantics, short/empty docs, and a scalar oracle."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lingua_ray.stages.chunking import (chunk_batch, chunk_documents,
                                        n_chunks_for)


def _scalar_chunks(text, chunk, stride):
    n = max(len(text) - chunk, 0)
    n_chunks = 1 + -(-n // stride)
    return [text[i * stride: i * stride + chunk] for i in range(n_chunks)]


@given(st.text(max_size=200), st.integers(1, 50), st.integers(1, 50))
@settings(max_examples=200, deadline=None)
def test_chunk_batch_matches_scalar(text, chunk, stride):
    if stride > chunk:
        chunk, stride = stride, chunk
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array([text])})
    out = chunk_batch(t, chunk_chars=chunk, stride=stride)
    got = out.column("chunk_text").to_pylist()
    assert got == _scalar_chunks(text, chunk, stride)
    assert out.column("chunk_idx").to_pylist() == list(range(len(got)))


def test_coverage_and_overlap():
    text = "abcdefghijklmnopqrstuvwxyz" * 40  # 1040 chars
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([text])})
    out = chunk_batch(t, chunk_chars=500, stride=400)
    chunks = out.column("chunk_text").to_pylist()
    # reassembling with the overlap dropped reproduces the document
    rebuilt = chunks[0] + "".join(c[100:] for c in chunks[1:])
    assert rebuilt == text
    for a, b in zip(chunks, chunks[1:]):
        assert a[400:] == b[:len(a) - 400]


def test_unicode_codepoint_slicing():
    text = "日本語テキスト" * 100  # 700 codepoints, 3-byte units
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([text])})
    out = chunk_batch(t, chunk_chars=500, stride=400)
    chunks = out.column("chunk_text").to_pylist()
    assert chunks == [text[:500], text[400:700]]


def test_short_null_and_empty_docs():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["hi", "", None])})
    out = chunk_batch(t, chunk_chars=500, stride=400)
    assert out.column("doc_id").to_pylist() == [1, 2, 3]
    assert out.column("chunk_text").to_pylist() == ["hi", "", ""]


def test_bad_stride_raises():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["x"])})
    with pytest.raises(ValueError):
        chunk_batch(t, chunk_chars=10, stride=11)
    with pytest.raises(ValueError):
        chunk_batch(t, chunk_chars=10, stride=0)


def test_chunk_documents_dataset(ray_session):
    import ray.data
    rng = np.random.default_rng(2)
    texts = ["x" * int(n) for n in rng.integers(0, 2000, 300)]
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(texts)})
    out = chunk_documents(ray.data.from_arrow(t).repartition(5),
                          chunk_chars=500, stride=400).take_all()
    want = sum(int(x) for x in
               n_chunks_for(np.array([len(s) for s in texts]), 500, 400))
    assert len(out) == want
    # per-doc reassembly
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"]))
    for did, chunks in by_doc.items():
        chunks.sort()
        rebuilt = chunks[0][1] + "".join(c[100:] for _, c in chunks[1:])
        assert rebuilt == texts[did]
