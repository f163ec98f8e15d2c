"""JSONL/CSV sink+source round-trips preserve values and types enough
to hash-match the original (unicode text included)."""

import numpy as np
import pyarrow as pa

from lingua_ray.sources.interchange import (read_csv, read_jsonl,
                                            write_csv, write_jsonl)


def _table(n=300):
    rng = np.random.default_rng(3)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"日本語 {i} détails" for i in range(n)]),
        "n": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
    })


def test_jsonl_roundtrip(ray_session, tmp_path):
    import ray.data
    t = _table()
    write_jsonl(ray.data.from_arrow(t).repartition(4),
                str(tmp_path / "jl"))
    back = read_jsonl(str(tmp_path / "jl"),
                      columns=["doc_id", "text", "n"]).take_all()
    got = sorted((r["doc_id"], r["text"], r["n"]) for r in back)
    want = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist(),
                      t.column("n").to_pylist()))
    assert got == want


def test_dedup_normalized_collapses_variants(ray_session):
    """Case/whitespace variants of the same text keep only the min id
    (exercises the query kernel; the sf corpus has no natural variants)."""
    import importlib.util
    import ray.data
    spec = importlib.util.spec_from_file_location(
        "entry_for_test", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import pyarrow.parquet as pq
    import tempfile, os
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["Hello  World", "hello world", " HELLO WORLD ",
                          "different", None]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = sorted(r["doc_id"] for r in
                     m.queries()["dedup_normalized"](d).take_all())
    assert got == [1, 4, 5]


def test_csv_roundtrip(ray_session, tmp_path):
    import ray.data
    t = _table()
    write_csv(ray.data.from_arrow(t).repartition(4), str(tmp_path / "cs"))
    back = read_csv(str(tmp_path / "cs")).take_all()
    got = sorted((r["doc_id"], r["text"], r["n"]) for r in back)
    want = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist(),
                      t.column("n").to_pylist()))
    assert got == want
