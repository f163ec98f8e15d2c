"""Paragraph-level exact dedup: kernels vs a scalar oracle, plus
end-to-end properties (first occurrence wins, short-paragraph exemption,
schema preservation, empty/degenerate inputs)."""

import numpy as np
import pyarrow as pa
import pytest


def _scalar_para_dedup(docs: list[tuple[int, str]], delim="\n",
                       min_chars=1) -> dict[int, str]:
    """Naive reference: global first occurrence by (doc_id, para_idx)."""
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        kept = []
        for para in (text or "").split(delim):
            if len(para) < min_chars:
                kept.append(para)
            elif para not in seen:
                seen.add(para)
                kept.append(para)
        out[doc_id] = delim.join(kept)
    return out


def _run(ray_session, docs, **kw):
    import ray.data
    from lingua_ray.stages.paradedup import paragraph_dedup
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
        "extra": pa.array([f"e{d}" for d, _ in docs]),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    rows = paragraph_dedup(ds, num_partitions=2, num_buckets=4,
                           **kw).take_all()
    return {r["doc_id"]: r for r in rows}


def test_matches_scalar_oracle(ray_session):
    rng = np.random.default_rng(7)
    paras = [f"para {i} content" for i in range(12)]
    docs = []
    for d in range(40):
        k = rng.integers(1, 6)
        docs.append((d, "\n".join(rng.choice(paras, size=k))))
    got = _run(ray_session, docs)
    want = _scalar_para_dedup(docs)
    assert {d: r["text"] for d, r in got.items()} == want
    # non-text columns pass through untouched
    assert got[5]["extra"] == "e5"


def test_first_occurrence_wins_across_docs(ray_session):
    docs = [(10, "dup\nuniq-a"), (3, "uniq-b\ndup"), (7, "dup")]
    got = _run(ray_session, docs)
    # doc 3 has the smallest doc_id -> its "dup" (para_idx 1) survives
    assert got[3]["text"] == "uniq-b\ndup"
    assert got[10]["text"] == "uniq-a"
    assert got[7]["text"] == ""


def test_short_paragraphs_exempt(ray_session):
    docs = [(0, "aa\nlong paragraph"), (1, "aa\nlong paragraph\naa")]
    got = _run(ray_session, docs, min_chars=5)
    # "aa" (< 5 chars) is never deduped; the long paragraph is
    assert got[0]["text"] == "aa\nlong paragraph"
    assert got[1]["text"] == "aa\naa"


def test_within_doc_duplicates_collapse(ray_session):
    docs = [(0, "x y z\nx y z\nother")]
    got = _run(ray_session, docs)
    assert got[0]["text"] == "x y z\nother"


def test_no_delimiter_degenerates_to_doc_dedup(ray_session):
    docs = [(0, "same body"), (1, "same body"), (2, "different")]
    got = _run(ray_session, docs)
    assert got[0]["text"] == "same body"
    assert got[1]["text"] == ""
    assert got[2]["text"] == "different"


def test_null_and_empty_text(ray_session):
    docs = [(0, ""), (1, "a real paragraph"), (2, "")]
    got = _run(ray_session, docs)
    # empty string -> one zero-length paragraph, exempt under min_chars=1
    assert got[0]["text"] == ""
    assert got[2]["text"] == ""
    assert got[1]["text"] == "a real paragraph"


def test_doc_id_packing_guard():
    from lingua_ray.stages.paradedup import explode_paragraph_keys
    batch = pa.table({"doc_id": pa.array([1 << 50], pa.int64()),
                      "text": pa.array(["hello"])})
    with pytest.raises(ValueError, match="packing range"):
        explode_paragraph_keys(batch)


def test_explode_combiner_keeps_block_min():
    from lingua_ray.stages.paradedup import explode_paragraph_keys
    batch = pa.table({
        "doc_id": pa.array([4, 2], pa.int64()),
        "text": pa.array(["dup\nalpha", "beta\ndup"]),
    })
    out = explode_paragraph_keys(batch)
    packed = sorted(out.column("packed").to_pylist())
    # 3 distinct paragraphs; "dup" keeps (doc 2, idx 1), not (doc 4, idx 0)
    assert len(packed) == 3
    assert (2 << 20) | 1 in packed
    assert (4 << 20) | 0 not in packed


def test_empty_batch_kernels():
    from lingua_ray.stages.paradedup import explode_paragraph_keys
    batch = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    out = explode_paragraph_keys(batch)
    assert out.num_rows == 0


# ------------------------------------------------- boilerplate line removal


def _run_lines(ray_session, docs, min_df):
    import ray.data
    from lingua_ray.stages.paradedup import remove_frequent_lines
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    rows = remove_frequent_lines(ds, min_df=min_df).take_all()
    return {r["doc_id"]: r["text"] for r in rows}


def test_frequent_lines_removed_everywhere(ray_session):
    boiler = "subscribe now"
    docs = [(i, f"unique line {i}\n{boiler}") for i in range(5)]
    docs.append((99, f"{boiler}\nanother unique"))
    out = _run_lines(None, docs, min_df=5)
    assert out[0] == "unique line 0"
    assert out[99] == "another unique"
    assert all(boiler not in t for t in out.values())


def test_below_threshold_lines_survive(ray_session):
    docs = [(1, "a\nb"), (2, "a\nc")]          # 'a' df=2 < 3
    out = _run_lines(None, docs, min_df=3)
    assert out == {1: "a\nb", 2: "a\nc"}


def test_fully_boilerplate_doc_drops(ray_session):
    boiler = "all rights reserved"
    docs = [(i, f"text {i}\n{boiler}") for i in range(5)]
    docs.append((50, boiler))                   # only boilerplate
    out = _run_lines(None, docs, min_df=5)
    assert 50 not in out and len(out) == 5


def test_repeated_line_in_one_doc_counts_once(ray_session):
    # 'x' appears 3x in ONE doc: df=1, must survive at min_df=2
    docs = [(1, "x\nx\nx"), (2, "y")]
    out = _run_lines(None, docs, min_df=2)
    assert out[1] == "x\nx\nx"
