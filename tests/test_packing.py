"""Sequence packing invariants (stages/packing.py)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lingua_ray.stages.packing import pack_batch, pack_sequences


def _check_invariants(out: pa.Table, cap: int):
    ids = out.column("doc_id").to_pylist()
    toks = out.column("n_tokens").to_pylist()
    bins = out.column("bin_id").to_pylist()
    fills = out.column("bin_fill").to_pylist()
    assert len(set(ids)) == len(ids)  # every doc exactly once
    by_bin: dict = {}
    for i, t, b, f in zip(ids, toks, bins, fills):
        by_bin.setdefault(b, {"sum": 0, "members": [], "fill": f})
        by_bin[b]["sum"] += t
        by_bin[b]["members"].append(i)
        assert by_bin[b]["fill"] == f  # fill consistent within bin
    for b, info in by_bin.items():
        assert b in info["members"]  # bin id is a member's id
        assert info["sum"] == info["fill"]
        # over cap only when the bin is a single oversized doc
        if info["fill"] > cap:
            assert len(info["members"]) == 1


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), max_size=60),
       st.integers(min_value=1, max_value=64))
def test_pack_batch_invariants(tokens, cap):
    t = pa.table({"doc_id": pa.array(range(len(tokens)), type=pa.int64()),
                  "n_tokens": pa.array(tokens, type=pa.int64())})
    out = pack_batch(t, cap=cap)
    _check_invariants(out, cap)


@pytest.mark.parametrize("presort", [False, True])
def test_pack_batch_modes(presort):
    t = pa.table({"doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
                  "n_tokens": pa.array([100, 100, 100, 350],
                                       type=pa.int64())})
    out = pack_batch(t, cap=256, presort=presort)
    _check_invariants(out, 256)
    # the 350-token doc is alone in its own bin either way
    fills = {r["doc_id"]: r["bin_fill"] for r in out.to_pylist()}
    assert fills[13] == 350


def test_pack_sequences_dataset(ray_session):
    import ray.data
    rng = np.random.default_rng(7)
    rows = [{"doc_id": i, "n_tokens": int(rng.integers(1, 120))}
            for i in range(1000)]
    ds = ray.data.from_items(rows).repartition(4)
    out = pack_sequences(ds, cap=256).take_all()
    _check_invariants(pa.Table.from_pylist(out), 256)
    # packing efficiency: next-fit on ~60-mean docs should fill bins well
    fills = {r["bin_id"]: r["bin_fill"] for r in out}
    mean_fill = sum(fills.values()) / len(fills)
    assert mean_fill > 0.6 * 256


def test_pack_empty_batch():
    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "n_tokens": pa.array([], type=pa.int64())})
    out = pack_batch(t, cap=10)
    assert out.num_rows == 0
    assert "bin_id" in out.column_names


def test_grouped_packing_never_mixes_groups(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from lingua_ray.stages.packing import pack_sequences_grouped

    rng = np.random.default_rng(91)
    t = pa.table({
        "doc_id": pa.array(np.arange(3000, dtype=np.int64)),
        "lang": pa.array(rng.choice(["en", "de", "fr"], 3000)),
        "n_tokens": pa.array(rng.integers(1, 900, 3000).astype(np.int64)),
    })
    out = pack_sequences_grouped(
        ray.data.from_arrow(t).repartition(6), cap=2048,
        group_col="lang").take_all()
    assert len(out) == 3000
    by_bin = {}
    for r in out:
        by_bin.setdefault((r["lang"], r["bin_id"]), []).append(r)
    for (lang, _bin), rows in by_bin.items():
        assert all(r["lang"] == lang for r in rows)
        fill = rows[0]["bin_fill"]
        assert all(r["bin_fill"] == fill for r in rows)
        assert fill == sum(r["n_tokens"] for r in rows)
        assert fill <= 2048 or len(rows) == 1
