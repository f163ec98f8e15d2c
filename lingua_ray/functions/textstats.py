"""Token counting and document fingerprinting — stateless batch functions.

Both are defined so a DuckDB oracle reproduces them exactly:
* ``n_tokens`` uses an RE2 pattern evaluated by ``pyarrow.compute`` (RE2)
  and by DuckDB ``regexp_extract_all`` (RE2) — identical engines.
* ``fingerprint`` is ``md5(text)`` — identical in hashlib and DuckDB.

``fingerprint64`` additionally provides the rolling-hash 64-bit fingerprint
used internally for exact dedup at scale (no SQL analogue).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..models import HASH_MULT
from ..stages.util import set_column

# BPE-ish pre-tokenization: word pieces OR single non-space symbols.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    col = pc.fill_null(batch.column(text_col), "")
    n_tokens = pc.cast(pc.count_substring_regex(col, TOKEN_PATTERN), pa.int64())
    ws = pc.cast(pc.count_substring_regex(col, r"[^ ]+"), pa.int64())
    batch = set_column(batch, "n_tokens", n_tokens)
    batch = set_column(batch, "n_ws_tokens", ws)
    return batch


_MIX64 = np.uint64(0xBF58476D1CE4E5B9)


def _mix64(h: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    h = (h ^ (h >> np.uint64(30))) * _MIX64
    return h ^ (h >> np.uint64(27))


def _fingerprint64(text: str) -> np.uint64:
    """Scalar reference for :func:`fingerprint64_array` (tests only)."""
    h = 0
    m = int(HASH_MULT)
    data = text.encode("utf-8")
    for b in data:
        h = (h * m + b) & 0xFFFFFFFFFFFFFFFF
    # 1-element array: numpy warns on scalar uint64 overflow, not on arrays
    h = (np.array([h], dtype=np.uint64)
         ^ np.array([len(data)], dtype=np.uint64) * HASH_MULT)
    return _mix64(h)[0]


def fingerprint64_array(col: pa.Array | pa.ChunkedArray,
                        mult: np.uint64 | None = None) -> np.ndarray:
    """Vectorized 64-bit text fingerprint (uint64 per row).

    Polynomial rolling hash over the UTF-8 bytes (Horner with ``mult``,
    default ``HASH_MULT``), finalized with a length xor + bit mix.
    Computed with one cumulative sum over the batch's concatenated value
    buffer — the per-row hash is the wrapped difference of prefix sums, no
    Python loop.  Used as the shuffle key for exact dedup so the groupby
    exchange moves 8-byte hashes instead of document bodies.  Passing a
    second odd ``mult`` yields an independent hash — two of them form the
    128-bit key paragraph dedup shuffles on (collision-safe at 10^11+
    paragraphs where a single 64-bit key is not).
    """
    mult = HASH_MULT if mult is None else np.uint64(mult)
    col = pc.fill_null(col, "")
    arr = pc.cast(col, pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
    lengths = (off[1:] - off[:-1]).astype(np.int64)
    total = int(off[-1] - off[0])
    if total == 0:
        h = np.zeros(n, dtype=np.uint64)
    else:
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        idx = np.arange(off[0], off[-1], dtype=np.int64)
        # exponent of mult for byte j of a row ending at e: e - 1 - j
        exp = np.repeat(off[1:], lengths) - 1 - idx
        pows = np.empty(int(lengths.max()), dtype=np.uint64)
        pows[0] = 1
        np.multiply.accumulate(
            np.full(len(pows), mult, dtype=np.uint64)[:-1],
            out=pows[1:])
        terms = data[idx].astype(np.uint64) * pows[exp]
        cs = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(terms, dtype=np.uint64, out=cs[1:])
        h = cs[off[1:] - off[0]] - cs[off[:-1] - off[0]]
    return _mix64(h ^ (lengths.astype(np.uint64) * mult))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = ["" if t is None else t for t in batch.column(text_col).to_pylist()]
    md5 = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    f64 = fingerprint64_array(batch.column(text_col))
    batch = set_column(batch, "fingerprint", pa.array(md5, type=pa.string()))
    batch = set_column(batch,
        "fingerprint64", pa.array(f64.view(np.int64), type=pa.int64()))
    return batch


def word_count_local(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Combiner for corpus word counts: per-batch (word, n) partial counts
    via Arrow kernels (split → flatten → value_counts) — the shuffle then
    carries one row per DISTINCT word per batch, never per token."""
    col = pc.fill_null(batch.column(text_col), "")
    words = pc.list_flatten(pc.split_pattern(col, " "))
    if len(words) == 0:
        return pa.table({"word": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    vc = pc.value_counts(words)
    return pa.table({"word": vc.field("values"),
                     "n": pc.cast(vc.field("counts"), pa.int64())})


def _topk_block(batch: pa.Table, k: int) -> pa.Table:
    """Block-local top-k by (n desc, word asc) — the global top-k is a
    subset of the union of block top-ks, so the driver reduce is tiny."""
    if batch.num_rows <= k:
        return batch
    return batch.sort_by([("n", "descending"),
                          ("word", "ascending")]).slice(0, k)


def word_counts_topk(ds, k: int = 100, text_col: str = "text",
                     n_reduce: int = 16) -> pa.Table:
    """Top-k corpus word frequencies: map-side combiner → groupby sum →
    per-block top-k → ONE distributed tree-reduce level → driver merge.
    Deterministic tie-break (count desc, word asc).

    The tree level is sound for any row partitioning: a row dropped from
    a partition's top-k is beaten by ≥ k rows there, so it cannot be in
    the global top-k.  Post-groupby each word is one row, so the driver
    sees ≤ n_reduce × k rows no matter how many blocks the corpus has."""
    partial = ds.map_batches(word_count_local, batch_format="pyarrow",
                             fn_kwargs={"text_col": text_col})
    grouped = partial.groupby("word").sum("n").rename_columns(
        {"sum(n)": "n"})
    local = grouped.map_batches(_topk_block, batch_format="pyarrow",
                                fn_kwargs={"k": k})

    def _salt(batch: pa.Table) -> pa.Table:
        salt = (fingerprint64_array(batch.column("word"))
                % np.uint64(n_reduce)).astype(np.int32)
        return batch.append_column("salt", pa.array(salt))

    def _topk_group(group: pa.Table) -> pa.Table:
        return _topk_block(group.drop_columns(["salt"]), k)

    reduced = (local.map_batches(_salt, batch_format="pyarrow")
               .groupby("salt").map_groups(_topk_group,
                                           batch_format="pyarrow"))
    t = pa.Table.from_pylist(reduced.take_all(),
                             schema=pa.schema([("word", pa.string()),
                                               ("n", pa.int64())]))
    # always sort: the salted tree level scrambles row order even when the
    # result is smaller than k
    return t.sort_by([("n", "descending"), ("word", "ascending")]).slice(0, k)
