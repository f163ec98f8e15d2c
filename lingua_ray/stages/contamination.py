"""Benchmark-contamination detection for training corpora.

The standard decontamination step in large-scale training-data pipelines
(C4/GPT-3 style): flag training documents sharing word-n-grams with an
evaluation/benchmark set.

Ray-Data-first shape:

1. The benchmark side is SMALL by definition (eval sets are thousands of
   documents).  Its distinct n-gram hashes are collected once, sorted, and
   broadcast with ``ray.put`` — ONE object-store copy per node, fetched in
   each actor's ``__init__``, never re-shipped per batch.
2. The corpus side streams through a ``map_batches`` actor pool: per batch,
   word n-grams are formed as rolling polynomial hashes over per-word
   64-bit fingerprints (no n-gram strings are ever built), per-document
   distinct counts + membership via one ``searchsorted`` against the
   broadcast array.  No shuffle at all — the corpus never moves.

At 100 TB this is the cheapest possible plan: the only cross-node traffic
is the benchmark hash array (MBs) once per node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import fingerprint64_array
from ..models import HASH_MULT
from .util import utf8_filled


def _word_gram_hashes(batch: pa.Table, n: int, text_col: str
                      ) -> tuple[np.ndarray, np.ndarray]:
    """All word-``n``-gram rolling hashes for a batch.

    Words are ``text.split(' ')`` (DuckDB ``string_split`` semantics —
    empty strings between consecutive spaces count as words, matching the
    SQL oracle).  Returns ``(hashes uint64, row_offsets int64)``.
    """
    col = utf8_filled(batch.column(text_col))
    words = pc.split_pattern(col, " ")
    flat = pc.list_flatten(words)
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    counts = np.asarray(counts, dtype=np.int64)
    wh = fingerprint64_array(flat)
    # rolling polynomial over word hashes, windows within one row
    n_grams = np.maximum(counts - n + 1, 0)
    offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    tot = int(n_grams.sum())
    out_offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(n_grams, out=out_offs[1:])
    if tot == 0:
        return np.zeros(0, np.uint64), out_offs
    starts_out = out_offs[:-1]
    within = np.arange(tot, dtype=np.int64) - np.repeat(starts_out, n_grams)
    starts = np.repeat(offs[:-1], n_grams) + within
    h = np.zeros(tot, dtype=np.uint64)
    for j in range(n):
        h = h * HASH_MULT + wh[starts + j]
    return h, out_offs


def _distinct_per_row(hashes: np.ndarray, offs: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Distinct hashes within each row: returns (kept hashes sorted per
    row, per-row distinct counts).  Vectorized via one global lexsort."""
    n_rows = len(offs) - 1
    if len(hashes) == 0:
        return hashes, np.zeros(n_rows, dtype=np.int64)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), offs[1:] - offs[:-1])
    order = np.lexsort((hashes, rows))
    h, r = hashes[order], rows[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (h[1:] != h[:-1]) | (r[1:] != r[:-1])
    counts = np.bincount(r[keep], minlength=n_rows).astype(np.int64)
    return h[keep], counts


def benchmark_gram_hashes(ds, n: int = 8, text_col: str = "text"
                          ) -> np.ndarray:
    """Distinct word-n-gram hashes of the (small) benchmark Dataset as one
    sorted uint64 array, ready for ``ray.put`` broadcast."""
    def distinct_local(batch: pa.Table) -> pa.Table:
        h, offs = _word_gram_hashes(batch, n, text_col)
        u = np.unique(h)
        return pa.table({"gram_hash": pa.array(u, type=pa.uint64())})

    parts = ds.map_batches(distinct_local, batch_format="pyarrow")
    arrs = [np.asarray(b.column("gram_hash").to_numpy(zero_copy_only=False),
                       dtype=np.uint64)
            for b in __import__("ray").get(parts.to_arrow_refs())
            if b.num_columns]
    return (np.unique(np.concatenate(arrs)) if arrs
            else np.zeros(0, np.uint64))


class ContaminationTagger:
    """Actor-pool stage: per-document benchmark n-gram overlap.

    ``bench_ref`` is a ``ray.put`` ObjectRef of the sorted benchmark hash
    array — fetched ONCE per actor (zero-copy shared memory on each node),
    per the broadcast-small-side pattern.

    Appends ``n_ngrams`` (distinct word n-grams in the doc) and ``n_hits``
    (of those, how many appear in the benchmark set).
    """

    def __init__(self, bench_ref, n: int = 8, text_col: str = "text"):
        import ray
        self.bench = (ray.get(bench_ref) if not isinstance(bench_ref,
                                                           np.ndarray)
                      else bench_ref)
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, offs = _word_gram_hashes(batch, self.n, self.text_col)
        dh, n_ngrams = _distinct_per_row(h, offs)
        if len(self.bench) and len(dh):
            idx = np.searchsorted(self.bench, dh)
            idx[idx == len(self.bench)] = 0
            hit = (self.bench[idx] == dh)
        else:
            hit = np.zeros(len(dh), dtype=bool)
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_ngrams)
        n_hits = np.bincount(rows[hit], minlength=batch.num_rows)
        batch = batch.append_column(
            "n_ngrams", pa.array(n_ngrams, type=pa.int64()))
        return batch.append_column(
            "n_hits", pa.array(n_hits.astype(np.int64), type=pa.int64()))


def contamination_check(corpus_ds, bench_ds, n: int = 8,
                        text_col: str = "text", concurrency=None):
    """Tag every corpus document with its benchmark n-gram overlap.

    ``concurrency`` defaults to an ELASTIC (1, min(4, CPUs)) pool: a
    fixed pool size equal to the session's CPU count is an
    all-or-nothing reservation that can starve the rest of the plan
    (observed as a wedge on a 4-CPU test session)."""
    import ray
    bench = benchmark_gram_hashes(bench_ds, n=n, text_col=text_col)
    ref = ray.put(bench)
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, min(4, max(1, cpus)))
    return corpus_ds.map_batches(
        ContaminationTagger, concurrency=concurrency,
        fn_constructor_kwargs={"bench_ref": ref, "n": n,
                               "text_col": text_col},
        batch_format="pyarrow")
