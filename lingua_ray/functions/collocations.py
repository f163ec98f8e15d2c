"""Bigram PMI collocation scoring over a document corpus.

PMI(a, b) = ln( P(a,b) / (P(a) · P(b)) ) with P(a,b) = bigram count /
total bigrams and P(w) = unigram count / total tokens — the classic
collocation statistic (Church & Hanks 1990).

Distributed shape, all counts aggregated before anything wide happens:

1. per-batch bigram combiner (adjacent in-document pairs, vectorized via
   list offsets — no token loop) → one hash groupby over (w1, w2);
2. per-batch unigram combiner → one hash groupby over word;
3. the unigram count table is broadcast once via ``ray.put`` (same
   vocabulary-fits-worker-heap assumption the TF-IDF stage documents)
   and an actor-pool stage attaches c(w1)/c(w2) via ``pc.index_in`` —
   no join, no second shuffle;
4. scalar totals (N1 tokens, N2 bigrams) reduced from the tiny count
   tables, then the same stage computes the PMI column.

Everything exchanged is vocabulary-bounded, independent of corpus rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def bigram_count_local(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Combiner: per-batch (w1, w2, n) partial counts of adjacent
    in-document word pairs.  Pairing is offset-arithmetic on the
    flattened token array: position i pairs with i+1 unless i is the
    last token of its document."""
    col = pc.fill_null(batch.column(text_col), "")
    words = pc.split_pattern(col, " ").combine_chunks()
    flat = pc.list_flatten(words)
    total = len(flat)
    if total < 2:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    offsets = words.offsets.to_numpy().astype(np.int64)
    keep = np.ones(total - 1, dtype=bool)
    ends = offsets[1:-1] - 1  # last-token index of every doc but the last
    keep[ends[(ends >= 0) & (ends < total - 1)]] = False
    idx = np.flatnonzero(keep)
    w1 = flat.take(pa.array(idx))
    w2 = flat.take(pa.array(idx + 1))
    # tokens cannot contain ' ' (they come from split on it), so the
    # joined string is a collision-free composite key for value_counts
    pair = pc.binary_join_element_wise(w1, w2, " ")
    vc = pc.value_counts(pair)
    split = pc.split_pattern(vc.field("values"), " ")
    return pa.table({"w1": pc.list_element(split, 0),
                     "w2": pc.list_element(split, 1),
                     "n": pc.cast(vc.field("counts"), pa.int64())})


def _unigram_counts(ds, text_col: str):
    from .textstats import word_count_local
    return ds.map_batches(word_count_local, batch_format="pyarrow",
                          fn_kwargs={"text_col": text_col}) \
        .groupby("word").sum("n").rename_columns({"sum(n)": "c"})


class _PmiScorer:
    """Actor-pool stage: unigram count table fetched once per actor from
    the object store; c(w1)/c(w2) looked up with ``pc.index_in`` (string
    match, no hash-collision risk), PMI computed in one vectorized
    expression."""

    def __init__(self, uni_ref, n1_total: int, n2_total: int):
        import ray
        uni: pa.Table = ray.get(uni_ref)
        self.words = uni.column("word").combine_chunks()
        self.counts = uni.column("c").to_numpy().astype(np.float64)
        self.n1 = float(n1_total)
        self.n2t = float(n2_total)

    def _lookup(self, col: pa.ChunkedArray) -> np.ndarray:
        idx = pc.index_in(col, value_set=self.words)
        # every bigram word is by construction in the unigram table
        return self.counts[idx.combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n2 = batch.column("n2").to_numpy().astype(np.float64)
        c1 = self._lookup(batch.column("w1"))
        c2 = self._lookup(batch.column("w2"))
        pmi = np.log((n2 / self.n2t) / ((c1 / self.n1) * (c2 / self.n1)))
        return batch.append_column("pmi", pa.array(np.round(pmi, 6)))


def pmi_bigrams(ds, text_col: str = "text", min_count: int = 5,
                concurrency: int | None = None):
    """Dataset of (w1, w2, n2, pmi) for every bigram with count ≥
    ``min_count``; ``pmi`` is rounded to 6 decimals (stable across
    engines).  ``ds`` is consumed twice (bigram + unigram pass)."""
    import ray

    bigrams_all = ds.map_batches(bigram_count_local, batch_format="pyarrow",
                                 fn_kwargs={"text_col": text_col}) \
        .groupby(["w1", "w2"]).sum("n") \
        .rename_columns({"sum(n)": "n2"}).materialize()
    uni = pa.Table.from_pylist(
        _unigram_counts(ds, text_col).take_all(),
        schema=pa.schema([("word", pa.string()), ("c", pa.int64())]))

    n1_total = int(pc.sum(uni.column("c")).as_py() or 0)
    n2_total = int(bigrams_all.sum("n2") or 0)
    bigrams = bigrams_all.filter(expr=f"n2 >= {int(min_count)}")
    if n1_total == 0 or n2_total == 0:
        return bigrams.limit(0)

    if concurrency is None:
        concurrency = max(2,
                          int(ray.cluster_resources().get("CPU", 4)) // 2)
    return bigrams.map_batches(
        _PmiScorer, batch_format="pyarrow", concurrency=(1, concurrency),
        fn_constructor_kwargs={"uni_ref": ray.put(uni),
                               "n1_total": n1_total,
                               "n2_total": n2_total})
