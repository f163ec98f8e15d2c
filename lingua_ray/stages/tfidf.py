"""Corpus TF-IDF scoring — document-frequency statistics at scale.

Two passes, both shuffle-light:

1. **DF pass**: per-batch combiner emits one ``(word_hash, df_partial)``
   row per distinct (document, word) pair collapsed to per-word counts —
   the exchange carries the batch's VOCABULARY, not its tokens — then
   ``groupby(hash).sum``.  The summed DF table (the corpus vocabulary) is
   collected, sorted, and broadcast via ``ray.put``; the assumption that
   the vocabulary fits in a worker's heap is the same one every IDF-based
   ranker makes (≈100 M distinct words × 16 B ≈ 1.6 GB worst case at web
   scale — document-level joins are the fallback if it ever didn't).
2. **Score pass**: shuffle-free ``map_batches`` actor pool — per-document
   term frequencies via one lexsort, IDF lookup via ``searchsorted``
   against the broadcast array, ``score = Σ_w tf(w) · ln(N / df(w))``.

Words are ``text.split(' ')`` (DuckDB ``string_split`` parity, empty
tokens included); word identity is the 64-bit fingerprint (collisions
~n²/2⁶⁵ — negligible, and the DuckDB oracle would catch one).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import utf8_filled

from ..functions.textstats import fingerprint64_array


def _doc_word_hashes(batch: pa.Table, text_col: str, id_col: str
                     ) -> tuple[np.ndarray, np.ndarray]:
    """(word hashes, row index per word) for a batch."""
    col = utf8_filled(batch.column(text_col))
    words = pc.split_pattern(col, " ")
    counts = np.asarray(pc.list_value_length(words)
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
    wh = fingerprint64_array(pc.list_flatten(words))
    rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    return wh, rows


def df_local(batch: pa.Table, text_col: str = "text",
             id_col: str = "doc_id") -> pa.Table:
    """Combiner: per-word count of distinct documents in this batch."""
    wh, rows = _doc_word_hashes(batch, text_col, id_col)
    if len(wh) == 0:
        return pa.table({"word_hash": pa.array([], type=pa.int64()),
                         "df": pa.array([], type=pa.int64())})
    wh = wh.view(np.int64)  # int64 view: Ray groupby keys must fit int64
    order = np.lexsort((wh, rows))
    h, r = wh[order], rows[order]
    first = np.ones(len(h), dtype=bool)
    first[1:] = (h[1:] != h[:-1]) | (r[1:] != r[:-1])
    vals, cnts = np.unique(h[first], return_counts=True)
    return pa.table({"word_hash": pa.array(vals, type=pa.int64()),
                     "df": pa.array(cnts.astype(np.int64), type=pa.int64())})


def build_df_table(ds, text_col: str = "text", id_col: str = "doc_id"
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Global (sorted word hashes, document frequencies) for the corpus."""
    import ray
    partial = ds.map_batches(df_local, batch_format="pyarrow",
                             fn_kwargs={"text_col": text_col,
                                        "id_col": id_col})
    summed = partial.groupby("word_hash").sum("df")
    hs, dfs = [], []
    for b in ray.get(summed.to_arrow_refs()):
        if not b.num_columns:
            continue
        hs.append(b.column("word_hash").to_numpy().astype(np.int64))
        dfs.append(b.column("sum(df)").to_numpy().astype(np.int64))
    if not hs:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    h = np.concatenate(hs)
    d = np.concatenate(dfs)
    order = np.argsort(h)
    return h[order], d[order]


class TfIdfScorer:
    """Actor-pool stage: per-document TF-IDF score against the broadcast
    (hash, df) vocabulary.  Appends ``tfidf`` (rounded to 6 decimals for
    cross-engine comparability)."""

    def __init__(self, vocab_ref, n_docs: int, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray
        vocab = (ray.get(vocab_ref)
                 if not isinstance(vocab_ref, tuple) else vocab_ref)
        self.hashes, dfs = vocab
        self.idf = np.log(n_docs / dfs.astype(np.float64))
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        wh, rows = _doc_word_hashes(batch, self.text_col, self.id_col)
        score = np.zeros(batch.num_rows, dtype=np.float64)
        if len(wh) and len(self.hashes):
            wh = wh.view(np.int64)
            idx = np.searchsorted(self.hashes, wh)
            idx[idx == len(self.hashes)] = 0
            ok = self.hashes[idx] == wh  # words unseen in the DF pass: idf 0
            np.add.at(score, rows[ok], self.idf[idx[ok]])
        return batch.append_column(
            "tfidf", pa.array(np.round(score, 6), type=pa.float64()))


def tfidf_scores(ds, n_docs: int | None = None, text_col: str = "text",
                 id_col: str = "doc_id", concurrency: int = 4):
    """Score every document: ``tfidf = Σ over word OCCURRENCES of
    ln(N / df(word))`` (equivalently Σ_distinct tf·idf)."""
    import ray
    if n_docs is None:
        n_docs = ds.count()
    vocab = build_df_table(ds, text_col=text_col, id_col=id_col)
    ref = ray.put(vocab)
    return ds.map_batches(
        TfIdfScorer, concurrency=concurrency,
        fn_constructor_kwargs={"vocab_ref": ref, "n_docs": n_docs,
                               "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow")
