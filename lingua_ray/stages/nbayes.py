"""Multinomial Naive Bayes over hashed bag-of-words features —
distributed TRAINING via count sufficient statistics + broadcast
inference (the fastText-shaped "train a cheap classifier on the corpus,
then score everything" loop of a curation pipeline).

Training is one combiner + one tiny groupby: per batch, sparse
``(label, bucket, n)`` token counts plus one ``bucket = -1`` sentinel
row per label carrying the document count — ≤ labels × (n_buckets + 1)
rows per block on the wire, never tokens.  The driver assembles the
add-one-smoothed log-probability matrix ``M[label, bucket] =
ln((n(label, bucket) + 1) / (tokens(label) + n_buckets))`` and log
priors ``ln(docs(label) / docs_total)`` — (labels × n_buckets) doubles,
broadcast to the shuffle-free classification pass.

Classification scores every document against every label with one
weighted bincount per label; the argmax is taken on the ROUNDED
(6-decimal) score with label-ascending tie-break so the DuckDB oracle
lands on the same winner at float boundaries.

Feature hashing is the md5 bucket map shared with :mod:`.dsir` (SQL
parity; one md5 per distinct word per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dsir import _token_buckets
from .util import round_half_away, utf8_filled

_DOCS_SENTINEL = -1  # bucket id of the per-label document-count row


def _nb_count_partial(batch: pa.Table, text_col: str, label_col: str,
                      n_buckets: int) -> pa.Table:
    if batch.num_rows == 0:
        # typed empty — np.unique on an empty label array would yield a
        # null-typed label column and break groupby schema unification
        return pa.table({"label": pa.array([], pa.string()),
                         "bucket": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    buckets, rows = _token_buckets(batch, text_col, n_buckets)
    labels = np.asarray(utf8_filled(batch.column(label_col))
                        .to_numpy(zero_copy_only=False))
    uniq, codes = np.unique(labels, return_inverse=True)
    tok_key = codes[rows] * (n_buckets + 1) + (buckets + 1)
    doc_key = codes * (n_buckets + 1)  # sentinel slot 0 per label
    uk, uc = np.unique(np.concatenate([tok_key, doc_key]),
                       return_counts=True)
    return pa.table({
        "label": pa.array(uniq[uk // (n_buckets + 1)]),
        "bucket": pa.array((uk % (n_buckets + 1) - 1).astype(np.int64)),
        "n": pa.array(uc.astype(np.int64))})


def train_nb(ds, label_col: str, text_col: str = "text",
             n_buckets: int = 1024
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted labels, log-prob matrix (L, n_buckets), log priors (L,))."""
    partial = ds.map_batches(_nb_count_partial, batch_format="pyarrow",
                             fn_kwargs={"text_col": text_col,
                                        "label_col": label_col,
                                        "n_buckets": n_buckets})
    rows = partial.groupby(["label", "bucket"]).sum("n").take_all()
    labels = np.array(sorted({r["label"] for r in rows}))
    lut = {l: i for i, l in enumerate(labels)}
    counts = np.zeros((len(labels), n_buckets), dtype=np.float64)
    docs = np.zeros(len(labels), dtype=np.float64)
    for r in rows:
        i = lut[r["label"]]
        if r["bucket"] == _DOCS_SENTINEL:
            docs[i] = r["sum(n)"]
        else:
            counts[i, r["bucket"]] = r["sum(n)"]
    tot = counts.sum(axis=1, keepdims=True)
    m = np.log((counts + 1.0) / (tot + n_buckets))
    priors = np.log(docs / docs.sum())
    return labels, m, priors


def nb_classify(ds, label_col: str, text_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 1024,
                keep_label: bool = False):
    """Train on ``ds`` and classify every row of it: Dataset of
    (id, ``pred_<label_col>``, ``score``, ``hit``); with ``keep_label``
    the true label column rides along (confusion-matrix input)."""
    import ray

    labels, m, priors = train_nb(ds, label_col, text_col=text_col,
                                 n_buckets=n_buckets)
    ref = ray.put((labels, m, priors))

    def classify(batch: pa.Table) -> pa.Table:
        lbl, mat, pri = ray.get(ref)
        buckets, rows = _token_buckets(batch, text_col, n_buckets)
        n = batch.num_rows
        scores = np.empty((n, len(lbl)), dtype=np.float64)
        for i in range(len(lbl)):
            scores[:, i] = np.bincount(rows, weights=mat[i, buckets],
                                       minlength=n) + pri[i]
        scores = round_half_away(scores, 6)
        pred = scores.argmax(axis=1)  # first max = label-asc tie-break
        truth = np.asarray(utf8_filled(batch.column(label_col))
                           .to_numpy(zero_copy_only=False))
        cols = {
            id_col: batch.column(id_col),
            "pred_" + label_col: pa.array(lbl[pred]),
            "score": pa.array(scores[np.arange(n), pred]),
            "hit": pa.array((lbl[pred] == truth).astype(np.int32))}
        if keep_label:
            cols[label_col] = pa.array(truth)
        return pa.table(cols)

    return ds.map_batches(classify, batch_format="pyarrow")
