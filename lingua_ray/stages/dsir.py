"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram features.

Selects raw-corpus documents that look like a TARGET distribution:

1. **Feature-count pass**: tokens are hashed into ``n_buckets`` buckets;
   a per-batch combiner emits sparse ``(bucket, n_target, n_raw)``
   partials (≤ n_buckets rows per block regardless of corpus size), then
   one tiny groupby-sum.  Two bag-of-hashed-ngrams unigram LMs fall out:
   ``p̂(b) = (count(b) + 1) / (total + n_buckets)`` (add-one smoothing),
   one for target-marked rows, one for the full raw corpus.
2. **Importance-weight pass**: shuffle-free ``map_batches`` — the dense
   ``llr[b] = ln p̂_target(b) − ln p̂_raw(b)`` array (n_buckets floats)
   ships with the task; ``log w(d) = Σ_tokens llr[bucket(token)]`` is
   one weighted bincount.  Per the paper, selection is Gumbel top-k:
   ``score = log w + g(doc)`` where the Gumbel ``g = −ln(−ln u)`` uses
   the md5-of-id CONSISTENT uniform every sampling stage here shares —
   deterministic across runs, partitionings, and cluster sizes.
3. **Select**: per-block top-k → salted tree-reduce → driver cut on the
   rounded score (``stages.util.topk_reduce``) — the k-safe reduction,
   never a global sort.

Bucketing uses ``md5(word)`` (first 13 hex digits, mod n_buckets) so the
DuckDB oracle reproduces the feature map byte-for-byte; the md5 runs once
per DISTINCT word per batch (``np.unique`` inverse), which bounds the
Python-loop cost at the batch vocabulary, not its token count.  A
production run free of the SQL-parity constraint would swap in the
vectorized ``fingerprint64_array`` — one line, same plan.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import round_half_away, topk_reduce, utf8_filled

_U52 = 4503599627370497.0  # 2^52 + 1: md5-derived uniform lands in (0, 1)


def _token_buckets(batch: pa.Table, text_col: str, n_buckets: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(bucket per token, row index per token) for a batch."""
    words = pc.split_pattern(utf8_filled(batch.column(text_col)), " ")
    counts = np.asarray(pc.list_value_length(words)
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
    flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    if len(flat) == 0:
        return np.zeros(0, dtype=np.int64), rows
    uniq, inv = np.unique(flat, return_inverse=True)
    lut = np.array([int(hashlib.md5(w.encode("utf-8")).hexdigest()[:13],
                        16) % n_buckets for w in uniq], dtype=np.int64)
    return lut[inv], rows


def _count_partial(batch: pa.Table, text_col: str, target_col: str,
                   target_value: str, n_buckets: int) -> pa.Table:
    buckets, rows = _token_buckets(batch, text_col, n_buckets)
    is_target = np.asarray(
        pc.fill_null(pc.equal(batch.column(target_col), target_value),
                     False).to_numpy(zero_copy_only=False), dtype=bool)
    n_raw = np.bincount(buckets, minlength=n_buckets)
    n_tgt = np.bincount(buckets[is_target[rows]], minlength=n_buckets)
    nz = np.flatnonzero(n_raw)
    return pa.table({
        "bucket": pa.array(nz, type=pa.int64()),
        "n_target": pa.array(n_tgt[nz], type=pa.int64()),
        "n_raw": pa.array(n_raw[nz], type=pa.int64())})


def build_llr(ds, target_col: str, target_value: str,
              text_col: str = "text", n_buckets: int = 1024) -> np.ndarray:
    """Dense per-bucket log-likelihood-ratio array for the corpus."""
    partial = ds.map_batches(_count_partial, batch_format="pyarrow",
                             fn_kwargs={"text_col": text_col,
                                        "target_col": target_col,
                                        "target_value": target_value,
                                        "n_buckets": n_buckets})
    rows = partial.groupby("bucket").sum(["n_target", "n_raw"]).take_all()
    ct = np.zeros(n_buckets, dtype=np.float64)
    cr = np.zeros(n_buckets, dtype=np.float64)
    for r in rows:
        ct[r["bucket"]] = r["sum(n_target)"]
        cr[r["bucket"]] = r["sum(n_raw)"]
    t, raw = ct.sum(), cr.sum()
    return (np.log((ct + 1.0) / (t + n_buckets))
            - np.log((cr + 1.0) / (raw + n_buckets)))


def dsir_select(ds, target_col: str, target_value: str, k: int = 100,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 1024) -> pa.Table:
    """Top-k documents by DSIR Gumbel importance score.

    Returns an Arrow table (id_col, ``dsir_score``) — score rounded to 6
    decimals before the rank cut, doc-id tie-break.
    """
    from .util import md5_hex_ranks

    llr = build_llr(ds, target_col, target_value, text_col=text_col,
                    n_buckets=n_buckets)

    def score(batch: pa.Table) -> pa.Table:
        buckets, rows = _token_buckets(batch, text_col, n_buckets)
        logw = np.bincount(rows, weights=llr[buckets],
                           minlength=batch.num_rows)
        ids = batch.column(id_col).to_pylist()
        v = np.array([int(d[:13], 16) for d in md5_hex_ranks(ids)],
                     dtype=np.float64)
        gumbel = -np.log(-np.log((v + 1.0) / _U52))
        return pa.table({
            id_col: batch.column(id_col),
            "dsir_score": pa.array(round_half_away(logw + gumbel, 6),
                                   type=pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return topk_reduce(scored, "dsir_score", id_col, k)
