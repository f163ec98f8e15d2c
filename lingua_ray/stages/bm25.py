"""BM25 ranked retrieval over the corpus — broadcast-query scoring.

Ranked search is the retrieval half of a training-data pipeline (e.g.
pulling topical documents for a curriculum, or scoring contamination
candidates against a benchmark query).  The plan is two shuffle-light
passes:

1. **Stats pass**: a per-batch combiner emits ≤ |query terms| + 1 rows
   per block — per-term partial document frequencies plus one sentinel
   row carrying (n_docs, total token count) — then one tiny groupby.
   The exchange never carries tokens; query terms are fixed and
   broadcast, so the combiner output is O(|Q|) per block regardless of
   corpus size.
2. **Score pass**: shuffle-free ``map_batches`` — per-row token counts
   via the same vectorized split/hash kernel TF-IDF uses
   (:mod:`lingua_ray.stages.tfidf`), term frequencies by hash match,
   Robertson/Sparck-Jones BM25::

       score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1-b+b·|d|/avgdl))
       idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)      (Lucene form)

   then per-block top-k → one salted tree-reduce level → driver merge,
   the same k-safe reduction ``word_counts_topk`` uses (a row outside a
   partition's top-k is beaten by ≥ k rows there, so it cannot be in
   the global top-k).

Ranking is on the ROUNDED score (6 decimals) with doc-id tie-break so
both engines cut the top-k at the same boundary.  Tokens are
``text.split(' ')`` — DuckDB ``string_split`` parity, empty tokens kept
(they count toward |d| exactly as the oracle's ``count(*)`` does).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .tfidf import _doc_word_hashes
from .util import round_half_away, topk_reduce
from ..functions.textstats import fingerprint64_array

# sentinel key for the (n_docs, total_len) stats row; a real term hash
# colliding with it has probability 2^-64 and the oracle would catch it
_STATS_KEY = np.int64(-(2**63))


def _term_hashes(terms: tuple[str, ...]) -> np.ndarray:
    return fingerprint64_array(pa.array(list(terms))).view(np.int64)


def bm25_stats_local(batch: pa.Table, terms: tuple[str, ...],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Combiner: per-query-term df partials + one corpus-stats row."""
    th = _term_hashes(terms)
    wh, rows = _doc_word_hashes(batch, text_col, id_col)
    wh = wh.view(np.int64)
    n = batch.num_rows
    dfs = np.zeros(len(th), dtype=np.int64)
    for i, t in enumerate(th):
        dfs[i] = len(np.unique(rows[wh == t]))
    keys = np.concatenate([th, [_STATS_KEY]])
    return pa.table({
        "key": pa.array(keys, type=pa.int64()),
        "df": pa.array(np.concatenate([dfs, [0]]), type=pa.int64()),
        "n_docs": pa.array([0] * len(th) + [n], type=pa.int64()),
        "total_len": pa.array([0] * len(th) + [len(wh)], type=pa.int64()),
    })


def _collect_stats(ds, terms: tuple[str, ...], text_col: str,
                   id_col: str) -> tuple[np.ndarray, int, float]:
    """(per-term df aligned to ``terms``, N docs, avgdl)."""
    partial = ds.map_batches(bm25_stats_local, batch_format="pyarrow",
                             fn_kwargs={"terms": terms,
                                        "text_col": text_col,
                                        "id_col": id_col})
    summed = (partial.groupby("key")
              .sum(["df", "n_docs", "total_len"]).take_all())
    th = _term_hashes(terms)
    df = np.zeros(len(th), dtype=np.int64)
    n_docs, total_len = 0, 0
    for row in summed:
        if row["key"] == _STATS_KEY:
            n_docs = int(row["sum(n_docs)"])
            total_len = int(row["sum(total_len)"])
        else:
            df[np.flatnonzero(th == row["key"])[0]] = int(row["sum(df)"])
    avgdl = total_len / n_docs if n_docs else 1.0
    return df, n_docs, avgdl


def bm25_topk(ds, terms: tuple[str, ...], k: int = 50,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id", n_reduce: int = 16) -> pa.Table:
    """Top-k documents by BM25 against the broadcast ``terms``.

    Returns an Arrow table (id_col, bm25) — docs matching no term are
    excluded, score rounded to 6 decimals before the rank cut.
    """
    df, n_docs, avgdl = _collect_stats(ds, terms, text_col, id_col)
    th = _term_hashes(terms)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(batch: pa.Table) -> pa.Table:
        wh, rows = _doc_word_hashes(batch, text_col, id_col)
        wh = wh.view(np.int64)
        n = batch.num_rows
        doclen = np.bincount(rows, minlength=n).astype(np.float64)
        norm = k1 * (1.0 - b + b * doclen / avgdl)
        total = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(th):
            tf = np.bincount(rows[wh == t], minlength=n).astype(np.float64)
            total += idf[i] * tf * (k1 + 1.0) / (tf + norm)
        hit = total > 0.0
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(hit)),
            "bm25": pa.array(round_half_away(total[hit], 6),
                             type=pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return topk_reduce(scored, "bm25", id_col, k, n_reduce=n_reduce)
