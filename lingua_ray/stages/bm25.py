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
    """Combiner: per-query-term df partials + one corpus-stats row.

    ``terms`` must be distinct (the public entry points dedupe): a
    duplicated term would emit two identical key rows per block and the
    downstream groupby-sum would double its df.

    One ``np.isin`` mask + lexsort first-occurrence count instead of a
    per-term boolean scan — O(tokens · log) total rather than
    O(|Q| · tokens)."""
    th = _term_hashes(terms)
    wh, rows = _doc_word_hashes(batch, text_col, id_col)
    wh = wh.view(np.int64)
    n = batch.num_rows
    dfs = np.zeros(len(th), dtype=np.int64)
    sel = np.isin(wh, th)
    if sel.any():
        h_s, r_s = wh[sel], rows[sel]
        order = np.lexsort((r_s, h_s))
        h_s, r_s = h_s[order], r_s[order]
        first = np.ones(len(h_s), dtype=bool)
        first[1:] = (h_s[1:] != h_s[:-1]) | (r_s[1:] != r_s[:-1])
        vals, cnts = np.unique(h_s[first], return_counts=True)
        pos = np.searchsorted(vals, th)
        ok = pos < len(vals)
        ok[ok] = vals[pos[ok]] == th[ok]
        dfs[ok] = cnts[pos[ok]]
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


def _make_score_fn(th: np.ndarray, idf: np.ndarray, avgdl: float,
                   k1: float, b: float, text_col: str, id_col: str):
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
    return score


def bm25_topk(ds, terms: tuple[str, ...], k: int = 50,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id", n_reduce: int = 16) -> pa.Table:
    """Top-k documents by BM25 against the broadcast ``terms``.

    Returns an Arrow table (id_col, bm25) — docs matching no term are
    excluded, score rounded to 6 decimals before the rank cut.
    """
    # order-preserving dedupe: a duplicated query term would double its
    # df in the groupby-sum AND its score contribution in the per-term
    # accumulation loop
    terms = tuple(dict.fromkeys(terms))
    df, n_docs, avgdl = _collect_stats(ds, terms, text_col, id_col)
    th = _term_hashes(terms)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    score = _make_score_fn(th, idf, avgdl, k1, b, text_col, id_col)
    scored = ds.map_batches(score, batch_format="pyarrow")
    return topk_reduce(scored, "bm25", id_col, k, n_reduce=n_reduce)


# ------------------------------------------------------- persisted index

_META_FILE = "_index_meta.json"


def build_bm25_index(ds, index_dir: str, n_buckets: int = 64,
                     text_col: str = "text", id_col: str = "doc_id"
                     ) -> None:
    """Persist the corpus document-frequency table, hive-partitioned by
    ``bucket = word_hash mod n_buckets``, plus (n_docs, total token
    count) — the statistics every later BM25 query needs, so repeated
    query sets touch only their terms' bucket directories instead of
    re-scanning the corpus.  The meta file is written LAST (the
    fingerprint-index commit-marker convention,
    :mod:`lingua_ray.stages.dedup_index`): a crash mid-build leaves a
    metaless directory the probe refuses."""
    import json
    import shutil
    from pathlib import Path

    out = Path(index_dir)
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)

    def partial(batch: pa.Table) -> pa.Table:
        wh, rows = _doc_word_hashes(batch, text_col, id_col)
        wh = wh.view(np.int64)
        order = np.lexsort((wh, rows))
        h, r = wh[order], rows[order]
        first = np.ones(len(h), dtype=bool)
        if len(h):
            first[1:] = (h[1:] != h[:-1]) | (r[1:] != r[:-1])
        vals, cnts = np.unique(h[first], return_counts=True)
        return pa.table({
            "word_hash": pa.array(
                np.concatenate([vals, [_STATS_KEY]]), type=pa.int64()),
            "df": pa.array(
                np.concatenate([cnts, [0]]).astype(np.int64)),
            "n_docs": pa.array([0] * len(vals) + [batch.num_rows],
                               type=pa.int64()),
            "total_len": pa.array([0] * len(vals) + [len(wh)],
                                  type=pa.int64())})

    summed = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("word_hash").sum(["df", "n_docs", "total_len"]))

    def split(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pa.array(batch.column("word_hash").to_numpy() != _STATS_KEY))
        h = keep.column("word_hash").to_numpy()
        return pa.table({
            "word_hash": keep.column("word_hash"),
            "df": keep.column("sum(df)"),
            "bucket": pa.array(
                (h.view(np.uint64) % np.uint64(n_buckets))
                .astype(np.int32))})

    # one row per distinct word: vocabulary-sized (the same
    # vocabulary-fits assumption tfidf's broadcast makes), pinned only
    # for the duration of the two consumers below
    summed = summed.materialize()
    summed.map_batches(split, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"])

    def only_stats(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(
            batch.column("word_hash").to_numpy() == _STATS_KEY))

    stats = summed.map_batches(only_stats,
                               batch_format="pyarrow").take_all()
    (out / _META_FILE).write_text(json.dumps({
        "kind": "bm25", "n_buckets": n_buckets,
        "text_col": text_col, "id_col": id_col,
        "n_docs": int(stats[0]["sum(n_docs)"]) if stats else 0,
        "total_len": int(stats[0]["sum(total_len)"]) if stats else 0}))


def bm25_query_index(ds, index_dir: str, terms: tuple[str, ...],
                     k: int = 50, k1: float = 1.2, b: float = 0.75,
                     n_buckets: int = 64, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Score ``ds`` against the persisted index: only the query terms'
    bucket directories leave storage (the dedup_index/IVF directory-
    pruning idiom) — the corpus-wide stats pass is skipped entirely."""
    import json
    from pathlib import Path

    # same dedupe rationale as bm25_topk (duplicate terms would
    # double-count their score contribution)
    terms = tuple(dict.fromkeys(terms))


    p = Path(index_dir) / _META_FILE
    if not p.exists():
        raise FileNotFoundError(
            f"{index_dir} has no {_META_FILE}: not a BM25 index (or an "
            "interrupted build — rebuild it)")
    meta = json.loads(p.read_text())
    want = {"kind": "bm25", "n_buckets": n_buckets,
            "text_col": text_col, "id_col": id_col}
    got = {k: meta.get(k) for k in want}
    if got != want:
        raise ValueError(
            f"index meta {got} does not match {want} — a silent "
            "mismatch would probe the wrong buckets (or score a column "
            "the df table was never built over) and corrupt every "
            "score, not error")

    th = _term_hashes(terms)
    touched = sorted({int(h) % n_buckets
                      for h in th.view(np.uint64)})
    paths = [str(f) for bk in touched
             for f in sorted((Path(index_dir)
                              / f"bucket={bk}").glob("*.parquet"))]
    df = np.zeros(len(th), dtype=np.int64)
    if paths:
        # a handful of small bucket files for |Q| rows: direct pyarrow
        # read with a pushed-down term filter — no Ray job round-trip,
        # and untouched rows never reach the driver
        import pyarrow.parquet as pq
        t = pq.read_table(paths, columns=["word_hash", "df"],
                          filters=[("word_hash", "in",
                                    [int(x) for x in th])])
        lut = dict(zip(t.column("word_hash").to_pylist(),
                       t.column("df").to_pylist()))
        for i, x in enumerate(th):
            df[i] = lut.get(int(x), 0)
    n_docs, total_len = meta["n_docs"], meta["total_len"]
    avgdl = total_len / n_docs if n_docs else 1.0
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    score = _make_score_fn(th, idf, avgdl, k1, b, text_col, id_col)
    scored = ds.map_batches(score, batch_format="pyarrow")
    return topk_reduce(scored, "bm25", id_col, k)
