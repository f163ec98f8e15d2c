"""Stratified deterministic sampling over a keyed corpus.

``stratified_sample(ds, key_col, k)`` keeps exactly ``k`` rows per stratum
(language, source, domain ...), chosen by CONSISTENT hash rank — the same
rows are selected regardless of partitioning, run order, cluster size, or
resume, which is what a reproducible training-data subsample needs (a
`random_sample` would differ run to run and can't be oracle-checked).

Shape: per-batch combiner keeps the k hash-smallest rows per stratum seen
in that batch (the global winners are necessarily among the per-batch
winners), then ONE stratum-keyed ``groupby.map_groups`` picks the final k.
The shuffle carries ≤ k rows per (stratum, batch) — independent of corpus
size — so at 100 TB the exchange is bounded by k × strata × blocks, tiny.

Rank function: ``md5(str(id))`` hex digest with id ascending as tie-break,
byte-for-byte reproducible in DuckDB (``md5(CAST(id AS VARCHAR))``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .util import md5_hex_ranks


def _rank_key(batch: pa.Table, id_col: str) -> pa.Table:
    digests = md5_hex_ranks(batch.column(id_col).to_pylist())
    return batch.append_column("_rk", pa.array(digests, type=pa.string()))


def _topk_per_stratum(batch: pa.Table, key_col: str, id_col: str,
                      k: int) -> pa.Table:
    """Keep the k smallest (_rk, id) rows per stratum value in this table."""
    out = []
    sorted_t = batch.sort_by([(key_col, "ascending"), ("_rk", "ascending"),
                              (id_col, "ascending")])
    keys = sorted_t.column(key_col).to_pylist()
    start = 0
    for i in range(1, len(keys) + 1):
        if i == len(keys) or keys[i] != keys[start]:
            out.append(sorted_t.slice(start, min(k, i - start)))
            start = i
    if not out:
        return sorted_t
    return pa.concat_tables(out)


def stratified_sample(ds, key_col: str, k: int, id_col: str = "doc_id",
                      with_rank: bool = True):
    """k rows per ``key_col`` stratum by consistent md5-of-id rank.

    Returns columns ``(key_col, id_col[, rn])`` where ``rn`` is the 1-based
    rank within the stratum.
    """
    def combiner(batch: pa.Table) -> pa.Table:
        t = _rank_key(batch.select([key_col, id_col]), id_col)
        return _topk_per_stratum(t, key_col, id_col, k)

    def finalize(group: pa.Table) -> pa.Table:
        t = _topk_per_stratum(group, key_col, id_col, k)
        cols = [t.column(key_col), t.column(id_col)]
        names = [key_col, id_col]
        if with_rank:
            cols.append(pa.array(range(1, t.num_rows + 1), type=pa.int64()))
            names.append("rn")
        return pa.table(dict(zip(names, cols)))

    partial = ds.map_batches(combiner, batch_format="pyarrow")
    return partial.groupby(key_col).map_groups(finalize,
                                               batch_format="pyarrow")


def _es_keys(ids, weights) -> list[float]:
    """Efraimidis–Spirakis exponential keys with CONSISTENT uniforms.

    u is derived from the first 13 hex digits (52 bits — exact in a
    float64) of md5(str(id)), so the key is a pure function of the row:
    key = -ln((v + 1) / 2^52) / w.  Byte-for-byte reproducible in DuckDB:
    ``-ln((('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 13))::UBIGINT + 1)
    / 4503599627370496.0) / w`` — verified equal to Python ``math.log``.
    The k rows with the SMALLEST keys are a weighted sample without
    replacement (selection probability proportional to w at each draw).
    """
    out = []
    for d, w in zip(md5_hex_ranks(ids), weights):
        v = int(d[:13], 16)
        out.append(-math.log((v + 1) / 4503599627370496.0) / w)
    return out


def _smallest_k(t: pa.Table, id_col: str, k: int) -> pa.Table:
    return t.sort_by([("_key", "ascending"), (id_col, "ascending")]) \
            .slice(0, k)


def weighted_sample(ds, k: int, weight_col: str, id_col: str = "doc_id",
                    with_rank: bool = True):
    """Deterministic weighted sampling WITHOUT replacement: the global k
    rows with the smallest Efraimidis–Spirakis keys, weights from
    ``weight_col`` (rows with weight <= 0 are excluded — ES requires
    positive weights).

    Shape: each batch keeps its k smallest keys (the global winners are
    necessarily among the per-batch winners), then one single-group
    finalize picks the final k — the shuffle carries ≤ k rows per batch
    regardless of corpus size.  Same selection on any partitioning, any
    cluster size, any resume.

    Returns columns ``(id_col, weight_col[, rn])``, rn = 1-based rank.
    """
    def combiner(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, weight_col])
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(w > 0))
        keys = _es_keys(t.column(id_col).to_pylist(),
                        t.column(weight_col).to_pylist())
        t = t.append_column("_key", pa.array(keys, type=pa.float64()))
        t = t.append_column("_g", pa.array([0] * t.num_rows, pa.int32()))
        return _smallest_k(t, id_col, k)

    def finalize(group: pa.Table) -> pa.Table:
        t = _smallest_k(group, id_col, k)
        cols = [t.column(id_col), t.column(weight_col)]
        names = [id_col, weight_col]
        if with_rank:
            cols.append(pa.array(range(1, t.num_rows + 1), type=pa.int64()))
            names.append("rn")
        return pa.table(dict(zip(names, cols)))

    partial = ds.map_batches(combiner, batch_format="pyarrow")
    return partial.groupby("_g").map_groups(finalize,
                                            batch_format="pyarrow")


def weighted_sample_by_key(ds, key_col: str, k: int, weight_col: str,
                           id_col: str = "doc_id"):
    """Per-group weighted sampling WITHOUT replacement: for every
    distinct ``key_col`` value, the k rows with the smallest
    Efraimidis–Spirakis keys (md5-of-id consistent uniforms — the
    stratified_sample × weighted_sample composition a temperature-mixed
    multilingual sampler needs).

    Shape: each batch keeps its k smallest keys PER GROUP (the global
    per-group winners are among the per-batch ones), then one
    key-grouped finalize — the shuffle carries ≤ k rows per (group,
    batch).  Returns (key_col, id_col, weight_col, rn), rn the 1-based
    within-group rank.
    """
    def _smallest_k_per_key(t: pa.Table) -> pa.Table:
        s = t.sort_by([(key_col, "ascending"), ("_key", "ascending"),
                       (id_col, "ascending")])
        g = np.asarray(s.column(key_col).to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(np.concatenate([[True], g[1:] != g[:-1]]))
        local = np.arange(len(g), dtype=np.int64)
        local -= np.repeat(starts,
                           np.diff(np.concatenate([starts, [len(g)]])))
        return s.filter(pa.array(local < k)), local[local < k]

    def combiner(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, id_col, weight_col])
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(w > 0))
        keys = _es_keys(t.column(id_col).to_pylist(),
                        t.column(weight_col).to_pylist())
        t = t.append_column("_key", pa.array(keys, type=pa.float64()))
        return _smallest_k_per_key(t)[0]

    def finalize(group: pa.Table) -> pa.Table:
        t, local = _smallest_k_per_key(group)
        return pa.table({
            key_col: t.column(key_col), id_col: t.column(id_col),
            weight_col: t.column(weight_col),
            "rn": pa.array(local + 1, type=pa.int64())})

    partial = ds.map_batches(combiner, batch_format="pyarrow")
    return partial.groupby(key_col).map_groups(finalize,
                                               batch_format="pyarrow")


def _md5_threshold(rate: float) -> str:
    """32-hex-char threshold t such that P[md5(id) < t] = rate under a
    uniform digest.  String comparison on lowercase hex is byte-order =
    value-order, identical in Python and DuckDB."""
    if rate >= 1.0:
        return "g" * 32  # > every hex digest
    return format(int(rate * 16 ** 32), "032x")


def hash_sample(ds, rate: float, id_col: str = "doc_id"):
    """Keep a deterministic ``rate`` fraction of rows: md5(str(id)) below
    the rate threshold.  Consistent across runs/partitions/cluster sizes
    (unlike ``Dataset.random_sample``), embarrassingly parallel, zero
    shuffle — the standard reproducible-subsample primitive."""
    thresh = _md5_threshold(rate)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        mask = pa.array([d < thresh for d in md5_hex_ranks(ids)],
                        type=pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def mix_corpora(sources: list[tuple], id_col: str = "doc_id",
                label_col: str = "source"):
    """Weighted corpus mixing: each ``(name, ds, rate)`` source is
    hash-sampled at its rate, tagged with ``label_col`` = name, and the
    streams are unioned — the data-mixing step of a training pipeline.
    Union in Ray Data concatenates block streams without moving rows."""
    tagged = []
    for name, ds, rate in sources:
        s = hash_sample(ds, rate, id_col=id_col)

        def tag(batch: pa.Table, _name=name) -> pa.Table:
            lbl = pa.array([_name] * batch.num_rows, type=pa.string())
            return batch.append_column(label_col, lbl)

        tagged.append(s.map_batches(tag, batch_format="pyarrow"))
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out


def split_assign(ds, fractions: dict[str, float], id_col: str = "doc_id",
                 out_col: str = "split"):
    """Deterministic train/val/test assignment: md5(str(id)) hex falls
    into consecutive threshold bands sized by ``fractions`` (must sum to
    ~1; the last band absorbs rounding).  Embarrassingly parallel, zero
    coordination, stable across runs/partitionings/cluster sizes — and
    byte-for-byte reproducible in SQL with the same inlined hex
    thresholds (``_md5_threshold``)."""
    names = list(fractions)
    cum, bands = 0.0, []
    for name in names[:-1]:
        cum += fractions[name]
        bands.append((_md5_threshold(cum), name))

    def assign(batch: pa.Table) -> pa.Table:
        digests = md5_hex_ranks(batch.column(id_col).to_pylist())
        labels = []
        for d in digests:
            for thresh, name in bands:
                if d < thresh:
                    labels.append(name)
                    break
            else:
                labels.append(names[-1])
        return batch.append_column(out_col, pa.array(labels, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")
