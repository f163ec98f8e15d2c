"""Per-source distribution drift: KL(P_source || P_corpus) over words.

A standard domain-shift diagnostic for corpus mixing: sources whose
word distribution diverges from the pooled corpus get flagged.  The
source distribution's support is a subset of the global support, so the
divergence is finite without smoothing.

Distributed shape (everything vocabulary-bounded after the combiner):
(source, word) partial counts → ONE hash groupby; per-source totals are
a tiny second aggregate of that table; the global word-count table is
broadcast via ``ray.put`` (the PMI/TF-IDF vocabulary assumption); each
count row then yields its p·ln(p/q) term in a shuffle-free map and a
per-source sum finishes.  Float-sum association differs from a serial
engine by ~1e-12 relative — far inside the 6-decimal rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def source_word_counts(batch: pa.Table, key_col: str = "source",
                       text_col: str = "text") -> pa.Table:
    """Combiner: (key, word, n) partials — one row per distinct pair."""
    from ..stages.util import utf8_filled
    # utf8_filled tolerates null-TYPED (all-null) blocks and returns a
    # plain (already-combined) Array, so no combine_chunks afterwards
    col = utf8_filled(batch.column(text_col))
    words = pc.split_pattern(col, " ")
    n_per = np.diff(words.offsets.to_numpy().astype(np.int64))
    flat = pc.list_flatten(words)
    keys = batch.column(key_col).take(
        pa.array(np.repeat(np.arange(batch.num_rows), n_per)))
    t = pa.table({key_col: keys, "word": flat})
    g = pa.TableGroupBy(t, [key_col, "word"]).aggregate([([], "count_all")])
    return g.rename_columns([key_col, "word", "n"])


def source_kl(ds, key_col: str = "source", text_col: str = "text",
              ndigits: int = 6):
    """Dataset of (key_col, kl) — KL(source ‖ pooled corpus), rounded."""
    import ray

    counts = ds.map_batches(source_word_counts, batch_format="pyarrow",
                            fn_kwargs={"key_col": key_col,
                                       "text_col": text_col}) \
        .groupby([key_col, "word"]).sum("n") \
        .rename_columns({"sum(n)": "n"}).materialize()

    totals = {r[key_col]: r["sum(n)"]
              for r in counts.groupby(key_col).sum("n").take_all()}
    gtot = float(sum(totals.values()))
    if gtot == 0:
        return counts.limit(0)
    gtable = pa.Table.from_pylist(
        [{"word": r["word"], "gn": r["sum(n)"]}
         for r in counts.groupby("word").sum("n").take_all()],
        schema=pa.schema([("word", pa.string()), ("gn", pa.int64())]))
    gref = ray.put(gtable)
    tref = ray.put(totals)

    class Contrib:
        def __init__(self):
            g: pa.Table = ray.get(gref)
            self.words = g.column("word").combine_chunks()
            self.gn = g.column("gn").to_numpy().astype(np.float64)
            self.totals = ray.get(tref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.column("n").to_numpy().astype(np.float64)
            keys = batch.column(key_col).to_pylist()
            tot = np.array([self.totals[k] for k in keys], np.float64)
            idx = pc.index_in(batch.column("word"),
                              value_set=self.words).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            q = self.gn[idx] / gtot
            p = n / tot
            return pa.table({key_col: batch.column(key_col),
                             "term": pa.array(p * np.log(p / q))})

    summed = counts.map_batches(Contrib, batch_format="pyarrow",
                                concurrency=(1, 4)) \
        .groupby(key_col).sum("term")

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch.column(key_col),
            "kl": pa.array(np.round(
                batch.column("sum(term)").to_numpy(), ndigits)),
        })

    return summed.map_batches(final, batch_format="pyarrow")
