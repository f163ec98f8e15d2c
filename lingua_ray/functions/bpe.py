"""Distributed BPE (byte-pair-encoding) tokenizer training and encoding.

The reference trains character-n-gram frequency models
(``GenerateLanguageModelsTask.kt:145-199``); BPE merge training is the
subword analogue every modern training-data pipeline needs (token budgets,
packing lengths, tokenizer refreshes).  Semantics are the classic merge
rule: repeatedly replace the most frequent adjacent symbol pair with a new
symbol, greedy left-to-right within a word, never across word boundaries.

Ray-Data-first architecture — the key scale fact is that BPE training has
exactly ONE corpus-scale pass:

* **Word counting** (corpus-bounded): per-batch combiner emits distinct
  ``(word, n)`` partials — one row per distinct word per batch, never per
  token — then ONE ``groupby("word").sum`` shuffle.  Same combiner-first
  pattern as :func:`~.textstats.word_counts_topk`.
* **Merge loop** (vocabulary-bounded): runs over the word-frequency table,
  which is bounded by the distinct-word vocabulary, not the corpus — the
  compression every production BPE trainer (SentencePiece, HF tokenizers)
  relies on.  ``min_count`` / ``max_words`` prune what the driver holds at
  web scale; a dropped word can perturb any pair count by less than
  ``min_count × len(word)``, and the noise tail (URLs, hex ids) it drops
  is exactly what BPE should not learn merges from.  The loop itself is
  fully vectorized: all words live in one flat int32 symbol array with a
  parallel word-id array; each iteration counts adjacent pairs via
  ``np.unique`` + frequency-weighted ``np.bincount``, picks the winner
  with a deterministic tie-break (count desc, then lexicographic
  ``(left, right)``), and applies the merge with boolean masks — no Python
  loop over words or tokens anywhere in training.
* **Encoding** is an actor-pool stage (:class:`BpeEncoder`): the merge
  table ships once via ``ray.put``, the rank dict is built in
  ``__init__``, and each batch tokenizes with the RE2 pre-tokenizer then
  encodes only the batch's *distinct* words through an actor-lifetime
  cache — per-token Python work is amortized to per-distinct-word, which
  is Zipf-bounded in practice.

Pre-tokenization uses :data:`~.textstats.TOKEN_PATTERN` (alnum runs or
single non-space symbols) so token counts line up with the ``doc_tokens``
query family; merges never cross a word boundary.  Training stops early
when no adjacent pair occurs twice (a count-1 merge is noise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import TOKEN_PATTERN

_SEP = "\x1f"


def tokenize_rows(col: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Per-row token lists, fully in Arrow: wrap every RE2 token match in
    unit separators, split on the separator, drop the gap fragments
    (which are all-space by construction — every non-space char is
    matched by :data:`TOKEN_PATTERN`)."""
    col = pc.fill_null(col, "")
    marked = pc.replace_substring_regex(col, TOKEN_PATTERN,
                                        _SEP + r"\0" + _SEP)
    parts = pc.split_pattern(marked, _SEP)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.flatten()
    keep = pc.invert(pc.match_substring_regex(flat, r"^ *$"))
    keep_np = keep.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = parts.offsets.to_numpy(zero_copy_only=False)
    n_parts = offs[1:] - offs[:-1]
    n_rows = len(n_parts)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), n_parts)
    kept_per_row = np.bincount(row_of, weights=keep_np, minlength=n_rows)
    new_offs = np.concatenate([[0], np.cumsum(kept_per_row)])
    kept = flat.filter(keep)
    if isinstance(kept, pa.ChunkedArray):
        kept = kept.combine_chunks()
    # int32 offsets: a single Arrow batch holds < 2^31 tokens by
    # construction (blocks are size-bounded upstream)
    return pa.ListArray.from_arrays(
        pa.array(new_offs.astype(np.int32), pa.int32()), kept)


# --------------------------------------------------------------------------
# Stage 1 — distributed word counting (the only corpus-scale pass)
# --------------------------------------------------------------------------

def word_count_partial(batch: pa.Table, text_col: str = "text",
                       lowercase: bool = False) -> pa.Table:
    """Per-batch combiner: distinct (word, n) counts for one batch."""
    col = pc.fill_null(batch.column(text_col), "")
    if lowercase:
        col = pc.utf8_lower(col)
    words = tokenize_rows(col).flatten()
    vc = words.value_counts()
    if len(vc) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return pa.table({"word": vc.field("values"),
                     "n": pc.cast(vc.field("counts"), pa.int64())})


def word_freq_table(ds, text_col: str = "text", *, lowercase: bool = False,
                    min_count: int = 1, max_words: int | None = None
                    ) -> tuple[list[str], np.ndarray]:
    """Corpus word-frequency table: combiner → ONE groupby sum → driver.

    Returns ``(words, counts)`` sorted (count desc, word asc) — an order
    independent of partitioning.  ``min_count`` / ``max_words`` bound the
    driver-side table at web scale (module docstring has the error
    argument)."""
    partial = ds.map_batches(word_count_partial, batch_format="pyarrow",
                             fn_kwargs={"text_col": text_col,
                                        "lowercase": lowercase})
    rows = partial.groupby("word").sum("n").take_all()
    if not rows:
        return [], np.zeros(0, np.int64)
    order = sorted(range(len(rows)),
                   key=lambda i: (-rows[i]["sum(n)"], rows[i]["word"]))
    words = [rows[i]["word"] for i in order]
    counts = np.array([rows[i]["sum(n)"] for i in order], dtype=np.int64)
    if min_count > 1:
        keep = counts >= min_count
        words = [w for w, k in zip(words, keep) if k]
        counts = counts[keep]
    if max_words is not None and len(words) > max_words:
        words, counts = words[:max_words], counts[:max_words]
    return words, counts


# --------------------------------------------------------------------------
# Stage 2 — vectorized merge loop over the (bounded) word table
# --------------------------------------------------------------------------

MERGES_SCHEMA = pa.schema([("rank", pa.int64()), ("left", pa.string()),
                           ("right", pa.string()),
                           ("merged", pa.string()), ("n", pa.int64())])


def train_bpe_from_freqs(words: list[str], counts: np.ndarray,
                         num_merges: int) -> pa.Table:
    """Learn ``num_merges`` BPE merges from a word-frequency table.

    Fully vectorized (see module docstring).  Overlapping-run semantics
    match the classic dict implementation: pair counting counts every
    adjacent position (``aaa`` contributes 2 to ``(a, a)``), application
    is greedy left-to-right (``aaaa`` → ``aa aa``).  Tie-break: count
    desc, then lexicographic (left, right) — bit-identical to the scalar
    oracle in ``tests/test_bpe.py``.

    Returns ``(rank, left, right, merged, n)`` with ``n`` the pair's
    frequency at merge time."""
    if not words or num_merges <= 0:
        return MERGES_SCHEMA.empty_table()

    symtab: list[str] = sorted({c for w in words for c in w})
    sym_id: dict[str, int] = {c: i for i, c in enumerate(symtab)}
    char_cps = np.array([ord(c) for c in symtab], dtype=np.uint32)
    lens = np.array([len(w) for w in words], dtype=np.int64)
    cps = np.frombuffer("".join(words).encode("utf-32-le"), dtype=np.uint32)
    sym = np.searchsorted(char_cps, cps).astype(np.int32)
    word_of = np.repeat(np.arange(len(words), dtype=np.int32), lens)
    wfreq = np.asarray(counts, dtype=np.int64)

    ranks: list[int] = []
    lefts: list[str] = []
    rights: list[str] = []
    mergeds: list[str] = []
    ns: list[int] = []

    for rank in range(num_merges):
        if len(sym) < 2:
            break
        adj = word_of[:-1] == word_of[1:]
        if not adj.any():
            break
        li = sym[:-1][adj].astype(np.uint64)
        ri = sym[1:][adj].astype(np.uint64)
        keys = (li << np.uint64(32)) | ri
        uniq, inv = np.unique(keys, return_inverse=True)
        w = wfreq[word_of[:-1][adj]]
        pair_n = np.bincount(inv, weights=w.astype(np.float64)).astype(
            np.int64)
        best_n = int(pair_n.max())
        if best_n < 2:
            break
        cand = np.flatnonzero(pair_n == best_n)
        l_str, r_str = min(
            (symtab[int(uniq[c] >> np.uint64(32))],
             symtab[int(uniq[c] & np.uint64(0xFFFFFFFF))]) for c in cand)
        l_id, r_id = sym_id[l_str], sym_id[r_str]
        merged = l_str + r_str
        new_id = sym_id.get(merged)
        if new_id is None:
            new_id = len(symtab)
            sym_id[merged] = new_id
            symtab.append(merged)

        m = np.zeros(len(sym), dtype=bool)
        m[:-1] = (sym[:-1] == l_id) & (sym[1:] == r_id) & adj
        idx = np.flatnonzero(m)
        if l_id == r_id and len(idx) > 1:
            # greedy-left within each consecutive run: keep alternating
            gaps = np.diff(idx) > 1
            run_id = np.concatenate([[0], np.cumsum(gaps)])
            run_start = np.concatenate([[0], np.flatnonzero(gaps) + 1])
            pos_in_run = np.arange(len(idx)) - run_start[run_id]
            idx = idx[pos_in_run % 2 == 0]
        sym[idx] = new_id
        keep = np.ones(len(sym), dtype=bool)
        keep[idx + 1] = False
        sym = sym[keep]
        word_of = word_of[keep]

        ranks.append(rank)
        lefts.append(l_str)
        rights.append(r_str)
        mergeds.append(merged)
        ns.append(best_n)

    return pa.table({"rank": pa.array(ranks, pa.int64()),
                     "left": pa.array(lefts, pa.string()),
                     "right": pa.array(rights, pa.string()),
                     "merged": pa.array(mergeds, pa.string()),
                     "n": pa.array(ns, pa.int64())}, schema=MERGES_SCHEMA)


def train_bpe(ds, text_col: str = "text", *, num_merges: int = 200,
              lowercase: bool = False, min_count: int = 1,
              max_words: int | None = None) -> pa.Table:
    """End-to-end BPE training: distributed word count → vectorized merges."""
    words, counts = word_freq_table(ds, text_col, lowercase=lowercase,
                                    min_count=min_count, max_words=max_words)
    return train_bpe_from_freqs(words, counts, num_merges)


# --------------------------------------------------------------------------
# Stage 3 — encoding actors (merges broadcast once, cache per actor)
# --------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE encode of one word: repeatedly apply the lowest-rank
    learned pair everywhere in the word (greedy left-to-right) until no
    learned pair remains."""
    parts = list(word)
    while len(parts) > 1:
        best_rank = None
        best_pair = None
        for ab in zip(parts, parts[1:]):
            r = ranks.get(ab)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, ab
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


class BpeEncoder:
    """Actor-pool stage: per-document BPE token counts.

    ``merges`` arrives as a ``ray.put`` handle (shipped to each actor
    once); the rank dict and the word→length cache live for the actor
    lifetime, so the Python encode loop runs once per *distinct* word the
    actor ever sees, not per token."""

    def __init__(self, merges_ref, text_col: str = "text",
                 lowercase: bool = False) -> None:
        import ray
        merges = (ray.get(merges_ref)
                  if isinstance(merges_ref, ray.ObjectRef) else merges_ref)
        self.ranks = {(l, r): int(k) for k, l, r in zip(
            merges.column("rank").to_pylist(),
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist())}
        self.text_col = text_col
        self.lowercase = lowercase
        self._cache: dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        n = self._cache.get(w)
        if n is None:
            n = len(encode_word(w, self.ranks))
            self._cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(self.text_col), "")
        if self.lowercase:
            col = pc.utf8_lower(col)
        toks = tokenize_rows(col)
        flat = toks.flatten()
        lens = {w: self._word_len(w) for w in pc.unique(flat).to_pylist()}
        tok_lens = np.array([lens[w] for w in flat.to_pylist()],
                            dtype=np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        n_toks = (offs[1:] - offs[:-1]).astype(np.int64)
        row_of = np.repeat(np.arange(len(n_toks), dtype=np.int64), n_toks)
        sums = np.bincount(row_of, weights=tok_lens,
                           minlength=len(n_toks)).astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bpe_tokens": pa.array(sums, pa.int64()),
                         "n_words": pa.array(n_toks, pa.int64())})


def bpe_token_counts(ds, merges: pa.Table, text_col: str = "text", *,
                     lowercase: bool = False, concurrency=None):
    """Apply learned merges to a corpus: (doc_id, n_bpe_tokens, n_words)."""
    import ray
    ref = ray.put(merges)
    return ds.map_batches(BpeEncoder, batch_format="pyarrow",
                          fn_constructor_kwargs={
                              "merges_ref": ref, "text_col": text_col,
                              "lowercase": lowercase},
                          concurrency=concurrency or (1, 8))
