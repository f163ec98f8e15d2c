"""BPE training/encoding vs a scalar dict-based oracle.

The oracle is the classic algorithm (count adjacent pairs weighted by
word frequency, merge the max greedy left-to-right) written the slow
obvious way; the vectorized trainer must match it merge-for-merge,
including tie-breaks and overlapping-run (``aaaa``) semantics.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from lingua_ray.functions.bpe import (
    BpeEncoder, encode_word, tokenize_rows, train_bpe_from_freqs,
    word_count_partial, word_freq_table, train_bpe, bpe_token_counts)
from lingua_ray.functions.textstats import TOKEN_PATTERN


# ---------------------------------------------------------------- oracle --

def _merge_word(parts: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def _train_scalar(words: list[str], counts: list[int], num_merges: int):
    # duplicate word entries are additive, like the real frequency table
    vocab = [(list(w), int(c)) for w, c in zip(words, counts)]
    merges = []
    for rank in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for parts, c in vocab:
            for ab in zip(parts, parts[1:]):
                pairs[ab] = pairs.get(ab, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((rank, a, b, a + b, n))
        vocab = [(_merge_word(parts, a, b), c) for parts, c in vocab]
    return merges


def _check(words, counts, num_merges=50):
    got = train_bpe_from_freqs(words, np.array(counts, np.int64),
                               num_merges).to_pylist()
    want = [{"rank": r, "left": a, "right": b, "merged": m, "n": n}
            for r, a, b, m, n in _train_scalar(words, counts, num_merges)]
    assert got == want


def test_simple_corpus_matches_oracle():
    _check(["low", "lower", "newest", "widest", "lowest"],
           [5, 2, 6, 3, 4])


def test_overlapping_runs():
    # 'aaaa' under an (a,a) merge: greedy-left keeps alternating positions
    _check(["aaaa", "aaa", "aa", "baaab"], [3, 5, 7, 2], num_merges=10)


def test_tie_break_lexicographic():
    # 'ab' and 'cd' both occur 3 times; 'ab' must merge first
    _check(["ab", "cd"], [3, 3], num_merges=4)


def test_unicode_and_singletons():
    _check(["héllo", "héllo", "wörld", "日本語", "日本語", "日本語"],
           [2, 1, 4, 1, 1, 1], num_merges=30)


def test_stops_when_no_pair_repeats():
    t = train_bpe_from_freqs(["abc", "def"], np.array([1, 1]), 10)
    assert t.num_rows == 0


def test_empty_inputs():
    assert train_bpe_from_freqs([], np.zeros(0, np.int64), 5).num_rows == 0
    assert train_bpe_from_freqs(["a"], np.array([9]), 5).num_rows == 0


def test_random_corpora_match_oracle():
    rng = np.random.default_rng(7)
    alphabet = list("abcdeé ")
    for trial in range(12):
        n_words = int(rng.integers(1, 30))
        words = list({"".join(rng.choice(alphabet[:-1],
                                         size=int(rng.integers(1, 9))))
                      for _ in range(n_words)})
        counts = [int(rng.integers(1, 20)) for _ in words]
        _check(words, counts, num_merges=int(rng.integers(1, 40)))


# ------------------------------------------------------------- tokenizer --

def test_tokenize_rows_matches_re():
    texts = ["Hello, world!", "", "  ", "a  b\tc", "日本語 x9y", None,
             "one-two  three!!"]
    got = tokenize_rows(pa.array(texts, pa.string())).to_pylist()
    pat = re.compile(TOKEN_PATTERN)
    want = [pat.findall((t or "").replace("\t", "\t")) for t in texts]
    # TOKEN_PATTERN treats only ' ' as separator; '\t' is a symbol token
    assert got == want


def test_word_count_partial_counts():
    batch = pa.table({"text": pa.array(["a b b", "b c", None])})
    t = word_count_partial(batch)
    d = {w: n for w, n in zip(t.column("word").to_pylist(),
                              t.column("n").to_pylist())}
    assert d == {"a": 1, "b": 3, "c": 1}


# -------------------------------------------------------------- encoding --

def test_encode_word_roundtrip_and_ranks():
    merges = train_bpe_from_freqs(["low", "lowest", "lower"],
                                  np.array([5, 3, 2]), 20)
    ranks = {(l, r): k for k, l, r in zip(
        merges.column("rank").to_pylist(),
        merges.column("left").to_pylist(),
        merges.column("right").to_pylist())}
    for w in ["low", "lowest", "slower", "zzz"]:
        parts = encode_word(w, ranks)
        assert "".join(parts) == w  # lossless
    # training words compress
    assert len(encode_word("low", ranks)) < 3


# ------------------------------------------------------------ end-to-end --

def test_train_bpe_distributed(ray_session):
    import ray
    texts = (["the cat sat on the mat"] * 6 + ["the dog"] * 3
             + ["catalog of dogs"] * 2)
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                       "text": texts}))
    merges = train_bpe(ds, num_merges=25)
    # oracle over the same word-frequency table
    words, counts = {}, None
    for t in texts:
        for w in re.findall(TOKEN_PATTERN, t):
            words[w] = words.get(w, 0) + 1
    items = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))
    want = [{"rank": r, "left": a, "right": b, "merged": m, "n": n}
            for r, a, b, m, n in _train_scalar(
                [w for w, _ in items], [c for _, c in items], 25)]
    assert merges.to_pylist() == want

    # partitioning invariance of the word-frequency pass
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts})).repartition(5)
    w1, c1 = word_freq_table(ds, "text")
    w2, c2 = word_freq_table(ds2, "text")
    assert w1 == w2 and list(c1) == list(c2)

    # encoding: lossless token-length accounting per doc
    counted = bpe_token_counts(ds, merges).take_all()
    by_id = {r["doc_id"]: r for r in counted}
    ranks = {(l, r): k for k, l, r in zip(
        merges.column("rank").to_pylist(),
        merges.column("left").to_pylist(),
        merges.column("right").to_pylist())}
    for i, t in enumerate(texts):
        toks = re.findall(TOKEN_PATTERN, t)
        n_bpe = sum(len(encode_word(w, ranks)) for w in toks)
        assert by_id[i]["n_words"] == len(toks)
        assert by_id[i]["n_bpe_tokens"] == n_bpe
        assert n_bpe <= sum(len(w) for w in toks)
