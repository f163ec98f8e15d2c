"""Heuristic quality rules (Gopher/C4-style), stateless ``map_batches`` fn.

All metrics are defined with integer arithmetic (or exact integer-ratio
comparisons) so the DuckDB oracle SQL in ``__ray_entry__`` reproduces them
bit-for-bit.  Appends:

* ``n_chars``  — codepoint count
* ``n_words``  — single-space split token count (empties included)
* ``n_alpha``  — ASCII letter count
* ``n_digits`` — ASCII digit count
* ``n_distinct_words`` — distinct tokens
* ``quality_flags`` — bitmask, 0 = passes all rules
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..chartables import encode_batch
from .util import set_column

QUALITY_FLAG_NAMES = {
    1: "too_few_words",        # space-script: n_words < 3; CJK: n_chars < 3
    2: "too_long",             # n_chars > 20000
    4: "bad_mean_word_len",    # space-script only: word-chars < n_words or > 12*n_words
    8: "low_letter",           # 2*(n_alpha + n_logograms) < n_chars
    16: "high_digit",          # 10*n_digits > 3*n_chars
    32: "low_distinct",        # space-script only: n_words >= 10, 10*distinct < 3*n_words
}

# Word-based rules are meaningless for space-free logographic scripts; a row
# is "CJK-dominant" when logogram chars are at least half its chars, and the
# word-count rules are replaced by a plain char-count floor.  Logogram ranges
# are fixed codepoint intervals (identical in NumPy and DuckDB's RE2) so the
# oracle stays bit-exact: CJK Unified (+ext A), Hiragana/Katakana, Hangul.
LOGOGRAM_RANGES = ((0x3040, 0x30FF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF),
                   (0xAC00, 0xD7A3))
LOGOGRAM_RE_CLASS = (r"[^\x{3040}-\x{30FF}\x{3400}-\x{4DBF}"
                     r"\x{4E00}-\x{9FFF}\x{AC00}-\x{D7A3}]")

_ASCII_ALPHA = np.zeros(0x110000, dtype=bool)
_ASCII_ALPHA[ord("A"): ord("Z") + 1] = True
_ASCII_ALPHA[ord("a"): ord("z") + 1] = True
_ASCII_DIGIT = np.zeros(0x110000, dtype=bool)
_ASCII_DIGIT[ord("0"): ord("9") + 1] = True
_IS_LOGOGRAM_Q = np.zeros(0x110000, dtype=bool)
for _lo, _hi in LOGOGRAM_RANGES:
    _IS_LOGOGRAM_Q[_lo: _hi + 1] = True


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    texts = ["" if t is None else t for t in texts]
    n = len(texts)

    cps, offsets = encode_batch(texts)
    row_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    n_chars = np.diff(offsets).astype(np.int64)
    n_alpha = np.bincount(row_id[_ASCII_ALPHA[cps]], minlength=n).astype(np.int64)
    n_digits = np.bincount(row_id[_ASCII_DIGIT[cps]], minlength=n).astype(np.int64)
    n_spaces = np.bincount(row_id[cps == 0x20], minlength=n).astype(np.int64)
    n_logograms = np.bincount(
        row_id[_IS_LOGOGRAM_Q[cps]], minlength=n).astype(np.int64)

    n_words = np.empty(n, dtype=np.int64)
    n_distinct = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n_words[i] = len(toks)
        n_distinct[i] = len(set(toks))

    word_chars = n_chars - n_spaces
    cjk = 2 * n_logograms >= n_chars
    cjk &= n_chars > 0
    flags = np.zeros(n, dtype=np.int32)
    flags |= np.where(np.where(cjk, n_chars < 3, n_words < 3),
                      1, 0).astype(np.int32)
    flags |= np.where(n_chars > 20000, 2, 0).astype(np.int32)
    flags |= np.where(~cjk & ((word_chars < n_words)
                              | (word_chars > 12 * n_words)),
                      4, 0).astype(np.int32)
    flags |= np.where(2 * (n_alpha + n_logograms) < n_chars,
                      8, 0).astype(np.int32)
    flags |= np.where(10 * n_digits > 3 * n_chars, 16, 0).astype(np.int32)
    flags |= np.where(~cjk & (n_words >= 10)
                      & (10 * n_distinct < 3 * n_words),
                      32, 0).astype(np.int32)

    for name, arr, typ in (
        ("n_chars", n_chars, pa.int64()),
        ("n_words", n_words, pa.int64()),
        ("n_alpha", n_alpha, pa.int64()),
        ("n_digits", n_digits, pa.int64()),
        ("n_logograms", n_logograms, pa.int64()),
        ("n_distinct_words", n_distinct, pa.int64()),
        ("quality_flags", flags, pa.int32()),
    ):
        batch = set_column(batch, name, pa.array(arr, type=typ))
    return batch
