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
    1: "too_few_words",        # n_words < 3
    2: "too_long",             # n_chars > 20000
    4: "bad_mean_word_len",    # word-chars < n_words or > 12*n_words
    8: "low_alpha",            # 2*n_alpha < n_chars
    16: "high_digit",          # 10*n_digits > 3*n_chars
    32: "low_distinct",        # n_words >= 10 and 10*distinct < 3*n_words
}

_ASCII_ALPHA = np.zeros(0x110000, dtype=bool)
_ASCII_ALPHA[ord("A"): ord("Z") + 1] = True
_ASCII_ALPHA[ord("a"): ord("z") + 1] = True
_ASCII_DIGIT = np.zeros(0x110000, dtype=bool)
_ASCII_DIGIT[ord("0"): ord("9") + 1] = True


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

    n_words = np.empty(n, dtype=np.int64)
    n_distinct = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n_words[i] = len(toks)
        n_distinct[i] = len(set(toks))

    word_chars = n_chars - n_spaces
    flags = np.zeros(n, dtype=np.int32)
    flags |= np.where(n_words < 3, 1, 0).astype(np.int32)
    flags |= np.where(n_chars > 20000, 2, 0).astype(np.int32)
    flags |= np.where((word_chars < n_words) | (word_chars > 12 * n_words),
                      4, 0).astype(np.int32)
    flags |= np.where(2 * n_alpha < n_chars, 8, 0).astype(np.int32)
    flags |= np.where(10 * n_digits > 3 * n_chars, 16, 0).astype(np.int32)
    flags |= np.where((n_words >= 10) & (10 * n_distinct < 3 * n_words),
                      32, 0).astype(np.int32)

    for name, arr, typ in (
        ("n_chars", n_chars, pa.int64()),
        ("n_words", n_words, pa.int64()),
        ("n_alpha", n_alpha, pa.int64()),
        ("n_digits", n_digits, pa.int64()),
        ("n_distinct_words", n_distinct, pa.int64()),
        ("quality_flags", flags, pa.int32()),
    ):
        batch = set_column(batch, name, pa.array(arr, type=typ))
    return batch
