"""Token counting and document fingerprinting — stateless batch functions.

Both are defined so a DuckDB oracle reproduces them exactly:
* ``n_tokens`` uses an RE2 pattern evaluated by ``pyarrow.compute`` (RE2)
  and by DuckDB ``regexp_extract_all`` (RE2) — identical engines.
* ``fingerprint`` is ``md5(text)`` — identical in hashlib and DuckDB.

``fingerprint64`` additionally provides the rolling-hash 64-bit fingerprint
used internally for exact dedup at scale (no SQL analogue).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..models import HASH_MULT
from ..stages.util import set_column

# BPE-ish pre-tokenization: word pieces OR single non-space symbols.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    col = pc.fill_null(batch.column(text_col), "")
    n_tokens = pc.cast(pc.count_substring_regex(col, TOKEN_PATTERN), pa.int64())
    ws = pc.cast(pc.count_substring_regex(col, r"[^ ]+"), pa.int64())
    batch = set_column(batch, "n_tokens", n_tokens)
    batch = set_column(batch, "n_ws_tokens", ws)
    return batch


def _fingerprint64(text: str) -> np.uint64:
    h = 14695981039346656037  # FNV-1a offset basis
    m = int(HASH_MULT)
    for b in text.encode("utf-8"):
        h = ((h ^ b) * m) & 0xFFFFFFFFFFFFFFFF
    return np.uint64(h)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = ["" if t is None else t for t in batch.column(text_col).to_pylist()]
    md5 = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    f64 = np.array([_fingerprint64(t) for t in texts], dtype=np.uint64)
    batch = set_column(batch, "fingerprint", pa.array(md5, type=pa.string()))
    batch = set_column(batch, 
        "fingerprint64", pa.array(f64.view(np.int64), type=pa.int64()))
    return batch
