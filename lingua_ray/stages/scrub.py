"""Regex PII scrub + toxicity count, stateless ``map_batches`` fn.

Implemented entirely with ``pyarrow.compute`` RE2 kernels
(``replace_substring_regex`` / ``count_substring_regex``) — zero-copy Arrow
in, Arrow out, and *identical* regex semantics to the DuckDB oracle (also
RE2).  Patterns are ASCII-class only (``[0-9]``, not ``\\d``) so the two
engines cannot diverge on Unicode classes.

Patterns are applied in the fixed order below; each count is taken on the
text as it stands *before* that pattern's own replacement.  Scrubbed text is
therefore a pure function of the input text — byte-identical across runs,
partitions, and resumes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from .util import set_column, utf8_filled

# (column_suffix, pattern, replacement) — applied in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("cc", r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\b", "<CC>"),
    ("phone",
     r"\+[0-9]{7,15}|\([0-9]{3}\) ?[0-9]{3}[- ][0-9]{4}"
     r"|\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b|\b[0-9]{10,11}\b",
     "<PHONE>"),
]

# Demo toxicity lexicon; counted on the lowercased scrubbed text.
TOX_WORDS = ("damn", "hell", "idiot", "stupid", "hate", "kill")
TOX_PATTERN = r"\b(?:" + "|".join(TOX_WORDS) + r")\b"


# Assistant-refusal markers (counted on lowercased text) — the
# boilerplate-refusal filter an SFT/RLHF curation pass drops or
# downweights.  Apostrophe-free so the DuckDB oracle needs no quote
# escaping; RE2 in both engines.
REFUSAL_MARKERS = ("i cannot", "i am unable to", "as an ai",
                   "i apologize", "i am sorry")
REFUSAL_PATTERN = r"\b(?:" + "|".join(REFUSAL_MARKERS) + r")\b"


def refusal_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_refusal_markers`` (int64) and ``is_refusal`` (int32)."""
    lt = pc.utf8_lower(utf8_filled(batch.column(text_col)))
    n = pc.cast(pc.count_substring_regex(lt, REFUSAL_PATTERN), pa.int64())
    batch = set_column(batch, "n_refusal_markers", n)
    return set_column(batch, "is_refusal",
                      pc.cast(pc.greater(n, 0), pa.int32()))


def scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    col = utf8_filled(batch.column(text_col))
    current = col
    for suffix, pattern, replacement in PII_PATTERNS:
        count = pc.count_substring_regex(current, pattern)
        batch = set_column(batch, 
            f"pii_{suffix}", pc.cast(count, pa.int32()))
        current = pc.replace_substring_regex(current, pattern, replacement)
    tox = pc.count_substring_regex(pc.utf8_lower(current), TOX_PATTERN)
    batch = set_column(batch, "tox_count", pc.cast(tox, pa.int32()))
    batch = set_column(batch, "scrubbed_text", current)
    return batch
