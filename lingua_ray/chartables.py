"""Frozen codepoint → property lookup tables.

The reference consults JVM Unicode tables per char (``Character.UnicodeScript.of``,
``Character.isLetter``, regex classes ``\\p{N}|\\p{P}`` — reference
``internal/Constant.kt:162-165``, ``api/LanguageDetector.kt:319-327``).  We bake the
equivalent data into dense NumPy arrays once (via the public ``regex`` module's
Unicode property support) and cache them to an ``.npz`` artifact so every Ray
actor loads them in milliseconds.  All rule-engine kernels are then pure NumPy
gathers over these tables — no per-char Python in the hot path.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from . import constants as C

_DATA_DIR = Path(__file__).resolve().parent / "data"
_CACHE = _DATA_DIR / "chartables.npz"
_MAX_CP = 0x110000
# Accent-char lookup tables only need to span the BMP ranges the constants use.
MASK_TABLE_SIZE = 0x2000

_JAVA_SCRIPT_TO_UNICODE = {
    "LATIN": "Latin", "CYRILLIC": "Cyrillic", "ARABIC": "Arabic",
    "ARMENIAN": "Armenian", "BENGALI": "Bengali", "DEVANAGARI": "Devanagari",
    "ETHIOPIC": "Ethiopic", "GEORGIAN": "Georgian", "GREEK": "Greek",
    "GUJARATI": "Gujarati", "GURMUKHI": "Gurmukhi", "HAN": "Han",
    "HANGUL": "Hangul", "HEBREW": "Hebrew", "HIRAGANA": "Hiragana",
    "KATAKANA": "Katakana", "SINHALA": "Sinhala", "TAMIL": "Tamil",
    "TELUGU": "Telugu", "THAI": "Thai",
}


def _all_codepoint_chunks() -> list[tuple[int, str]]:
    """(start_codepoint, string_of_consecutive_codepoints) chunks, skipping surrogates."""
    return [
        (0, "".join(map(chr, range(0, 0xD800)))),
        (0xE000, "".join(map(chr, range(0xE000, _MAX_CP)))),
    ]


def _mark(table: np.ndarray, pattern, chunks, value) -> None:
    for start, chunk in chunks:
        for m in pattern.finditer(chunk):
            table[start + m.start(): start + m.end()] = value


def _build() -> dict[str, np.ndarray]:
    import regex  # public PyPI module with Unicode property classes

    chunks = _all_codepoint_chunks()

    script_id = np.full(_MAX_CP, C.SCRIPT_NONE, dtype=np.uint8)
    for name in C.ALL_SCRIPTS:
        uni = _JAVA_SCRIPT_TO_UNICODE[name]
        pat = regex.compile(rf"[\p{{Script={uni}}}]+")
        _mark(script_id, pat, chunks, C.SCRIPT_INDEX[name])

    is_letter = np.zeros(_MAX_CP, dtype=bool)
    _mark(is_letter, regex.compile(r"\p{L}+"), chunks, True)

    is_num_punct = np.zeros(_MAX_CP, dtype=bool)
    _mark(is_num_punct, regex.compile(r"[\p{N}\p{P}]+"), chunks, True)

    # Java regex \s (no UNICODE_CHARACTER_CLASS) = ASCII [ \t\n\x0B\f\r].
    is_java_regex_space = np.zeros(_MAX_CP, dtype=bool)
    for cp in (0x20, 0x09, 0x0A, 0x0B, 0x0C, 0x0D):
        is_java_regex_space[cp] = True

    # Java Character.isWhitespace: Zs/Zl/Zp except NBSP family, plus controls.
    is_java_whitespace = np.zeros(_MAX_CP, dtype=bool)
    _mark(is_java_whitespace, regex.compile(r"[\p{Zs}\p{Zl}\p{Zp}]+"), chunks, True)
    for cp in (0x00A0, 0x2007, 0x202F):
        is_java_whitespace[cp] = False
    for cp in (0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F):
        is_java_whitespace[cp] = True

    # Logogram chars: scripts of CJK languages, excluding whitespace
    # (CharExtensions.kt:32-39).
    logogram_script_ids = [C.SCRIPT_INDEX[s] for s in C.SCRIPTS_WITH_LOGOGRAMS]
    is_logogram = np.isin(script_id, logogram_script_ids) & ~is_java_whitespace

    # Accent char → candidate-language bitmask (Constant.kt:77-140).
    charlang = np.zeros((MASK_TABLE_SIZE, 2), dtype=np.uint64)
    for chars, lang_names in C.CHARS_TO_LANGUAGES.items():
        mask = C.langs_to_mask(C.LANG_INDEX[n] for n in lang_names)
        for ch in chars:
            assert ord(ch) < MASK_TABLE_SIZE
            charlang[ord(ch)] = mask

    # Unique-character → owning-language bitmask (Language.kt uniqueCharacters).
    uniq = np.zeros((MASK_TABLE_SIZE, 2), dtype=np.uint64)
    for i, uchars in enumerate(C.UNIQUE_CHARS):
        if not uchars:
            continue
        for ch in uchars:
            assert ord(ch) < MASK_TABLE_SIZE
            uniq[ord(ch), i >> 6] |= np.uint64(1 << (i & 63))

    return {
        "script_id": script_id,
        "is_letter": is_letter,
        "is_num_punct": is_num_punct,
        "is_java_regex_space": is_java_regex_space,
        "is_java_whitespace": is_java_whitespace,
        "is_logogram": is_logogram,
        "charlang": charlang,
        "uniq": uniq,
    }


def _load() -> dict[str, np.ndarray]:
    if _CACHE.exists():
        with np.load(_CACHE) as z:
            return {k: z[k] for k in z.files}
    tables = _build()
    _DATA_DIR.mkdir(parents=True, exist_ok=True)
    tmp = _DATA_DIR / f"chartables.tmp.{os.getpid()}.npz"
    np.savez_compressed(tmp, **tables)
    os.replace(tmp, _CACHE)
    return tables


_T = _load()

SCRIPT_ID: np.ndarray = _T["script_id"]
IS_LETTER: np.ndarray = _T["is_letter"]
IS_NUM_PUNCT: np.ndarray = _T["is_num_punct"]
IS_JAVA_REGEX_SPACE: np.ndarray = _T["is_java_regex_space"]
IS_JAVA_WHITESPACE: np.ndarray = _T["is_java_whitespace"]
IS_LOGOGRAM: np.ndarray = _T["is_logogram"]
CHARLANG_MASK: np.ndarray = _T["charlang"]      # (0x2000, 2) uint64
UNIQUE_CHAR_MASK: np.ndarray = _T["uniq"]       # (0x2000, 2) uint64


def encode_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """List of strings → (concatenated int32 codepoint array, int64 offsets).

    ``offsets`` has ``len(texts) + 1`` entries; row *i* spans
    ``codepoints[offsets[i]:offsets[i+1]]``.  One C-level UTF-32 encode for the
    whole batch — no per-char Python.
    """
    joined = "".join(texts)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    lengths = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return cps, offsets
