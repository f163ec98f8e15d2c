"""Scalar (per-string) transcription of the reference detection algorithm.

This is the *semantic oracle*: a direct, unoptimized Python rendering of the
reference's detection pipeline (``api/LanguageDetector.kt:223-295``), used by
the test suite to validate the vectorized NumPy kernel
(:mod:`lingua_ray.kernel`) row-for-row.  It is intentionally slow and must
never run in the Ray hot path.

Pipeline per text (reference line references):

1. cleanUpInputText                         — LanguageDetector.kt:319-327
2. empty / no-letter guard                  — :228-230
3. WordList on the *raw* text               — :232
4. detectLanguageWithRules                  — :376-473
5. filterLanguagesByRules                   — :475-543
6. ngram range choice (long text → n=3)     — :246-257
7. per-(n, language) log-probability sums
   with prefix backoff 5→4→3→2→1           — :593-659
8. logogram-language boost ×0.85            — :577-586
9. unigram-count division                   — :334-371
10. confidence = max_sum / sum, sorted desc — :288-294
11. argmax with tie → UNKNOWN               — :121-135
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import regex

from . import constants as C
from .chartables import IS_LOGOGRAM, SCRIPT_ID

_NUM_PUNCT_RE = regex.compile(r"[\p{N}\p{P}]")
_JAVA_SPACE_RE = regex.compile(r"[ \t\n\x0b\f\r]+")
_TRIM_CHARS = "".join(map(chr, range(0x21)))
_LETTER_RE = regex.compile(r"\p{L}")

_CHAR_TO_LANGS: dict[str, tuple[int, ...]] = {}
for _chars, _names in C.CHARS_TO_LANGUAGES.items():
    _idx = tuple(C.LANG_INDEX[n] for n in _names)
    for _ch in _chars:
        _CHAR_TO_LANGS[_ch] = _idx

_HAN = C.SCRIPT_INDEX["HAN"]
_JAPANESE_SCRIPT_IDS = {C.SCRIPT_INDEX[s] for s in C.JAPANESE_SCRIPTS}
_LATIN_CYR_DEV = {
    C.SCRIPT_INDEX["LATIN"], C.SCRIPT_INDEX["CYRILLIC"], C.SCRIPT_INDEX["DEVANAGARI"]
}
_CHINESE = C.LANG_INDEX["CHINESE"]
_JAPANESE = C.LANG_INDEX["JAPANESE"]
_LOGOGRAM_LANGS = {C.LANG_INDEX[n] for n in C.LANGUAGES_SUPPORTING_LOGOGRAMS}


def clean_up(text: str) -> str:
    t = text.strip(_TRIM_CHARS).lower()
    t = _NUM_PUNCT_RE.sub("", t)
    return _JAVA_SPACE_RE.sub(" ", t)


def word_list(text: str) -> list[str]:
    """WordList.build: split at ' ' and around logograms (WordList.kt:18-80)."""
    words: list[str] = []
    start = None
    for i, ch in enumerate(text):
        if ch == " ":
            if start is not None:
                words.append(text[start:i])
                start = None
        elif _is_logogram(ch):
            if start is not None:
                words.append(text[start:i])
            words.append(ch)
            start = None
        else:
            if start is None:
                start = i
    if start is not None:
        words.append(text[start:])
    return words


def _is_logogram(ch: str) -> bool:
    return bool(IS_LOGOGRAM[ord(ch)])


def _script(ch: str) -> int:
    return int(SCRIPT_ID[ord(ch)])


def _top_two(counts: dict[int, float]) -> list[tuple[int, float]]:
    """Entries sorted by value desc, key (declaration order) asc."""
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def detect_language_with_rules(words: list[str],
                               languages: set[int]) -> int:
    """LanguageDetector.kt:376-473.  Returns language index or C.UNKNOWN."""
    adjusted_word_count = 0.0
    total: dict[int, float] = {}

    for word in words:
        word_counts: dict[int, int] = {}
        for ch in word:
            sid = _script(ch)
            script_name = C.ALL_SCRIPTS[sid] if sid < C.NUM_SCRIPTS else None
            alpha_lang = (
                C.SCRIPTS_SUPPORTING_EXACTLY_ONE_LANGUAGE.get(script_name)
                if script_name else None
            )
            # The script→language map is filtered to the configured languages
            # at construction (LanguageDetector.kt:84-89).
            if alpha_lang is not None and alpha_lang not in languages:
                alpha_lang = None
            if alpha_lang is not None:
                word_counts[alpha_lang] = word_counts.get(alpha_lang, 0) + 1
            elif sid == _HAN:
                word_counts[_CHINESE] = word_counts.get(_CHINESE, 0) + 1
            elif sid in _JAPANESE_SCRIPT_IDS:
                word_counts[_JAPANESE] = word_counts.get(_JAPANESE, 0) + 1
            elif sid in _LATIN_CYR_DEV:
                # Unique-char languages are likewise filtered to the
                # configured set (LanguageDetector.kt:81-83).
                for li in C.LANGUAGES_WITH_UNIQUE_CHARS:
                    if li in languages and ch in C.UNIQUE_CHARS[li]:
                        word_counts[li] = word_counts.get(li, 0) + 1

        word_value = C.FULL_WORD_VALUE
        if len(word_counts) == 0:
            total[C.UNKNOWN] = total.get(C.UNKNOWN, 0.0) + word_value
        elif len(word_counts) == 1:
            lang = next(iter(word_counts))
            if lang in languages:
                if len(word) == 1 and _is_logogram(word):
                    word_value = C.LOGOGRAM_WORD_VALUE
                total[lang] = total.get(lang, 0.0) + word_value
            else:
                total[C.UNKNOWN] = total.get(C.UNKNOWN, 0.0) + word_value
        else:
            ordered = _top_two(word_counts)
            (lang0, c0), (_, c1) = ordered[0], ordered[1]
            if c0 > c1 and lang0 in languages:
                total[lang0] = total.get(lang0, 0.0) + word_value
            else:
                total[C.UNKNOWN] = total.get(C.UNKNOWN, 0.0) + word_value
        adjusted_word_count += word_value

    if total.get(C.UNKNOWN, 0.0) < 0.4 * adjusted_word_count:
        total.pop(C.UNKNOWN, None)
    total = {k: v for k, v in total.items() if v != 0.0}

    if not total:
        return C.UNKNOWN
    if len(total) == 1:
        return next(iter(total))
    if len(total) == 2 and _CHINESE in total and _JAPANESE in total:
        return _JAPANESE
    ordered = _top_two(total)
    (lang0, v0), (_, v1) = ordered[0], ordered[1]
    if v1 / v0 > 0.8:
        return C.UNKNOWN
    return lang0


def filter_languages_by_rules(words: list[str], languages: set[int]) -> set[int]:
    """LanguageDetector.kt:475-543.  Returns the candidate language set."""
    adjusted_word_count = 0.0
    alphabet_counts: dict[int, float] = {}

    for word in words:
        word_value = C.FULL_WORD_VALUE
        scripts = {_script(ch) for ch in word}
        if len(scripts) == 1:
            sid = next(iter(scripts))
            if sid < C.NUM_SCRIPTS:
                if len(word) == 1 and _is_logogram(word):
                    word_value = C.LOGOGRAM_WORD_VALUE
                alphabet_counts[sid] = alphabet_counts.get(sid, 0.0) + word_value
        adjusted_word_count += word_value

    if not alphabet_counts:
        return set(languages)

    ordered = sorted(alphabet_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    top_count = ordered[0][1]
    kept_scripts = {ordered[0][0]}
    for sid, cnt in ordered[1:]:
        if cnt / top_count >= 0.8:
            kept_scripts.add(sid)
        else:
            break

    filtered = {
        li for li in languages
        if any(C.SCRIPT_INDEX[s] in kept_scripts for s in C.LANG_SCRIPTS[li])
    }

    lang_counts: dict[int, int] = {}
    for word in words:
        to_count = set(filtered)
        for ch in word:
            for li in _CHAR_TO_LANGS.get(ch, ()):
                if li in to_count:
                    to_count.discard(li)
                    lang_counts[li] = lang_counts.get(li, 0) + 1

    half = adjusted_word_count / 2.0
    subset = (
        {li for li, cnt in lang_counts.items() if cnt >= half} if half > 0 else set()
    )
    if subset:
        return filtered & subset
    return filtered


def extract_ngrams(cleaned: str, n: int) -> list[str]:
    """TestDataLanguageModel.fromText: distinct letter-only windows, in order."""
    seen: dict[str, None] = {}
    i = 0
    next_letter_check = 0
    while i <= len(cleaned) - n:
        ok = True
        while next_letter_check < i + n:
            if not _LETTER_RE.match(cleaned[next_letter_check]):
                next_letter_check += 1
                i = next_letter_check
                ok = False
                break
            next_letter_check += 1
        if not ok:
            continue
        seen[cleaned[i: i + n]] = None
        i += 1
    return list(seen)


FreqLookup = Callable[[int, str], float]
"""(lang_index, ngram_string) -> relative frequency (0.0 when absent)."""


def sum_ngram_log_probs(ngrams: list[str], lang: int, lookup: FreqLookup) -> float:
    """Backoff scoring — LanguageDetector.kt:593-659 (prefix backoff n→1)."""
    total = 0.0
    for ngram in ngrams:
        g = ngram
        while g:
            freq = lookup(lang, g)
            if freq > 0:
                total += float(np.log(np.float64(freq)))
                break
            g = g[:-1]
    return total


def compute_confidence_values(
    text: str,
    lookup: FreqLookup,
    languages: set[int] | None = None,
    low_accuracy: bool = False,
) -> list[tuple[int, float]]:
    """Full per-text pipeline; returns [(lang_idx, confidence)] sorted desc."""
    if languages is None:
        languages = set(range(C.NUM_LANGUAGES))
    cleaned = clean_up(text)
    if not cleaned or not _LETTER_RE.search(cleaned):
        return []

    words = word_list(text)
    rule_lang = detect_language_with_rules(words, languages)
    if rule_lang != C.UNKNOWN:
        return [(rule_lang, 1.0)]

    filtered = filter_languages_by_rules(words, languages)
    if len(filtered) == 1:
        return [(next(iter(filtered)), 1.0)]

    if low_accuracy and len(cleaned) < 3:
        return []

    is_long = len(cleaned) >= C.HIGH_ACCURACY_MODE_MAX_TEXT_LENGTH
    ngram_sizes = [3] if (is_long or low_accuracy) else [1, 2, 3, 4, 5]
    ngram_sizes = [n for n in ngram_sizes if len(cleaned) >= n]

    sums: dict[int, float] = {}
    unigram_counts: dict[int, int] = {}
    for n in ngram_sizes:
        ngrams = extract_ngrams(cleaned, n)
        for lang in filtered:
            s = sum_ngram_log_probs(ngrams, lang, lookup)
            if s < 0.0:
                if lang in _LOGOGRAM_LANGS:
                    s *= 0.85
                sums[lang] = sums.get(lang, 0.0) + s
        if n == 1:
            for lang in filtered:
                cnt = sum(1 for g in ngrams if lookup(lang, g) > 0)
                if cnt:
                    unigram_counts[lang] = cnt

    totals: dict[int, float] = {}
    for lang in filtered:
        s = sums.get(lang, 0.0)
        cnt = unigram_counts.get(lang, 0)
        if cnt:
            s = s / cnt
        if s != 0.0:
            totals[lang] = s

    if not totals:
        return []
    highest = max(totals.values())
    confidences = {lang: highest / v for lang, v in totals.items()}
    return _top_two(confidences)


def detect_language(
    text: str,
    lookup: FreqLookup,
    languages: set[int] | None = None,
    minimum_relative_distance: float = 0.0,
    low_accuracy: bool = False,
) -> int:
    values = compute_confidence_values(text, lookup, languages, low_accuracy)
    if not values:
        return C.UNKNOWN
    if len(values) == 1:
        return values[0][0]
    (lang0, v0), (_, v1) = values[0], values[1]
    if v0 == v1:
        return C.UNKNOWN
    if (v0 - v1) < minimum_relative_distance:
        return C.UNKNOWN
    return lang0
