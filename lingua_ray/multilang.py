"""Multi-language (mixed-language) section detection.

Transcription of the reference's experimental ``detectMultiLanguageOf``
(``internal/MultiLanguageDetection.kt``):

1. split text at script changes / boundary chars (quotes, colon, newlines)
   with a 3-letter minimum — ``splitPotentialSections`` (:183-242);
2. per-section rule pass (detect / filter) + adjacent same-language merge —
   ``createSectionsWithRuleBasedLanguage`` (:270-315);
3. confidence pass with short-section merging (<15 letters) —
   ``createSectionsWithConfidenceValues`` (:378-430, :462-511);
4. final adjacency merge of sections sharing high-confidence languages —
   ``internalDetectMultiLanguageOf`` / ``canMergeConfidenceSection``
   (:432-460, :513-556); min-confidence curve ``0.6 + min(1, letters/40) *
   0.38`` (:143-147).

Inherently sequential per string (merging decisions depend on lazily
computed confidences), so this runs as a per-row loop; each confidence
computation is a vectorized kernel call.  Use the ``MultiLangScorer`` stage
for Ray batches.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

import numpy as np

from . import constants as C
from .chartables import IS_LETTER, IS_LOGOGRAM, SCRIPT_ID
from .kernel import Detector

_MIN_SECTION_LENGTH = 3
_MIN_RELIABLE_LETTERS = 15
_JAPANESE_SCRIPT_IDS = {C.SCRIPT_INDEX[s] for s in C.JAPANESE_SCRIPTS}

_BOUNDARY_CHARS = set(
    ":\n\r\x0b\x0c\x85\""
    "«»‘‛“”„‟‹›⹂"
    "⌜⌝❛❜❝❞「」『』"
    "〝〞〟﹁﹂﹃﹄＂＇｢｣"
)
_APOSTROPHES = {"'", "’"}
_BOUNDARY_CATEGORIES = {"Pi", "Pf", "Zl", "Zp"}


def _is_letter(ch: str) -> bool:
    return bool(IS_LETTER[ord(ch)])


def is_potential_language_boundary(ch: str, prev: str, nxt: str) -> bool:
    """MultiLanguageDetection.kt:40-92."""
    if ch in _BOUNDARY_CHARS:
        return True
    if ch in _APOSTROPHES:
        return not (_is_letter(prev) and _is_letter(nxt))
    return unicodedata.category(ch) in _BOUNDARY_CATEGORIES


def _same_language_script(a: int, b: int) -> bool:
    return a == b or (a in _JAPANESE_SCRIPT_IDS and b in _JAPANESE_SCRIPT_IDS)


@dataclass
class _Section:
    start: int
    end: int
    letters: int
    text_full: str
    rule_langs: set[int] = field(default_factory=set)
    _conf: list[tuple[int, float]] | None = None

    @property
    def text(self) -> str:
        return self.text_full[self.start: self.end]

    def merge_with(self, other: "_Section") -> None:
        assert other.end > self.end
        self.end = other.end
        self.letters += other.letters
        self.rule_langs |= other.rule_langs
        self._conf = None

    def min_confidence(self) -> float:
        return 0.6 + min(1.0, self.letters / 40.0) * 0.38

    def contains_non_letter(self) -> bool:
        return self.letters != self.end - self.start


@dataclass
class LanguageSection:
    """Result type — mirrors LanguageDetector.LanguageSection
    (api/LanguageDetector.kt:149-172)."""
    start: int
    end: int
    letters_count: int
    section_text: str
    language: int           # language index or C.UNKNOWN
    confidence_values: list[tuple[int, float]]


def split_potential_sections(text: str) -> list[_Section]:
    sections: list[_Section] = []
    start = -1
    end = -1
    last_script = -1
    letters = 0
    has_logograms = False

    for index, ch in enumerate(text):
        cp = ord(ch)
        if IS_LETTER[cp]:
            script = int(SCRIPT_ID[cp])
            if start == -1:
                start = index
            elif ((has_logograms or letters >= _MIN_SECTION_LENGTH)
                  and last_script != -1
                  and not _same_language_script(last_script, script)):
                sections.append(_Section(start, index, letters, text))
                start = index
                letters = 0
                has_logograms = False
            end = index + 1
            last_script = script
            letters += 1
            has_logograms = has_logograms or bool(IS_LOGOGRAM[cp])
        elif (letters >= _MIN_SECTION_LENGTH and start != -1
              and is_potential_language_boundary(
                  ch,
                  text[index - 1] if index > 0 else "\x00",
                  text[index + 1] if index + 1 < len(text) else "\x00")):
            sections.append(_Section(start, end, letters, text))
            start = -1
            letters = 0
            has_logograms = False

    if start != -1:
        sections.append(_Section(start, end, letters, text))
    return sections


class MultiLanguageDetector:
    def __init__(self, detector: Detector):
        self.detector = detector
        self._languages = set(
            int(i) for i in np.flatnonzero(detector.config.languages))

    # -- confidence helper (memoized per section instance) ------------------

    def _conf(self, section: _Section) -> list[tuple[int, float]]:
        if section._conf is None:
            section._conf = self.detector.confidence_values(section.text)
        return section._conf

    def _langs_with_min_confidence(self, section: _Section) -> set[int]:
        mc = section.min_confidence()
        return {lang for lang, conf in self._conf(section) if conf >= mc}

    # -- stage 2: rule pass -------------------------------------------------

    def _rule_sections(self, text: str) -> list[_Section]:
        from .reference_impl import (detect_language_with_rules,
                                     filter_languages_by_rules, word_list)
        sections = split_potential_sections(text)
        out: list[_Section] = []
        for section in sections:
            words = word_list(section.text)
            lang = detect_language_with_rules(words, self._languages)
            if lang != C.UNKNOWN:
                langs = {lang}
            else:
                langs = filter_languages_by_rules(words, self._languages)
            prev = out[-1] if out else None
            if (len(langs) == 1 and prev is not None
                    and prev.rule_langs == langs):
                prev.merge_with(section)
            else:
                section.rule_langs = set(langs)
                out.append(section)
        return out

    # -- stage 3: confidence pass with short-section merging ----------------

    def _can_merge_rule(self, cur: _Section, other: _Section) -> bool:
        # LanguagePotentialSection.canBeMergedWith (:252-257)
        return (len(other.rule_langs) != 1
                and bool(other.rule_langs & cur.rule_langs))

    def _should_merge_short(self, cur: _Section, nxt: _Section,
                            prev_conf_section: _Section | None) -> bool:
        # shouldMergeShortRuleBasedSection (:462-511)
        if cur.letters >= _MIN_RELIABLE_LETTERS or not self._can_merge_rule(cur, nxt):
            return False
        if (nxt.letters >= _MIN_RELIABLE_LETTERS and cur.letters >= 5
                and cur.contains_non_letter()):
            # memoized on the sections: a rejected merge reuses these in
            # _confidence_sections (cur) and the next iteration (nxt);
            # merge_with invalidates, so an accepted merge recomputes
            conf = dict(self._conf(cur))
            next_conf = dict(self._conf(nxt))
            mc, mnc = cur.min_confidence(), nxt.min_confidence()
            common = [lang for lang, v in conf.items() if v > mc]
            too_low = all(next_conf.get(lang, 0.0) < mnc for lang in common)
            if too_low:
                return False
            if prev_conf_section is not None:
                prev_values = self._conf(prev_conf_section)
                next_values = sorted(next_conf.items(),
                                     key=lambda kv: (-kv[1], kv[0]))
                if next_values and prev_values:
                    next_top = next_values[0][0]
                    prev_top = prev_values[0][0]
                    return conf.get(next_top, 0.0) >= conf.get(prev_top, 0.0)
        return True

    def _confidence_sections(self, text: str) -> list[_Section]:
        sections = self._rule_sections(text)
        out: list[_Section] = []
        index = 0
        while index < len(sections):
            section = sections[index]
            if len(section.rule_langs) == 1:
                section._conf = [(next(iter(section.rule_langs)), 1.0)]
                out.append(section)
            else:
                while index < len(sections) - 1:
                    nxt = sections[index + 1]
                    prev_conf = out[-1] if out else None
                    if self._should_merge_short(section, nxt, prev_conf):
                        section.merge_with(nxt)
                        index += 1
                    else:
                        break
                self._conf(section)   # compute if not already memoized
                out.append(section)
            index += 1
        return out

    # -- stage 4: final adjacency merge -------------------------------------

    def _can_merge_conf(self, cur: _Section, prev: _Section,
                        nxt: _Section | None) -> bool:
        # canMergeConfidenceSection (:516-556)
        cur_rel = self._langs_with_min_confidence(cur)
        prev_rel = self._langs_with_min_confidence(prev)
        prev_cur = cur_rel & prev_rel
        if not prev_cur:
            return False
        if nxt is None:
            return True
        next_rel = self._langs_with_min_confidence(nxt)
        cur_next = cur_rel & next_rel
        if not cur_next:
            return True
        if prev_rel & next_rel:
            return True
        conf = dict(self._conf(cur))
        prev_avg = float(np.mean([conf.get(lang, 0.0) for lang in prev_cur]))
        next_avg = float(np.mean([conf.get(lang, 0.0) for lang in cur_next]))
        return prev_avg > next_avg

    def detect(self, text: str) -> list[LanguageSection]:
        sections = self._confidence_sections(text)
        if not sections:
            return []
        merged: list[_Section] = [sections[0]]
        for i in range(1, len(sections)):
            cur = sections[i]
            nxt = sections[i + 1] if i + 1 < len(sections) else None
            if self._can_merge_conf(cur, merged[-1], nxt):
                merged[-1].merge_with(cur)
            else:
                merged.append(cur)
        out = []
        for s in merged:
            values = self._conf(s)
            if not values:
                lang = C.UNKNOWN
            elif len(values) == 1:
                lang = values[0][0]
            else:
                (l0, v0), (_, v1) = values[0], values[1]
                if v0 == v1 or (v0 - v1) < self.detector.config.minimum_relative_distance:
                    lang = C.UNKNOWN
                else:
                    lang = l0
            out.append(LanguageSection(s.start, s.end, s.letters, s.text,
                                       lang, values))
        return out


class MultiLangScorer:
    """Actor-pool ``map_batches`` stage: appends a ``sections`` column
    (list<struct<start,end,letters,lang,score>>) per row.

    Experimental like the reference feature; per-row sequential by nature —
    use small batches and a wide actor pool for throughput.
    """

    def __init__(self, text_col: str = "text"):
        from .models import get_models
        self.ml = MultiLanguageDetector(Detector(get_models()))
        self.text_col = text_col

    def __call__(self, batch):
        import pyarrow as pa

        from .stages.util import set_column
        iso = list(C.ISO1_CODES) + [C.UNKNOWN_CODE]
        rows = []
        for t in batch.column(self.text_col).to_pylist():
            sections = self.ml.detect(t or "")
            rows.append([
                {"start": s.start, "end": s.end, "letters": s.letters_count,
                 "lang": iso[s.language],
                 "score": s.confidence_values[0][1] if s.confidence_values
                          else 0.0}
                for s in sections
            ])
        typ = pa.list_(pa.struct([
            ("start", pa.int32()), ("end", pa.int32()),
            ("letters", pa.int32()), ("lang", pa.string()),
            ("score", pa.float64()),
        ]))
        return set_column(batch, "sections", pa.array(rows, type=typ))
