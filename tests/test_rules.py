"""Rule-engine conformance tests, ported verbatim from the reference suite
(``src/test/kotlin/.../api/LanguageDetectorTest.kt:102-535``).  Pure data —
no Ray, no models."""

import pytest

from lingua_ray import constants as C
from lingua_ray import reference_impl as ref

ALL = set(range(C.NUM_LANGUAGES))


def test_cleanup_golden():
    # LanguageDetectorTest.kt:102-118
    text = (
        "Weltweit    gibt es ungefähr 6.000 Sprachen,\n"
        "wobei laut Schätzungen zufolge ungefähr 90  Prozent davon\n"
        "am Ende dieses Jahrhunderts verdrängt sein werden."
    )
    expected = (
        "weltweit gibt es ungefähr sprachen wobei laut schätzungen zufolge "
        "ungefähr prozent davon am ende dieses jahrhunderts verdrängt sein werden"
    )
    assert ref.clean_up(text) == expected


RULE_CASES = [
    ("məhərrəm", "AZERBAIJANI"), ("substituïts", "CATALAN"),
    ("rozdělit", "CZECH"), ("tvořen", "CZECH"), ("subjektů", "CZECH"),
    ("nesufiĉecon", "ESPERANTO"), ("intermiksiĝis", "ESPERANTO"),
    ("monaĥinoj", "ESPERANTO"), ("kreitaĵoj", "ESPERANTO"),
    ("ŝpinante", "ESPERANTO"), ("apenaŭ", "ESPERANTO"),
    ("groß", "GERMAN"), ("σχέδια", "GREEK"),
    ("fekvő", "HUNGARIAN"), ("meggyűrűzni", "HUNGARIAN"),
    ("ヴェダイヤモンド", "JAPANESE"),
    ("әлем", "KAZAKH"), ("шаруашылығы", "KAZAKH"), ("ақын", "KAZAKH"),
    ("оның", "KAZAKH"), ("шұрайлы", "KAZAKH"),
    ("teoloģiska", "LATVIAN"), ("blaķene", "LATVIAN"),
    ("ceļojumiem", "LATVIAN"), ("numuriņu", "LATVIAN"),
    ("mergelės", "LITHUANIAN"), ("įrengus", "LITHUANIAN"),
    ("slegiamų", "LITHUANIAN"),
    ("припаѓа", "MACEDONIAN"), ("ѕидови", "MACEDONIAN"),
    ("ќерка", "MACEDONIAN"), ("џамиите", "MACEDONIAN"),
    ("मिळते", "MARATHI"),
    ("үндсэн", "MONGOLIAN"), ("дөхөж", "MONGOLIAN"),
    ("zmieniły", "POLISH"), ("państwowych", "POLISH"),
    ("mniejszości", "POLISH"), ("groźne", "POLISH"),
    ("ialomiţa", "ROMANIAN"),
    ("наслеђивања", "SERBIAN"), ("неисквареношћу", "SERBIAN"),
    ("podĺa", "SLOVAK"), ("pohľade", "SLOVAK"), ("mŕtvych", "SLOVAK"),
    ("ґрунтовому", "UKRAINIAN"), ("пропонує", "UKRAINIAN"),
    ("пристрої", "UKRAINIAN"),
    ("cằm", "VIETNAMESE"), ("thần", "VIETNAMESE"), ("chẳng", "VIETNAMESE"),
    ("quẩy", "VIETNAMESE"), ("sẵn", "VIETNAMESE"), ("nhẫn", "VIETNAMESE"),
    ("dắt", "VIETNAMESE"), ("chất", "VIETNAMESE"), ("đạp", "VIETNAMESE"),
    ("mặn", "VIETNAMESE"), ("hậu", "VIETNAMESE"), ("hiền", "VIETNAMESE"),
    ("lẻn", "VIETNAMESE"), ("biểu", "VIETNAMESE"), ("kẽm", "VIETNAMESE"),
    ("diễm", "VIETNAMESE"), ("phế", "VIETNAMESE"), ("việc", "VIETNAMESE"),
    ("chỉnh", "VIETNAMESE"), ("trĩ", "VIETNAMESE"), ("ravị", "VIETNAMESE"),
    ("thơ", "VIETNAMESE"), ("nguồn", "VIETNAMESE"), ("thờ", "VIETNAMESE"),
    ("sỏi", "VIETNAMESE"), ("tổng", "VIETNAMESE"), ("nhở", "VIETNAMESE"),
    ("mỗi", "VIETNAMESE"), ("bỡi", "VIETNAMESE"), ("tốt", "VIETNAMESE"),
    ("giới", "VIETNAMESE"), ("một", "VIETNAMESE"), ("hợp", "VIETNAMESE"),
    ("hưng", "VIETNAMESE"), ("từng", "VIETNAMESE"), ("của", "VIETNAMESE"),
    ("sử", "VIETNAMESE"), ("cũng", "VIETNAMESE"), ("những", "VIETNAMESE"),
    ("chức", "VIETNAMESE"), ("dụng", "VIETNAMESE"), ("thực", "VIETNAMESE"),
    ("kỳ", "VIETNAMESE"), ("kỷ", "VIETNAMESE"), ("mỹ", "VIETNAMESE"),
    ("mỵ", "VIETNAMESE"),
    ("aṣiwèrè", "YORUBA"), ("ṣaaju", "YORUBA"),
    ("والموضوع", "UNKNOWN"), ("сопротивление", "UNKNOWN"), ("house", "UNKNOWN"),
]

ALPHABET_CASES = [
    ("ունենա", "ARMENIAN"), ("জানাতে", "BENGALI"), ("გარეუბან", "GEORGIAN"),
    ("σταμάτησε", "GREEK"), ("ઉપકરણોની", "GUJARATI"), ("בתחרויות", "HEBREW"),
    ("びさ", "JAPANESE"), ("대결구도가", "KOREAN"), ("ਮੋਟਰਸਾਈਕਲਾਂ", "PUNJABI"),
    ("துன்பங்களை", "TAMIL"), ("కృష్ణదేవరాయలు", "TELUGU"),
    ("ในทางหลวงหมายเลข", "THAI"),
]


@pytest.mark.parametrize("word,expected", RULE_CASES + ALPHABET_CASES)
def test_detect_language_with_rules(word, expected):
    got = ref.detect_language_with_rules(ref.word_list(word), ALL)
    got_name = C.LANGUAGE_NAMES[got] if got != C.UNKNOWN else "UNKNOWN"
    assert got_name == expected


FILTER_CASES = [
    ("والموضوع", ["ARABIC", "PERSIAN", "URDU"]),
    ("сопротивление", ["BELARUSIAN", "BULGARIAN", "KAZAKH", "MACEDONIAN",
                       "MONGOLIAN", "RUSSIAN", "SERBIAN", "UKRAINIAN"]),
    ("раскрывае", ["BELARUSIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"]),
    ("этот", ["BELARUSIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"]),
    ("огнём", ["BELARUSIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"]),
    ("плаваща", ["BULGARIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN", "UKRAINIAN"]),
    ("довършат", ["BULGARIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"]),
    ("павінен", ["BELARUSIAN", "KAZAKH", "UKRAINIAN"]),
    ("затоплување", ["MACEDONIAN", "SERBIAN"]),
    ("ректасцензија", ["MACEDONIAN", "SERBIAN"]),
    ("набљудувач", ["MACEDONIAN", "SERBIAN"]),
    ("aizklātā", ["LATVIAN", "MAORI", "YORUBA"]),
    ("sistēmas", ["LATVIAN", "MAORI", "YORUBA"]),
    ("palīdzi", ["LATVIAN", "MAORI", "YORUBA"]),
    ("nhẹn", ["VIETNAMESE", "YORUBA"]),
    ("chọn", ["VIETNAMESE", "YORUBA"]),
    ("prihvaćanju", ["BOSNIAN", "CROATIAN", "POLISH"]),
    ("nađete", ["BOSNIAN", "CROATIAN", "VIETNAMESE"]),
    ("visão", ["PORTUGUESE", "VIETNAMESE"]),
    ("wystąpią", ["LITHUANIAN", "POLISH"]),
    ("budowę", ["LITHUANIAN", "POLISH"]),
    ("nebūsime", ["LATVIAN", "LITHUANIAN", "MAORI", "YORUBA"]),
    ("afişate", ["AZERBAIJANI", "ROMANIAN", "TURKISH"]),
    ("kradzieżami", ["POLISH", "ROMANIAN"]),
    ("înviat", ["FRENCH", "ROMANIAN"]),
    ("venerdì", ["ITALIAN", "VIETNAMESE", "YORUBA"]),
    ("años", ["BASQUE", "SPANISH"]),
    ("rozohňuje", ["CZECH", "SLOVAK"]),
    ("rtuť", ["CZECH", "SLOVAK"]),
    ("pregătire", ["ROMANIAN", "VIETNAMESE"]),
    ("jeďte", ["CZECH", "ROMANIAN", "SLOVAK"]),
    ("minjaverðir", ["ICELANDIC", "TURKISH"]),
    ("þagnarskyldu", ["ICELANDIC", "TURKISH"]),
    ("nebûtu", ["FRENCH", "HUNGARIAN"]),
    ("hashemidëve", ["AFRIKAANS", "ALBANIAN", "DUTCH", "FRENCH"]),
    ("forêt", ["AFRIKAANS", "FRENCH", "PORTUGUESE", "VIETNAMESE"]),
    ("succèdent", ["FRENCH", "ITALIAN", "VIETNAMESE", "YORUBA"]),
    ("où", ["FRENCH", "ITALIAN", "VIETNAMESE", "YORUBA"]),
    ("tõeliseks", ["ESTONIAN", "HUNGARIAN", "PORTUGUESE", "VIETNAMESE"]),
    ("viòiem", ["CATALAN", "ITALIAN", "VIETNAMESE", "YORUBA"]),
    ("contrôle", ["FRENCH", "PORTUGUESE", "SLOVAK", "VIETNAMESE"]),
    ("direktør", ["BOKMAL", "DANISH", "NYNORSK"]),
    ("vývoj", ["CZECH", "ICELANDIC", "SLOVAK", "TURKISH", "VIETNAMESE"]),
    ("päralt", ["ESTONIAN", "FINNISH", "GERMAN", "SLOVAK", "SWEDISH"]),
    ("labâk", ["FRENCH", "PORTUGUESE", "ROMANIAN", "TURKISH", "VIETNAMESE"]),
    ("pràctiques", ["CATALAN", "FRENCH", "ITALIAN", "PORTUGUESE", "VIETNAMESE"]),
    ("überrascht", ["AZERBAIJANI", "CATALAN", "ESTONIAN", "GERMAN",
                    "HUNGARIAN", "SPANISH", "TURKISH"]),
    ("indebærer", ["BOKMAL", "DANISH", "ICELANDIC", "NYNORSK"]),
    ("måned", ["BOKMAL", "DANISH", "NYNORSK", "SWEDISH"]),
    ("zaručen", ["BOSNIAN", "CZECH", "CROATIAN", "LATVIAN", "LITHUANIAN",
                 "SLOVAK", "SLOVENE"]),
    ("zkouškou", ["BOSNIAN", "CZECH", "CROATIAN", "LATVIAN", "LITHUANIAN",
                  "SLOVAK", "SLOVENE"]),
    ("navržen", ["BOSNIAN", "CZECH", "CROATIAN", "LATVIAN", "LITHUANIAN",
                 "SLOVAK", "SLOVENE"]),
    ("façonnage", ["ALBANIAN", "AZERBAIJANI", "BASQUE", "CATALAN", "FRENCH",
                   "PORTUGUESE", "TURKISH"]),
    ("höher", ["AZERBAIJANI", "ESTONIAN", "FINNISH", "GERMAN", "HUNGARIAN",
               "ICELANDIC", "SWEDISH", "TURKISH"]),
    ("catedráticos", ["CATALAN", "CZECH", "ICELANDIC", "IRISH", "HUNGARIAN",
                      "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA"]),
    ("política", ["CATALAN", "CZECH", "ICELANDIC", "IRISH", "HUNGARIAN",
                  "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA"]),
    ("música", ["CATALAN", "CZECH", "ICELANDIC", "IRISH", "HUNGARIAN",
                "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA"]),
    ("contradicció", ["CATALAN", "HUNGARIAN", "ICELANDIC", "IRISH", "POLISH",
                      "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA"]),
    ("només", ["CATALAN", "CZECH", "FRENCH", "HUNGARIAN", "ICELANDIC", "IRISH",
               "ITALIAN", "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE",
               "YORUBA"]),
    ("house", ["AFRIKAANS", "ALBANIAN", "AZERBAIJANI", "BASQUE", "BOKMAL",
               "BOSNIAN", "CATALAN", "CROATIAN", "CZECH", "DANISH", "DUTCH",
               "ENGLISH", "ESPERANTO", "ESTONIAN", "FINNISH", "FRENCH",
               "GANDA", "GERMAN", "HUNGARIAN", "ICELANDIC", "INDONESIAN",
               "IRISH", "ITALIAN", "LATIN", "LATVIAN", "LITHUANIAN", "MALAY",
               "MAORI", "NYNORSK", "OROMO", "POLISH", "PORTUGUESE", "ROMANIAN",
               "SHONA", "SLOVAK", "SLOVENE", "SOMALI", "SOTHO", "SPANISH",
               "SWAHILI", "SWEDISH", "TAGALOG", "TSONGA", "TSWANA", "TURKISH",
               "VIETNAMESE", "WELSH", "XHOSA", "YORUBA", "ZULU"]),
]


@pytest.mark.parametrize("word,expected", FILTER_CASES)
def test_filter_languages_by_rules(word, expected):
    got = ref.filter_languages_by_rules(ref.word_list(word), ALL)
    assert sorted(C.LANGUAGE_NAMES[i] for i in got) == sorted(expected)


def test_wordlist_tokenization():
    # WordListTest.kt:22-29 — logograms are their own words.
    assert ref.word_list("上海大学是一个好大学 this is a sentence") == [
        "上", "海", "大", "学", "是", "一", "个", "好", "大", "学",
        "this", "is", "a", "sentence",
    ]
    assert ref.word_list("Weltweit    gibt es ungefähr 6.000 Sprachen.") == [
        "Weltweit", "gibt", "es", "ungefähr", "6.000", "Sprachen.",
    ]


def test_no_letter_texts_empty():
    for text in ["", " \n  \t;", "3<856%)§"]:
        cleaned = ref.clean_up(text)
        import regex
        assert not cleaned or not regex.search(r"\p{L}", cleaned)


def test_no_uniform_word_skips_accent_narrowing():
    """Regression (round-1 VERDICT): when NO word is script-uniform the
    reference returns the full language set early
    (``LanguageDetector.kt:494-496``) and the accent-char narrowing must
    NOT apply.  'À×' (letter + math symbol in one word) was the falsifying
    input: the kernel narrowed to VIETNAMESE while the oracle kept the
    full set and scored YORUBA."""
    from lingua_ray import models as M
    from lingua_ray.kernel import Detector

    # Scalar oracle: the candidate set stays the full set.
    got = ref.filter_languages_by_rules(ref.word_list("à×"), ALL)
    assert got == ALL

    M.ensure_models()
    det = Detector(M.NgramModels())
    texts = ["À×"]
    kernel_lang = int(det.detect(texts)["lang"][0])
    oracle_lang = ref.detect_language(texts[0], det.models.freq_of_str)
    assert kernel_lang == oracle_lang
