"""Frozen golden confidence vectors.

Ports the spirit of the reference's pinned confidence tests
(``src/test/kotlin/.../api/LanguageDetector_Test.kt:56-146``): exact
top-5 (language, confidence) outputs for 10 texts under BOTH accuracy
modes, computed ONCE from the scalar oracle and committed as literals.
Both the oracle and the vectorized kernel must reproduce them — a silent
regression that drifts kernel AND oracle together can no longer pass
unnoticed (round-1 verdict, "What's missing" #2).

Values are a property of the repo's trained models (conditional-frequency
semantics, models/v2); retraining with different corpus data invalidates
them by design.
"""

import numpy as np
import pytest

from lingua_ray import constants as C
from lingua_ray import models as M
from lingua_ray import reference_impl as ref
from lingua_ray.kernel import Detector, DetectorConfig

LONG_EN = ("The language detector engine processes one hundred terabytes of "
           "conversational transcripts per day and must remain accurate, "
           "deterministic and fast at every scale it encounters.")

# (text, low_accuracy) -> top-5 (iso1, confidence), descending
GOLDEN = {
    ("languages are awesome", False): [("en", 1.0), ("ca", 0.9387467443653227), ("tr", 0.9165205543531809), ("xh", 0.9064871283790968), ("st", 0.9056556264206899)],
    ("languages are awesome", True): [("ro", 1.0), ("en", 0.990680511232781), ("vi", 0.9838645396439504), ("nl", 0.9701095931835364), ("da", 0.9648257105712195)],
    ("Ich wohne in Berlin", False): [("de", 1.0), ("nl", 0.8614903801711953), ("en", 0.8229206645808951), ("it", 0.8142443537272662), ("yo", 0.8063106817951572)],
    ("Ich wohne in Berlin", True): [("de", 1.0), ("nl", 0.8235580069584036), ("da", 0.7733028588829539), ("it", 0.7466485434785068), ("ga", 0.6971342063954515)],
    ("bonjour tout le monde", False): [("fr", 1.0), ("de", 0.9001954042163266), ("eu", 0.856956281385774), ("en", 0.8459869131140494), ("nl", 0.829300832355841)],
    ("bonjour tout le monde", True): [("fr", 1.0), ("de", 0.9474683860201033), ("xh", 0.898543660113472), ("eo", 0.863764400213961), ("hu", 0.8554737955786328)],
    ("to be or not to be that is the question", False): [("en", 1.0), ("ca", 0.8636010761926111), ("fr", 0.8608600964490633), ("la", 0.8095145866865614), ("it", 0.7824315860439056)],
    ("to be or not to be that is the question", True): [("en", 1.0), ("ca", 0.7629881109461268), ("fr", 0.7094348283292792), ("ro", 0.6803853065444067), ("eo", 0.6532062158940587)],
    ("上海大学是一个好大学", False): [("zh", 1.0)],
    ("上海大学是一个好大学", True): [("zh", 1.0)],
    ("ヴェダイヤモンド", False): [("ja", 1.0)],
    ("ヴェダイヤモンド", True): [("ja", 1.0)],
    ("Это предложение написано на русском языке", False): [("ru", 1.0), ("sr", 0.8127691061412773), ("bg", 0.7625989762902601), ("uk", 0.693495854069481), ("mk", 0.675839506197894)],
    ("Это предложение написано на русском языке", True): [("ru", 1.0), ("sr", 0.9618752811461415), ("mk", 0.6946471114358658), ("bg", 0.6811457615463848), ("uk", 0.649438986257701)],
    ("apenaŭ", False): [("eo", 1.0)],
    ("apenaŭ", True): [("eo", 1.0)],
    ("Alter", False): [("de", 1.0), ("la", 0.9449981045144004), ("sv", 0.9414831061767797), ("nb", 0.8974440806227582), ("nl", 0.8957368336292395)],
    ("Alter", True): [("de", 1.0), ("da", 0.7944610285312826), ("nb", 0.7353300362224452), ("eo", 0.6803232964141724), ("sv", 0.6737498658737364)],
    (LONG_EN, False): [("en", 1.0), ("la", 0.9650264219414563), ("es", 0.9245120825552675), ("ca", 0.9172775250531238), ("fr", 0.902818193639238)],
    (LONG_EN, True): [("en", 1.0), ("la", 0.9650264219414563), ("es", 0.9245120825552675), ("ca", 0.9172775250531238), ("fr", 0.902818193639238)],
}


@pytest.fixture(scope="module")
def lookup():
    M.ensure_models()
    return M.NgramModels().freq_of_str


@pytest.mark.parametrize("key", list(GOLDEN), ids=lambda k: f"{k[0][:16]}-"
                         f"{'low' if k[1] else 'high'}")
def test_oracle_matches_golden(lookup, key):
    text, low = key
    got = ref.compute_confidence_values(text, lookup, low_accuracy=low)[:5]
    want = GOLDEN[key]
    assert [C.ISO1_CODES[i] for i, _ in got] == [lang for lang, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12), text


@pytest.mark.parametrize("low", [False, True], ids=["high", "low"])
def test_kernel_matches_golden(low):
    M.ensure_models()
    det = Detector(M.NgramModels(), DetectorConfig(low_accuracy=low))
    texts = [t for (t, lo) in GOLDEN if lo == low]
    res = det.detect(texts, with_matrix=True)
    m = res["conf_matrix"]
    for row, text in enumerate(texts):
        want = GOLDEN[(text, low)]
        nz = np.flatnonzero(m[row])
        order = nz[np.lexsort((nz, -m[row][nz]))][:5]
        assert [C.ISO1_CODES[i] for i in order] == [l for l, _ in want], text
        for i, (_, w) in zip(order, want):
            assert m[row][i] == pytest.approx(w, rel=1e-9), text
