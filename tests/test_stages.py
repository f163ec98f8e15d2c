"""Unit tests for the stateless stages (no Ray needed — plain Arrow tables)."""

import numpy as np
import pyarrow as pa
import pytest

from lingua_ray.stages.keep import keep_batch
from lingua_ray.stages.quality import quality_batch
from lingua_ray.stages.scrub import scrub_batch


def _t(texts):
    return pa.table({"text": pa.array(texts, type=pa.large_string())})


def test_scrub_email_ip_ssn_cc_phone():
    out = scrub_batch(_t([
        "mail foo.bar+x@example.co.uk now",
        "ping 10.0.0.1 and 192.168.1.255.",
        "ssn is 123-45-6789 ok",
        "card 4111 1111 1111 1111 thanks",
        "call +4915123456789 or (555) 123-4567 or 555-123-4567",
        "clean text with no pii at all",
    ]))
    scrubbed = out.column("scrubbed_text").to_pylist()
    assert scrubbed[0] == "mail <EMAIL> now"
    assert scrubbed[1] == "ping <IP> and <IP>."
    assert scrubbed[2] == "ssn is <SSN> ok"
    assert scrubbed[3] == "card <CC> thanks"
    assert scrubbed[4] == "call <PHONE> or <PHONE> or <PHONE>"
    assert scrubbed[5] == "clean text with no pii at all"
    assert out.column("pii_email").to_pylist()[0] == 1
    assert out.column("pii_ip").to_pylist()[1] == 2
    assert out.column("pii_ssn").to_pylist()[2] == 1
    assert out.column("pii_cc").to_pylist()[3] == 1
    assert out.column("pii_phone").to_pylist()[4] == 3


def test_scrub_is_pure_function_of_text():
    texts = ["a foo@bar.com b", "no pii", "10.1.2.3"]
    a = scrub_batch(_t(texts)).column("scrubbed_text").to_pylist()
    b = scrub_batch(_t(list(reversed(texts)))).column("scrubbed_text").to_pylist()
    assert a == list(reversed(b))


def test_tox_count():
    out = scrub_batch(_t(["you stupid idiot", "what the hell", "nice day",
                          "HELL and Hate"]))
    assert out.column("tox_count").to_pylist() == [2, 1, 0, 2]


def test_quality_metrics():
    out = quality_batch(_t([
        "one two three four five",
        "ab",
        "a a a a a a a a a a a a a a a a a a a a a a a a a a a a b c",
        "12345 67890 11 22 33",
    ]))
    assert out.column("n_words").to_pylist() == [5, 1, 30, 5]
    assert out.column("n_chars").to_pylist()[1] == 2
    flags = out.column("quality_flags").to_pylist()
    assert flags[0] == 0
    assert flags[1] & 1  # too few words
    assert flags[2] & 32  # low distinct
    assert flags[3] & 16  # high digit


def test_keep_decision():
    t = pa.table({
        "lang": ["en", "un", "en", "en", "en"],
        "quality_flags": pa.array([0, 0, 1, 0, 0], type=pa.int32()),
        "ppl": pa.array([10.0, 10.0, 10.0, float("nan"), 10.0]),
        "tox_count": pa.array([0, 0, 0, 0, 2], type=pa.int32()),
    })
    keep = keep_batch(t).column("keep").to_pylist()
    assert keep == [True, False, False, False, False]


def test_quality_null_text():
    out = quality_batch(pa.table({"text": pa.array([None, "ok text here"],
                                                   type=pa.large_string())}))
    assert out.column("n_chars").to_pylist() == [0, 12]


def test_langid_confidences_column():
    """`confidences` list column: ≤k entries, descending score, enum-order
    tie-break — row-for-row equal to the kernel's confidence_values()
    (reference semantics: api/LanguageDetector.kt:194-217 sorted map,
    EnumDoubleMap.kt:97-128 tie-break)."""
    from lingua_ray import constants as C
    from lingua_ray.stages.langid import LangIdScorer

    texts = ["languages are awesome", "Ich wohne in Berlin",
             "上海大学是一个好大学", "", "???", "bonjour tout le monde",
             "À×"]
    scorer = LangIdScorer(with_ppl=False, top_k_confidences=5)
    out = scorer(pa.table({"text": pa.array(texts, type=pa.string())}))
    confs = out.column("confidences").to_pylist()
    iso = list(C.ISO1_CODES)
    for text, row in zip(texts, confs):
        want = scorer.detector.confidence_values(text)[:5]
        got = [(iso.index(e["lang"]), e["score"]) for e in row]
        assert got == [(i, pytest.approx(s)) for i, s in want], text
        scores = [e["score"] for e in row]
        assert scores == sorted(scores, reverse=True)
        # tie-break: equal scores appear in language enum order
        for a, b in zip(got, got[1:]):
            if a[1] == b[1]:
                assert a[0] < b[0]


def test_langid_confidences_empty_batch():
    from lingua_ray.stages.langid import LangIdScorer
    scorer = LangIdScorer(with_ppl=False, top_k_confidences=3)
    out = scorer(pa.table({"text": pa.array([], type=pa.string())}))
    assert out.num_rows == 0
    assert "confidences" in out.column_names


def test_word_counts_topk_cutoff_and_ties(ray_session):
    import ray.data
    from lingua_ray.functions.textstats import word_counts_topk
    # 30 distinct words; w00 appears 31x, w01 30x, ...; ties at every
    # count between zz-prefixed pairs to exercise the (n desc, word asc)
    # tie-break across block boundaries
    texts = []
    for i in range(30):
        texts.extend([f"w{i:02d}"] * (31 - i))
    texts.extend(["zza zzb"] * 7)
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(6)
    out = word_counts_topk(ds, k=5)
    assert out.column("word").to_pylist() == \
        ["w00", "w01", "w02", "w03", "w04"]
    assert out.column("n").to_pylist() == [31, 30, 29, 28, 27]
    # ties: zza/zzb both 7 — word asc order
    full = word_counts_topk(ds, k=100)
    words = full.column("word").to_pylist()
    assert words.index("zza") + 1 == words.index("zzb")


def test_stopword_ratio_batch():
    from lingua_ray.stages.quality import stopword_ratio_batch
    t = pa.table({"text": pa.array(
        ["the cat is on the mat", "zxq qqq", "", None, "The THE the"],
        type=pa.string())})
    out = stopword_ratio_batch(t)
    assert out.column("n_stopwords").to_pylist() == [4, 0, 0, 0, 3]
    assert out.column("n_words_total").to_pylist() == [6, 2, 1, 1, 3]
    empty = stopword_ratio_batch(t.slice(0, 0))
    assert empty.num_rows == 0


def test_gopher_signals_each_rule():
    from lingua_ray.stages.quality import gopher_signals_batch
    good = ("the cat runs with great speed and that hound have chased "
            "them over long miles " * 4).strip()          # all rules pass
    short = "the be words here"                           # < min_words
    tiny_words = ("a b c d e f g h i j " * 6).strip()     # mean len < 3
    longw = " ".join(["the", "be"] + ["x" * 40] * 58)     # mean len > 10
    symbols = ("the be " + "# " * 20 + "word " * 40).strip()  # sym ratio
    numeric = " ".join(["the", "be"] + ["123"] * 58)      # alpha frac
    nostop = ("cat dog bird fish lion tiger bear wolf " * 8).strip()
    t = pa.table({"doc_id": pa.array(range(7), pa.int64()),
                  "text": pa.array([good, short, tiny_words, longw,
                                    symbols, numeric, nostop])})
    out = gopher_signals_batch(t, min_words=50, min_req_stopwords=2)
    keep = out.column("gopher_keep").to_pylist()
    assert keep == [1, 0, 0, 0, 0, 0, 0]
    # scalar oracle for the integer signals
    import re
    for row in out.to_pylist():
        words = t.column("text")[row["doc_id"]].as_py().split(" ")
        assert row["n_words"] == len(words)
        assert row["n_alpha_words"] == sum(
            1 for w in words if re.search("[A-Za-z]", w))
        req = {"the", "be", "to", "of", "and", "that", "have", "with"}
        assert row["n_req_stopwords"] == len(
            {w.lower() for w in words} & req)
        txt = t.column("text")[row["doc_id"]].as_py()
        assert row["n_symbols"] == txt.count("#") + txt.count("…")


def test_gopher_signals_null_and_ellipsis():
    from lingua_ray.stages.quality import gopher_signals_batch
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([None, "the be word… more…"])})
    out = gopher_signals_batch(t)
    assert out.column("n_words").to_pylist() == [1, 4]
    assert out.column("n_symbols").to_pylist() == [0, 2]
    assert out.column("gopher_keep").to_pylist() == [0, 0]
