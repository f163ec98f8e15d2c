"""Grouped HLL distinct-word estimates stay within sketch error of the
exact per-group counts (gates the distinct_words_by_lang_hll query)."""

import importlib.util

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_for_hll_test", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_grouped_hll_vs_exact(ray_session, tmp_path):
    rng = np.random.default_rng(55)
    langs, texts = [], []
    vocabs = {"en": 3000, "de": 800, "fr": 150}
    for lang, v in vocabs.items():
        for _ in range(400):
            words = [f"{lang}w{int(i)}" for i in
                     rng.integers(0, v, 25)]
            langs.append(lang)
            texts.append(" ".join(words))
    t = pa.table({"lang": pa.array(langs), "text": pa.array(texts)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    m = _entry()
    est = {r["lang"]: r["n_distinct_words_est"] for r in
           m.queries()["distinct_words_by_lang_hll"](
               str(tmp_path)).take_all()}
    exact = {r["lang"]: r["n_distinct_words"] for r in
             m.queries()["distinct_words_by_lang"](
                 str(tmp_path)).take_all()}
    assert set(est) == set(exact) == set(vocabs)
    for lang in vocabs:
        rel = abs(est[lang] - exact[lang]) / exact[lang]
        assert rel < 0.05, (lang, est[lang], exact[lang])
