"""Distributed n-gram counting + model training (functions/ngrams.py).

The training-parity test is the important one: the distributed pipeline
(combiner → lang-keyed groupby → per-language finalize) must produce
BIT-identical (hash, freq) arrays to the single-process trainer
``models.train_language`` — same counts by additivity, same float ops in
the same order in the finalize.
"""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from lingua_ray.functions.ngrams import (char_ngram_count_local,
                                         char_ngram_topk,
                                         finalize_language_model,
                                         ngram_hash_count_local,
                                         train_distributed)
from lingua_ray.models import MAX_N, train_language

EN = ["Hello world, this is a tiny training corpus!",
      "the quick brown fox", "jumps over the lazy dog many times",
      "short", "the the the repeated words here"]
DE = ["Der schnelle braune Fuchs", "springt über den faulen Hund",
      "hallo welt wie geht es dir"]


def _table(texts, langs):
    return pa.table({"text": texts, "lang": langs})


def test_char_ngram_combiner_matches_naive():
    texts = ["hello world", "héllo wörld", "日本語のテキスト", "", "ab", None]
    langs = ["en", "de", "ja", "en", "en", "de"]
    out = char_ngram_count_local(_table(texts, langs), n=3)
    naive = Counter()
    for t, l in zip(texts, langs):
        t = t or ""
        for i in range(len(t) - 2):
            naive[(l, t[i:i + 3])] += 1
    got = {(l, g): n for l, g, n in zip(out.column("lang").to_pylist(),
                                        out.column("ngram").to_pylist(),
                                        out.column("cnt").to_pylist())}
    assert got == dict(naive)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_char_ngram_combiner_orders(n):
    out = char_ngram_count_local(_table(["abcabc"], ["xx"]), n=n)
    total = sum(out.column("cnt").to_pylist())
    assert total == 6 - n + 1


def test_char_ngram_empty_batch():
    empty = _table([], []).cast(pa.schema([("text", pa.string()),
                                           ("lang", pa.string())]))
    out = char_ngram_count_local(empty, n=3)
    assert out.num_rows == 0
    assert out.column_names == ["lang", "ngram", "cnt"]


def test_char_ngram_topk_dataset(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_table(EN + DE, ["en"] * len(EN)
                                    + ["de"] * len(DE)))
    out = char_ngram_topk(ds, n=3, k=5).take_all()
    by_lang = Counter(r["lang"] for r in out)
    assert by_lang == {"en": 5, "de": 5}
    # deterministic tie-break: counts non-increasing, ngram asc within ties
    for lang in ("en", "de"):
        rows = [r for r in out if r["lang"] == lang]
        key = [(-r["cnt"], r["ngram"]) for r in rows]
        assert key == sorted(key)


def test_train_distributed_bit_identical(ray_session):
    import ray.data
    ref = train_language(EN)
    rows = ([{"text": t, "lang": "en"} for t in EN]
            + [{"text": t, "lang": "de"} for t in DE])
    # interleave languages and force multiple blocks so combining is real
    rows = rows[::2] + rows[1::2]
    ds = ray.data.from_items(rows).repartition(3)
    import ray as _ray
    blocks = [b for b in _ray.get(train_distributed(ds).to_arrow_refs())
              if b.num_columns]  # drop Ray's schema-less empty blocks
    out = pa.concat_tables(blocks)
    en = out.filter(pa.compute.equal(out.column("lang"), "en"))
    ns = en.column("n").to_numpy()
    for n in range(1, MAX_N + 1):
        m = ns == n
        hashes = np.asarray(en.column("hash").to_numpy(
            zero_copy_only=False))[m].astype(np.uint64)
        freqs = en.column("freq").to_numpy()[m]
        ref_keys, ref_freqs = ref[n]
        assert np.array_equal(hashes, ref_keys), f"n={n} hash mismatch"
        assert np.array_equal(freqs, ref_freqs), f"n={n} freq mismatch"


def test_hash_count_combiner_empty_and_nulls():
    empty = _table([], []).cast(pa.schema([("text", pa.string()),
                                           ("lang", pa.string())]))
    out = ngram_hash_count_local(empty)
    assert out.num_rows == 0
    out2 = ngram_hash_count_local(_table([None, "123 456"], ["en", "en"]))
    # no letters anywhere -> no valid windows at any n
    assert out2.num_rows == 0


def test_finalize_unigram_freqs_sum_to_one():
    part = ngram_hash_count_local(_table(EN, ["en"] * len(EN)))
    model = finalize_language_model(part)
    m = model.column("n").to_numpy() == 1
    freqs = model.column("freq").to_numpy()[m].astype(np.float64)
    assert abs(freqs.sum() - 1.0) < 1e-6
