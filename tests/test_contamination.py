"""Benchmark-contamination stage (stages/contamination.py)."""

import numpy as np
import pyarrow as pa

from lingua_ray.stages.contamination import (_distinct_per_row,
                                             _word_gram_hashes,
                                             benchmark_gram_hashes,
                                             contamination_check)


def _naive_grams(text: str, n: int) -> set[str]:
    ws = text.split(" ")
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def test_word_gram_hashes_counts():
    texts = ["a b c d", "x y", "", "one two three"]
    b = pa.table({"text": texts})
    h, offs = _word_gram_hashes(b, n=2, text_col="text")
    per_row = (offs[1:] - offs[:-1]).tolist()
    assert per_row == [3, 1, 0, 2]
    # identical bigram in different rows hashes identically
    b2 = pa.table({"text": ["p q", "p q"]})
    h2, _ = _word_gram_hashes(b2, n=2, text_col="text")
    assert h2[0] == h2[1]


def test_distinct_per_row():
    hashes = np.array([5, 5, 7, 7, 7, 9], dtype=np.uint64)
    offs = np.array([0, 3, 5, 6], dtype=np.int64)  # rows: [5,5,7],[7,7],[9]
    dh, counts = _distinct_per_row(hashes, offs)
    assert counts.tolist() == [2, 1, 1]
    assert sorted(dh.tolist()) == [5, 7, 7, 9]


def test_contamination_planted_overlap(ray_session):
    import ray.data
    shared = "the quick brown fox jumps over the lazy dog"
    corpus = [
        {"doc_id": 0, "text": shared + " extra tail words here"},
        {"doc_id": 1, "text": "completely different content with no "
                              "overlap whatsoever in any window at all"},
        {"doc_id": 2, "text": shared},
        {"doc_id": 3, "text": "short doc"},  # < n words -> 0 grams
    ]
    bench = [{"doc_id": 100, "text": shared}]
    out = contamination_check(ray.data.from_items(corpus),
                              ray.data.from_items(bench),
                              n=8, concurrency=2).take_all()
    by_id = {r["doc_id"]: r for r in out}
    bench_grams = _naive_grams(shared, 8)
    for r in corpus:
        grams = _naive_grams(r["text"], 8)
        assert by_id[r["doc_id"]]["n_ngrams"] == len(grams)
        assert by_id[r["doc_id"]]["n_hits"] == len(grams & bench_grams)
    assert by_id[3]["n_ngrams"] == 0 and by_id[3]["n_hits"] == 0
    assert by_id[2]["n_hits"] == by_id[2]["n_ngrams"] > 0


def test_benchmark_hashes_empty(ray_session):
    import ray.data
    bench = ray.data.from_items([{"doc_id": 0, "text": "too short"}])
    arr = benchmark_gram_hashes(bench, n=8)
    assert len(arr) == 0
    # empty benchmark -> zero hits everywhere, no crash
    corpus = ray.data.from_items(
        [{"doc_id": 1, "text": "one two three four five six seven eight"}])
    out = contamination_check(corpus, bench, n=8, concurrency=2).take_all()
    assert out[0]["n_ngrams"] == 1 and out[0]["n_hits"] == 0
