"""DSIR importance resampling — semantics beyond the DuckDB parity gate:
the selection must actually PREFER target-looking documents."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus():
    """60 docs: ids 0-19 talk like the target (distinctive vocabulary),
    ids 20-59 use disjoint background vocabulary.  Target marker rows are
    a SUBSET of the target-vocab docs (ids 0-9), so selection generalizes
    to unmarked lookalikes (ids 10-19)."""
    rows = []
    for i in range(60):
        vocab = (["quantum", "proof", "theorem", "lemma"] if i < 20
                 else ["weather", "recipe", "football", "gossip"])
        text = " ".join(vocab[(i + j) % 4] for j in range(30))
        rows.append({"doc_id": i, "lang": "en" if i < 10 else "xx",
                     "text": text})
    return rows


def test_dsir_prefers_target_lookalikes(ray_session, corpus):
    import ray.data

    from lingua_ray.stages.dsir import dsir_select

    ds = ray.data.from_items(corpus)
    picked = dsir_select(ds, "lang", "en", k=20)
    ids = sorted(picked.column("doc_id").to_pylist())
    # all 20 selected docs are from the target-vocabulary half,
    # including the unmarked lookalikes
    assert ids == list(range(20))


def test_dsir_partitioning_invariant(ray_session, corpus):
    import ray.data

    from lingua_ray.stages.dsir import dsir_select

    a = dsir_select(ray.data.from_items(corpus), "lang", "en", k=15)
    b = dsir_select(ray.data.from_items(corpus).repartition(7),
                    "lang", "en", k=15)
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    assert np.allclose(a.column("dsir_score").to_numpy(),
                       b.column("dsir_score").to_numpy())


def test_nb_classifier_learns_separable_labels(ray_session, corpus):
    """Disjoint vocabularies are perfectly separable: every doc must be
    classified to its vocabulary family's majority label, and accuracy
    on the training set must be 100% for the distinctive halves."""
    import ray.data

    from lingua_ray.stages.nbayes import nb_classify

    rows = [{"doc_id": r["doc_id"],
             "lang": "tech" if r["doc_id"] < 20 else "chat",
             "text": r["text"]} for r in corpus]
    out = nb_classify(ray.data.from_items(rows), "lang").to_pandas()
    assert (out["hit"] == 1).all()


def test_nb_partitioning_invariant(ray_session, corpus):
    import ray.data

    from lingua_ray.stages.nbayes import nb_classify

    a = nb_classify(ray.data.from_items(corpus), "lang").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = nb_classify(ray.data.from_items(corpus).repartition(9),
                    "lang").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
