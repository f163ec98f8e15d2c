"""Per-conversation language-switch stats on a crafted multilingual
fixture — exact expected switch counts and majorities, plus the
langid-composition query's end-to-end smoke."""

import pyarrow as pa
import pytest


def test_lang_switch_stats_exact(ray_session):
    import ray.data

    from lingua_ray.stages.langstats import lang_switch_stats

    rows = [
        # conv a: en en fr en -> 2 switches, majority en (3 vs 1)
        {"conv_id": "a", "turn_idx": 0, "lang": "en"},
        {"conv_id": "a", "turn_idx": 1, "lang": "en"},
        {"conv_id": "a", "turn_idx": 2, "lang": "fr"},
        {"conv_id": "a", "turn_idx": 3, "lang": "en"},
        # conv b: de de -> 0 switches
        {"conv_id": "b", "turn_idx": 0, "lang": "de"},
        {"conv_id": "b", "turn_idx": 1, "lang": "de"},
        # conv c: ja fr -> 1 switch, tie 1-1 -> majority fr (lang asc)
        {"conv_id": "c", "turn_idx": 0, "lang": "ja"},
        {"conv_id": "c", "turn_idx": 1, "lang": "fr"},
    ]
    out = lang_switch_stats(ray.data.from_items(rows).repartition(5),
                            bucket_size=2).to_pandas() \
        .sort_values("conv_id", ignore_index=True)
    assert out["conv_id"].tolist() == ["a", "b", "c"]
    assert out["n_switches"].tolist() == [2, 0, 1]
    assert out["majority_lang"].tolist() == ["en", "de", "fr"]
    assert out["n_langs"].tolist() == [2, 1, 2]


def test_conv_lang_switches_detects_real_languages(ray_session, tmp_path):
    """Through the REAL langid kernel: unambiguous monolingual turns."""
    import ray.data

    from lingua_ray.stages.langid import LangIdScorer
    from lingua_ray.stages.langstats import lang_switch_stats

    turns = [
        ("x", 0, "the quick brown fox jumps over the lazy sleeping dog"),
        ("x", 1, "il était une fois une petite fille qui vivait dans la forêt"),
        ("x", 2, "another plain english sentence about nothing in particular"),
        ("y", 0, "日本語のテキストです。これはテストのための文章です。"),
        ("y", 1, "続けてもう一つの日本語の文を書きます。"),
    ]
    ds = ray.data.from_items(
        [{"conv_id": c, "turn_idx": i, "text": t} for c, i, t in turns])
    tagged = ds.map_batches(LangIdScorer, batch_format="pyarrow",
                            concurrency=1, num_cpus=1,
                            fn_constructor_kwargs={"with_ppl": False}) \
        .select_columns(["conv_id", "turn_idx", "lang"])
    out = lang_switch_stats(tagged).to_pandas() \
        .sort_values("conv_id", ignore_index=True)
    x = out[out.conv_id == "x"].iloc[0]
    y = out[out.conv_id == "y"].iloc[0]
    assert x.majority_lang == "en" and x.n_switches == 2 and x.n_langs == 2
    assert y.majority_lang == "ja" and y.n_switches == 0 and y.n_langs == 1
