"""The reference's accuracyReport batch job as a Ray pipeline (SURVEY.md §3.2).

Reference flow (``build.gradle.kts:162-227``, per-language JUnit forks →
per-language txt reports → aggregated CSV): corpus file → detect per line →
confusion counts per (true, predicted, category) → accuracy percentages.

Ray flow: corpus table → ``map_batches(LangIdScorer)`` →
``groupby(true_lang, pred_lang, category).count()`` (cardinality ≤ 79×80×3 —
a tiny shuffle) → driver-side percentage math, mirroring
``AbstractLanguageDetectionAccuracyReport.kt:117-190``.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pyarrow as pa

from ..models import CORPUS_CATEGORIES, CORPUS_DIR, ensure_models
from ..stages.langid import LangIdScorer


def corpus_table(langs: tuple[str, ...] | None = None,
                 sample_per_file: int | None = None,
                 corpus_dir: Path = CORPUS_DIR) -> pa.Table:
    """FIXTURES.md §F1: (true_lang, category, line_no, text)."""
    rows_lang, rows_cat, rows_no, rows_text = [], [], [], []
    for cat in CORPUS_CATEGORIES:
        for path in sorted((corpus_dir / cat).glob("*.txt")):
            iso1 = path.stem
            if langs and iso1 not in langs:
                continue
            lines = path.read_text(encoding="utf-8").splitlines()
            if sample_per_file:
                lines = lines[:sample_per_file]
            for i, line in enumerate(lines):
                rows_lang.append(iso1)
                rows_cat.append(cat)
                rows_no.append(i)
                rows_text.append(line)
    return pa.table({
        "true_lang": pa.array(rows_lang, type=pa.string()),
        "category": pa.array(rows_cat, type=pa.string()),
        "line_no": pa.array(rows_no, type=pa.int32()),
        "text": pa.array(rows_text, type=pa.large_string()),
    })


def accuracy_confusion(langs: tuple[str, ...] | None = None,
                       sample_per_file: int | None = None,
                       low_accuracy: bool = False,
                       concurrency: int = 4):
    """Ray Dataset of (true_lang, pred_lang, category, n)."""
    import ray.data
    ensure_models()
    table = corpus_table(langs, sample_per_file)
    ds = ray.data.from_arrow(table)
    ds = ds.map_batches(
        LangIdScorer, batch_format="pyarrow", batch_size=2048,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs={"with_ppl": False,
                               "low_accuracy": low_accuracy})
    ds = ds.map_batches(
        lambda t: t.select(["true_lang", "category", "lang"])
                   .rename_columns(["true_lang", "category", "pred_lang"]),
        batch_format="pyarrow")
    return (ds.groupby(["true_lang", "pred_lang", "category"]).count()
            .rename_columns({"count()": "n"}))


def accuracy_table(confusion: pd.DataFrame) -> pd.DataFrame:
    """Per-(language, category) accuracy % + average, like the reference's
    per-language reports (AbstractLanguageDetectionAccuracyReport.kt:254-291)."""
    totals = confusion.groupby(["true_lang", "category"])["n"].sum()
    correct = (confusion[confusion.true_lang == confusion.pred_lang]
               .set_index(["true_lang", "category"])["n"])
    acc = (correct / totals * 100.0).rename("accuracy").reset_index()
    pivot = acc.pivot(index="true_lang", columns="category",
                      values="accuracy").fillna(0.0)
    pivot["average"] = pivot.mean(axis=1)
    return pivot.reset_index()


def write_report(confusion: pd.DataFrame, out_dir: str | Path) -> Path:
    """Aggregated CSV, the Ray analogue of ``writeAggregatedAccuracyReport``
    (build.gradle.kts:228-235)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    table = accuracy_table(confusion)
    path = out_dir / "aggregated-accuracy-values.csv"
    table.to_csv(path, index=False)
    return path
