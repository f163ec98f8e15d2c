"""Generate the aggregated accuracy report artifact (reference analogue of
``accuracy-reports/aggregated-accuracy-values.csv``), including a
side-by-side with the reference's published lingua-high/lingua-low numbers.

Runs the full 79-language × 3-category corpus through the batch kernel in
both high- and low-accuracy modes (single process, ~3 min).

Usage: python tools/make_accuracy_report.py
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lingua_ray import constants as C  # noqa: E402
from lingua_ray import models as M  # noqa: E402
from lingua_ray.kernel import Detector, DetectorConfig  # noqa: E402
from lingua_ray.pipelines.accuracy import corpus_table  # noqa: E402

REFERENCE_CSV = Path(
    "/root/reference/accuracy-reports/aggregated-accuracy-values.csv")
OUT_DIR = Path(__file__).resolve().parent.parent / "accuracy-reports"

ISO_TO_NAME = {c: n.capitalize() for c, n in zip(C.ISO1_CODES, C.LANGUAGE_NAMES)}


def _mode_predictions(low_accuracy: bool):
    M.ensure_models()
    det = Detector(M.NgramModels(), DetectorConfig(low_accuracy=low_accuracy))
    t = corpus_table()
    texts = t.column("text").to_pylist()
    true = np.array(t.column("true_lang").to_pylist())
    cat = np.array(t.column("category").to_pylist())
    iso = np.array(list(C.ISO1_CODES) + ["un"])
    pred = iso[det.detect(texts)["lang"]]
    return true, cat, pred


def _confusion_df(true, cat, pred, mode: str) -> pd.DataFrame:
    df = pd.DataFrame({"true_lang": true, "category": cat,
                       "pred_lang": pred})
    out = (df.groupby(["true_lang", "pred_lang", "category"])
           .size().rename("n").reset_index())
    out["mode"] = mode
    return out


def run_mode(low_accuracy: bool,
             preds: tuple | None = None) -> pd.DataFrame:
    true, cat, pred = preds or _mode_predictions(low_accuracy)
    rows = []
    for lang in sorted(set(true)):
        row = {"iso1": lang}
        for category in ("single-words", "word-pairs", "sentences"):
            m = (true == lang) & (cat == category)
            row[category] = round(float((pred[m] == lang).mean()) * 100, 2)
        row["average"] = round(
            (row["single-words"] + row["word-pairs"] + row["sentences"]) / 3, 2)
        rows.append(row)
    return pd.DataFrame(rows)


def main() -> None:
    preds_high = _mode_predictions(False)
    preds_low = _mode_predictions(True)
    high = run_mode(False, preds_high)
    low = run_mode(True, preds_low)

    # per-language txt reports, both modes (reference layout)
    from lingua_ray.pipelines.accuracy import write_language_reports
    confusion = pd.concat([_confusion_df(*preds_high, "high"),
                           _confusion_df(*preds_low, "low")],
                          ignore_index=True)
    paths = write_language_reports(confusion, OUT_DIR / "lingua_ray")
    print(f"wrote {len(paths)} per-language reports to {OUT_DIR}/lingua_ray")
    ref = pd.read_csv(REFERENCE_CSV)[
        ["language", "average-lingua-high", "sentences-lingua-high",
         "average-lingua-low"]]

    out = high.rename(columns={
        "average": "average-ours-high", "single-words": "single-words-ours-high",
        "word-pairs": "word-pairs-ours-high", "sentences": "sentences-ours-high",
    })
    out = out.merge(
        low[["iso1", "average"]].rename(columns={"average": "average-ours-low"}),
        on="iso1")
    out["language"] = out["iso1"].map(
        lambda c: ISO_TO_NAME.get(c, c))
    # Reference uses e.g. "Bokmal"/"Nynorsk" capitalized names; align simply.
    out = out.merge(ref, on="language", how="left")
    OUT_DIR.mkdir(exist_ok=True)
    path = OUT_DIR / "aggregated-accuracy-values.csv"
    out.to_csv(path, index=False)
    print(f"wrote {path}")
    print("mean average (ours high):", out["average-ours-high"].mean().round(2))
    print("mean average (ref lingua-high):",
          out["average-lingua-high"].mean().round(2))
    print("mean sentences (ours high):",
          out["sentences-ours-high"].mean().round(2))
    print("mean sentences (ref lingua-high):",
          out["sentences-lingua-high"].mean().round(2))


if __name__ == "__main__":
    main()
