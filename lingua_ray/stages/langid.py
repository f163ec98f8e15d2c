"""Language-ID + perplexity stage: a stateful actor-pool ``map_batches`` class.

The Ray-native replacement for the reference's JVM-wide shared model registry
(``api/LanguageDetector.kt:754-776``): each actor loads the n-gram model
artifact once in ``__init__`` (mmap → page-cache shared across actors on a
node) and scores whole Arrow batches per ``__call__``.

Usage::

    ds.map_batches(LangIdScorer, batch_format="pyarrow", batch_size=2048,
                   concurrency=N, num_cpus=1,
                   fn_constructor_kwargs={"text_col": "text"})

Appends columns: ``lang`` (ISO 639-1, "un" for unknown), ``lang_confidence``
(1 − second-best relative confidence, in [0,1]), ``ppl`` (char-trigram
perplexity under the detected language, NaN when unknown).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import constants as C
from ..kernel import Detector, DetectorConfig
from ..models import get_models
from .util import set_column

_ISO_LOOKUP = np.array(list(C.ISO1_CODES) + [C.UNKNOWN_CODE])


class LangIdScorer:
    def __init__(self, text_col: str = "text",
                 languages: list[str] | None = None,
                 low_accuracy: bool = False,
                 minimum_relative_distance: float = 0.0,
                 with_ppl: bool = True):
        cfg = (DetectorConfig.from_iso1(
                   languages,
                   low_accuracy=low_accuracy,
                   minimum_relative_distance=minimum_relative_distance)
               if languages else
               DetectorConfig(low_accuracy=low_accuracy,
                              minimum_relative_distance=minimum_relative_distance))
        self.detector = Detector(get_models(), cfg)
        self.text_col = text_col
        self.with_ppl = with_ppl

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        texts = ["" if t is None else t for t in texts]
        res = self.detector.detect(texts, with_ppl=self.with_ppl)
        lang_codes = _ISO_LOOKUP[res["lang"]]
        confidence = 1.0 - res["conf2"]
        batch = set_column(batch,
            "lang", pa.array(lang_codes, type=pa.string()))
        batch = set_column(batch,
            "lang_confidence", pa.array(confidence, type=pa.float64()))
        if self.with_ppl:
            batch = set_column(batch, "ppl",
                               pa.array(res["ppl"], type=pa.float64()))
        return batch
