"""Keep/drop decision, stateless ``map_batches`` fn.

keep = language detected (not "un")
     ∧ quality_flags == 0
     ∧ ppl ≤ threshold (NaN fails)
     ∧ tox_count == 0

A pure function of the columns produced by the langid / quality / scrub
stages, so the decision is deterministic per turn regardless of batching or
partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import set_column

# Calibrated to ~p99.9 of the char-trigram perplexity distribution on the
# synthetic transcript mix (median ≈ 7.6, p99 ≈ 21): drops only pathological
# outliers while keeping ordinary text of every supported language.
DEFAULT_PPL_THRESHOLD = 30.0


def keep_batch(batch: pa.Table,
               ppl_threshold: float = DEFAULT_PPL_THRESHOLD) -> pa.Table:
    lang_ok = pc.not_equal(pc.fill_null(batch.column("lang"), "un"), "un") \
        .to_numpy(zero_copy_only=False)
    flags = batch.column("quality_flags").to_numpy()
    ppl = batch.column("ppl").to_numpy()
    tox = batch.column("tox_count").to_numpy()
    keep = (
        lang_ok
        & (flags == 0)
        & (np.nan_to_num(ppl, nan=np.inf) <= ppl_threshold)
        & (tox == 0)
    )
    return set_column(batch, "keep", pa.array(keep, type=pa.bool_()))
