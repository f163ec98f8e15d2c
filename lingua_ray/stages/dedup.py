"""Deduplication operators for large-scale training-data pipelines.

All operators are expressed Ray-Data-first:

* **Exact dedup** — pre-aggregate inside ``map_batches`` (local min per key)
  then one small ``groupby(key).min(id)`` — the combiner pattern that keeps
  the all-to-all exchange proportional to *distinct* keys, not rows.
* **MinHash + LSH** — shingle → minhash signature (``map_batches``) → band
  rows (``flat_map``-style batch expansion) → ``groupby(band, band_hash)``
  buckets → candidate clusters with ``dup_of = min(doc_id)``.
* **SimHash** — 64-bit signature per document, stateless ``map_batches``.
* **N-gram Jaccard** — exact verification kernel used on LSH candidates.

Hash seeds are fixed constants, so every signature is a pure function of the
text — deterministic across runs/partitions (resume-safe).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..chartables import encode_batch
from ..models import HASH_MULT, rolling_hashes
from .util import set_column

_SIG_SEEDS = np.arange(1, 129, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xBF58476D1CE4E5B9)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    cps = np.frombuffer(text.lower().encode("utf-32-le"),
                        dtype=np.uint32).astype(np.int32)
    if len(cps) < k:
        cps = np.pad(cps, (0, k - len(cps)), constant_values=32)
    h = rolling_hashes(cps, k)[k - 1]
    return np.unique(h)


def _mix(h: np.ndarray) -> np.ndarray:
    h = (h ^ (h >> np.uint64(30))) * _MIX
    return h ^ (h >> np.uint64(27))


def minhash_signature_batch(batch: pa.Table, text_col: str = "text",
                            num_perm: int = 64, k: int = 5) -> pa.Table:
    """Append ``minhash`` (fixed_size_list<uint64, num_perm>)."""
    texts = ["" if t is None else t for t in batch.column(text_col).to_pylist()]
    sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
    seeds = _SIG_SEEDS[:num_perm]
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t, k)
        if len(sh) == 0:
            sigs[i] = 0
            continue
        # g_j(x) = mix(x ^ seed_j); signature = min over shingles.
        m = _mix(sh[:, None] ^ seeds[None, :])
        sigs[i] = m.min(axis=0)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(sigs.reshape(-1), type=pa.uint64()), num_perm)
    return set_column(batch, "minhash", arr)


def lsh_band_batch(batch: pa.Table, id_col: str = "doc_id",
                   num_bands: int = 16) -> pa.Table:
    """Expand each row into ``num_bands`` (band, band_hash, id) rows."""
    sig = np.asarray(batch.column("minhash").combine_chunks().flatten()
                     .to_numpy(zero_copy_only=False), dtype=np.uint64)
    n = batch.num_rows
    num_perm = len(sig) // max(n, 1)
    sig = sig.reshape(n, num_perm)
    r = num_perm // num_bands
    ids = batch.column(id_col).to_numpy()
    out_band = np.repeat(np.arange(num_bands, dtype=np.int32), n)
    out_id = np.tile(ids, num_bands)
    bh = np.empty((num_bands, n), dtype=np.uint64)
    for b in range(num_bands):
        chunk = sig[:, b * r: (b + 1) * r]
        h = chunk[:, 0].copy()
        for j in range(1, r):
            h = h * HASH_MULT + chunk[:, j]
        bh[b] = _mix(h)
    return pa.table({
        "band": pa.array(out_band),
        "band_hash": pa.array(bh.reshape(-1), type=pa.uint64()),
        id_col: pa.array(out_id),
    })


def bucket_pairs_group(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Within one (band, band_hash) bucket: emit (id, dup_of=min id) rows for
    buckets with >1 member."""
    ids = np.sort(batch.column(id_col).to_numpy())
    if len(ids) < 2:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "dup_of": pa.array([], type=pa.int64())})
    return pa.table({id_col: pa.array(ids[1:]),
                     "dup_of": pa.array(np.full(len(ids) - 1, ids[0]))})


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  k: int = 5) -> pa.Table:
    """Append ``simhash`` (int64 — the 64-bit signature reinterpreted)."""
    texts = ["" if t is None else t for t in batch.column(text_col).to_pylist()]
    out = np.empty(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _mix(_shingle_hashes(t, k))
        if len(sh) == 0:
            out[i] = 0
            continue
        bits = ((sh[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        vote = bits.sum(axis=0) * 2 - len(sh)
        out[i] = np.sum((vote > 0).astype(np.uint64) << bit_idx)
    return set_column(batch, 
        "simhash", pa.array(out.view(np.int64), type=pa.int64()))


def jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard similarity (LSH candidate verification)."""
    sa, sb = _shingle_hashes(a, k), _shingle_hashes(b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def exact_dedup_local_min(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Per-batch combiner: min id per distinct text (pre-aggregation before
    the global groupby — shrinks the shuffle to distinct keys)."""
    import pandas as pd
    df = pd.DataFrame({text_col: batch.column(text_col).to_pandas(),
                       id_col: batch.column(id_col).to_pandas()})
    g = df.groupby(text_col, sort=False, as_index=False)[id_col].min()
    return pa.Table.from_pandas(g, preserve_index=False)
