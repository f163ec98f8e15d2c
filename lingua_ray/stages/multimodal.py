"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The decode libraries (PIL/ffmpeg/torchaudio) are not available in this
environment, so the *decode* step is stubbed — either a clearly-marked
``NotImplementedError`` (real mode) or a deterministic fake derived from the
payload bytes (test mode).  Everything Ray-side is real and tested: schema,
actor-pool signature, per-batch memory sizing, output layout.

At 100 TB scale these stages run as actor pools with small ``batch_size``
(large binary payloads × concurrency must fit worker heaps) — callers should
use ``map_batches(ImageDecoder, batch_size=32, concurrency=N, num_cpus=1)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from .util import set_column

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # "image" | "audio" | "video"
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("meta", pa.string()),          # JSON metadata
])


def make_fake_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic opaque payloads for plumbing tests."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.randint(0, 3, size=n)]
    payloads = [rng.bytes(rng.randint(64, 512)) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "kind": pa.array(kinds, type=pa.string()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "meta": pa.array(["{}"] * n),
    })


class ImageDecoder:
    """Actor-pool decode/feature stage.

    real=False (default here, since no image libs are installed): emits a
    deterministic fake (width, height, mean_luma) derived from the payload's
    sha256 — stable across runs, exercising the full Ray plumbing.
    real=True: raises NotImplementedError at construction, documenting the
    dependency boundary.
    """

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "image decoding requires PIL/opencv, not available in this "
                "environment; run with real=False for the deterministic stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        w = np.empty(len(payloads), dtype=np.int32)
        h = np.empty(len(payloads), dtype=np.int32)
        luma = np.empty(len(payloads), dtype=np.float64)
        for i, p in enumerate(payloads):
            d = hashlib.sha256(p or b"").digest()
            w[i] = 64 + d[0] * 4
            h[i] = 64 + d[1] * 4
            luma[i] = d[2] / 255.0
        batch = set_column(batch, "width", pa.array(w))
        batch = set_column(batch, "height", pa.array(h))
        batch = set_column(batch, "mean_luma", pa.array(luma))
        return batch


class AudioFeaturizer:
    """Actor-pool audio feature stage (stubbed like ImageDecoder)."""

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "audio decoding requires torchaudio/ffmpeg, unavailable here")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        dur = np.empty(len(payloads), dtype=np.float64)
        rms = np.empty(len(payloads), dtype=np.float64)
        for i, p in enumerate(payloads):
            d = hashlib.sha256(b"a" + (p or b"")).digest()
            dur[i] = 0.5 + d[0] / 16.0
            rms[i] = d[1] / 255.0
        batch = set_column(batch, "duration_s", pa.array(dur))
        batch = set_column(batch, "rms", pa.array(rms))
        return batch
