"""Interchange-format sinks/sources: JSONL and CSV round-trips.

Real corpora arrive as JSONL / CSV shards at least as often as Parquet;
these helpers wrap Ray Data's native readers/writers with the two
details that matter at scale:

* the WRITE is a streaming per-block sink (one shard file per block, no
  driver materialization) — the output directory is resumable input;
* the READ prunes columns immediately after parsing (JSON/CSV have no
  column projection at the storage layer — select early so only the
  needed columns flow downstream).

Round-trip fidelity (types survive parquet → jsonl → Dataset) is
oracle-verified by the ``jsonl_roundtrip`` driver query.
"""

from __future__ import annotations

from pathlib import Path


def write_jsonl(ds, out_dir: str) -> str:
    """Streaming JSONL sink: one shard per block under ``out_dir``."""
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def read_jsonl(path: str, columns: list[str] | None = None):
    """JSONL source with post-parse column pruning."""
    import ray.data
    ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_csv(ds, out_dir: str) -> str:
    """Streaming CSV sink: one shard per block under ``out_dir``."""
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    ds.write_csv(out_dir)
    return out_dir


def read_csv(path: str, columns: list[str] | None = None):
    """CSV source with post-parse column pruning."""
    import ray.data
    ds = ray.data.read_csv(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds
