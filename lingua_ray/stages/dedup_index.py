"""Persistent fingerprint index for cross-run incremental dedup.

The production shape of ``dedup_incremental``: yesterday's crawl built an
index ONCE; today's batch dedups against it without re-reading (or even
re-fingerprinting) yesterday's corpus — only the index buckets today's
fingerprints actually touch are read.

Layout (same discipline as the persisted IVF index, ``ann.py``):
parquet PARTITIONED BY ``bucket`` (``bucket = fp64 mod n_buckets``, one
hive directory per bucket, 16 bytes/doc on disk).  Lookups prune to
touched buckets via a pushed-down partition filter; appends add new
files to bucket directories (never rewrite); both are shard-parallel and
independently resumable.  At 10^10 indexed docs and n_buckets=4096 a
100-doc probe batch reads ≤ 100 bucket directories of ~40 MB each
instead of a 160 GB index scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def fingerprint_bucket_batch(batch: pa.Table, n_buckets: int = 64,
                             text_col: str = "text") -> pa.Table:
    """Append fp64 (int64 view of the rolling text fingerprint) and its
    mod-``n_buckets`` bucket to the batch."""
    from ..functions.textstats import fingerprint64_array
    from .util import set_column, utf8_filled

    fp = fingerprint64_array(utf8_filled(batch.column(text_col)))
    bucket = (fp % np.uint64(n_buckets)).astype(np.int32)
    batch = set_column(batch, "fp64",
                       pa.array(fp.view(np.int64), type=pa.int64()))
    return set_column(batch, "bucket", pa.array(bucket))


def build_fingerprint_index(ds, index_dir: str, n_buckets: int = 64,
                            text_col: str = "text") -> None:
    """One streaming fingerprint pass + a bucket-partitioned write.
    Replaces any existing index at ``index_dir``."""
    import shutil
    from pathlib import Path

    out = Path(index_dir)
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    tagged = ds.map_batches(fingerprint_bucket_batch,
                            batch_format="pyarrow",
                            fn_kwargs={"n_buckets": n_buckets,
                                       "text_col": text_col})
    tagged.select_columns(["fp64", "bucket"]).write_parquet(
        str(out), partition_cols=["bucket"])


def dedup_against_index(ds, index_dir: str, n_buckets: int = 64,
                        text_col: str = "text"):
    """Rows of ``ds`` whose text fingerprint is ABSENT from the index
    (NOT EXISTS semantics, same as ``sets.anti_join``).

    The probe batch is fingerprinted once and materialized — it is the
    SMALL side by assumption (today's increment vs the historical
    corpus); the index is the big side and is never scanned in full:
    the bucket filter is pushed into ``read_parquet`` so only touched
    hive partitions leave storage.
    """
    from pathlib import Path

    import ray.data

    from .sets import anti_join

    tagged = ds.map_batches(fingerprint_bucket_batch,
                            batch_format="pyarrow",
                            fn_kwargs={"n_buckets": n_buckets,
                                       "text_col": text_col}).materialize()
    touched = sorted({b for t in
                      tagged.select_columns(["bucket"]).iter_batches(
                          batch_format="pyarrow")
                      for b in t.column("bucket").unique().to_pylist()})
    # directory pruning by explicit partition paths (same idiom as the
    # persisted IVF probe, ann.py): untouched buckets never leave disk
    paths = [str(f) for b in touched
             for f in sorted((Path(index_dir)
                              / f"bucket={b}").glob("*.parquet"))]
    if not paths:
        return tagged.drop_columns(["fp64", "bucket"])
    index = ray.data.read_parquet(paths, columns=["fp64"])
    out = anti_join(tagged, index, on="fp64", right_on="fp64")
    return out.drop_columns(["fp64", "bucket"])


def append_to_index(ds, index_dir: str, n_buckets: int = 64,
                    text_col: str = "text") -> None:
    """Add new documents' fingerprints to an existing index — new files
    land inside the bucket directories; nothing is rewritten, so a crash
    mid-append leaves a smaller-but-valid index (re-appending the same
    docs is harmless: duplicate fp64 rows only make the anti-join's
    right side redundant, never wrong)."""
    tagged = ds.map_batches(fingerprint_bucket_batch,
                            batch_format="pyarrow",
                            fn_kwargs={"n_buckets": n_buckets,
                                       "text_col": text_col})
    tagged.select_columns(["fp64", "bucket"]).write_parquet(
        index_dir, partition_cols=["bucket"])
