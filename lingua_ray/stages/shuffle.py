"""Deterministic global shuffle for training-data sharding.

``Dataset.random_shuffle`` is nondeterministic across runs and cluster
sizes; training pipelines want a permutation that is reproducible,
resumable, and shardable.  The classic answer: order by a cryptographic
hash of the row id.

Scale shape: a single global ``sort`` by digest would be an all-to-all
over the full corpus with one totally-ordered output.  Instead the
digest's first byte buckets rows into 256 shards (ONE hash-partition
shuffle), and each shard orders locally by (digest, id) — at 100 TB
each bucket is ~0.4% of the corpus, sorts independently, and writes its
own partition; the concatenation bucket-major, pos-minor IS the global
md5 permutation.  Reader-side: stream buckets in name order.

Rank function matches DuckDB byte-for-byte: lowercase-hex md5 of
``str(id)`` compares identically as string and as value.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from .util import md5_hex_ranks


def shuffle_key_batch(batch: pa.Table, id_col: str = "doc_id",
                      bucket_chars: int = 2) -> pa.Table:
    """Attach (bucket, digest): bucket = md5 hex prefix."""
    digests = md5_hex_ranks(batch.column(id_col).to_pylist())
    return pa.table({id_col: batch.column(id_col),
                     "bucket": pa.array([d[:bucket_chars]
                                         for d in digests]),
                     "digest": pa.array(digests)})


def deterministic_shuffle(ds, id_col: str = "doc_id",
                          bucket_chars: int = 2):
    """(id, bucket, pos) — ``pos`` is the 1-based rank within the
    bucket under (digest, id) order.  Bucket-major, pos-minor order is
    the deterministic global permutation.

    ``bucket_chars`` sizes the shuffle fan-out at 16^k buckets: one
    bucket is ~16^-k of the corpus and is sorted in ONE ``map_groups``
    task, so pick k with buckets ≈ corpus / target-task-size — 2 (256
    buckets) suits test scale; at 100 TB use 4 (65 536 buckets ≈ 1.5 GB
    each).  The permutation ORDER is k-independent (it's the digest
    order); only the shard boundaries move."""

    def order_group(group: pa.Table) -> pa.Table:
        d = np.asarray(group.column("digest").to_pylist())
        i = group.column(id_col).to_numpy()
        order = np.lexsort((i, d))
        out = group.take(pa.array(order))
        return pa.table({
            id_col: out.column(id_col),
            "bucket": out.column("bucket"),
            "pos": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    keyed = ds.map_batches(shuffle_key_batch, batch_format="pyarrow",
                           fn_kwargs={"id_col": id_col,
                                      "bucket_chars": bucket_chars})
    return keyed.groupby("bucket").map_groups(order_group,
                                              batch_format="pyarrow")
