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


_META_FILE = "_index_meta.json"


def _write_meta(index_dir, **params) -> None:
    import json
    from pathlib import Path
    (Path(index_dir) / _META_FILE).write_text(json.dumps(params))


def _check_meta(index_dir, **params) -> None:
    """Refuse to probe/append with hyperparameters that differ from the
    build: a mismatched n_buckets (or MinHash num_perm/num_bands/k)
    would not error — it would silently probe the wrong buckets / hash
    to disjoint bands and let every duplicate leak through."""
    import json
    from pathlib import Path
    p = Path(index_dir) / _META_FILE
    if not p.exists():
        raise FileNotFoundError(
            f"{index_dir} has no {_META_FILE}: not a fingerprint index "
            "built by this module")
    stored = json.loads(p.read_text())
    if stored != params:
        raise ValueError(
            f"index hyperparameters differ from build time: built with "
            f"{stored}, called with {params} — a silent mismatch would "
            "miss duplicates, not error")


def build_fingerprint_index(ds, index_dir: str, n_buckets: int = 64,
                            text_col: str = "text") -> None:
    """One streaming fingerprint pass + a bucket-partitioned write.
    Replaces any existing index at ``index_dir``.  Build == clear +
    append, so layout logic exists exactly once.  The meta file is
    written LAST: it doubles as the build's commit marker, so a crash
    mid-build leaves a metaless directory that ``_check_meta`` rejects
    (a partial build is otherwise indistinguishable from a complete one
    and would silently miss duplicates — append-path partiality, by
    contrast, is documented-safe)."""
    import shutil
    from pathlib import Path

    out = Path(index_dir)
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    _append_fps(ds, index_dir, n_buckets=n_buckets, text_col=text_col)
    _write_meta(out, kind="exact", n_buckets=n_buckets)


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

    _check_meta(index_dir, kind="exact", n_buckets=n_buckets)
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


def _tag_sig_batch(batch: pa.Table, n_buckets: int,
                   id_col: str) -> pa.Table:
    """Append ``sbucket = id mod n_buckets`` to a signature batch."""
    from .util import set_column
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    sb = (ids.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
    return set_column(batch, "sbucket", pa.array(sb))


def _band_bucket_batch(batch: pa.Table, num_bands: int, n_buckets: int,
                       id_col: str) -> pa.Table:
    """LSH band expansion + ``bucket = band_hash mod n_buckets``."""
    from .dedup import lsh_band_batch
    b = lsh_band_batch(batch, id_col=id_col, num_bands=num_bands)
    bh = b.column("band_hash").to_numpy().astype(np.int64)
    bk = (bh.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
    return b.append_column("bucket", pa.array(bk))


def build_minhash_index(ds, index_dir: str, num_perm: int = 64,
                        num_bands: int = 16, n_buckets: int = 64,
                        k: int = 5, text_col: str = "text",
                        id_col: str = "doc_id") -> None:
    """Persist a NEAR-duplicate lookup index: MinHash signatures (hive-
    partitioned by ``sbucket = id mod n_buckets``) plus LSH band rows
    (partitioned by ``bucket = band_hash mod n_buckets``).  One signature
    pass; the band expansion re-reads the persisted signatures instead of
    recomputing or pinning them.  Replaces any existing index."""
    import shutil
    from pathlib import Path

    import ray.data

    from .dedup import minhash_signature_batch

    out = Path(index_dir)
    shutil.rmtree(out, ignore_errors=True)
    (out / "sigs").mkdir(parents=True, exist_ok=True)

    sig = ds.map_batches(
        minhash_signature_batch, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "num_perm": num_perm, "k": k})
    sig.map_batches(_tag_sig_batch, batch_format="pyarrow",
                    fn_kwargs={"n_buckets": n_buckets, "id_col": id_col}) \
       .select_columns([id_col, "minhash", "sbucket"]) \
       .write_parquet(str(out / "sigs"), partition_cols=["sbucket"])

    ray.data.read_parquet(str(out / "sigs"),
                          columns=[id_col, "minhash"]) \
        .map_batches(_band_bucket_batch, batch_format="pyarrow",
                     fn_kwargs={"num_bands": num_bands,
                                "n_buckets": n_buckets,
                                "id_col": id_col}) \
        .write_parquet(str(out / "bands"), partition_cols=["bucket"])
    # meta last: the build's commit marker — a crash above leaves a
    # metaless dir that _check_meta rejects instead of a silent
    # partial index (see build_fingerprint_index)
    _write_meta(out, kind="minhash", num_perm=num_perm,
                num_bands=num_bands, n_buckets=n_buckets, k=k)


def neardup_against_index(ds, index_dir: str, threshold: float = 0.5,
                          num_perm: int = 64, num_bands: int = 16,
                          n_buckets: int = 64, k: int = 5,
                          text_col: str = "text",
                          id_col: str = "doc_id"):
    """Near-duplicate pairs between a (small) probe batch and the indexed
    history: (id, dup_of, est_jaccard) with estimated Jaccard — the
    fraction of equal minhash components — ≥ ``threshold``.

    The historical corpus is never rescanned: only the band buckets the
    probe's band hashes touch and the signature buckets of surviving
    candidates are read (directory pruning both times).  The probe
    batch's signatures are collected and broadcast via ``ray.put`` — it
    is the bounded small side by assumption, exactly like the broadcast
    path of ``verify_minhash_candidates``."""
    from pathlib import Path

    import ray
    import ray.data

    from .dedup import lsh_band_batch, minhash_signature_batch

    _check_meta(index_dir, kind="minhash", num_perm=num_perm,
                num_bands=num_bands, n_buckets=n_buckets, k=k)
    out = Path(index_dir)
    new_sig = ds.map_batches(
        minhash_signature_batch, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "num_perm": num_perm, "k": k}) \
        .select_columns([id_col, "minhash"]).materialize()

    new_ids, new_mat = [], []
    for t in new_sig.iter_batches(batch_format="pyarrow"):
        new_ids.extend(t.column(id_col).to_pylist())
        if t.num_rows:
            flat = t.column("minhash").combine_chunks().flatten()
            new_mat.append(flat.to_numpy(zero_copy_only=False)
                           .astype(np.uint64).reshape(-1, num_perm))
    if not new_ids:
        return _empty_pairs(id_col)
    new_mat = np.concatenate(new_mat)
    pos_of = {i: j for j, i in enumerate(new_ids)}
    sig_ref = ray.put((pos_of, new_mat))

    # materialized: consumed twice (bucket discovery + the join) and
    # bounded by the probe batch size
    bands = new_sig.map_batches(
        lsh_band_batch, batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "num_bands": num_bands}).materialize()
    touched = set()
    for t in bands.select_columns(["band_hash"]).iter_batches(
            batch_format="pyarrow"):
        bh = t.column("band_hash").to_numpy().astype(np.int64)
        touched.update(
            (bh.view(np.uint64) % np.uint64(n_buckets)).tolist())
    paths = [str(f) for b in sorted(touched)
             for f in sorted((out / "bands"
                              / f"bucket={int(b)}").glob("*.parquet"))]
    if not paths:
        return _empty_pairs(id_col)
    idx_bands = ray.data.read_parquet(paths,
                                      columns=["band", "band_hash", id_col])
    nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 4)
    cand = bands.join(idx_bands, "inner", nparts,
                      on=("band", "band_hash"), right_suffix="_old")
    old_col = f"{id_col}_old"
    # distinct candidate pairs; volume is bounded by the probe batch's
    # bucket collisions, so this groupby is small by construction
    cand = cand.select_columns([id_col, old_col]) \
               .groupby([id_col, old_col]).count() \
               .select_columns([id_col, old_col])

    old_ids = set()
    for t in cand.select_columns([old_col]).iter_batches(
            batch_format="pyarrow"):
        old_ids.update(t.column(old_col).to_pylist())
    if not old_ids:
        return _empty_pairs(id_col)
    sbuckets = sorted({int(np.uint64(np.int64(i)) % np.uint64(n_buckets))
                       for i in old_ids})
    sig_paths = [str(f) for b in sbuckets
                 for f in sorted((out / "sigs"
                                  / f"sbucket={b}").glob("*.parquet"))]
    from .dedup import sig_to_binary_batch

    # large_binary re-encode: Acero joins reject fixed_size_list payloads
    old_sigs = ray.data.read_parquet(sig_paths,
                                     columns=[id_col, "minhash"]) \
        .map_batches(sig_to_binary_batch, batch_format="pyarrow") \
        .rename_columns({id_col: old_col, "minhash": "minhash_old"})
    joined = cand.join(old_sigs, "inner", nparts,
                       on=(old_col,))

    def estimate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dup_of": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        from .dedup import _sig_matrix
        pos, mat = ray.get(sig_ref)
        new_idx = np.array([pos[i] for i in
                            batch.column(id_col).to_pylist()])
        old_mat = _sig_matrix(batch.column("minhash_old"))
        est = (mat[new_idx] == old_mat).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(keep)),
            "dup_of": batch.column(old_col).filter(pa.array(keep)),
            "est_jaccard": pa.array(est[keep])})

    est = joined.map_batches(estimate, batch_format="pyarrow")
    # distinct pairs even if a crash-retry append duplicated signature
    # rows (the join would emit the pair once per copy); pair volume is
    # probe-bounded, so the keyed max is small
    return est.groupby([id_col, "dup_of"]).max("est_jaccard") \
              .rename_columns({"max(est_jaccard)": "est_jaccard"})


def append_to_minhash_index(ds, index_dir: str, num_perm: int = 64,
                            num_bands: int = 16, n_buckets: int = 64,
                            k: int = 5, text_col: str = "text",
                            id_col: str = "doc_id") -> None:
    """Add new documents to an existing MinHash index: one signature
    pass, new files appended inside the existing sig/band bucket
    directories.  Same crash-retry contract as :func:`append_to_index`
    — duplicate rows only add redundant candidates, never wrong ones."""
    from pathlib import Path

    from .dedup import minhash_signature_batch

    _check_meta(index_dir, kind="minhash", num_perm=num_perm,
                num_bands=num_bands, n_buckets=n_buckets, k=k)
    out = Path(index_dir)
    sig = ds.map_batches(
        minhash_signature_batch, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "num_perm": num_perm, "k": k}) \
        .select_columns([id_col, "minhash"]).materialize()

    sig.map_batches(_tag_sig_batch, batch_format="pyarrow",
                    fn_kwargs={"n_buckets": n_buckets, "id_col": id_col}) \
       .write_parquet(str(out / "sigs"), partition_cols=["sbucket"])

    sig.map_batches(_band_bucket_batch, batch_format="pyarrow",
                    fn_kwargs={"num_bands": num_bands,
                               "n_buckets": n_buckets,
                               "id_col": id_col}) \
       .write_parquet(str(out / "bands"), partition_cols=["bucket"])


def _empty_pairs(id_col: str):
    import ray.data
    return ray.data.from_arrow(pa.table(
        {id_col: pa.array([], pa.int64()),
         "dup_of": pa.array([], pa.int64()),
         "est_jaccard": pa.array([], pa.float64())}))


def append_to_index(ds, index_dir: str, n_buckets: int = 64,
                    text_col: str = "text") -> None:
    """Add new documents' fingerprints to an existing index — new files
    land inside the bucket directories; nothing is rewritten, so a crash
    mid-append leaves a smaller-but-valid index (re-appending the same
    docs is harmless: duplicate fp64 rows only make the anti-join's
    right side redundant, never wrong)."""
    _check_meta(index_dir, kind="exact", n_buckets=n_buckets)
    _append_fps(ds, index_dir, n_buckets=n_buckets, text_col=text_col)


def _append_fps(ds, index_dir: str, n_buckets: int,
                text_col: str) -> None:
    tagged = ds.map_batches(fingerprint_bucket_batch,
                            batch_format="pyarrow",
                            fn_kwargs={"n_buckets": n_buckets,
                                       "text_col": text_col})
    tagged.select_columns(["fp64", "bucket"]).write_parquet(
        index_dir, partition_cols=["bucket"])
