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

from ..models import HASH_MULT, rolling_hashes
from .util import set_column

_SIG_SEEDS = np.arange(1, 129, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xBF58476D1CE4E5B9)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Scalar reference: distinct k-shingle rolling hashes of one text
    (space-padded to k).  Used by :func:`jaccard` and as the oracle for
    the batch kernel in tests."""
    cps = np.frombuffer(text.lower().encode("utf-32-le"),
                        dtype=np.uint32).astype(np.int32)
    if len(cps) < k:
        cps = np.pad(cps, (0, k - len(cps)), constant_values=32)
    h = rolling_hashes(cps, k)[k - 1]
    return np.unique(h)


def _shingle_hashes_batch(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-shingle hashes for a batch in one pass (duplicates KEPT).

    Accepts a list[str] or an Arrow string column (decoded straight from
    the UTF-8 buffers — no per-row str objects).  Returns ``(hashes
    uint64, offsets int64)`` where row *i*'s shingles are
    ``hashes[offsets[i]:offsets[i+1]]``.  One codepoint decode for the
    whole batch, a table-driven Python-exact lowercase, vectorized space
    padding to length k, one rolling hash; the windows that straddle row
    boundaries are dropped by index arithmetic — no per-row Python.
    """
    from ..textprep import _lower_cps, encode_texts
    cps, offs = encode_texts(texts)
    cps, offs = _lower_cps(cps, offs)     # lower() may change row lengths
    lens = np.diff(offs)
    if (lens < k).any():
        # space-pad short rows to exactly k codepoints, in bulk
        new_len = np.maximum(lens, k)
        new_offs = np.zeros(len(offs), dtype=np.int64)
        np.cumsum(new_len, out=new_offs[1:])
        out = np.full(int(new_offs[-1]), 0x20, dtype=np.int32)
        shift = np.repeat(new_offs[:-1] - offs[:-1], lens)
        src = np.arange(len(cps), dtype=np.int64)
        out[src + shift] = cps
        cps, offs = out, new_offs
    h = rolling_hashes(cps, k)[k - 1]
    lengths = offs[1:] - offs[:-1]
    n_sh = lengths - k + 1            # ≥ 1 per row after padding
    tot = int(n_sh.sum())
    ends = np.cumsum(n_sh)
    starts_out = np.concatenate([[0], ends[:-1]])
    within = np.arange(tot, dtype=np.int64) - np.repeat(starts_out, n_sh)
    widx = np.repeat(offs[:-1], n_sh) + within
    out_offs = np.concatenate([[0], ends]).astype(np.int64)
    return h[widx] if tot else np.zeros(0, np.uint64), out_offs


def window_hashes_batch(texts, k: int,
                        stride: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """k-codepoint window hashes per row over the RAW text — no
    lowercasing, no padding; a row shorter than k contributes zero
    windows (matching SQL ``generate_series(1, length - k + 1)``).

    ``stride`` samples every stride-th window START (0-based positions
    0, stride, 2·stride, … within each row — SQL 1-based positions where
    ``(i - 1) % stride = 0``).  stride=1 is the exact census; stride=S
    cuts the emitted window table by ~S× for large-scale runs, at the
    cost of only detecting shared spans of length ≥ k + S - 1 with
    certainty (a shared span shorter than that may not contain a sampled
    start in both documents).  Deterministic and position-based, so the
    sampled set is a pure function of the text — partitioning- and
    resume-independent, and expressible in SQL for the oracle.

    Same shape contract as :func:`_shingle_hashes_batch`: returns
    ``(hashes uint64, offsets int64)`` with row *i*'s windows at
    ``hashes[offsets[i]:offsets[i+1]]``.  One codepoint decode for the
    batch, one rolling-hash pass; boundary-straddling windows dropped by
    index arithmetic.  Used by cross-document substring dedup, where the
    window string must equal the SQL ``substring()`` byte-for-byte.
    """
    from ..textprep import encode_texts
    cps, offs = encode_texts(texts)
    lens = np.diff(offs)
    n_full = np.maximum(lens - k + 1, 0)
    n_w = -(-n_full // stride) if stride > 1 else n_full
    tot = int(n_w.sum())
    out_offs = np.concatenate([[0], np.cumsum(n_w)]).astype(np.int64)
    if tot == 0:
        return np.zeros(0, np.uint64), out_offs
    # Horner recurrence keeping only the length-k array: at the K=40 this
    # caller uses, rolling_hashes() would retain all 40 intermediate
    # arrays (~320 B/codepoint transient) for a single-length lookup.
    u = cps.astype(np.uint64)
    h = u
    for kk in range(2, k + 1):
        h = h[: len(u) - kk + 1] * HASH_MULT + u[kk - 1:]
    within = np.arange(tot, dtype=np.int64) - np.repeat(out_offs[:-1], n_w)
    if stride > 1:
        within = within * stride
    widx = np.repeat(offs[:-1], n_w) + within
    return h[widx], out_offs


# Winnowing selection hash: polynomial base-31 over codepoints mod the
# Mersenne prime 2^31-1 — chosen because DuckDB can evaluate the identical
# sum in BIGINT arithmetic (codepoint * 31^(k-j) products stay < 2^56), so
# the oracle selects byte-for-byte the same fingerprints.
WINNOW_MOD = 2147483647
WINNOW_BASE = 31
_POS_C = 1 << 32  # position field width in the combined (hash, pos) key


def winnow_hashes_batch(texts, k: int,
                        w: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing-sampled k-codepoint window hashes per row (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003): from every run of ``w`` consecutive
    window starts, select the window with the minimal selection hash,
    breaking ties toward the RIGHTMOST position.  Selection depends only
    on window *content* (plus in-window relative order), so two documents
    sharing any span of length >= k + w - 1 are guaranteed to select at
    least one identical window — the shift-robust guarantee stride
    sampling lacks — while emitting ~2/(w+1) of the stride-1 census.

    Same ``(hashes uint64, offsets int64)`` contract as
    :func:`window_hashes_batch`; the emitted identity hashes are the same
    64-bit Horner hashes, so downstream dedup plans are interchangeable.
    The rightmost-min tie-break is encoded in one int64 key per window,
    ``h31 * 2^32 + (2^32 - 1 - i)`` (i = 1-based in-row position), whose
    plain ``min`` over each forward window of ``w`` keys IS the winnowing
    choice — the identical expression a SQL window function computes, so
    the DuckDB oracle reproduces the selection exactly.
    """
    from ..textprep import encode_texts
    cps, offs = encode_texts(texts)
    lens = np.diff(offs)
    n_full = np.maximum(lens - k + 1, 0)
    tot = int(n_full.sum())
    n_rows = len(n_full)
    if tot == 0:
        return np.zeros(0, np.uint64), np.zeros(n_rows + 1, np.int64)
    # selection hash (mod-M Horner; 31*M + codepoint < 2^37, no overflow)
    s = cps.astype(np.int64) % WINNOW_MOD
    for kk in range(2, k + 1):
        s = (s[: len(cps) - kk + 1] * WINNOW_BASE + cps[kk - 1:]) % WINNOW_MOD
    # identity hash (same recurrence as window_hashes_batch)
    u = cps.astype(np.uint64)
    h = u
    for kk in range(2, k + 1):
        h = h[: len(u) - kk + 1] * HASH_MULT + u[kk - 1:]
    in_offs = np.concatenate([[0], np.cumsum(n_full)]).astype(np.int64)
    within = np.arange(tot, dtype=np.int64) - np.repeat(in_offs[:-1], n_full)
    widx = np.repeat(offs[:-1], n_full) + within
    keys = s[widx] * _POS_C + (_POS_C - 1 - (within + 1))
    # forward sliding-window min with per-row MAX padding: w-1 pad slots
    # after each row's keys mean a window starting at any key position
    # never reads a neighbouring row, and tail windows shrink naturally.
    pad_lens = np.where(n_full > 0, n_full + (w - 1), 0)
    pofs = np.concatenate([[0], np.cumsum(pad_lens)]).astype(np.int64)
    padded = np.full(int(pofs[-1]), np.iinfo(np.int64).max, dtype=np.int64)
    dest = np.repeat(pofs[:-1], n_full) + within
    padded[dest] = keys
    mins = keys.copy()
    for d in range(1, w):  # w gathers instead of a (tot, w) window copy
        np.minimum(mins, padded[dest + d], out=mins)
    # a position minimal for several overlapping windows yields a RUN of
    # equal mins (keys are unique within a row — the pos field disambiguates
    # hash collisions), so consecutive-dedup per row is exact.
    row = np.repeat(np.arange(n_rows, dtype=np.int64), n_full)
    keep = np.ones(tot, dtype=bool)
    keep[1:] = (mins[1:] != mins[:-1]) | (row[1:] != row[:-1])
    sel_row = row[keep]
    sel_i = _POS_C - 1 - (mins[keep] % _POS_C)  # 1-based in-row position
    g = offs[:-1][sel_row] + sel_i - 1
    counts = np.bincount(sel_row, minlength=n_rows)
    out_offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return h[g], out_offs


def _mix(h: np.ndarray) -> np.ndarray:
    h = (h ^ (h >> np.uint64(30))) * _MIX
    return h ^ (h >> np.uint64(27))


def minhash_signature_batch(batch: pa.Table, text_col: str = "text",
                            num_perm: int = 64, k: int = 5) -> pa.Table:
    """Append ``minhash`` (fixed_size_list<uint64, num_perm>).

    Vectorized over the whole batch: ONE shingle-hash pass
    (:func:`_shingle_hashes_batch`), then per permutation j a single
    ``mix(h ^ seed_j)`` + ``np.minimum.reduceat`` over the row offsets —
    g_j(x) = mix(x ^ seed_j), signature = min over the row's shingles.
    Duplicate shingles don't affect the min, so no per-row unique needed.
    """
    n = batch.num_rows
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    if n:
        hashes, offs = _shingle_hashes_batch(batch.column(text_col), k)
        seeds = _SIG_SEEDS[:num_perm]
        for j in range(num_perm):
            sigs[:, j] = np.minimum.reduceat(_mix(hashes ^ seeds[j]),
                                             offs[:-1])
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(sigs.reshape(-1), type=pa.uint64()), num_perm)
    return set_column(batch, "minhash", arr)


def lsh_band_batch(batch: pa.Table, id_col: str = "doc_id",
                   num_bands: int = 16) -> pa.Table:
    """Expand each row into ``num_bands`` (band, band_hash, id) rows."""
    # num_perm from the schema, not len(sig)//n — robust to empty batches
    # (Ray Data can deliver them mid-pipeline).
    num_perm = batch.schema.field("minhash").type.list_size
    if num_perm % num_bands:
        raise ValueError(
            f"num_perm={num_perm} not divisible by num_bands={num_bands}: "
            "trailing permutations would be silently ignored")
    n = batch.num_rows
    if n == 0:
        return pa.table({
            "band": pa.array([], type=pa.int32()),
            "band_hash": pa.array([], type=pa.uint64()),
            id_col: pa.array([], type=batch.schema.field(id_col).type),
        })
    sig = np.asarray(batch.column("minhash").combine_chunks().flatten()
                     .to_numpy(zero_copy_only=False), dtype=np.uint64)
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
        # preserve the id type (upstream lsh_band_batch does too) so
        # singleton buckets don't emit a mismatched int64 schema
        t = batch.schema.field(id_col).type
        return pa.table({id_col: pa.array([], type=t),
                         "dup_of": pa.array([], type=t)})
    return pa.table({id_col: pa.array(ids[1:]),
                     "dup_of": pa.array(np.full(len(ids) - 1, ids[0]))})


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  k: int = 5) -> pa.Table:
    """Append ``simhash`` (int64 — the 64-bit signature reinterpreted).

    Vectorized: one batch shingle pass, per-row distinct via lexsort+diff
    (simhash votes count each distinct shingle once; mix is bijective so
    unique-before-mix == unique-after-mix), then 64 ``bincount`` bit votes
    — bit b is set when strictly more than half the distinct shingles have
    bit b set, matching the scalar ``vote > 0`` rule.
    """
    n = batch.num_rows
    out = np.zeros(n, dtype=np.uint64)
    if n:
        hashes, offs = _shingle_hashes_batch(batch.column(text_col), k)
        row_of = np.repeat(np.arange(n, dtype=np.int64),
                           offs[1:] - offs[:-1])
        order = np.lexsort((hashes, row_of))
        hs, rs = hashes[order], row_of[order]
        keep = np.ones(len(hs), dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
        hs, rs = _mix(hs[keep]), rs[keep]
        cnt = np.bincount(rs, minlength=n)
        for b in range(64):
            ones = np.bincount(
                rs, weights=((hs >> np.uint64(b)) & np.uint64(1)
                             ).astype(np.float64), minlength=n)
            out |= (2 * ones > cnt).astype(np.uint64) << np.uint64(b)
    return set_column(batch,
        "simhash", pa.array(out.view(np.int64), type=pa.int64()))


def _sig_matrix(col) -> np.ndarray:
    """Signature column → (n, num_perm) uint64 matrix.  Accepts the native
    fixed_size_list<uint64> layout or its large_binary join encoding."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        num_perm = arr.type.list_size
        flat = np.asarray(arr.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.uint64)
        return flat.reshape(-1, num_perm)
    n = len(arr)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    nbytes = int(off[1] - off[0]) if n else 0
    idx = (off[:-1, None] + np.arange(nbytes, dtype=np.int64)).ravel()
    return data[idx].reshape(n, nbytes).view(np.uint64)


def sig_to_binary_batch(batch: pa.Table, col: str = "minhash") -> pa.Table:
    """Re-encode the minhash column as large_binary — Acero hash joins do
    not support fixed_size_list payload columns."""
    m = _sig_matrix(batch.column(col))
    n, num_perm = m.shape
    off = np.arange(n + 1, dtype=np.int64) * (num_perm * 8)
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(off.tobytes()),
         pa.py_buffer(np.ascontiguousarray(m).tobytes())])
    return set_column(batch, col, arr)


def estimate_jaccard_batch(batch: pa.Table, col_a: str = "sig_a",
                           col_b: str = "sig_b") -> pa.Table:
    """Append ``jaccard_est``: the fraction of equal minhash components —
    an unbiased estimator of the true shingle-set Jaccard similarity."""
    out = np.zeros(batch.num_rows, dtype=np.float64)
    if batch.num_rows:
        a = _sig_matrix(batch.column(col_a))
        b = _sig_matrix(batch.column(col_b))
        out = (a == b).mean(axis=1)
    return set_column(batch, "jaccard_est", pa.array(out, type=pa.float64()))


def verify_minhash_candidates(pairs, signatures, threshold: float = 0.5,
                              id_col: str = "doc_id",
                              num_partitions: int = 16,
                              broadcast_limit_bytes: int = 256 << 20):
    """Verification stage after LSH bucketing: keep only candidate pairs
    whose *estimated* Jaccard (fraction of equal minhash components) is
    ≥ ``threshold``.

    Plan choice by candidate volume (semi-join reduction):

    * **Broadcast path** (candidate id set × signature bytes under
      ``broadcast_limit_bytes``): the distinct candidate ids filter the
      signature table down to ONLY candidate signatures (a membership
      ``searchsorted`` inside map_batches), that small table ships once
      via ``ray.put``, and one vectorized map over the pairs computes
      the estimate — zero shuffles, the full signature table never
      moves.  LSH emits ~(dup_rate × n) candidates, so this is the
      common case even at corpus scale.
    * **Join path** (huge candidate sets): two Ray Data hash joins
      against the signature table — the exchange moves candidate pairs
      plus ``8 * num_perm`` bytes per document, never the text, so the
      stage stays shuffle-bounded whatever the skew.

    ``pairs``: Dataset[(id_col, dup_of)]; ``signatures``:
    Dataset[(id_col, minhash)].  Returns Dataset[(id_col, dup_of,
    jaccard_est)] filtered to verified pairs.
    """
    import ray
    import ray.data

    pairs = pairs.materialize()      # O(candidate pairs): 16 B/row
    n_cand = pairs.count()
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "dup_of": pa.array([], type=pa.int64()),
                      "jaccard_est": pa.array([], type=pa.float64())})
    if n_cand == 0:
        return ray.data.from_arrow(empty)
    # worst case 2 distinct ids per pair, 520 B of signature each
    if n_cand * 2 * 528 <= broadcast_limit_bytes:
        pdf = pairs.to_pandas()
        ids = np.unique(np.concatenate([
            pdf[id_col].to_numpy(np.int64), pdf["dup_of"].to_numpy(np.int64)]))
        ids_ref = ray.put(ids)

        def _member(batch: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)
            did = batch.column(id_col).to_numpy()
            pos = np.clip(np.searchsorted(want, did), 0, len(want) - 1)
            return batch.filter(pa.array(want[pos] == did))

        refs = (signatures.map_batches(_member, batch_format="pyarrow")
                .to_arrow_refs())
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:       # no candidate id has a signature row
            return ray.data.from_arrow(empty)
        sig_small = pa.concat_tables(tables)
        sig_ids = sig_small.column(id_col).to_numpy()
        order = np.argsort(sig_ids)
        mat = _sig_matrix(sig_small.column("minhash"))[order]
        lut_ref = ray.put((sig_ids[order], mat))

        def _est(batch: pa.Table) -> pa.Table:
            sids, m = ray.get(lut_ref)
            a = batch.column(id_col).to_numpy()
            b = batch.column("dup_of").to_numpy()
            ia = np.minimum(np.searchsorted(sids, a), len(sids) - 1)
            ib = np.minimum(np.searchsorted(sids, b), len(sids) - 1)
            # pairs whose id has no signature row are dropped, matching
            # the hash-join plan (inner joins drop them)
            ok = (sids[ia] == a) & (sids[ib] == b)
            est = np.zeros(len(a), dtype=np.float64)
            if ok.any():
                est[ok] = (m[ia[ok]] == m[ib[ok]]).mean(axis=1)
            keep = ok & (est >= threshold)
            return pa.table({
                id_col: batch.column(id_col).filter(pa.array(keep)),
                "dup_of": batch.column("dup_of").filter(pa.array(keep)),
                "jaccard_est": pa.array(est[keep], type=pa.float64())})

        out = pairs.map_batches(_est, batch_format="pyarrow")
        # normalize: filtered-empty blocks must still carry the 3-col schema
        return out.union(ray.data.from_arrow(empty))
    sig_bin = signatures.map_batches(sig_to_binary_batch,
                                     batch_format="pyarrow")
    # coalesce: grouped candidate output can carry schema-less empty
    # blocks that break the join when partitions outnumber them
    pairs = pairs.repartition(max(1, num_partitions // 2))
    j1 = pairs.join(sig_bin, "inner", num_partitions, on=(id_col,))
    j1 = j1.rename_columns({"minhash": "sig_a"})
    j2 = j1.join(sig_bin, "inner", num_partitions,
                 on=("dup_of",), right_on=(id_col,), right_suffix="_r")
    j2 = j2.rename_columns({"minhash": "sig_b"})
    est = j2.map_batches(estimate_jaccard_batch, batch_format="pyarrow")
    est = est.filter(expr=f"jaccard_est >= {threshold!r}")
    return est.select_columns([id_col, "dup_of", "jaccard_est"])


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
    """Per-batch combiner for exact dedup: min id per distinct *fingerprint*.

    The text is hashed to a 64-bit fingerprint inside the combiner
    (vectorized, :func:`..functions.textstats.fingerprint64_array`) so the
    global ``groupby("fp64").min(id)`` exchange moves 16 bytes per distinct
    document instead of the document body — at 100 TB the shuffle payload
    is ids + hashes, not the corpus.  A 64-bit hash over ~10^10 documents
    has ~3·10^-4 expected colliding *pairs per 10^10 docs* (birthday bound
    n²/2^65); collisions only ever merge two distinct documents into one
    keep-group, never drop all copies.
    """
    from ..functions.textstats import fingerprint64_array

    fp = fingerprint64_array(batch.column(text_col)).view(np.int64)
    t = pa.table({"fp64": pa.array(fp, type=pa.int64()),
                  id_col: batch.column(id_col)})
    return (t.group_by("fp64", use_threads=False)
             .aggregate([(id_col, "min")])
             .rename_columns(["fp64", id_col]))


def _cc_driver(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Exact min-label connected components of an in-memory edge list:
    vectorized label propagation with pointer jumping (path halving) —
    O(E) per round, O(log n) rounds.  Returns (node, cluster) for every
    node in the edge list, cluster = min reachable node id."""
    ids = np.unique(np.concatenate([a, b]))
    la = np.searchsorted(ids, a)
    lb = np.searchsorted(ids, b)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, la, lab[lb])
        np.minimum.at(nxt, lb, lab[la])
        nxt = nxt[nxt]                      # pointer jumping
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    return pa.table({"node": pa.array(ids),
                     "cluster": pa.array(ids[lab])})


def connected_components(pairs, id_col: str = "doc_id",
                         dup_col: str = "dup_of", max_iters: int = 20,
                         num_partitions: int = 8,
                         driver_limit_bytes: int = 256 << 20):
    """Transitive dedup clusters from a near-dup pair list: every document
    is labeled with the minimum doc id reachable through pair edges
    (min-label propagation), so a cluster keeps exactly one representative.

    Iterative Ray Data algorithm — per round, each node takes the min of
    its own label and its neighbors' labels:

      messages = edges ⋈ labels (both directions) ∪ current labels
      labels'  = messages.groupby(node).min(label)

    Rounds needed = graph diameter; near-dup clusters are dense (star/
    clique-like around LSH pivots), so 3-5 rounds converge in practice.
    Convergence is detected exactly with ONE scalar sum aggregate per
    round: labels only ever decrease, so an unchanged label sum is a
    fixpoint.  All exchanges carry (int64, int64) rows only.

    Returns Dataset[(id_col, cluster)] for every node that appears in
    ``pairs``; singleton documents (no pair) are their own cluster by
    definition and need no rows.
    """
    import ray.data

    def _norm_labels(t: pa.Table) -> pa.Table:
        # groupby can emit schema-less empty blocks; a later join on such
        # a block fails with "no match for FieldRef" — normalize every
        # block to the exact (node, label) schema.
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "label": pa.array([], type=pa.int64())})
        if "min(label)" in t.column_names:
            t = t.rename_columns(
                ["label" if c == "min(label)" else c for c in t.column_names])
        if "label" not in t.column_names:
            t = t.append_column("label", t.column("node"))
        return pa.table({"node": t.column("node").cast(pa.int64()),
                         "label": t.column("label").cast(pa.int64())})

    def _norm_edges(t: pa.Table) -> pa.Table:
        # same quirk as _norm_labels, seen on the INPUT side: an empty
        # block upstream of a lazy select_columns can surface with the
        # producer's full schema (e.g. a verify stage's 5 columns), and
        # that stray schema then breaks the union/groupby key resolution
        # — rebuild every block to exactly (id_col, dup_col).
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             dup_col: pa.array([], type=pa.int64())})
        return pa.table({id_col: t.column(id_col).cast(pa.int64()),
                         dup_col: t.column(dup_col).cast(pa.int64())})

    edges = (pairs.map_batches(_norm_edges, batch_format="pyarrow")
             .repartition(num_partitions).materialize())
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "cluster": pa.array([], type=pa.int64())}))
    # Size-adaptive plan (same principle as verify_minhash_candidates):
    # a near-dup edge list is ~dup_rate x corpus, so it usually fits the
    # driver budget — one vectorized pointer-jumping pass there beats
    # paying 2 joins + groupby + materialize of Ray operator startup per
    # propagation round.  Bigger graphs run the distributed loop below.
    if n_edges * 16 <= driver_limit_bytes:
        pdf = edges.to_pandas()
        out = _cc_driver(pdf[id_col].to_numpy(np.int64),
                         pdf[dup_col].to_numpy(np.int64))
        return ray.data.from_arrow(out.rename_columns([id_col, "cluster"]))
    a = edges.select_columns([id_col]).rename_columns({id_col: "node"})
    b = edges.select_columns([dup_col]).rename_columns({dup_col: "node"})
    # repartition after each groupby: grouped outputs contain schema-less
    # empty blocks that make a downstream join fail with "no match for
    # FieldRef" whenever num_partitions exceeds the non-empty block count;
    # coalescing removes them (map_batches alone does NOT — Ray skips the
    # UDF on schema-less empties).
    labels = a.union(b).groupby("node").min("node").select_columns(["node"])
    labels = labels.map_batches(
        _norm_labels, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    for _ in range(max_iters):
        # neighbor labels in both edge directions
        m1 = (edges.join(labels, "inner", num_partitions,
                         on=(id_col,), right_on=("node",))
              .select_columns([dup_col, "label"])
              .rename_columns({dup_col: "node"}))
        m2 = (edges.join(labels, "inner", num_partitions,
                         on=(dup_col,), right_on=("node",))
              .select_columns([id_col, "label"])
              .rename_columns({id_col: "node"}))
        new_labels = (labels.union(m1).union(m2)
                      .groupby("node").min("label")
                      .map_batches(_norm_labels, batch_format="pyarrow")
                      .repartition(num_partitions)
                      .materialize())
        # Convergence via one scalar aggregate: labels only ever DECREASE
        # (new = min(old, neighbors)), so the label sum strictly drops on
        # any change and equal sums mean a fixpoint — no per-round join.
        new_sum = new_labels.sum("label")
        old_sum = labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:
            break
    return labels.rename_columns({"node": id_col, "label": "cluster"})
