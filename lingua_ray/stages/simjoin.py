"""Exact n-gram Jaccard similarity self-join (prefix-filtered).

The brief's dedup family names *n-gram Jaccard* alongside MinHash/SimHash;
MinHash (:mod:`.dedup`) only *estimates* the shingle Jaccard.  This stage
computes the EXACT set Jaccard for every document pair above a threshold,
with the candidate space pruned by the published prefix-filtering bound
(Chaudhuri et al. SSJoin / Xiao et al. PPJoin; the distributed layout
follows Vernica et al., "Efficient Parallel Set-Similarity Joins Using
MapReduce", SIGMOD 2010 — all public work):

    two sets with Jaccard >= t share at least one element among the first
    ``n - ceil(t*n) + 1`` elements of each set under ANY fixed global
    ordering of the element universe.

Pipeline (all Ray Data primitives, text never rides a shuffle):

1. ``map_batches(ShingleSets)`` — one vectorized shingle pass per batch
   (reusing :func:`.dedup._shingle_hashes_batch`): per doc the sorted
   DISTINCT k-shingle 64-bit hashes, packed into one ``large_binary``
   cell (``set_bin``) plus the set size ``n``.  8 bytes/shingle is the
   most that ever moves.
1b. stop-shingle census — per-block ``np.unique`` partial document
   frequencies, a vocab-sized ``groupby(g).sum``, filtered to shingles
   with df >= ``df_cutoff``.  That table is tiny (<= total_occurrences /
   df_cutoff rows) and is broadcast once with ``ray.put``.  It fixes the
   PPJoin global element ORDER: infrequent shingles (df treated as 0)
   first by hash, frequent shingles last by ascending df — so prefixes
   are made of RARE shingles and stop-shingle segments never reach the
   candidate stage.  Any fixed global order is correct; df order is the
   one that prunes (Xiao et al.; Vernica et al. broadcast the same
   ordering).
2. ``map_batches(prefix rows)`` — re-rank each doc's set under that
   order and explode only the length-``n - ceil(t*n) + 1`` prefix into
   (g, doc_id, n) rows.
3. ``groupby(bkt).map_groups`` over HASH BUCKETS of g (not per-g groups —
   one Python call per shingle would dominate wall time): inside a bucket
   one ``lexsort`` finds the g-segments and a vectorized repeat/cumsum
   expansion emits candidate pairs (a < b) per segment, pruned by the
   length filter ``t * max(na, nb) <= min(na, nb)`` (J <= min/max, so
   unbalanced sizes can never reach t).
4. ``groupby(pair).count`` — dedup candidates found via several shingles
   (pre-deduped inside each bucket first, so the exchange carries each
   pair once per bucket at most).
5. exact verification, two interchangeable layouts chosen by the size
   of the (doc_id, n, set_bin) table — which is spilled ONCE to parquet
   (never pinned in the object store; the shingle pass runs once and
   every consumer re-reads the spill, the same pattern as the minhash
   signature spill):
   * ``broadcast`` (sets table under ``broadcast_limit_bytes``): one
     ``ray.put`` of (ids, offsets, flat hashes); candidates stream
     through ``map_batches`` doing local lookups — no pair-sized
     exchange at all.
   * ``join`` (the 100-TB path): two hash joins against the spilled set
     table (same shape as :func:`.dedup.verify_minhash_candidates`),
     so each exchange carries only candidate pairs × set payloads.
   Either way the intersection count is vectorized and ADAPTIVE: when a
   verification batch's local shingle vocabulary is small (template-
   heavy corpora — the dense regime), each doc becomes a bool row over
   the batch vocabulary and intersections are chunked ``&``-reductions;
   otherwise one lexsort over the concatenated tagged runs counts
   adjacent duplicates (the sparse regime).  No Python loop over pairs
   in either regime.

Scale notes: the frequent-shingle table is the only driver-side
materialization and is bounded by ``total_shingle_occurrences /
df_cutoff`` — at 100 TB pick df_cutoff so that stays broadcastable
(e.g. df_cutoff=10^4 over 10^10 docs -> <=10^10 rows... cap instead by
taking the TOP-F shingles via the existing heavy-hitter sketch if the
tail is fat; the order only has to be FIXED, not exact).  Candidate
segments are bounded by df_cutoff within the infrequent class.  Hash
collisions: 64-bit shingle hashes make a wrong-pair
intersection miscount a ~n_union^2/2^65 event per pair — negligible, and
candidate-side collisions only ever ADD candidates that verification then
scores exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .dedup import _shingle_hashes_batch
from .util import round_half_away, set_column

__all__ = ["jaccard_similarity_join", "shingle_set_batch"]


def _pack_binary(arrays_flat: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Pack row-sliced uint64 hash runs into a large_binary column."""
    byte_off = offsets.astype(np.int64) * 8
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(offsets) - 1,
        [None, pa.py_buffer(byte_off.tobytes()),
         pa.py_buffer(np.ascontiguousarray(arrays_flat).tobytes())])


def _unpack_binary(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`_pack_binary`: (flat uint64, row offsets)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                        count=len(arr) + 1, offset=arr.offset * 8)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    flat = data[off[0]:off[-1]].view(np.uint64)
    return flat, (off - off[0]) // 8


def shingle_set_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 5) -> pa.Table:
    """(doc_id, n, set_bin): sorted distinct k-shingle hashes per doc."""
    nrows = batch.num_rows
    if nrows == 0:
        return pa.table({
            id_col: pa.array([], type=batch.schema.field(id_col).type),
            "n": pa.array([], type=pa.int64()),
            "set_bin": pa.array([], type=pa.large_binary())})
    h, offs = _shingle_hashes_batch(batch.column(text_col), k)
    row = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(offs))
    order = np.lexsort((h, row))
    rs, hs = row[order], h[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    rs, hs = rs[keep], hs[keep]
    n_per = np.bincount(rs, minlength=nrows).astype(np.int64)
    out_offs = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(n_per, out=out_offs[1:])
    return pa.table({
        id_col: batch.column(id_col),
        "n": pa.array(n_per, type=pa.int64()),
        "set_bin": _pack_binary(hs, out_offs)})


def _partial_df(batch: pa.Table) -> pa.Table:
    """Per-block partial document frequencies of distinct shingles."""
    flat, _ = _unpack_binary(batch.column("set_bin"))
    g, c = np.unique(flat, return_counts=True)
    return pa.table({"g": pa.array(g.view(np.int64), type=pa.int64()),
                     "c": pa.array(c.astype(np.int64), type=pa.int64())})


def _prefix_rows(threshold: float, id_col: str, num_buckets: int,
                 freq_ref):
    def explode(batch: pa.Table) -> pa.Table:
        freq_g, freq_df = ray.get(freq_ref)
        flat, offs = _unpack_binary(batch.column("set_bin"))
        n = np.diff(offs)
        # PPJoin global order: df rank ascending (infrequent shingles
        # rank 0), hash breaks ties.  Re-sort each doc's run under it.
        pos = np.searchsorted(freq_g, flat)
        pos = np.minimum(pos, max(len(freq_g) - 1, 0))
        rank = np.zeros(len(flat), dtype=np.int64)
        if len(freq_g):
            hit = freq_g[pos] == flat
            rank[hit] = freq_df[pos[hit]]
        row = np.repeat(np.arange(len(n), dtype=np.int64), n)
        order = np.lexsort((flat, rank, row))
        flat = flat[order]
        p = n - np.ceil(threshold * n).astype(np.int64) + 1
        p = np.minimum(np.maximum(p, 0), n)
        tot = int(p.sum())
        within = (np.arange(tot, dtype=np.int64)
                  - np.repeat(np.concatenate([[0], np.cumsum(p)[:-1]]), p))
        idx = np.repeat(offs[:-1], p) + within
        ids = batch.column(id_col).to_numpy()
        g = flat[idx]
        # Fibonacci-mix before the modulo so bucket sizes stay flat even
        # for adversarially-clustered shingle hashes.
        bkt = ((g * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) \
            % np.uint64(num_buckets)
        return pa.table({
            "bkt": pa.array(bkt.astype(np.int64), type=pa.int64()),
            "g": pa.array(g.view(np.int64), type=pa.int64()),
            id_col: pa.array(np.repeat(ids, p)),
            "n": pa.array(np.repeat(n, p), type=pa.int64()),
            # position of this shingle in the doc's global-order ranking —
            # the PPJoin positional filter's input
            "p": pa.array(within, type=pa.int64())})
    return explode


def _pair_gen(threshold: float, id_col: str):
    """Candidate pairs for one hash bucket of prefix shingles.

    One lexsort over the bucket splits it into per-g segments; pairs are
    expanded with repeat/cumsum arithmetic — no Python loop over shingles
    or pairs.

    Two published prunes run on the expanded instances:

    * length filter — ``t * max(na, nb) <= min(na, nb)`` (J <= min/max);
    * PPJoin positional filter (Xiao et al., WWW'08) — a pair sharing
      shingle g at positions (pa, pb) of the two ordered sets can have at
      most ``min(na - pa, nb - pb)`` common elements (g is common, and
      every other common element sorts after it in BOTH sets when g is
      the first shared one), so it must satisfy
      ``min(na - pa, nb - pb) >= ceil(t/(1+t) * (na+nb))``.  For a TRUE
      pair the instance at its first shared prefix shingle always passes,
      so keeping pairs where any instance passes loses nothing; on
      template-heavy corpora (many docs sharing mid-frequency shingles
      deep in their prefixes) this cuts candidates by orders of
      magnitude."""
    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"dup_of": pa.array([], type=pa.int64()),
                          id_col: pa.array([], type=pa.int64())})
        g = group.column("g").to_numpy()
        ids = group.column(id_col).to_numpy()
        ns = group.column("n").to_numpy()
        ps = group.column("p").to_numpy()
        order = np.lexsort((ids, g))
        g, ids, ns, ps = g[order], ids[order], ns[order], ps[order]
        total = len(g)
        if total < 2:
            return empty
        # rows after this one in the same g-segment
        seg_start = np.zeros(total, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = g[1:] != g[:-1]
        seg_id = np.cumsum(seg_start) - 1
        seg_sizes = np.bincount(seg_id)
        seg_end = np.cumsum(seg_sizes)  # exclusive end per segment
        counts = seg_end[seg_id] - np.arange(total) - 1
        npairs = int(counts.sum())
        if npairs == 0:
            return empty
        a = np.repeat(np.arange(total, dtype=np.int64), counts)
        off = np.concatenate([[0], np.cumsum(counts)[:-1]])
        b = a + 1 + (np.arange(npairs, dtype=np.int64)
                     - np.repeat(off, counts))
        na, nb = ns[a], ns[b]
        ok = (threshold * np.maximum(na, nb)) <= np.minimum(na, nb)
        # positional filter: conservative ceil (the -1e-9 keeps borderline
        # float cases rather than dropping them)
        overlap_req = np.ceil(threshold / (1.0 + threshold)
                              * (na + nb) - 1e-9)
        ok &= np.minimum(na - ps[a], nb - ps[b]) >= overlap_req
        if not ok.any():
            return empty
        lo, hi = ids[a[ok]], ids[b[ok]]
        dup_of, doc = np.minimum(lo, hi), np.maximum(lo, hi)
        # within-bucket pair dedup (the same pair can share several
        # prefix shingles) so the pair exchange carries each pair once
        key = np.lexsort((doc, dup_of))
        dup_of, doc = dup_of[key], doc[key]
        keep = np.ones(len(doc), dtype=bool)
        keep[1:] = (dup_of[1:] != dup_of[:-1]) | (doc[1:] != doc[:-1])
        return pa.table({"dup_of": pa.array(dup_of[keep], type=pa.int64()),
                         id_col: pa.array(doc[keep], type=pa.int64())})
    return pairs


_DENSE_VOCAB_MAX = 1 << 16          # batch-local vocab size for dense path
_DENSE_MATRIX_MAX = 1 << 26         # bool cells for the doc × vocab matrix
_DENSE_PAIR_CHUNK = 8192            # pairs per &-reduction slice


def _jaccard_runs(flat: np.ndarray, offs: np.ndarray,
                  ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Exact |A ∩ B| / |A ∪ B| for pairs of runs inside one flat buffer.

    ``flat``/``offs`` hold every doc's sorted-distinct hashes; ``ia``/``ib``
    index the two docs of each pair.  Adaptive (module docstring step 5):
    dense bool-matrix ``&`` when the batch vocabulary is tiny, one lexsort
    over tagged runs otherwise.  No Python loop over pairs."""
    npairs = len(ia)
    if npairs == 0:
        return np.zeros(0, dtype=np.float64)
    n = np.diff(offs)
    na, nb = n[ia], n[ib]
    docs = np.unique(np.concatenate([ia, ib]))
    starts, lens = offs[docs], n[docs]
    gather = (np.repeat(starts, lens)
              + (np.arange(int(lens.sum()), dtype=np.int64)
                 - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]),
                             lens)))
    local = flat[gather]
    vocab = np.unique(local)
    V, D = len(vocab), len(docs)
    if V <= _DENSE_VOCAB_MAX and V * D <= _DENSE_MATRIX_MAX:
        m = np.zeros((D, V), dtype=bool)
        rows = np.repeat(np.arange(D, dtype=np.int64), lens)
        m[rows, np.searchsorted(vocab, local)] = True
        ra = np.searchsorted(docs, ia)
        rb = np.searchsorted(docs, ib)
        inter = np.empty(npairs, dtype=np.int64)
        for s in range(0, npairs, _DENSE_PAIR_CHUNK):
            e = min(s + _DENSE_PAIR_CHUNK, npairs)
            inter[s:e] = (m[ra[s:e]] & m[rb[s:e]]).sum(axis=1)
    else:
        pair_rows = np.concatenate([
            np.repeat(np.arange(npairs, dtype=np.int64), na),
            np.repeat(np.arange(npairs, dtype=np.int64), nb)])
        idx = np.concatenate([ia, ib])
        take = (np.repeat(offs[idx], n[idx])
                + (np.arange(int(n[idx].sum()), dtype=np.int64)
                   - np.repeat(np.concatenate([[0],
                                               np.cumsum(n[idx])[:-1]]),
                               n[idx])))
        hs = flat[take]
        # single-key sort: rank each hash against the batch vocabulary and
        # pack (pair, rank) into one int64 — npairs * V stays under 2^63
        # for any realistic batch, and one np.sort on int64 runs ~2x a
        # two-key lexsort at this size
        V64 = np.int64(V)
        if npairs * V <= (1 << 62):
            key = pair_rows * V64 + np.searchsorted(vocab, hs)
            key.sort()
            dup = key[1:] == key[:-1]
            inter = np.bincount((key[1:][dup] // V64), minlength=npairs)
        else:
            order = np.lexsort((hs, pair_rows))
            rs, hh = pair_rows[order], hs[order]
            dup = (rs[1:] == rs[:-1]) & (hh[1:] == hh[:-1])
            inter = np.bincount(rs[1:][dup], minlength=npairs)
    union = na + nb - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1), 1.0)


def _exact_jaccard_batch(batch: pa.Table) -> pa.Table:
    """Join-path verification: (set_a, set_b) columns carried per pair."""
    npairs = batch.num_rows
    jac = np.zeros(npairs, dtype=np.float64)
    if npairs:
        fa, oa = _unpack_binary(batch.column("set_a"))
        fb, ob = _unpack_binary(batch.column("set_b"))
        flat = np.concatenate([fa, fb])
        offs = np.concatenate([oa, ob[1:] + oa[-1]])
        ia = np.arange(npairs, dtype=np.int64)
        jac = _jaccard_runs(flat, offs, ia, npairs + ia)
    # UNROUNDED: the threshold filter must see the exact value (the SQL
    # oracle filters unrounded too); callers round the reported column
    return set_column(batch, "jaccard", pa.array(jac, type=pa.float64()))


def _verify_broadcast(sets_ref, threshold: float, id_col: str):
    """Broadcast-path verification: candidate pairs never join anything —
    each batch looks both sets up in the ray.put'd (ids, offs, flat)."""
    def verify(batch: pa.Table) -> pa.Table:
        ids_sorted, offs, flat = ray.get(sets_ref)
        dup_of = batch.column("dup_of").to_numpy()
        doc = batch.column(id_col).to_numpy()
        ia = np.searchsorted(ids_sorted, dup_of)
        ib = np.searchsorted(ids_sorted, doc)
        jac = _jaccard_runs(flat, offs, ia, ib)
        keep = jac >= threshold   # UNROUNDED (matches the SQL oracle);
        return pa.table({         # round only the reported column
            id_col: pa.array(doc[keep], type=pa.int64()),
            "dup_of": pa.array(dup_of[keep], type=pa.int64()),
            "jaccard": pa.array(round_half_away(jac[keep]),
                                type=pa.float64())})
    return verify


def jaccard_similarity_join(docs, threshold: float = 0.8, k: int = 5,
                            text_col: str = "text", id_col: str = "doc_id",
                            num_partitions: int = 16, df_cutoff: int = 2,
                            verify: str = "auto",
                            broadcast_limit_bytes: int = 256 << 20,
                            spill_dir: str | None = None):
    """All pairs (dup_of < doc_id) with exact k-shingle Jaccard >= threshold.

    Returns Dataset[(doc_id, dup_of, jaccard)].  See module docstring for
    the algorithm and its partitioning assumptions.  ``verify`` is
    ``"broadcast"`` / ``"join"`` / ``"auto"`` (broadcast iff the packed
    set table is under ``broadcast_limit_bytes``; at 100-TB corpus sizes
    auto always picks the join layout).

    ``spill_dir`` must be empty or nonexistent — the shingle-set table
    is written there and every consumer re-reads the WHOLE directory, so
    stale files from a previous run would corrupt the join.  It must
    outlive consumption of the returned (lazy) Dataset; the default
    mkdtemp under /tmp is NOT auto-deleted for that reason.
    """
    import ray.data as rd

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if verify not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown verify mode {verify!r}")
    if spill_dir is not None:
        from pathlib import Path
        p = Path(spill_dir)
        if p.exists() and any(p.iterdir()):
            raise ValueError(
                f"spill_dir {spill_dir!r} is not empty: read_parquet "
                "would ingest stale set tables from a previous run")
    # one shingle pass, spilled to parquet; every consumer re-reads
    if spill_dir is None:
        import tempfile
        spill_dir = tempfile.mkdtemp(prefix="simjoin_sets_",
                                     dir="/tmp")
    docs.map_batches(
        lambda b: shingle_set_batch(b, text_col=text_col, id_col=id_col,
                                    k=k),
        batch_format="pyarrow").write_parquet(spill_dir)
    sets = rd.read_parquet(spill_dir)
    # stop-shingle census -> broadcast PPJoin ordering (module docstring 1b)
    import pyarrow.compute as pc
    cut = int(df_cutoff)
    freq_tbl = (sets.map_batches(_partial_df, batch_format="pyarrow")
                    .groupby("g").sum("c")
                    .map_batches(
                        lambda t: t.filter(
                            pc.greater_equal(t.column("sum(c)"), cut)),
                        batch_format="pyarrow")
                    .to_pandas())
    if len(freq_tbl) and "g" in freq_tbl.columns:
        fg = freq_tbl["g"].to_numpy().astype(np.int64).view(np.uint64)
        fdf = freq_tbl["sum(c)"].to_numpy().astype(np.int64)
    else:  # no shingle reaches df_cutoff (tiny/disjoint corpora)
        fg = np.zeros(0, dtype=np.uint64)
        fdf = np.zeros(0, dtype=np.int64)
    fo = np.argsort(fg)
    freq_ref = ray.put((fg[fo], fdf[fo]))
    n_buckets = max(num_partitions * 4, 64)
    pfx = sets.map_batches(
        _prefix_rows(threshold, id_col, n_buckets, freq_ref),
        batch_format="pyarrow")
    cand = (pfx.groupby("bkt")
               .map_groups(_pair_gen(threshold, id_col),
                           batch_format="pyarrow")
               .materialize())     # O(candidate pairs): 16 B/row
    # dedup pairs discovered via several shared prefix shingles.  The
    # per-bucket dedup already happened in _pair_gen, so what's left is
    # cross-bucket duplication: when the (already-pruned) pair list fits
    # a driver budget, one np.unique over packed (lo, hi) key pairs beats
    # a full sort-shuffle groupby by ~25x at the 10^6-pair scale; bigger
    # candidate sets fall back to the distributed groupby.
    n_raw = cand.count()
    if n_raw == 0:
        return rd.from_arrow(pa.table({
            "dup_of": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())}))
    if n_raw * 16 <= broadcast_limit_bytes:
        pdf = cand.to_pandas()
        lo = pdf["dup_of"].to_numpy(np.int64)
        hi = pdf[id_col].to_numpy(np.int64)
        keys = np.unique((lo.astype(np.uint64) << np.uint64(32))
                         | hi.astype(np.uint64)) \
            if (lo >= 0).all() and (hi < (1 << 32)).all() and \
               (lo < (1 << 32)).all() else None
        if keys is not None:
            tbl = pa.table({
                "dup_of": pa.array((keys >> np.uint64(32)).astype(np.int64)),
                id_col: pa.array(
                    (keys & np.uint64(0xFFFFFFFF)).astype(np.int64))})
        else:                      # ids outside uint32: structured unique
            packed = np.empty(len(lo), dtype=[("a", np.int64),
                                              ("b", np.int64)])
            packed["a"], packed["b"] = lo, hi
            u = np.unique(packed)
            tbl = pa.table({"dup_of": pa.array(u["a"]),
                            id_col: pa.array(u["b"])})
        cand = rd.from_arrow(tbl).repartition(num_partitions)
    else:
        cand = (cand.groupby(["dup_of", id_col]).count()
                    .select_columns(["dup_of", id_col]))
    if verify == "auto":
        set_bytes = int(sets.sum("n") or 0) * 8 + sets.count() * 24
        verify = "broadcast" if set_bytes <= broadcast_limit_bytes \
            else "join"
    n_cpus = int(ray.cluster_resources().get("CPU", num_partitions))
    if verify == "broadcast":
        # verification CPU is ~linear in candidate pairs and embarrassingly
        # parallel — spread the (already-deduped) pair list over ~4 blocks
        # per core so the verify UDF saturates the machine instead of 16
        # tasks (the join plan repartitions for its own layout below)
        cand = cand.repartition(max(num_partitions, 4 * n_cpus))
        st = sets.to_pandas()
        ids = st[id_col].to_numpy().astype(np.int64)
        order = np.argsort(ids)
        st = st.iloc[order]
        flat = np.frombuffer(b"".join(st["set_bin"]), dtype=np.uint64)
        offs = np.zeros(len(st) + 1, dtype=np.int64)
        np.cumsum(st["n"].to_numpy(), out=offs[1:])
        sets_ref = ray.put((ids[order], offs, flat))
        return cand.map_batches(
            _verify_broadcast(sets_ref, threshold, id_col),
            batch_format="pyarrow")
    sets_j = sets.select_columns([id_col, "set_bin"])
    # each JoinOperator holds num_partitions aggregator actors — two
    # concurrent joins above the CPU count deadlock the actor pool
    num_partitions = max(1, min(
        num_partitions,
        int(ray.cluster_resources().get("CPU", num_partitions)) // 2))
    cand = cand.repartition(max(1, num_partitions // 2))
    j1 = cand.join(sets_j, "inner", num_partitions, on=(id_col,))
    j1 = j1.rename_columns({"set_bin": "set_a"})
    j2 = j1.join(sets_j, "inner", num_partitions,
                 on=("dup_of",), right_on=(id_col,), right_suffix="_r")
    j2 = j2.rename_columns({"set_bin": "set_b"})
    out = j2.map_batches(_exact_jaccard_batch, batch_format="pyarrow")
    out = out.filter(expr=f"jaccard >= {threshold!r}")

    def round_report(batch: pa.Table) -> pa.Table:
        jac = round_half_away(batch.column("jaccard").to_numpy())
        return set_column(batch, "jaccard",
                          pa.array(jac, type=pa.float64()))

    return out.map_batches(round_report, batch_format="pyarrow") \
        .select_columns([id_col, "dup_of", "jaccard"])
