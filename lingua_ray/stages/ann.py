"""Similarity search over embedding columns (``list<float>``).

* **Brute-force cosine top-k** — the baseline: per-batch NumPy matmul
  against a broadcast query matrix (closure-captured / ``ray.put`` once —
  never re-shipped per batch), local top-k inside ``map_batches``, tiny
  global reduce at the driver.  Scales as a single streaming pass.
* **Random-hyperplane LSH buckets** — the scale path: 16-bit sign-bucket per
  vector (fixed seeded hyperplanes), prune to the query's bucket
  neighborhood before exact scoring.
* **Embedding near-duplicate detection** — bucket → within-bucket pairwise
  cosine ≥ τ pairs via ``groupby(bucket).map_groups``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PLANE_SEED = 1234


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def hyperplanes(dim: int, n_planes: int = 16) -> np.ndarray:
    rng = np.random.RandomState(_PLANE_SEED)
    return rng.standard_normal((n_planes, dim))


def bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1).astype(np.int32)


class BruteForceTopK:
    """map_batches task: local top-k cosine rows against the query matrix."""

    def __init__(self, query: np.ndarray, k: int = 10,
                 id_col: str = "vec_id", col: str = "embedding"):
        q = np.atleast_2d(np.asarray(query, dtype=np.float64))
        self.q = _normalize(q)
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(batch, self.col))
        ids = batch.column(self.id_col).to_numpy()
        sims = m @ self.q.T  # (n, q)
        out_ids, out_q, out_cos = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            top = np.argpartition(-s, k - 1)[:k] if k else np.zeros(0, int)
            out_ids.append(ids[top])
            out_q.append(np.full(k, qi, dtype=np.int32))
            out_cos.append(s[top])
        return pa.table({
            self.id_col: pa.array(np.concatenate(out_ids)),
            "query_id": pa.array(np.concatenate(out_q)),
            "cos": pa.array(np.concatenate(out_cos), type=pa.float64()),
        })


def knn_bruteforce(ds, query: np.ndarray, k: int = 10,
                   id_col: str = "vec_id") -> pa.Table:
    """Global top-k: streaming local top-k, then a tiny driver-side reduce."""
    partial = ds.map_batches(
        BruteForceTopK(query, k, id_col), batch_format="pyarrow")
    rows = partial.take_all()
    if not rows:
        return pa.table({id_col: [], "query_id": [], "cos": []})
    ids = np.array([r[id_col] for r in rows])
    qid = np.array([r["query_id"] for r in rows])
    cos = np.array([r["cos"] for r in rows])
    out_i, out_q, out_c = [], [], []
    for qi in np.unique(qid):
        sel = qid == qi
        order = np.lexsort((ids[sel], -cos[sel]))[:k]
        out_i.append(ids[sel][order])
        out_q.append(np.full(len(order), qi, dtype=np.int32))
        out_c.append(cos[sel][order])
    return pa.table({
        id_col: pa.array(np.concatenate(out_i)),
        "query_id": pa.array(np.concatenate(out_q)),
        "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
    })


def add_lsh_bucket(batch: pa.Table, dim: int, n_planes: int = 16,
                   col: str = "embedding") -> pa.Table:
    m = _embedding_matrix(batch, col)
    planes = hyperplanes(dim, n_planes)
    return batch.append_column("bucket", pa.array(bucket_ids(m, planes)))


def knn_lsh(ds, query: np.ndarray, dim: int, k: int = 10,
            n_planes: int = 8, id_col: str = "vec_id") -> pa.Table:
    """LSH-pruned top-k: score only vectors whose bucket is within Hamming
    distance 1 of the query's bucket."""
    planes = hyperplanes(dim, n_planes)
    qb = int(bucket_ids(np.atleast_2d(query), planes)[0])
    near = {qb} | {qb ^ (1 << i) for i in range(n_planes)}
    near_arr = np.array(sorted(near), dtype=np.int32)

    def prune(batch: pa.Table) -> pa.Table:
        b = add_lsh_bucket(batch, dim, n_planes)
        mask = np.isin(b.column("bucket").to_numpy(), near_arr)
        return b.filter(pa.array(mask))

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return knn_bruteforce(pruned, query, k, id_col)


def neardup_pairs_group(batch: pa.Table, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        col: str = "embedding") -> pa.Table:
    """Within one LSH bucket: all pairs with cosine >= threshold."""
    m = _normalize(_embedding_matrix(batch, col))
    ids = batch.column(id_col).to_numpy()
    sims = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    hit = sims[iu] >= threshold
    a, b = ids[iu[0][hit]], ids[iu[1][hit]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({id_col: pa.array(hi), "dup_of": pa.array(lo),
                     "cos": pa.array(sims[iu][hit], type=pa.float64())})
