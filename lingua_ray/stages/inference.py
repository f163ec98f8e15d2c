"""Batched model inference over an embedding column — actor-pool stage.

The distributed shape of "score every row with a trained model": the
model (here a logistic linear probe, sigmoid(w·x + b) — the standard
quality-classifier head scored over frozen embeddings) is broadcast ONCE
via ``ray.put`` and materialized per ACTOR in ``__init__`` — never
re-shipped per batch — and each ``__call__`` scores a whole Arrow batch
with one BLAS matvec.  Swapping in a real checkpoint (ONNX / torch /
fasttext) only changes ``__init__``; the Ray plumbing — broadcast, actor
pool, zero-copy Arrow batches, optional threshold filter — is identical,
which is the point of the stage.

Weights are deterministic (Knuth multiplicative hash of the dimension
index) so tests and the DuckDB oracle reproduce the exact same model;
scores are rounded to 6 decimals in both engines (the repo-wide float
parity convention, see stages/tfidf.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _embedding_matrix

_KNUTH = 2654435761  # Knuth's multiplicative-hash constant (2^32 / phi)


def golden_weights(dim: int) -> np.ndarray:
    """w_i = frac(i * 2654435761 / 2^32) - 0.5.

    Integer-exact and reproducible in SQL:
    ``((i * 2654435761) % 4294967296) / 4294967296.0 - 0.5``.
    """
    i = np.arange(dim, dtype=np.int64)
    return ((i * _KNUTH) % 2 ** 32) / 2.0 ** 32 - 0.5


class LinearScorer:
    """map_batches actor: appends ``out_col`` = sigmoid(w·x + bias).

    ``weights`` may be an ``ray.ObjectRef`` (broadcast model — resolved
    once here, NOT per batch) or a plain ndarray for direct/test use.
    """

    def __init__(self, weights, bias: float = 0.0, col: str = "embedding",
                 out_col: str = "score"):
        if not isinstance(weights, np.ndarray):
            import ray
            weights = ray.get(weights)
        self.w = np.ascontiguousarray(weights, dtype=np.float64)
        self.bias = float(bias)
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(self.out_col,
                                       pa.array([], type=pa.float64()))
        x = _embedding_matrix(batch, self.col)
        z = x @ self.w + self.bias
        score = np.round(1.0 / (1.0 + np.exp(-z)), 6)
        return batch.append_column(self.out_col,
                                   pa.array(score, type=pa.float64()))


def score_embeddings(ds, dim: int, bias: float = 0.1,
                     col: str = "embedding", out_col: str = "score",
                     keep_above: float | None = None, concurrency: int = 4):
    """Score every row with the deterministic linear probe; optionally
    keep only rows with ``out_col`` > ``keep_above`` (the quality-filter
    composition).  Shuffle-free: broadcast + actor pool + map-side
    filter."""
    import ray

    ref = ray.put(golden_weights(dim))
    out = ds.map_batches(
        LinearScorer, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"weights": ref, "bias": bias, "col": col,
                               "out_col": out_col})
    if keep_above is not None:
        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.filter(pc.greater(batch.column(out_col),
                                           keep_above))
        out = out.map_batches(keep, batch_format="pyarrow")
    return out


def linear_stats_batch(batch: pa.Table, col: str = "embedding",
                       label_col: str = "label") -> pa.Table:
    """Per-block sufficient statistics for a linear least-squares fit:
    (i, j, v) rows of the block's X^T X plus (i, j=-1, v) rows of
    X^T y.

    This is how model FITTING distributes at corpus scale: each block
    collapses to d^2 + d numbers no matter how many rows it holds, the
    global exchange is a (i, j)-keyed sum over ~d^2 keys, and the solve
    happens once on the driver (:func:`fit_ridge`).  At 100 TB the
    training pass is one streaming map + a KB-sized aggregation.
    """
    if batch.num_rows == 0:
        return pa.table({"i": pa.array([], pa.int32()),
                         "j": pa.array([], pa.int32()),
                         "v": pa.array([], pa.float64())})
    x = _embedding_matrix(batch, col)
    y = batch.column(label_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
    d = x.shape[1]
    xtx = x.T @ x
    xty = x.T @ y
    i = np.concatenate([np.repeat(np.arange(d, dtype=np.int32), d),
                        np.arange(d, dtype=np.int32)])
    j = np.concatenate([np.tile(np.arange(d, dtype=np.int32), d),
                        np.full(d, -1, dtype=np.int32)])
    v = np.concatenate([xtx.ravel(), xty])
    return pa.table({"i": pa.array(i), "j": pa.array(j),
                     "v": pa.array(v)})


def fit_ridge(ds, dim: int, l2: float = 0.0, col: str = "embedding",
              label_col: str = "label") -> np.ndarray:
    """Distributed ridge regression via the normal equations:
    ``w = (X^T X + l2·I)^-1 X^T y`` with the sufficient statistics
    aggregated across the cluster (see :func:`linear_stats_batch`) and
    the (d × d) solve on the driver.  Returns the weight vector."""
    stats = ds.map_batches(linear_stats_batch, batch_format="pyarrow",
                           fn_kwargs={"col": col, "label_col": label_col}) \
              .groupby(["i", "j"]).sum("v").take_all()
    xtx = np.zeros((dim, dim), dtype=np.float64)
    xty = np.zeros(dim, dtype=np.float64)
    for r in stats:
        if r["j"] < 0:
            xty[r["i"]] = r["sum(v)"]
        else:
            xtx[r["i"], r["j"]] = r["sum(v)"]
    return np.linalg.solve(xtx + l2 * np.eye(dim), xty)


def pca_stats_batch(batch: pa.Table, col: str = "embedding") -> pa.Table:
    """Per-block sufficient statistics for PCA / whitening: (i, j, v)
    rows of the block's X^T X, (i, -1, v) per-dimension sums, and one
    (-1, -1, n) row-count row.

    The covariance of 10^12 embeddings reduces to d^2 + d + 1 numbers
    per block and one (i, j)-keyed sum — the same sufficient-statistic
    shape as :func:`linear_stats_batch`, so dimensionality reduction /
    whitening costs ONE streaming pass regardless of corpus size; the
    (d x d) eigendecomposition happens once on the driver
    (:func:`fit_pca`)."""
    if batch.num_rows == 0:
        return pa.table({"i": pa.array([], pa.int32()),
                         "j": pa.array([], pa.int32()),
                         "v": pa.array([], pa.float64())})
    x = _embedding_matrix(batch, col)
    n, d = x.shape
    xtx = x.T @ x
    sums = x.sum(axis=0)
    i = np.concatenate([np.repeat(np.arange(d, dtype=np.int32), d),
                        np.arange(d, dtype=np.int32),
                        np.array([-1], dtype=np.int32)])
    j = np.concatenate([np.tile(np.arange(d, dtype=np.int32), d),
                        np.full(d, -1, dtype=np.int32),
                        np.array([-1], dtype=np.int32)])
    v = np.concatenate([xtx.ravel(), sums, [float(n)]])
    return pa.table({"i": pa.array(i), "j": pa.array(j),
                     "v": pa.array(v)})


def fit_pca(ds, dim: int, k: int, col: str = "embedding"):
    """Distributed PCA: sufficient statistics aggregated cluster-wide,
    covariance + eigendecomposition on the driver.  Returns
    (mean[d], eigenvalues[k] descending, components[k, d]) with each
    component's sign canonicalized (largest-|weight| entry positive)
    so the result is partitioning-independent."""
    stats = ds.map_batches(pca_stats_batch, batch_format="pyarrow",
                           fn_kwargs={"col": col}) \
              .groupby(["i", "j"]).sum("v").take_all()
    xtx = np.zeros((dim, dim), dtype=np.float64)
    sums = np.zeros(dim, dtype=np.float64)
    n = 0.0
    for r in stats:
        if r["i"] < 0:
            n = r["sum(v)"]
        elif r["j"] < 0:
            sums[r["i"]] = r["sum(v)"]
        else:
            xtx[r["i"], r["j"]] = r["sum(v)"]
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    mean = sums / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1.0)
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = vecs[:, order].T
    flip = np.sign(comps[np.arange(len(order)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return mean, w[order], comps


def project_embeddings(ds, mean: np.ndarray, comps: np.ndarray,
                       col: str = "embedding",
                       id_col: str = "vec_id"):
    """Project every row onto the fitted components: one broadcast
    (``ray.put`` of mean+components, resolved per task) and one BLAS
    matmul per batch — the 100-TB-safe shape for whitening /
    dimensionality reduction."""
    import ray
    ref = ray.put((np.asarray(mean), np.asarray(comps)))

    def proj(batch: pa.Table) -> pa.Table:
        m, w = ray.get(ref)
        x = _embedding_matrix(batch, col)
        p = (x - m) @ w.T
        cols = {id_col: batch.column(id_col)}
        for c in range(p.shape[1]):
            cols[f"p{c}"] = pa.array(p[:, c])
        return pa.table(cols)

    return ds.map_batches(proj, batch_format="pyarrow")
