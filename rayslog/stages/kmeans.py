"""Distributed k-means over an embedding column (semantic bucketing).

The standard curation primitive the ANN/IVF path trains privately
(ann.py:_kmeans, driver-side over a sample): here it is the public,
fully-distributed operator — every iteration is

  broadcast centroids (ray.put, once per iteration)
    -> map_batches partial sums: per-batch (k x d) vector sums + k
       counts, one tiny row per batch (payload never leaves the block)
    -> one combine map_batches level (one row per partial BLOCK, so the
       driver sees ~#blocks/batch_size rows, kilobytes at any corpus
       size; a deeper task tree is only needed past ~10^6 blocks)
    -> driver centroid update (k x d doubles — O(model), not O(corpus))

No shuffle anywhere: the corpus is read ``iters + 1`` times and only
centroids move.  Assignment metric is cosine; centroid update is the
plain coordinate mean of assigned RAW vectors (Lloyd).  Determinism
contract with the DuckDB oracle (sqloracle.py `embed_kmeans`): all
math in float64, cosine scores AND updated centroids rounded to 6
decimals each iteration (the ann.py convention), argmax ties broken by
smallest cluster id, empty clusters keep their previous centroid.
Init = the k lowest-vec_id vectors (deterministic, oracle-sharable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _stack(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False)
    n = len(col)
    return np.asarray(flat, dtype=np.float64).reshape(n, -1)


def _cosine_scores(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """round-6 cosine of every row of m against every centroid."""
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-300
    )
    return np.round(mn @ cn.T, 6)  # (n, k)


def _argmax_first(scores: np.ndarray) -> np.ndarray:
    """Index of the max score per row, FIRST (lowest cluster id) on
    ties — np.argmax's documented tie rule, relied on by the oracle's
    ``ORDER BY score DESC, cluster`` row_number."""
    return np.argmax(scores, axis=1)


def kmeans_iterate(
    ds,
    init_centroids: np.ndarray,
    iters: int,
    embedding_col: str = "embedding",
) -> np.ndarray:
    """Run ``iters`` Lloyd rounds; returns the final (k, d) centroids.

    The corpus materializes ONCE; every round is raw per-block partial
    tasks + a (k x d)-model fan-in tree over their (sums, counts) —
    no Dataset executor spin-up per iteration (the dominant fixed cost
    at small scale, ~0.3s x iters; measured r4)."""
    import ray

    from rayslog.stages.aggregate import live_block_refs

    cents = np.round(np.asarray(init_centroids, dtype=np.float64), 6)
    k, d = cents.shape
    mat = ds.materialize()
    refs = live_block_refs(mat)

    @ray.remote
    def block_partial(block, c):
        t = (
            block
            if isinstance(block, pa.Table)
            else pa.Table.from_pandas(block, preserve_index=False)
        )
        m = _stack(t.column(embedding_col))
        assign = _argmax_first(_cosine_scores(m, c))
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, m)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        return sums, counts

    @ray.remote
    def combine_sc(*pairs):
        return (
            np.sum([p[0] for p in pairs], axis=0),
            np.sum([p[1] for p in pairs], axis=0),
        )

    for _ in range(iters):
        if not refs:
            break
        ref = ray.put(cents)
        out = [block_partial.remote(r, ref) for r in refs]
        while len(out) > 1:  # model-sized fan-in, driver sees ONE pair
            out = [
                combine_sc.remote(*out[i : i + 16])
                for i in range(0, len(out), 16)
            ]
        sums, counts = ray.get(out[0])
        nonzero = counts > 0
        new = cents.copy()
        new[nonzero] = np.round(
            sums[nonzero] / counts[nonzero, None], 6
        )
        cents = new
    return cents


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
):
    """(id, cluster, score) for every row — broadcast centroids, one
    vectorized pass, no shuffle."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _stack(t.column(embedding_col))
        scores = _cosine_scores(m, c)
        a = _argmax_first(scores)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
                "score": pa.array(scores[np.arange(len(a)), a]),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def kmeans(
    ds,
    init_centroids: np.ndarray,
    iters: int = 2,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
):
    """Run ``iters`` Lloyd rounds from ``init_centroids`` (callers
    fetch a deterministic seed via a pushdown read — e.g.
    pipeline._query_vectors, never a corpus scan) and return the
    assignment dataset (id, cluster, score).

    The corpus is read ``iters + 1`` times by construction; one
    ``materialize()`` pins the projected blocks in the (spillable)
    object store so only the FIRST pass touches parquet."""
    ds = ds.materialize()
    cents = kmeans_iterate(
        ds, init_centroids, iters, embedding_col=embedding_col
    )
    return kmeans_assign(ds, cents, id_col=id_col, embedding_col=embedding_col)
