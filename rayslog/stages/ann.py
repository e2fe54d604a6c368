"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: the exact baseline — per-batch float64 matmul of
  the corpus block against a broadcast (``ray.put``) normalized query
  matrix, per-batch local top-k, then a tiny global merge.  The corpus
  streams; only q x k rows per batch cross the wire.
- ``ivf_topk``: the scale path — k-means-lite coarse centroids (sampled
  fit on the driver), corpus bucketed by nearest centroid
  (hash-partition by list id), queries probe the ``nprobe`` nearest
  buckets only.  Same output schema; approximate.
- ``cosine_near_dup_pairs``: all corpus pairs with cosine >= threshold
  (embedding near-dup dedup), blockwise matmul against the broadcast
  matrix.  O(n^2) compute but streamed row-block x broadcast — at
  100 TB the broadcast side becomes the IVF buckets.

Scores are rounded to 6 decimals BEFORE thresholding/ranking so the
DuckDB oracle (float64 list_cosine_similarity) agrees bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(batch_col) -> np.ndarray:
    if isinstance(batch_col, pa.ChunkedArray):
        batch_col = batch_col.combine_chunks()
    n = len(batch_col)
    if n == 0:
        return np.zeros((0, 0))
    dim = len(batch_col[0])
    flat = batch_col.values.to_numpy(zero_copy_only=False)
    return np.asarray(flat, dtype=np.float64).reshape(n, dim)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds, query_vecs: np.ndarray, query_ids: np.ndarray,
                     k: int = 10):
    """Exact cosine top-k: (query_id, vec_id, score, rank)."""
    import pandas as pd
    import ray

    qn = _norm_rows(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids)))

    class Score:
        def __init__(self):
            self.qn, self.qids = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            m = _norm_rows(_matrix(batch.column("embedding")))
            scores = np.round(m @ self.qn.T, 6)  # (n, q)
            n, q = scores.shape
            kk = min(k, n)
            out_q, out_v, out_s = [], [], []
            for j in range(q):
                # deterministic local top-k: (score desc, vec_id asc) so a
                # tie at the k-boundary keeps the same row the global
                # merge (and the SQL oracle) would keep
                rows = np.lexsort((ids, -scores[:, j]))[:kk]
                out_q.extend([self.qids[j]] * kk)
                out_v.extend(ids[rows])
                out_s.extend(scores[rows, j])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(np.array(out_v, dtype=np.int64)),
                    "score": pa.array(np.array(out_s, dtype=np.float64)),
                }
            )

    partial = ds.map_batches(
        Score, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), batch_size=8_192,
    )

    def global_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "vec_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(
        global_merge, batch_format="pandas"
    )


def ivf_topk(ds, query_vecs: np.ndarray, query_ids: np.ndarray,
             k: int = 10, n_centroids: int = 16, nprobe: int = 4,
             sample_rows: int = 4_096, seed: int = 42):
    """IVF-style ANN: bucket the corpus by coarse centroid, probe a few.

    Centroids are fit on a driver-side sample (10 k-means-lite rounds);
    the assignment pass adds a ``bucket`` column; scoring filters each
    batch to rows whose bucket is probed by ANY query, then scores as in
    brute force.  Approximate: recall depends on nprobe/n_centroids.
    """
    import pandas as pd
    import ray

    sample = ds.limit(sample_rows).to_pandas()
    sm = _norm_rows(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    )
    rng = np.random.default_rng(seed)
    cents = sm[rng.choice(len(sm), size=min(n_centroids, len(sm)), replace=False)]
    for _ in range(10):
        assign = np.argmax(sm @ cents.T, axis=1)
        for c in range(len(cents)):
            pts = sm[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    qn = _norm_rows(np.asarray(query_vecs, dtype=np.float64))
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (q, nprobe)
    probed = set(probes.reshape(-1).tolist())
    ref = ray.put((qn, np.asarray(query_ids), cents, probes))

    class ScoreIVF:
        def __init__(self):
            self.qn, self.qids, self.cents, self.probes = ray.get(ref)
            self.probe_sets = [set(p.tolist()) for p in self.probes]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            m = _norm_rows(_matrix(batch.column("embedding")))
            bucket = np.argmax(m @ self.cents.T, axis=1)
            keep = np.isin(bucket, list(probed))
            ids, m, bucket = ids[keep], m[keep], bucket[keep]
            scores = np.round(m @ self.qn.T, 6)
            out_q, out_v, out_s = [], [], []
            kk = min(k, len(ids)) or 0
            for j in range(scores.shape[1] if len(ids) else 0):
                mask = np.fromiter(
                    (b in self.probe_sets[j] for b in bucket),
                    bool, len(bucket),
                )
                sj = scores[mask, j]
                vj = ids[mask]
                if not len(sj):
                    continue
                top = np.argsort(-sj)[:kk]
                out_q.extend([self.qids[j]] * len(top))
                out_v.extend(vj[top])
                out_s.extend(sj[top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(np.array(out_v, dtype=np.int64)),
                    "score": pa.array(np.array(out_s, dtype=np.float64)),
                }
            )

    partial = ds.map_batches(
        ScoreIVF, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), batch_size=8_192,
    )

    def global_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(
        global_merge, batch_format="pandas"
    )


def cosine_near_dup_pairs(ds, threshold: float = 0.95):
    """All (vec_a, vec_b, score) corpus pairs with cosine >= threshold."""
    import ray

    full = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = full["vec_id"].to_numpy()
    mat = _norm_rows(np.stack(full["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((ids, mat))

    class Pairs:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            m = _norm_rows(_matrix(batch.column("embedding")))
            scores = np.round(m @ self.mat.T, 6)
            rows, cols = np.nonzero(scores >= threshold)
            keep = a_ids[rows] < self.ids[cols]  # upper triangle only
            rows, cols = rows[keep], cols[keep]
            return pa.table(
                {
                    "vec_a": pa.array(a_ids[rows].astype(np.int64)),
                    "vec_b": pa.array(self.ids[cols].astype(np.int64)),
                    "score": pa.array(scores[rows, cols], pa.float64()),
                }
            )

    return ds.map_batches(
        Pairs, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), batch_size=4_096,
    )
