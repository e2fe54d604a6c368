"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: the exact baseline — per-batch float64 matmul of
  the corpus block against a broadcast (``ray.put``) normalized query
  matrix, per-batch local top-k, then a tiny global merge.  The corpus
  streams; only q x k rows per batch cross the wire.
- ``build_ivf_index`` / ``IvfIndex.probe`` / ``ivf_topk``: the scale
  path — a REAL inverted-file index: k-means-lite coarse centroids
  (sampled fit on the driver), then ONE assignment pass that persists
  the corpus as hive-partitioned Parquet (``bucket=K/``).  Probing
  reads ONLY the ``nprobe`` buckets any query needs (pyarrow partition
  pruning skips the other buckets' files entirely — I/O, not just
  compute, scales with nprobe/n_centroids).
- ``cosine_near_dup_pairs``: all corpus pairs with cosine >= threshold
  (embedding near-dup dedup), computed EXACTLY via a block-pair cross
  product over object-store-resident blocks: the corpus is normalized
  once, materialized as Arrow blocks, and each (block_i, block_j) task
  reads two blocks zero-copy — no driver-side matrix, no whole-corpus
  broadcast.  O(B^2) tasks; at 100 TB compose with the IVF buckets (or
  an LSH prefilter) to restrict which block pairs meet, trading
  exactness for candidate pruning.

Scores are rounded to 6 decimals BEFORE thresholding/ranking so the
DuckDB oracle (float64 list_cosine_similarity) agrees bit-for-bit.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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
    import ray

    qn = _norm_rows(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids)))

    def score(batch: pa.Table) -> pa.Table:
        qn, qids = ray.get(q_ref)  # zero-copy plasma read per batch
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = _norm_rows(_matrix(batch.column("embedding")))
        scores = np.round(m @ qn.T, 6)  # (n, q)
        n, q = scores.shape
        kk = min(k, n)
        out_q, out_v, out_s = [], [], []
        for j in range(q):
            # deterministic local top-k: (score desc, vec_id asc) so a
            # tie at the k-boundary keeps the same row the global
            # merge (and the SQL oracle) would keep
            rows = np.lexsort((ids, -scores[:, j]))[:kk]
            out_q.extend([qids[j]] * kk)
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
        score, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=8_192,
    )
    return _topk_merge(partial, k)


def _topk_merge(partial, k: int):
    """Global per-query top-k over (query_id, vec_id, score) partials
    via the combiner tree — top-k is re-applicable, and the partials
    total O(queries x k) rows per block, so a sort-shuffle groupby
    would be pure fixed machinery (the last deliberate sort-shuffle on
    the ANN paths, converted r4).  Rank attaches only on the final
    block."""
    from rayslog.stages.aggregate import _topk_reduce_fn, tree_reduce

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        partial,
        _topk_reduce_fn("query_id", "score", "vec_id", k),
        empty_fn=empty_fn,
        final_fn=_topk_reduce_fn(
            "query_id", "score", "vec_id", k, with_rank=True
        ),
    )


# ------------------------------------------------------------------ IVF
def _fit_centroids(ds, n_centroids: int, sample_rows: int, seed: int):
    """k-means-lite on a driver-side SAMPLE (bounded rows, never the
    corpus); 10 rounds of spherical Lloyd."""
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
    return cents


class _IvfProbe:
    """Shared probe surface of the IVF stores; subclasses provide
    ``centroids`` and :meth:`probe_dataset`."""

    def probe_dataset(self, buckets):
        raise NotImplementedError

    def probe(self, query_vecs: np.ndarray, query_ids: np.ndarray,
              k: int = 10, nprobe: int = 4):
        """Approximate top-k: each query scores only its nprobe nearest
        buckets; non-probed buckets are never read from storage."""
        import ray

        qn = _norm_rows(np.asarray(query_vecs, dtype=np.float64))
        probes = np.argsort(-(qn @ self.centroids.T), axis=1)[:, :nprobe]
        probed = sorted(set(probes.reshape(-1).tolist()))
        ref = ray.put((qn, np.asarray(query_ids), probes))

        def score_ivf(batch: pa.Table) -> pa.Table:
            qn, qids, probes_ = ray.get(ref)
            probe_sets = [set(p.tolist()) for p in probes_]
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            bucket = (
                batch.column("bucket")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            m = _norm_rows(_matrix(batch.column("embedding")))
            scores = np.round(m @ qn.T, 6)
            out_q, out_v, out_s = [], [], []
            kk = min(k, len(ids)) or 0
            for j in range(scores.shape[1] if len(ids) else 0):
                mask = np.isin(bucket, list(probe_sets[j]))
                sj = scores[mask, j]
                vj = ids[mask]
                if not len(sj):
                    continue
                top = np.lexsort((vj, -sj))[:kk]
                out_q.extend([qids[j]] * len(top))
                out_v.extend(vj[top])
                out_s.extend(sj[top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(np.array(out_v, dtype=np.int64)),
                    "score": pa.array(np.array(out_s, dtype=np.float64)),
                }
            )

        partial = self.probe_dataset(probed).map_batches(
            score_ivf, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=8_192,
        )
        return _topk_merge(partial, k)


class IvfIndex(_IvfProbe):
    """A persisted inverted-file index: hive-partitioned Parquet under
    ``index_dir`` (one ``bucket=K/`` directory per coarse centroid) plus
    the centroid matrix.  ``probe`` reads only the probed buckets."""

    def __init__(self, index_dir: str):
        self.index_dir = str(index_dir)
        meta = json.loads(Path(index_dir, "_ivf_meta.json").read_text())
        self.n_centroids = meta["n_centroids"]
        self.dim = meta["dim"]
        self.centroids = np.load(Path(index_dir, "_centroids.npy"))

    def probe_dataset(self, buckets):
        """Dataset over ONLY the probed buckets: a hive PathPartitionFilter
        prunes non-probed ``bucket=K/`` files from the file listing itself
        — unprobed buckets are never opened (verify via input_files())."""
        from rayslog.stages.invindex import _bucket_pruned_dataset

        return _bucket_pruned_dataset(self.index_dir, buckets)


def build_ivf_index(ds, index_dir: str, n_centroids: int = 16,
                    sample_rows: int = 4_096, seed: int = 42) -> IvfIndex:
    """ONE assignment pass over the corpus -> hive-partitioned Parquet
    (``bucket=K/``) + persisted centroids.  The write is streamed
    (write_parquet with partition_cols); nothing materializes on the
    driver."""
    import ray

    cents = _fit_centroids(ds, n_centroids, sample_rows, seed)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _norm_rows(_matrix(batch.column("embedding")))
        bucket = (
            np.argmax(m @ c.T, axis=1) if len(m) else np.zeros(0, np.int64)
        )
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64))
        )

    # Atomic commit: build into a tmp sibling, then rename into place
    # (same discipline as checkpoint.py) — a crashed build can never
    # leave partial bucket=K/ files that a later build would append to.
    final = Path(index_dir)
    tmp = final.with_name(final.name + f".build.{os.getpid()}")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True,
    ).write_parquet(str(tmp), partition_cols=["bucket"])
    np.save(tmp / "_centroids.npy", cents)
    (tmp / "_ivf_meta.json").write_text(
        json.dumps(
            {"n_centroids": int(len(cents)), "dim": int(cents.shape[1])}
        )
    )
    if final.exists():  # stale partial from a crashed build
        shutil.rmtree(final)
    os.replace(tmp, final)
    return IvfIndex(str(final))


class ShardedIvfIndex(_IvfProbe):
    """Incrementally-appendable IVF store — the ANN sibling of
    :class:`rayslog.stages.invindex.ShardedInvertedIndex`.

    Coarse centroids are fit ONCE (on the first appended shard, or
    passed in) and then FROZEN — the standard IVF ingest contract:
    every later drop assigns against the same centroid matrix, so a
    vector lands in the same bucket no matter which shard carries it
    and probes stay correct across appends.  Each drop writes an
    immutable ``shards/<name>/bucket=K/`` tree and commits to the
    manifest atomically; appending day N costs O(day N).  Re-fitting
    centroids (after drift) is by construction a NEW index directory.
    """

    MANIFEST = "_ivf_manifest.json"

    def __init__(self, index_dir: str):
        self.index_dir = str(index_dir)
        m = json.loads(Path(index_dir, self.MANIFEST).read_text())
        self.n_centroids = int(m["n_centroids"])
        self.shards = list(m["shards"])
        cpath = Path(index_dir, "_centroids.npy")
        self.centroids = np.load(cpath) if cpath.exists() else None

    @classmethod
    def create(cls, index_dir: str, n_centroids: int = 16,
               centroids: np.ndarray | None = None):
        """Open the store, creating an empty one (or replacing a
        shape-mismatched one).  ``centroids`` pre-freezes the matrix;
        otherwise the first ``append_shard`` fits it."""
        root = Path(index_dir)
        mf = root / cls.MANIFEST
        if mf.exists():
            idx = cls(index_dir)
            if idx.n_centroids == int(n_centroids) and (
                centroids is None
                or (
                    idx.centroids is not None
                    and idx.centroids.shape == centroids.shape
                    and np.array_equal(idx.centroids, centroids)
                )
            ):
                return idx
            shutil.rmtree(root)
        root.mkdir(parents=True, exist_ok=True)
        (root / "shards").mkdir(exist_ok=True)
        if centroids is not None:
            np.save(root / "_centroids.npy", np.asarray(centroids))
        cls._write_manifest(root, int(n_centroids), [])
        return cls(index_dir)

    @staticmethod
    def _write_manifest(root: Path, n_centroids: int, shards: list):
        tmp = root / f".manifest.tmp.{os.getpid()}"
        tmp.write_text(
            json.dumps({"n_centroids": n_centroids, "shards": shards})
        )
        os.replace(tmp, root / ShardedIvfIndex.MANIFEST)

    @property
    def n_vecs(self) -> int:
        return sum(int(s["n_vecs"]) for s in self.shards)

    def shard_names(self) -> list[str]:
        return [s["name"] for s in self.shards]

    def shard_paths(self) -> list[str]:
        return [
            str(Path(self.index_dir, "shards", s["name"]))
            for s in self.shards
        ]

    def probe_dataset(self, buckets):
        from rayslog.stages.invindex import _bucket_pruned_dataset

        paths = self.shard_paths()
        if not paths:
            raise ValueError("sharded IVF index has no committed shards")
        return _bucket_pruned_dataset(paths, buckets)

    def append_shard(self, ds, name: str, sample_rows: int = 4_096,
                     seed: int = 42) -> dict:
        """Assign ``ds`` against the frozen centroids (fitting them
        first iff this is the very first shard and none were passed to
        :meth:`create`) and commit it as the immutable shard ``name``."""
        import ray

        if name in self.shard_names():
            raise ValueError(f"shard {name!r} already committed")
        root = Path(self.index_dir)
        if self.centroids is None:
            cents = _fit_centroids(ds, self.n_centroids, sample_rows, seed)
            tmpc = root / f".centroids.tmp.{os.getpid()}.npy"
            np.save(tmpc, cents)
            os.replace(tmpc, root / "_centroids.npy")
            self.centroids = cents
        final = root / "shards" / name
        if final.exists():  # unlisted leftover from a crashed append
            shutil.rmtree(final)
        tmp = root / f".shard.tmp.{name}.{os.getpid()}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)

        n_vecs = ds.count()
        cents_ref = ray.put(self.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            m = _norm_rows(_matrix(batch.column("embedding")))
            bucket = (
                np.argmax(m @ c.T, axis=1) if len(m)
                else np.zeros(0, np.int64)
            )
            return batch.append_column(
                "bucket", pa.array(bucket.astype(np.int64))
            )

        ds.map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(str(tmp), partition_cols=["bucket"])
        # an all-empty drop writes NO parquet files — anchor the shard
        # with a typed zero-row file so probes never see a file-less dir
        if not any(tmp.rglob("*.parquet")):
            import pyarrow.parquet as pq

            empty = pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
            (tmp / "bucket=0").mkdir()
            pq.write_table(empty, tmp / "bucket=0" / "empty.parquet")
        os.replace(tmp, final)
        entry = {"name": name, "n_vecs": int(n_vecs)}
        self.shards.append(entry)
        self._write_manifest(root, self.n_centroids, self.shards)
        return entry

    def compact(self, name: str | None = None) -> dict:
        """Merge every committed shard into ONE (same log-structured
        compaction as ``ShardedInvertedIndex.compact``): vectors are
        immutable (bucket = frozen-centroid argmax), so this is a pure
        bucket-preserving rewrite — probes before/after are identical
        and per-probe file counts drop to one per bucket."""
        if not self.shards:
            raise ValueError("compact: no committed shards")
        name = name or f"compact-{len(self.shards)}-{self.shards[-1]['name']}"
        if name in self.shard_names():
            raise ValueError(f"shard {name!r} already committed")
        root = Path(self.index_dir)
        old_names = self.shard_names()
        total = self.n_vecs
        final = root / "shards" / name
        if final.exists():
            shutil.rmtree(final)
        tmp = root / f".shard.tmp.{name}.{os.getpid()}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        self.probe_dataset(range(self.n_centroids)).write_parquet(
            str(tmp), partition_cols=["bucket"]
        )
        os.replace(tmp, final)
        entry = {"name": name, "n_vecs": int(total)}
        self.shards = [entry]
        self._write_manifest(root, self.n_centroids, self.shards)
        for old in old_names:
            shutil.rmtree(root / "shards" / old, ignore_errors=True)
        return entry


def ivf_topk(ds, query_vecs: np.ndarray, query_ids: np.ndarray,
             k: int = 10, n_centroids: int = 16, nprobe: int = 4,
             sample_rows: int = 4_096, seed: int = 42,
             index_dir: str | None = None):
    """IVF ANN over a (possibly cached) persisted index.

    ``index_dir``: reuse an existing index if its meta file is present;
    otherwise build one there (default: a fresh scratch dir, so two
    different corpora never share a stale index).
    """
    if index_dir is None:
        import tempfile

        index_dir = tempfile.mkdtemp(prefix="rayslog_ivf_")
    if Path(index_dir, "_ivf_meta.json").exists():
        index = IvfIndex(index_dir)
    else:
        index = build_ivf_index(
            ds, index_dir, n_centroids=n_centroids,
            sample_rows=sample_rows, seed=seed,
        )
    return index.probe(query_vecs, query_ids, k=k, nprobe=nprobe)


# ---------------------------------------- LSH-bucketed near-dup (scale path)
def lsh_signature_rows(ds, planes_ref, n_bits: int, n_tables: int,
                       bucket_parts: int = 64):
    """(table_id, bucket, bpart, vec_id) rows — KEYS ONLY.  The
    embedding column never enters the LSH shuffle (it would be
    replicated n_tables times through the all-to-all; at 100 TB that
    ships 6x the corpus)."""
    import ray

    def signatures(batch: pa.Table) -> pa.Table:
        planes_l = ray.get(planes_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = _norm_rows(_matrix(batch.column("embedding")))
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "table_id": pa.array([], pa.int32()),
                    "bucket": pa.array([], pa.int64()),
                    "bpart": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                }
            )
        weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
        parts = []
        for t in range(len(planes_l)):
            bits = (m @ planes_l[t]) >= 0  # (n, n_bits)
            key = (bits.astype(np.uint64) * weights).sum(
                axis=1, dtype=np.uint64
            )
            parts.append(
                pa.table(
                    {
                        "table_id": pa.array(np.full(n, t, dtype=np.int32)),
                        "bucket": pa.array(key.view(np.int64)),
                        "bpart": pa.array(
                            (key % np.uint64(bucket_parts)).astype(np.int32)
                        ),
                        "vec_id": pa.array(ids.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        signatures, batch_format="pyarrow", zero_copy_batch=True,
    )


def fetch_vectors_for_ids(ds, ids, id_col: str = "vec_id",
                          emb_col: str = "embedding") -> dict:
    """vec_id -> normalized float64 vector for a SMALL id set via a
    pushed-down ``is_in`` filter — the corpus streams; only matching
    rows reach the driver."""
    id_arr = pa.array(sorted(int(i) for i in ids), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t.column(id_col), value_set=id_arr)
        ).select([id_col, emb_col])

    small_parts = []
    for b in ds.map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if t.num_rows:
            small_parts.append(t)
    out: dict = {}
    for t in small_parts:
        got = t.column(id_col).to_numpy(zero_copy_only=False)
        m = _norm_rows(_matrix(t.column(emb_col)))
        for j, i in enumerate(got):
            out[int(i)] = m[j]
    return out


def cosine_lsh_pairs(ds, threshold: float = 0.4, n_bits: int = 12,
                     n_tables: int = 6, seed: int = 42,
                     bucket_parts: int = 64, max_bucket: int = 4_096):
    """Approximate cosine near-dup pairs via random-hyperplane LSH.

    The 100 TB shape, two passes like minhash_near_dups:

    1. **Candidate generation** — signatures are one matmul per batch
       against a broadcast hyperplane matrix; the only all-to-all
       exchange carries (table_id, bucket, vec_id) = n_tables x ~20
       bytes per row — the EMBEDDING COLUMN NEVER ENTERS THE SHUFFLE
       (the round-2 version replicated it n_tables(6)x through the
       exchange).  Groups are bounded (table, bucket%parts) slices with
       vectorized run detection, not one map_groups per bucket.
    2. **Verification** — candidate ids (rare by LSH construction) are
       collected, ONLY their vectors fetched via ``is_in`` pushdown,
       normalized once, broadcast via ``ray.put``; exact cosines are
       computed per candidate pair distributed over the pair list.

    Recall: a pair at cosine c collides in one table with prob
    (1 - acos(c)/pi)^n_bits; n_tables tables union.  Emitted pairs
    carry true cosines >= threshold (a subset of the exact operator's
    result).  Buckets larger than ``max_bucket`` (identical-vector
    blowup) are skipped with a logged count — recall is approximate by
    contract here, unlike minhash_near_dups' oracle-checked pair
    completeness.
    """
    import logging

    import pandas as pd
    import ray
    import ray.data as rd

    empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    first = ds.take(1)
    if not first:
        return rd.from_arrow(empty)
    dim = len(first[0]["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, dim, n_bits))
    planes_ref = ray.put(planes)

    exploded = lsh_signature_rows(
        ds, planes_ref, n_bits, n_tables, bucket_parts
    )

    _empty_pairs = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
        }
    )

    def part_pairs(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_pairs
        bh = t.column("bucket").to_numpy(zero_copy_only=False)
        tid = t.column("table_id").to_numpy(zero_copy_only=False)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        # parts mix tables: a bucket is a (table_id, bucket) run
        order = np.lexsort((ids, bh, tid))
        tid, bh, ids = tid[order], bh[order], ids[order]
        new = np.r_[True, (bh[1:] != bh[:-1]) | (tid[1:] != tid[:-1])]
        run_id = np.cumsum(new) - 1
        counts = np.bincount(run_id)
        run_starts = np.r_[0, np.cumsum(counts)[:-1]]
        out_a: list = []
        out_b: list = []
        for r in np.nonzero(counts > 1)[0]:
            s = run_starts[r]
            u = np.unique(ids[s : s + counts[r]])
            if len(u) < 2:
                continue
            if len(u) > max_bucket:
                out_a.append(np.array([-1], dtype="int64"))
                out_b.append(np.array([len(u)], dtype="int64"))
                continue
            a, b = np.triu_indices(len(u), k=1)
            out_a.append(u[a])
            out_b.append(u[b])
        if not out_a:
            return _empty_pairs
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a).astype("int64")),
                "vec_b": pa.array(np.concatenate(out_b).astype("int64")),
            }
        )

    from rayslog.stages.aggregate import task_exchange

    raw = task_exchange(
        exploded, "bpart", bucket_parts, part_pairs
    ).to_pandas()
    if not len(raw):
        return rd.from_arrow(empty)
    n_over = int((raw["vec_a"] == -1).sum())
    if n_over:
        logging.getLogger("rayslog.ann").warning(
            "cosine_lsh_pairs: %d bucket(s) exceeded max_bucket=%d and "
            "were skipped (recall loss); raise max_bucket or dedup "
            "identical vectors first", n_over, max_bucket,
        )
        raw = raw[raw["vec_a"] != -1]
    cand = raw.drop_duplicates(["vec_a", "vec_b"]).sort_values(
        ["vec_a", "vec_b"]
    )
    if not len(cand):
        return rd.from_arrow(empty)
    cand_ids = set(cand["vec_a"]) | set(cand["vec_b"])
    vecs = fetch_vectors_for_ids(ds, cand_ids)
    vecs_ref = ray.put(vecs)
    cands = rd.from_arrow(
        pa.table(
            {
                "vec_a": pa.array(cand["vec_a"].to_numpy(), pa.int64()),
                "vec_b": pa.array(cand["vec_b"].to_numpy(), pa.int64()),
            }
        )
    )

    def verify(batch: pa.Table) -> pa.Table:
        vv = ray.get(vecs_ref)  # zero-copy plasma read, small dict
        aa = batch.column("vec_a").to_numpy(zero_copy_only=False)
        bb = batch.column("vec_b").to_numpy(zero_copy_only=False)
        if not len(aa):
            return empty
        ma = np.stack([vv[int(a)] for a in aa])
        mb = np.stack([vv[int(b)] for b in bb])
        s = np.round((ma * mb).sum(axis=1), 6)
        keep = s >= threshold
        return pa.table(
            {
                "vec_a": pa.array(aa[keep].astype(np.int64)),
                "vec_b": pa.array(bb[keep].astype(np.int64)),
                "score": pa.array(s[keep].astype(np.float64)),
            }
        )

    return cands.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------- exact all-pairs dedup
def cosine_dups_bucketed(ds, index, threshold: float = 0.9):
    """IVF-bucketed embedding near-dup pairs — the composed scale path
    the ``cosine_near_dup_pairs`` docstring promises: the persisted
    index's FROZEN coarse centroids partition the corpus (one
    broadcast-centroid assignment pass), and exact round-6 cosine
    pairs are enumerated ONLY within a bucket via one bounded-parts
    ``task_exchange`` — O(sum B_c²) work instead of O(N²), candidate
    recall traded at bucket borders (a >=0.9-cosine pair lands in the
    same argmax bucket w.h.p.).

    Unlike the random-plane LSH sibling (``cosine_lsh_pairs``,
    rows-only), this is DETERMINISTIC given the persisted centroids,
    so it carries a full SQL oracle (``sqloracle._cosine_dups_ivf_sql``
    — same frozen-centroid-literals contract as ann_ivf).  Ties in the
    assignment argmax break to the lowest centroid id on both sides.

    Partitioning assumption: one bucket's vectors (and its B_c² score
    matrix) fit a task — n_centroids ~ sqrt(N) keeps B_c ~ sqrt(N);
    chunk the in-part matmul if a skewed bucket ever outgrows that.
    Returns (vec_a, vec_b, score) with vec_a < vec_b.
    """
    import ray

    from rayslog.stages.aggregate import task_exchange

    cents = index.centroids
    n_cells = len(cents)
    ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _norm_rows(_matrix(t.column("embedding")))
        b = (
            np.argmax(m @ c.T, axis=1)
            if len(m)
            else np.zeros(0, np.int64)
        )
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "embedding": t.column("embedding"),
                "bucket": pa.array(b.astype(np.int64)),
            }
        )

    _empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )

    def part_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return _empty
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = _norm_rows(_matrix(t.column("embedding")))
        s = np.round(m @ m.T, 6)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = s[ia, ib] >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table(
            {
                "vec_a": pa.array(lo.astype(np.int64)),
                "vec_b": pa.array(hi.astype(np.int64)),
                "score": pa.array(s[ia[keep], ib[keep]].astype(np.float64)),
            }
        )

    assigned = ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
    return task_exchange(assigned, "bucket", n_cells, part_pairs)


def cosine_near_dup_pairs(ds, threshold: float = 0.95):
    """All (vec_a, vec_b, score) corpus pairs with cosine >= threshold.

    Exact block-pair plan: normalize per batch, materialize the corpus
    as object-store Arrow blocks, then one Ray task per block pair
    (i <= j) computes the cross-block matmul — both inputs arrive
    zero-copy from the object store, the driver holds only block refs.
    The task count is B(B+1)/2 for B blocks; the row payload stays
    columnar end-to-end.
    """
    import ray
    import ray.data as rd

    def prenorm(t: pa.Table) -> pa.Table:
        m = _norm_rows(_matrix(t.column("embedding")))
        n, dim = m.shape if m.size else (0, 0)
        flat = pa.array(m.reshape(-1), pa.float64())
        lst = pa.LargeListArray.from_arrays(
            np.arange(n + 1, dtype=np.int64) * dim, flat
        ).cast(pa.list_(pa.float64()))
        return pa.table({"vec_id": t.column("vec_id"), "embedding": lst})

    blocks = (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(prenorm, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    # task count is quadratic in block count: coalesce small corpora
    # into few fat blocks so the per-task machinery (~5ms) doesn't
    # dwarf the matmuls (528 tiny tasks measured ~2.5s; 36 is right
    # for a single node — at fleet scale blocks are naturally fat)
    if blocks.num_blocks() > 8:
        blocks = blocks.repartition(8, shuffle=False).materialize()
    refs = blocks.to_arrow_refs()

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        a_ids = ta.column("vec_id").to_numpy(zero_copy_only=False)
        b_ids = tb.column("vec_id").to_numpy(zero_copy_only=False)
        ma = _matrix(ta.column("embedding"))
        mb = _matrix(tb.column("embedding"))
        if not ma.size or not mb.size:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        scores = np.round(ma @ mb.T, 6)
        rows, cols = np.nonzero(scores >= threshold)
        ra, rb = a_ids[rows], b_ids[cols]
        if same:
            # within-block: each unordered pair appears twice; keep a<b
            keep = ra < rb
            rows, cols = rows[keep], cols[keep]
            va, vb = a_ids[rows], b_ids[cols]
        else:
            # cross-block: each unordered pair appears once; canonicalize
            keep = ra != rb
            rows, cols = rows[keep], cols[keep]
            ra, rb = a_ids[rows], b_ids[cols]
            va, vb = np.minimum(ra, rb), np.maximum(ra, rb)
        return pa.table(
            {
                "vec_a": pa.array(va.astype(np.int64)),
                "vec_b": pa.array(vb.astype(np.int64)),
                "score": pa.array(scores[rows, cols], pa.float64()),
            }
        )

    tasks = [
        block_pair.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]

    # B(B+1)/2 mostly-tiny pair blocks would make every downstream pass
    # pay per-block machinery (measured: a map over 528 such blocks
    # cost 4.5s, a 920-row to_pandas 1.7s) — fan the refs into a
    # bounded number of concatenated blocks before handing back a
    # Dataset
    @ray.remote
    def concat(*blocks):
        ts = [t for t in blocks if t.num_rows] or [blocks[0]]
        return pa.concat_tables(ts, promote_options="default")

    fanin = 32
    if len(tasks) > fanin:
        tasks = [
            concat.remote(*tasks[i : i + fanin])
            for i in range(0, len(tasks), fanin)
        ]
    return rd.from_arrow_refs(tasks)
