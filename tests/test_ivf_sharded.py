"""Sharded (incrementally-appendable) IVF store: frozen-centroid
appends must probe identically to a one-shot assignment with the same
centroids; shard immutability and manifest bookkeeping."""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest


def _vecs(n, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _ds(ids, mat):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float64())
                ),
            }
        )
    )


def _probe_df(idx, qv, qi, k=5, nprobe=2):
    df = idx.probe(qv, qi, k=k, nprobe=nprobe).to_pandas()
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_sharded_ivf_appends_probe_like_oneshot(ray_session, tmp_path):
    from rayslog.stages.ann import ShardedIvfIndex, _fit_centroids

    n = 200
    mat = _vecs(n, seed=1)
    ids = np.arange(n, dtype=np.int64)
    full = _ds(ids, mat)
    cents = _fit_centroids(full, 8, 4_096, 42)

    one = ShardedIvfIndex.create(str(tmp_path / "one"), n_centroids=8,
                                 centroids=cents)
    one.append_shard(full, "all")

    sh = ShardedIvfIndex.create(str(tmp_path / "sh"), n_centroids=8,
                                centroids=cents)
    sh.append_shard(_ds(ids[: n // 2], mat[: n // 2]), "a")
    sh.append_shard(_ds(ids[n // 2 :], mat[n // 2 :]), "b")
    assert sh.n_vecs == n and sh.shard_names() == ["a", "b"]

    qv, qi = mat[:4], ids[:4]
    a = _probe_df(one, qv, qi)
    b = _probe_df(sh, qv, qi)
    assert a.equals(b)
    # probing with itself in the store: rank-1 must be the query vector
    assert list(b[b["rank"] == 1]["vec_id"]) == list(qi)


def test_sharded_ivf_first_append_fits_and_freezes(ray_session, tmp_path):
    from rayslog.stages.ann import ShardedIvfIndex

    mat = _vecs(100, seed=2)
    ids = np.arange(100, dtype=np.int64)
    sh = ShardedIvfIndex.create(str(tmp_path / "sh"), n_centroids=4)
    assert sh.centroids is None
    sh.append_shard(_ds(ids[:50], mat[:50]), "a")
    frozen = sh.centroids.copy()
    sh.append_shard(_ds(ids[50:], mat[50:]), "b")
    assert np.array_equal(sh.centroids, frozen)  # never re-fit
    # committed shard files untouched by the second append
    a_dir = Path(sh.index_dir, "shards", "a")
    assert a_dir.exists()
    # reopen reads manifest + centroids
    re = ShardedIvfIndex(str(tmp_path / "sh"))
    assert re.shard_names() == ["a", "b"] and re.n_vecs == 100
    assert np.array_equal(re.centroids, frozen)
    with pytest.raises(ValueError, match="already committed"):
        re.append_shard(_ds(ids[:1], mat[:1]), "a")


def test_sharded_ivf_compact_preserves_probes(ray_session, tmp_path):
    from rayslog.stages.ann import ShardedIvfIndex

    mat = _vecs(150, seed=4)
    ids = np.arange(150, dtype=np.int64)
    sh = ShardedIvfIndex.create(str(tmp_path / "sh"), n_centroids=8)
    sh.append_shard(_ds(ids[:75], mat[:75]), "a")
    sh.append_shard(_ds(ids[75:], mat[75:]), "b")
    qv, qi = mat[:3], ids[:3]
    before = _probe_df(sh, qv, qi)
    entry = sh.compact()
    assert sh.shard_names() == [entry["name"]] and sh.n_vecs == 150
    assert _probe_df(sh, qv, qi).equals(before)
    assert sorted(
        p.name for p in Path(sh.index_dir, "shards").iterdir()
    ) == [entry["name"]]
    # appends keep working after compaction (frozen centroids intact)
    sh.append_shard(_ds(np.array([999], np.int64), _vecs(1, seed=9)), "c")
    assert sh.n_vecs == 151


def test_sharded_ivf_probe_prunes_buckets_across_shards(ray_session, tmp_path):
    from rayslog.stages.ann import ShardedIvfIndex

    mat = _vecs(200, seed=3)
    ids = np.arange(200, dtype=np.int64)
    sh = ShardedIvfIndex.create(str(tmp_path / "sh"), n_centroids=8)
    sh.append_shard(_ds(ids[:100], mat[:100]), "a")
    sh.append_shard(_ds(ids[100:], mat[100:]), "b")
    files = sh.probe_dataset([0, 1]).input_files()
    assert files
    buckets = {int(f.split("bucket=")[1].split("/")[0]) for f in files}
    assert buckets <= {0, 1}
    all_files = sh.probe_dataset(range(8)).input_files()
    assert len(files) < len(all_files)
    shards = {f.split("/shards/")[1].split("/")[0] for f in all_files}
    assert shards == {"a", "b"}
