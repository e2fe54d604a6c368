"""stages/kmeans.py unit shapes (the sf-corpus oracle covers the full
recurrence; here: geometry, tie rule, empty clusters, convergence)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayslog.stages.kmeans import kmeans, kmeans_assign, kmeans_iterate


def _vecs(ray_session, mat):
    import ray.data as rd

    mat = np.asarray(mat, dtype=np.float32)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array([row.tolist() for row in mat]),
            }
        )
    )


def test_two_obvious_clusters(ray_session):
    # ids 0,1 near +x / +y seed the two centroids; the rest split by
    # direction regardless of magnitude (cosine metric).
    mat = [
        [1, 0.05], [0.05, 1],
        [2, 0.1], [3, -0.1], [0.1, 5], [-0.05, 2], [4, 0.2],
    ]
    ds = _vecs(ray_session, mat)
    init = np.asarray(mat[:2], dtype=np.float64)
    df = kmeans(ds, init, iters=2).to_pandas().sort_values("vec_id")
    assert list(df["cluster"]) == [0, 1, 0, 0, 1, 1, 0]
    assert (df["score"] > 0.9).all()


def test_assign_tie_breaks_to_lowest_cluster(ray_session):
    # identical centroids -> every score ties -> cluster 0 everywhere.
    ds = _vecs(ray_session, [[1, 1], [2, 2], [-1, 3]])
    cents = np.asarray([[1.0, 0.0], [1.0, 0.0]])
    df = kmeans_assign(ds, cents).to_pandas()
    assert set(df["cluster"]) == {0}


def test_empty_cluster_keeps_centroid(ray_session):
    # all points on +x: cluster 1's (-x) centroid attracts nothing and
    # must survive both iterations unchanged (round-6).
    ds = _vecs(ray_session, [[1, 0], [2, 0], [3, 0]])
    init = np.asarray([[1.0, 0.0], [-1.0, 0.0]])
    cents = kmeans_iterate(ds, init, iters=2)
    assert cents[1].tolist() == [-1.0, 0.0]
    assert cents[0, 0] == 2.0  # mean of 1,2,3


def test_iterate_converges_to_group_means(ray_session):
    mat = [[10, 0], [12, 0], [0, 7], [0, 9]]
    ds = _vecs(ray_session, mat)
    init = np.asarray(mat[:2], dtype=np.float64)  # both seeds in +x
    cents = kmeans_iterate(ds, init, iters=3)
    # seed 1 (12,0) is the sole +x extreme? both +x points sit closer
    # to one seed; after reassignment the two groups separate.
    assert cents.shape == (2, 2)
    # one centroid owns the x group mean, the other the y group mean
    got = sorted(np.round(cents, 3).tolist())
    assert got == [[0.0, 8.0], [11.0, 0.0]]


def test_schema_and_types(ray_session):
    ds = _vecs(ray_session, [[1, 0], [0, 1]])
    out = kmeans_assign(ds, np.asarray([[1.0, 0.0]]))
    assert out.schema().names == ["vec_id", "cluster", "score"]
    assert out.schema().types == [pa.int64(), pa.int64(), pa.float64()]
