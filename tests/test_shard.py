"""Deterministic training-shard shuffle (stages/shard.py)."""

from __future__ import annotations

import numpy as np
import pytest


def test_shuffle_shards_is_permutation(ray_session):
    from rayslog import pipeline as p

    out = p.q_shuffle_shards("/root/testdata/sf0.001").to_pandas()
    n = len(out)
    assert n == 500
    rank = out["shard"].to_numpy() * p.SHARD_SIZE + out["pos"].to_numpy()
    assert sorted(rank) == list(range(n))
    # full shards except possibly the last
    sizes = out.groupby("shard").size()
    assert (sizes.iloc[:-1] == p.SHARD_SIZE).all() if len(sizes) > 1 else True
    # actually shuffled: not the identity order
    assert (rank != np.arange(n)).any()


def test_shuffle_shards_deterministic(ray_session):
    from rayslog import pipeline as p

    a = p.q_shuffle_shards("/root/testdata/sf0.001").to_pandas()
    b = p.q_shuffle_shards("/root/testdata/sf0.001").to_pandas()
    assert a.equals(b)


def test_shuffle_shards_seed_changes_order(ray_session):
    import ray.data as rd

    from rayslog.stages.shard import shuffle_shards

    rows = [{"doc_id": i} for i in range(200)]
    a = (
        shuffle_shards(rd.from_items(rows), shard_size=50, seed=1)
        .sort("doc_id")
        .to_pandas()
    )
    b = (
        shuffle_shards(rd.from_items(rows), shard_size=50, seed=2)
        .sort("doc_id")
        .to_pandas()
    )
    assert not a.equals(b)


def test_shuffle_shards_rejects_negative_ids(ray_session):
    import ray.exceptions
    import ray.data as rd

    from rayslog.stages.shard import shuffle_shards

    ds = rd.from_items([{"doc_id": -1}, {"doc_id": 3}])
    with pytest.raises(ray.exceptions.RayTaskError):
        shuffle_shards(ds, shard_size=10, seed=1).to_pandas()
