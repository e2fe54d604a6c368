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


def test_token_budget_sample_matches_reference(ray_session):
    """Engine vs a plain-pandas reference of the budget rule on random
    corpora: per-group inclusive cumsum in splitmix64(id) order."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rayslog.stages.sample import splitmix64, token_budget_sample

    rng = np.random.default_rng(5)
    for trial, budget in [(0, 120), (1, 1), (2, 10_000)]:
        n = int(rng.integers(30, 200))
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "source": [f"s{int(x)}" for x in rng.integers(0, 4, n)],
                "text": [
                    " ".join(["w"] * int(rng.integers(0, 40)))
                    for _ in range(n)
                ],
            }
        )
        got = token_budget_sample(
            rd.from_pandas(df).repartition(3), budget=budget, parts=4
        ).to_pandas()
        ref = df.copy()
        ref["n_tokens"] = ref["text"].str.split().str.len().fillna(0)
        ref["k"] = splitmix64(
            ref["doc_id"].to_numpy().astype(np.uint64), 7
        )
        ref = ref.sort_values(["source", "k", "doc_id"])
        ref["cum"] = ref.groupby("source")["n_tokens"].cumsum()
        keep = (
            ref[ref["cum"] <= budget][["doc_id", "source", "n_tokens"]]
            .sort_values("doc_id", ignore_index=True)
            .astype({"n_tokens": "int64"})
        )
        if len(keep) == 0:
            # Ray's to_pandas on an all-empty dataset is column-less
            assert len(got) == 0
            continue
        got = got.sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(got, keep, check_exact=True)
