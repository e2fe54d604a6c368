"""connected_components (stages/cluster.py): min-label propagation.

Unit shapes the sf-corpus oracle can't isolate: multi-hop chains (the
transitive-closure case the pair list alone doesn't answer), disjoint
components, singleton-free output, empty input, and the non-convergence
guard.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from rayslog.stages.cluster import connected_components


def _pairs(edges):
    import ray.data as rd

    a = [u for u, _ in edges]
    b = [v for _, v in edges]
    return rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
            }
        )
    )


def _result(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return list(zip(df["doc_id"], df["cluster_id"]))


# threshold=0 forces the distributed BSP path; the default takes the
# driver numpy kernel — every shape must hold on BOTH plans.
BOTH_PATHS = [0, 5_000_000]


@pytest.mark.parametrize("thresh", BOTH_PATHS)
def test_chain_is_one_component(ray_session, thresh):
    # a-b, b-c, c-d: the a-d pair was never emitted, yet all four must
    # land in one cluster labeled by the min id.
    out = _result(connected_components(
        _pairs([(7, 3), (3, 9), (9, 5)]), small_edges_threshold=thresh))
    assert out == [(3, 3), (5, 3), (7, 3), (9, 3)]


@pytest.mark.parametrize("thresh", BOTH_PATHS)
def test_disjoint_components(ray_session, thresh):
    out = _result(connected_components(
        _pairs([(1, 2), (10, 11), (11, 12)]), small_edges_threshold=thresh))
    assert out == [(1, 1), (2, 1), (10, 10), (11, 10), (12, 10)]


@pytest.mark.parametrize("thresh", BOTH_PATHS)
def test_long_path_diameter(ray_session, thresh):
    # 0-1-2-...-9 path: diameter 9 exercises multiple propagation rounds.
    edges = [(i, i + 1) for i in range(9)]
    out = _result(connected_components(
        _pairs(edges), small_edges_threshold=thresh))
    assert out == [(i, 0) for i in range(10)]


def test_paths_agree_on_random_graph(ray_session):
    import numpy as np

    rng = np.random.RandomState(7)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 60, size=(80, 2))
             if a != b]
    a = _result(connected_components(_pairs(edges), small_edges_threshold=0))
    b = _result(connected_components(_pairs(edges)))
    assert a == b


def test_empty_pairs(ray_session):
    ds = connected_components(_pairs([]))
    assert ds.count() == 0
    assert [f.name for f in ds.schema().base_schema] == [
        "doc_id",
        "cluster_id",
    ]


@pytest.mark.parametrize("thresh", BOTH_PATHS)
def test_schema_is_int64(ray_session, thresh):
    ds = connected_components(_pairs([(1, 2)]), small_edges_threshold=thresh)
    assert ds.schema().types == [pa.int64(), pa.int64()]


def test_max_rounds_guard(ray_session):
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(
            _pairs([(i, i + 1) for i in range(6)]), max_rounds=1,
            small_edges_threshold=0,
        )


def test_cluster_survivors_keeps_min_and_singletons(ray_session):
    import ray.data as rd

    from rayslog.stages.cluster import cluster_survivors

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 9], pa.int64()),
                "tag": ["a", "b", "c", "d", "e", "f"],
            }
        )
    )
    # component {2,3,4} (chain) -> keep 2; {1},{5},{9} untouched
    out = cluster_survivors(docs, _pairs([(3, 2), (3, 4)]))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df["doc_id"]) == [1, 2, 5, 9]
    assert list(df["tag"]) == ["a", "b", "e", "f"]


def test_hash_join_anti(ray_session):
    import ray.data as rd

    from rayslog.stages.relational import hash_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "val": ["a", "b", "c", "d", "e"],
            }
        )
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([2, 4, 7], pa.int64()), "other": [1, 2, 3]})
    )
    df = (
        hash_join(left, right, key="k", how="anti")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(df.columns) == ["k", "val"]
    assert list(df["k"]) == [1, 3, 5]
    assert list(df["val"]) == ["a", "c", "e"]


def test_hash_join_semi_emits_once_despite_right_dupes(ray_session):
    import ray.data as rd

    from rayslog.stages.relational import hash_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "val": ["a", "b", "c", "d", "e"],
            }
        )
    )
    # right-side multiplicity (2 appears 3x) must NOT multiply left rows
    right = rd.from_arrow(
        pa.table({"k": pa.array([2, 2, 2, 4, 7], pa.int64()), "other": [1] * 5})
    )
    df = (
        hash_join(left, right, key="k", how="semi")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(df.columns) == ["k", "val"]
    assert list(df["k"]) == [2, 4]
    assert list(df["val"]) == ["b", "d"]
    assert df["k"].dtype == "int64"
