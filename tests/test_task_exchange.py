"""task_exchange: the raw-task replacement for bounded-parts
groupby(part).map_groups — parity with the groupby plan, P=1 edge,
empty parts, empty input."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(n=1000, parts=8, blocks=4):
    import ray.data as rd

    rng = np.random.default_rng(0)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 50, n), pa.int64()),
            "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "part": pa.array(
                (rng.integers(0, 50, n) % parts).astype(np.int32)
            ),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_exchange_matches_groupby_map_groups(ray_session):
    from rayslog.stages.aggregate import task_exchange

    def _group_sum(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["k"]).aggregate([("v", "sum")])
            .rename_columns(["k", "v"])
        )

    ds = _ds(parts=8)
    got = (
        task_exchange(ds, "part", 8, _group_sum)
        .to_pandas()
        .sort_values(["k"])
        .reset_index(drop=True)
    )
    # parts are built as (key-ish % parts); same key never spans parts
    # in this fixture is NOT guaranteed, so compare against a plain
    # per-part pandas recompute
    raw = _ds(parts=8).to_pandas()
    exp = (
        raw.groupby(["part", "k"], as_index=False)["v"].sum()[["k", "v"]]
        .sort_values(["k"])
        .reset_index(drop=True)
    )
    # exchange output may contain one row per (part, k) — aggregate both
    got = got.groupby("k", as_index=False)["v"].sum()
    exp = exp.groupby("k", as_index=False)["v"].sum()
    assert got.equals(exp)


def test_exchange_single_part(ray_session):
    from rayslog.stages.aggregate import task_exchange

    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "v": pa.array([3, 1, 2], pa.int64()),
                "part": pa.array([0, 0, 0], pa.int32()),
            }
        )
    ).repartition(2)
    out = task_exchange(
        ds, "part", 1, lambda t: t.sort_by([("v", "ascending")])
    ).to_pandas()
    assert list(out["v"]) == [1, 2, 3]


def test_exchange_empty_parts_go_through_fn(ray_session):
    from rayslog.stages.aggregate import task_exchange

    import ray.data as rd

    # only part 3 is populated out of 8 -> 7 empty parts must still
    # produce fn-schema (empty) blocks
    ds = rd.from_arrow(
        pa.table(
            {
                "v": pa.array([5, 6], pa.int64()),
                "part": pa.array([3, 3], pa.int32()),
            }
        )
    )

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"total": pa.array([int(pc.sum(t.column("v")).as_py() or 0)],
                               pa.int64())}
        )

    out = task_exchange(ds, "part", 8, fn).to_pandas()
    assert sorted(out["total"]) == [0] * 7 + [11]


def test_exchange_rejects_out_of_range_parts(ray_session):
    import pytest
    import ray.data as rd

    from rayslog.stages.aggregate import task_exchange

    ds = rd.from_arrow(
        pa.table(
            {
                "v": pa.array([1, 2], pa.int64()),
                "part": pa.array([0, 8], pa.int32()),  # 8 >= P
            }
        )
    )
    with pytest.raises(Exception, match="outside"):
        task_exchange(ds, "part", 8, lambda t: t).materialize()


def test_exchange_keeps_part_col_when_asked(ray_session):
    from rayslog.stages.aggregate import task_exchange

    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "v": pa.array([1, 2, 3, 4], pa.int64()),
                "part": pa.array([0, 1, 0, 1], pa.int32()),
            }
        )
    )
    out = task_exchange(
        ds, "part", 2, lambda t: t, drop_part_col=False
    ).to_pandas()
    assert set(out.columns) == {"v", "part"}
    assert out.groupby("part")["v"].sum().to_dict() == {0: 4, 1: 6}


def test_exchange_ref_land_chaining(ray_session):
    """return_refs=True -> a second exchange consumes the refs with its
    part hash fused via pre_fn; results match the two-Dataset plan."""
    import ray.data as rd

    from rayslog.stages.aggregate import task_exchange

    def _group_sum(t: pa.Table) -> pa.Table:
        return (
            t.select(["k", "v"]).group_by(["k"]).aggregate([("v", "sum")])
            .rename_columns(["k", "v"])
        )

    def add_kpart(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        return t.append_column(
            "kpart", pa.array((k % 4).astype(np.int32))
        )

    ds = _ds(parts=8)
    refs = task_exchange(ds, "part", 8, _group_sum, return_refs=True)
    assert isinstance(refs, list) and refs
    out = (
        task_exchange(refs, "kpart", 4, _group_sum, pre_fn=add_kpart)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    base = (
        _ds(parts=8)
        .to_pandas()
        .groupby("k", as_index=False)["v"]
        .sum()
        .sort_values("k", ignore_index=True)
    )
    assert out["k"].tolist() == base["k"].tolist()
    assert out["v"].tolist() == base["v"].tolist()


def test_exchange_ref_land_empty_input_keeps_types(ray_session):
    """An all-empty Dataset input still yields typed per-part refs (one
    schema-bearing empty block flows through fn), so downstream
    ref-land stages and joins see real schemas."""
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import task_exchange

    empty = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
    )

    def _group_sum(t: pa.Table) -> pa.Table:
        return (
            t.select(["k", "v"]).group_by(["k"]).aggregate([("v", "sum")])
            .rename_columns(["k", "v"])
        )

    refs = task_exchange(empty, "part", 4, _group_sum, return_refs=True)
    assert len(refs) == 4
    blocks = ray.get(refs)
    for b in blocks:
        assert b.num_rows == 0
        assert b.schema.names == ["k", "v"]
        assert b.schema.field("v").type == pa.int64()


def test_empty_events_partitioned_ops_stay_typed(ray_session):
    """Empty corpus end-to-end through the ref-land two-phase event
    operators: schemas survive even though every part is empty."""
    import pandas as pd
    import ray.data as rd

    from rayslog.stages.events import (
        asof_attribution_partitioned,
        sessionize_partitioned,
    )

    empty = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        )
    )
    import ray

    def block_schemas(ds):
        # Dataset.schema() is None for any all-empty dataset (Ray
        # quirk) — the chaining contract lives in the BLOCKS
        refs = [r for b in ds.materialize().iter_internal_ref_bundles()
                for r, _m in b.blocks]
        return [sorted(ray.get(r).schema.names) for r in refs]

    s = sessionize_partitioned(empty)
    assert s.count() == 0
    for names in block_schemas(s):
        assert names == [
            "longest_session_events", "n_events", "n_sessions", "user_id",
        ]
    a = asof_attribution_partitioned(empty)
    assert a.count() == 0
    for names in block_schemas(a):
        assert names == ["event_id", "last_source_ts", "ts", "user_id"]
    assert block_schemas(a), "typed blocks must survive the empty chain"
