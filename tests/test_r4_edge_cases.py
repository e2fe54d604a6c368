"""Empty/degenerate-input behavior of the session-3 operators: the
typed-empty contract (Ray drops an all-empty dataset's schema — every
operator must still emit its documented output schema) and single-row
degenerate groups."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "event_id": pa.array(
                    list(range(len(rows))), pa.int64()
                ),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    ).repartition(2)


def test_event_gaps_single_event_users(ray_session):
    """Every user has ONE event -> zero gaps -> typed empty output."""
    from rayslog.stages.events import event_gap_stats

    import datetime as dt

    rows = [
        (u, dt.datetime(2024, 1, 1, u), "click", 1.0) for u in range(5)
    ]
    out = event_gap_stats(_events(rows), parts=4)
    df = out.to_pandas()
    assert len(df) == 0
    assert set(out.schema().names) == {
        "event_type", "n_gaps", "avg_gap_sec", "max_gap_sec",
    }


def test_rolling_avg_single_rows(ray_session):
    """One event per user: every frame is the row itself."""
    import datetime as dt

    from rayslog.stages.events import rolling_value_avg

    rows = [
        (u, dt.datetime(2024, 1, 1, u), "click", float(u) + 0.5)
        for u in range(4)
    ]
    df = rolling_value_avg(_events(rows), window_rows=4, parts=4).to_pandas()
    assert len(df) == 4
    got = df.sort_values("user_id")["ma_value"].to_numpy()
    assert np.allclose(got, np.arange(4) + 0.5)


def test_large_orders_no_survivors(ray_session):
    """An unreachable HAVING threshold -> typed empty top-k."""
    import ray.data as rd

    from rayslog.stages.relational import large_orders

    li = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
    )
    orders = rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([10, 20], pa.int64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp("2024-01-01")] * 2, pa.timestamp("us")
                ),
                "o_totalprice": pa.array([5.0, 6.0], pa.float64()),
            }
        )
    )
    out = large_orders(li, orders, qty_threshold=1_000_000, parts=4)
    # to_pandas() on an all-empty dataset returns a COLUMN-LESS frame
    # (documented Ray quirk) — assert the typed schema instead
    assert len(out.to_pandas()) == 0
    assert sorted(out.schema().names) == [
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice",
        "total_qty",
    ]


def test_co_purchase_pairs_no_pairs(ray_session):
    """All single-item orders -> no pairs -> typed empty."""
    import ray.data as rd

    from rayslog.stages.relational import co_purchase_pairs

    li = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2, 3], pa.int64()),
                "l_partkey": pa.array([7, 8, 9], pa.int64()),
            }
        )
    )
    out = co_purchase_pairs(li, k=10, parts=4)
    assert len(out.to_pandas()) == 0
    assert sorted(out.schema().names) == ["n_orders", "part_a", "part_b"]


def test_grouped_ntile_single_row_groups(ray_session):
    """n rows, n groups: everyone is bucket 1 (DuckDB NTILE semantics
    for a 1-row partition)."""
    import ray.data as rd

    from rayslog.stages.aggregate import grouped_ntile

    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["a", "b", "c"], pa.string()),
                "v": pa.array([3, 1, 2], pa.int64()),
                "i": pa.array([0, 1, 2], pa.int64()),
            }
        )
    )
    df = grouped_ntile(ds, "g", ["v", "i"], n=4, parts=2).to_pandas()
    assert (df["ntile"] == 1).all()


def test_returned_top_customers_empty_quarter(ray_session):
    """A date window with no orders -> typed empty top-k (names leg
    included)."""
    import ray.data as rd

    from rayslog.stages.relational import returned_item_revenue

    li = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1], pa.int64()),
                "l_extendedprice": pa.array([10.0], pa.float64()),
                "l_discount": pa.array([0.0], pa.float64()),
                "l_returnflag": pa.array(["R"], pa.string()),
            }
        )
    )
    orders = rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([5], pa.int64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp("1990-01-01")], pa.timestamp("us")
                ),
            }
        )
    )
    nation = pd.DataFrame({"n_nationkey": [0], "n_name": ["N0"]})
    out = returned_item_revenue(
        li, orders, customer_path="/root/testdata/sf0.001/customer.parquet",
        nation_df=nation, k=5, parts=4,
    )
    assert len(out.to_pandas()) == 0
    assert sorted(out.schema().names) == [
        "c_custkey", "c_name", "n_name", "revenue",
    ]


def test_running_value_sum_matches_pandas(ray_session):
    """Cumulative window vs a brute-force pandas groupby-cumsum."""
    import datetime as dt

    from rayslog.stages.events import running_value_sum

    rng = np.random.default_rng(7)
    rows = [
        (int(rng.integers(0, 6)),
         dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s)),
         "click",
         round(float(rng.uniform(0, 10)), 2))
        for s in rng.choice(10_000, size=200, replace=False)
    ]
    df = running_value_sum(_events(rows), parts=4).to_pandas()

    ref = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "event_id": list(range(len(rows))),
            "c": [int(round(r[3] * 100)) for r in rows],
        }
    ).sort_values(["user_id", "ts", "event_id"])
    ref["run_value"] = ref.groupby("user_id")["c"].cumsum() / 100.0
    ref["run_n"] = ref.groupby("user_id").cumcount() + 1

    a = df.sort_values(["user_id", "event_id"], ignore_index=True)
    b = ref[["user_id", "event_id", "run_value", "run_n"]].sort_values(
        ["user_id", "event_id"], ignore_index=True
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_dominant_event_type_tie_breaks_ascending(ray_session):
    """Equal counts resolve to the lexicographically smallest type."""
    import datetime as dt

    from rayslog import pipeline as p

    rows = (
        [(1, dt.datetime(2024, 1, 1, 0, i), "view", 1.0) for i in range(3)]
        + [(1, dt.datetime(2024, 1, 1, 1, i), "click", 1.0) for i in range(3)]
        + [(2, dt.datetime(2024, 1, 1, 2), "signup", 1.0)]
    )
    ds = _events(rows)
    # the query fn reads <dir>/events.parquet — stage it in a tmp dir
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ds.write_parquet(f"{d}/events.parquet")
        df = p.q_dominant_event_type(d).to_pandas().sort_values(
            "user_id", ignore_index=True
        )
    assert list(df["user_id"]) == [1, 2]
    assert list(df["event_type"]) == ["click", "signup"]  # tie -> asc
    assert list(df["n_events"]) == [3, 1]


def test_user_retention_single_day_users(ray_session):
    """Users active on one day only -> a single (cohort, 0) diagonal."""
    import datetime as dt
    import tempfile

    from rayslog import pipeline as p

    rows = [
        (u, dt.datetime(2024, 1, 1 + u, 3), "click", 1.0)
        for u in range(4)
    ] * 2  # two events each, same day
    with tempfile.TemporaryDirectory() as d:
        _events(rows).write_parquet(f"{d}/events.parquet")
        df = p.q_user_retention(d).to_pandas()
    assert (df["day_offset"] == 0).all()
    assert df["n_users"].sum() == 4


def test_page_rank_toy_graph_hand_computed(ray_session):
    """Path graph 1-2-3 via two 2-item orders: hand-computed integer
    PageRank, one iteration."""
    import ray.data as rd

    from rayslog.stages.relational import page_rank_copurchase

    li = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([10, 10, 20, 20], pa.int64()),
                "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
            }
        )
    ).repartition(2)
    df = (
        page_rank_copurchase(li, iters=1, scale=10**12, parts=4)
        .to_pandas()
        .sort_values("part_id", ignore_index=True)
    )
    # N=3, base=333333333333; deg: 1->1, 2->2, 3->1
    base = 10**12 // 3
    c1 = base // 1          # contributions of vertices 1 and 3
    c2 = base // 2          # vertex 2
    t = (15 * base) // 100
    exp = {
        1: t + (85 * c2) // 100,
        2: t + (85 * (c1 + c1)) // 100,
        3: t + (85 * c2) // 100,
    }
    assert list(df["part_id"]) == [1, 2, 3]
    assert list(df["pr_score"]) == [exp[1], exp[2], exp[3]]
