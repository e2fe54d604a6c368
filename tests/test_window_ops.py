"""Property tests for the round-4 window/pair operators:
grouped_ntile vs a pandas NTILE reference (random corpora, heavy ties,
degenerate group sizes) and co_purchase_pairs' vectorized C(n,2)
expansion vs a brute-force itertools reference."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa


def _ntile_ref(df: pd.DataFrame, n: int) -> pd.Series:
    """DuckDB/ANSI NTILE: first (len % n) buckets get the extra row."""
    out = np.empty(len(df), dtype=np.int64)
    for _, g in df.groupby("g", sort=False):
        order = g.sort_values(["v", "i"], kind="mergesort").index
        m = len(order)
        base, rem = divmod(m, n)
        sizes = [base + 1] * rem + [base] * (n - rem)
        tile = np.repeat(np.arange(1, n + 1), sizes)[:m]
        out[df.index.get_indexer(order)] = tile
    return pd.Series(out, index=df.index)


def test_grouped_ntile_matches_pandas_reference(ray_session):
    import ray.data as rd

    from rayslog.stages.aggregate import grouped_ntile

    rng = np.random.default_rng(7)
    for trial, (rows, groups, n) in enumerate(
        [(503, 7, 4), (64, 1, 4), (41, 40, 3), (200, 5, 10), (9, 3, 4)]
    ):
        df = pd.DataFrame(
            {
                "g": rng.integers(0, groups, rows).astype(str),
                # heavy ties in v force the (v, i) tie-break
                "v": rng.integers(0, 6, rows),
                "i": np.arange(rows, dtype=np.int64),
            }
        )
        ds = rd.from_pandas(df).repartition(5)
        got = (
            grouped_ntile(ds, "g", ["v", "i"], n=n, parts=4)
            .to_pandas()
            .sort_values("i", ignore_index=True)
        )
        want = df.assign(ntile=_ntile_ref(df, n)).sort_values(
            "i", ignore_index=True
        )
        assert (got["ntile"] == want["ntile"]).all(), f"trial {trial}"


def test_co_purchase_pair_expansion_matches_bruteforce(ray_session):
    import ray.data as rd

    from rayslog.stages.relational import co_purchase_pairs

    rng = np.random.default_rng(11)
    rows = 600
    df = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 80, rows),
            "l_partkey": rng.integers(0, 25, rows),
        }
    )
    got = (
        co_purchase_pairs(rd.from_pandas(df).repartition(4), k=10_000, parts=8)
        .to_pandas()
        .sort_values(["part_a", "part_b"], ignore_index=True)
    )

    counts: dict[tuple[int, int], int] = {}
    for _, g in df.drop_duplicates().groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(g["l_partkey"]), 2):
            if a != b:
                counts[(a, b)] = counts.get((a, b), 0) + 1
    want = (
        pd.DataFrame(
            [(a, b, c) for (a, b), c in counts.items()],
            columns=["part_a", "part_b", "n_orders"],
        )
        .sort_values(["part_a", "part_b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_exact=True
    )


def test_rolling_time_stats_matches_bruteforce(ray_session):
    """RANGE-frame semantics vs an O(n^2) reference: duplicate
    timestamps (peers in-frame), multiple users per part, tiny part
    count so users share parts."""
    import ray.data as rd

    from rayslog.stages.events import rolling_time_stats

    rng = np.random.default_rng(23)
    n = 400
    base = pd.Timestamp("2024-03-01").value // 1000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 12, n),
            # coarse grid -> many exact-duplicate timestamps
            "ts_us": base + rng.integers(0, 40, n) * 100_000_000,
            "event_id": np.arange(n, dtype=np.int64),
            "value": np.round(rng.uniform(0, 50, n), 2),
        }
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(df["user_id"], pa.int64()),
                "ts": pa.array(df["ts_us"], pa.timestamp("us")),
                "event_id": pa.array(df["event_id"], pa.int64()),
                "value": pa.array(df["value"], pa.float64()),
            }
        )
    ).repartition(3)
    W = 250  # seconds; not a multiple of the 100s grid
    got = (
        rolling_time_stats(ds, window_sec=W, parts=4)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )

    w_us = W * 1_000_000
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    n_ref = np.empty(n, dtype=np.int64)
    s_ref = np.empty(n, dtype=np.int64)
    for i in range(n):
        m = (
            (df["user_id"] == df["user_id"][i])
            & (df["ts_us"] >= df["ts_us"][i] - w_us)
            & (df["ts_us"] <= df["ts_us"][i])
        ).to_numpy()
        n_ref[i], s_ref[i] = m.sum(), cents[m].sum()
    assert (got["n_win"].to_numpy() == n_ref).all()
    assert np.array_equal(got["sum_win"].to_numpy(), s_ref / 100.0)


def test_above_avg_orders_matches_bruteforce(ray_session, tmp_path):
    """The exact price_c*n > sum_c comparison vs a pandas reference,
    including boundary rows (every order of a 1-order customer is NOT
    above its own average)."""
    import pyarrow.parquet as pq

    from rayslog import pipeline as p

    rng = np.random.default_rng(31)
    n = 500
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.integers(0, 40, n),
            "o_orderstatus": "O",
            "o_totalprice": np.round(rng.uniform(10, 1000, n), 2),
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": rng.choice(["A", "B", "C"], n),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "orders.parquet"))
    got = (
        p.q_above_avg_orders(str(d))
        .to_pandas()
        .sort_values("o_orderpriority", ignore_index=True)
    )
    c = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
    g = df.assign(c=c).groupby("o_custkey")["c"]
    nn = g.transform("size").to_numpy()
    ss = g.transform("sum").to_numpy()
    above = c * nn > ss
    want = (
        df[above]
        .groupby("o_orderpriority")
        .size()
        .rename("n_above")
        .reset_index()
        .sort_values("o_orderpriority", ignore_index=True)
    )
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])
    assert (got["n_above"].to_numpy() == want["n_above"].to_numpy()).all()
