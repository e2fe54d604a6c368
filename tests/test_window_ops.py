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
