"""Round-5 kernel edge cases: the Levenshtein DP vs DuckDB, the
band-shifted-key overflow guard, dense-rank tie semantics, and the
quantile_cont interpolation expression."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_lev_dp_matches_duckdb_fuzz():
    """The numpy row-sweep DP == DuckDB levenshtein on random strings
    (incl. empties and unicode — DuckDB counts UTF-8 BYTES, so the
    kernel runs byte-level too)."""
    import duckdb

    from rayslog.pipeline import q_levenshtein_pairs  # noqa: F401

    # grab the inner kernel through a tiny shim: rebuild it the same
    # way the query does (the function is a closure, so re-derive)
    def _lev(a: str, b: str) -> int:
        if a == b:
            return 0
        an = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
        bn = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
        lb = len(bn)
        j_idx = np.arange(lb + 1, dtype=np.int64)
        prev = j_idx.copy()
        m = np.empty(lb + 1, dtype=np.int64)
        for i in range(1, len(an) + 1):
            m[0] = i
            np.minimum(
                prev[:-1] + (bn != an[i - 1]), prev[1:] + 1, out=m[1:]
            )
            g = m - j_idx
            np.minimum.accumulate(g, out=g)
            prev = g + j_idx
        return int(prev[lb])

    con = duckdb.connect()
    rng = np.random.default_rng(17)
    alphabet = list("abcde é✓")
    for _ in range(300):
        la, lb = rng.integers(0, 25, 2)
        a = "".join(rng.choice(alphabet) for _ in range(la))
        b = "".join(rng.choice(alphabet) for _ in range(lb))
        want = con.sql(
            "SELECT levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert _lev(a, b) == want, (a, b)


def test_band_key_guard_raises():
    from rayslog.stages.events import _check_band_key

    _check_band_key(10_000, 2**40)  # fine: 2^53ish < 2^63
    with pytest.raises(OverflowError):
        _check_band_key(2**33, 2**31)  # == 2^64 worth of key space


def test_dense_rank_ties_match_duckdb(ray_session, tmp_path):
    """supplier_balance_rank's boundary-cumsum dense rank == DuckDB
    dense_rank() on a synthetic supplier table dense with ties."""
    import duckdb
    import pyarrow.parquet as pq

    from rayslog.pipeline import q_supplier_balance_rank

    rng = np.random.default_rng(5)
    n = 400
    tbl = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
            "s_name": pa.array([f"S{i}" for i in range(n)]),
            "s_nationkey": pa.array(
                rng.integers(0, 7, n).astype(np.int32)
            ),
            # few distinct balances -> many ties
            "s_acctbal": pa.array(
                rng.integers(0, 9, n).astype(np.float64) * 1.25
            ),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "supplier.parquet")
    got = (
        q_supplier_balance_rank(str(sf))
        .to_pandas()
        .sort_values(["s_suppkey"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        f"""
        WITH s AS (
          SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS s_nationkey,
            CAST(round(s_acctbal * 100) AS BIGINT) AS cents
          FROM read_parquet('{sf}/supplier.parquet')
        )
        SELECT s_suppkey, s_nationkey,
          CAST(cents AS DOUBLE) / 100.0 AS s_acctbal,
          CAST(dense_rank() OVER
            (PARTITION BY s_nationkey ORDER BY cents DESC) AS BIGINT)
            AS bal_rank
        FROM s ORDER BY s_suppkey
        """
    ).df().reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tree_auto_split_hypothesis_fuzz(ray_session):
    """Property fuzz for the cardinality-adaptive tree: on random
    tables (random key cardinality, skew, block counts, thresholds)
    the split plan's grouped sums == pure-pandas groundtruth."""
    import pandas as pd
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rayslog.stages.aggregate import tree_aggregate

    @settings(max_examples=12, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        n_keys=st.integers(1, 200),
        n_rows=st.integers(1, 3_000),
        blocks=st.integers(1, 12),
        threshold=st.integers(1, 500),
        fanin=st.sampled_from([2, 4, 16]),
    )
    def run(seed, n_keys, n_rows, blocks, threshold, fanin):
        rng = np.random.default_rng(seed)
        keys = rng.zipf(1.3, n_rows) % n_keys
        vals = rng.integers(-5, 100, n_rows)
        tbl = pa.table(
            {
                "k": pa.array([f"key-{k}" for k in keys], pa.string()),
                "v": pa.array(vals, pa.int64()),
            }
        )
        ds = rd.from_arrow(tbl).repartition(blocks)
        got = (
            tree_aggregate(
                ds, ["k"], [("v", "sum")], ["total"],
                split_keys=["k"], split_threshold=threshold,
                fanin=fanin,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            pd.DataFrame({"k": [f"key-{k}" for k in keys], "total": vals})
            .groupby("k", as_index=False)["total"]
            .sum()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    run()


def test_quantile_cont_expression_parity():
    """(1-frac)*lo + frac*hi is DuckDB's quantile_cont expression —
    the algebraically-equal vlo + frac*(vhi-vlo) differs in the last
    ULP on real inputs (the p90 regression this test pins)."""
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(11)
    vals = np.round(rng.uniform(0, 500, 997), 2)
    con.register("v", __import__("pandas").DataFrame({"x": vals}))
    s = np.sort(vals)
    n = len(s)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        want = con.sql(f"SELECT quantile_cont(x, {q}) FROM v").fetchone()[0]
        h = q * (n - 1)
        lo = int(np.floor(h))
        frac = h - lo
        got = (
            s[lo]
            if frac == 0.0 or lo + 1 >= n
            else (1.0 - frac) * s[lo] + frac * s[lo + 1]
        )
        assert got == want, (q, got, want)


def test_segmented_inversions_fuzz():
    """The vectorized mergesort inversion counter == the O(n^2) brute
    count on random streams with heavy timestamp ties."""
    from rayslog.stages.events import segmented_inversions

    rng = np.random.default_rng(0)
    for _ in range(120):
        n = int(rng.integers(1, 300))
        nu = int(rng.integers(1, 8))
        ucode = rng.integers(0, nu, n).astype(np.int64)
        eid = rng.permutation(n).astype(np.int64)
        ts = rng.integers(0, max(2, n // 3), n).astype(np.int64)
        got = segmented_inversions(ucode, eid, ts)
        want = np.zeros(int(ucode.max()) + 1, np.int64)
        for u in range(len(want)):
            m = ucode == u
            t = ts[m][np.argsort(eid[m])]
            for j in range(len(t)):
                want[u] += int((t[:j] > t[j]).sum())
        assert (got == want).all()
