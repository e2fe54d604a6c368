"""Both dim-leg plans of the TPC-H-shaped queries agree, and the big
(hash_join) leg engages automatically above RAYSLOG_BROADCAST_MAX_ROWS.

Round-3 verdict item #4: q_regional_revenue/q_top_customers used to
materialize the full customer/supplier tables on the driver; now the
leg auto-selects on the parquet-metadata row count."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, ignore_index=True)


def test_regional_revenue_legs_identical(ray_session):
    """Broadcast-lookup legs vs distributed hash_join legs, same rows."""
    from rayslog import pipeline as p
    from rayslog.stages.relational import regional_revenue_cents

    small = p.q_regional_revenue(SF_DIR).to_pandas()

    dims_ds = {
        "customer": p._read(SF_DIR, "customer", ["c_custkey", "c_nationkey"]),
        "supplier": p._read(SF_DIR, "supplier", ["s_suppkey", "s_nationkey"]),
    }
    tiny = {
        t: pq.read_table(f"{SF_DIR}/{t}.parquet", columns=cols).to_pandas()
        for t, cols in [
            ("nation", ["n_nationkey", "n_name", "n_regionkey"]),
            ("region", ["r_regionkey", "r_name"]),
        ]
    }
    big = regional_revenue_cents(
        p._read(
            SF_DIR,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        p._read(SF_DIR, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        dims_ds["customer"],
        dims_ds["supplier"],
        tiny["nation"],
        tiny["region"],
        region_name="ASIA",
    ).to_pandas()

    assert len(small) > 0
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_exact=True)


def test_regional_revenue_big_leg_engages(ray_session, monkeypatch):
    """Threshold 0 forces every dim through the hash_join leg; rows
    must not change."""
    from rayslog import pipeline as p

    base = p.q_regional_revenue(SF_DIR).to_pandas()
    monkeypatch.setenv("RAYSLOG_BROADCAST_MAX_ROWS", "0")
    forced = p.q_regional_revenue(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(_norm(base), _norm(forced), check_exact=True)


def test_top_customers_df_and_path_legs_identical(ray_session):
    from rayslog import pipeline as p
    from rayslog.stages.relational import top_customers_by_revenue

    via_path = p.q_top_customers(SF_DIR).to_pandas()

    customer_df = pq.read_table(
        f"{SF_DIR}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).to_pandas()
    via_df = top_customers_by_revenue(
        p._read(SF_DIR, "orders", ["o_custkey", "o_totalprice"]),
        customer_df=customer_df,
    ).to_pandas()

    assert len(via_path) == 10
    # order is part of the contract (revenue desc) — compare as-is
    pd.testing.assert_frame_equal(
        via_path.reset_index(drop=True),
        via_df.reset_index(drop=True),
        check_exact=True,
    )


def test_large_orders_survivor_legs_identical(ray_session, monkeypatch):
    """The survivor side auto-selects broadcast vs distributed hash
    join on RAYSLOG_BROADCAST_MAX_ROWS; both legs emit identical
    rows (top-100 order is part of the contract)."""
    from rayslog import pipeline as p

    base = p.q_large_orders(SF_DIR).to_pandas()
    assert len(base) > 0
    monkeypatch.setenv("RAYSLOG_BROADCAST_MAX_ROWS", "1")
    forced = p.q_large_orders(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True),
        forced.reset_index(drop=True),
        check_exact=True,
    )


def test_promo_revenue_part_legs_identical(ray_session, monkeypatch):
    """The part dim leg auto-selects broadcast vs hash_join; the Q14
    ratio must not move."""
    from rayslog import pipeline as p

    base = p.q_promo_revenue(SF_DIR).to_pandas()
    assert len(base) == 1
    monkeypatch.setenv("RAYSLOG_BROADCAST_MAX_ROWS", "0")
    forced = p.q_promo_revenue(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        _norm(base), _norm(forced), check_exact=True
    )


def test_session4_query_legs_identical(ray_session, monkeypatch):
    """nation_trade_volume / top_open_orders / special_deal_revenue:
    broadcast vs forced hash_join dim legs emit identical rows."""
    from rayslog import pipeline as p

    base = {
        "trade": p.q_nation_trade_volume(SF_DIR).to_pandas(),
        "open": p.q_top_open_orders(SF_DIR).to_pandas(),
        "deal": p.q_special_deal_revenue(SF_DIR).to_pandas(),
    }
    assert len(base["trade"]) > 0
    assert len(base["open"]) == 10
    assert len(base["deal"]) == 1
    monkeypatch.setenv("RAYSLOG_BROADCAST_MAX_ROWS", "0")
    forced = {
        "trade": p.q_nation_trade_volume(SF_DIR).to_pandas(),
        "open": p.q_top_open_orders(SF_DIR).to_pandas(),
        "deal": p.q_special_deal_revenue(SF_DIR).to_pandas(),
    }
    for k in base:
        pd.testing.assert_frame_equal(
            _norm(base[k]), _norm(forced[k]), check_exact=True
        )


def test_nation_market_share_legs_identical(ray_session, monkeypatch):
    """Q8's with_year orders side: broadcast vs forced hash_join legs
    emit identical (year, share) rows, and the share is a well-formed
    fraction."""
    from rayslog import pipeline as p

    base = p.q_nation_market_share(SF_DIR).to_pandas()
    assert len(base) > 0
    assert ((base["mkt_share"] >= 0) & (base["mkt_share"] <= 1)).all()
    monkeypatch.setenv("RAYSLOG_BROADCAST_MAX_ROWS", "0")
    forced = p.q_nation_market_share(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        _norm(base), _norm(forced), check_exact=True
    )
