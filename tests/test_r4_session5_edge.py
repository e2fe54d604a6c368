"""Edge-case behavior of the session-5 operators: dominance brute
force for the skyline, DuckDB-NTILE parity on degenerate sizes and
ties, trigram counts vs a pandas reference, tie-aware global max, and
null z-scores for single-doc languages."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _parts_table(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_brand": pa.array([r[1] for r in rows], pa.string()),
                "p_size": pa.array([r[2] for r in rows], pa.int64()),
                "p_retailprice": pa.array(
                    [r[3] for r in rows], pa.float64()
                ),
            }
        )
    ).repartition(2)


def _skyline_brute(rows):
    """NOT EXISTS dominance reference (exact cents compare)."""
    out = []
    for a in rows:
        dominated = False
        for b in rows:
            if b[0] == a[0] or b[1] != a[1]:
                continue
            bc, ac = round(b[3] * 100), round(a[3] * 100)
            if b[2] <= a[2] and bc <= ac and (b[2] < a[2] or bc < ac):
                dominated = True
                break
        if not dominated:
            out.append(a[0])
    return sorted(out)


def test_part_skyline_brute_force(ray_session):
    rng = np.random.default_rng(7)
    rows = [
        (
            i,
            f"Brand#{rng.integers(1, 4)}",
            int(rng.integers(1, 6)),
            float(rng.integers(9000, 9020)) / 10.0,
        )
        for i in range(60)
    ]
    from rayslog.stages.relational import part_skyline

    df = part_skyline(_parts_table(rows), parts=4).to_pandas()
    assert sorted(df["p_partkey"]) == _skyline_brute(rows)


def test_part_skyline_equal_pairs_both_survive(ray_session):
    """Equal (size, price) twins never dominate each other."""
    rows = [(1, "B", 5, 10.0), (2, "B", 5, 10.0), (3, "B", 9, 20.0)]
    from rayslog.stages.relational import part_skyline

    df = part_skyline(_parts_table(rows), parts=2).to_pandas()
    assert sorted(df["p_partkey"]) == [1, 2]  # 3 dominated by both


def _orders_table(prices):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array(
                    list(range(len(prices))), pa.int64()
                ),
                "o_totalprice": pa.array(prices, pa.float64()),
            }
        )
    ).repartition(3)


@pytest.mark.parametrize("n", [1, 7, 10, 23])
def test_order_value_deciles_matches_duckdb(ray_session, n):
    import duckdb

    rng = np.random.default_rng(n)
    # heavy ties: prices drawn from 4 distinct values
    prices = [float(rng.choice([10.0, 20.0, 20.0, 30.0, 499999.0]))
              for _ in range(n)]
    from rayslog.stages.relational import order_value_deciles

    df = (
        order_value_deciles(_orders_table(prices), parts=8)
        .to_pandas()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    ref = duckdb.sql(
        """
WITH o AS (SELECT unnest(range(%d)) AS o_orderkey, unnest(?) AS p),
w AS (SELECT CAST(round(p*100) AS BIGINT) c,
      ntile(10) OVER (ORDER BY CAST(round(p*100) AS BIGINT),
                      o_orderkey) tile FROM o)
SELECT CAST(tile AS BIGINT) decile, CAST(count(*) AS BIGINT) n_orders,
  CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)/100.0 revenue
FROM w GROUP BY tile ORDER BY decile
"""
        % n,
        params=[prices],
    ).df()
    pd.testing.assert_frame_equal(df, ref)


def _events_table(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


def test_action_trigrams_vs_pandas(ray_session):
    rng = np.random.default_rng(3)
    rows = [
        (
            int(rng.integers(0, 6)),
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
            str(rng.choice(["a", "b", "c"])),
        )
        for i in range(200)
    ]
    from rayslog.stages.events import action_trigrams

    df = action_trigrams(_events_table(rows), parts=4).to_pandas()
    ref = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "event_id": range(len(rows)),
            "t2": [r[2] for r in rows],
        }
    ).sort_values(["user_id", "ts", "event_id"])
    ref["t1"] = ref.groupby("user_id")["t2"].shift(1)
    ref["t0"] = ref.groupby("user_id")["t2"].shift(2)
    ref = (
        ref.dropna(subset=["t0"])
        .groupby(["t0", "t1", "t2"])
        .size()
        .reset_index(name="n")
    )
    merged = df.merge(ref, on=["t0", "t1", "t2"], how="outer",
                      suffixes=("_ray", "_ref"))
    assert len(df) == len(ref)
    assert (merged["n_ray"] == merged["n_ref"]).all()


def test_action_trigrams_short_users_empty(ray_session):
    """Users with <3 events contribute no trigrams."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0), "a"),
        (1, dt.datetime(2024, 1, 1, 1), "b"),
        (2, dt.datetime(2024, 1, 1, 2), "c"),
    ]
    from rayslog.stages.events import action_trigrams

    out = action_trigrams(_events_table(rows), parts=2)
    assert len(out.to_pandas()) == 0
    assert set(out.schema().names) == {"t0", "t1", "t2", "n"}


def test_top_supplier_ties_all_survive(ray_session):
    import ray.data as rd

    from rayslog.stages.relational import top_supplier

    t = pa.table(
        {
            "l_suppkey": pa.array([1, 2, 3, 1], pa.int64()),
            "l_shipdate": pa.array(
                [dt.datetime(1996, 2, 1)] * 4, pa.timestamp("us")
            ),
            # suppliers 1 and 2 tie at 100.00 revenue (discount 0)
            "l_extendedprice": pa.array(
                [60.0, 100.0, 40.0, 40.0], pa.float64()
            ),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
        }
    )
    sup = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["s1", "s2", "s3"]}
    )
    df = top_supplier(
        rd.from_arrow(t).repartition(2), supplier_df=sup
    ).to_pandas()
    assert sorted(df["s_suppkey"]) == [1, 2]
    assert (df["total_revenue"] == 100.0).all()


def test_doc_length_zscore_single_doc_lang_null(ray_session):
    """A lang with one doc (or zero variance) gets null z."""
    import pyarrow.parquet as pq
    import tempfile, os

    from rayslog import pipeline as p

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "lang": pa.array(["en", "en", "fr", "de"]),
                    "n_chars": pa.array([10, 30, 50, 7], pa.int64()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        df = (
            p.q_doc_length_zscore(d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert df["z"].isna().tolist() == [False, False, True, True]
    # en: mean 20, sample std sqrt(200); z = +-10/sqrt(200)
    assert df["z"][0] == pytest.approx(-10 / np.sqrt(200))
    assert df["z"][1] == pytest.approx(10 / np.sqrt(200))


def test_repeat_order_share_all_first_orders(ray_session):
    import ray.data as rd
    import pyarrow.parquet as pq
    import tempfile, os

    from rayslog import pipeline as p

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_custkey": pa.array([10, 20, 30], pa.int64()),
                    "o_orderdate": pa.array(
                        [dt.datetime(1996, m, 1) for m in (1, 1, 2)],
                        pa.timestamp("us"),
                    ),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        df = p.q_repeat_order_share(d).to_pandas()
    assert df["n_repeat"].tolist() == [0, 0]
    assert df["repeat_share"].tolist() == [0.0, 0.0]


def test_triangle_count_plans_agree_and_match_brute(ray_session):
    """Broadcast and semi-join closing-edge plans count the same
    triangles as an itertools brute force."""
    import itertools

    import ray.data as rd

    from rayslog.stages.relational import triangle_count

    rng = np.random.default_rng(11)
    rows = []
    for ok in range(30):
        items = rng.choice(20, size=rng.integers(1, 6), replace=False)
        rows += [(ok, int(i)) for i in items]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    edges = set()
    by_order: dict = {}
    for ok, pk in rows:
        by_order.setdefault(ok, set()).add(pk)
    for items in by_order.values():
        for a, b in itertools.combinations(sorted(items), 2):
            edges.add((a, b))
    brute = sum(
        1
        for a, b, c in itertools.combinations(range(20), 3)
        if (a, b) in edges and (a, c) in edges and (b, c) in edges
    )
    for plan in ("broadcast", "semi"):
        ds = rd.from_arrow(t).repartition(3)
        df = triangle_count(ds, parts=4, plan=plan).to_pandas()
        assert df["n_triangles"].tolist() == [brute], plan


def test_value_mad_by_type_vs_duckdb_random(ray_session):
    """Grouped MAD matches DuckDB quantile_disc on random data with
    heavy ties and odd/even group sizes."""
    import duckdb
    import ray.data as rd

    from rayslog.stages.events import value_mad_by_type

    rng = np.random.default_rng(23)
    n = 500
    types = [str(rng.choice(["a", "b", "c", "d"])) for _ in range(n)]
    vals = [float(rng.integers(0, 40)) / 4.0 for _ in range(n)]
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )
    ).repartition(4)
    df = (
        value_mad_by_type(ds, parts=4)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ref = duckdb.sql(
        """
WITH c AS (SELECT t AS event_type, CAST(round(v*100) AS BIGINT) c
           FROM (SELECT unnest(?) t, unnest(?) v)),
m AS (SELECT event_type, c,
      quantile_disc(c, 0.5) OVER (PARTITION BY event_type) med FROM c)
SELECT event_type,
  CAST(quantile_disc(c, 0.5) AS DOUBLE)/100.0 median_value,
  CAST(quantile_disc(abs(c - med), 0.5) AS DOUBLE)/100.0 mad_value
FROM m GROUP BY event_type ORDER BY event_type
""",
        params=[types, vals],
    ).df()
    pd.testing.assert_frame_equal(df, ref)


def test_cohort_revenue_vs_pandas(ray_session):
    import pyarrow.parquet as pq
    import tempfile, os

    from rayslog import pipeline as p

    rng = np.random.default_rng(5)
    n = 300
    cust = rng.integers(0, 40, size=n)
    dates = [
        dt.datetime(1996, int(m), 1)
        for m in rng.integers(1, 13, size=n)
    ]
    price = np.round(rng.uniform(10, 99, size=n), 2)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array(cust, pa.int64()),
                    "o_orderdate": pa.array(dates, pa.timestamp("us")),
                    "o_totalprice": pa.array(price, pa.float64()),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        df = p.q_cohort_revenue(d).to_pandas()
    ref = pd.DataFrame(
        {"cust": cust, "month": dates,
         "c": np.round(price * 100).astype(np.int64)}
    )
    ref["cohort"] = ref.groupby("cust")["month"].transform("min")
    ref = (
        ref.groupby(["cohort", "month"])
        .agg(revenue=("c", "sum"), n_orders=("c", "size"))
        .reset_index()
        .sort_values(["cohort", "month"], ignore_index=True)
    )
    ref["revenue"] = ref["revenue"].astype(np.float64) / 100.0
    pd.testing.assert_frame_equal(
        df.reset_index(drop=True),
        ref[["cohort", "month", "revenue", "n_orders"]],
        check_dtype=False,
    )


def test_user_event_sets_disjoint_and_overlap(ray_session):
    import pyarrow.parquet as pq
    import tempfile, os

    from rayslog import pipeline as p

    rows = [  # u1: both; u2: purchase only; u3: error only; u4: other
        (1, "purchase"), (1, "error"), (1, "purchase"),
        (2, "purchase"), (3, "error"), (4, "view"),
    ]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array(
                        [r[1] for r in rows], pa.string()
                    ),
                }
            ),
            os.path.join(d, "events.parquet"),
        )
        df = p.q_user_event_sets(d).to_pandas()
    assert df.iloc[0].to_dict() == {
        "n_purchase_users": 2, "n_error_users": 2, "n_both": 1,
        "n_purchase_only": 1, "n_error_only": 1,
    }


def test_rolling_dau_vs_brute_force(ray_session):
    """Interval-diff rolling distinct == brute-force window sets,
    including gap-exactly-7 interval splits."""
    import ray.data as rd

    from rayslog.stages.events import rolling_dau

    rng = np.random.default_rng(17)
    rows = [
        (
            int(rng.integers(0, 8)),
            dt.datetime(2024, 1, 1)
            + dt.timedelta(days=int(rng.integers(0, 30)), hours=3),
        )
        for _ in range(120)
    ]
    # force a gap of exactly 7 days for one user (new interval edge)
    rows += [(99, dt.datetime(2024, 2, 10)), (99, dt.datetime(2024, 2, 17))]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    ).repartition(3)
    df = (
        rolling_dau(ds, window_days=7, parts=4)
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    days = sorted({r[1].date() for r in rows})
    ref = []
    for d in days:
        users = {
            r[0]
            for r in rows
            if 0 <= (d - r[1].date()).days <= 6
        }
        ref.append((d, len(users)))
    assert [
        (r.day.date(), r.active_users) for r in df.itertuples()
    ] == ref


def test_followed_within_boundaries(ray_session):
    """Window is (t, t+w]: same-timestamp B excluded, exactly-at-w B
    included, cross-user B never matches."""
    import ray.data as rd

    from rayslog.stages.events import followed_within

    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1: A at 0, B at exactly +1h -> match (boundary inclusive)
        (1, base, "error"),
        (1, base + dt.timedelta(hours=1), "purchase"),
        # u2: A and B at the SAME instant -> no match (strictly after)
        (2, base, "error"),
        (2, base, "purchase"),
        # u3: A, B at +1h+1us -> no match
        (3, base, "error"),
        (3, base + dt.timedelta(hours=1, microseconds=1), "purchase"),
        # u4: A only; u5: B only (cross-user must not match u4)
        (4, base, "error"),
        (5, base + dt.timedelta(minutes=5), "purchase"),
        # u6: two As, one B within range of both -> 2 events, 1 user
        (6, base, "error"),
        (6, base + dt.timedelta(minutes=10), "error"),
        (6, base + dt.timedelta(minutes=30), "purchase"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(3)
    df = followed_within(ds, parts=4).to_pandas()
    assert df.iloc[0].to_dict() == {
        "n_matched_events": 3, "n_matched_users": 2,
    }


def test_partition_invariance_of_exchange_ops(ray_session):
    """Exchange-based session-5 operators give identical results at
    parts=1 and parts=7 — the distributed plan must not depend on the
    partitioning grain."""
    import ray.data as rd

    from rayslog.stages.events import (
        action_trigrams,
        followed_within,
        rolling_dau,
        value_mad_by_type,
    )
    from rayslog.stages.relational import order_value_deciles, part_skyline

    rng = np.random.default_rng(31)
    n = 400
    ev = pa.table(
        {
            "user_id": pa.array(
                rng.integers(0, 12, size=n), pa.int64()
            ),
            "ts": pa.array(
                [
                    dt.datetime(2024, 1, 1)
                    + dt.timedelta(minutes=int(m))
                    for m in rng.integers(0, 20000, size=n)
                ],
                pa.timestamp("us"),
            ),
            "event_id": pa.array(list(range(n)), pa.int64()),
            "event_type": pa.array(
                [str(x) for x in rng.choice(
                    ["error", "purchase", "view"], size=n)],
                pa.string(),
            ),
            "value": pa.array(
                np.round(rng.uniform(0, 50, size=n), 2), pa.float64()
            ),
        }
    )
    parts_t = pa.table(
        {
            "p_partkey": pa.array(list(range(80)), pa.int64()),
            "p_brand": pa.array(
                [f"B{int(x)}" for x in rng.integers(0, 5, size=80)],
                pa.string(),
            ),
            "p_size": pa.array(rng.integers(1, 9, size=80), pa.int64()),
            "p_retailprice": pa.array(
                np.round(rng.uniform(900, 910, size=80), 2), pa.float64()
            ),
        }
    )
    orders_t = pa.table(
        {
            "o_orderkey": pa.array(list(range(200)), pa.int64()),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 9000, size=200), 2),
                pa.float64(),
            ),
        }
    )

    def norm(df):
        return df.sort_values(list(df.columns), ignore_index=True)

    cases = [
        lambda p: action_trigrams(
            rd.from_arrow(ev).repartition(3), parts=p),
        lambda p: value_mad_by_type(
            rd.from_arrow(ev).repartition(3), parts=p),
        lambda p: rolling_dau(
            rd.from_arrow(ev).repartition(3), parts=p),
        lambda p: followed_within(
            rd.from_arrow(ev).repartition(3), parts=p),
        lambda p: part_skyline(
            rd.from_arrow(parts_t).repartition(3), parts=p),
        lambda p: order_value_deciles(
            rd.from_arrow(orders_t).repartition(3), parts=p),
    ]
    for fn in cases:
        a = norm(fn(1).to_pandas())
        b = norm(fn(7).to_pandas())
        pd.testing.assert_frame_equal(a, b)


def test_weighted_median_crossing_ties(ray_session):
    """Weighted median picks the smallest price whose cumulative
    weight reaches half, including tie pileups at the boundary."""
    import pyarrow.parquet as pq
    import tempfile, os

    from rayslog import pipeline as p

    # brand B: prices 1,1,2 with weights 1,1,10 -> total 12, half 6:
    # cum at price 1 = 2 (<6), at 2 = 12 -> median 2.
    # brand C: prices 5,7 weights 3,3 -> cum at 5 = 3, 2*3 >= 6 -> 5.
    rows = [
        ("B", 1.0, 1.0), ("B", 1.0, 1.0), ("B", 2.0, 10.0),
        ("C", 5.0, 3.0), ("C", 7.0, 3.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array(range(len(rows)), pa.int64()),
                    "p_brand": pa.array([r[0] for r in rows]),
                }
            ),
            os.path.join(d, "part.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array(range(len(rows)), pa.int64()),
                    "l_extendedprice": pa.array(
                        [r[1] for r in rows], pa.float64()
                    ),
                    "l_quantity": pa.array(
                        [r[2] for r in rows], pa.float64()
                    ),
                }
            ),
            os.path.join(d, "lineitem.parquet"),
        )
        df = (
            p.q_weighted_median_price(d)
            .to_pandas()
            .sort_values("p_brand")
            .reset_index(drop=True)
        )
    assert df["w_median_price"].tolist() == [2.0, 5.0]


def test_conversion_delay_excludes_same_instant(ray_session):
    import pyarrow.parquet as pq
    import tempfile, os

    from rayslog import pipeline as p

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "error"),
        (1, base, "purchase"),  # same instant -> NOT a conversion
        (1, base + dt.timedelta(seconds=30), "purchase"),
        (2, base, "error"),     # no purchase -> no conversion
    ]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows],
                                   pa.timestamp("us")),
                    "event_type": pa.array([r[2] for r in rows]),
                }
            ),
            os.path.join(d, "events.parquet"),
        )
        df = p.q_conversion_delay(d).to_pandas()
    assert df["n_conversions"].tolist() == [1]
    assert df["mean_delay_sec"].tolist() == [30.0]


def test_order_gap_median_hist_two_orders(ray_session):
    """Two orders 10 days apart -> one customer in the 10-day bucket;
    single-order customers contribute nothing."""
    import pyarrow.parquet as pq
    import tempfile, os

    from rayslog import pipeline as p

    rows = [
        (1, 1, dt.datetime(1996, 1, 1)),
        (1, 2, dt.datetime(1996, 1, 11)),
        (2, 3, dt.datetime(1996, 3, 1)),
    ]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                    "o_orderkey": pa.array([r[1] for r in rows], pa.int64()),
                    "o_orderdate": pa.array(
                        [r[2] for r in rows], pa.timestamp("us")
                    ),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        df = p.q_order_gap_median_hist(d).to_pandas()
    assert df.values.tolist() == [[10, 1]]


def test_dup_rate_by_source_with_real_dups(ray_session):
    import pyarrow.parquet as pq
    import tempfile, os

    from rayslog import pipeline as p

    texts = ["aaa", "aaa", "bbb", "ccc", "ccc", "ccc"]
    src = ["s1", "s1", "s1", "s2", "s2", "s2"]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"source": pa.array(src), "text": pa.array(texts)}),
            os.path.join(d, "documents.parquet"),
        )
        df = (
            p.q_dup_rate_by_source(d)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
    assert df["n_docs"].tolist() == [3, 3]
    assert df["n_distinct"].tolist() == [2, 1]
    assert df["dup_rate"].tolist() == [1.0 - 2 / 3.0, 1.0 - 1 / 3.0]


@pytest.mark.parametrize("seed", [2, 9, 41])
def test_weighted_median_vs_duckdb_random(ray_session, seed):
    """Multi-seed differential fuzz: the engine's weighted median
    matches DuckDB's window-cumsum spelling on random joins with
    heavy price ties."""
    import duckdb
    import tempfile, os

    import pyarrow.parquet as pq

    from rayslog import pipeline as p

    rng = np.random.default_rng(seed)
    n_parts, n_lines = 30, 400
    brands = [f"B{int(x)}" for x in rng.integers(0, 4, size=n_parts)]
    lpk = rng.integers(0, n_parts, size=n_lines)
    price = rng.choice([10.0, 10.0, 20.0, 35.5], size=n_lines)
    qty = rng.integers(1, 9, size=n_lines).astype(float)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array(range(n_parts), pa.int64()),
                    "p_brand": pa.array(brands),
                }
            ),
            os.path.join(d, "part.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array(lpk, pa.int64()),
                    "l_extendedprice": pa.array(price, pa.float64()),
                    "l_quantity": pa.array(qty, pa.float64()),
                }
            ),
            os.path.join(d, "lineitem.parquet"),
        )
        df = (
            p.q_weighted_median_price(d)
            .to_pandas()
            .sort_values("p_brand")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        for t in ("part", "lineitem"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{d}/{t}.parquet')"
            )
        from rayslog.sqloracle import training_oracle_queries

        ref = (
            con.sql(training_oracle_queries()["weighted_median_price"])
            .df()
            .sort_values("p_brand")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(df, ref)
