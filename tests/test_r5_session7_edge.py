"""Session-7 operator edge cases (ray-free): the islands/streak kernel,
the PMI ULP rule, the reconciliation tolerance compare, argmax tie
discipline, spine diffs and keep-best re-applicability.

Each test re-derives the operator's inner kernel the same way the
query closure builds it (the pipeline fns are closures over Datasets,
so the vectorized cores are pinned here against brute force / DuckDB).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _streaks(u, ts, eid, v):
    """value_streaks inner kernel (pipeline.q_value_streaks per_part)."""
    uniq, codes = np.unique(u, return_inverse=True)
    order = np.lexsort((eid, ts, codes))
    c, vv = codes[order], v[order]
    new_user = np.r_[True, c[1:] != c[:-1]]
    brk = new_user | np.r_[True, ~(vv[1:] > vv[:-1])]
    run_id = np.cumsum(brk) - 1
    run_len = np.bincount(run_id)
    run_user = c[brk]
    user_starts = np.r_[0, np.nonzero(run_user[1:] != run_user[:-1])[0] + 1]
    max_streak = np.maximum.reduceat(run_len, user_starts)
    return dict(zip(uniq[run_user[user_starts]], max_streak))


def test_value_streaks_vs_bruteforce_fuzz():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(1, 200))
        u = rng.integers(0, 8, n).astype(np.int64)
        ts = rng.integers(0, 50, n).astype(np.int64)
        eid = rng.permutation(n).astype(np.int64)  # unique tiebreak
        v = rng.integers(-5, 6, n).astype(np.int64)
        got = _streaks(u, ts, eid, v)
        # brute force: per user, walk rows in (ts, eid) order
        want = {}
        for uu in np.unique(u):
            rows = np.nonzero(u == uu)[0]
            rows = rows[np.lexsort((eid[rows], ts[rows]))]
            best = cur = 1
            for a, b in zip(rows[:-1], rows[1:]):
                cur = cur + 1 if v[b] > v[a] else 1
                best = max(best, cur)
            want[uu] = best
        assert got == want


def test_pmi_log_matches_duckdb_ln_fuzz():
    """math.log == DuckDB ln bit-for-bit on the PMI ratio (np.log's
    SIMD path is 1 ULP off on some inputs — the bug this round fixed)."""
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(11)
    for _ in range(200):
        n, tu, tb, c1, c2 = (int(x) for x in rng.integers(1, 50_000, 5))
        num = float(n) * float(tu) * float(tu)
        den = float(tb) * float(c1) * float(c2)
        got = math.log(num / den)
        want = con.execute(
            f"SELECT ln((CAST({n} AS DOUBLE)*CAST({tu} AS DOUBLE)"
            f"*CAST({tu} AS DOUBLE))/(CAST({tb} AS DOUBLE)"
            f"*CAST({c1} AS DOUBLE)*CAST({c2} AS DOUBLE)))"
        ).fetchone()[0]
        assert got == want, (n, tu, tb, c1, c2)


def test_reconcile_tolerance_matches_sql_fuzz():
    """100*abs(rev6-tot6) <= tot6 (int64) == the oracle CASE arm."""
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(13)
    tot = rng.integers(0, 10**9, 300).astype(np.int64) * 10_000
    rev = (
        tot
        + rng.integers(-10**8, 10**8, 300).astype(np.int64)
    )
    got = 100 * np.abs(rev - tot) <= tot
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({int(r)},{int(tt)})" for r, tt in zip(rev, tot))
        + ") v(rev6, tot6)"
    )
    want = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT 100*abs(rev6 - tot6) <= tot6 FROM t"
            ).fetchall()
        ]
    )
    assert (got == want).all()


def test_peak_hour_argmax_tie_rule():
    """lexsort((hour, -n, codes)) + first == max count, min hour on
    ties — the host_peak_hour final discipline."""
    rng = np.random.default_rng(17)
    for _ in range(30):
        m = int(rng.integers(1, 60))
        codes = rng.integers(0, 5, m).astype(np.int64)
        hour = rng.integers(0, 24, m).astype(np.int64)
        n = rng.integers(1, 6, m).astype(np.int64)
        # dedupe (host, hour) pairs like the grouped counts would be
        _, keep = np.unique(codes * 24 + hour, return_index=True)
        codes, hour, n = codes[keep], hour[keep], n[keep]
        order = np.lexsort((hour, -n, codes))
        first = np.r_[True, codes[order][1:] != codes[order][:-1]]
        pick = order[first]
        for c, h, nn in zip(codes[pick], hour[pick], n[pick]):
            rows = codes == c
            assert nn == n[rows].max()
            assert h == hour[rows & (n == n[rows].max())].min()


def test_quiet_days_spine_diff_vs_duckdb():
    import duckdb

    rng = np.random.default_rng(19)
    con = duckdb.connect()
    for _ in range(20):
        days = np.unique(rng.integers(9000, 9060, int(rng.integers(1, 40))))
        spine = np.arange(days[0], days[-1] + 1)
        got = np.setdiff1d(spine, days, assume_unique=True)
        want = con.execute(
            f"""
WITH d AS (SELECT unnest({[int(x) for x in days]}) AS day),
s AS (SELECT unnest(generate_series({int(days[0])}, {int(days[-1])}))
        AS day)
SELECT day FROM s WHERE day NOT IN (SELECT day FROM d) ORDER BY day
"""
        ).fetchnumpy()["day"]
        assert (got == want).all()


def test_keep_best_reduce_reapplicable():
    """biggest_order_per_customer's keep-best is a valid tree reduce:
    reduce(reduce(a) ∪ reduce(b)) == reduce(a ∪ b) on random splits."""
    rng = np.random.default_rng(23)

    def best(ck, okey, cents):
        order = np.lexsort((okey, -cents, ck))
        first = np.r_[True, ck[order][1:] != ck[order][:-1]]
        pick = np.sort(order[first])
        return ck[pick], okey[pick], cents[pick]

    for _ in range(40):
        n = int(rng.integers(2, 300))
        ck = rng.integers(0, 20, n).astype(np.int64)
        okey = rng.permutation(n).astype(np.int64)
        cents = rng.integers(0, 50, n).astype(np.int64)  # heavy ties
        whole = best(ck, okey, cents)
        cut = int(rng.integers(1, n))
        a = best(ck[:cut], okey[:cut], cents[:cut])
        b = best(ck[cut:], okey[cut:], cents[cut:])
        merged = best(
            np.r_[a[0], b[0]], np.r_[a[1], b[1]], np.r_[a[2], b[2]]
        )
        for w, m in zip(whole, merged):
            assert (np.sort(w) == np.sort(m)).all()
        # and the winner per key is identical, not just the key set
        dw = dict(zip(whole[0], zip(whole[1], whole[2])))
        dm = dict(zip(merged[0], zip(merged[1], merged[2])))
        assert dw == dm


def test_latency_bucket_clamp():
    """Negative inter-turn deltas clamp to bucket 0 (no-year 3164
    stamps can step back across the pinned default year)."""
    MIN_US = np.int64(60_000_000)
    d = np.array([-5_000_000, 0, 59_999_999, 60_000_000, 3_600_000_000])
    bucket = np.maximum(d, 0) // MIN_US
    assert bucket.tolist() == [0, 0, 0, 1, 60]


def test_dominant_share_two_level_vs_pandas():
    import pandas as pd

    rng = np.random.default_rng(29)
    for _ in range(20):
        n = int(rng.integers(5, 400))
        pk = rng.integers(0, 15, n).astype(np.int64)
        sk = rng.integers(0, 6, n).astype(np.int64)
        qc = rng.integers(1, 100, n).astype(np.int64)
        # kernel (q_dominant_suppliers per_part, post group_by)
        df = (
            pd.DataFrame({"pk": pk, "sk": sk, "qc": qc})
            .groupby(["pk", "sk"], as_index=False)["qc"]
            .sum()
        )
        g_pk = df["pk"].to_numpy()
        q = df["qc"].to_numpy()
        order = np.argsort(g_pk, kind="stable")
        uniq, start = np.unique(g_pk[order], return_index=True)
        tot = np.add.reduceat(q[order], start)
        dom = 8 * q > tot[np.searchsorted(uniq, g_pk)]
        got = set(
            zip(g_pk[dom].tolist(), df["sk"].to_numpy()[dom].tolist())
        )
        # brute force
        want = set()
        totals = df.groupby("pk")["qc"].sum()
        for _, row in df.iterrows():
            if 8 * row["qc"] > totals[row["pk"]]:
                want.add((row["pk"], row["sk"]))
        assert got == want


def test_interval_sweep_fold_vs_single_pass_fuzz():
    """peak_active_users' range-partition fold == the single global
    sweep, for any cut points (incl. empty ranges) and heavy ties."""
    rng = np.random.default_rng(31)

    def single(ts, ds):
        ut, inv = np.unique(ts, return_inverse=True)
        agg = np.zeros(len(ut), dtype=np.int64)
        np.add.at(agg, inv, ds)
        pref = np.cumsum(agg)
        j = int(np.argmax(pref))
        return int(pref[j]), int(ut[j])

    for _ in range(60):
        n_sess = int(rng.integers(1, 80))
        s = rng.integers(0, 100, n_sess).astype(np.int64)
        e = s + rng.integers(0, 30, n_sess).astype(np.int64)
        ts = np.r_[s, e + 1]
        ds = np.r_[
            np.ones(n_sess, dtype=np.int64),
            -np.ones(n_sess, dtype=np.int64),
        ]
        want = single(ts, ds)
        # fold over arbitrary range cuts
        P = int(rng.integers(1, 9))
        lo, hi = int(ts.min()), int(ts.max())
        span = max(hi - lo + 1, 1)
        rp = ((ts - lo) * P // span).astype(np.int64)
        carry, best, best_t = 0, None, None
        for i in range(P):
            m = rp == i
            if not m.any():
                continue
            ut, inv = np.unique(ts[m], return_inverse=True)
            agg = np.zeros(len(ut), dtype=np.int64)
            np.add.at(agg, inv, ds[m])
            pref = np.cumsum(agg)
            j = int(np.argmax(pref))
            cand = carry + int(pref[j])
            if best is None or cand > best:
                best, best_t = cand, int(ut[j])
            carry += int(pref[-1])
        assert (best, best_t) == want


def test_length_neighbor_e2e_vs_duckdb_fuzz(ray_session, tmp_path):
    """q_length_neighbor end-to-end == the LAG/LEAD SQL on adversarial
    tiny corpora: heavy n_chars ties (values 0..5 force equal values
    straddling cell-interior AND cell-boundary positions), solo cells,
    empty buckets, single-doc langs."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from rayslog.pipeline import q_length_neighbor

    rng = np.random.default_rng(37)
    con = duckdb.connect()
    sql = """
WITH w AS (
  SELECT doc_id, lang, n_chars,
    lag(doc_id)  OVER o AS pid, lag(n_chars)  OVER o AS pn,
    lead(doc_id) OVER o AS nid, lead(n_chars) OVER o AS nn
  FROM read_parquet(?)
  WINDOW o AS (PARTITION BY lang ORDER BY n_chars, doc_id)
)
SELECT doc_id, lang,
  CASE WHEN pid IS NULL AND nid IS NULL THEN NULL
       WHEN pid IS NULL THEN nid
       WHEN nid IS NULL THEN pid
       WHEN abs(n_chars - pn) <= abs(n_chars - nn) THEN pid
       ELSE nid END AS neighbor_id
FROM w ORDER BY doc_id
"""
    for trial in range(6):
        n = int(rng.integers(1, 120))
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": rng.choice(["en", "es"], n),
                "n_chars": rng.integers(0, 6, n).astype(np.int64),
            }
        )
        d = tmp_path / f"corpus{trial}"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df), str(d / "documents.parquet"))
        got = (
            q_length_neighbor(str(d))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = con.execute(
            sql, [str(d / "documents.parquet")]
        ).fetchdf()
        got["neighbor_id"] = got["neighbor_id"].astype("float64")
        want["neighbor_id"] = want["neighbor_id"].astype("float64")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_distinct_count_by_timestamp_key(ray_session):
    """Timestamp group keys (incl. a NULL key group) flow through the
    null-fill placeholder path added for monthly_active_customers."""
    import ray.data as rd

    from rayslog.stages.aggregate import distinct_count_by

    t = pa.table(
        {
            "month": pa.array(
                [1_000_000, 1_000_000, 2_000_000, None, None, 2_000_000],
                pa.timestamp("us"),
            ),
            "uid": pa.array([1, 1, 2, 3, 4, 5], pa.int64()),
        }
    )
    for final in ("tree", "shuffle"):
        out = (
            distinct_count_by(
                rd.from_arrow(t), "month", "uid", alias="n", final=final
            )
            .to_pandas()
            .sort_values("month", na_position="first")
            .reset_index(drop=True)
        )
        assert out["n"].tolist() == [2, 1, 2], final
        assert out["month"].isna().tolist() == [True, False, False]


def test_distinct_count_by_tree_auto_split(ray_session):
    """The distinct tree hash-range splits by GROUP key past the
    threshold and still counts exactly (groups never straddle
    sub-trees); identical to the shuffle plan and the plain tree."""
    import numpy as np
    import ray.data as rd

    from rayslog.stages.aggregate import distinct_count_by

    rng = np.random.default_rng(41)
    n = 6000
    t = pa.table(
        {
            "g": pa.array(rng.integers(0, 40, n), pa.int64()),
            "v": pa.array(rng.integers(0, 500, n), pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    want = (
        distinct_count_by(ds, "g", "v", alias="n", final="shuffle")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    got_split = (
        distinct_count_by(ds, "g", "v", alias="n", split_threshold=100)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    got_plain = (
        distinct_count_by(ds, "g", "v", alias="n")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got_split, want)
    pd.testing.assert_frame_equal(got_plain, want)
