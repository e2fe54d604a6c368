"""Session-9 kernel tests (ray-free): the grouped-Gini range-partition
fold must equal the direct single-sort identity for ANY range split
that keeps equal values in one part."""

from __future__ import annotations

import numpy as np
import pandas as pd

from rayslog.stages.stats import gini_partials_fold


def _direct_gini(x: np.ndarray):
    """Reference: sort, G = (sum (2i-1)x - nS) / (nS) in the oracle's
    exact expression order."""
    x = np.sort(x.astype(np.int64))
    n = len(x)
    S = int(x.sum())
    rsum = int((((2 * np.arange(1, n + 1, dtype=np.int64)) - 1) * x).sum())
    if S <= 0:
        return n, S, None
    return n, S, (float(rsum) - float(n) * float(S)) / (float(n) * float(S))


def _partials_for(groups, values, parts):
    """Build (g, rpart, m, s, rsum) partials the way grouped_gini's
    per_part does: range id from value, local sort within (part,
    group), local ranks."""
    lo, hi = int(values.min()), int(values.max())
    span = max(hi - lo + 1, 1)
    rp = (values - lo) * parts // span
    rows = []
    for p in np.unique(rp):
        for g in np.unique(groups[rp == p]):
            v = np.sort(values[(rp == p) & (groups == g)].astype(np.int64))
            m = len(v)
            rsum = int(
                (((2 * np.arange(1, m + 1, dtype=np.int64)) - 1) * v).sum()
            )
            rows.append((g, int(p), m, int(v.sum()), rsum))
    return pd.DataFrame(rows, columns=["g", "rpart", "m", "s", "rsum"])


def test_gini_fold_matches_direct_fuzz():
    rng = np.random.default_rng(42)
    for trial in range(30):
        n = int(rng.integers(1, 400))
        n_groups = int(rng.integers(1, 5))
        parts = int(rng.integers(1, 9))
        groups = rng.integers(0, n_groups, n).astype(str)
        # heavy ties on purpose: small value domain
        values = rng.integers(0, int(rng.integers(2, 50)), n)
        df = _partials_for(groups, values, parts)
        gs, ns, totals, ginis = gini_partials_fold(df)
        for g, n_, S_, gini in zip(gs, ns, totals, ginis):
            mask = groups == g
            n_ref, S_ref, g_ref = _direct_gini(values[mask])
            assert n_ == n_ref and S_ == S_ref
            if g_ref is None:
                assert gini is None
            else:
                assert gini == g_ref, (trial, g, gini, g_ref)


def test_gini_fold_all_zero_values():
    df = _partials_for(
        np.array(["a", "a", "b"]), np.array([0, 0, 0]), parts=2
    )
    gs, ns, totals, ginis = gini_partials_fold(df)
    assert ginis == [None] * len(gs)
    assert totals == [0] * len(gs)


def test_keep_dense_topk_tree_matches_duckdb_fuzz():
    """Planted-tie fuzz: per-part keep -> tree merge -> final ranks
    must equal DuckDB's DENSE_RANK() <= k WITH every tie row kept (the
    driver corpus is tie-free at the top ranks, so this is the only
    place the tie semantics is exercised)."""
    import duckdb
    import pyarrow as pa

    from rayslog.stages.stats import grouped_dense_ranks, keep_dense_topk

    rng = np.random.default_rng(7)
    COLS = ["event_id", "event_type", "value"]
    for trial in range(20):
        n = int(rng.integers(1, 500))
        k = int(rng.integers(1, 5))
        # tiny value domain -> dense ties, including at the top
        vals = rng.integers(0, int(rng.integers(2, 8)), n) / 2.0
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(
                    rng.integers(0, 3, n).astype(str)
                ),
                "value": pa.array(vals, pa.float64()),
            }
        )
        # split into parts, keep per part, merge through a 2-level tree
        n_parts = int(rng.integers(1, 6))
        bounds = np.sort(rng.integers(0, n + 1, n_parts - 1)) if n_parts > 1 else np.array([], np.int64)
        pieces = []
        prev = 0
        for b in list(bounds) + [n]:
            pieces.append(
                keep_dense_topk(t.slice(prev, b - prev), "event_type",
                                "value", k, COLS)
            )
            prev = b
        merged = pieces[0]
        for piece in pieces[1:]:
            merged = keep_dense_topk(
                pa.concat_tables([merged, piece]), "event_type", "value",
                k, COLS,
            )
        got, dr = grouped_dense_ranks(merged, "event_type", "value")
        got = got.append_column("rnk", pa.array(dr))
        con = duckdb.connect()
        con.register("t_in", t.to_pandas())
        ref = con.execute(
            f"""
            WITH r AS (
              SELECT event_id, event_type, value,
                dense_rank() OVER (PARTITION BY event_type
                                   ORDER BY value DESC) AS rnk
              FROM t_in)
            SELECT event_id, event_type, value, CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= {k}
            ORDER BY event_type, value DESC, event_id
            """
        ).df()
        gdf = (
            got.to_pandas()
            .sort_values(["event_type", "value", "event_id"],
                         ascending=[True, False, True],
                         ignore_index=True)
        )
        assert len(gdf) == len(ref), (trial, len(gdf), len(ref))
        pd.testing.assert_frame_equal(
            gdf, ref, check_dtype=True
        )


def test_ks_range_partition_sup_matches_direct_fuzz():
    """The value-range-partitioned KS sup (per-part local cumsum +
    driver prefix offsets, integer cross-product) must equal the
    direct single-pass sup for ANY split that keeps equal values in
    one part — including heavy ties and all-one-sample parts."""
    rng = np.random.default_rng(11)
    for trial in range(30):
        n = int(rng.integers(2, 600))
        R = int(rng.integers(1, 9))
        vals = rng.integers(0, int(rng.integers(2, 40)), n).astype(
            np.float64
        ) / 4.0
        s1 = rng.random(n) < rng.random()
        n1, n2 = int(s1.sum()), int((~s1).sum())
        if n1 == 0 or n2 == 0:
            continue
        # direct: cumulative counts over sorted distinct values
        order = np.argsort(vals, kind="stable")
        v_s, s_s = vals[order], s1[order]
        newv = np.r_[True, v_s[1:] != v_s[:-1]]
        c1 = np.add.reduceat(s_s.astype(np.int64), np.nonzero(newv)[0])
        c2 = np.add.reduceat(
            (~s_s).astype(np.int64), np.nonzero(newv)[0]
        )
        direct = int(
            np.abs(
                np.cumsum(c1) * n2 - np.cumsum(c2) * n1
            ).max()
        )
        # partitioned: range id from value, per-part grouped counts,
        # prefix offsets, per-part sup
        lo, hi = vals.min(), vals.max()
        span = max(hi - lo, 0.0)
        rp = (
            np.clip(((vals - lo) * R / span).astype(np.int64), 0, R - 1)
            if span > 0
            else np.zeros(n, np.int64)
        )
        sups = []
        o1 = o2 = 0
        for p in range(R):
            m = rp == p
            if not m.any():
                continue
            pv, ps = vals[m], s1[m]
            po = np.argsort(pv, kind="stable")
            pv, ps = pv[po], ps[po]
            pn = np.r_[True, pv[1:] != pv[:-1]]
            starts = np.nonzero(pn)[0]
            pc1 = np.add.reduceat(ps.astype(np.int64), starts)
            pc2 = np.add.reduceat((~ps).astype(np.int64), starts)
            f1 = np.cumsum(pc1) + o1
            f2 = np.cumsum(pc2) + o2
            sups.append(int(np.abs(f1 * n2 - f2 * n1).max()))
            o1 += int(pc1.sum())
            o2 += int(pc2.sum())
        assert max(sups) == direct, (trial, max(sups), direct)


def test_w1_range_partition_stitch_matches_direct_fuzz():
    """The range-partitioned Wasserstein-1 numerator (per-part local
    integral + seam terms weighting the part-end cumulative F across
    the gap to the next part's first value) must equal the direct
    single-pass integral for ANY tie-safe split."""
    rng = np.random.default_rng(23)
    for trial in range(30):
        n = int(rng.integers(2, 600))
        R = int(rng.integers(1, 9))
        c = rng.integers(0, int(rng.integers(2, 60)), n).astype(np.int64)
        s1 = rng.random(n) < rng.random()
        n1, n2 = int(s1.sum()), int((~s1).sum())
        if n1 == 0 or n2 == 0:
            continue
        order = np.argsort(c, kind="stable")
        cs, ss = c[order], s1[order]
        newv = np.r_[True, cs[1:] != cs[:-1]]
        starts = np.nonzero(newv)[0]
        dv = cs[starts]
        c1 = np.add.reduceat(ss.astype(np.int64), starts)
        c2 = np.add.reduceat((~ss).astype(np.int64), starts)
        f1, f2 = np.cumsum(c1), np.cumsum(c2)
        direct = int(
            (
                np.abs(f1[:-1] * n2 - f2[:-1] * n1) * (dv[1:] - dv[:-1])
            ).sum()
        ) if len(dv) > 1 else 0
        # partitioned with seams
        lo, hi = int(c.min()), int(c.max())
        span = max(hi - lo + 1, 1)
        rp = (c - lo) * R // span
        num = 0
        o1 = o2 = 0
        prev = None
        for p in range(R):
            m = rp == p
            if not m.any():
                continue
            pc_, ps = c[m], s1[m]
            po = np.argsort(pc_, kind="stable")
            pc_, ps = pc_[po], ps[po]
            pn = np.r_[True, pc_[1:] != pc_[:-1]]
            st = np.nonzero(pn)[0]
            pdv = pc_[st]
            pc1 = np.add.reduceat(ps.astype(np.int64), st)
            pc2 = np.add.reduceat((~ps).astype(np.int64), st)
            pf1 = np.cumsum(pc1) + o1
            pf2 = np.cumsum(pc2) + o2
            if prev is not None:
                ef1, ef2, lc = prev
                num += abs(ef1 * n2 - ef2 * n1) * (int(pdv[0]) - lc)
            if len(pdv) > 1:
                num += int(
                    (
                        np.abs(pf1[:-1] * n2 - pf2[:-1] * n1)
                        * (pdv[1:] - pdv[:-1])
                    ).sum()
                )
            o1 += int(pc1.sum())
            o2 += int(pc2.sum())
            prev = (o1, o2, int(pdv[-1]))
        assert num == direct, (trial, num, direct)


def test_schema_safe_empty_dataset(ray_session):
    """Ray quirk pin: from_arrow(typed 0-row).to_pandas() loses the
    schema; _schema_safe must hand back the typed Arrow table (what
    the driver contract accepts), and pass non-empty datasets
    through untouched."""
    import pyarrow as pa
    import ray.data as rd

    from rayslog.pipeline import _schema_safe

    t = pa.table({"day": pa.array([], pa.timestamp("us"))})
    # the quirk itself (if Ray ever fixes it, this documents the why)
    assert list(rd.from_arrow(t).to_pandas().columns) == []
    out = _schema_safe(rd.from_arrow(t))
    assert isinstance(out, pa.Table)
    assert out.column_names == ["day"]
    assert out.num_rows == 0

    t2 = pa.table({"x": pa.array([1, 2], pa.int64())})
    out2 = _schema_safe(rd.from_arrow(t2))
    assert not isinstance(out2, pa.Table)
    assert out2.to_pandas()["x"].tolist() == [1, 2]
