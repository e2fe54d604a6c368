"""Distributed order statistics that avoid a global sort operator.

``grouped_gini`` computes the exact per-group Gini coefficient of an
integer column via the rank-weighted-sum identity
``G = (sum (2r-1)x - nS) / (nS)``: rows partition by VALUE RANGE (equal
values can never straddle a range, and the identity is tie-order
invariant), each range part sorts locally per group and folds exact
int64 ``(m, sum, sum (2j-1)x)`` triples, and the driver stitches the
P triples per group in range order — global rank = local rank +
cumulative lower-range count.  No reference counterpart (the reference
is a row parser); the shape generalizes value_gini / token_gini_by_lang
to any (group, non-negative int) pair.

int64 ``rsum`` overflows past ~1e9 rows/group (n^2 * max_value); split
groups into value-range sub-keys before that scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def gini_partials_fold(df):
    """Pure driver-side fold of range-part partials — one row per
    (group, rpart) with exact int64 ``m`` (rows), ``s`` (value sum) and
    ``rsum`` (sum (2j-1)x over the part's LOCAL sorted ranks).  Returns
    ``(groups, n, total, gini)`` lists; arithmetic is Python-int exact
    until the final double expression, which mirrors the DuckDB oracle
    double-for-double (every moment converted FIRST — invariant #4b)."""
    df = df.sort_values(["g", "rpart"], ignore_index=True)
    groups, ns, totals, ginis = [], [], [], []
    for gval, grp in df.groupby("g", sort=True, dropna=False):
        off = 0
        n = 0
        S = 0
        rsum_g = 0
        for m_, s_, r_ in zip(
            grp["m"].tolist(), grp["s"].tolist(), grp["rsum"].tolist()
        ):
            rsum_g += int(r_) + 2 * off * int(s_)
            off += int(m_)
            n += int(m_)
            S += int(s_)
        groups.append(gval)
        ns.append(n)
        totals.append(S)
        if S > 0:
            ginis.append(
                (float(rsum_g) - float(n) * float(S))
                / (float(n) * float(S))
            )
        else:
            ginis.append(None)
    return groups, ns, totals, ginis


def grouped_gini(ds, group_col: str, val_col: str, parts: int = 32):
    """Exact per-group Gini of ``val_col`` (non-negative int64) over a
    dataset that already carries only ``(group_col, val_col)``.
    Returns a tiny Dataset ``(group_col, n, total, gini)``; callers
    rename / rescale.  ``ds`` materializes ONCE (its blocks feed both
    the min/max scalar tree and the range exchange)."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import (
        live_block_refs,
        task_exchange,
        tree_reduce_refs,
    )

    R = int(parts)
    empty_out = pa.table(
        {
            group_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "total": pa.array([], pa.int64()),
            "gini": pa.array([], pa.float64()),
        }
    )

    mat = ds.materialize()
    brefs = live_block_refs(mat)
    if not brefs:
        return rd.from_arrow(empty_out)

    def minmax(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        col = val_col if val_col in t.column_names else "lo"
        if col == val_col:
            return pa.table(
                {
                    "lo": pa.array([int(pc.min(t.column(val_col)).as_py())]),
                    "hi": pa.array([int(pc.max(t.column(val_col)).as_py())]),
                }
            )
        return pa.table(
            {
                "lo": pa.array([int(pc.min(t.column("lo")).as_py())]),
                "hi": pa.array([int(pc.max(t.column("hi")).as_py())]),
            }
        )

    @ray.remote
    def _mm(t):
        return minmax(t)

    mm = tree_reduce_refs([_mm.remote(r) for r in brefs], minmax)
    if not mm.num_rows:
        return rd.from_arrow(empty_out)
    lo = int(mm.column("lo")[0].as_py())
    hi = int(mm.column("hi")[0].as_py())
    span = max(hi - lo + 1, 1)

    def pre(t: pa.Table) -> pa.Table:
        c = t.column(val_col).to_numpy(zero_copy_only=False)
        rp = ((c - lo) * R // span).astype(np.int32)
        return t.append_column("rpart", pa.array(rp))

    _partials_empty = pa.table(
        {
            "g": pa.array([], pa.string()),
            "rpart": pa.array([], pa.int32()),
            "m": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "rsum": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _partials_empty
        t = t.sort_by(
            [(group_col, "ascending"), (val_col, "ascending")]
        )
        g = t.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = pc.dictionary_encode(g).indices.to_numpy(
            zero_copy_only=False
        )
        c = t.column(val_col).to_numpy(zero_copy_only=False)
        change = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.nonzero(change)[0]
        seg_id = np.cumsum(change) - 1
        j = np.arange(len(c), dtype=np.int64) - starts[seg_id] + 1
        contrib = (2 * j - 1) * c
        m = np.diff(np.r_[starts, len(c)]).astype(np.int64)
        s = np.add.reduceat(c, starts)
        rsum = np.add.reduceat(contrib, starts)
        rp = int(t.column("rpart")[0].as_py())
        return pa.table(
            {
                "g": g.take(pa.array(starts)),
                "rpart": pa.array(np.full(len(starts), rp, np.int32)),
                "m": pa.array(m),
                "s": pa.array(s.astype(np.int64)),
                "rsum": pa.array(rsum.astype(np.int64)),
            }
        )

    parts_ds = task_exchange(
        brefs, "rpart", R, per_part, drop_part_col=False, pre_fn=pre
    )
    df = parts_ds.to_pandas()
    if df.empty or "g" not in df.columns:
        return rd.from_arrow(empty_out)
    groups, ns, totals, ginis = gini_partials_fold(df)
    gtype = mat.schema().base_schema.field(group_col).type
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(groups, gtype),
                "n": pa.array(ns, pa.int64()),
                "total": pa.array(totals, pa.int64()),
                "gini": pa.array(ginis, pa.float64()),
            }
        )
    )


def grouped_dense_ranks(t: pa.Table, group_col: str, val_col: str):
    """Sort ``t`` by (group asc, value DESC) and return ``(sorted_t,
    dense_ranks)`` — rank 1 = the group's largest distinct value, tie
    rows share a rank.  One sort + two cumsum passes, no per-group
    Python; the kernel under top_events_with_ties' keep tree."""
    import numpy as np

    t = t.sort_by([(group_col, "ascending"), (val_col, "descending")])
    g = t.column(group_col)
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    codes = pc.dictionary_encode(g).indices.to_numpy(zero_copy_only=False)
    v = t.column(val_col).to_numpy(zero_copy_only=False)
    new_g = np.r_[True, codes[1:] != codes[:-1]]
    new_v = np.r_[True, (v[1:] != v[:-1]) | new_g[1:]]
    grp_start = np.maximum.accumulate(
        np.where(new_g, np.arange(len(v)), 0)
    )
    cs = np.cumsum(new_v)
    dr = cs - cs[grp_start] + 1
    return t, dr.astype(np.int64)


def keep_dense_topk(
    t: pa.Table, group_col: str, val_col: str, k: int, keep_cols
) -> pa.Table:
    """Rows whose per-group dense rank (value DESC) is <= k.  The rule
    is RE-APPLICABLE — top-k distinct of a union equals top-k distinct
    over each side's top-k distinct keeps — so it rides tree_reduce."""
    if not t.num_rows:
        return t.select(keep_cols) if t.column_names else t
    t, dr = grouped_dense_ranks(t, group_col, val_col)
    return t.filter(pa.array(dr <= k)).select(keep_cols)
