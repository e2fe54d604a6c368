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
