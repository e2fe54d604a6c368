"""Ray-free kernel tests for the session-8 operators.

- grouped_ffill: brute-force differential fuzz (pandas groupby ffill)
  over adversarial group/null layouts — the LAST_VALUE IGNORE NULLS
  carry must never cross a group boundary.
- log_templates regex parity: pc.replace_substring_regex('[0-9]+')
  must equal DuckDB regexp_replace(..., 'g') byte-for-byte (both RE2,
  but pinned here so a library upgrade can't silently diverge).
- daily_autocorr moments: the overflow-disciplined Pearson on known
  series (constant -> NULL, linear -> 1.0) and vs numpy on a random
  series.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _ffill_ref(codes, ti, valid, values):
    df = pd.DataFrame(
        {
            "g": codes,
            "t": ti,
            "v": np.where(valid, values.astype(float), np.nan),
        }
    )
    df = df.sort_values(["g", "t"], kind="stable").reset_index(drop=True)
    filled = df.groupby("g")["v"].ffill()
    return df["g"].to_numpy(), df["t"].to_numpy(), filled.to_numpy()


@pytest.mark.parametrize("seed", range(8))
def test_grouped_ffill_matches_pandas(seed):
    from rayslog.stages.events import grouped_ffill

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    codes = rng.integers(0, max(1, n // 7), n).astype(np.int64)
    ti = rng.permutation(n).astype(np.int64)
    valid = rng.random(n) < rng.uniform(0.05, 0.9)
    values = rng.integers(0, 8, n).astype(np.int64)

    order, filled, has = grouped_ffill(codes, ti, valid, values)
    g_ref, t_ref, v_ref = _ffill_ref(codes, ti, valid, values)

    # same (group, order-key) ordering up to stable ties
    assert np.array_equal(codes[order], g_ref)
    assert np.array_equal(ti[order], t_ref)
    got = np.where(has, filled.astype(float), np.nan)
    assert np.allclose(got, v_ref, equal_nan=True)


def test_grouped_ffill_never_crosses_groups():
    from rayslog.stages.events import grouped_ffill

    # group 0 ends with a valid row; group 1 is all-null — must stay
    # unfilled even though the global accumulate carries index 1
    codes = np.array([0, 0, 1, 1], np.int64)
    ti = np.array([0, 1, 0, 1], np.int64)
    valid = np.array([True, True, False, False])
    values = np.array([5, 6, 0, 0], np.int64)
    order, filled, has = grouped_ffill(codes, ti, valid, values)
    assert list(has) == [True, True, False, False]
    assert list(filled[:2]) == [5, 6]


def test_template_regex_matches_duckdb():
    import duckdb

    cases = [
        "",
        "no digits here",
        "123",
        "a1b22c333",
        "1 start and end 9",
        "unicode é7ü88 ok",
        "<N> already 5 masked",
        "0" * 40,
        "tab\t9\tsep",
    ]
    got = pc.replace_substring_regex(
        pa.array(cases), pattern="[0-9]+", replacement="<N>"
    ).to_pylist()
    want = [
        duckdb.sql(
            "SELECT regexp_replace(?, '[0-9]+', '<N>', 'g')", params=[c]
        ).fetchone()[0]
        for c in cases
    ]
    assert got == want


def _autocorr_moments(c):
    x = [int(v) for v in c[:-1]]
    y = [int(v) for v in c[1:]]
    n = len(x)
    if n == 0:
        return None
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    syy = sum(b * b for b in y)
    vx = float(n) * float(sxx) - float(sx) * float(sx)
    vy = float(n) * float(syy) - float(sy) * float(sy)
    if vx > 0 and vy > 0:
        return (float(n) * float(sxy) - float(sx) * float(sy)) / math.sqrt(
            vx * vy
        )
    return None


def test_autocorr_known_series():
    assert _autocorr_moments(np.array([7, 7, 7, 7])) is None  # zero var
    r = _autocorr_moments(np.array([1, 2, 3, 4, 5]))
    assert r is not None and abs(r - 1.0) < 1e-12  # perfectly linear
    assert _autocorr_moments(np.array([3])) is None  # no pairs


def test_autocorr_matches_numpy():
    rng = np.random.default_rng(42)
    c = rng.integers(100, 10_000, 60)
    r = _autocorr_moments(c)
    want = np.corrcoef(c[:-1].astype(float), c[1:].astype(float))[0, 1]
    assert abs(r - want) < 1e-9
