"""Property test: the raw-task exchange join plan and the sort-shuffle
plan are row-for-row equivalent for every `how`, on random tables with
duplicate keys, nulls in values, and empty sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st


def _mk(ids, vals, key, valname):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                key: pa.array(ids, pa.int64()),
                valname: pa.array(vals, pa.int64()),
            }
        )
    ).repartition(3)


def _norm(df, cols):
    return (
        df[cols]
        .sort_values(cols, ignore_index=True)
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "semi", "anti", "left", "full"])
@settings(max_examples=12, deadline=None)
@given(
    lk=st.lists(st.integers(0, 12), min_size=0, max_size=30),
    rk=st.lists(st.integers(0, 12), min_size=0, max_size=30),
    data=st.data(),
)
def test_join_plans_agree(ray_session, how, lk, rk, data):
    from rayslog.stages.relational import hash_join

    # all-empty Ray datasets lose their schema (the tasks plan raises a
    # clear error there; the shuffle plan crashes) — fuzz typed inputs
    assume(len(lk) > 0)
    assume(len(rk) > 0)
    lv = data.draw(
        st.lists(st.integers(-5, 5), min_size=len(lk), max_size=len(lk))
    )
    rv = data.draw(
        st.lists(st.integers(-5, 5), min_size=len(rk), max_size=len(rk))
    )
    left = _mk(lk, lv, "k", "lval")
    right = _mk(rk, rv, "k", "rval")
    a_ds = hash_join(left, right, key="k", buckets=4, how=how,
                     plan="tasks")
    a = a_ds.to_pandas()
    left2 = _mk(lk, lv, "k", "lval")
    right2 = _mk(rk, rv, "k", "rval")
    b = hash_join(left2, right2, key="k", buckets=4, how=how,
                  plan="shuffle").to_pandas()
    # plain pandas merge oracle
    ldf = pd.DataFrame({"k": np.array(lk, dtype=np.int64),
                        "lval": np.array(lv, dtype=np.int64)})
    rdf = pd.DataFrame({"k": np.array(rk, dtype=np.int64),
                        "rval": np.array(rv, dtype=np.int64)})
    if how == "inner":
        exp = ldf.merge(rdf, on="k", how="inner")
    elif how == "left":
        exp = ldf.merge(rdf, on="k", how="left")
    elif how == "full":
        exp = ldf.merge(rdf, on="k", how="outer")
    elif how == "semi":
        exp = ldf[ldf["k"].isin(rdf["k"])]
    else:
        exp = ldf[~ldf["k"].isin(rdf["k"])]
    if len(exp) == 0:
        # Ray's to_pandas drops columns on all-empty datasets (both
        # plans); the tasks plan still carries the typed schema
        assert len(a) == 0 and len(b) == 0
        assert sorted(a_ds.schema().names) == sorted(exp.columns)
        return
    cols = sorted(set(exp.columns))
    assert sorted(a.columns) == cols and sorted(b.columns) == cols
    na, nb = _norm(a, cols), _norm(b, cols)
    # the shuffle plan's pandas merge may widen dtypes; compare values
    pd.testing.assert_frame_equal(
        na, nb, check_dtype=False, check_exact=True
    )
    pd.testing.assert_frame_equal(
        na, _norm(exp, cols), check_dtype=False, check_exact=True
    )


@pytest.mark.parametrize("how", ["inner", "semi", "anti", "left", "full"])
@settings(max_examples=8, deadline=None)
@given(
    lk=st.lists(st.tuples(st.sampled_from(["a", "b", "c", "d"]),
                          st.integers(0, 3)),
                min_size=1, max_size=25),
    rk=st.lists(st.tuples(st.sampled_from(["a", "b", "c", "d"]),
                          st.integers(0, 3)),
                min_size=1, max_size=25),
)
def test_composite_key_join_plans_agree(ray_session, how, lk, rk):
    """Composite (string, int) keys: both plans == the pandas oracle."""
    import ray.data as rd

    from rayslog.stages.relational import hash_join

    def mk(keys, valname):
        return rd.from_arrow(
            pa.table(
                {
                    "u": pa.array([k[0] for k in keys]),
                    "c": pa.array([k[1] for k in keys], pa.int64()),
                    valname: pa.array(
                        list(range(len(keys))), pa.int64()
                    ),
                }
            )
        ).repartition(3)

    a = hash_join(mk(lk, "lval"), mk(rk, "rval"), key=["u", "c"],
                  buckets=4, how=how, plan="tasks").to_pandas()
    b = hash_join(mk(lk, "lval"), mk(rk, "rval"), key=["u", "c"],
                  buckets=4, how=how, plan="shuffle").to_pandas()
    ldf = pd.DataFrame({"u": [k[0] for k in lk],
                        "c": np.array([k[1] for k in lk], dtype=np.int64),
                        "lval": np.arange(len(lk), dtype=np.int64)})
    rdf = pd.DataFrame({"u": [k[0] for k in rk],
                        "c": np.array([k[1] for k in rk], dtype=np.int64),
                        "rval": np.arange(len(rk), dtype=np.int64)})
    rkeys = rdf[["u", "c"]].drop_duplicates()
    if how in ("inner", "left"):
        exp = ldf.merge(rdf, on=["u", "c"], how=how)
    elif how == "full":
        exp = ldf.merge(rdf, on=["u", "c"], how="outer")
    else:
        hit = ldf.merge(rkeys, on=["u", "c"], how="left",
                        indicator=True)["_merge"].eq("both").to_numpy()
        exp = ldf[hit] if how == "semi" else ldf[~hit]
    cols = sorted(set(exp.columns))
    if len(exp) == 0:
        assert len(a) == 0 and len(b) == 0
        return
    assert sorted(a.columns) == cols and sorted(b.columns) == cols
    na, nb, ne = _norm(a, cols), _norm(b, cols), _norm(exp, cols)
    pd.testing.assert_frame_equal(na, nb, check_dtype=False,
                                  check_exact=True)
    pd.testing.assert_frame_equal(na, ne, check_dtype=False,
                                  check_exact=True)


def test_empty_untyped_right_semi_anti(ray_session):
    """An all-empty right side (schema lost by Ray) is the common
    anti-join case — empty exclusion set: anti keeps everything, semi
    keeps nothing; inner/left raise a clear error."""
    import ray.data as rd

    from rayslog.stages.relational import hash_join

    left = _mk([1, 2, 3], [10, 20, 30], "k", "lval")
    empty = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()),
                  "rval": pa.array([], pa.int64())})
    ).repartition(2)
    assert empty.schema() is None  # the Ray quirk this guards

    anti = hash_join(left, empty, key="k", how="anti",
                     plan="tasks").to_pandas()
    assert sorted(anti["k"]) == [1, 2, 3]
    semi_ds = hash_join(
        _mk([1, 2, 3], [10, 20, 30], "k", "lval"),
        empty, key="k", how="semi", plan="tasks",
    )
    assert semi_ds.count() == 0
    assert sorted(semi_ds.schema().names) == ["k", "lval"]
    with pytest.raises(ValueError, match="right side has no rows"):
        hash_join(
            _mk([1], [1], "k", "lval"), empty, key="k", how="inner",
            plan="tasks",
        )


def test_empty_untyped_left_raises(ray_session):
    import ray.data as rd

    from rayslog.stages.relational import hash_join

    empty = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()),
                  "lval": pa.array([], pa.int64())})
    ).repartition(2)
    with pytest.raises(ValueError, match="left side has no rows"):
        hash_join(
            empty, _mk([1], [1], "k", "rval"), key="k", how="inner",
            plan="tasks",
        )
