"""North-star parity: stable (conv_id, turn_idx) ordering with per-turn
text/field equality against the row oracle — position-aligned AFTER the
global sort, key-aligned otherwise."""

from __future__ import annotations

import pandas as pd

from rayslog.config import DEFAULT_CONFIG
from rayslog.kernels import oracle

SF_DIR = "/root/testdata/sf0.001"


def test_global_sort_and_per_turn_equality(ray_session):
    from rayslog.pipeline import parsed_dataset

    ds = parsed_dataset(
        SF_DIR, columns=("conv_id", "turn_idx", "text")
    ).sort(["conv_id", "turn_idx"])
    df = ds.to_pandas()

    # global order is exactly (conv_id, turn_idx); turn_idx dense per conv
    expected = df.sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    pd.testing.assert_frame_equal(df.reset_index(drop=True), expected)
    for _, g in df.groupby("conv_id"):
        assert sorted(g["turn_idx"].tolist()) == list(range(len(g)))

    # per-turn equality vs the reference-exact oracle, position-aligned
    for row in df.head(500).itertuples():
        exp = oracle.parse_row(row.text, DEFAULT_CONFIG)
        assert row.parse_error == exp["parse_error"] or (
            pd.isna(row.parse_error) and exp["parse_error"] is None
        ), row.text
        if exp["parse_error"] is None:
            for col in ("hostname", "tag", "content", "message",
                        "structured_data", "app_name"):
                got = getattr(row, col)
                want = exp[col]
                if want is None:
                    assert got is None or pd.isna(got), (row.text, col)
                else:
                    assert got == want, (row.text, col)
