"""Property-based fuzz: vectorized kernel ≡ row oracle on arbitrary
syslog-shaped inputs (hypothesis generates adversarial structures the
seeded corpus may miss)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rayslog.config import ParserConfig
from rayslog.kernels import oracle
from rayslog.kernels.vectorized import parse_batch
from rayslog.schema import PARSE_COLUMN_NAMES

CFG = ParserConfig(default_year=2025)

_piece = st.sampled_from(
    [
        "<", ">", "-", "Z", "[", "]", ":", " ", ".", "+",
        "1", "34", "165", "999", "1234",
        "Jan", "Oct", "Dec", "Xyz",
        "Oct 11 22:14:15", "Oct  1 02:04:05",
        "2003-10-11T22:14:15", ".003", ".123456789", "+02:00", "-07:00",
        "host", "app[12]:", "su:", "msg body here", "a" * 33, "é",
        "<34>", "<165>1 ", "ID47", "[sd p=\"v\"]", "][",
    ]
)
_text = st.lists(_piece, min_size=0, max_size=12).map("".join)


@settings(max_examples=300, deadline=None)
@given(st.lists(_text, min_size=1, max_size=40))
def test_vectorized_matches_oracle_on_fuzz(texts):
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    out = parse_batch(tbl, CFG)
    got = out.to_pylist()
    ts_us = out.column("ts_parsed").cast(pa.int64()).to_pylist()
    for i, t in enumerate(texts):
        expect = oracle.parse_row(t, CFG)
        row = got[i]
        for col in PARSE_COLUMN_NAMES:
            if col == "ts_parsed":
                # exact integer-µs comparison (float .timestamp() is
                # lossy past ~year 2255)
                assert ts_us[i] == expect["timestamp"], (t, col)
            else:
                assert row[col] == expect.get(col), (t, col)
