"""Vectorized fast path ≡ row oracle.

Reference parity is established by the oracle's ported vectors
(test_oracle_*); this suite establishes the vectorized kernel's
equivalence with the oracle on golden inputs, adversarial edge shapes and
a seeded random corpus — so fast-path acceptance never changes semantics.
"""

import random

import pyarrow as pa
import os
import pytest

from rayslog.config import ParserConfig
from rayslog.kernels import oracle
from rayslog.kernels.vectorized import parse_batch
from rayslog.schema import PARSE_COLUMN_NAMES

CFG = ParserConfig(default_year=2025)

GOLDEN = [
    # RFC3164 golden vectors (rfc3164_test.go)
    "<34>Oct 11 22:14:15 mymachine very.large.syslog.message.tag: 'su root' failed for lonvick on /dev/pts/8",
    "<30>Jun 23 13:17:42 chronyd[1119]: Selected source 192.168.65.1",
    "<30>Jun 23 13:17:42 localhost Selected source 192.168.65.1",
    "<30>Jun 23 13:17:42 127.0.0.1 java.lang.NullPointerException",
    "<34>Oct 11 22:14:15 mymachine su: " + "a" * 2048,
    "<34>Oct 11 22:14:15 mymachine su: hello",
    "<34>Oct 34 32:72:82 mymachine su: bad time",
    "<34> Oct 11 22:14:15 mymachine su: leading space hdr",
    "<34>Oct  1 22:14:15 host tag: single digit day",
    # RFC5424 golden vectors (rfc5424_test.go)
    "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - 'su root' failed for lonvick on /dev/pts/8",
    "<165>1 2003-08-24T05:14:15.000003-07:00 192.0.2.1 myproc 8710 - - %% It's time to make the do-nuts.",
    '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"] An application event log entry...',
    '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [exampleSDID@32473 iut="3" eventSource= "Application" eventID="1011"][examplePriority@32473 class="high"]',
    "<165>1 - mymachine.example.com su 123 ID47 - msg with nil ts",
    "<165>1 2003-10-11T22:14:15.003Z - su 123 ID47 - nil host",
    "<165>1 2003-08-24T05:14:15.000000003-07:00 h a p m - ns frac fails",
    "<165>1 2003-02-31T00:00:00Z h a p m - feb 31 normalizes",
    "<165>1 2003-13-11T00:00:00Z h a p m - bad month",
    "<165>1 2003-10-32T00:00:00Z h a p m - bad day",
    "<165>1 2003-10-11T25:00:00Z h a p m - bad hour",
    "<165>1 2003-10-11T22:14:15+25:00 h a p m - bad offset hour",
    "<165>1 2003-10-11T22:14:15.52Z h a p m -",
    "<165>1 2003-10-11T22:14:15.52Z h a p m - ",
    # detection quirks / priority errors (syslogparser.go, parsercommon.go)
    "plain text message here",
    "<12345678>1 rest here",
    "short",
    "",
    "<>Oct 11 22:14:15 host tag: too short pri",
    "<1233>Oct 11 22:14:15 host tag: too long pri",
    "<7a8>Oct 11 22:14:15 host tag: non digit pri",
    "7>Oct 11 22:14:15 host tag: no start",
    "<999>Oct 11 22:14:15 host tag: syntactically-max pri",
    # header/tag/content edge shapes
    "<34>Oct 11 22:14:15 mymachine",               # Go panic (EOB after host)
    "<34>Oct 11 22:14:15 mymachine ",              # empty message region
    "<34>Oct 11 22:14:15 mymachine  doublespace",  # empty tag reset
    "<34>Oct 11 22:14:15 mymachine " + "a" * 50,   # 32-cap tag, rest content
    "<34>Oct 11 22:14:15 mymachine " + "a" * 32 + " content",
    "<34>Oct 11 22:14:15 mymachine apache2[10]: pid tag",
    "<34>Oct 11 22:14:15 mymachine tag[1]junk~~~ x",
    "<34>Oct 11 22:14:15 mymachine :leading colon",
    "<34>Oct 11 22:14:15 mymachine t:nospacecontent trail",
    "<34>Oct 11 22:14:15 host tag:  double space content  ",
    "<34>Feb 29 01:02:03 host tag: year-0 leap day",
    "<34>Feb 30 01:02:03 host tag: invalid day",
    "<34>Jun 31 01:02:03 host tag: 31 in 30-day month",
    # 5424 structural failures
    "<165>1 2003-10-11T22:14:15.003Z h " + "a" * 49 + " p m - app too long",
    "<165>1 2003-10-11T22:14:15.003Z h a " + "p" * 129 + " m - proc too long",
    "<165>1 2003-10-11T22:14:15.003Z h a p " + "m" * 33 + " - msgid too long",
    # parseUpToLen boundary: exactly maxLen is REJECTED (space sits at the
    # cap, rfc5424.go:638-663); maxLen-1 is the longest accepted token.
    "<165>1 2003-10-11T22:14:15.003Z h " + "a" * 48 + " p m - app at cap",
    "<165>1 2003-10-11T22:14:15.003Z h " + "a" * 47 + " p m - app under cap",
    "<165>1 2003-10-11T22:14:15.003Z h a " + "p" * 128 + " m - proc at cap",
    "<165>1 2003-10-11T22:14:15.003Z h a " + "p" * 127 + " m - proc under cap",
    "<165>1 2003-10-11T22:14:15.003Z h a p " + "m" * 32 + " - msgid at cap",
    "<165>1 2003-10-11T22:14:15.003Z h a p " + "m" * 31 + " - msgid under cap",
    "<165>1 2003-10-11T22:14:15.003Z h a p m [no-end-bracket msg",
    "<165>1 2003-10-11T22:14:15.003Z h a p m [sd]x msg",
    "<165>1 2003-10-11T22:14:15.003Z h a p m notsd msg",
    "<165>1 2003-10-11T22:14:15.003Z h a p m",      # msgid at EOB
    "<165>1 2003-10-11T22:14:15.Z h a p m - dot no frac",
    "<165>1 2003-10-11T22:14:15",                   # Go panic (EOB mid-ts)
    "<165>10 2003-10-11T22:14:15.003Z h a p m - two-digit version",
    "<165>x 2003-10-11T22:14:15.003Z h a p m - nonversion",
    "<165>1 2003-10-11t22:14:15.003Z h a p m - lowercase t",
    # multi-space / empty-token irregulars (oracle fallback territory)
    "<34>1  2003-10-11T22:14:15.003Z h a p m - double space",
    "<165>1 - h a p m -" + " " * 5,
    # non-ASCII
    "<34>Oct 11 22:14:15 mymachine tég: café content",
    "héllo wörld no gt in first ten",
]


def _corpus():
    rng = random.Random(42)
    texts = list(GOLDEN)
    pieces = [
        "<", ">", "-", "Z", "[", "]", ":", " ", "1", "a", "Oct", "Jan",
        "2003-10-11T22:14:15.003Z", "22:14:15", "<34>", "<165>1", "su",
        "[x] ", "][", ".", "+02:00",
    ]
    for _ in range(400):
        k = rng.randint(0, 12)
        texts.append("".join(rng.choice(pieces) for _ in range(k)))
    # random mutations of valid messages
    for base in GOLDEN[:13]:
        for _ in range(10):
            pos = rng.randrange(max(1, len(base)))
            ch = chr(rng.randrange(32, 127))
            texts.append(base[:pos] + ch + base[pos + 1 :])
    return texts


@pytest.mark.parametrize("cfg", [CFG, ParserConfig(default_year=2031)])
def test_vectorized_equals_oracle(cfg):
    texts = _corpus()
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    out = parse_batch(tbl, cfg)
    got = out.to_pylist()
    ts_us = out.column("ts_parsed").cast(pa.int64()).to_pylist()
    for i, t in enumerate(texts):
        expect = oracle.parse_row(t, cfg)
        row = got[i]
        assert row["rfc"] == expect["rfc"], (i, t)
        assert row["parse_error"] == expect["parse_error"], (i, t)
        for col in PARSE_COLUMN_NAMES:
            if col in ("rfc", "parse_error", "ts_parsed"):
                continue
            exp = expect.get(
                {"ts_parsed": "timestamp"}.get(col, col)
            )
            assert row[col] == exp, (i, t, col)
        # timestamps: exact integer-µs comparison (float .timestamp()
        # loses precision beyond ~year 2255)
        exp_ts = expect["timestamp"]
        got_us = ts_us[i]
        assert got_us == exp_ts, (i, t, got_us)


OVERRIDE_CFGS = [
    ParserConfig(default_year=2025, hostname="forced", tag="ftag"),
    ParserConfig(default_year=2025, priority=0),
    ParserConfig(default_year=2025, priority=13),
    ParserConfig(default_year=2025, hostname="h.example.com"),
    ParserConfig(default_year=2025, tag="justtag"),
    ParserConfig(default_year=2025, location="America/New_York"),
    ParserConfig(default_year=2025, location="Australia/Lord_Howe"),
    ParserConfig(
        default_year=2025, priority=7, hostname="x", tag="y",
        location="Europe/Berlin",
    ),
    # custom Go layouts (precomputed-unique-slice C path)
    ParserConfig(default_year=2025, timestamp_format="2006-01-02T15:04:05"),
    ParserConfig(default_year=2025, timestamp_format="Jan _2 15:04:05"),
    ParserConfig(
        default_year=2025, timestamp_format="2006-01-02 15:04:05-07:00"
    ),
    ParserConfig(
        default_year=2025, location="America/New_York",
        timestamp_format="2006-01-02 15:04:05",
    ),
    ParserConfig(
        default_year=2025, priority=9, timestamp_format="2006-01-02T15:04:05"
    ),
]

CUSTOM_TS_TEXTS = [
    "<30>2006-01-02T15:04:05 localhost foo: custom layout",
    "<30>2021-06-15T10:30:00 host-1 tag[7]: body",
    "<30>2021-06-15 10:30:00+05:30 host-1 tag: zoned",
    "<30>2021-06-15 10:30:00 host-1 tag: wall",
    "<30>Jun 23 13:17:42 localhost foo: default-shaped",
    "<30>not-a-timestamp-here localhost foo: bad",
    "<30>2021-13-40T99:99:99 h t: out of range",
    "<34>short",
    "2006-01-02T15:04:05 nopri host x",
]


@pytest.mark.parametrize("cfg", OVERRIDE_CFGS)
def test_override_configs_stay_oracle_exact(cfg):
    """WithPriority/WithHostname/WithTag/WithLocation run on the
    vectorized path (VERDICT r1 #5) and must equal the oracle on every
    column for the full corpus."""
    texts = _corpus()
    # priority-override success shapes: no <pri>, version digit first
    texts += [
        "1 2003-10-11T22:14:15.003Z host app proc msgid - pri override ok",
        "1 - host app proc msgid -",
        "Oct 11 22:14:15 host tag: no pri at all",
    ] + CUSTOM_TS_TEXTS
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    out = parse_batch(tbl, cfg)
    got = out.to_pylist()
    ts_us = out.column("ts_parsed").cast(pa.int64()).to_pylist()
    for i, t in enumerate(texts):
        expect = oracle.parse_row(t, cfg)
        row = got[i]
        for col in PARSE_COLUMN_NAMES:
            if col == "ts_parsed":
                assert ts_us[i] == expect["timestamp"], (i, t, cfg)
            else:
                assert row[col] == expect.get(col), (i, t, col, cfg)


def test_with_location_dst_boundaries():
    """WithLocation parity across spring-forward (gap) and fall-back
    (overlap) wall times — the fold-0 rule must match the oracle."""
    cfg = ParserConfig(default_year=2025, location="America/New_York")
    texts = [
        "<34>Mar  9 01:30:00 host tag: before gap",
        "<34>Mar  9 02:00:00 host tag: gap start",
        "<34>Mar  9 02:30:00 host tag: in gap",
        "<34>Mar  9 02:59:59 host tag: gap end",
        "<34>Mar  9 03:00:00 host tag: after gap",
        "<34>Nov  2 00:59:59 host tag: before overlap",
        "<34>Nov  2 01:00:00 host tag: overlap start",
        "<34>Nov  2 01:30:00 host tag: ambiguous",
        "<34>Nov  2 01:59:59 host tag: overlap end",
        "<34>Nov  2 02:00:00 host tag: after overlap",
        "<34>Jun 15 12:00:00 host tag: plain summer",
        "<34>Jan 15 12:00:00 host tag: plain winter",
    ]
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    ts_us = parse_batch(tbl, cfg).column("ts_parsed").cast(pa.int64()).to_pylist()
    for i, t in enumerate(texts):
        assert ts_us[i] == oracle.parse_row(t, cfg)["timestamp"], t


def test_override_configs_take_c_fast_path(monkeypatch):
    """Override configs must run through the C kernel, not the per-row
    oracle fallback (only non-ASCII rows may fall back)."""
    from rayslog.kernels import cparse
    import rayslog.kernels.vectorized as vz

    if cparse.get_lib() is None or os.environ.get("RAYSLOG_NO_CKERNEL"):
        pytest.skip("no C toolchain / C kernel disabled")
    calls = []
    real = cparse.parse_raw

    def spy(*a, **kw):
        out = real(*a, **kw)
        calls.append(int(out["fallback"].sum()))
        return out

    monkeypatch.setattr(cparse, "parse_raw", spy)
    cfg = ParserConfig(default_year=2025, hostname="forced", tag="ftag",
                       priority=3, location="Europe/Berlin")
    texts = [t for t in GOLDEN if t.isascii()]
    parse_batch(pa.table({"text": pa.array(texts, pa.string())}), cfg)
    assert calls and calls[0] == 0  # C ran; zero rows fell back


def test_custom_layout_takes_c_fast_path(monkeypatch):
    """Custom Go layouts run through the C kernel via precomputed
    unique-slice timestamps — only non-canonical-priority rows fall
    back to the per-row oracle."""
    from rayslog.kernels import cparse

    if cparse.get_lib() is None or os.environ.get("RAYSLOG_NO_CKERNEL"):
        pytest.skip("no C toolchain / C kernel disabled")
    calls = []
    real = cparse.parse_raw

    def spy(*a, **kw):
        out = real(*a, **kw)
        calls.append(int(out["fallback"].sum()))
        return out

    monkeypatch.setattr(cparse, "parse_raw", spy)
    cfg = ParserConfig(
        default_year=2025, timestamp_format="2006-01-02T15:04:05"
    )
    texts = [
        "<30>2006-01-02T15:04:05 localhost foo: custom layout",
        "<30>2021-06-15T10:30:00 host-1 tag[7]: body",
        "<30>Jun 23 13:17:42 localhost foo: wrong layout -> error row",
    ]
    out = parse_batch(
        pa.table({"text": pa.array(texts, pa.string())}), cfg
    ).to_pylist()
    assert calls and calls[0] == 0  # all three rows stayed in C
    for i, t in enumerate(texts):
        expect = oracle.parse_row(t, cfg)
        assert out[i]["parse_error"] == expect["parse_error"]
        assert out[i]["hostname"] == expect["hostname"]
        assert out[i]["tag"] == expect["tag"]


def test_mutation_sweep_equivalence():
    """Seeded mutate/truncate/duplicate sweep over realistic messages:
    the vectorized kernel must agree with the oracle on every row
    (exact integer-µs timestamps)."""
    rng = random.Random(777)
    bases = [
        "<34>Oct 11 22:14:15 mymachine very.large.tag: body text here",
        "<30>Jun 23 13:17:42 chronyd[1119]: Selected source 192.168.65.1",
        '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [x@1 k="v"] event',
        "<165>1 2003-08-24T05:14:15.000003-07:00 192.0.2.1 myproc 8710 - - do-nuts",
        "<165>1 - h a p m - nil ts",
        "plain text message here",
    ]
    texts = []
    for i in range(30_000):
        b = bases[i % len(bases)]
        op = rng.random()
        pos = rng.randrange(len(b))
        if op < 0.5:
            texts.append(b[:pos] + chr(rng.randrange(32, 127)) + b[pos + 1 :])
        elif op < 0.7:
            texts.append(b[:pos])
        elif op < 0.9:
            texts.append(b[:pos] + b[pos : pos + 3] + b[pos:])
        else:
            texts.append(b)
    out = parse_batch(pa.table({"text": pa.array(texts)}), CFG)
    got = out.to_pylist()
    ts_us = out.column("ts_parsed").cast(pa.int64()).to_pylist()
    for i, t in enumerate(texts):
        exp = oracle.parse_row(t, CFG)
        row = got[i]
        for col in PARSE_COLUMN_NAMES:
            if col == "ts_parsed":
                assert ts_us[i] == exp["timestamp"], (t, col)
            else:
                assert row[col] == exp.get(col), (t, col)
