"""Vectorized text-hash kernels vs naive per-row reference computations."""

import numpy as np
import pyarrow as pa

from rayslog.kernels import texthash as tx

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",  # dup
    "",
    None,
    "   leading and   multiple   spaces\ttabs\nnewlines  ",
    "one",
    "two tokens",
    "a b c d e f g",
    "Ünïcode tökens über alles",
    "repeat repeat repeat repeat",
]


def _naive_tokens(s, lower=True, alpha_only=False):
    import re

    if s is None:
        return []
    t = s.lower() if lower else s
    if alpha_only:
        t = re.sub(r"[^a-zA-Z]+", " ", t)
    return t.split()


def test_hash_utf8_equality_and_distinctness():
    arr = pa.array(TEXTS, pa.string())
    h = tx.hash_utf8(arr)
    assert h[0] == h[1]  # identical strings hash equal
    distinct = {TEXTS[i]: h[i] for i in (0, 2, 4, 5, 6, 7, 8, 9)}
    assert len(set(distinct.values())) == len(distinct)
    # seed changes every value
    h2 = tx.hash_utf8(arr, seed=1)
    assert (h != h2).all()
    # stable across calls and across sliced offsets
    assert (tx.hash_utf8(arr) == h).all()
    assert (tx.hash_utf8(arr.slice(3)) == h[3:]).all()


def test_prefix_length_disambiguation():
    arr = pa.array(["ab", "ab\x00", "a", "b", "ba"], pa.string())
    h = tx.hash_utf8(arr)
    assert len(set(h.tolist())) == 5


def test_tokens_match_python_split():
    arr = pa.array(TEXTS, pa.string())
    flat, offs = tx.tokens(arr)
    got = [
        flat.slice(offs[i], offs[i + 1] - offs[i]).to_pylist()
        for i in range(len(TEXTS))
    ]
    expect = [_naive_tokens(s) for s in TEXTS]
    assert got == expect


def test_alpha_only_tokens():
    arr = pa.array(["ab12cd ef!gh", "123", None], pa.string())
    flat, offs = tx.tokens(arr, alpha_only=True)
    got = [
        flat.slice(offs[i], offs[i + 1] - offs[i]).to_pylist() for i in range(3)
    ]
    assert got == [["ab", "cd", "ef", "gh"], [], []]


def test_shingle_counts_and_short_rows():
    arr = pa.array(TEXTS, pa.string())
    th, offs = tx.token_hashes(arr)
    sh, sh_offs = tx.shingle_hashes_flat(th, offs, k=3)
    counts = np.diff(offs)
    nsh = np.diff(sh_offs)
    for c, s in zip(counts, nsh):
        assert s == (c - 2 if c >= 3 else (1 if c > 0 else 0))
    # duplicate rows produce identical shingle sets
    assert sh[sh_offs[0] : sh_offs[1]].tolist() == sh[sh_offs[1] : sh_offs[2]].tolist()
    # order sensitivity: k=1 shingles of "a b" vs "b a" equal as SETS but
    # k=2 shingle differs
    two = pa.array(["a b", "b a"], pa.string())
    th2, o2 = tx.token_hashes(two)
    s2, so2 = tx.shingle_hashes_flat(th2, o2, k=2)
    assert s2[0] != s2[1]


def test_minhash_matches_naive():
    arr = pa.array(TEXTS, pa.string())
    th, offs = tx.token_hashes(arr)
    sh, sh_offs = tx.shingle_hashes_flat(th, offs, k=3)
    rng = np.random.default_rng(42)
    M = (1 << 61) - 1
    a = rng.integers(1, M, 16, dtype=np.uint64) | 1
    b = rng.integers(0, M, 16, dtype=np.uint64)
    sig = tx.minhash_signatures(sh, sh_offs, a, b, hash_chunk=7)
    for i in range(len(TEXTS)):
        row = sh[sh_offs[i] : sh_offs[i + 1]]
        if len(row) == 0:
            assert (sig[i] == 0).all()
            continue
        v = (row[None, :] * a[:, None] + b[:, None]) % np.uint64(M)
        assert (sig[i] == v.min(axis=1)).all()


def test_simhash_matches_naive():
    arr = pa.array(TEXTS, pa.string())
    th, offs = tx.token_hashes(arr)
    sig = tx.simhash_signatures(th, offs)
    for i in range(len(TEXTS)):
        row = th[offs[i] : offs[i + 1]]
        if len(row) == 0:
            assert sig[i] == 0
            continue
        bits = (row[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        expect = np.uint64(0)
        for j in np.nonzero(votes > 0)[0]:
            expect |= np.uint64(1) << np.uint64(j)
        assert sig[i] == expect
    # identical texts -> identical sigs; near-identical -> small hamming
    assert sig[0] == sig[1]


def test_rolling_fingerprint_matches_horner():
    arr = pa.array(TEXTS, pa.string())
    th, offs = tx.token_hashes(arr)
    fp = tx.rolling_fingerprints(th, offs)
    B = np.uint64(1_000_003)
    with np.errstate(over="ignore"):
        for i in range(len(TEXTS)):
            row = th[offs[i] : offs[i + 1]]
            h = np.uint64(0)
            for t in row:
                h = h * B + t  # wraps mod 2^64
            assert fp[i] == h
    # order sensitivity
    two = pa.array(["alpha beta", "beta alpha"], pa.string())
    th2, o2 = tx.token_hashes(two)
    fp2 = tx.rolling_fingerprints(th2, o2)
    assert fp2[0] != fp2[1]


def test_c_and_numpy_hash_paths_agree(monkeypatch):
    """The C word-hash and the numpy fallback must be bit-identical
    (all tail lengths 0..9 exercised)."""
    texts = [None, ""] + ["x" * k for k in range(1, 10)] + [
        "the quick brown fox", "Ünïcode bytes too", "a" * 1000,
    ]
    arr = pa.array(texts, pa.string())
    c1 = tx.hash_utf8(arr, seed=0)
    c2 = tx.hash_utf8(arr, seed=5)
    p1, p2b = tx.hash_utf8_pair(arr, seed1=0, seed2=5)
    monkeypatch.setenv("RAYSLOG_NO_CKERNEL", "1")
    n1 = tx.hash_utf8(arr, seed=0)
    n2 = tx.hash_utf8(arr, seed=5)
    assert (c1 == n1).all() and (c2 == n2).all()
    assert (p1 == c1).all() and (p2b == c2).all()


def test_seeds_decorrelate():
    """A same-length near-collision pair must not collide in BOTH seeds
    (the round-2 fix: seed enters the chain at step 0, so h2 is not a
    deterministic function of h1)."""
    import itertools

    texts = ["".join(p) for p in itertools.product("ab", repeat=12)]
    arr = pa.array(texts, pa.string())
    h1 = tx.hash_utf8(arr, seed=0)
    h2 = tx.hash_utf8(arr, seed=1)
    # no duplicate (h1,h2) pairs among distinct inputs
    assert len({(a, b) for a, b in zip(h1.tolist(), h2.tolist())}) == len(texts)
    # and h2 is not a pure function of h1's core: deltas differ
    d = (h1 - h2).tolist()
    assert len(set(d)) > len(texts) // 2


def test_segment_sum_empty_segments():
    vals = np.array([1, 2, 3], dtype=np.uint64)
    offs = np.array([0, 0, 2, 2, 3, 3], dtype=np.int64)
    out = tx.segment_sum_u64(vals, offs)
    assert out.tolist() == [0, 3, 0, 3, 0]


# ---------------- repetition kernel vs DuckDB oracle (property fuzz)
from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcXYZ09.,!", min_size=1, max_size=5)
_line = st.lists(_word, min_size=0, max_size=6).map(" ".join)
_doc = st.lists(_line, min_size=0, max_size=6).map("\n".join)


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12))
def test_repetition_features_fuzz_vs_duckdb(texts):
    """repetition_features == the SQL oracle on arbitrary ASCII docs
    with newline runs, dup lines/paragraphs, empty lines, punctuation
    tokens — the property form of the curated multi-line test."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from rayslog.sqloracle import training_oracle_queries
    from rayslog.stages.text import repetition_features

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        repetition_features(tbl)
        .drop_columns(["text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents_arrow", tbl)
    con.sql("CREATE VIEW documents AS SELECT * FROM documents_arrow")
    want = (
        con.sql(training_oracle_queries()["repetition"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, check_exact=True,
    )
