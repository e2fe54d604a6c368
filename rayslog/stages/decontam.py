"""Benchmark decontamination: flag training documents that share any
n-token-gram with an evaluation set (the GPT-3/Gopher/PaLM overlap
filter, scaled to this corpus's ~50-token documents).

100-TB shape
------------
The eval side is a *benchmark suite* — bounded at megabytes by
construction, never corpus-sized — so its distinct gram keys (16 B
each, two independently-seeded 64-bit Horner hashes over token hashes)
are collected to the driver once and broadcast via ``ray.put``.  The
training pass is then a pure shuffle-free ``map_batches``: each batch
tokenizes, hashes its grams, binary-searches the broadcast sorted key
array (``np.searchsorted`` — no eval-sized temporaries per batch,
zero-copy plasma read), and emits one (doc_id, n_shared) row per
contaminated doc.  Nothing but the final tiny result moves between
nodes.  Gram identity is the 128-bit dual-seed hash (collision
probability ~M^2/2^128 — the same contract exact dedup relies on);
the SQL oracle joins on the gram *strings* and must agree row-for-row.

Batch size caps the per-batch flat-token temporaries (CLAUDE.md
invariant #7); the window combine is n tiny vectorized passes, never a
per-row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayslog.kernels import texthash as tx

_U64 = np.uint64
#: Horner combine multiplier for the gram window (odd => bijective mod
#: 2^64 per step; applied independently to both token-hash seeds).
_GRAM_K = _U64(0x9E3779B97F4A7C15)


def _gram_keys(txt, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(S16 gram keys, int64 row index per gram) for every strict
    n-token window.  Rows with fewer than n tokens yield NO grams
    (matches the SQL oracle's ``len(t) >= n`` arm — unlike
    texthash.shingle_hashes_flat's join-all fallback for short rows).
    Case-sensitive tokens, mirroring ``regexp_extract_all(text,'\\S+')``.
    """
    flat, offs = tx.tokens(txt, lower=False)
    th1 = tx.hash_utf8(flat, seed=0)
    th2 = tx.hash_utf8(flat, seed=1)
    counts = np.diff(offs)
    ng = np.maximum(counts - (n - 1), 0)
    total = int(ng.sum())
    if total == 0:
        return np.empty(0, dtype="S16"), np.empty(0, dtype=np.int64)
    rows = np.nonzero(ng)[0]
    reps = ng[rows]
    goffs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(reps, out=goffs[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(goffs[:-1], reps)
    tok_start = np.repeat(offs[:-1][rows], reps) + within
    g1 = np.zeros(total, dtype=_U64)
    g2 = np.zeros(total, dtype=_U64)
    for j in range(n):
        idx = tok_start + j
        g1 = g1 * _GRAM_K + th1[idx]
        g2 = g2 * _GRAM_K + th2[idx]
    packed = np.empty((total, 2), dtype=">u8")
    packed[:, 0] = g1
    packed[:, 1] = g2
    keys = packed.reshape(-1).view("S16")
    gram_row = np.repeat(rows, reps)
    return keys, gram_row


def eval_gram_keys(
    ds,
    n: int = 4,
    col: str = "text",
    id_col: str = "doc_id",
    eval_mod: int = 50,
) -> np.ndarray:
    """Sorted unique S16 gram keys of the eval subset
    (``doc_id % eval_mod == 0``).  Collected to the driver — valid
    because eval suites are small by construction; only 16-byte keys
    (batch-deduped) travel, never eval text."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sel = (ids % eval_mod) == 0
        if not sel.any():
            return pa.table(
                {"g1": pa.array([], pa.uint64()), "g2": pa.array([], pa.uint64())}
            )
        keys, _ = _gram_keys(t.column(col).filter(pa.array(sel)), n)
        uk = np.unique(keys)
        pair = uk.view(">u8").reshape(-1, 2)
        return pa.table(
            {
                "g1": pa.array(pair[:, 0].astype(np.uint64)),
                "g2": pa.array(pair[:, 1].astype(np.uint64)),
            }
        )

    df = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=8_192
    ).to_pandas()
    if not len(df):
        return np.empty(0, dtype="S16")
    packed = np.empty((len(df), 2), dtype=">u8")
    packed[:, 0] = df["g1"].to_numpy(dtype=np.uint64)
    packed[:, 1] = df["g2"].to_numpy(dtype=np.uint64)
    return np.unique(packed.reshape(-1).view("S16"))


def decontaminate(
    ds,
    eval_keys_ref,
    n: int = 4,
    col: str = "text",
    id_col: str = "doc_id",
    eval_mod: int = 50,
):
    """(doc_id, n_shared) for every NON-eval doc sharing >= 1 distinct
    n-gram with the broadcast eval gram set; n_shared counts the doc's
    distinct shared grams.  ``eval_keys_ref`` is a ``ray.put`` handle
    to the sorted S16 key array from :func:`eval_gram_keys`."""
    import ray

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "n_shared": pa.array([], pa.int64())}
    )

    def fn(t: pa.Table) -> pa.Table:
        eval_keys = ray.get(eval_keys_ref)  # plasma-cached, zero-copy
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sel = (ids % eval_mod) != 0
        if len(eval_keys) == 0 or not sel.any():
            return empty
        sub_ids = ids[sel]
        keys, gram_row = _gram_keys(t.column(col).filter(pa.array(sel)), n)
        if not len(keys):
            return empty
        pos = np.minimum(
            np.searchsorted(eval_keys, keys), len(eval_keys) - 1
        )
        hit = eval_keys[pos] == keys
        if not hit.any():
            return empty
        # distinct (doc, gram) among hits: docs never span batches, so
        # per-batch uniqueness is global uniqueness
        rec = np.empty(int(hit.sum()), dtype=[("d", ">i8"), ("k", "S16")])
        rec["d"] = gram_row[hit]
        rec["k"] = keys[hit]
        uniq = np.unique(rec.view("S24")).view(rec.dtype)
        drow, cnt = np.unique(uniq["d"].astype(np.int64), return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(sub_ids[drow].astype(np.int64)),
                "n_shared": pa.array(cnt.astype(np.int64)),
            }
        )

    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=8_192
    )
