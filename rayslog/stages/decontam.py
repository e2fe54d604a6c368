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


def dup_span_stats(
    ds,
    n: int = 4,
    col: str = "text",
    id_col: str = "doc_id",
    parts: int = 64,
    batch_size: int = 8_192,
):
    """Intra-corpus duplicated-span analysis (the exact-substring-dedup
    statistic of Lee et al. 2022, at gram granularity): for every doc
    with >= n tokens, the fraction of its DISTINCT n-token grams that
    also appear in at least one other document.

    Returns (doc_id, n_grams, n_dup_grams, dup_frac).

    100-TB shape
    ------------
    Unlike :func:`decontaminate` the "other side" is the corpus itself,
    so no broadcast is possible — exact intra-corpus document frequency
    requires co-locating equal grams once.  The plan keeps that single
    all-to-all minimal:

    1. per-batch explode to distinct (doc_id, g1, g2) gram rows — 24 B
       per gram, never text; distinctness per doc resolved in-batch
       (docs never span batches);
    2. gram-hash-bucketed groupby into ``parts`` BOUNDED groups (not
       one group per gram — millions of tiny map_groups is the
       measured Ray pathology, see dedup.py); inside a part one
       lexsort run-detects equal grams, flags df >= 2, and collapses to
       per-doc partials (doc_id, n_grams, n_dup) before anything
       leaves the task;
    3. per-doc partials sum via hash-shuffle groupby (one row per
       (doc, part) at most — tiny).

    ``parts`` must scale with the corpus (a part holds
    total_grams/parts rows); callers size it like tf_idf's join
    buckets.  Gram identity is the 128-bit dual-seed Horner hash — the
    SQL oracle joins gram STRINGS, so collisions would surface as
    mismatches.
    """

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keys, gram_row = _gram_keys(t.column(col), n)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "g1": pa.array([], pa.uint64()),
                "g2": pa.array([], pa.uint64()),
                "gpart": pa.array([], pa.int32()),
            }
        )
        if not len(keys):
            return empty
        # distinct (doc, gram): docs never span batches
        rec = np.empty(len(keys), dtype=[("d", ">i8"), ("k", "S16")])
        rec["d"] = gram_row
        rec["k"] = keys
        uniq = np.unique(rec.view("S24")).view(rec.dtype)
        pair = np.ascontiguousarray(uniq["k"]).view(">u8").reshape(-1, 2)
        g1 = pair[:, 0].astype(np.uint64)
        g2 = pair[:, 1].astype(np.uint64)
        mix = ((g1 ^ g2) * _GRAM_K) >> _U64(33)
        return pa.table(
            {
                "doc_id": pa.array(
                    ids[uniq["d"].astype(np.int64)].astype(np.int64)
                ),
                "g1": pa.array(g1),
                "g2": pa.array(g2),
                "gpart": pa.array((mix % _U64(parts)).astype(np.int32)),
            }
        )

    rows = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size,
    )

    def resolve_part(t: pa.Table) -> pa.Table:
        g1 = t.column("g1").to_numpy(zero_copy_only=False).astype(np.uint64)
        g2 = t.column("g2").to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((g2, g1))
        s1, s2 = g1[order], g2[order]
        first = np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
        starts = np.nonzero(first)[0]
        sizes = np.diff(np.r_[starts, len(s1)])
        dup_sorted = np.repeat(sizes >= 2, sizes)
        dup = np.empty(len(s1), dtype=bool)
        dup[order] = dup_sorted
        out = (
            pa.table(
                {
                    "doc_id": pa.array(doc),
                    "dup": pa.array(dup.astype(np.int64)),
                }
            )
            .group_by(["doc_id"])
            .aggregate([("dup", "sum"), ([], "count_all")])
        )
        return out.rename_columns(["doc_id", "n_dup_grams", "n_grams"])

    from rayslog.stages.aggregate import task_exchange

    # phase 1 emits per-part REFS; the doc-total exchange chains on
    # them as raw tasks with the dpart hash fused into its split pass
    # (one Dataset executor total instead of two; r4 ref-land)
    per_part_refs = task_exchange(
        rows, "gpart", parts, resolve_part, return_refs=True
    )

    # cross-part per-doc totals: bounded-parts exchange (hash(doc) %
    # parts) with a vectorized in-part Arrow sum — scale-safe (doc
    # cardinality is corpus-sized, so the combiner tree's
    # fits-one-task assumption would NOT hold here)
    def add_dpart(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        mix = (d.astype(np.uint64) * _GRAM_K) >> _U64(33)
        return t.append_column(
            "dpart", pa.array((mix % _U64(parts)).astype(np.int32))
        )

    def sum_docs(t: pa.Table) -> pa.Table:
        out = (
            t.select(["doc_id", "n_grams", "n_dup_grams"])
            .group_by(["doc_id"])
            .aggregate([("n_grams", "sum"), ("n_dup_grams", "sum")])
        )
        return out.rename_columns(["doc_id", "n_grams", "n_dup_grams"])

    totals = task_exchange(
        per_part_refs, "dpart", parts, sum_docs, pre_fn=add_dpart
    )

    def finish(t: pa.Table) -> pa.Table:
        ng = t.column("n_grams").to_numpy(zero_copy_only=False)
        nd = t.column("n_dup_grams").to_numpy(zero_copy_only=False)
        return t.append_column(
            "dup_frac", pa.array(nd.astype(np.float64) / ng)
        )

    return totals.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def contamination_report(
    ds,
    eval_mod: int = 50,
    n: int = 4,
    col: str = "text",
    id_col: str = "doc_id",
    parts: int = 64,
    batch_size: int = 8_192,
):
    """EVAL-side contamination report — the inverse view of
    :func:`decontaminate`: for every eval doc (``doc_id % eval_mod ==
    0``, >= n tokens), the fraction of its DISTINCT n-grams that leak
    into ANY train doc.  What a benchmark owner reads to judge how
    compromised each eval item is (decontaminate answers the
    train-side question: which train docs to drop).

    Same 100-TB shape as :func:`dup_span_stats` — the train side is
    corpus-sized, so no broadcast is possible; equal grams co-locate
    once through a gram-hash bounded-parts exchange, leak flags
    resolve vectorized inside each part, and per-eval-doc partials sum
    through a second (ref-land-chained) doc-hash exchange.  Returns
    (doc_id, n_grams, n_leaked_grams, leak_frac).
    """

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keys, gram_row = _gram_keys(t.column(col), n)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "is_eval": pa.array([], pa.bool_()),
                "g1": pa.array([], pa.uint64()),
                "g2": pa.array([], pa.uint64()),
                "gpart": pa.array([], pa.int32()),
            }
        )
        if not len(keys):
            return empty
        rec = np.empty(len(keys), dtype=[("d", ">i8"), ("k", "S16")])
        rec["d"] = gram_row
        rec["k"] = keys
        uniq = np.unique(rec.view("S24")).view(rec.dtype)
        pair = np.ascontiguousarray(uniq["k"]).view(">u8").reshape(-1, 2)
        g1 = pair[:, 0].astype(np.uint64)
        g2 = pair[:, 1].astype(np.uint64)
        mix = ((g1 ^ g2) * _GRAM_K) >> _U64(33)
        d = ids[uniq["d"].astype(np.int64)].astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "is_eval": pa.array(d % eval_mod == 0),
                "g1": pa.array(g1),
                "g2": pa.array(g2),
                "gpart": pa.array((mix % _U64(parts)).astype(np.int32)),
            }
        )

    rows = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size,
    )

    _empty_part = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_leaked_grams": pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
        }
    )

    def resolve_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_part
        g1 = t.column("g1").to_numpy(zero_copy_only=False).astype(np.uint64)
        g2 = t.column("g2").to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        ev = t.column("is_eval").to_numpy(zero_copy_only=False)
        order = np.lexsort((g2, g1))
        s1, s2, sev = g1[order], g2[order], ev[order]
        first = np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
        run_id = np.cumsum(first) - 1
        # a gram leaks iff its run holds >= 1 TRAIN (non-eval) row
        has_train = np.zeros(run_id[-1] + 1, dtype=bool)
        np.logical_or.at(has_train, run_id, ~sev)
        leaked_sorted = has_train[run_id]
        leaked = np.empty(len(s1), dtype=bool)
        leaked[order] = leaked_sorted
        keep = ev  # report eval docs only
        if not keep.any():
            return _empty_part
        out = (
            pa.table(
                {
                    "doc_id": pa.array(doc[keep]),
                    "leak": pa.array(leaked[keep].astype(np.int64)),
                }
            )
            .group_by(["doc_id"])
            .aggregate([("leak", "sum"), ([], "count_all")])
        )
        return out.rename_columns(["doc_id", "n_leaked_grams", "n_grams"])

    from rayslog.stages.aggregate import task_exchange

    per_part_refs = task_exchange(
        rows, "gpart", parts, resolve_part, return_refs=True
    )

    def add_dpart(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        mix = (d.astype(np.uint64) * _GRAM_K) >> _U64(33)
        return t.append_column(
            "dpart", pa.array((mix % _U64(parts)).astype(np.int32))
        )

    def sum_docs(t: pa.Table) -> pa.Table:
        out = (
            t.select(["doc_id", "n_grams", "n_leaked_grams"])
            .group_by(["doc_id"])
            .aggregate([("n_grams", "sum"), ("n_leaked_grams", "sum")])
        )
        return out.rename_columns(["doc_id", "n_grams", "n_leaked_grams"])

    totals = task_exchange(
        per_part_refs, "dpart", parts, sum_docs, pre_fn=add_dpart
    )

    def finish(t: pa.Table) -> pa.Table:
        ng = t.column("n_grams").to_numpy(zero_copy_only=False)
        nl = t.column("n_leaked_grams").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": t.column("n_grams"),
                "n_leaked_grams": t.column("n_leaked_grams"),
                "leak_frac": pa.array(nl.astype(np.float64) / ng),
            }
        )

    return totals.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )
