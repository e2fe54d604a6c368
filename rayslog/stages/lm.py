"""Character-bigram language-model quality scoring (CCNet-style).

The classic curation signal beside heuristic quality features: score
every document by its cross-entropy (bits per character transition)
under a smoothed char-bigram LM trained on the corpus itself — low
bits = typical text, high bits = noise/garbage (the perplexity-
bucketing filter of CCNet/RedPajama, with the n-gram LM standing in
for the external KenLM this container cannot have).

Two linear passes, no shuffle:

1. **Count pass** — per batch: ONE utf-8 -> utf-32 decode of the whole
   batch's string buffer (flat codepoints + per-row counts, no per-doc
   Python loop) emits packed
   bigram keys ``(hi << 21) | lo`` plus NEGATIVE keys ``-(cp+1)`` for
   every character position (the vocab/unigram stream shares the
   bigram aggregation); ``np.unique`` collapses the batch to
   vocab-bounded partial rows, and ``aggregate.tree_aggregate`` fans
   them in without sort-shuffle machinery.  Model size is O(distinct
   bigrams) — bounded by alphabet², independent of corpus size.
2. **Score pass** — model ships once via ``ray.put`` (sorted key
   arrays); each batch looks bigrams up with ``np.searchsorted`` and
   reduces per-doc means with ``np.add.reduceat``.

Determinism contract with the DuckDB oracle (sqloracle.py
``lm_score``): Laplace-smoothed ``p(y|x) = (c(xy)+1)/(c(x·)+V)`` with
``V`` = distinct corpus codepoints, per-doc score =
``round(-mean(log2 p), 6)`` (float64; the ratio is formed BEFORE the
log on both sides), docs with <2 characters score 0.0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayslog.stages.aggregate import tree_aggregate

_CP_BITS = 21  # max codepoint 0x10FFFF < 2^21


def _codepoints(text: str) -> np.ndarray:
    return np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)


def _doc_keys(text: str) -> np.ndarray:
    """Packed bigram keys + negative unigram keys for one doc (the
    scalar reference for :func:`_batch_keys`; kept for tests)."""
    cp = _codepoints(text)
    uni = -(cp + 1)
    if len(cp) < 2:
        return uni
    bi = (cp[:-1] << _CP_BITS) | cp[1:]
    return np.concatenate([bi, uni])


def _flat_codepoints_col(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 codepoints of every row concatenated in row order,
    per-row char counts): ONE utf-8 -> utf-32 decode for the whole
    batch via the texthash raw-buffer view — replaces the per-doc
    ``encode('utf-32-le')`` Python loop (round-4 verdict #4).  String
    array offsets are contiguous (starts[i+1] == ends[i]), so the one
    data-buffer slice IS the row concatenation."""
    import pyarrow.compute as pc

    from rayslog.kernels.texthash import _string_view

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    lens = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    data, starts, ends = _string_view(col)
    if len(starts) == 0 or ends[-1] == starts[0]:
        return np.empty(0, np.int64), lens
    blob = data[starts[0] : ends[-1]].tobytes().decode("utf-8")
    flat = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    return flat, lens


def _batch_bigrams(flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Packed within-doc bigram keys over the flat layout: every
    adjacent codepoint pair EXCEPT the pairs spanning a doc boundary
    (each non-empty doc's last position is masked out)."""
    if len(flat) < 2:
        return np.empty(0, np.int64)
    valid = np.ones(len(flat), dtype=bool)
    ends = np.cumsum(lens)
    valid[ends[lens > 0] - 1] = False
    return ((flat[:-1] << _CP_BITS) | flat[1:])[valid[:-1]]


def train_bigram_lm(ds, text_col: str = "text"):
    """Returns (bigram_keys sorted, bigram_counts, prefix_keys sorted,
    prefix_counts, V) — the broadcastable model arrays."""

    def partial(t: pa.Table) -> pa.Table:
        flat, lens = _flat_codepoints_col(t.column(text_col))
        allk = np.concatenate([_batch_bigrams(flat, lens), -(flat + 1)])
        u, c = np.unique(allk, return_counts=True)
        return pa.table(
            {"key": pa.array(u), "n": pa.array(c.astype(np.int64))}
        )

    part = ds.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4_096,
    )
    counts = tree_aggregate(part, ["key"], [("n", "sum")], ["n"]).to_pandas()
    keys = counts["key"].to_numpy(dtype=np.int64)
    ns = counts["n"].to_numpy(dtype=np.int64)
    order = np.argsort(keys)
    keys, ns = keys[order], ns[order]

    is_bi = keys >= 0
    bi_keys, bi_ns = keys[is_bi], ns[is_bi]
    vocab = int((~is_bi).sum())  # distinct codepoints anywhere

    # c(x·) = total bigram occurrences starting with x
    pre = bi_keys >> _CP_BITS
    pre_keys, idx = np.unique(pre, return_index=True)
    pre_ns = np.add.reduceat(bi_ns, idx) if len(bi_ns) else bi_ns
    return bi_keys, bi_ns, pre_keys, pre_ns, vocab


def _lookup(sorted_keys: np.ndarray, counts: np.ndarray,
            query: np.ndarray) -> np.ndarray:
    """count for each query key, 0 when absent (vectorized)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(query), dtype=np.int64)
    pos = np.searchsorted(sorted_keys, query)
    pos = np.minimum(pos, len(sorted_keys) - 1)
    hit = sorted_keys[pos] == query
    out = np.where(hit, counts[pos], 0)
    return out


def score_bigram_lm(ds, model, id_col: str = "doc_id",
                    text_col: str = "text"):
    """(id, lm_bits): round-6 bits per character transition under the
    trained model; <2-char docs score 0.0."""
    import ray

    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        bi_keys, bi_ns, pre_keys, pre_ns, vocab = ray.get(ref)
        flat, clens = _flat_codepoints_col(t.column(text_col))
        lens = np.maximum(clens - 1, 0)  # transitions per doc
        nz = lens > 0
        out = np.zeros(len(lens), dtype=np.float64)
        if nz.any():
            # _batch_bigrams emits keys in doc order, so reduceat
            # bounds over the non-empty docs' transition counts line up
            bi = _batch_bigrams(flat, clens)
            cxy = _lookup(bi_keys, bi_ns, bi).astype(np.float64)
            cx = _lookup(pre_keys, pre_ns, bi >> _CP_BITS).astype(
                np.float64
            )
            bits = -np.log2((cxy + 1.0) / (cx + float(vocab)))
            bounds = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
            sums = np.add.reduceat(bits, bounds)
            out[nz] = sums / lens[nz]
        return pa.table(
            {
                id_col: t.column(id_col),
                "lm_bits": pa.array(np.round(out, 6)),
            }
        )

    return ds.map_batches(
        score,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4_096,
    )
