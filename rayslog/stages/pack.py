"""Sequence packing for training-data assembly.

Assign each document (in deterministic doc_id order) to a training bin
of ``budget`` tokens using the prefix-sum rule: a doc belongs to the
bin its starting token offset falls in (``bin = exclusive_prefix_sum
// budget`` — "greedy with overflow": a bin may run past the budget by
at most one doc's tail, the standard concat-then-chunk packing used
for LLM pretraining shards).

This is the engine's distributed window-function pattern (a global
ordered cumulative sum), built the scale-correct way:

1. docs are range-partitioned by ``doc_id // chunk`` (dense ids make
   the parts balanced) and the small (3 int cols) feature table is
   materialized ONCE — every later pass reuses its blocks;
2. per-part token totals reduce through the ref-level raw-task
   combiner tree (``aggregate.tree_reduce_refs`` — no sort-shuffle,
   no second scan of the corpus);
3. the driver turns the SMALL per-part totals into exclusive offsets
   (one row per part, never per doc);
4. one ``task_exchange`` pass computes each part's local cumulative
   sums and adds the part offset — bins are globally exact.

Everything is integer arithmetic, so the DuckDB oracle
(``SUM() OVER (ORDER BY doc_id ROWS ... 1 PRECEDING) // budget``)
matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayslog.stages.aggregate import live_block_refs, tree_reduce_refs


def pack_sequences(ds, budget: int = 256, chunk: int = 4_096,
                   id_col: str = "doc_id", col: str = "text",
                   return_refs: bool = False):
    """(doc_id, n_tokens, bin_id) for every document.

    ``budget``: tokens per bin; ``chunk``: docs per range partition
    (tune up at scale — parts x 16 B is the driver-side state).
    """


    def featurize(t: pa.Table) -> pa.Table:
        txt = t.column(col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n_tok = pc.cast(
            pc.fill_null(pc.count_substring_regex(txt, r"\S+"), 0),
            pa.int64(),
        )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        part = (ids // chunk).astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": n_tok,
                "part": pa.array(part),
            }
        )

    # Materialize the SMALL (3 int cols, ~24 B/doc) intermediate ONCE:
    # the totals tree and the exchange pass both consume the same
    # blocks, so the read+featurize lineage runs a single time (it ran
    # twice before round 4) and the totals need no second Dataset
    # executor spin-up.  The payload text column never enters this
    # dataset.
    feats = ds.map_batches(
        featurize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return _bins_from_feats(feats, budget, id_col,
                            return_refs=return_refs)


def assign_bins(feats_ds, budget: int = 256, chunk: int = 4_096,
                id_col: str = "doc_id"):
    """Prefix-sum bin assignment for callers that ALREADY hold token
    counts — a (doc_id, n_tokens) dataset, e.g. the resumable pack
    job's stage B re-reading its committed per-partition feature
    parquet.  Same bins as :func:`pack_sequences`, no text read."""

    def add_part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pc.cast(t.column("n_tokens"), pa.int64()),
                "part": pa.array((ids // chunk).astype(np.int64)),
            }
        )

    feats = feats_ds.map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return _bins_from_feats(feats, budget, id_col)


def _bins_from_feats(feats, budget: int, id_col: str,
                     return_refs: bool = False):
    """Shared prefix-sum core over a materialized (id, n_tokens, part)
    dataset: ref-level totals tree -> driver offsets -> range-part
    exchange."""
    import ray

    refs = live_block_refs(feats)

    # per-part token totals via the ref-level combiner tree straight
    # over the materialized blocks (first round sees raw blocks, later
    # rounds the renamed partials — hence the column-name branch)
    def part_totals(t: pa.Table) -> pa.Table:
        col = "n" if "n" in t.column_names else "n_tokens"
        return (
            t.select(["part", col])
            .group_by(["part"])
            .aggregate([(col, "sum")])
            .rename_columns(["part", "n"])
        )

    if refs:
        totals = tree_reduce_refs(refs, part_totals).to_pandas()
    else:
        import pandas as pd

        totals = pd.DataFrame({"part": [], "n": []})
    totals = totals.sort_values("part").reset_index(drop=True)
    offs = dict(
        zip(
            totals["part"],
            np.r_[0, np.cumsum(totals["n"].to_numpy())[:-1]],
        )
    )
    offs_ref = ray.put(offs)

    _empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "bin_id": pa.array([], pa.int64()),
        }
    )

    def assign(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        offs_l = ray.get(offs_ref)
        idx = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        s = t.take(idx)
        n = s.column("n_tokens").to_numpy(zero_copy_only=False)
        start = int(offs_l[int(s.column("part")[0].as_py())])
        excl = start + np.cumsum(n) - n
        return pa.table(
            {
                id_col: pc.cast(s.column(id_col), pa.int64()),
                "n_tokens": pa.array(n.astype("int64")),
                "bin_id": pa.array((excl // budget).astype("int64")),
            }
        )

    from rayslog.stages.aggregate import task_exchange

    # part = doc_id // chunk is unbounded; the totals pass already
    # knows the max part, so the exchange sizes itself to the data
    n_parts = int(totals["part"].max()) + 1 if len(totals) else 1
    return task_exchange(feats, "part", n_parts, assign,
                         drop_part_col=False, return_refs=return_refs)


def pack_assemble(ds, budget: int = 256, chunk: int = 4_096,
                  id_col: str = "doc_id", col: str = "text",
                  sep: str = "\n", parts: int = 64):
    """Materialized training shards: one row per bin — the bin's docs
    joined by ``sep`` in doc_id order, plus doc/token counts.  The
    step after :func:`pack_sequences` every pretraining pipeline runs
    to actually EMIT the packed samples.

    Plan: the (small) bin-assignment table from ``pack_sequences``
    joins the text column via the bucketed ``hash_join`` (text crosses
    that exchange once), then one bin-hash ``task_exchange`` co-locates
    each bin and assembles it with the conv_assemble kernel (lexsort +
    run detection + ``ListArray``/``binary_join`` — no per-bin
    Python).  Text moves twice end-to-end (join + bin exchange) —
    inherent: bins are defined by a global prefix sum, so no single
    partitioning co-locates both the token totals and the bin members.
    Partitioning assumption: one part's bins' text fits a task — size
    ``parts`` to the corpus.
    """
    from rayslog.stages.relational import hash_join

    bin_refs = pack_sequences(ds, budget=budget, chunk=chunk,
                              id_col=id_col, col=col, return_refs=True)
    joined = hash_join(
        ds.map_batches(
            lambda t: t.select([id_col, col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        bin_refs,
        key=id_col,
    )

    def add_bpart(t: pa.Table) -> pa.Table:
        b = t.column("bin_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bpart",
            pa.array(
                (b.astype(np.uint64) % np.uint64(parts)).astype(np.int32)
            ),
        )

    _empty = pa.table(
        {
            "bin_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "sample": pa.array([], pa.string()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        idx = pc.sort_indices(
            t, sort_keys=[("bin_id", "ascending"), (id_col, "ascending")]
        )
        s = t.take(idx)
        b = s.column("bin_id").to_numpy(zero_copy_only=False)
        ntok = s.column("n_tokens").to_numpy(zero_copy_only=False)
        first = np.r_[True, b[1:] != b[:-1]]
        starts = np.nonzero(first)[0]
        offsets = np.r_[starts, len(b)].astype(np.int32)
        texts = s.column(col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets), texts)
        return pa.table(
            {
                "bin_id": pa.array(b[starts].astype("int64")),
                "n_docs": pa.array(np.diff(offsets).astype("int64")),
                "n_tokens": pa.array(
                    np.add.reduceat(ntok, starts).astype("int64")
                ),
                "sample": pc.binary_join(lists, sep),
            }
        )

    from rayslog.stages.aggregate import task_exchange

    return task_exchange(joined, "bpart", parts, per_part,
                         pre_fn=add_bpart)


def conversation_windows(ds, k: int = 8, stride: int = 4,
                         conv_col: str = "conv_id",
                         order_col: str = "turn_idx",
                         text_col: str = "text",
                         sep: str = "\n", parts: int = 64):
    """k-turn sliding context windows per conversation: window w of a
    conversation is its turns [w*stride, w*stride + k) joined by
    ``sep`` — the multi-turn-context training-sample shape (stride <
    k overlaps context between samples).  Conversations shorter than
    ``k`` emit nothing.

    One conv-hash exchange co-locates each conversation; inside a part
    everything is vectorized (lexsort, run detection, the window
    gather is ONE ``take`` of starts x k indices, ``binary_join`` over
    ListArray offsets).  Output text volume is ~k/stride x input —
    inherent to overlapping windows, not the plan.
    """
    from rayslog.stages.aggregate import task_exchange

    def add_part(t: pa.Table) -> pa.Table:
        c = t.column(conv_col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        from rayslog.kernels import texthash as tx

        h = tx.hash_utf8(c.cast(pa.string()), seed=0)
        return t.append_column(
            "__part", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                conv_col: pa.array(
                    [], t.column(conv_col).type if t.num_columns else pa.string()
                ),
                "window_idx": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
        if not t.num_rows:
            return empty
        idx = pc.sort_indices(
            t, sort_keys=[(conv_col, "ascending"), (order_col, "ascending")]
        )
        s = t.take(idx)
        conv = s.column(conv_col)
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = np.asarray(conv.dictionary_encode().indices)
        first = np.r_[True, codes[1:] != codes[:-1]]
        g = np.nonzero(first)[0]                      # conv run starts
        n = np.diff(np.r_[g, len(codes)])             # turns per conv
        w = np.where(n >= k, (n - k) // stride + 1, 0)  # windows per conv
        total = int(w.sum())
        if total == 0:
            return empty
        conv_of_w = np.repeat(np.arange(len(g)), w)
        within = (
            np.arange(total) - np.repeat(np.r_[0, np.cumsum(w)[:-1]], w)
        )
        starts = g[conv_of_w] + within * stride
        gather = (starts[:, None] + np.arange(k)).ravel()
        texts = s.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        win_texts = texts.take(pa.array(gather))
        lists = pa.ListArray.from_arrays(
            pa.array((np.arange(total + 1) * k).astype(np.int32)),
            win_texts,
        )
        return pa.table(
            {
                conv_col: conv.take(pa.array(starts)),
                "window_idx": pa.array(within.astype(np.int64)),
                "text": pc.binary_join(lists, sep),
            }
        )

    return task_exchange(
        ds.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        ),
        "__part",
        parts,
        per_part,
    )


def assistant_char_spans(ds, conv_col: str = "conv_id",
                         order_col: str = "turn_idx",
                         text_col: str = "text", role_col: str = "role",
                         target: str = "assistant", sep_len: int = 1,
                         parts: int = 64):
    """Loss-mask offsets for SFT: for every ``target``-role turn, its
    [start_char, end_char) character span inside the conversation's
    assembled document (turns joined by a ``sep_len``-char separator in
    ``order_col`` order) — exactly what a data loader needs to mask
    non-assistant tokens out of the loss.

    The per-conversation running offset is a GROUPED PREFIX SUM: one
    conv-hash exchange co-locates each conversation, then one lexsort
    + cumulative-sum-with-run-reset pass per part (no per-conv Python,
    no window-function shuffle).
    """
    from rayslog.stages.aggregate import task_exchange

    def add_part(t: pa.Table) -> pa.Table:
        c = t.column(conv_col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        from rayslog.kernels import texthash as tx

        h = tx.hash_utf8(c.cast(pa.string()), seed=0)
        return t.append_column(
            "__part", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                conv_col: pa.array(
                    [],
                    t.column(conv_col).type if t.num_columns else pa.string(),
                ),
                order_col: pa.array([], pa.int64()),
                "start_char": pa.array([], pa.int64()),
                "end_char": pa.array([], pa.int64()),
            }
        )
        if not t.num_rows:
            return empty
        idx = pc.sort_indices(
            t, sort_keys=[(conv_col, "ascending"), (order_col, "ascending")]
        )
        s = t.take(idx)
        conv = s.column(conv_col)
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = np.asarray(conv.dictionary_encode().indices)
        lens = (
            pc.utf8_length(s.column(text_col))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        step = lens + sep_len
        cs = np.cumsum(step)
        start = cs - step  # exclusive prefix sum, global
        first = np.r_[True, codes[1:] != codes[:-1]]
        g = np.nonzero(first)[0]
        n = np.diff(np.r_[g, len(codes)])
        start = start - np.repeat(start[g], n)  # reset per conversation
        mask = pc.equal(s.column(role_col), target).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                conv_col: conv.filter(pa.array(mask)),
                order_col: pc.cast(
                    s.column(order_col), pa.int64()
                ).filter(pa.array(mask)),
                "start_char": pa.array(start[mask]),
                "end_char": pa.array(start[mask] + lens[mask]),
            }
        )

    return task_exchange(
        ds.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        ),
        "__part",
        parts,
        per_part,
    )


def assemble_conversations(ds, conv_col: str = "conv_id",
                           order_col: str = "turn_idx",
                           text_col: str = "text",
                           sep: str = "\n", parts: int = 64):
    """Training-sample assembly: one document per conversation — the
    conversation's turns joined by ``sep`` in ``order_col`` order,
    plus the turn count.  The step every transcript-training pipeline
    runs right before packing/sharding.

    Plan: hash(conv) % ``parts`` bounded groups (one map_groups per
    PART, not per conversation — the measured per-group-machinery
    pathology), and inside a part everything is vectorized Arrow: one
    lexsort by (conv, order), run detection to per-conv offsets, a
    ``ListArray`` built straight from those offsets over the sorted
    text values, and ``binary_join`` to concatenate — no per-row or
    per-conv Python.  The all-to-all moves each text once (unavoidable:
    a conversation's turns must co-locate to concatenate).  ``parts``
    must scale with the corpus so one part's text fits a task.
    """

    def add_part(t: pa.Table) -> pa.Table:
        c = t.column(conv_col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        from rayslog.kernels import texthash as tx

        h = tx.hash_utf8(c.cast(pa.string()), seed=0)
        return t.append_column(
            "__part", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[(conv_col, "ascending"), (order_col, "ascending")]
        )
        s = t.take(idx)
        conv = s.column(conv_col)
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        codes = np.asarray(conv.dictionary_encode().indices)
        if not len(codes):
            return pa.table(
                {
                    conv_col: pa.array([], conv.type),
                    "n_turns": pa.array([], pa.int64()),
                    "doc": pa.array([], pa.string()),
                }
            )
        first = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.nonzero(first)[0]
        offsets = np.r_[starts, len(codes)].astype(np.int32)
        texts = s.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets), texts)
        docs = pc.binary_join(lists, sep)
        return pa.table(
            {
                conv_col: conv.take(pa.array(starts)),
                "n_turns": pa.array(np.diff(offsets).astype(np.int64)),
                "doc": docs,
            }
        )

    from rayslog.stages.aggregate import task_exchange

    return task_exchange(
        ds.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        ),
        "__part",
        parts,
        per_part,
    )
