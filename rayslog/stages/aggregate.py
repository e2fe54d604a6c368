"""Aggregate stage: per-severity and per-conv_id turn counts.

Scale pattern: ALWAYS pre-aggregate inside ``map_batches`` (one partial
count row per key per batch) before the global ``groupby`` — the shuffle
then moves O(distinct keys x batches) rows instead of O(rows).  This is
also the skew treatment: the hot conv_id (one conversation can carry 20%
of all turns) collapses to one row per batch in the partial stage, so no
single reducer receives a fat partition.  An explicit salted two-phase
variant is provided for the adversarial case of many distinct hot keys
per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum


def _partial_counts(keys: list[str], count_col: str = "n"):
    def partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(keys).aggregate([([], "count_all")])
        return out.rename_columns(keys + [count_col])

    return partial


def counts_by(
    ds,
    keys: list[str],
    alias: str = "n_turns",
    batch_size: int | None = None,
    final: str = "shuffle",
):
    """groupby(keys).count() with a per-batch combiner.

    ``final`` picks how the (already tiny) per-batch partials combine:

    - ``"shuffle"``: Ray's hash-shuffle aggregate — the scale path for
      high-cardinality keys (conv_id at 10^12 turns).
    - ``"tree"``: distributed fan-in tree over the partial BLOCKS with
      raw Ray tasks (see ``_tree_combine``) — no sort-shuffle
      machinery at all.  The right plan when distinct keys << rows
      (conv counts: one key per ~1.2k turns) but the key domain is
      still too big for a driver pull; the combine stays on workers.
      Cardinality-safe since r5: the tree auto-splits by hash(key)
      range when the first combine round proves the reduced output
      exceeds ``split_threshold`` rows (see _tree_reduce_auto_split),
      so no task ever concatenates the full key domain.
    - ``"driver"``: stream the partials (O(groups x blocks) rows, NOT
      raw rows) to the driver and reduce with one Arrow group_by —
      for known-small key domains (severity/rfc/hour/error-class) the
      all-to-all shuffle costs ~1s of pure machinery to combine a few
      hundred rows; the driver reduce is the same plan every engine
      uses for final aggregation of tiny results.

    Cardinality rule: ``"driver"`` is ONLY safe when the key domain is
    bounded by construction — severity (8), rfc (3), hour-of-day (24),
    error class (~10), facility (24).  Keys whose cardinality grows
    with the fleet or the corpus (hostname, conv_id, doc_id, app_name)
    MUST use ``"shuffle"``: the driver pull is O(distinct x blocks)
    rows and becomes the scale bottleneck.  In this repo only
    severity_counts / route_sinks / hourly_traffic / parse_errors use
    the driver final.
    """
    partial = ds.map_batches(
        _partial_counts(keys, "n"),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if final == "tree":
        return _tree_combine(partial, ds, keys, alias)
    if final == "driver":
        import ray.data as rd

        tables = []
        for b in partial.iter_batches(batch_format="pyarrow", batch_size=None):
            tables.append(b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
        if not tables:
            return _empty_counts(ds, keys, alias)
        merged = (
            pa.concat_tables(tables)
            .group_by(keys)
            .aggregate([("n", "sum")])
            .rename_columns(keys + [alias])
        )
        return rd.from_arrow(merged)
    return partial.groupby(keys).aggregate(Sum("n", alias_name=alias))


def _empty_counts(ds, keys: list[str], alias: str):
    """Empty result carrying the upstream key TYPES (untyped empty
    lists infer null and break schema-sensitive compares)."""
    import ray.data as rd

    up = ds.schema()
    fields = [pa.field(k, up.base_schema.field(k).type) for k in keys] + [
        pa.field(alias, pa.int64())
    ]
    return rd.from_arrow(
        pa.Table.from_arrays(
            [pa.nulls(0, f.type) for f in fields], schema=pa.schema(fields)
        )
    )


def _tree_combine(partial, ds, keys: list[str], alias: str,
                  fanin: int = 16):
    return tree_aggregate(
        partial,
        keys,
        [("n", "sum")],
        [alias],
        empty_fn=lambda: _empty_counts(ds, keys, alias),
        fanin=fanin,
        # counts over unbounded key domains (conv_id, custkey, ...) stay
        # tree-fast but auto-split by hash(key) range past the threshold
        split_keys=keys,
    )


def tree_reduce(
    partial,
    reduce_fn,
    empty_fn=None,
    fanin: int = 16,
    final_fn=None,
    split_keys: list[str] | None = None,
    split_threshold: int = 2_000_000,
):
    """Fan-in tree over a dataset's BLOCKS with raw Ray tasks, for ANY
    re-applicable table reduce — ``reduce_fn(a ∪ b) ==
    reduce_fn(reduce_fn(a) ∪ reduce_fn(b))`` (grouped sum/min/max,
    grouped top-k row selection, distinct, ...).

    Ray's sort-based ``groupby().aggregate()`` costs ~1s of fixed
    all-to-all machinery even when the partials total a few thousand
    rows (measured flat r1->r2; repartition/hash_shuffle/polars all
    worse).  When the input is already one (or k) rows per key per
    block — tiny — the natural plan is a combiner tree: each task
    concatenates ``fanin`` blocks and reduces them; rounds repeat until
    one block remains.  log_fanin(B) rounds, every combine on workers,
    zero sort machinery.

    ``final_fn`` (optional, table -> table) runs once on the last
    block — for renames / rank columns that must not re-enter the
    reduce.  ``empty_fn`` supplies the typed empty result when every
    input block is empty.

    Partitioning assumption (documented per the build rules): the
    reduced result of any combine — ultimately the FULL reduced
    output — fits one task's memory (conv counts: one conv per ~1.2k
    turns, so the result is ~0.1% of the input; at 10^12 turns that is
    ~10^9 rows x ~24 B ≈ 24 GB — at that point use the sort-shuffle
    groupby, or split the tree by hash(key) range first).  This is a
    raw-task escape hatch in the sense of SURVEY §2.9(c): the Dataset
    API's groupby can express the semantics but not the cost shape.

    ``split_keys`` arms the AUTO-SPLIT escape for unbounded key domains
    (the mitigation the paragraph above names): the first combine round
    reports its output row counts (cheap int ray.gets), and when their
    sum — an upper bound on the final reduced size — exceeds
    ``split_threshold`` the remaining rounds run as ``S`` independent
    hash-range sub-trees over ``hash(split_keys) % S``, so no single
    task ever concatenates the full key domain.  reduce_fn must be
    key-partitionable (true for any grouped aggregate — every row of a
    hash range reduces only with rows of the same range) and final_fn
    per-key (renames/casts — NOT cross-key ranks).  Below the
    threshold the plan is byte-identical to the plain tree.
    """
    import ray.data as rd

    mat = partial.materialize()
    # drop empty blocks via bundle METADATA (no ray.get needed) — an
    # all-empty input may surface pass-through blocks with a schema
    # that never went through the upstream combiner
    refs = live_block_refs(mat)
    if not refs:
        if empty_fn is not None:
            return empty_fn()
        raise ValueError("tree_reduce: empty input and no empty_fn")
    if split_keys is not None:
        return _tree_reduce_auto_split(
            refs, reduce_fn, split_keys, fanin=fanin, final_fn=final_fn,
            split_threshold=split_threshold,
        )
    out = tree_reduce_refs(refs, reduce_fn, fanin=fanin, final_fn=final_fn)
    return rd.from_arrow(out)


def _tree_reduce_auto_split(
    refs,
    reduce_fn,
    key_cols: list[str],
    fanin: int = 16,
    final_fn=None,
    split_threshold: int = 2_000_000,
):
    """Cardinality-adaptive combiner tree (see :func:`tree_reduce`).

    Round 1 combines ``fanin`` raw blocks per task and returns
    ``(reduced_table, n_rows)``; the driver sums the row counts (ints
    only — the tables stay in plasma).  sum <= threshold proves the
    full reduced output fits one task, so the plain tree finishes.
    Past it, each round-1 block splits by ``hash(key_cols) % S`` and S
    sub-trees reduce independently (disjoint key ranges — no final
    cross-combine), yielding an S-block Dataset whose largest block is
    ~distinct/S rows.  S is sized from the upper bound, so a false
    positive (duplicated keys across blocks inflating the sum) only
    costs extra small sub-trees, never correctness.
    """
    import ray
    import ray.data as rd

    @ray.remote(num_returns=2)
    def combine_counted(*blocks):
        ts = [
            t if isinstance(t, pa.Table)
            else pa.Table.from_pandas(t, preserve_index=False)
            for t in blocks
        ]
        ts = [t for t in ts if t.num_rows] or [ts[0]]
        merged = ts[0] if len(ts) == 1 else pa.concat_tables(
            ts, promote_options="default"
        )
        out = reduce_fn(merged)
        return out, out.num_rows

    pairs = [
        combine_counted.remote(*refs[i : i + fanin])
        for i in range(0, len(refs), fanin)
    ]
    r1_refs = [p[0] for p in pairs]
    counts = ray.get([p[1] for p in pairs])
    total = int(sum(counts))
    if total <= split_threshold:
        out = tree_reduce_refs(r1_refs, reduce_fn, fanin=fanin,
                               final_fn=final_fn)
        return rd.from_arrow(out)

    n_splits = min(256, -(-total // split_threshold))

    @ray.remote(num_returns=n_splits)
    def split(t: pa.Table):
        from rayslog.kernels.texthash import col_hash64, combine_hash64

        h = col_hash64(t.column(key_cols[0]))
        for k in key_cols[1:]:
            h = combine_hash64(h, col_hash64(t.column(k)))
        part = (h % np.uint64(n_splits)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        sorted_t = t.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(n_splits + 1))
        return tuple(
            sorted_t.slice(bounds[s], bounds[s + 1] - bounds[s])
            for s in range(n_splits)
        )

    @ray.remote
    def combine_final(*blocks):
        ts = [t for t in blocks if t.num_rows] or [blocks[0]]
        merged = ts[0] if len(ts) == 1 else pa.concat_tables(
            ts, promote_options="default"
        )
        out = reduce_fn(merged)
        return out if final_fn is None else final_fn(out)

    split_cols = [split.remote(r) for r in r1_refs]  # [block][s]
    sub_finals = []
    for s in range(n_splits):
        sub = [row[s] for row in split_cols]
        # reduce each sub-tree to ONE ref without pulling it down
        while len(sub) > fanin:
            sub = [
                combine_counted.remote(*sub[i : i + fanin])[0]
                for i in range(0, len(sub), fanin)
            ]
        sub_finals.append(combine_final.remote(*sub))
    return rd.from_arrow_refs(sub_finals)


def live_block_refs(mat):
    """Non-empty block refs of a materialized dataset (metadata-only)."""
    return [
        r
        for b in mat.iter_internal_ref_bundles()
        for r, m in b.blocks
        if m.num_rows
    ]


def tree_reduce_refs(refs, reduce_fn, fanin: int = 16, final_fn=None):
    """Ref-level sibling of :func:`tree_reduce`: run the combiner tree
    over raw block refs the caller ALREADY holds (e.g. from a dataset
    it materialized for a later exchange pass) — no extra Dataset
    executor spin-up, no second scan of the upstream lineage.  Returns
    the reduced ``pa.Table`` driver-side (small by the tree contract).
    ``refs`` must be non-empty — callers own their empty shape.

    Note the first combine round concatenates the RAW upstream blocks;
    a ``reduce_fn`` fed raw blocks may branch on column names to apply
    the initial per-block aggregation (rounds never mix raw blocks
    with reduced outputs, so the branch is per-round stable).
    """
    import ray

    @ray.remote(num_returns=1)
    def combine(*blocks):
        # blocks may be pandas (e.g. downstream of map_groups) — the
        # tree reduces in Arrow regardless
        ts = [
            t if isinstance(t, pa.Table)
            else pa.Table.from_pandas(t, preserve_index=False)
            for t in blocks
        ]
        ts = [t for t in ts if t.num_rows] or [ts[0]]
        if len(ts) == 1:
            merged = ts[0]
        else:
            merged = pa.concat_tables(ts, promote_options="default")
        return reduce_fn(merged)

    if len(refs) == 1:  # a lone block may still hold duplicate keys
        refs = [combine.remote(refs[0])]
    while len(refs) > 1:
        refs = [
            combine.remote(*refs[i : i + fanin])
            for i in range(0, len(refs), fanin)
        ]
    out = ray.get(refs[0])
    if final_fn is not None:
        out = final_fn(out)
    return out


def task_exchange(ds, part_col: str, parts: int, fn,
                  drop_part_col: bool = True, pre_fn=None,
                  return_refs: bool = False):
    """Raw-task hash exchange: the drop-in replacement for
    ``ds.groupby(part_col).map_groups(fn)`` when ``part_col`` is an
    integer partition id in ``[0, parts)`` computed upstream (the
    bounded-parts pattern of dedup_exact_keep_rows / conv_assemble /
    pack).  Split tasks copy each block once into per-part tables;
    one task per part concats its pieces and applies ``fn``
    (``pa.Table -> pa.Table``) — Ray's sort-based groupby machinery
    costs ~1-3s of fixed all-to-all wall even on tiny exchanges
    (measured on the Q4 semi join and conv_counts), this plan runs
    the same movement as plain tasks.  The exchange sibling of
    :func:`tree_reduce`; same partitioning assumption, per part: one
    part's rows fit a task's heap — size ``parts`` to the data.

    ``fn`` receives one whole part (== one group per the bounded-parts
    contract, with ``part_col`` already dropped unless
    ``drop_part_col=False``) and may return any table, like
    map_groups.

    Ref-land chaining (r4): ``ds`` may be a LIST of Arrow block refs
    from a previous ``return_refs=True`` stage — no Dataset executor
    spins at all (the ~0.2s-per-spin fixed floor measured on 64 tiny
    blocks).  ``pre_fn`` (Table -> Table, empty-safe) runs inside each
    split task BEFORE partitioning — fuse cheap per-block transforms
    (filters, part-id columns) without their own pass.
    ``return_refs=True`` returns the per-part output refs instead of a
    Dataset.  Typed-empty outputs survive chaining: an all-empty input
    keeps one (empty) block ref so every part still flows through
    ``fn`` with the right schema.
    """
    import numpy as np
    import ray
    import ray.data as rd

    P = int(parts)
    if isinstance(ds, list):
        mat = None
        refs = list(ds)
    else:
        mat = ds.materialize()
        refs = live_block_refs(mat)
        if not refs:
            # keep ONE (empty) block so the schema flows through
            # pre_fn/fn and the output parts are typed empties.  Ray
            # SKIPS map fns on empty blocks, so a lineage-derived empty
            # block can be COLUMN-LESS — only keep it if part_col is
            # actually reachable (directly or via pre_fn); otherwise
            # fall through to the legacy untyped-empty path below.
            cand = [
                r
                for b in mat.iter_internal_ref_bundles()
                for r, _m in b.blocks
            ][:1]
            if cand:
                import ray as _ray

                blk = _ray.get(cand[0])
                t0 = (
                    blk
                    if isinstance(blk, pa.Table)
                    else pa.Table.from_pandas(blk, preserve_index=False)
                )
                try:
                    t1 = pre_fn(t0) if pre_fn is not None else t0
                    if part_col in t1.column_names:
                        refs = cand
                except Exception:
                    pass  # untyped/column-less block: legacy path

    @ray.remote
    def split(block):
        t = (
            block
            if isinstance(block, pa.Table)
            else pa.Table.from_pandas(block, preserve_index=False)
        )
        if pre_fn is not None:
            t = pre_fn(t)
        pcol = t.column(part_col)
        if isinstance(pcol, pa.ChunkedArray):
            pcol = pcol.combine_chunks()
        b = pcol.to_numpy(zero_copy_only=False).astype(np.int64)
        # rows with part ids outside [0, P) would fall off the
        # searchsorted bounds and vanish SILENTLY — a caller bug
        # (overflowing part arithmetic) must fail loudly instead
        if len(b) and (b.min() < 0 or b.max() >= P):
            raise ValueError(
                f"task_exchange: {part_col} values outside [0, {P}) "
                f"(min={b.min()}, max={b.max()})"
            )
        if drop_part_col:
            t = t.drop_columns([part_col])
        order = np.argsort(b, kind="stable")
        bounds = np.searchsorted(b[order], np.arange(P + 1))
        out = tuple(
            t.take(pa.array(order[bounds[p] : bounds[p + 1]]))
            for p in range(P)
        )
        # num_returns=1 means Ray returns the value itself, not a
        # 1-tuple of refs — hand back the lone table directly
        return out if P > 1 else out[0]

    part_refs = [split.options(num_returns=P).remote(r) for r in refs]
    if P == 1:
        part_refs = [[p] for p in part_refs]

    @ray.remote
    def apply_part(*pieces):
        ts = [t for t in pieces if t.num_rows]
        # empty parts still go through fn so every output block shares
        # fn's OUTPUT schema (fn must be empty-safe, like any
        # vectorized kernel; map_groups never sees empty groups, so
        # this is the one added contract)
        if not ts:
            return fn(pieces[0])
        return fn(pa.concat_tables(ts, promote_options="default"))

    if not part_refs:
        if return_refs:
            return []
        if mat is None:
            raise ValueError(
                "task_exchange: empty refs input has no schema to type "
                "the output — pass a Dataset instead"
            )
        return mat.map_batches(  # empty input: preserve emptiness+types
            fn, batch_format="pyarrow", zero_copy_batch=True
        )
    out = [
        apply_part.remote(*(pr[p] for pr in part_refs)) for p in range(P)
    ]
    return out if return_refs else rd.from_arrow_refs(out)


def tree_aggregate(
    partial,
    keys: list[str],
    aggs: list[tuple[str, str]],
    out_names: list[str],
    empty_fn=None,
    fanin: int = 16,
    split_keys: list[str] | None = None,
    split_threshold: int = 2_000_000,
):
    """Grouped Arrow aggregate (sum/min/max) over ``tree_reduce``.

    ``aggs`` is ``[(col, arrow_fn), ...]``; each round renames the
    result back to ``keys + cols`` so the reduce re-applies; the final
    block is renamed to ``keys + out_names``.  Used by
    counts_by(final="tree") for the conv-count sum and by
    simhash_near_dups for the cross-band min-hamming dedupe.
    """
    cols = [c for c, _ in aggs]
    spec = list(aggs)

    def reduce_fn(merged: pa.Table) -> pa.Table:
        return (
            merged.select(keys + cols)
            .group_by(keys)
            .aggregate(spec)
            .rename_columns(keys + cols)
        )

    def fallback_empty():
        import ray.data as rd

        up = partial.schema()
        fields = [
            pa.field(n, up.base_schema.field(c).type)
            for c, n in zip(keys + cols, keys + out_names)
        ]
        return rd.from_arrow(
            pa.Table.from_arrays(
                [pa.nulls(0, f.type) for f in fields], schema=pa.schema(fields)
            )
        )

    return tree_reduce(
        partial,
        reduce_fn,
        empty_fn=empty_fn or fallback_empty,
        fanin=fanin,
        final_fn=lambda t: t.rename_columns(keys + out_names),
        split_keys=split_keys,
        split_threshold=split_threshold,
    )


def _topk_reduce_fn(group_col: str, value_col: str, id_col: str, k: int,
                    with_rank: bool = False, ascending: bool = False):
    """Table -> per-group top-k rows by (value desc|asc, id asc).

    Vectorized: one Arrow multi-key sort + dictionary-encode run
    detection + a within-run position mask — no per-group Python.
    Re-applicable (top-k of a union == top-k of per-part top-ks), so it
    drops straight into ``tree_reduce``.
    """

    def fn(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (group_col, "ascending"),
                (value_col, "ascending" if ascending else "descending"),
                (id_col, "ascending"),
            ],
        )
        s = t.take(idx)
        g = s.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = np.asarray(g.dictionary_encode().indices)
        if len(codes) == 0:
            within = np.empty(0, dtype=np.int64)
        else:
            starts = np.r_[0, np.nonzero(codes[1:] != codes[:-1])[0] + 1]
            reps = np.diff(np.r_[starts, len(codes)])
            within = (
                np.arange(len(codes), dtype=np.int64)
                - np.repeat(starts, reps)
            )
        out = s.filter(pa.array(within < k))
        if with_rank:
            out = out.append_column(
                "rank", pa.array(within[within < k] + 1, pa.int64())
            )
        return out

    return fn


def grouped_top_k(
    ds,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 5,
    batch_size: int | None = 8_192,
    fanin: int = 16,
    ascending: bool = False,
):
    """Top-k rows per group by (value desc — or asc with
    ``ascending=True`` — then id asc), with a ``rank`` column
    (1-based) — the distributed window-rank /
    ``row_number() OVER (PARTITION BY g ORDER BY v DESC, id)`` shape.

    Plan: per-batch local top-k (bounded at k x groups rows per block)
    -> ``tree_reduce`` with the SAME top-k reducer (top-k is
    re-applicable) -> rank assignment on the final block only.  No
    sort-shuffle; the combine tree moves at most k x distinct-groups
    rows per task.  Cardinality-safe since r5: the tree auto-splits by
    hash(group) range when k x distinct groups outgrows the measured
    threshold (split_keys below), so unbounded group domains never
    concatenate into one task.
    """
    reduce_fn = _topk_reduce_fn(
        group_col, value_col, id_col, k, ascending=ascending
    )
    partial = ds.map_batches(
        reduce_fn,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )

    def empty_fn():
        import ray.data as rd

        up = ds.schema().base_schema
        fields = [pa.field(n, up.field(n).type)
                  for n in up.names] + [pa.field("rank", pa.int64())]
        return rd.from_arrow(
            pa.Table.from_arrays(
                [pa.nulls(0, f.type) for f in fields], schema=pa.schema(fields)
            )
        )

    return tree_reduce(
        partial,
        reduce_fn,
        empty_fn=empty_fn,
        fanin=fanin,
        final_fn=_topk_reduce_fn(
            group_col, value_col, id_col, k, with_rank=True,
            ascending=ascending,
        ),
        # k x distinct-groups can outgrow one task on unbounded group
        # domains; top-k reduces and ranks are per-group, so the
        # hash-range auto-split applies cleanly (r5)
        split_keys=[group_col],
    )


def _null_fill_value(t: pa.DataType):
    """A placeholder of ``t``'s type for null-filling a shuffle key
    (the real nullness travels in a sibling marker column)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return b""
    if pa.types.is_integer(t):
        return 0
    if pa.types.is_floating(t):
        return 0.0
    if pa.types.is_boolean(t):
        return False
    if pa.types.is_timestamp(t):
        # epoch 0 in the column's own unit/tz (the marker column
        # carries the real nullness, the value just needs to exist)
        return pa.scalar(0, t)
    if pa.types.is_date(t) or pa.types.is_time(t):
        return pa.scalar(0, t)
    raise TypeError(f"no null-fill placeholder for key type {t}")


def distinct_count_by(
    ds,
    group_col: str,
    value_col: str,
    alias: str = "n_distinct",
    batch_size: int | None = None,
    final: str = "tree",
    split_threshold: int = 2_000_000,
):
    """Exact ``count(DISTINCT value) GROUP BY group`` at scale.

    The per-batch combiner is always a distinct-(group, value) pair
    dedupe (Arrow group_by), so only distinct-pairs-per-batch ever
    leave a task, never raw rows.  The global pair dedupe then takes
    one of two shapes:

    - ``final="tree"`` (default): distinct is re-applicable
      (distinct(a ∪ b) == distinct(distinct(a) ∪ distinct(b))), so the
      pair partials ride the raw-task combiner tree and the final block
      counts per group — zero sort-shuffle machinery (the measured ~1s
      fixed cost at any size).  Partitioning assumption (tree_reduce
      docstring): the GLOBAL distinct-pair set fits one task —
      (event_type × user) at 10^9 users is ~80 GB/5 groups... use
      "shuffle" there; (type × user) at 10^6 users is ~80 MB — fine.
    - ``final="shuffle"``: hash-shuffle groupby on (group, value)
      co-locates equal pairs — the unbounded-cardinality path; the
      deduped pairs then count via the tiny combiner tree.

    Null values are dropped (SQL ``count(DISTINCT)`` semantics); null
    group keys form a group, matching DuckDB's GROUP BY.  Ray's
    sort-based shuffle cannot order null keys, so the group column
    travels null-filled beside an explicit ``__gnull`` marker and is
    restored after the final combine (the tree's Arrow group_by handles
    nulls natively but the marker keeps both plans identical).
    """
    from ray.data.aggregate import Count

    def pair_partial(t: pa.Table) -> pa.Table:
        t2 = t.select([group_col, value_col])
        v = t2.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        t2 = t2.filter(pc.is_valid(v))
        out = t2.group_by([group_col, value_col]).aggregate([])
        g = out.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        return pa.table(
            {
                group_col: pc.fill_null(g, _null_fill_value(g.type)),
                "__gnull": pc.cast(pc.is_null(g), pa.int8()),
                value_col: out.column(value_col),
            }
        )

    pairs = ds.map_batches(
        pair_partial,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    keys3 = [group_col, "__gnull", value_col]
    if final == "tree":
        def dedupe(t: pa.Table) -> pa.Table:
            return t.select(keys3).group_by(keys3).aggregate([])

        def count_groups(t: pa.Table) -> pa.Table:
            return (
                dedupe(t)
                .group_by([group_col, "__gnull"])
                .aggregate([([], "count_all")])
                .rename_columns([group_col, "__gnull", alias])
            )

        def empty_fn():
            import ray.data as rd

            up = ds.schema().base_schema
            return rd.from_arrow(
                pa.table(
                    {
                        group_col: pa.nulls(0, up.field(group_col).type),
                        "__gnull": pa.nulls(0, pa.int8()),
                        alias: pa.nulls(0, pa.int64()),
                    }
                )
            )

        # auto-split by GROUP key (never the value): a group's whole
        # pair set must stay in one sub-tree so count_groups stays
        # complete per group; one group's values exceeding a task is
        # the documented final="shuffle" case
        counted = tree_reduce(
            pairs, dedupe, empty_fn=empty_fn, final_fn=count_groups,
            split_keys=[group_col, "__gnull"],
            split_threshold=split_threshold,
        )
    elif final == "shuffle":
        deduped = pairs.groupby(keys3).aggregate(Count(alias_name="__c"))
        counted = counts_by(
            deduped.select_columns([group_col, "__gnull"]),
            [group_col, "__gnull"],
            alias=alias,
            final="tree",
        )
    else:
        raise ValueError(f"distinct_count_by: unknown final={final!r}")

    def restore(t: pa.Table) -> pa.Table:
        g = t.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        mask = pc.equal(t.column("__gnull"), pa.scalar(1, pa.int8()))
        g = pc.if_else(mask, pa.nulls(len(t), g.type), g)
        return pa.table({group_col: g, alias: t.column(alias)})

    return counted.map_batches(
        restore, batch_format="pyarrow", zero_copy_batch=True
    )


def salted_counts_by(
    ds,
    keys: list[str],
    alias: str = "n_turns",
    salt_buckets: int = 16,
    batch_size: int = 65_536,
):
    """Two-phase salted count for skew-heavy keys.

    Phase 1 groups on (hash(key) % salt, *keys) so a hot key spreads over
    ``salt_buckets`` reducers; phase 2 combines the per-salt partials.
    With the per-batch combiner above this is usually unnecessary, but it
    is the correct fallback when a single groupby partition would still
    exceed a reducer (e.g. billions of batches at 100 TB).
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        partial = batch.group_by(keys).aggregate([([], "count_all")])
        partial = partial.rename_columns(keys + ["n"])
        h = np.zeros(len(partial), dtype=np.uint64)
        for k in keys:
            col = partial.column(k)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # deterministic per-key hash (crc32; runs only on the small
            # per-batch partials, never on raw rows)
            import zlib

            hashes = pa.array(
                [zlib.crc32(str(v).encode()) for v in col.to_pylist()],
                pa.uint64(),
            )
            h ^= hashes.to_numpy(zero_copy_only=False).astype(np.uint64)
        return partial.append_column(
            "salt", pa.array((h % salt_buckets).astype(np.int32))
        )

    phase1 = ds.map_batches(
        add_salt, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    per_salt = phase1.groupby(["salt"] + keys).aggregate(Sum("n", alias_name="n"))
    return per_salt.groupby(keys).aggregate(Sum("n", alias_name=alias))


def parsed_only(ds):
    """Rows that parsed cleanly (parse_error is null)."""
    return ds.map_batches(
        lambda t: t.filter(pc.is_null(t.column("parse_error"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def exact_quantiles_cents(ds, value_col: str, quantiles=(0.5, 0.95, 0.99)):
    """Exact distributed quantiles for bounded-precision (2-decimal)
    values: build a value histogram in integer cents (per-batch combiner
    + tiny driver merge), then read the inverse CDF.  O(distinct values)
    state instead of O(rows) — the exact-quantile analogue of the sketch
    pattern when the value domain is small.

    Quantile rule: smallest v with cum_count >= ceil(q * n) (inverse
    CDF; mirrored exactly by the SQL oracle).
    """
    import math

    import ray.data as rd

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t.column(value_col), 100.0)).cast(
            pa.int64()
        )
        g = (
            pa.table({"v": cents})
            .group_by(["v"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["v", "n"])

    partial = ds.map_batches(
        hist, batch_format="pyarrow", zero_copy_batch=True
    )
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partial.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    merged = (
        pa.concat_tables(tables)
        .group_by(["v"])
        .aggregate([("n", "sum")])
        .rename_columns(["v", "n"])
        .sort_by("v")
    )
    v = merged.column("v").to_numpy(zero_copy_only=False)
    n = merged.column("n").to_numpy(zero_copy_only=False)
    cum = np.cumsum(n)
    total = int(cum[-1]) if len(cum) else 0
    rows = []
    for q in quantiles:
        if total == 0:
            rows.append({"q": f"p{int(q * 100)}", "value": None})
            continue
        target = math.ceil(q * total)
        idx = int(np.searchsorted(cum, target))
        rows.append(
            {"q": f"p{int(q * 100)}", "value": float(v[idx]) / 100.0}
        )
    return rd.from_arrow(
        pa.Table.from_pylist(
            rows, schema=pa.schema([("q", pa.string()), ("value", pa.float64())])
        )
    )


def grouped_quantiles_int_from_refs(refs, group_col: str, value_col: str,
                                    quantiles=(0.5, 0.95)):
    """Ref-level sibling of :func:`grouped_quantiles_int`: the
    per-(group, value) histogram reduces through ``tree_reduce_refs``
    over blocks the caller ALREADY materialized (no second corpus scan,
    no sort-shuffle machinery), and the inverse CDF is read on the
    driver from the tiny O(groups x distinct v) histogram.  Returns a
    pandas frame (group, q, value).  Contract: the raw blocks must not
    carry columns named ``v``/``n`` (the tree's round marker)."""
    import math

    import pandas as pd

    def hist_reduce(t: pa.Table) -> pa.Table:
        if "n" in t.column_names:  # later tree rounds: sum histograms
            g = t.group_by([group_col, "v"]).aggregate([("n", "sum")])
        else:  # first round sees raw blocks: count rows per value
            g = (
                t.select([group_col, value_col])
                .group_by([group_col, value_col])
                .aggregate([([], "count_all")])
            )
        return g.rename_columns([group_col, "v", "n"])

    if not refs:
        return pd.DataFrame({group_col: [], "q": [], "value": []})
    hist = tree_reduce_refs(refs, hist_reduce).to_pandas()
    rows = []
    for grp, g in hist.groupby(group_col, sort=True):
        agg = g.sort_values("v")
        v = agg["v"].to_numpy()
        cum = np.cumsum(agg["n"].to_numpy())
        total = int(cum[-1])
        for q in quantiles:
            target = math.ceil(q * total)
            idx = int(np.searchsorted(cum, target))
            rows.append(
                {group_col: grp, "q": f"p{int(q * 100)}",
                 "value": float(v[idx])}
            )
    return pd.DataFrame(rows)


def grouped_quantiles_int(ds, group_col: str, value_col: str,
                          quantiles=(0.5, 0.95)):
    """Exact per-group quantiles for an INTEGER-domain value column.

    Same histogram discipline as exact_quantiles_cents, per group: the
    (group, value) projection materializes once and the per-(group, v)
    count histogram reduces through the ref-level combiner tree
    (:func:`grouped_quantiles_int_from_refs`) — O(groups x distinct v)
    rows through the tree, never the raw rows and no sort-shuffle /
    per-group map_groups machinery (converted r4; the old plan paid
    ~1s of fixed Sort cost at any size).  The inverse CDF — smallest v
    with cum_count >= ceil(q * n), mirrored exactly by the SQL
    oracle's window form — is read on the driver.  Returns a Dataset
    of (group, q, value:float64) rows.

    Partitioning assumption (tree contract): the combined histogram
    fits one task — right for bounded strata (language, source,
    severity) x a bounded integer domain.  For corpus-growing group
    keys use ``grouped_approx_quantiles`` (KLL) instead.
    """
    import ray.data as rd

    mat = ds.materialize()
    df = grouped_quantiles_int_from_refs(
        live_block_refs(mat), group_col, value_col, quantiles
    )
    if not len(df):
        return rd.from_arrow(
            pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "q": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                }
            )
        )
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def grouped_ntile(ds, group_col: str, order_cols: list[str], n: int = 4,
                  parts: int = 64, out_col: str = "ntile"):
    """SQL ``NTILE(n) OVER (PARTITION BY group ORDER BY order_cols)``
    as a distributed operator: every row gets its bucket index (1-based)
    within its group's global order.

    One group-hash ``task_exchange`` (all rows of a group resolve in
    one part — the sessionize partitioning assumption; a group that
    outgrows a task needs a two-phase rank: per-chunk counts → prefix
    offsets, the pack_sequences pattern), then one vectorized lexsort +
    bucket-boundary assignment per part (DuckDB sizing: the first
    ``len % n`` buckets get the extra row).  Output: the input columns
    + ``out_col`` (int64)."""
    import numpy as np

    from rayslog.kernels.texthash import col_hash64

    def prep(t: pa.Table) -> pa.Table:
        h = col_hash64(t.column(group_col))
        return t.append_column(
            "__gpart", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column(out_col, pa.array([], pa.int64()))
        # Arrow multi-key sort: true value order for ANY order-col type
        # (a dictionary-encode order would be appearance order — fine
        # for the PARTITION run detection below, wrong for ORDER BY)
        order_a = pc.sort_indices(
            t,
            sort_keys=[(group_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
        order = order_a.to_numpy(zero_copy_only=False)
        garr = t.column(group_col)
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        g = np.asarray(garr.dictionary_encode().indices)[order]
        starts = np.r_[0, np.nonzero(g[1:] != g[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(g)])
        base, rem = lens // n, lens % n
        # bucket sizes per group: rem buckets of (base+1), then base —
        # row i (0-based within group) maps to
        #   i // (base+1)             while i < rem*(base+1)
        #   rem + (i - rem*(base+1)) // base   otherwise
        within = np.arange(len(g)) - np.repeat(starts, lens)
        base_r = np.repeat(base, lens)
        rem_r = np.repeat(rem, lens)
        cut = rem_r * (base_r + 1)
        small = within < cut
        tile = np.where(
            small,
            within // np.maximum(base_r + 1, 1),
            rem_r + (within - cut) // np.maximum(base_r, 1),
        ).astype(np.int64)
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return t.append_column(out_col, pa.array(tile[inv] + 1))

    prepped = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    out = task_exchange(prepped, "__gpart", parts, per_part)
    return out


def exact_quantiles_cont_cents(ds, value_col: str,
                               quantiles=(0.25, 0.5, 0.75, 0.9)):
    """PERCENTILE_CONT over a bounded-precision (2-decimal) column:
    the same distributed cents histogram as
    :func:`exact_quantiles_cents`, read with the INTERPOLATED inverse
    CDF — ``h = q*(n-1); (1-frac)*v[floor(h)] + frac*v[floor(h)+1]``
    in float64 — DuckDB's ``quantile_cont`` expression VERBATIM (the
    algebraically-equal ``vlo + frac*(vhi-vlo)`` differs in the last
    ULP; bit-checked at p90/sf0.001).  cents/100.0 reproduces the
    stored double bit-for-bit (both are the nearest double to the
    exact 2-dp value), so the interpolation matches the oracle's."""
    import ray.data as rd

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t.column(value_col), 100.0)).cast(
            pa.int64()
        )
        g = (
            pa.table({"v": cents})
            .group_by(["v"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["v", "n"])

    partial = ds.map_batches(
        hist, batch_format="pyarrow", zero_copy_batch=True
    )
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partial.iter_batches(batch_format="pyarrow",
                                      batch_size=None)
    ]
    if tables:
        merged = (
            pa.concat_tables(tables)
            .group_by(["v"])
            .aggregate([("n", "sum")])
            .rename_columns(["v", "n"])
            .sort_by("v")
        )
        v = merged.column("v").to_numpy(zero_copy_only=False)
        n = merged.column("n").to_numpy(zero_copy_only=False)
    else:
        v = np.empty(0, np.int64)
        n = np.empty(0, np.int64)
    cum = np.cumsum(n)
    total = int(cum[-1]) if len(cum) else 0

    def value_at(rank: int) -> float:
        # rank is 0-based over the sorted multiset
        idx = int(np.searchsorted(cum, rank + 1))
        return float(v[idx]) / 100.0

    rows = []
    for q in quantiles:
        name = f"p{int(q * 100)}"
        if total == 0:
            rows.append({"q": name, "value": None})
            continue
        h = q * (total - 1)
        lo = int(np.floor(h))
        frac = h - lo
        vlo = value_at(lo)
        if frac == 0.0 or lo + 1 >= total:
            val = vlo
        else:
            vhi = value_at(lo + 1)
            val = (1.0 - frac) * vlo + frac * vhi
        rows.append({"q": name, "value": val})
    return rd.from_arrow(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema([("q", pa.string()), ("value", pa.float64())]),
        )
    )
