"""General relational operators over the TPC-H-ish tables — the engine's
joins/sort/top-k patterns, expressed Ray-Data-first.

- broadcast hash join for small dimension sides (ray.put once, Arrow
  ``index_in``/``take`` per batch — no shuffle),
- combiner-before-groupby aggregates,
- global top-k via sort+limit over a pre-reduced (small) dataset.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def lineitem_pricing_summary_cents(lineitem_ds, ship_cutoff: str = "1998-09-02"):
    """TPC-H Q1-shaped pricing summary over lineitem.

    Monetary math runs in integer cents (price x100, discount/tax x100)
    so the distributed sums are EXACT — float sums are order-dependent
    across different execution plans, which would make results
    nondeterministic vs the DuckDB oracle (and between runs).  Final
    columns are scaled back to currency units.
    """
    cutoff = pa.scalar(ship_cutoff).cast(pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
        price_c = pc.round(
            pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        disc_c = pc.round(
            pc.multiply(t.column("l_discount"), pa.scalar(100.0))
        ).cast(pa.int64())
        tax_c = pc.round(
            pc.multiply(t.column("l_tax"), pa.scalar(100.0))
        ).cast(pa.int64())
        disc_price_c = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)
        )
        charge_c = pc.multiply(
            disc_price_c, pc.add(pa.scalar(100, pa.int64()), tax_c)
        )
        qty_c = pc.cast(t.column("l_quantity"), pa.int64())
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": qty_c,
                "price_c": price_c,
                "disc_price_c2": disc_price_c,
                "charge_c3": charge_c,
            }
        )

    def prep_partial(t: pa.Table) -> pa.Table:
        # per-batch combiner: the 6-combo key domain means one row per
        # combo per block reaches the combiner tree (the raw-row
        # sort-shuffle aggregate was pure fixed machinery)
        g = (
            prep(t)
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [
                    ("qty", "sum"),
                    ("price_c", "sum"),
                    ("disc_price_c2", "sum"),
                    ("charge_c3", "sum"),
                    ([], "count_all"),
                ]
            )
        )
        return g.rename_columns(
            [
                "l_returnflag", "l_linestatus", "sum_qty", "_base_c",
                "_disc_c2", "_charge_c3", "count_order",
            ]
        )

    from rayslog.stages.aggregate import tree_aggregate

    partials = lineitem_ds.map_batches(
        prep_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = tree_aggregate(
        partials,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum_qty", "sum"),
            ("_base_c", "sum"),
            ("_disc_c2", "sum"),
            ("_charge_c3", "sum"),
            ("count_order", "sum"),
        ],
        ["sum_qty", "_base_c", "_disc_c2", "_charge_c3", "count_order"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pc.cast(t.column("sum_qty"), pa.int64()),
                "sum_base_price": pc.divide(
                    pc.cast(t.column("_base_c"), pa.float64()), 100.0
                ),
                "sum_disc_price": pc.divide(
                    pc.cast(t.column("_disc_c2"), pa.float64()), 10_000.0
                ),
                "sum_charge": pc.divide(
                    pc.cast(t.column("_charge_c3"), pa.float64()), 1_000_000.0
                ),
                "count_order": pc.cast(t.column("count_order"), pa.int64()),
            }
        )

    return agg.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    )


def broadcast_join(ds, small_df, key: str, columns: dict[str, str]):
    """Append columns from a small pandas dim table via broadcast lookup.

    ``columns`` maps small-side column -> output name.  The small side
    ships once through the object store (ray.put); each batch joins
    with vectorized index_in/take inside a STATELESS task function
    (process-cached Arrow arrays — a dedicated actor pool re-paid
    multi-second cold start every call, the measured enrich lesson) —
    the no-shuffle plan for dimension tables of any realistic size.
    """
    import ray

    ref = ray.put(small_df)

    def join_fn(batch: pa.Table) -> pa.Table:
        cached = _LOOKUP_CACHE.get(ref.hex())
        if cached is None:
            df = ray.get(ref)
            cached = (
                pa.array(df[key].tolist()),
                {
                    out: pa.array(df[src].tolist())
                    for src, out in columns.items()
                },
            )
            _LOOKUP_CACHE[ref.hex()] = cached
        keys, cols = cached
        idx = pc.index_in(batch.column(key), value_set=keys)
        for out, arr in cols.items():
            batch = batch.append_column(out, pc.take(arr, idx))
        return batch

    return ds.map_batches(
        join_fn, batch_format="pyarrow", zero_copy_batch=True
    )


def hash_join(left_ds, right_ds, key: str | list[str], buckets: int = 32,
              how: str = "inner", plan: str | None = None,
              return_refs: bool = False):
    """Partitioned hash join for two LARGE sides (no broadcast).

    Default plan = **raw-task hash exchange**: each side's blocks are
    split into ``buckets`` hash partitions by raw Ray tasks, then one
    task per bucket gathers its two sides and joins them with Arrow's
    C++ hash join (``pa.Table.join``) — every row crosses the exchange
    exactly once, no sort, no union null-padding, types preserved
    end-to-end.  This is the tree_reduce escape-hatch discipline
    applied to joins: Ray's sort-based ``groupby().map_groups`` costs
    seconds of fixed all-to-all machinery even on tiny inputs
    (measured: the Q4 semi join over 47k exchanged rows spent 4.8s in
    the Sort operator; this plan runs it in well under a second).
    Partitioning assumptions, documented per the build rules: same
    key => same bucket (salt skewed keys into sub-buckets before
    calling), and ONE bucket's two sides fit a task's heap — size
    ``buckets`` to the data (rows/buckets ~ a few hundred MB), they
    cost one task each, not a shuffle round.

    ``plan="shuffle"`` (or env ``RAYSLOG_JOIN_PLAN=shuffle``) keeps the
    old sort-shuffle form — union with a ``__bucket`` column and a
    pandas merge per ``map_groups`` bucket — for A/B measurement.

    ``key`` may be one column name or a LIST of names (composite key):
    bucket assignment hashes each key column by type
    (``texthash.col_hash64`` — int/string/timestamp all supported,
    no bit-packing or 2^42-range caps) and combines them, and the
    per-bucket Arrow join runs on the full key tuple.  ``how="anti"``
    keeps left rows whose key does NOT
    appear on the right (left columns only) — the large-side
    complement of a broadcast ``is_in`` filter, for when the exclusion
    set is too big to ship to every task.  ``how="semi"`` is its
    mirror: left rows whose key DOES appear on the right, emitted once
    regardless of right-side multiplicity (the EXISTS-subquery shape).
    ``how="full"`` is the FULL OUTER join: unmatched rows of BOTH
    sides survive with the other side's columns null and the key
    columns coalesced (Arrow ``full outer`` per bucket — correct
    because a key's rows land in exactly one bucket on both sides).
    """
    import os

    import numpy as np
    import pandas as pd

    keys = [key] if isinstance(key, str) else list(key)
    plan = plan or os.environ.get("RAYSLOG_JOIN_PLAN", "tasks")
    if (isinstance(left_ds, list) or isinstance(right_ds, list)
            or return_refs):
        # ref-land sides / ref output (return_refs=True exchanges)
        # only exist on the task plan; the legacy shuffle A/B needs
        # Datasets
        return _task_hash_join(left_ds, right_ds, keys, buckets, how,
                               return_refs=return_refs)
    if plan == "tasks":
        return _task_hash_join(left_ds, right_ds, keys, buckets, how)

    def _with_bucket(side: int):
        def fn(t: pa.Table) -> pa.Table:
            mix = _key_hash(t, keys)
            t = t.append_column(
                "__bucket", pa.array((mix % buckets).astype(np.int32))
            )
            return t.append_column(
                "__side", pa.array(np.full(len(t), side, dtype=np.int8))
            )

        return fn

    lschema = left_ds.schema().base_schema
    rschema = right_ds.schema().base_schema
    left_cols = list(lschema.names)
    right_cols = list(rschema.names)
    types = {c: lschema.field(c).type for c in left_cols}
    for c in right_cols:
        types.setdefault(c, rschema.field(c).type)

    def _pad(cols_present, all_cols):
        missing = [c for c in all_cols if c not in cols_present]

        def fn(t: pa.Table) -> pa.Table:
            for c in missing:
                t = t.append_column(c, pa.nulls(len(t), types[c]))
            return t.select(all_cols + ["__bucket", "__side"])

        return fn

    all_cols = left_cols + [c for c in right_cols if c not in left_cols]
    l = left_ds.map_batches(
        _with_bucket(0), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        _pad(left_cols, all_cols), batch_format="pyarrow", zero_copy_batch=True
    )
    r = right_ds.map_batches(
        _with_bucket(1), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        _pad(right_cols, all_cols), batch_format="pyarrow", zero_copy_batch=True
    )
    both = l.union(r)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][left_cols]
        rg = g[g["__side"] == 1][right_cols]
        if how in ("anti", "semi"):
            hit = lg.merge(
                rg[keys].drop_duplicates(), on=keys, how="left",
                indicator=True,
            )["_merge"].eq("both").to_numpy()
            out = lg[hit] if how == "semi" else lg[~hit]
            # the union null-pads left columns on right-side rows, so
            # pandas widened ints to float inside this group; the
            # anti/semi output is pure left rows (no nulls) — restore
            # dtypes.
            return out.astype(
                {c: types[c].to_pandas_dtype() for c in left_cols}
            )
        return lg.merge(rg, on=keys, how="outer" if how == "full" else how)

    return both.groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas"
    )


def _key_hash(t: pa.Table, keys: list[str]):
    """Combined avalanched uint64 hash of the key tuple of each row."""
    from rayslog.kernels.texthash import col_hash64, combine_hash64

    h = col_hash64(t.column(keys[0]))
    for k2 in keys[1:]:
        h = combine_hash64(h, col_hash64(t.column(k2)))
    return h


#: pandas-merge `how` -> pyarrow join_type
_ARROW_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def _task_hash_join(left_ds, right_ds, keys: list[str], buckets: int,
                    how: str, return_refs: bool = False):
    """The raw-task exchange plan behind :func:`hash_join` (see its
    docstring).  Split tasks copy each block once into per-bucket
    tables (``take`` of disjoint index sets — fresh buffers, so a
    bucket part never pins its parent block); join tasks concat one
    bucket's parts per side and run the Arrow hash join."""
    import numpy as np
    import ray
    import ray.data as rd

    jt = _ARROW_JOIN_TYPE[how]
    P = int(buckets)

    def _block_refs(ds):
        if isinstance(ds, list):
            # ref-land side (a return_refs=True exchange / raw tasks):
            # no executor spin; schema from the first block — exchanges
            # keep at least one typed (possibly empty) block
            refs = list(ds)
            if refs:
                blk = ray.get(refs[0])
                if not isinstance(blk, pa.Table):
                    blk = pa.Table.from_pandas(blk, preserve_index=False)
                # empty refs flow through split harmlessly — no
                # per-ref metadata fetch needed
                return refs, blk.schema
            return refs, None
        mat = ds.materialize()
        refs = [
            r
            for b in mat.iter_internal_ref_bundles()
            for r, m in b.blocks
            if m.num_rows
        ]
        # Ray loses the schema of an ALL-EMPTY dataset (repartition /
        # filter of empty blocks -> schema() None); recover it from a
        # live block when rows exist, else report None and let the
        # caller decide
        s = mat.schema()
        if s is not None:
            base = s.base_schema
            if isinstance(base, pa.Schema):
                return refs, base
        if refs:
            blk = ray.get(refs[0])
            if not isinstance(blk, pa.Table):
                blk = pa.Table.from_pandas(blk, preserve_index=False)
            return refs, blk.schema
        return refs, None

    # the two sides are independent pipelines — materialize them
    # concurrently (each owns its streaming executor; sequential
    # execution would serialize two read+filter scans)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        fl = pool.submit(_block_refs, left_ds)
        fr = pool.submit(_block_refs, right_ds)
        lrefs, lschema = fl.result()
        rrefs, rschema = fr.result()

    if lschema is None:
        # left empty AND untyped: the output's left columns are
        # unknowable for every `how` — fail loudly rather than guess
        raise ValueError(
            "hash_join: left side has no rows and no recoverable schema"
        )
    if rschema is None:
        if how in ("semi", "anti"):
            # right side only contributes its KEY SET; an empty set is
            # fully typed by the left key columns
            rschema = pa.schema(
                [pa.field(k, lschema.field(k).type) for k in keys]
            )
        else:
            raise ValueError(
                "hash_join: right side has no rows and no recoverable "
                "schema — inner/left output columns are unknowable"
            )

    def _as_arrow(block):
        if isinstance(block, pa.Table):
            return block
        return pa.Table.from_pandas(block, preserve_index=False)

    @ray.remote
    def split(block):
        t = _as_arrow(block)
        mix = _key_hash(t, keys)
        b = (mix % np.uint64(P)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        bounds = np.searchsorted(b[order], np.arange(P + 1))
        out = tuple(
            t.take(pa.array(order[bounds[p] : bounds[p + 1]]))
            for p in range(P)
        )
        # num_returns=1 means Ray returns the value itself, not a
        # 1-tuple of refs — hand back the lone table directly
        return out if P > 1 else out[0]

    lparts = [split.options(num_returns=P).remote(r) for r in lrefs]
    rparts = [split.options(num_returns=P).remote(r) for r in rrefs]
    if P == 1:
        lparts = [[p] for p in lparts]
        rparts = [[p] for p in rparts]

    lempty = pa.Table.from_arrays(
        [pa.nulls(0, f.type) for f in lschema], schema=lschema
    )
    rempty = pa.Table.from_arrays(
        [pa.nulls(0, f.type) for f in rschema], schema=rschema
    )

    @ray.remote
    def join_bucket(n_left, *parts):
        lt = [t for t in parts[:n_left] if t.num_rows] or [lempty]
        rt = [t for t in parts[n_left:] if t.num_rows] or [rempty]
        left = pa.concat_tables(lt, promote_options="default")
        right = pa.concat_tables(rt, promote_options="default")
        if how in ("semi", "anti"):
            # join only needs the right KEY SET; dedupe it first so a
            # high-multiplicity right side can't blow up the hash table
            right = right.select(keys).group_by(keys).aggregate([])
        return left.join(right, keys=keys, join_type=jt)

    out_refs = [
        join_bucket.remote(
            len(lparts), *(lp[p] for lp in lparts), *(rp[p] for rp in rparts)
        )
        for p in range(P)
    ]
    return out_refs if return_refs else rd.from_arrow_refs(out_refs)


def top_customers_by_revenue(orders_ds, customer_df=None, k: int = 10,
                             parts: int = 64, customer_path: str | None = None):
    """Top-k customers by total order price, with names joined in.

    Per-batch partial sums exchange once on custkey-hash parts
    (fleet-sized key domain — no sort-shuffle, no driver pull), each
    part reduces to one row per customer, and the global top-k runs
    through the combiner tree (top-k is re-applicable).  Customer
    names join on the FINAL k rows only — the dim lookup never touches
    the fan-in.

    Pass ``customer_path`` (preferred) to attach names via a k-key
    FILTERED parquet read — O(k) driver memory at any customer scale,
    so there is no whole-table driver materialization to outgrow a
    heap (round-3 verdict watch-item).  ``customer_df`` (a pre-loaded
    frame) is kept for callers that already hold the dim.
    """
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        g = (
            t.select(["o_custkey"])
            .append_column("cents", cents)
            .group_by(["o_custkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["o_custkey", "cents"])
        )
        u = g.column("o_custkey").to_numpy(zero_copy_only=False)
        return g.append_column(
            "cpart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )

    def finish_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        return (
            t.group_by(["o_custkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["o_custkey", "cents"])
        )

    per_cust = task_exchange(
        orders_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "cpart",
        parts,
        finish_part,
    )

    def topk_reduce(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("cents", "descending"), ("o_custkey", "ascending")]
        ).slice(0, k)

    if customer_df is None and customer_path is None:
        raise ValueError("pass customer_df or customer_path")

    def final_fn(t: pa.Table) -> pa.Table:
        keys_l = t.column("o_custkey").to_pylist()
        if customer_df is not None:
            sub = customer_df[customer_df["c_custkey"].isin(keys_l)]
        elif not keys_l:
            import pandas as pd

            sub = pd.DataFrame(
                {"c_custkey": [], "c_name": [], "c_mktsegment": []}
            )
        else:
            # k-key filtered read: row-group-pruned, O(k) driver memory
            import pyarrow.parquet as pq

            sub = pq.read_table(
                customer_path,
                columns=["c_custkey", "c_name", "c_mktsegment"],
                filters=[("c_custkey", "in", keys_l)],
            ).to_pandas()
        ck = pa.array(sub["c_custkey"].tolist(), pa.int64())
        names = pa.array(sub["c_name"].tolist(), pa.string())
        segs = pa.array(sub["c_mktsegment"].tolist(), pa.string())
        idx = pc.index_in(pc.cast(t.column("o_custkey"), pa.int64()),
                          value_set=ck)
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "revenue": pc.divide(
                    pc.cast(t.column("cents"), pa.float64()), 100.0
                ),
                "c_name": pc.take(names, idx),
                "c_mktsegment": pc.take(segs, idx),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(final_fn(_empty))

    return tree_reduce(per_cust, topk_reduce, empty_fn=empty_fn,
                       final_fn=final_fn)


#: per-worker-process cache of broadcast lookup sides, keyed by object
#: ref — stateless task functions stay on Ray's long-lived default
#: workers (no actor-pool cold start) while each process still pays the
#: numpy->Arrow conversion exactly once
_LOOKUP_CACHE: dict = {}


def _cached_lookup(ref):
    key = ref.hex()
    hit = _LOOKUP_CACHE.get(key)
    if hit is None:
        import ray

        keys, vals = ray.get(ref)
        hit = (pa.array(keys), pa.array(vals))
        _LOOKUP_CACHE[key] = hit
    return hit


def _cached_arrays(ref):
    """Like :func:`_cached_lookup` but for an arbitrary-arity tuple of
    numpy arrays (e.g. a key column plus several payload columns)."""
    key = ("tuple", ref.hex())
    hit = _LOOKUP_CACHE.get(key)
    if hit is None:
        import ray

        hit = tuple(pa.array(a) for a in ray.get(ref))
        _LOOKUP_CACHE[key] = hit
    return hit


def _line_rev_c2(t: pa.Table) -> pa.Array:
    """Order-independent revenue partial: price_c x (100 - disc_c) in
    integer cents^2 (CLAUDE.md invariant #3 — float sums would
    hash-mismatch the oracle nondeterministically)."""
    price_c = pc.round(
        pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))
    ).cast(pa.int64())
    disc_c = pc.round(
        pc.multiply(t.column("l_discount"), pa.scalar(100.0))
    ).cast(pa.int64())
    return pc.multiply(
        price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)
    )


def _orders_nation_side(orders_ds, customer_df, nation_keys, lo, hi,
                        buckets: int, with_year: bool = False):
    """orders in [lo, hi) joined to customer, projected to
    ``(l_orderkey, c_nationkey[, o_year])``.  The customer leg auto-selects:
    a pandas frame broadcasts once via ``ray.put`` and is looked up
    per batch inside stateless task functions (process-cached Arrow
    arrays); a ray Dataset runs the distributed ``hash_join`` leg with
    the nation filter + 2-column projection pushed into the dim's own
    map_batches, so the dim never lands on the driver."""
    import pandas as pd
    import ray

    nk_list = sorted(int(k) for k in nation_keys)

    if isinstance(customer_df, pd.DataFrame):
        cust = customer_df[customer_df["c_nationkey"].isin(nation_keys)]
        cust_ref = ray.put(
            (cust["c_custkey"].to_numpy(), cust["c_nationkey"].to_numpy())
        )

        def orders_side_fn(t: pa.Table) -> pa.Table:
            """orders in window, customer kept -> (l_orderkey, c_nationkey)."""
            keys, nks = _cached_lookup(cust_ref)
            m = pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
            t = t.filter(m)
            idx = pc.index_in(t.column("o_custkey"), value_set=keys)
            cols = {
                "l_orderkey": t.column("o_orderkey"),
                "c_nationkey": pc.take(nks, idx),
            }
            if with_year:
                cols["o_year"] = pc.cast(
                    pc.year(t.column("o_orderdate")), pa.int64()
                )
            out = pa.table(cols)
            return out.filter(pc.is_valid(out.column("c_nationkey")))

        return orders_ds.map_batches(
            orders_side_fn, batch_format="pyarrow", zero_copy_batch=True
        )

    # customer too big to broadcast: distributed hash-join leg
    def orders_proj(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), lo),
            pc.less(t.column("o_orderdate"), hi),
        )
        t = t.filter(m)
        cols = {
            "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "l_orderkey": t.column("o_orderkey"),
        }
        if with_year:
            cols["o_year"] = pc.cast(
                pc.year(t.column("o_orderdate")), pa.int64()
            )
        return pa.table(cols)

    def cust_proj(t: pa.Table) -> pa.Table:
        nk = pa.array(nk_list).cast(t.column("c_nationkey").type)
        t = t.filter(pc.is_in(t.column("c_nationkey"), value_set=nk))
        return pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": t.column("c_nationkey"),
            }
        )

    return hash_join(
        orders_ds.map_batches(
            orders_proj, batch_format="pyarrow", zero_copy_batch=True
        ),
        customer_df.map_batches(
            cust_proj, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="c_custkey",
        buckets=buckets,
    ).map_batches(
        lambda t: t.select(
            ["l_orderkey", "c_nationkey"]
            + (["o_year"] if with_year else [])
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _line_nation_side(lineitem_ds, supplier_df, nation_keys,
                      buckets: int):
    """lineitem joined to supplier, projected to
    ``(l_orderkey, s_nationkey, rev_c2)``; same broadcast-vs-hash-join
    auto-select as :func:`_orders_nation_side`."""
    import pandas as pd
    import ray

    nk_list = sorted(int(k) for k in nation_keys)

    if isinstance(supplier_df, pd.DataFrame):
        supp = supplier_df[supplier_df["s_nationkey"].isin(nation_keys)]
        supp_ref = ray.put(
            (supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy())
        )

        def line_side_fn(t: pa.Table) -> pa.Table:
            """lineitem with kept supplier -> (l_orderkey, s_nationkey, rev_c2)."""
            keys, nks = _cached_lookup(supp_ref)
            idx = pc.index_in(t.column("l_suppkey"), value_set=keys)
            snk = pc.take(nks, idx)
            out = pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "s_nationkey": snk,
                    "rev_c2": _line_rev_c2(t),
                }
            )
            return out.filter(pc.is_valid(out.column("s_nationkey")))

        return lineitem_ds.map_batches(
            line_side_fn, batch_format="pyarrow", zero_copy_batch=True
        )

    def line_proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "l_orderkey": t.column("l_orderkey"),
                "rev_c2": _line_rev_c2(t),
            }
        )

    def supp_proj(t: pa.Table) -> pa.Table:
        nk = pa.array(nk_list).cast(t.column("s_nationkey").type)
        t = t.filter(pc.is_in(t.column("s_nationkey"), value_set=nk))
        return pa.table(
            {
                "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
                "s_nationkey": t.column("s_nationkey"),
            }
        )

    return hash_join(
        lineitem_ds.map_batches(
            line_proj, batch_format="pyarrow", zero_copy_batch=True
        ),
        supplier_df.map_batches(
            supp_proj, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="s_suppkey",
        buckets=buckets,
    ).map_batches(
        lambda t: t.select(["l_orderkey", "s_nationkey", "rev_c2"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def regional_revenue_cents(
    lineitem_ds,
    orders_ds,
    customer_df,
    supplier_df,
    nation_df,
    region_df,
    region_name: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    buckets: int = 32,
):
    """TPC-H Q5-shaped multi-way join: revenue per nation where customer
    and supplier share the nation, within one region and order-date year.

    Join plan (the scale-shaped composition, not six shuffles):

    - region⨝nation collapses on the driver (25x5 rows) to the region's
      ``{nationkey: name}`` map;
    - customer and supplier are DIMENSION sides.  Passed as pandas
      frames they broadcast once via ``ray.put`` and are looked up per
      batch with ``index_in`` inside STATELESS task functions
      (process-cached Arrow arrays; a dedicated actor pool would
      re-pay multi-second cold start every run — the measured enrich
      lesson, VERDICT r1 #6).  Passed as ray Datasets (what
      ``pipeline.q_regional_revenue`` does automatically once the
      parquet row count crosses ``RAYSLOG_BROADCAST_MAX_ROWS``) each
      leg runs as a distributed ``hash_join`` instead — nation-filter
      pushed into the dim's map_batches, projected to 2-3 columns, so
      the dim never lands on the driver and the legs compose
      unchanged;
    - the one genuinely LARGE-large join (lineitem⨝orders on orderkey)
      runs through the bucketed ``hash_join`` — each row crosses the
      all-to-all exactly once, pre-filtered (date window, region
      membership) and pre-projected to 3 columns so the shuffle moves
      ~20 bytes/row, never the payload;
    - revenue aggregates in integer cents^2 (price_c x (100-disc_c)) so
      distributed sums are order-independent (CLAUDE.md invariant #3).
    """
    import numpy as np

    nat = nation_df.merge(
        region_df[region_df["r_name"] == region_name],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )
    nation_names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nation_keys = set(nation_names)

    lo = pa.scalar(date_lo).cast(pa.timestamp("us"))
    hi = pa.scalar(date_hi).cast(pa.timestamp("us"))
    orders_side = _orders_nation_side(
        orders_ds, customer_df, nation_keys, lo, hi, buckets
    )
    line_side = _line_nation_side(
        lineitem_ds, supplier_df, nation_keys, buckets
    )
    joined = hash_join(line_side, orders_side, key="l_orderkey",
                       buckets=buckets)

    # per-bucket partial sums, then the raw-task combiner tree — the
    # final key domain is <= 25 nations, so Ray's sort-shuffle
    # aggregate would be pure fixed machinery here
    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.equal(t.column("s_nationkey"), t.column("c_nationkey"))
        )
        return (
            t.select(["c_nationkey", "rev_c2"])
            .group_by(["c_nationkey"])
            .aggregate([("rev_c2", "sum")])
            .rename_columns(["c_nationkey", "rev_c2"])
        )

    partials = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    nk = pa.array(np.array(sorted(nation_names), dtype=np.int64))
    nm = pa.array([nation_names[k] for k in sorted(nation_names)])

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["c_nationkey"])
            .aggregate([("rev_c2", "sum")])
            .rename_columns(["c_nationkey", "rev_c2"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t.column("c_nationkey"), nk.type), value_set=nk
        )
        out = pa.table(
            {
                "n_name": pc.take(nm, idx),
                "revenue": pc.divide(
                    pc.cast(t.column("rev_c2"), pa.float64()), 10_000.0
                ),
            }
        )
        return out.sort_by([("revenue", "descending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        )

    from rayslog.stages.aggregate import tree_reduce

    return tree_reduce(partials, reduce_fn, empty_fn=empty_fn,
                       final_fn=final_fn)


def nation_trade_volume_cents(
    lineitem_ds,
    orders_ds,
    customer_df,
    supplier_df,
    nation_df,
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    buckets: int = 32,
):
    """TPC-H Q7-shaped cross-nation trade matrix: revenue shipped from
    each supplier nation to each DIFFERENT customer nation within a
    two-year order window.

    Same join plan as :func:`regional_revenue_cents` (shared
    :func:`_orders_nation_side` / :func:`_line_nation_side` legs:
    broadcast dim lookup below the row threshold, distributed
    hash_join above; one large-large orderkey exchange), but the
    final grouping keeps the full (supp_nation, cust_nation) pair
    domain — <= 25x24 keys, so partials still collapse through the
    combiner tree, never a sort-shuffle."""
    import numpy as np

    nation_names = dict(
        zip(nation_df["n_nationkey"], nation_df["n_name"])
    )
    nation_keys = set(nation_names)

    lo = pa.scalar(date_lo).cast(pa.timestamp("us"))
    hi = pa.scalar(date_hi).cast(pa.timestamp("us"))
    orders_side = _orders_nation_side(
        orders_ds, customer_df, nation_keys, lo, hi, buckets
    )
    line_side = _line_nation_side(
        lineitem_ds, supplier_df, nation_keys, buckets
    )
    joined = hash_join(line_side, orders_side, key="l_orderkey",
                       buckets=buckets)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.not_equal(t.column("s_nationkey"), t.column("c_nationkey"))
        )
        return (
            t.select(["s_nationkey", "c_nationkey", "rev_c2"])
            .group_by(["s_nationkey", "c_nationkey"])
            .aggregate([("rev_c2", "sum")])
            .rename_columns(["s_nationkey", "c_nationkey", "rev_c2"])
        )

    partials = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    nk = pa.array(np.array(sorted(nation_names), dtype=np.int64))
    nm = pa.array([nation_names[k] for k in sorted(nation_names)])

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["s_nationkey", "c_nationkey"])
            .aggregate([("rev_c2", "sum")])
            .rename_columns(["s_nationkey", "c_nationkey", "rev_c2"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        si = pc.index_in(
            pc.cast(t.column("s_nationkey"), nk.type), value_set=nk
        )
        ci = pc.index_in(
            pc.cast(t.column("c_nationkey"), nk.type), value_set=nk
        )
        out = pa.table(
            {
                "supp_nation": pc.take(nm, si),
                "cust_nation": pc.take(nm, ci),
                "revenue": pc.divide(
                    pc.cast(t.column("rev_c2"), pa.float64()), 10_000.0
                ),
            }
        )
        return out.sort_by(
            [("revenue", "descending"),
             ("supp_nation", "ascending"),
             ("cust_nation", "ascending")]
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "supp_nation": pa.array([], pa.string()),
                    "cust_nation": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        )

    from rayslog.stages.aggregate import tree_reduce

    return tree_reduce(partials, reduce_fn, empty_fn=empty_fn,
                       final_fn=final_fn)


def top_open_orders_cents(
    lineitem_ds,
    orders_ds,
    customer_df,
    segment: str = "BUILDING",
    cutoff: str = "1997-07-01",
    k: int = 10,
    buckets: int = 32,
):
    """TPC-H Q3-shaped shipping-priority query: the top-k unshipped
    orders by open revenue for one market segment — orders placed
    before the cutoff whose lineitems ship after it.

    Plan: the customer leg auto-selects (broadcast segment-member
    custkey set below the row threshold via ``ray.put`` +
    process-cached ``is_in``; distributed SEMI hash_join above); both
    fact sides pre-filter and project before the one large-large
    orderkey exchange.  Orderkey groups are complete within a join
    bucket, so each bucket finishes its groups and truncates to its
    local top-k — the global top-k is a subset of the union, merged
    through the combiner tree (grouped_top_k's partitioning
    argument)."""
    import pandas as pd
    import ray

    cutoff_ts = pa.scalar(cutoff).cast(pa.timestamp("us"))

    if isinstance(customer_df, pd.DataFrame):
        keys = customer_df.loc[
            customer_df["c_mktsegment"] == segment, "c_custkey"
        ].to_numpy()
        keys_ref = ray.put((keys, keys))

        def orders_prep(t: pa.Table) -> pa.Table:
            members, _ = _cached_lookup(keys_ref)
            m = pc.and_(
                pc.less(t.column("o_orderdate"), cutoff_ts),
                pc.is_in(t.column("o_custkey"), value_set=members),
            )
            t = t.filter(m)
            return pa.table(
                {
                    "l_orderkey": t.column("o_orderkey"),
                    "o_orderdate": t.column("o_orderdate"),
                    "o_orderpriority": t.column("o_orderpriority"),
                }
            )

        orders_side = orders_ds.map_batches(
            orders_prep, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        def orders_proj(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t.column("o_orderdate"), cutoff_ts))
            return pa.table(
                {
                    "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                    "l_orderkey": t.column("o_orderkey"),
                    "o_orderdate": t.column("o_orderdate"),
                    "o_orderpriority": t.column("o_orderpriority"),
                }
            )

        def cust_proj(t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.equal(t.column("c_mktsegment"), pa.scalar(segment))
            )
            return pa.table(
                {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64())}
            )

        orders_side = hash_join(
            orders_ds.map_batches(
                orders_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            customer_df.map_batches(
                cust_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            key="c_custkey",
            how="semi",
            buckets=buckets,
        ).map_batches(
            lambda t: t.select(
                ["l_orderkey", "o_orderdate", "o_orderpriority"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def line_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), cutoff_ts))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_c2": _line_rev_c2(t),
            }
        )

    line_side = lineitem_ds.map_batches(
        line_prep, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join(line_side, orders_side, key="l_orderkey",
                       buckets=buckets)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(
                ["l_orderkey", "o_orderdate", "o_orderpriority", "rev_c2"]
            )
            .group_by(["l_orderkey", "o_orderdate", "o_orderpriority"])
            .aggregate([("rev_c2", "sum")])
            .rename_columns(
                ["l_orderkey", "o_orderdate", "o_orderpriority", "rev_c2"]
            )
        )
        return g.sort_by(
            [("rev_c2", "descending"), ("l_orderkey", "ascending")]
        ).slice(0, k)

    partials = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def topk_reduce(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("rev_c2", "descending"), ("l_orderkey", "ascending")]
        ).slice(0, k)

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "revenue": pc.divide(
                    pc.cast(t.column("rev_c2"), pa.float64()), 10_000.0
                ),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "o_orderpriority": pa.array([], pa.string()),
                }
            )
        )

    from rayslog.stages.aggregate import tree_reduce

    return tree_reduce(partials, topk_reduce, empty_fn=empty_fn,
                       final_fn=final_fn)


def special_deal_revenue_cents(
    lineitem_ds,
    part_df,
    deals=(
        ("Brand#1", 10, 1.0, 15.0),
        ("Brand#12", 20, 10.0, 25.0),
        ("Brand#17", 30, 25.0, 50.0),
    ),
    buckets: int = 32,
):
    """TPC-H Q19-shaped disjunctive-predicate revenue: lineitems whose
    (part brand, part size, quantity) satisfy ANY of the deal arms
    ``(brand, size_max, qty_lo, qty_hi)``, summed to one revenue row.

    The part side prunes to deal brands BEFORE it moves: broadcast
    (pandas) it ships a (partkey, arm-bitmask-ready brand index, size)
    triple via ``ray.put`` and the disjunction evaluates vectorized
    inside lineitem's map_batches; as a Dataset it runs the
    distributed hash_join leg with the same brand pruning pushed into
    the dim's projection.  The scalar total rides the combiner tree
    in exact int cents^2 — a single-row all-reduce, no shuffle."""
    import numpy as np
    import pandas as pd
    import ray

    brands = [d[0] for d in deals]

    def _arm_mask(t: pa.Table, bidx_col, size_col) -> pa.Array:
        """Disjunction over deal arms; bidx is the arm index or -1."""
        qty = t.column("l_quantity")
        m = None
        for i, (_, size_max, qty_lo, qty_hi) in enumerate(deals):
            arm = pc.and_(
                pc.equal(bidx_col, pa.scalar(i, pa.int64())),
                pc.and_(
                    pc.less_equal(size_col, pa.scalar(size_max,
                                                      pa.int64())),
                    pc.and_(
                        pc.greater_equal(qty, pa.scalar(qty_lo)),
                        pc.less_equal(qty, pa.scalar(qty_hi)),
                    ),
                ),
            )
            m = arm if m is None else pc.or_(m, arm)
        return m

    if isinstance(part_df, pd.DataFrame):
        sub = part_df[part_df["p_brand"].isin(brands)]
        bidx = sub["p_brand"].map({b: i for i, b in enumerate(brands)})
        part_ref = ray.put(
            (
                sub["p_partkey"].to_numpy(),
                bidx.to_numpy(np.int64),
                sub["p_size"].to_numpy(np.int64),
            )
        )

        def line_fn(t: pa.Table) -> pa.Table:
            keys, barr, sarr = _cached_arrays(part_ref)
            idx = pc.index_in(t.column("l_partkey"), value_set=keys)
            valid = pc.is_valid(idx)
            t = t.filter(valid)
            idx = pc.filter(idx, valid)
            bcol = pc.take(barr, idx)
            scol = pc.take(sarr, idx)
            m = _arm_mask(t, bcol, scol)
            t = t.filter(m)
            return pa.table(
                {"rev_c2": pa.array(
                    [pc.sum(_line_rev_c2(t)).as_py() or 0],
                    pa.int64(),
                )}
            )

        partials = lineitem_ds.map_batches(
            line_fn, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        def part_proj(t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.is_in(t.column("p_brand"),
                         value_set=pa.array(brands))
            )
            bidx = pc.index_in(t.column("p_brand"),
                               value_set=pa.array(brands))
            return pa.table(
                {
                    "l_partkey": pc.cast(t.column("p_partkey"),
                                         pa.int64()),
                    "bidx": pc.cast(bidx, pa.int64()),
                    "psize": pc.cast(t.column("p_size"), pa.int64()),
                }
            )

        def line_proj(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_partkey": pc.cast(t.column("l_partkey"),
                                         pa.int64()),
                    "l_quantity": t.column("l_quantity"),
                    "rev_price": t.column("l_extendedprice"),
                    "rev_disc": t.column("l_discount"),
                }
            )

        joined = hash_join(
            lineitem_ds.map_batches(
                line_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            part_df.map_batches(
                part_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            key="l_partkey",
            buckets=buckets,
        )

        def bucket_fn(t: pa.Table) -> pa.Table:
            m = _arm_mask(t, t.column("bidx"), t.column("psize"))
            t = t.filter(m)
            rev = pa.table(
                {
                    "l_extendedprice": t.column("rev_price"),
                    "l_discount": t.column("rev_disc"),
                }
            )
            return pa.table(
                {"rev_c2": pa.array(
                    [pc.sum(_line_rev_c2(rev)).as_py() or 0],
                    pa.int64(),
                )}
            )

        partials = joined.map_batches(
            bucket_fn, batch_format="pyarrow", zero_copy_batch=True
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"rev_c2": pa.array(
                [pc.sum(t.column("rev_c2")).as_py() or 0], pa.int64()
            )}
        )

    def final_fn(t: pa.Table) -> pa.Table:
        total = pc.sum(t.column("rev_c2")).as_py() or 0
        return pa.table(
            {"revenue": pa.array([total / 10_000.0], pa.float64())}
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"revenue": pa.array([0.0], pa.float64())})
        )

    from rayslog.stages.aggregate import tree_reduce

    return tree_reduce(partials, reduce_fn, empty_fn=empty_fn,
                       final_fn=final_fn)


def order_priority_counts(
    orders_ds,
    lineitem_ds,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-07-01",
    qty_min: float = 48.0,
    buckets: int = 32,
):
    """TPC-H Q4-shaped EXISTS aggregate: orders in a date window having
    at least one large-quantity lineitem, counted per priority.

    The EXISTS subquery is a distributed SEMI hash join: the lineitem
    side is filtered and projected to ONE int64 column (its orderkey)
    before the all-to-all, so the shuffle moves 8 bytes per qualifying
    lineitem; the semi branch of :func:`hash_join` emits each matching
    order exactly once regardless of how many lineitems matched.
    """
    lo = pa.scalar(date_lo).cast(pa.timestamp("us"))
    hi = pa.scalar(date_hi).cast(pa.timestamp("us"))

    def orders_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), lo),
            pc.less(t.column("o_orderdate"), hi),
        )
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    def line_keys(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t.column("l_quantity"), pa.scalar(qty_min))
        return pa.table({"o_orderkey": t.filter(m).column("l_orderkey")})

    orders_f = orders_ds.map_batches(
        orders_prep, batch_format="pyarrow", zero_copy_batch=True
    )
    keys = lineitem_ds.map_batches(
        line_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    semi = hash_join(orders_f, keys, key="o_orderkey", how="semi",
                     buckets=buckets)
    # <= 5 priorities: per-block partial counts + the combiner tree
    from rayslog.stages.aggregate import counts_by

    return counts_by(semi, ["o_orderpriority"], alias="n_orders",
                     final="tree")


def customer_order_distribution(customer_ds, orders_ds, buckets: int = 32):
    """TPC-H Q13-shaped distribution: how many customers placed exactly
    k orders, INCLUDING the zero-order customers (the reason this is a
    LEFT join, not an aggregate over orders alone).

    Plan: per-batch partial counts collapse orders to one
    (custkey, n) row per customer per block, the combiner tree
    finishes the per-customer counts, and the LEFT task-exchange join
    against the customer keys fills in the zero-order customers; the
    final k-histogram is a tiny combiner-tree count.
    """
    from rayslog.stages.aggregate import counts_by, tree_reduce

    cust_keys = customer_ds.map_batches(
        lambda t: t.select(["c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["o_custkey"])
            .group_by(["o_custkey"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["c_custkey", "n_orders"])

    partials = orders_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["c_custkey"])
            .aggregate([("n_orders", "sum")])
            .rename_columns(["c_custkey", "n_orders"])
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        )

    # split_keys: per-customer cardinality is unbounded (grows with the
    # fleet) — past the threshold the tree hash-splits by custkey range
    # so the final combine never holds every customer in one task
    per_cust = tree_reduce(partials, reduce_fn, empty_fn=empty_fn,
                           split_keys=["c_custkey"])
    joined = hash_join(cust_keys, per_cust, key="c_custkey",
                       buckets=buckets, how="left")
    filled = joined.map_batches(
        lambda t: pa.table(
            {
                "c_count": pc.fill_null(
                    pc.cast(t.column("n_orders"), pa.int64()), 0
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return counts_by(filled, ["c_count"], alias="custdist", final="tree")


#: price bands for the range-join demo: [lo, hi) half-open, contiguous
PRICE_BANDS = [
    (0.0, 925.0, "budget"),
    (925.0, 950.0, "mid"),
    (950.0, 975.0, "premium"),
    (975.0, float("inf"), "luxury"),
]


def range_join_bands(ds, value_col: str, bands=None):
    """Range join against a small interval table (broadcast side).

    Each row joins the band whose [lo, hi) interval contains
    ``value_col``.  With a sorted, contiguous interval side the lookup is
    one vectorized ``searchsorted`` per batch; an overlapping interval
    side would emit one row per match (flat-map shape) with an interval
    index instead — same broadcast plan, the small side never shuffles.
    """
    import numpy as np

    bands = bands or PRICE_BANDS
    lows = np.array([b[0] for b in bands])
    names = np.array([b[2] for b in bands], dtype=object)

    # the interval side is a handful of rows — it ships inside the
    # task closure; a dedicated actor pool would re-pay cold start
    # every call (the enrich lesson) for zero broadcast benefit
    def bander(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lows, v, side="right") - 1
        idx = np.clip(idx, 0, len(names) - 1)
        return t.append_column("band", pa.array(names[idx], pa.string()))

    return ds.map_batches(
        bander, batch_format="pyarrow", zero_copy_batch=True
    )


# --------------------------------------------------------------------------
# round-4 additions: the remaining TPC-H-shaped join/aggregate families
# (promo ratio Q14, returned-item top-k Q10, large-quantity orders Q18,
# parts/supplier distinct Q16, idle-customer anti-join Q22, ship-latency
# date math).  All monetary math in integer cents (exact distributed
# sums, CLAUDE.md invariant #3); every wide step is the raw-task
# exchange / combiner tree, never a sort-shuffle.
# --------------------------------------------------------------------------


def _rev_cents2(t: pa.Table) -> pa.ChunkedArray:
    """price*(1-discount) in cents^2 — exact int64."""
    price_c = pc.round(
        pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))
    ).cast(pa.int64())
    disc_c = pc.round(
        pc.multiply(t.column("l_discount"), pa.scalar(100.0))
    ).cast(pa.int64())
    return pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))


def promo_revenue_cents(lineitem_ds, part_side,
                        date_from: str = "1996-09-01",
                        date_to: str = "1996-10-01",
                        promo_type: str = "PROMO"):
    """TPC-H Q14-shaped promo-revenue ratio for one ship month.

    ``part_side`` is either a small pandas frame (p_partkey, p_type) —
    the broadcast leg, dim ships once via ray.put — or a Dataset — the
    distributed ``hash_join`` leg for a part table too big to broadcast
    (callers auto-select on parquet row count, the regional_revenue
    pattern).  The global two-sum reduce rides the combiner tree; output
    is ONE row (promo_revenue, total_revenue, promo_pct)."""
    lo = pa.scalar(date_from).cast(pa.timestamp("us"))
    hi = pa.scalar(date_to).cast(pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), lo),
            pc.less(t.column("l_shipdate"), hi),
        )
        t = t.filter(mask)
        return pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "rev_c2": _rev_cents2(t),
            }
        )

    li = lineitem_ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    import pandas as pd

    if isinstance(part_side, pd.DataFrame):
        joined = broadcast_join(
            li, part_side, key="p_partkey", columns={"p_type": "p_type"}
        )
    else:
        joined = hash_join(
            li,
            part_side.map_batches(
                lambda t: t.select(["p_partkey", "p_type"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            key="p_partkey",
        )

    def partial(t: pa.Table) -> pa.Table:
        is_promo = pc.equal(t.column("p_type"), pa.scalar(promo_type))
        rev = t.column("rev_c2")
        promo = pc.if_else(is_promo, rev, pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "promo_c2": pa.array(
                    [pc.sum(promo).as_py() or 0], pa.int64()
                ),
                "total_c2": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            }
        )

    from rayslog.stages.aggregate import tree_reduce

    def reduce_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "promo_c2": pa.array(
                    [pc.sum(t.column("promo_c2")).as_py() or 0], pa.int64()
                ),
                "total_c2": pa.array(
                    [pc.sum(t.column("total_c2")).as_py() or 0], pa.int64()
                ),
            }
        )

    def final_fn(t: pa.Table) -> pa.Table:
        p = t.column("promo_c2")[0].as_py()
        tot = t.column("total_c2")[0].as_py()
        return pa.table(
            {
                "promo_revenue": pa.array([p / 10_000.0], pa.float64()),
                "total_revenue": pa.array([tot / 10_000.0], pa.float64()),
                "promo_pct": pa.array(
                    [100.0 * (p / tot) if tot else None], pa.float64()
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            final_fn(
                pa.table(
                    {
                        "promo_c2": pa.array([0], pa.int64()),
                        "total_c2": pa.array([0], pa.int64()),
                    }
                )
            )
        )

    return tree_reduce(
        joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def returned_item_revenue(lineitem_ds, orders_ds, customer_path: str,
                          nation_df, k: int = 20, parts: int = 64,
                          date_from: str = "1996-07-01",
                          date_to: str = "1996-10-01"):
    """TPC-H Q10-shaped: top-k customers by revenue on RETURNED items
    within one order quarter, with customer + nation names attached.

    Plan: per-block partial sums per orderkey on the filtered lineitem
    side (returnflag='R'), distributed ``hash_join`` with the
    date-filtered orders projection, per-custkey sums through the
    custkey-hash ``task_exchange``, global top-k via the combiner tree.
    Names attach on the FINAL k rows only — customer via a k-key
    filtered parquet read (O(k) driver memory), nation is a 25-row
    closure constant."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), pa.scalar("R")))
        return (
            pa.table(
                {"o_orderkey": t.column("l_orderkey"), "rev_c2": _rev_cents2(t)}
            )
            .group_by(["o_orderkey"])
            .aggregate([("rev_c2", "sum")])
            .rename_columns(["o_orderkey", "rev_c2"])
        )

    lo = pa.scalar(date_from).cast(pa.timestamp("us"))
    hi = pa.scalar(date_to).cast(pa.timestamp("us"))

    def o_prep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), lo),
            pc.less(t.column("o_orderdate"), hi),
        )
        return t.filter(mask).select(["o_orderkey", "o_custkey"])

    # join stays in ref-land: the per-bucket join outputs feed the
    # custkey exchange directly (pre_fn fusion) and the exchange's part
    # outputs feed the top-k tree — one executor spin total (the
    # ~0.2-0.5s-per-spin floor measured across r4 dominated the first
    # version of this query)
    joined = hash_join(
        lineitem_ds.map_batches(
            li_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        orders_ds.map_batches(
            o_prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="o_orderkey",
        return_refs=True,
    )

    def cust_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["o_custkey", "rev_c2"])
            .group_by(["o_custkey"])
            .aggregate([("rev_c2", "sum")])
            .rename_columns(["o_custkey", "rev_c2"])
        )
        u = g.column("o_custkey").to_numpy(zero_copy_only=False)
        return g.append_column(
            "cpart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "rev_c2": pa.array([], pa.int64()),
        }
    )

    def finish_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        return (
            t.group_by(["o_custkey"])
            .aggregate([("rev_c2", "sum")])
            .rename_columns(["o_custkey", "rev_c2"])
        )

    per_cust_refs = task_exchange(
        joined,
        "cpart",
        parts,
        finish_part,
        pre_fn=cust_partial,
        return_refs=True,
    )

    def topk(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("rev_c2", "descending"), ("o_custkey", "ascending")]
        ).slice(0, k)

    n_keys = pa.array(
        nation_df["n_nationkey"].astype("int64").tolist(), pa.int64()
    )
    n_names = pa.array(nation_df["n_name"].tolist(), pa.string())

    def final_fn(t: pa.Table) -> pa.Table:
        keys_l = t.column("o_custkey").to_pylist()
        import pandas as pd

        if not keys_l:
            sub = pd.DataFrame(
                {"c_custkey": [], "c_name": [], "c_nationkey": []}
            )
        else:
            import pyarrow.parquet as pq

            sub = pq.read_table(
                customer_path,
                columns=["c_custkey", "c_name", "c_nationkey"],
                filters=[("c_custkey", "in", keys_l)],
            ).to_pandas()
        ck = pa.array(sub["c_custkey"].tolist(), pa.int64())
        names = pa.array(sub["c_name"].tolist(), pa.string())
        nk = pa.array(sub["c_nationkey"].astype("int64").tolist(), pa.int64())
        idx = pc.index_in(pc.cast(t.column("o_custkey"), pa.int64()),
                          value_set=ck)
        nidx = pc.index_in(pc.take(nk, idx), value_set=n_keys)
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "revenue": pc.divide(
                    pc.cast(t.column("rev_c2"), pa.float64()), 10_000.0
                ),
                "c_name": pc.take(names, idx),
                "n_name": pc.take(n_names, nidx),
            }
        )

    import ray.data as rd

    from rayslog.stages.aggregate import tree_reduce_refs

    if not per_cust_refs:
        return rd.from_arrow(final_fn(_empty))
    return rd.from_arrow(
        tree_reduce_refs(per_cust_refs, topk, final_fn=final_fn)
    )


def large_orders(lineitem_ds, orders_ds, qty_threshold: int = 250,
                 k: int = 100, parts: int = 64):
    """TPC-H Q18-shaped: orders whose total lineitem quantity exceeds
    ``qty_threshold``, top-k by order price.

    Per-block partial qty sums per orderkey ride the orderkey-hash
    ``task_exchange``; the HAVING filter runs inside each part so only
    survivors (a ~1% fraction) reach the distributed ``hash_join``
    against orders — the survivor side stays in ref-land (no executor
    spin between exchange and join).  Global top-k via the combiner
    tree; ties broken by o_orderkey for a deterministic LIMIT."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce

    def li_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "o_orderkey": t.column("l_orderkey"),
                    "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                }
            )
            .group_by(["o_orderkey"])
            .aggregate([("qty", "sum")])
            .rename_columns(["o_orderkey", "qty"])
        )
        u = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        return g.append_column(
            "opart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "total_qty": pa.array([], pa.int64()),
        }
    )

    def finish_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = (
            t.group_by(["o_orderkey"])
            .aggregate([("qty", "sum")])
            .rename_columns(["o_orderkey", "total_qty"])
        )
        return g.filter(
            pc.greater(g.column("total_qty"),
                       pa.scalar(qty_threshold, pa.int64()))
        )

    survivors = task_exchange(
        lineitem_ds.map_batches(
            li_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "opart",
        parts,
        finish_part,
        return_refs=True,
    )

    def topk(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        ).slice(0, k)

    def final_fn(t: pa.Table) -> pa.Table:
        return t.select(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
             "total_qty"]
        )

    _empty_out = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_totalprice": pa.array([], pa.float64()),
            "total_qty": pa.array([], pa.int64()),
        }
    )

    import os

    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import tree_reduce, tree_reduce_refs

    o_proj = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]

    # auto-select the survivor leg (the dim-leg policy): the HAVING
    # filter usually keeps ~1% of orders — below the broadcast bound
    # the (orderkey, total_qty) pairs ship once via ray.put and orders
    # filters/joins in ONE pass (no all-orders exchange); past it the
    # distributed per-bucket hash join runs on the survivor refs.
    bmax = int(os.environ.get("RAYSLOG_BROADCAST_MAX_ROWS", 4_000_000))

    @ray.remote
    def _nrows(t):
        return t.num_rows

    n_surv = sum(ray.get([_nrows.remote(r) for r in survivors]))
    if n_surv == 0:
        return rd.from_arrow(_empty_out)
    if n_surv <= bmax:
        parts_t = [t for t in ray.get(survivors) if t.num_rows]
        surv = pa.concat_tables(parts_t).combine_chunks()
        ref = ray.put(
            (
                surv.column("o_orderkey").to_numpy(),
                surv.column("total_qty").to_numpy(),
            )
        )

        def attach(t: pa.Table) -> pa.Table:
            keys_a, qty_a = _cached_lookup(ref)
            idx = pc.index_in(t.column("o_orderkey"), value_set=keys_a)
            t = t.select(o_proj).append_column(
                "total_qty", pc.take(qty_a, idx)
            )
            return t.filter(pc.is_valid(t.column("total_qty")))

        return tree_reduce(
            orders_ds.map_batches(
                attach, batch_format="pyarrow", zero_copy_batch=True
            ),
            topk,
            empty_fn=lambda: rd.from_arrow(_empty_out),
            final_fn=final_fn,
        )

    # survivors (refs) -> per-bucket join outputs (refs) -> top-k tree
    jrefs = hash_join(
        survivors,
        orders_ds.map_batches(
            lambda t: t.select(o_proj),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        key="o_orderkey",
        return_refs=True,
    )
    return rd.from_arrow(tree_reduce_refs(jrefs, topk, final_fn=final_fn))


def brand_supplier_counts(lineitem_ds, part_df):
    """TPC-H Q16-shaped: distinct suppliers per (p_brand, p_size).

    part attrs broadcast once (ray.put via :func:`broadcast_join`);
    each batch dedupes its (brand, size, suppkey) triples with one
    Arrow group_by, and the global distinct rides the combiner tree
    (distinct is re-applicable).  Partitioning assumption: the global
    distinct triple set fits one task (bounded by |brand×size| × the
    per-cell supplier count — ~25×50×|suppliers| worst case; switch the
    final to the hash-shuffle pair plan past that, the
    distinct_count_by(final="shuffle") pattern)."""
    from rayslog.stages.aggregate import tree_reduce

    attached = broadcast_join(
        lineitem_ds.map_batches(
            lambda t: pa.table(
                {
                    "p_partkey": t.column("l_partkey"),
                    "l_suppkey": t.column("l_suppkey"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        part_df,
        key="p_partkey",
        columns={"p_brand": "p_brand", "p_size": "p_size"},
    )

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["p_brand", "p_size", "l_suppkey"])
            .group_by(["p_brand", "p_size", "l_suppkey"])
            .aggregate([])
        )

    def distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["p_brand", "p_size", "l_suppkey"]).aggregate([])

    def final_fn(t: pa.Table) -> pa.Table:
        g = (
            t.group_by(["p_brand", "p_size"])
            .aggregate([([], "count_all")])
            .rename_columns(["p_brand", "p_size", "supplier_cnt"])
        )
        return pa.table(
            {
                "p_brand": g.column("p_brand"),
                "p_size": pc.cast(g.column("p_size"), pa.int64()),
                "supplier_cnt": pc.cast(g.column("supplier_cnt"), pa.int64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "p_size": pa.array([], pa.int64()),
                    "supplier_cnt": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        attached.map_batches(
            lambda t: partial(t.select(["l_suppkey", "p_brand", "p_size"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        distinct,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def idle_customer_stats(customer_ds, orders_ds, buckets: int = 32,
                        since: str = "2000-01-01"):
    """TPC-H Q22-shaped: per-nation count + balance of customers whose
    account balance beats the positive-balance average AND who have no
    orders on/after ``since`` (every customer in the synthetic corpus
    has SOME order, so the idle window is what makes the anti-join
    non-vacuous).

    Two passes over a materialized 3-int-column customer projection
    (custkey, nationkey, balance cents — ~24 B/row, the pack-fusion
    pattern so the parquet read runs once): a combiner-tree scalar for
    the global threshold, then a distributed ANTI ``hash_join`` against
    the orders custkey projection (the exclusion side is every customer
    with orders — far too big to broadcast).  Balance sums in exact
    integer cents; the threshold division is the same IEEE double op on
    both the engine and DuckDB sides."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
                "bal_c": pc.round(
                    pc.multiply(t.column("c_acctbal"), pa.scalar(100.0))
                ).cast(pa.int64()),
            }
        )

    import ray

    from rayslog.stages.aggregate import live_block_refs, tree_reduce_refs

    cust = customer_ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    cust_refs = live_block_refs(cust)
    if not cust_refs:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "c_nationkey": pa.array([], pa.int64()),
                    "n_cust": pa.array([], pa.int64()),
                    "total_acctbal": pa.array([], pa.float64()),
                }
            )
        )

    def thresh_reduce(t: pa.Table) -> pa.Table:
        if "bal_c" in t.column_names:  # raw customer projection blocks
            pos = t.filter(
                pc.greater(t.column("bal_c"), pa.scalar(0, pa.int64()))
            )
            return pa.table(
                {
                    "sum_c": pa.array(
                        [pc.sum(pos.column("bal_c")).as_py() or 0], pa.int64()
                    ),
                    "n": pa.array([pos.num_rows], pa.int64()),
                }
            )
        return pa.table(
            {
                "sum_c": pa.array(
                    [pc.sum(t.column("sum_c")).as_py() or 0], pa.int64()
                ),
                "n": pa.array(
                    [pc.sum(t.column("n")).as_py() or 0], pa.int64()
                ),
            }
        )

    tr = tree_reduce_refs(cust_refs, thresh_reduce)
    n_pos = tr.column("n")[0].as_py()
    # same expression tree as the oracle: CAST(sum AS DOUBLE)/count
    thresh = float(tr.column("sum_c")[0].as_py()) / n_pos if n_pos else (
        float("inf")
    )

    @ray.remote
    def rich_part(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater(pc.cast(t.column("bal_c"), pa.float64()),
                       pa.scalar(thresh))
        )

    cut = pa.scalar(since).cast(pa.timestamp("us"))

    def recent_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("o_orderdate"), cut))
        return pa.table({"c_custkey": t.column("o_custkey")})

    idle = hash_join(
        [rich_part.remote(r) for r in cust_refs],
        orders_ds.map_batches(
            recent_orders, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="c_custkey",
        buckets=buckets,
        how="anti",
        return_refs=True,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        if "n_cust" not in t.column_names:  # raw anti-join blocks
            return (
                t.select(["c_nationkey", "bal_c"])
                .group_by(["c_nationkey"])
                .aggregate([("bal_c", "sum"), ([], "count_all")])
                .rename_columns(["c_nationkey", "bal_c", "n_cust"])
            )
        return (
            t.select(["c_nationkey", "bal_c", "n_cust"])
            .group_by(["c_nationkey"])
            .aggregate([("bal_c", "sum"), ("n_cust", "sum")])
            .rename_columns(["c_nationkey", "bal_c", "n_cust"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
                "n_cust": pc.cast(t.column("n_cust"), pa.int64()),
                "total_acctbal": pc.divide(
                    pc.cast(t.column("bal_c"), pa.float64()), 100.0
                ),
            }
        )

    import ray.data as rd

    # the anti-join bucket refs carry a full schema even when every
    # bucket is empty (a fully-serviced corpus), so the branching tree
    # reduces them to the typed zero-row final shape directly
    return rd.from_arrow(tree_reduce_refs(idle, reduce_fn, final_fn=final_fn))


def ship_latency_by_priority(orders_ds, lineitem_ds, buckets: int = 32):
    """Average order→ship latency in days per order priority.

    Distributed ``hash_join`` on orderkey (both sides big), then a
    per-priority (5-key domain) combiner-tree average over exact int64
    day sums.  Day arithmetic is day-number subtraction
    (floor(epoch/86400s), sign-safe — ~2.8k rows ship before their
    order date in the sandbox data), matching DuckDB's
    date_diff('day') on DATE-cast timestamps."""
    DAY_US = 86_400_000_000

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                # positive epochs: truncating int division == floor
                "oday": pc.divide(
                    t.column("o_orderdate").cast(pa.int64()),
                    pa.scalar(DAY_US, pa.int64()),
                ),
            }
        )

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "sday": pc.divide(
                    t.column("l_shipdate").cast(pa.int64()),
                    pa.scalar(DAY_US, pa.int64()),
                ),
            }
        )

    # join buckets stay in ref-land: one partial task per bucket, then
    # the combiner tree — no executor spins after the two input scans
    jrefs = hash_join(
        lineitem_ds.map_batches(
            l_prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        orders_ds.map_batches(
            o_prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="o_orderkey",
        buckets=buckets,
        return_refs=True,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.select(["o_orderpriority", "days", "n_items"])
            .group_by(["o_orderpriority"])
            .aggregate([("days", "sum"), ("n_items", "sum")])
            .rename_columns(["o_orderpriority", "days", "n_items"])
        )

    import numpy as np
    import ray

    # one partial task per join bucket (full bucket parallelism — a
    # branching first tree round would concat fanin raw buckets into
    # one task and serialize the aggregation; measured 2x slower)
    @ray.remote
    def partial_task(t: pa.Table) -> pa.Table:
        return reduce_fn(
            pa.table(
                {
                    "o_orderpriority": t.column("o_orderpriority"),
                    "days": pc.subtract(t.column("sday"), t.column("oday")),
                    "n_items": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "n_items": pc.cast(t.column("n_items"), pa.int64()),
                "avg_latency_days": pc.divide(
                    pc.cast(t.column("days"), pa.float64()),
                    pc.cast(t.column("n_items"), pa.float64()),
                ),
            }
        )

    import ray.data as rd

    from rayslog.stages.aggregate import tree_reduce_refs

    return rd.from_arrow(
        tree_reduce_refs(
            [partial_task.remote(r) for r in jrefs], reduce_fn,
            final_fn=final_fn,
        )
    )


def co_purchase_pairs(lineitem_ds, k: int = 50, parts: int = 64):
    """Market-basket co-occurrence: top-k unordered part pairs that
    appear together in the most orders.

    Two chained ref-land exchanges: (1) orderkey-hash parts expand each
    order's distinct item set into its C(n,2) pairs with one vectorized
    repeat/offset pass (no per-order Python) and pre-count pairs
    locally; (2) pair-hash parts finish each pair's GLOBAL count (the
    same pair occurs in many orders, i.e. many orderkey parts — top-k
    truncation before this co-location would drop pairs) and take the
    local top-k; the per-part top-ks merge through the combiner tree.
    Partitioning assumption: one pair part's distinct pairs fit a task
    — size ``parts`` to the catalog, or add a min-support filter in
    ``count_part`` for adversarial pair domains."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange, tree_reduce_refs

    def li_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        u = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        return g.append_column(
            "opart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "ppart": pa.array([], pa.int32()),
        }
    )

    def expand_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        # re-dedupe across blocks, then expand each order's sorted item
        # run into pairs: for a run of length n at offset s, pair i<j
        # maps to (repeat, tiled-offset) index arithmetic
        g = (
            t.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.r_[0, np.nonzero(ok[1:] != ok[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(ok)])
        # pairs per run: n*(n-1)/2; left index repeats (n-1, n-2, ...)
        n_pairs = lens * (lens - 1) // 2
        if n_pairs.sum() == 0:
            return _empty.select(["part_a", "part_b", "n_orders", "ppart"])
        # vectorized combination indices: for each run, left element i
        # repeats (n-1-i) times, right runs i+1..n-1
        reps = np.repeat(lens, lens) - (
            np.arange(lens.sum()) - np.repeat(starts, lens)
        ) - 1
        left_idx = np.repeat(np.arange(len(ok)), reps)
        seq = np.arange(reps.sum())
        right_idx = seq - np.repeat(np.cumsum(reps) - reps, reps) + left_idx + 1
        g2 = (
            pa.table(
                {
                    "part_a": pa.array(pk[left_idx]),
                    "part_b": pa.array(pk[right_idx]),
                }
            )
            .group_by(["part_a", "part_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["part_a", "part_b", "n_orders"])
        )
        # second exchange key: the same pair occurs in many ORDERS (=
        # many orderkey parts), so counts must co-locate by PAIR before
        # any top-k truncation
        a = g2.column("part_a").to_numpy(zero_copy_only=False)
        b = g2.column("part_b").to_numpy(zero_copy_only=False)
        mix = (
            a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + b.astype(np.uint64)
        )
        return g2.append_column(
            "ppart", pa.array((mix % np.uint64(parts)).astype(np.int32))
        )

    pair_partial_refs = task_exchange(
        lineitem_ds.map_batches(
            li_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "opart",
        parts,
        expand_part,
        return_refs=True,
    )

    def _topk(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [
                ("n_orders", "descending"),
                ("part_a", "ascending"),
                ("part_b", "ascending"),
            ]
        ).slice(0, k)

    def count_part(t: pa.Table) -> pa.Table:
        # one pair lives wholly in this part — full count, then the
        # LOCAL top-k (safe: the global top-k is the top-k of per-part
        # top-ks once counts are final)
        g = (
            t.select(["part_a", "part_b", "n_orders"])
            .group_by(["part_a", "part_b"])
            .aggregate([("n_orders", "sum")])
            .rename_columns(["part_a", "part_b", "n_orders"])
        )
        return _topk(g)

    pair_refs = task_exchange(
        pair_partial_refs, "ppart", parts, count_part, return_refs=True
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return _topk(t)

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part_a": pc.cast(t.column("part_a"), pa.int64()),
                "part_b": pc.cast(t.column("part_b"), pa.int64()),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
            }
        )

    import ray.data as rd

    if not pair_refs:
        return rd.from_arrow(_empty)
    return rd.from_arrow(
        tree_reduce_refs(pair_refs, reduce_fn, final_fn=final_fn)
    )


def _comb2_runs(ok, pk=None):
    """All within-run index pairs (i<j) of runs of ``ok`` (sorted),
    returned as (left_idx, right_idx) into the sorted arrays."""
    import numpy as np

    starts = np.r_[0, np.nonzero(ok[1:] != ok[:-1])[0] + 1]
    lens = np.diff(np.r_[starts, len(ok)])
    reps = np.repeat(lens, lens) - (
        np.arange(lens.sum()) - np.repeat(starts, lens)
    ) - 1
    left_idx = np.repeat(np.arange(len(ok)), reps)
    seq = np.arange(reps.sum())
    right_idx = seq - np.repeat(np.cumsum(reps) - reps, reps) + left_idx + 1
    return left_idx, right_idx


def _copurchase_edge_refs(lineitem_ds, parts: int):
    """Globally DISTINCT co-purchase edges (x<y, parts sharing an
    order), as task_exchange block refs partitioned by x-hash
    (``xpart`` column travels with the edges).  Two exchanges:
    orderkey-hash expands each order's distinct item set into pairs;
    edge-hash dedupes pairs globally."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    def li_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        u = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        return g.append_column(
            "opart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty_e = pa.table(
        {
            "x": pa.array([], pa.int64()),
            "y": pa.array([], pa.int64()),
            "epart": pa.array([], pa.int32()),
        }
    )

    def expand_edges(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_e
        g = (
            t.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([])
        )
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        li, ri = _comb2_runs(ok)
        if not len(li):
            return _empty_e
        x, y = pk[li], pk[ri]
        mix = (
            x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + y.astype(np.uint64)
        )
        return (
            pa.table(
                {
                    "x": pa.array(x),
                    "y": pa.array(y),
                    "epart": pa.array(
                        (mix % np.uint64(parts)).astype(np.int32)
                    ),
                }
            )
            .group_by(["x", "y", "epart"])
            .aggregate([])
        )

    pair_refs = task_exchange(
        lineitem_ds.map_batches(
            li_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "opart",
        parts,
        expand_edges,
        return_refs=True,
    )

    def distinct_edges(t: pa.Table) -> pa.Table:
        g = t.select(["x", "y"]).group_by(["x", "y"]).aggregate([])
        u = g.column("x").to_numpy(zero_copy_only=False)
        return g.append_column(
            "xpart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    return task_exchange(
        pair_refs, "epart", parts, distinct_edges, return_refs=True
    )


def page_rank_copurchase(
    lineitem_ds,
    iters: int = 3,
    scale: int = 10**12,
    parts: int = 64,
):
    """Integer fixed-point PageRank over the co-purchase graph — the
    iterative BSP graph shape beyond one-shot triangle counting.

    The spec IS integer arithmetic so distributed sums are
    order-independent and the DuckDB oracle (an unrolled per-iteration
    CTE, same trick as embed_kmeans's round-6 contract) matches
    hash-exact:

    - ``pr0(v) = scale // N`` for each of the N vertices;
    - per round: ``pr'(u) = (15*(scale//N))//100
      + (85 * Σ_{v~u} (pr(v)//deg(v))) // 100`` — damping 0.85 as
      exact integer 85/100 floors.

    Plan: the distinct edge set builds once (two exchanges, see
    :func:`_copurchase_edge_refs`) and its block refs are REUSED every
    round — no lineage re-execution.  Each round the driver
    precomputes the V-sized contribution vector ``pr // deg``,
    broadcasts it via ``ray.put``, and every edge block emits a
    V-sized partial in-sum (np.bincount with integer-valued float64
    weights — exact below 2^53, and Σpr ≤ scale = 10^12 keeps every
    partial far under that).  Partitioning assumption (kmeans/CC
    precedent): the V-sized model fits the driver — at 10^9+ vertices
    swap the model update for the distributed BSP min-label pattern in
    stages/cluster.py."""
    import numpy as np
    import ray
    import ray.data as rd

    edge_refs = _copurchase_edge_refs(lineitem_ds, parts)

    @ray.remote
    def deg_partial(t: pa.Table):
        vs = np.concatenate(
            [
                t.column("x").to_numpy(zero_copy_only=False),
                t.column("y").to_numpy(zero_copy_only=False),
            ]
        )
        uniq, cnt = np.unique(vs, return_counts=True)
        return uniq, cnt.astype(np.int64)

    pieces = ray.get([deg_partial.remote(r) for r in edge_refs])
    allv = np.concatenate([p[0] for p in pieces])
    allc = np.concatenate([p[1] for p in pieces])
    vkeys, inv = np.unique(allv, return_inverse=True)
    deg = np.zeros(len(vkeys), dtype=np.int64)
    np.add.at(deg, inv, allc)
    n_v = len(vkeys)
    if n_v == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "part_id": pa.array([], pa.int64()),
                    "pr_score": pa.array([], pa.int64()),
                }
            )
        )

    base = scale // n_v
    pr = np.full(n_v, base, dtype=np.int64)

    @ray.remote
    def in_sum_partial(t: pa.Table, model):
        keys, c = model
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        xi = np.searchsorted(keys, x)
        yi = np.searchsorted(keys, y)
        s = np.bincount(yi, weights=c[xi].astype(np.float64),
                        minlength=len(keys))
        s += np.bincount(xi, weights=c[yi].astype(np.float64),
                         minlength=len(keys))
        return s.astype(np.int64)

    for _ in range(iters):
        model_ref = ray.put((vkeys, pr // deg))
        partials = ray.get(
            [in_sum_partial.remote(r, model_ref) for r in edge_refs]
        )
        s = np.sum(partials, axis=0)
        pr = (15 * base) // 100 + (85 * s) // 100

    return rd.from_arrow(
        pa.table(
            {
                "part_id": pa.array(vkeys.astype(np.int64)),
                "pr_score": pa.array(pr),
            }
        )
    )


def triangle_count(lineitem_ds, parts: int = 64, buckets: int = 32,
                   plan: str | None = None):
    """Triangles in the co-purchase graph (parts that share an order =
    an edge): the graph-analytics shape beyond connected components.

    Plan (all ref-land, no executor spins after the input scan):
    (1) orderkey-hash exchange expands each order's distinct item set
    into edges (x<y) — the co_purchase expansion; (2) edge-hash
    exchange makes edges globally DISTINCT; (3) node-hash exchange
    groups each node's (larger) neighbors and expands every
    neighbor pair into a WEDGE — because edges are stored x<y, wedges
    generate only from each triangle's MINIMUM vertex, so each
    triangle is counted exactly once; (4) the closing-edge membership
    test auto-selects like a dim leg:

    - **broadcast** (edge count <= RAYSLOG_TRIANGLE_BROADCAST_MAX_EDGES,
      default 32M, and node ids < 2^31): the distinct edge set packs
      to one sorted uint64 key array shipped once via ``ray.put``
      (plasma-backed, read zero-copy by every wedge task), and each
      wedge part counts its closures LOCALLY with one searchsorted —
      the 49M-row wedge table never materializes or crosses an
      exchange (measured 4.1 -> 2.3s at sf0.1).
    - **semi** (bigger graphs, or ``plan="semi"`` /
      ``RAYSLOG_TRIANGLE_PLAN=semi``): a distributed SEMI
      ``hash_join`` of wedges against the edge set keeps the wedges
      whose closing edge exists (left multiplicity preserved — one
      matched wedge row per triangle), and the count fans in by ref.

    Partitioning assumptions: one node's adjacency fits a task
    (super-node wedges explode as d²/2 — salt or cap degree for
    power-law graphs), and one edge part fits a task."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import task_exchange

    edge_refs = _copurchase_edge_refs(lineitem_ds, parts)

    plan = plan or os.environ.get("RAYSLOG_TRIANGLE_PLAN") or "auto"
    max_edges = int(
        os.environ.get("RAYSLOG_TRIANGLE_BROADCAST_MAX_EDGES", 32_000_000)
    )

    @ray.remote
    def _pack(t):
        """(row count, max node id, packed (x<<32)|y keys or None)."""
        if not t.num_rows:
            return 0, 0, np.empty(0, dtype=np.uint64)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        mx = int(max(x.max(), y.max()))
        if mx >= 1 << 31:
            return t.num_rows, mx, None
        return (
            t.num_rows,
            mx,
            (x.astype(np.uint64) << np.uint64(32)) | y.astype(np.uint64),
        )

    use_bcast = False
    keys_ref = None
    if plan in ("auto", "broadcast"):
        packed = ray.get([_pack.remote(r) for r in edge_refs])
        n_edges = sum(p[0] for p in packed)
        if (
            all(p[2] is not None for p in packed)
            and (n_edges <= max_edges or plan == "broadcast")
        ):
            use_bcast = True
            keys = np.sort(
                np.concatenate([p[2] for p in packed])
                if packed
                else np.empty(0, dtype=np.uint64)
            )
            keys_ref = ray.put(keys)

    _empty_w = pa.table(
        {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())}
    )
    _empty_n = pa.table({"n": pa.array([], pa.int64())})

    def _wedge_pairs(t: pa.Table):
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        xs, ys = x[order], y[order]
        li, ri = _comb2_runs(xs)
        # wedge (b, c) with b<c — both neighbors of the (minimum)
        # vertex xs; the closing edge is stored as x=b, y=c
        return ys[li], ys[ri]

    if use_bcast:

        def count_closed(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return _empty_n
            b, c = _wedge_pairs(t)
            if not len(b):
                return _empty_n
            ks = ray.get(keys_ref)  # plasma-local after first touch
            if not len(ks):
                return _empty_n
            w = (b.astype(np.uint64) << np.uint64(32)) | c.astype(
                np.uint64
            )
            pos = np.searchsorted(ks, w)
            pos[pos == len(ks)] = 0
            hit = np.count_nonzero(ks[pos] == w)
            return pa.table({"n": pa.array([int(hit)], pa.int64())})

        count_refs = task_exchange(
            edge_refs, "xpart", parts, count_closed, return_refs=True
        )

        @ray.remote
        def _nsum(t):
            return (
                int(pc.sum(t.column("n")).as_py() or 0)
                if t.num_rows
                else 0
            )

        n = int(sum(ray.get([_nsum.remote(r) for r in count_refs])))
        return rd.from_arrow(
            pa.table({"n_triangles": pa.array([n], pa.int64())})
        )

    def wedges(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_w
        b, c = _wedge_pairs(t)
        if not len(b):
            return _empty_w
        return pa.table({"x": pa.array(b), "y": pa.array(c)})

    wedge_refs = task_exchange(
        edge_refs, "xpart", parts, wedges, return_refs=True
    )

    closed = hash_join(
        wedge_refs,
        [r for r in edge_refs],
        key=["x", "y"],
        buckets=buckets,
        how="semi",
        return_refs=True,
    )

    @ray.remote
    def _nrows(t):
        return t.num_rows

    n = int(sum(ray.get([_nrows.remote(r) for r in closed])))
    return rd.from_arrow(
        pa.table({"n_triangles": pa.array([n], pa.int64())})
    )


def min_cost_supplier(
    lineitem_ds,
    part_path: str,
    supplier_path: str,
    nation_df,
    size: int = 15,
):
    """TPC-H Q2-shaped cheapest-supplier-per-part: for every part of
    the given ``p_size``, the supplier offering the minimum lineitem
    price (ties broken by the smaller suppkey), with part / supplier /
    nation names attached.

    Plan: the qualifying partkey set loads via a size-FILTERED parquet
    read (O(|size-slice|) driver memory, ~2% of |part|) and ships once
    (``ray.put`` + per-process cache); each lineitem batch filters
    with one ``is_in`` and reduces to its local per-part min-(cents,
    suppkey) row; the global argmin rides the combiner tree (the
    min-tuple reduce is re-applicable).  Dim names attach on the FINAL
    result only via key-filtered parquet reads — no whole-dim driver
    load, no dim rows on the fan-in.  Partitioning assumption: one row
    per qualifying part fits one tree task (tree_reduce docstring);
    hash-split the tree by partkey range past ~10^8 qualifying parts.

    Reference shape: TPC-H Q2's min-supplycost join-back, re-expressed
    over lineitem prices since the corpus has no partsupp table.
    """
    import ray
    import pyarrow.parquet as pq

    from rayslog.stages.aggregate import _topk_reduce_fn, tree_reduce

    qpart = pq.read_table(
        part_path,
        columns=["p_partkey", "p_name"],
        filters=[("p_size", "==", size)],
    )
    keys_ref = ray.put(
        (qpart.column("p_partkey").to_numpy(zero_copy_only=False),)
    )

    def prep(t: pa.Table) -> pa.Table:
        (pk_set,) = _cached_arrays(keys_ref)
        t = t.filter(pc.is_in(t.column("l_partkey"), value_set=pk_set))
        cents = pc.round(
            pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "cents": cents,
                "l_suppkey": t.column("l_suppkey"),
            }
        )

    argmin = _topk_reduce_fn(
        "l_partkey", "cents", "l_suppkey", k=1, ascending=True
    )

    def final_fn(t: pa.Table) -> pa.Table:
        import pandas as pd

        sk = sorted(set(t.column("l_suppkey").to_pylist()))
        if sk:
            supp = pq.read_table(
                supplier_path,
                columns=["s_suppkey", "s_name", "s_nationkey"],
                filters=[("s_suppkey", "in", sk)],
            ).to_pandas()
        else:
            supp = pd.DataFrame(
                {"s_suppkey": pd.Series([], dtype="int64"),
                 "s_name": pd.Series([], dtype="object"),
                 "s_nationkey": pd.Series([], dtype="int64")}
            )
        supp = supp.merge(
            nation_df, left_on="s_nationkey", right_on="n_nationkey"
        )
        sidx = pc.index_in(
            t.column("l_suppkey"),
            value_set=pa.array(supp["s_suppkey"].tolist(), pa.int64()),
        )
        pidx = pc.index_in(
            t.column("l_partkey"),
            value_set=pc.cast(qpart.column("p_partkey"), pa.int64()),
        )
        return pa.table(
            {
                "p_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                "p_name": pc.take(qpart.column("p_name"), pidx),
                "min_cost": pc.divide(
                    pc.cast(t.column("cents"), pa.float64()), 100.0
                ),
                "s_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "s_name": pc.take(
                    pa.array(supp["s_name"].tolist(), pa.string()), sidx
                ),
                "n_name": pc.take(
                    pa.array(supp["n_name"].tolist(), pa.string()), sidx
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            final_fn(
                pa.table(
                    {
                        "l_partkey": pa.array([], pa.int64()),
                        "cents": pa.array([], pa.int64()),
                        "l_suppkey": pa.array([], pa.int64()),
                    }
                )
            )
        )

    return tree_reduce(
        lineitem_ds.map_batches(
            lambda t: argmin(prep(t)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        argmin,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def nation_market_share_cents(
    lineitem_ds,
    orders_ds,
    customer_df,
    supplier_df,
    nation_df,
    region_df,
    region_name: str = "EUROPE",
    target_nationkey: int = 3,
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    buckets: int = 32,
):
    """TPC-H Q8-shaped national market share: per order year, the
    fraction of revenue (orders from one region's customers) supplied
    by one target nation.

    Same join plan as :func:`regional_revenue_cents` (shared
    broadcast-vs-hash_join dim legs, one large-large orderkey
    exchange), but the supplier leg keeps ALL nations (the share's
    denominator) and the orders leg carries the order year.  Partials
    reduce to <= |years| rows of two int-cents^2 sums (target, total);
    the share divides the two exact ints in float64 once, on the final
    block — identical to the oracle's ``CAST(.. AS DOUBLE) /
    CAST(.. AS DOUBLE)``, so the comparison is hash-exact.
    """
    nat = nation_df.merge(
        region_df[region_df["r_name"] == region_name],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )
    region_nations = set(nat["n_nationkey"])
    all_nations = set(nation_df["n_nationkey"])

    lo = pa.scalar(date_lo).cast(pa.timestamp("us"))
    hi = pa.scalar(date_hi).cast(pa.timestamp("us"))
    orders_side = _orders_nation_side(
        orders_ds, customer_df, region_nations, lo, hi, buckets,
        with_year=True,
    )
    line_side = _line_nation_side(
        lineitem_ds, supplier_df, all_nations, buckets
    )
    joined = hash_join(line_side, orders_side, key="l_orderkey",
                       buckets=buckets)
    target = pa.scalar(target_nationkey, pa.int64())

    def partial(t: pa.Table) -> pa.Table:
        c2 = t.column("rev_c2")
        is_t = pc.equal(
            pc.cast(t.column("s_nationkey"), pa.int64()), target
        )
        return (
            pa.table(
                {
                    "o_year": t.column("o_year"),
                    "t_c2": pc.if_else(is_t, c2, pa.scalar(0, pa.int64())),
                    "c2": c2,
                }
            )
            .group_by(["o_year"])
            .aggregate([("t_c2", "sum"), ("c2", "sum")])
            .rename_columns(["o_year", "t_c2", "c2"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["o_year"])
            .aggregate([("t_c2", "sum"), ("c2", "sum")])
            .rename_columns(["o_year", "t_c2", "c2"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        tg = pc.cast(t.column("t_c2"), pa.float64())
        tot = pc.cast(t.column("c2"), pa.float64())
        return pa.table(
            {
                "o_year": pc.cast(t.column("o_year"), pa.int64()),
                "nation_revenue": pc.divide(tg, 10_000.0),
                "total_revenue": pc.divide(tot, 10_000.0),
                "mkt_share": pc.divide(tg, tot),
            }
        ).sort_by([("o_year", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "nation_revenue": pa.array([], pa.float64()),
                    "total_revenue": pa.array([], pa.float64()),
                    "mkt_share": pa.array([], pa.float64()),
                }
            )
        )

    from rayslog.stages.aggregate import tree_reduce

    return tree_reduce(
        joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def important_parts(lineitem_ds, num: int = 3, den: int = 4000):
    """TPC-H Q11-shaped "important stock": parts whose total revenue
    exceeds ``num/den`` of GLOBAL revenue (default 0.075% — 1.5x the
    mean share of the synthetic corpus's uniform part domain).

    One corpus scan: per-block grouped partials ride the combiner
    tree to one row per part; the global total and the threshold
    filter run on the final block only.  The threshold compare is
    EXACT integer arithmetic — ``part_c2 > (num*total)//den`` is
    equivalent to ``part_c2*den > num*total`` without overflow
    (Python-int threshold, int64 column compare) and matches the
    oracle's HUGEINT ``//`` spelling bit-for-bit.  Partitioning
    assumption: one row per part fits one tree task (tree_reduce
    docstring) — hash-split the tree past ~10^8 parts.
    """

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {"l_partkey": t.column("l_partkey"), "c2": _line_rev_c2(t)}
            )
            .group_by(["l_partkey"])
            .aggregate([("c2", "sum")])
            .rename_columns(["l_partkey", "c2"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["l_partkey"])
            .aggregate([("c2", "sum")])
            .rename_columns(["l_partkey", "c2"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        total = pc.sum(t.column("c2")).as_py() or 0
        thr = (num * total) // den
        t = t.filter(pc.greater(t.column("c2"), pa.scalar(thr, pa.int64())))
        c2 = pc.cast(t.column("c2"), pa.float64())
        return pa.table(
            {
                "p_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                "part_revenue": pc.divide(c2, 10_000.0),
                "rev_share": pc.divide(c2, float(total) or 1.0),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "part_revenue": pa.array([], pa.float64()),
                    "rev_share": pa.array([], pa.float64()),
                }
            )
        )

    from rayslog.stages.aggregate import tree_reduce

    return tree_reduce(
        lineitem_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def quantity_price_corr(lineitem_ds, part_side, buckets: int = 32):
    """Grouped Pearson correlation of (quantity, price) per part brand,
    from EXACT integer moments — the distributed-statistics shape.

    Per-batch partials sum six shifted-integer moments (n, Σx, Σy,
    Σxy, Σx², Σy²; x = qty-25, y = price_cents-5e6 — the shift buys
    ~4x int64 headroom and corr is shift-invariant) per brand; the
    <=|brands|-row partials collapse through the combiner tree, and
    the final block computes ``corr = (nΣxy-ΣxΣy) /
    sqrt((nΣx²-Σx²̂)(nΣy²-Σŷ²))`` in PYTHON ints (arbitrary
    precision) before one float64 division — the identical operation
    sequence as the oracle's HUGEINT arithmetic + CAST AS DOUBLE, so
    the comparison is hash-exact.  ``part_side``: pandas frame =
    broadcast leg, Dataset = distributed hash_join leg (callers
    auto-select on row count).  Documented bound: per-brand Σy² <
    2^63 holds to ~10^6 rows/brand; shift to decimal128 partials past
    that.
    """
    import math

    import pandas as pd

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "x": pc.subtract(
                    pc.round(t.column("l_quantity")).cast(pa.int64()),
                    pa.scalar(25, pa.int64()),
                ),
                "y": pc.subtract(
                    pc.round(
                        pc.multiply(
                            t.column("l_extendedprice"), pa.scalar(100.0)
                        )
                    ).cast(pa.int64()),
                    pa.scalar(5_000_000, pa.int64()),
                ),
            }
        )

    li = lineitem_ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    if isinstance(part_side, pd.DataFrame):
        joined = broadcast_join(
            li, part_side, key="p_partkey", columns={"p_brand": "p_brand"}
        )
    else:
        joined = hash_join(
            li,
            part_side.map_batches(
                lambda t: t.select(["p_partkey", "p_brand"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            key="p_partkey",
            buckets=buckets,
        )

    moment_cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        x, y = t.column("x"), t.column("y")
        return (
            pa.table(
                {
                    "p_brand": t.column("p_brand"),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "sx": x,
                    "sy": y,
                    "sxy": pc.multiply(x, y),
                    "sxx": pc.multiply(x, x),
                    "syy": pc.multiply(y, y),
                }
            )
            .group_by(["p_brand"])
            .aggregate([(c, "sum") for c in moment_cols])
            .rename_columns(["p_brand"] + moment_cols)
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["p_brand"])
            .aggregate([(c, "sum") for c in moment_cols])
            .rename_columns(["p_brand"] + moment_cols)
        )

    def final_fn(t: pa.Table) -> pa.Table:
        # Final formula runs ENTIRELY in float64 from int64-exact
        # moments, never through a >2^63 integer: DuckDB's HUGEINT →
        # DOUBLE cast is 1-ulp off past 2^63 (measured: n*syy ≈ 6.7e19
        # broke the hash), while BIGINT → DOUBLE and the subsequent
        # IEEE mul/sub/sqrt/div are bit-identical on both sides.
        n = t.column("n").to_pylist()
        sx = t.column("sx").to_pylist()
        sy = t.column("sy").to_pylist()
        sxy = t.column("sxy").to_pylist()
        sxx = t.column("sxx").to_pylist()
        syy = t.column("syy").to_pylist()
        corr = []
        for i in range(t.num_rows):
            num = float(n[i]) * float(sxy[i]) - float(sx[i]) * float(sy[i])
            d1 = float(n[i]) * float(sxx[i]) - float(sx[i]) * float(sx[i])
            d2 = float(n[i]) * float(syy[i]) - float(sy[i]) * float(sy[i])
            corr.append(
                num / math.sqrt(d1 * d2) if d1 > 0 and d2 > 0 else None
            )
        return pa.table(
            {
                "p_brand": t.column("p_brand"),
                "n": pc.cast(t.column("n"), pa.int64()),
                "corr_qty_price": pa.array(corr, pa.float64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "corr_qty_price": pa.array([], pa.float64()),
                }
            )
        )

    from rayslog.stages.aggregate import tree_reduce

    return tree_reduce(
        joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def co_purchase_degree(lineitem_ds, parts: int = 64):
    """Degree distribution of the co-purchase graph: how many parts
    have k distinct co-purchase neighbors — the graph-summary shape.

    Shares :func:`_copurchase_edge_refs` with page_rank /
    triangle_count (two exchanges: order-hash pair expansion,
    edge-hash global dedup); each distinct-edge block then stacks both
    endpoints and pre-counts, per-node degrees collapse through the
    combiner tree, and the final block group-counts degrees into the
    histogram.  Partitioning assumption: one row per graph node fits
    one tree task (the page_rank bound)."""
    import numpy as np

    from rayslog.stages.aggregate import tree_reduce_refs

    edge_refs = _copurchase_edge_refs(lineitem_ds, parts)

    def reduce_fn(t: pa.Table) -> pa.Table:
        if "x" in t.column_names:  # raw distinct-edge block(s)
            v = pa.chunked_array(
                [t.column("x").combine_chunks(),
                 t.column("y").combine_chunks()]
            )
            t = pa.table(
                {
                    "v": v,
                    "dg": pa.array(
                        np.ones(len(v), np.int64)
                    ),
                }
            )
        return (
            t.group_by(["v"])
            .aggregate([("dg", "sum")])
            .rename_columns(["v", "dg"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        h = (
            t.group_by(["dg"])
            .aggregate([([], "count_all")])
            .rename_columns(["degree", "n_nodes"])
        )
        return pa.table(
            {
                "degree": pc.cast(h.column("degree"), pa.int64()),
                "n_nodes": pc.cast(h.column("n_nodes"), pa.int64()),
            }
        )

    import ray.data as rd

    if not edge_refs:
        return rd.from_arrow(
            pa.table(
                {
                    "degree": pa.array([], pa.int64()),
                    "n_nodes": pa.array([], pa.int64()),
                }
            )
        )
    return rd.from_arrow(
        tree_reduce_refs(edge_refs, reduce_fn, final_fn=final_fn)
    )


def customer_spend_pctile(orders_ds, customer_side, parts: int = 64,
                          nation_parts: int = 32, buckets: int = 32):
    """PERCENT_RANK of each customer's total order spend within their
    nation — the distributed window-percentile shape.

    Two hash exchanges: (1) custkey-hash parts collapse per-batch
    partial sums to one exact-cents row per customer; (2) nation
    parts co-locate each nation's customers and compute
    ``(min_rank-1)/(n-1)`` with one vectorized lexsort + run-detect
    pass (ties share the min rank, matching SQL PERCENT_RANK).  The
    nation dim attaches between the exchanges (broadcast frame below
    the row threshold, distributed hash_join above).  Partitioning
    assumption: one nation's customers fit one part (the sessionize
    per-key bound) — salt by spend-band past ~10^8 customers/nation.

    Output stays distributed (one row per customer) — never collected
    driver-side.
    """
    import numpy as np
    import pandas as pd
    import ray

    from rayslog.stages.aggregate import task_exchange

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        g = (
            pa.table({"c_custkey": t.column("o_custkey"), "cents": cents})
            .group_by(["c_custkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["c_custkey", "cents"])
        )
        u = g.column("c_custkey").to_numpy(zero_copy_only=False)
        return g.append_column(
            "cpart",
            pa.array((u.astype(np.uint64) % np.uint64(parts)).astype(np.int32)),
        )

    _empty_s = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )

    def finish_cust(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_s
        return (
            t.group_by(["c_custkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["c_custkey", "cents"])
        )

    spend = task_exchange(
        orders_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "cpart",
        parts,
        finish_cust,
    )

    if isinstance(customer_side, pd.DataFrame):
        cust_ref = ray.put(
            (
                customer_side["c_custkey"].to_numpy(),
                customer_side["c_nationkey"].to_numpy(),
            )
        )

        def attach(t: pa.Table) -> pa.Table:
            keys, nks = _cached_lookup(cust_ref)
            idx = pc.index_in(t.column("c_custkey"), value_set=keys)
            out = t.append_column(
                "c_nationkey", pc.cast(pc.take(nks, idx), pa.int64())
            )
            return out.filter(pc.is_valid(out.column("c_nationkey")))

        attached = spend.map_batches(
            attach, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        attached = hash_join(
            spend,
            customer_side.map_batches(
                lambda t: pa.table(
                    {
                        "c_custkey": pc.cast(
                            t.column("c_custkey"), pa.int64()
                        ),
                        "c_nationkey": pc.cast(
                            t.column("c_nationkey"), pa.int64()
                        ),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            key="c_custkey",
            buckets=buckets,
        )

    def add_npart(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        return t.append_column(
            "npart",
            pa.array(
                (nk.astype(np.uint64) % np.uint64(nation_parts)).astype(
                    np.int32
                )
            ),
        )

    _empty_out = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c_nationkey": pa.array([], pa.int64()),
            "spend": pa.array([], pa.float64()),
            "pctile": pa.array([], pa.float64()),
        }
    )

    def rank_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_out
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, cents, nk))
        nk_s, c_s, ck_s = nk[order], cents[order], ck[order]
        n = len(order)
        idx = np.arange(n, dtype=np.int64)
        new_n = np.r_[True, nk_s[1:] != nk_s[:-1]]
        starts = np.nonzero(new_n)[0]
        lens = np.diff(np.r_[starts, n])
        grp_start = np.repeat(starts, lens)
        sizes = np.repeat(lens, lens)
        new_v = new_n | np.r_[True, c_s[1:] != c_s[:-1]]
        val_start = np.maximum.accumulate(np.where(new_v, idx, -1))
        rank = val_start - grp_start + 1
        pct = np.where(
            sizes > 1,
            (rank - 1).astype(np.float64)
            / np.maximum(sizes - 1, 1).astype(np.float64),
            0.0,
        )
        return pa.table(
            {
                "c_custkey": pa.array(ck_s),
                "c_nationkey": pa.array(nk_s),
                "spend": pa.array(c_s.astype(np.float64) / 100.0),
                "pctile": pa.array(pct),
            }
        )

    return task_exchange(
        attached.map_batches(
            add_npart, batch_format="pyarrow", zero_copy_batch=True
        ),
        "npart",
        nation_parts,
        rank_part,
    )


def product_profit(
    lineitem_ds,
    orders_ds,
    part_side,
    supplier_side,
    nation_df,
    name_like: str = "red",
    buckets: int = 32,
):
    """TPC-H Q9-shaped product profit: for parts whose name contains
    ``name_like``, the per-(nation, order-year) profit
    ``sum(extendedprice*(1-discount) - retailprice*quantity)`` —
    retail price stands in for the reference schema's supply cost
    (this corpus has no partsupp table).

    Join plan: the part leg (filtered by the name substring, carrying
    retail cents) and the supplier leg (nation key) attach to lineitem
    first — broadcast lookups below the row threshold, distributed
    ``hash_join`` legs above — then ONE large-large orderkey exchange
    brings in the order year, and per-block grouped partials (<=
    |nations|x|years| rows each) ride the combiner tree.  Profit is
    EXACT integer 1e-4-dollar units per row (cents x cents-scale
    quantity), so partial sums are order-independent (CLAUDE.md
    invariant #3); the single float division happens once on the
    final block, matching the oracle's spelling bit-for-bit.
    """
    import numpy as np
    import pandas as pd
    import ray

    from rayslog.stages.aggregate import tree_reduce

    def _profit_c4(t: pa.Table, retail_c: pa.Array) -> pa.Array:
        qty_c = pc.round(
            pc.multiply(t.column("l_quantity"), pa.scalar(100.0))
        ).cast(pa.int64())
        return pc.subtract(
            _line_rev_c2(t), pc.multiply(pc.cast(retail_c, pa.int64()), qty_c)
        )

    # --- part leg: (l_partkey -> retail_c), filtered by name ---
    if isinstance(part_side, pd.DataFrame):
        kept = part_side[part_side["p_name"].str.contains(name_like)]
        part_ref = ray.put(
            (
                kept["p_partkey"].to_numpy(),
                np.round(kept["p_retailprice"].to_numpy() * 100.0).astype(
                    np.int64
                ),
            )
        )

        def line_with_part(t: pa.Table) -> pa.Table:
            keys, retc = _cached_lookup(part_ref)
            idx = pc.index_in(t.column("l_partkey"), value_set=keys)
            rc = pc.take(retc, idx)
            out = pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "l_suppkey": t.column("l_suppkey"),
                    "profit_c4": _profit_c4(t, rc),
                }
            )
            return out.filter(pc.is_valid(out.column("profit_c4")))

        line = lineitem_ds.map_batches(
            line_with_part, batch_format="pyarrow", zero_copy_batch=True
        )
    else:

        def part_proj(t: pa.Table) -> pa.Table:
            t = t.filter(pc.match_substring(t.column("p_name"), name_like))
            return pa.table(
                {
                    "l_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                    "retail_c": pc.round(
                        pc.multiply(
                            t.column("p_retailprice"), pa.scalar(100.0)
                        )
                    ).cast(pa.int64()),
                }
            )

        def line_proj(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                    "l_orderkey": t.column("l_orderkey"),
                    "l_suppkey": t.column("l_suppkey"),
                    "rev_c2": _line_rev_c2(t),
                    "qty_c": pc.round(
                        pc.multiply(t.column("l_quantity"), pa.scalar(100.0))
                    ).cast(pa.int64()),
                }
            )

        joined = hash_join(
            lineitem_ds.map_batches(
                line_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            part_side.map_batches(
                part_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            key="l_partkey",
            buckets=buckets,
        )

        def fold_profit(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "l_suppkey": t.column("l_suppkey"),
                    "profit_c4": pc.subtract(
                        t.column("rev_c2"),
                        pc.multiply(t.column("retail_c"), t.column("qty_c")),
                    ),
                }
            )

        line = joined.map_batches(
            fold_profit, batch_format="pyarrow", zero_copy_batch=True
        )

    # --- supplier leg: s_suppkey -> s_nationkey ---
    if isinstance(supplier_side, pd.DataFrame):
        supp_ref = ray.put(
            (
                supplier_side["s_suppkey"].to_numpy(),
                supplier_side["s_nationkey"].to_numpy(),
            )
        )

        def attach_nation(t: pa.Table) -> pa.Table:
            keys, nks = _cached_lookup(supp_ref)
            idx = pc.index_in(t.column("l_suppkey"), value_set=keys)
            out = pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "s_nationkey": pc.cast(pc.take(nks, idx), pa.int64()),
                    "profit_c4": t.column("profit_c4"),
                }
            )
            return out.filter(pc.is_valid(out.column("s_nationkey")))

        line = line.map_batches(
            attach_nation, batch_format="pyarrow", zero_copy_batch=True
        )
    else:

        def supp_proj(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
                    "s_nationkey": pc.cast(
                        t.column("s_nationkey"), pa.int64()
                    ),
                }
            )

        def line_key(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                    "l_orderkey": t.column("l_orderkey"),
                    "profit_c4": t.column("profit_c4"),
                }
            )

        line = hash_join(
            line.map_batches(
                line_key, batch_format="pyarrow", zero_copy_batch=True
            ),
            supplier_side.map_batches(
                supp_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            key="l_suppkey",
            buckets=buckets,
        )

    # --- orders year side: one large-large orderkey exchange ---
    def orders_proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_year": pc.cast(
                    pc.year(t.column("o_orderdate")), pa.int64()
                ),
            }
        )

    def line_ok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
                "s_nationkey": t.column("s_nationkey"),
                "profit_c4": t.column("profit_c4"),
            }
        )

    joined = hash_join(
        line.map_batches(
            line_ok, batch_format="pyarrow", zero_copy_batch=True
        ),
        orders_ds.map_batches(
            orders_proj, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="l_orderkey",
        buckets=buckets,
    )

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "s_nationkey": t.column("s_nationkey"),
                    "o_year": t.column("o_year"),
                    "profit_c4": t.column("profit_c4"),
                }
            )
            .group_by(["s_nationkey", "o_year"])
            .aggregate([("profit_c4", "sum")])
            .rename_columns(["s_nationkey", "o_year", "profit_c4"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["s_nationkey", "o_year"])
            .aggregate([("profit_c4", "sum")])
            .rename_columns(["s_nationkey", "o_year", "profit_c4"])
        )

    n_keys = nation_df["n_nationkey"].to_numpy()
    n_names = nation_df["n_name"].to_numpy()

    def final_fn(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t.column("s_nationkey"), pa.int64()),
            value_set=pa.array(n_keys, pa.int64()),
        )
        name = pc.take(pa.array(n_names, pa.string()), idx)
        return pa.table(
            {
                "nation": name,
                "o_year": pc.cast(t.column("o_year"), pa.int64()),
                "profit": pc.divide(
                    pc.cast(t.column("profit_c4"), pa.float64()), 10_000.0
                ),
            }
        ).sort_by([("nation", "ascending"), ("o_year", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "nation": pa.array([], pa.string()),
                    "o_year": pa.array([], pa.int64()),
                    "profit": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def top_supplier(
    lineitem_ds,
    supplier_path: str | None = None,
    supplier_df=None,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
):
    """TPC-H Q15-shaped top supplier: the supplier(s) whose revenue over
    one ship-date quarter equals the GLOBAL maximum (tie-aware — every
    max row survives, like the reference query's ``= (SELECT max)``).

    One corpus scan: the date filter and per-block grouped partials run
    inside ``map_batches``; the combiner tree reduces to one exact-cents
    row per supplier, and the max + tie filter runs on the final block
    only.  Names attach to the surviving rows via a k-key filtered
    parquet read (O(ties) driver memory, row-group pruned) — never a
    whole-dim load.  Partitioning assumption: one row per supplier fits
    the final tree task (important_parts discipline).
    """
    from rayslog.stages.aggregate import tree_reduce

    lo = pa.scalar(date_lo).cast(pa.timestamp("us"))
    hi = pa.scalar(date_hi).cast(pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate")
        t = t.filter(
            pc.and_(pc.greater_equal(sd, lo), pc.less(sd, hi))
        )
        return (
            pa.table(
                {"s_suppkey": t.column("l_suppkey"), "c2": _line_rev_c2(t)}
            )
            .group_by(["s_suppkey"])
            .aggregate([("c2", "sum")])
            .rename_columns(["s_suppkey", "c2"])
        )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["s_suppkey"])
            .aggregate([("c2", "sum")])
            .rename_columns(["s_suppkey", "c2"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        mx = pc.max(t.column("c2"))
        t = t.filter(pc.equal(t.column("c2"), mx))
        keys_l = t.column("s_suppkey").to_pylist()
        if supplier_df is not None:
            sub = supplier_df[supplier_df["s_suppkey"].isin(keys_l)]
        else:
            import pyarrow.parquet as pq

            sub = pq.read_table(
                supplier_path,
                columns=["s_suppkey", "s_name"],
                filters=[("s_suppkey", "in", keys_l)],
            ).to_pandas()
        sk = pa.array(sub["s_suppkey"].tolist(), pa.int64())
        names = pa.array(sub["s_name"].tolist(), pa.string())
        idx = pc.index_in(
            pc.cast(t.column("s_suppkey"), pa.int64()), value_set=sk
        )
        return pa.table(
            {
                "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
                "s_name": pc.take(names, idx),
                "total_revenue": pc.divide(
                    pc.cast(t.column("c2"), pa.float64()), 10_000.0
                ),
            }
        ).sort_by([("s_suppkey", "ascending")])

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "s_name": pa.array([], pa.string()),
                    "total_revenue": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        lineitem_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        reduce_fn,
        empty_fn=empty_fn,
        final_fn=final_fn,
    )


def customers_per_supplier(lineitem_ds, orders_ds, buckets: int = 32):
    """Distinct customers served per supplier — the two-hop
    (lineitem -> orders) reach count.  One orderkey hash exchange
    joins the two large sides, then :func:`distinct_count_by` dedupes
    (supplier, customer) pairs per batch before anything global moves
    (its combiner-tree final; switch final="shuffle" past ~10^8
    distinct pairs)."""
    from rayslog.stages.aggregate import distinct_count_by

    joined = hash_join(
        lineitem_ds.map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
                    "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        orders_ds.map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                    "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        key="l_orderkey",
        buckets=buckets,
    )
    return distinct_count_by(
        joined, "l_suppkey", "o_custkey", alias="n_customers"
    ).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "n_customers": pc.cast(t.column("n_customers"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def full_coverage_suppliers(
    lineitem_ds, orders_ds, customer_side, nation_df, n_regions: int,
    buckets: int = 32,
):
    """Relational-division shape (TPC-H has no direct analogue):
    suppliers whose shipments reached customers in ALL ``n_regions``
    regions.  lineitem joins orders on one orderkey exchange, the
    customer leg auto-selects broadcast vs hash_join, nation->region
    is a 25-row constant lookup, and the (supplier, region) distinct
    count rides :func:`distinct_count_by`'s combiner tree; the
    ``= n_regions`` division filter runs on the final tiny table.
    """
    import pandas as pd
    import ray

    from rayslog.stages.aggregate import distinct_count_by

    joined = hash_join(
        lineitem_ds.map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
                    "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        orders_ds.map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                    "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        key="l_orderkey",
        buckets=buckets,
    )

    nk = nation_df["n_nationkey"].to_numpy()
    nr = nation_df["n_regionkey"].to_numpy()

    if isinstance(customer_side, pd.DataFrame):
        # customer nation -> region folded driver-side: the broadcast
        # carries (custkey -> regionkey) directly
        cr = customer_side.merge(
            pd.DataFrame({"c_nationkey": nk, "r_regionkey": nr}),
            on="c_nationkey",
        )
        cust_ref = ray.put(
            (cr["c_custkey"].to_numpy(), cr["r_regionkey"].to_numpy())
        )

        def attach_region(t: pa.Table) -> pa.Table:
            keys, regs = _cached_lookup(cust_ref)
            idx = pc.index_in(t.column("o_custkey"), value_set=keys)
            out = pa.table(
                {
                    "l_suppkey": t.column("l_suppkey"),
                    "r_regionkey": pc.cast(pc.take(regs, idx), pa.int64()),
                }
            )
            return out.filter(pc.is_valid(out.column("r_regionkey")))

        pairs = joined.map_batches(
            attach_region, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        nk_a = pa.array(nk.astype("int64"))
        nr_a = pa.array(nr.astype("int64"))

        def cust_proj(t: pa.Table) -> pa.Table:
            idx = pc.index_in(
                pc.cast(t.column("c_nationkey"), pa.int64()), value_set=nk_a
            )
            return pa.table(
                {
                    "o_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                    "r_regionkey": pc.take(nr_a, idx),
                }
            )

        pairs = hash_join(
            joined,
            customer_side.map_batches(
                cust_proj, batch_format="pyarrow", zero_copy_batch=True
            ),
            key="o_custkey",
            buckets=buckets,
        ).map_batches(
            lambda t: t.select(["l_suppkey", "r_regionkey"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    counted = distinct_count_by(
        pairs, "l_suppkey", "r_regionkey", alias="n_regions"
    )

    def division(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.equal(
                pc.cast(t.column("n_regions"), pa.int64()),
                pa.scalar(n_regions, pa.int64()),
            )
        )
        return pa.table(
            {
                "s_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "n_regions": pc.cast(t.column("n_regions"), pa.int64()),
            }
        )

    return counted.map_batches(
        division, batch_format="pyarrow", zero_copy_batch=True
    )


def part_skyline(part_ds, parts: int = 32):
    """Per-brand Pareto frontier (multi-criteria dominance filter): the
    parts not dominated within their brand on (size, retail price) —
    B dominates A when both criteria are <= and at least one is
    strict.  One brand-hash exchange co-locates each brand, then a
    vectorized sort + per-size-group min + strict prefix-min pass
    finds survivors (equal (size, price) duplicates never dominate
    each other, matching the oracle's NOT EXISTS).  Price compares in
    exact integer cents."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange
    from rayslog.kernels.texthash import col_hash64

    def prep(t: pa.Table) -> pa.Table:
        b = t.column("p_brand")
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        h = col_hash64(b)
        return pa.table(
            {
                "p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                "p_brand": b,
                "p_size": pc.cast(t.column("p_size"), pa.int64()),
                "price_c": pc.round(
                    pc.multiply(t.column("p_retailprice"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "bpart": pa.array(
                    (h % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    _empty = pa.table(
        {
            "p_partkey": pa.array([], pa.int64()),
            "p_brand": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64()),
            "p_retailprice": pa.array([], pa.float64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        import pandas as pd

        bcodes = pd.factorize(t.column("p_brand").to_pandas())[0]
        sz = t.column("p_size").to_numpy(zero_copy_only=False)
        pr = t.column("price_c").to_numpy(zero_copy_only=False)
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, pr, sz, bcodes))
        b_s, s_s, p_s = bcodes[order], sz[order], pr[order]
        n = len(order)
        new_brand = np.r_[True, b_s[1:] != b_s[:-1]]
        new_size = new_brand | np.r_[True, s_s[1:] != s_s[:-1]]
        # min price per (brand, size) group == first price in the sorted
        # group; broadcast to rows
        starts = np.nonzero(new_size)[0]
        lens = np.diff(np.r_[starts, n])
        minp = np.repeat(p_s[starts], lens)
        # strict prefix min over SMALLER sizes within the brand: the
        # group-min sequence cummin'd, shifted by one size-group
        gmin = p_s[starts]  # one per size group (sorted asc by size)
        g_brand_start = new_brand[starts]
        prev = np.empty(len(starts), dtype=np.int64)
        run_min = 0
        BIG = np.iinfo(np.int64).max
        for i in range(len(starts)):  # O(#size-groups) tiny loop
            if g_brand_start[i]:
                run_min = BIG
            prev[i] = run_min
            run_min = min(run_min, gmin[i])
        prev_r = np.repeat(prev, lens)
        survive = (p_s == minp) & (p_s < prev_r)
        keep = order[survive]
        kt = t.take(pa.array(keep))
        out = pa.table(
            {
                "p_partkey": kt.column("p_partkey"),
                "p_brand": kt.column("p_brand"),
                "p_size": kt.column("p_size"),
                "p_retailprice": pc.divide(
                    pc.cast(kt.column("price_c"), pa.float64()), 100.0
                ),
            }
        )
        return out

    return task_exchange(
        part_ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True),
        "bpart",
        parts,
        per_part,
    )


def order_value_deciles(orders_ds, k: int = 10, parts: int = 64,
                        price_upper_c: int = 50_000_000):
    """Global NTILE(k) over orders by (total price, orderkey) — the
    distributed global-window shape, built on the shuffle_shards
    rank discipline: contiguous price-range parts (monotone band id,
    so parts concatenate in global order), per-part counts through a
    ref-level combiner tree, driver-side exclusive offsets (one int
    per part, never per row), then one exchange pass assigns exact
    global ranks and DuckDB's NTILE bucket sizes (first n%k buckets
    get one extra row).  ``price_upper_c`` only balances the bands —
    correctness needs monotonicity, not the bound (values above it
    clamp into the last band).  Returns (decile, n_orders, revenue).
    """
    import numpy as np

    def keyed(t: pa.Table) -> pa.Table:
        c = pc.round(
            pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        cn = c.to_numpy(zero_copy_only=False)
        band = np.minimum(
            cn * parts // price_upper_c, parts - 1
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "c": c,
                "part": pa.array(band),
            }
        )

    keys = orders_ds.map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("decile", "ascending")])
        return pa.table(
            {
                "decile": pc.cast(t.column("decile"), pa.int64()),
                "n_orders": pc.cast(t.column("n_rows"), pa.int64()),
                "revenue": pc.divide(
                    pc.cast(t.column("val_c"), pa.float64()), 100.0
                ),
            }
        )

    empty_out = pa.table(
        {
            "decile": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
        }
    )
    return _global_ntile_tree(
        keys, "o_orderkey", k, parts, final_fn, empty_out
    )


def _global_ntile_tree(keys, id_col: str, k: int, parts: int,
                       final_fn, empty_out: pa.Table):
    """Shared NTILE(k) machinery over a MATERIALIZED keys dataset with
    columns (``id_col``, c, part): ref-tree per-part counts ->
    driver-side exclusive offsets (one int per part) -> one exchange
    assigning exact global ranks by (c, id) and DuckDB's bucket sizes
    (first n%k buckets one row bigger) -> grouped (decile, n_rows,
    val_c) partials through the combiner tree -> caller's final_fn."""
    import numpy as np
    import ray
    import ray.data as rd

    from rayslog.stages.aggregate import (
        live_block_refs,
        task_exchange,
        tree_reduce,
        tree_reduce_refs,
    )

    refs = live_block_refs(keys)

    def part_counts(t: pa.Table) -> pa.Table:
        if "n" in t.column_names:
            g = t.group_by(["part"]).aggregate([("n", "sum")])
        else:
            g = t.select(["part", "c"]).group_by(["part"]).aggregate(
                [("c", "count")]
            )
        return g.rename_columns(["part", "n"])

    _empty = pa.table(
        {
            "decile": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "val_c": pa.array([], pa.int64()),
        }
    )

    if not refs:
        return rd.from_arrow(empty_out)

    totals = tree_reduce_refs(refs, part_counts).to_pandas()
    totals = totals.sort_values("part").reset_index(drop=True)
    n_total = int(totals["n"].sum())
    offs = dict(
        zip(
            totals["part"],
            np.r_[0, np.cumsum(totals["n"].to_numpy())[:-1]],
        )
    )
    offs_ref = ray.put(offs)

    base, rem = divmod(n_total, k)

    def assign(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        offs_l = ray.get(offs_ref)
        ok = t.column(id_col).to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        part0 = int(t.column("part")[0].as_py())
        order = np.lexsort((ok, c))
        start = int(offs_l[part0])
        rank = np.empty(len(ok), dtype=np.int64)
        rank[order] = start + np.arange(len(ok), dtype=np.int64)
        if base == 0:
            tile = rank + 1
        else:
            cut = rem * (base + 1)
            tile = np.where(
                rank < cut,
                rank // (base + 1) + 1,
                rem + (rank - cut) // base + 1,
            )
        return (
            pa.table(
                {
                    "decile": pa.array(tile.astype(np.int64)),
                    "n_rows": pa.array(np.ones(len(ok), dtype=np.int64)),
                    "val_c": pa.array(c),
                }
            )
            .group_by(["decile"])
            .aggregate([("n_rows", "sum"), ("val_c", "sum")])
            .rename_columns(["decile", "n_rows", "val_c"])
        )

    partials = task_exchange(keys, "part", parts, assign,
                             drop_part_col=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["decile"])
            .aggregate([("n_rows", "sum"), ("val_c", "sum")])
            .rename_columns(["decile", "n_rows", "val_c"])
        )

    def empty_fn():
        return rd.from_arrow(final_fn(_empty))

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def customer_spend_deciles(orders_ds, k: int = 10, cust_parts: int = 64,
                           parts: int = 64,
                           spend_upper_c: int = 2_000_000_000):
    """NTILE(k) of customers by total spend, with each decile's revenue
    SHARE — the Pareto/concentration report ("what fraction of revenue
    do the top 10% of customers carry").  One custkey exchange reduces
    orders to exact-cents per-customer rows; the shared
    :func:`_global_ntile_tree` rank machinery assigns deciles; the
    share divides each decile's exact cents by the grand total on the
    final block only (same double division the oracle spells)."""
    import numpy as np

    from rayslog.stages.aggregate import task_exchange

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.round(
            pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
        ).cast(pa.int64())
        g = (
            pa.table({"c_custkey": t.column("o_custkey"), "c": cents})
            .group_by(["c_custkey"])
            .aggregate([("c", "sum")])
            .rename_columns(["c_custkey", "c"])
        )
        u = g.column("c_custkey").to_numpy(zero_copy_only=False)
        return g.append_column(
            "cpart",
            pa.array((u.astype(np.uint64) % np.uint64(cust_parts)).astype(
                np.int32
            )),
        )

    _empty_s = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        }
    )

    def finish_cust(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty_s
        g = (
            t.group_by(["c_custkey"])
            .aggregate([("c", "sum")])
            .rename_columns(["c_custkey", "c"])
        )
        cn = g.column("c").to_numpy(zero_copy_only=False)
        band = np.minimum(
            cn * parts // spend_upper_c, parts - 1
        ).astype(np.int64)
        return g.append_column("part", pa.array(band))

    keys = task_exchange(
        orders_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "cpart",
        cust_parts,
        finish_cust,
    ).materialize()

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("decile", "ascending")])
        total = pc.sum(t.column("val_c")).as_py() or 0
        rev = pc.cast(t.column("val_c"), pa.float64())
        return pa.table(
            {
                "decile": pc.cast(t.column("decile"), pa.int64()),
                "n_customers": pc.cast(t.column("n_rows"), pa.int64()),
                "revenue": pc.divide(rev, 100.0),
                "rev_share": pc.divide(
                    rev, pa.scalar(float(total), pa.float64())
                ),
            }
        )

    empty_out = pa.table(
        {
            "decile": pa.array([], pa.int64()),
            "n_customers": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
            "rev_share": pa.array([], pa.float64()),
        }
    )
    return _global_ntile_tree(
        keys, "c_custkey", k, parts, final_fn, empty_out
    )
