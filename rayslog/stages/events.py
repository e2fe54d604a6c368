"""Stream-shaped operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

Ray Data is a batch engine with no watermarks; windowing follows the
ordered-partitioned-log pattern: partition by key, sort within the
group, window with pandas (guide: "Streaming-shaped workloads").

- tumbling window counts: pure vectorized bucketing (no per-group sort
  needed) + per-batch combiner + the raw-task combiner tree — scales
  like any aggregate.
- session windows: one user-hash ``task_exchange`` with a vectorized
  multi-user run-detection pass per part (any user-id type — see
  ``_user_hash``).  Partitioning assumption: one PART's events fit a
  task; a single pathological user takes ``sessionize_partitioned``
  (time-chunk split + stitch, both phases ref-land raw tasks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from rayslog.stages.aggregate import counts_by

US = 1_000_000


def _user_hash(col) -> np.ndarray:
    """Avalanched uint64 hash of a user-id column of ANY key type
    (int, string, ...) — the composite-key replacement for the retired
    ``_uc_key`` bit pack and its 2^42-user / 2^21-chunk range caps.
    Carry joins now run on the (user_id, chunk) tuple directly via
    ``hash_join(key=[...])``."""
    from rayslog.kernels.texthash import col_hash64

    return col_hash64(col)


def _take_col(col, idx: np.ndarray):
    """Arrow take preserving the column's exact type (int or string)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.take(pa.array(idx.astype(np.int64)))


def _user_codes(col) -> np.ndarray:
    """Dense group codes for run detection / lexsort over any key type
    (avoids O(n log n) python-object comparisons on string ids)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.dictionary_encode().indices)


def grouped_ffill(codes, order_key, valid, values):
    """LAST_VALUE(... IGNORE NULLS) forward fill within each group.

    ``codes`` are dense group codes (``_user_codes``), ``order_key`` the
    within-group sort key, ``valid`` a bool mask of non-null values,
    ``values`` the (null-filled) value array.  Returns ``(order,
    filled, has_value)``: the global lexsort order and, aligned to it,
    the carried values plus a mask that is False until a group's first
    valid row.  Fully vectorized: one global maximum.accumulate over
    valid-row indices; a per-group start guard stops carries from
    crossing a group boundary (any carried index from an earlier group
    sorts before this group's start)."""
    order = np.lexsort((order_key, codes))
    c = codes[order]
    v = valid[order]
    n = len(c)
    idx = np.arange(n, dtype=np.int64)
    carry = np.maximum.accumulate(np.where(v, idx, np.int64(-1)))
    starts = np.r_[0, np.nonzero(c[1:] != c[:-1])[0] + 1]
    seg_len = np.diff(np.r_[starts, n])
    row_start = np.repeat(starts, seg_len)
    has_value = carry >= row_start
    filled = values[order][np.maximum(carry, 0)]
    return order, filled, has_value


def _check_band_key(n_users: int, band: int) -> None:
    """Guard the band-shifted composite key (user_code * band + offset)
    against silent int64 wraparound: numpy overflow wraps, producing
    wrong (not crashed) match counts.  Trips only when users-per-part x
    time-range exceeds 2^63 (~1e4 users x a century in us per part) —
    the fix at scale is a larger ``parts`` so each part holds fewer
    users."""
    if n_users * band >= 2**63:
        raise OverflowError(
            f"band-shifted key would overflow int64 "
            f"({n_users} users x band {band} per part); raise `parts` "
            f"so each hash part holds fewer users"
        )


def tumbling_counts(ds, window_sec: int = 300):
    """Per-(event_type, window_start) count + value sum.

    ``value`` carries 2-decimal amounts; sums run in integer cents so
    the distributed result is exact and order-independent (float sums
    differ in the last bits between execution plans).
    """
    w_us = window_sec * US

    def bucket(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.int64())
        start = pc.multiply(
            pc.divide(epoch, w_us), w_us
        )  # integer floor-div then re-scale
        cents = pc.round(pc.multiply(t.column("value"), 100.0)).cast(pa.int64())
        t = (
            t.append_column("window_start", start.cast(pa.timestamp("us")))
            .append_column("cents", cents)
        )
        # per-batch combiner
        g = t.select(["event_type", "window_start", "cents"]).group_by(
            ["event_type", "window_start"]
        ).aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(
            ["event_type", "window_start", "cents", "n"]
        )

    partial = ds.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    # partials are (windows x types) rows per block — tiny; the
    # combiner tree finishes them without sort-shuffle machinery
    # (partitioning assumption as counts_by(final="tree"): the reduced
    # window-domain result fits one task)
    from rayslog.stages.aggregate import tree_aggregate

    agg = tree_aggregate(
        partial,
        ["event_type", "window_start"],
        [("n", "sum"), ("cents", "sum")],
        ["n_events", "cents"],
        # window domain grows with the time range (r5 auto-split)
        split_keys=["event_type", "window_start"],
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "value_sum",
            pc.divide(pc.cast(t.column("cents"), pa.float64()), 100.0),
        ).drop_columns(["cents"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def sessionize(ds, gap_sec: int = 1_800, parts: int = 64):
    """Per-user session stats with a gap rule.

    A new session starts when the inter-event gap exceeds ``gap_sec``.
    Output: (user_id, n_sessions, n_events, longest_session_events).

    One-phase plan: events exchange once on user-hash parts and every
    user in a part resolves in one vectorized run-detection pass (a
    map_groups call per USER pays ~0.4ms of machinery each — at fleet
    user counts that is pure overhead; here group machinery is per
    PART).  Partitioning assumption: one part's events fit a task —
    a single user whose events outgrow a task needs
    :func:`sessionize_partitioned` (time-chunk split + stitch).
    """
    from rayslog.stages.aggregate import task_exchange

    gap_us = gap_sec * US

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "event_id": t.column("event_id"),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    def _empty_out(utype):
        return pa.table(
            {
                "user_id": pa.array([], utype),
                "n_sessions": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "longest_session_events": pa.array([], pa.int64()),
            }
        )

    def per_part(t: pa.Table) -> pa.Table:
        utype = t.schema.field("user_id").type
        if not t.num_rows:
            return _empty_out(utype)
        uarr = t.column("user_id")
        codes = _user_codes(uarr)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u, ts = codes[order], ts[order]
        new_sess = np.r_[True, (u[1:] != u[:-1]) | (np.diff(ts) > gap_us)]
        sess_start = np.nonzero(new_sess)[0]
        sess_sizes = np.diff(np.r_[sess_start, len(ts)])
        sess_user = u[sess_start]
        new_user = np.r_[True, sess_user[1:] != sess_user[:-1]]
        user_start = np.nonzero(new_user)[0]
        n_sessions = np.diff(np.r_[user_start, len(sess_user)])
        n_events = np.add.reduceat(sess_sizes, user_start)
        longest = np.maximum.reduceat(sess_sizes, user_start)
        return pa.table(
            {
                "user_id": _take_col(uarr, order[sess_start][user_start]),
                "n_sessions": pa.array(n_sessions.astype("int64")),
                "n_events": pa.array(n_events.astype("int64")),
                "longest_session_events": pa.array(
                    longest.astype("int64")
                ),
            }
        )

    prepped = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    return task_exchange(prepped, "upart", parts, per_part)


def sessionize_partitioned(ds, gap_sec: int = 1_800,
                           chunk_sec: int = 86_400, parts: int = 64):
    """Sessionize for PATHOLOGICAL keys: two-phase time-range partition.

    Phase 1 partitions by hash(user_id, time-chunk) — a user with 10^9
    events spreads over many reducers — and reduces each (user, chunk)
    run to sub-session summaries (start, end, count): rows shrink from
    events to sessions.  Phase 2 partitions the small summaries by
    user and stitches sessions across chunk boundaries (merge
    consecutive sub-sessions whose boundary gap <= gap).  Exactly
    equivalent to ``sessionize`` (the boundary pair IS the last/first
    event pair the gap rule inspects); asserted by tests on
    boundary-crossing fixtures.

    Both phases run as bounded-parts ``task_exchange``\\ s with
    vectorized multi-group run detection inside each part (one
    map_groups call per (user, chunk) GROUP measured ~0.4ms of
    machinery each — 45k groups cost ~10s of pure overhead at sf0.1).

    Partitioning assumptions: one part's events fit a task (phase 1;
    ``parts`` scales with the corpus) and one user's SESSION SUMMARIES
    fit a part (#sessions << #events; chunk_sec trades reducer size
    for phase-2 fan-in).
    """
    from rayslog.stages.aggregate import task_exchange

    gap_us = gap_sec * US
    chunk_us = chunk_sec * US

    def add_chunk_part(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        chunk = pc.divide(epoch, chunk_us).cast(pa.int64())
        c = chunk.to_numpy(zero_copy_only=False)
        mix = (
            (_user_hash(t.column("user_id")) + np.uint64(1))
            * np.uint64(0x9E3779B97F4A7C15)
        ) ^ c.astype(np.uint64)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "event_id": t.column("event_id"),
                "chunk": chunk,
                "cpart": pa.array(
                    (mix % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    def _empty_subs(utype):
        return pa.table(
            {
                "user_id": pa.array([], utype),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )

    def per_part_chunks(t: pa.Table) -> pa.Table:
        utype = t.schema.field("user_id").type
        if not t.num_rows:
            return _empty_subs(utype)
        # runs are (user, chunk) slices of the part, gap-split inside;
        # sort makes each run contiguous and time-ordered
        uarr = t.column("user_id")
        u = _user_codes(uarr)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        ch = t.column("chunk").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, ch, u))
        u, ts, ch = u[order], ts[order], ch[order]
        new_s = np.r_[
            True,
            (u[1:] != u[:-1])
            | (ch[1:] != ch[:-1])
            | (np.diff(ts) > gap_us),
        ]
        starts_idx = np.nonzero(new_s)[0]
        ends_idx = np.r_[starts_idx[1:] - 1, len(ts) - 1]
        sizes = np.diff(np.r_[starts_idx, len(ts)])
        return pa.table(
            {
                "user_id": _take_col(uarr, order[starts_idx]),
                "start_us": pa.array(ts[starts_idx].astype("int64")),
                "end_us": pa.array(ts[ends_idx].astype("int64")),
                "n": pa.array(sizes.astype("int64")),
            }
        )

    # phase 1 emits per-part REFS; phase 2 chains on them as raw tasks
    # with the upart hash fused into its split pass — one Dataset
    # executor total instead of three (r4 ref-land conversion).  The
    # chunk/part prep is fused into phase 1's split via pre_fn: it then
    # runs on the RAW (schema-preserving) blocks, so an all-empty input
    # still flows typed (Ray skips map fns on empty blocks, which
    # would strip a lineage-derived empty block to zero columns).
    sub_refs = task_exchange(
        ds, "cpart", parts, per_part_chunks,
        pre_fn=add_chunk_part, return_refs=True,
    )

    def add_upart(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("user_id"))
        return t.append_column(
            "upart", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    def _empty_out(utype):
        return pa.table(
            {
                "user_id": pa.array([], utype),
                "n_sessions": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "longest_session_events": pa.array([], pa.int64()),
            }
        )

    def stitch_part(t: pa.Table) -> pa.Table:
        utype = t.schema.field("user_id").type
        if not t.num_rows:
            return _empty_out(utype)
        uarr = t.column("user_id")
        u = _user_codes(uarr)
        s = t.column("start_us").to_numpy(zero_copy_only=False)
        e = t.column("end_us").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u))
        u, s, e, n = u[order], s[order], e[order], n[order]
        # merge consecutive sub-sessions across chunk edges (chunks
        # partition time, so per user start-order == end-order)
        new_sess = np.r_[
            True, (u[1:] != u[:-1]) | (s[1:] - e[:-1] > gap_us)
        ]
        sess_start = np.nonzero(new_sess)[0]
        sess_sizes = np.add.reduceat(n, sess_start)
        sess_user = u[sess_start]
        new_user = np.r_[True, sess_user[1:] != sess_user[:-1]]
        user_start = np.nonzero(new_user)[0]
        n_sessions = np.diff(np.r_[user_start, len(sess_user)])
        n_events = np.add.reduceat(sess_sizes, user_start)
        longest = np.maximum.reduceat(sess_sizes, user_start)
        return pa.table(
            {
                "user_id": _take_col(uarr, order[sess_start][user_start]),
                "n_sessions": pa.array(n_sessions.astype("int64")),
                "n_events": pa.array(n_events.astype("int64")),
                "longest_session_events": pa.array(
                    longest.astype("int64")
                ),
            }
        )

    return task_exchange(
        sub_refs, "upart", parts, stitch_part, pre_fn=add_upart
    )


def event_type_stats(ds):
    """Per-event-type value statistics (count/sum/mean/min/max)."""
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="value_sum"),
        Mean("value", alias_name="value_mean"),
        Min("value", alias_name="value_min"),
        Max("value", alias_name="value_max"),
    )


def sliding_counts(ds, window_sec: int = 600, slide_sec: int = 300):
    """Sliding windows [w, w+window) every ``slide``: each event lands in
    window/slide overlapping windows, emitted vectorized (flat-map shape:
    k bucket rows per event) then combined like the tumbling path."""
    assert window_sec % slide_sec == 0
    k = window_sec // slide_sec
    s_us = slide_sec * US

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.int64())
        parts = []
        for j in range(k):
            start = pc.multiply(
                pc.divide(pc.subtract(epoch, j * s_us), s_us), s_us
            )
            parts.append(
                pa.table(
                    {
                        "event_type": t.column("event_type"),
                        "window_start": start.cast(pa.timestamp("us")),
                    }
                )
            )
        exploded = pa.concat_tables(parts)
        g = exploded.group_by(["event_type", "window_start"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["event_type", "window_start", "n"])

    partial = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    from rayslog.stages.aggregate import tree_aggregate

    return tree_aggregate(
        partial, ["event_type", "window_start"], [("n", "sum")],
        ["n_events"],
        split_keys=["event_type", "window_start"],  # r5 auto-split
    )


def asof_attribution_partitioned(
    ds, target: str = "purchase", source: str = "view",
    chunk_sec: int = 86_400,
):
    """As-of join for PATHOLOGICAL keys: two-phase time-range partition.

    Phase 1 groups by (user_id, time-chunk) and computes the LOCAL
    as-of match per target plus one summary row per chunk (the chunk's
    last source ts).  Phase 2 computes each chunk's CARRY-IN (the max
    source ts over all earlier chunks — a tiny per-user prefix scan
    over chunk summaries), which is then joined back to the per-target
    rows by (user_id, chunk) and used to fill targets whose nearest
    source lives in an earlier chunk.  Exactly equivalent to
    ``asof_attribution`` (the carry-in IS the best earlier-chunk
    candidate; the local match wins whenever it exists because it is
    >= any earlier source).  Partitioning assumption: one user's CHUNK
    SUMMARIES fit in a group (#chunks << #events).
    """
    from rayslog.stages.aggregate import task_exchange

    chunk_us = chunk_sec * US
    parts = 64

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(
                t.column("event_type"), value_set=pa.array([target, source])
            )
        ).select(["event_id", "user_id", "event_type", "ts"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        chunk = pc.divide(epoch, chunk_us).cast(pa.int64())
        c = chunk.to_numpy(zero_copy_only=False)
        mix = (
            (_user_hash(t.column("user_id")) + np.uint64(1))
            * np.uint64(0x9E3779B97F4A7C15)
        ) ^ c.astype(np.uint64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "chunk": chunk,
                "is_src": pc.equal(t.column("event_type"), source),
                "cpart": pa.array(
                    (mix % np.uint64(parts)).astype(np.int32)
                ),
            }
        )

    def _both_schema(utype):
        return pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", utype),
                ("ts", pa.timestamp("us")),
                ("last_source_ts", pa.timestamp("us")),
                ("chunk", pa.int64()),
                ("is_summary", pa.bool_()),
            ]
        )

    def per_part_asof(t: pa.Table) -> pa.Table:
        """Vectorized multi-(user,chunk) local as-of + one summary row
        per (user, chunk), in one pandas pass over the part — a
        map_groups call per GROUP costs ~0.4ms of machinery each
        (measured ~18s at sf0.1's 45k groups)."""
        sch = _both_schema(t.schema.field("user_id").type)
        if not t.num_rows:
            return sch.empty_table()
        df = t.to_pandas()
        # sources sort BEFORE targets at equal ts: merge_asof backward
        # is inclusive of simultaneous sources
        df = df.sort_values(
            ["user_id", "chunk", "ts_us", "is_src", "event_id"],
            ascending=[True, True, True, False, True],
        )
        grp = [df["user_id"], df["chunk"]]
        src_ts = df["ts_us"].where(df["is_src"], np.nan)
        last = src_ts.groupby(grp).cummax()
        last = last.groupby(grp).ffill()
        tgt_mask = ~df["is_src"].to_numpy()
        local = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[tgt_mask],
                "user_id": df["user_id"].to_numpy()[tgt_mask],
                "ts": df["ts_us"].to_numpy()[tgt_mask].astype(
                    "datetime64[us]"
                ),
                "last_source_ts": last.to_numpy()[tgt_mask].astype(
                    "datetime64[us]"
                ),
                "chunk": df["chunk"].to_numpy()[tgt_mask],
                "is_summary": False,
            }
        )
        summ = (
            pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "chunk": df["chunk"],
                    "src_ts": src_ts,
                }
            )
            .groupby(["user_id", "chunk"], as_index=False)
            .agg(last_source_ts=("src_ts", "max"))
        )
        summ["event_id"] = -1
        summ["ts"] = pd.NaT
        summ["ts"] = summ["ts"].astype("datetime64[us]")
        summ["last_source_ts"] = summ["last_source_ts"].astype(
            "datetime64[us]"
        )
        summ["is_summary"] = True
        out = pd.concat(
            [local, summ[list(local.columns)]], ignore_index=True
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(sch)

    import ray

    # phase 1 emits per-part REFS — phases 2/3 and the carry join chain
    # as raw tasks on those refs, no Dataset executor per phase (the
    # measured ~0.2s fixed floor each; r4 ref-land conversion).  prep
    # fuses into phase 1's split (pre_fn) so empty inputs stay typed
    # (Ray skips map fns on empty blocks).
    both_refs = task_exchange(
        ds, "cpart", parts, per_part_asof,
        pre_fn=prep, return_refs=True,
    )

    def only(flag: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = t.column("is_summary")
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            return t.filter(m if flag else pc.invert(m))

        return fn

    # carry-in per (user, chunk) computed from the SMALL summary rows
    # only (one row per user-chunk, never per event); vectorized over
    # whole user-hash parts
    def add_upart(t: pa.Table) -> pa.Table:
        h = _user_hash(t.column("user_id"))
        return t.append_column(
            "upart", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    def carry_part(t: pa.Table) -> pa.Table:
        utype = t.schema.field("user_id").type
        if not t.num_rows:
            return pa.table(
                {
                    "user_id": pa.array([], utype),
                    "chunk": pa.array([], pa.int64()),
                    "carry_ts": pa.array([], pa.timestamp("us")),
                }
            )
        df = t.to_pandas().sort_values(["user_id", "chunk"])
        uid = df["user_id"]
        # cummax leaves NaT at source-less chunks; ffill propagates the
        # running max across them before the shift — all per user
        carry = df["last_source_ts"].groupby(uid).cummax()
        carry = carry.groupby(uid).ffill()
        carry = carry.groupby(uid).shift(1)
        return pa.table(
            {
                "user_id": pa.Array.from_pandas(df["user_id"], type=utype),
                "chunk": pa.array(
                    df["chunk"].to_numpy().astype(np.int64)
                ),
                "carry_ts": pa.array(
                    carry.to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )

    # summary filter + upart fused into the carry exchange's split pass
    carry_refs = task_exchange(
        both_refs,
        "upart",
        parts,
        carry_part,
        pre_fn=lambda t: add_upart(only(True)(t)),
        return_refs=True,
    )

    @ray.remote
    def targets_of(part: pa.Table) -> pa.Table:
        return only(False)(part).select(
            ["event_id", "user_id", "ts", "last_source_ts", "chunk"]
        )

    target_refs = [targets_of.remote(r) for r in both_refs]

    from rayslog.stages.relational import hash_join

    # carry joins back on the (user_id, chunk) TUPLE — composite-key
    # hash_join, any key type (the retired _uc_key bit pack capped
    # user_id at 2^42 and required ints); both sides are ref lists
    joined_refs = hash_join(
        target_refs,
        carry_refs,
        key=["user_id", "chunk"],
        how="left",
        return_refs=True,
    )

    def finish(t: pa.Table) -> pa.Table:
        # all-NaT pandas columns arrive as null type; pin the types (the
        # bucket merge also upcasts ints to float when a bucket is empty)
        local = t.column("last_source_ts").cast(pa.timestamp("us"))
        carried = t.column("carry_ts").cast(pa.timestamp("us"))
        # the local match wins when present (it is >= any earlier source)
        filled = pc.coalesce(local, carried)
        uid = t.column("user_id")
        if pa.types.is_floating(uid.type):  # legacy-plan empty-bucket upcast
            uid = uid.cast(pa.int64())
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "user_id": uid,
                "ts": t.column("ts").cast(pa.timestamp("us")),
                "last_source_ts": filled,
            }
        )

    # finish as raw tasks over the join refs — a map_batches here would
    # be SKIPPED on empty blocks (Ray quirk), stripping the typed
    # schema from an empty result
    import ray.data as rd

    finish_task = ray.remote(finish)
    return rd.from_arrow_refs([finish_task.remote(r) for r in joined_refs])


def asof_attribution(ds, target: str = "purchase", source: str = "view",
                     gap_limit_sec: int | None = None):
    """As-of join: for each ``target`` event, the most recent prior (or
    simultaneous) ``source`` event timestamp for the same user.

    Ray Data has no native as-of join; both type-filtered sides
    exchange together on user-hash parts (raw-task ``task_exchange`` —
    group machinery per PART, not per user) and every user in a part
    resolves in one vectorized grouped cummax/ffill pass, equivalent
    to a backward-inclusive ``pd.merge_asof`` per user.  Partitioning
    assumption: one part's events fit a task; a single user whose
    events outgrow a task needs ``asof_attribution_partitioned``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    filtered = ds.map_batches(
        lambda t: t.filter(
            pc.is_in(t.column("event_type"), value_set=pa.array([target, source]))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    from rayslog.stages.aggregate import task_exchange

    parts = 64

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["event_id", "user_id", "event_type", "ts"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "is_src": pc.equal(t.column("event_type"), source),
                "upart": pa.array(
                    (u.astype(np.uint64) % np.uint64(parts)).astype(
                        np.int32
                    )
                ),
            }
        )

    _empty_out = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "last_source_ts": pa.array([], pa.timestamp("us")),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        """Vectorized multi-user as-of in one pandas pass (sources
        sort before targets at equal ts — merge_asof backward is
        inclusive of simultaneous sources)."""
        if not t.num_rows:
            return _empty_out
        df = t.to_pandas()
        df = df.sort_values(
            ["user_id", "ts_us", "is_src", "event_id"],
            ascending=[True, True, False, True],
        )
        uid = df["user_id"]
        src_ts = df["ts_us"].where(df["is_src"], np.nan)
        last = src_ts.groupby(uid).cummax()
        last = last.groupby(uid).ffill()
        tgt = ~df["is_src"].to_numpy()
        ts_t = df["ts_us"].to_numpy()[tgt]
        last_t = last.to_numpy()[tgt]
        if gap_limit_sec is not None:
            too_old = (ts_t - last_t) > gap_limit_sec * US
            last_t = np.where(too_old, np.nan, last_t)
        return pa.table(
            {
                "event_id": pa.array(
                    df["event_id"].to_numpy()[tgt].astype("int64")
                ),
                "user_id": pa.array(
                    df["user_id"].to_numpy()[tgt].astype("int64")
                ),
                "ts": pa.array(
                    ts_t.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "last_source_ts": pa.array(
                    last_t.astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    prepped = filtered.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    return task_exchange(prepped, "upart", parts, per_part)


def funnel_counts(
    ds,
    stages=("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Ordered conversion funnel: for each prefix of ``stages``, the
    number of users who completed it IN ORDER (stage i strictly after
    their first completion of stages 1..i-1).  Returns
    (stage, n_users) — the classic funnel-analytics shape.

    Plan — k grouped-min passes, no per-user sort and no per-user
    map_groups:

    - t_1(u) = min ts of stage-1 events per user: per-batch grouped-min
      combiner -> the raw-task combiner tree (one row per user per
      block through the tree).
    - t_i(u) = min ts of stage-i events with ts > t_{i-1}(u): the
      previous pass's per-user times broadcast ONCE via ``ray.put``
      (sorted id + time arrays, searchsorted lookup per batch — the
      broadcast-small-side rule), then the same combiner tree.

    The corpus streams k times; each shuffle-free pass moves one row
    per qualifying user per block.  Partitioning assumption: the
    per-user first-completion table fits one task / the driver
    (tree_reduce docstring).  For fleet-scale user domains swap the
    broadcast for ``relational.hash_join`` on ``user_col`` and the
    tree for ``final="shuffle"`` — the pass structure is unchanged.

    Strict ``>`` on microsecond timestamps both here and in the SQL
    oracle, so ties (same-instant events) never advance the funnel.

    The k passes run as RAW tasks over the materialized blocks (one
    per-block partial task + ``tree_reduce_refs`` per stage) — no
    Dataset executor spin-up per stage, which was the dominant cost at
    small scale (~0.3s fixed x k; measured r4).
    """
    import ray

    from rayslog.stages.aggregate import live_block_refs, tree_reduce_refs

    # one parquet read + filter for all k passes: the projected input
    # is materialized into the object store once (spillable), instead
    # of re-executing the upstream read per stage
    mat = ds.materialize()
    refs = live_block_refs(mat)

    @ray.remote
    def stage_partial(block, stage, prev):
        t = (
            block
            if isinstance(block, pa.Table)
            else pa.Table.from_pandas(block, preserve_index=False)
        )
        sub = t.filter(pc.equal(t.column(type_col), stage))
        if prev is not None:
            ids_prev, ts_prev = prev
            u = sub.column(user_col).to_numpy(zero_copy_only=False)
            ts = (
                sub.column(ts_col)
                .cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            pos = np.searchsorted(ids_prev, u)
            pos_c = np.minimum(pos, max(len(ids_prev) - 1, 0))
            hit = (
                (ids_prev[pos_c] == u) & (ts > ts_prev[pos_c])
                if len(ids_prev)
                else np.zeros(len(u), dtype=bool)
            )
            sub = sub.filter(pa.array(hit))
        out = (
            sub.select([user_col, ts_col])
            .group_by([user_col])
            .aggregate([(ts_col, "min")])
        )
        return out.rename_columns([user_col, ts_col])

    def min_reduce(t: pa.Table) -> pa.Table:
        return (
            t.group_by([user_col])
            .aggregate([(ts_col, "min")])
            .rename_columns([user_col, ts_col])
        )

    counts = []
    prev_ref = None
    for stage in stages:
        if refs:
            partial_refs = [
                stage_partial.remote(r, stage, prev_ref) for r in refs
            ]
            df = tree_reduce_refs(partial_refs, min_reduce).to_pandas()
        else:
            import pandas as pd

            df = pd.DataFrame({user_col: [], ts_col: []})
        counts.append(len(df))
        ids = df[user_col].to_numpy().astype(np.int64)
        order = np.argsort(ids)
        ts_us = (
            df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        prev_ref = ray.put((ids[order], ts_us[order]))

    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "stage": pa.array(list(stages), pa.string()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )
    )


def event_gap_stats(ds, parts: int = 64):
    """Per-event-type inter-arrival gap stats (the LAG-window shape).

    For each user's events ordered by (ts, event_id), the gap is the
    µs delta to that user's previous event, attributed to the CURRENT
    row's event_type (SQL ``LAG`` semantics).  Output per event_type:
    n_gaps, avg_gap_sec, max_gap_sec.

    One user-hash ``task_exchange`` (each user's timeline resolves
    whole in one part — the sessionize partitioning assumption), one
    vectorized lexsort+diff pass per part, then a 5-ish-key combiner
    tree over exact int64 µs sums (avg division happens once at the
    end, identical IEEE expression to the oracle)."""
    from rayslog.stages.aggregate import task_exchange

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id", "event_type"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "sum_us": pa.array([], pa.int64()),
            "max_us": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u, ts_s = codes[order], ts[order]
        same = np.r_[False, u[1:] == u[:-1]]
        gaps = np.empty(len(ts_s), dtype=np.int64)
        gaps[1:] = ts_s[1:] - ts_s[:-1]
        gaps = gaps[same]
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        et_cur = et.take(pa.array(order[same]))
        return (
            pa.table({"event_type": et_cur, "gap": pa.array(gaps)})
            .group_by(["event_type"])
            .aggregate([("gap", "sum"), ("gap", "max"), ([], "count_all")])
            .rename_columns(["event_type", "sum_us", "max_us", "n_gaps"])
        )

    partials = task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.select(["event_type", "sum_us", "max_us", "n_gaps"])
            .group_by(["event_type"])
            .aggregate(
                [("sum_us", "sum"), ("max_us", "max"), ("n_gaps", "sum")]
            )
            .rename_columns(["event_type", "sum_us", "max_us", "n_gaps"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_gaps"), pa.float64())
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_gaps": pc.cast(t.column("n_gaps"), pa.int64()),
                "avg_gap_sec": pc.divide(
                    pc.divide(pc.cast(t.column("sum_us"), pa.float64()), n),
                    1_000_000.0,
                ),
                "max_gap_sec": pc.divide(
                    pc.cast(t.column("max_us"), pa.float64()), 1_000_000.0
                ),
            }
        )

    def empty_fn():
        # all users have single events -> zero gaps everywhere; a
        # trailing map_batches would be SKIPPED on the empty blocks and
        # the output would lose its schema (the Ray all-empty quirk) —
        # emit the typed final shape directly
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_gaps": pa.array([], pa.int64()),
                    "avg_gap_sec": pa.array([], pa.float64()),
                    "max_gap_sec": pa.array([], pa.float64()),
                }
            )
        )

    from rayslog.stages.aggregate import tree_reduce

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def rolling_value_avg(ds, window_rows: int = 4, parts: int = 64):
    """Frame-window rolling average: for every event, the mean of its
    user's last ``window_rows`` values (ROWS BETWEEN k-1 PRECEDING AND
    CURRENT ROW, ordered by ts, event_id) — the moving-average shape.

    One user-hash ``task_exchange`` (a user's timeline resolves whole
    in one part), then one vectorized pass per part: lexsort, integer
    cumsum, frame sum = cumsum diff (exact in int64 cents — a float
    cumsum would drift vs the oracle's per-frame sums), frame length
    clamped at run starts.  Output per event: user_id, event_id,
    ma_value (frame mean in currency units)."""
    from rayslog.stages.aggregate import task_exchange

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id", "value"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "event_id": t.column("event_id"),
                "val_c": pc.round(
                    pc.multiply(t.column("value"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "ma_value": pa.array([], pa.float64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        vc = t.column("val_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u, v = codes[order], vc[order]
        idx = np.arange(len(u), dtype=np.int64)
        starts = np.r_[0, np.nonzero(u[1:] != u[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(u)])
        within = idx - np.repeat(starts, lens)
        # frame start = max(row - (k-1), run start); frame sum via
        # exact int64 prefix sums
        csum = np.cumsum(v)
        frame_n = np.minimum(within + 1, window_rows)
        lo = idx - frame_n  # index BEFORE the frame (may be -1-like)
        lo_sum = np.where(lo >= 0, csum[np.maximum(lo, 0)], 0)
        # lo points at the last row outside the frame; when the frame
        # starts at the run start, lo is start-1 — still a valid
        # global prefix index unless the run starts at 0
        frame_sum = csum - lo_sum
        ma = frame_sum.astype(np.float64) / frame_n / 100.0
        uarr = _take_col(t.column("user_id"), order)
        return pa.table(
            {
                "user_id": uarr,
                "event_id": pa.array(ev[order]),
                "ma_value": pa.array(ma),
            }
        )

    return task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )


def running_value_sum(ds, parts: int = 64):
    """Cumulative window (ROWS UNBOUNDED PRECEDING): for every event,
    the running total and running count of that user's values ordered
    by (ts, event_id) — completes the window-frame family next to
    :func:`rolling_value_avg` (bounded ROWS) and
    :func:`rolling_time_stats` (RANGE).

    Same plan shape: one user-hash ``task_exchange`` (a user's whole
    timeline lands in one part), then a single vectorized pass per
    part — lexsort + exact int64-cents cumsum, run-rebased by
    subtracting the prefix just before each user's run start."""
    from rayslog.stages.aggregate import task_exchange

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id", "value"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "event_id": t.column("event_id"),
                "val_c": pc.round(
                    pc.multiply(t.column("value"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "run_value": pa.array([], pa.float64()),
            "run_n": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        vc = t.column("val_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u, v = codes[order], vc[order]
        idx = np.arange(len(u), dtype=np.int64)
        starts = np.r_[0, np.nonzero(u[1:] != u[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(u)])
        within = idx - np.repeat(starts, lens)
        csum = np.cumsum(v)
        base = np.where(starts > 0, csum[starts - 1], 0)
        run_sum = csum - np.repeat(base, lens)
        uarr = _take_col(t.column("user_id"), order)
        return pa.table(
            {
                "user_id": uarr,
                "event_id": pa.array(ev[order]),
                "run_value": pa.array(
                    run_sum.astype(np.float64) / 100.0
                ),
                "run_n": pa.array(within + 1),
            }
        )

    return task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )


def rolling_time_stats(ds, window_sec: int = 300, parts: int = 64):
    """RANGE-frame rolling stats: for every event, the count and value
    sum of that user's events with ``ts`` in ``[ts_i - window, ts_i]``
    — SQL ``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW``
    (peers of the current timestamp are IN the frame, unlike the ROWS
    frame of :func:`rolling_value_avg`).

    One user-hash exchange, then one vectorized pass per part: segment
    timestamps shift into disjoint per-user bands (band width > global
    ts range + window, so a single global ``searchsorted`` respects
    user boundaries), and frame sums come from exact int64-cents
    prefix sums.  Overflow guard: bands need ``range × n_users_in_part``
    to fit int64 — raises loudly past that (repartition or shrink the
    part count there)."""
    from rayslog.stages.aggregate import task_exchange

    w_us = window_sec * US

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id", "value"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "event_id": t.column("event_id"),
                "val_c": pc.round(
                    pc.multiply(t.column("value"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "n_win": pa.array([], pa.int64()),
            "sum_win": pa.array([], pa.float64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        vc = t.column("val_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u, ts_s, v = codes[order], ts[order], vc[order]
        starts = np.r_[0, np.nonzero(u[1:] != u[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(u)])
        seg_id = np.repeat(np.arange(len(starts)), lens)
        t0, t1 = int(ts_s.min()), int(ts_s.max())
        band = (t1 - t0) + w_us + 2
        if band * (len(starts) + 1) > 2**62:
            raise ValueError(
                "rolling_time_stats: ts-range x users-per-part overflows "
                "the band encoding — raise `parts` or pre-split the data"
            )
        adj = (ts_s - t0) + seg_id * band
        csum = np.cumsum(v)
        lo = np.searchsorted(adj, adj - w_us, side="left")
        hi = np.searchsorted(adj, adj, side="right")
        n_win = hi - lo
        lo_sum = np.where(lo > 0, csum[np.maximum(lo - 1, 0)], 0)
        sum_c = csum[hi - 1] - lo_sum
        uarr = _take_col(t.column("user_id"), order)
        return pa.table(
            {
                "user_id": uarr,
                "event_id": pa.array(ev[order]),
                "n_win": pa.array(n_win.astype(np.int64)),
                "sum_win": pa.array(sum_c.astype(np.float64) / 100.0),
            }
        )

    return task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )


def event_transitions(ds, parts: int = 64):
    """Per-user event-type transition matrix (the Markov-chain /
    next-action shape): counts of (prev_type -> event_type) pairs over
    each user's timeline ordered by (ts, event_id).

    Same plan as :func:`event_gap_stats`: one user-hash
    ``task_exchange`` (a user's timeline resolves whole in one part),
    one vectorized lexsort + shifted-compare pass per part, then a
    <= |types|^2-key combiner tree — no sort-shuffle, no per-user
    Python."""
    from rayslog.stages.aggregate import task_exchange, tree_reduce

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id", "event_type"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "prev_type": pa.array([], pa.string()),
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u = codes[order]
        same = u[1:] == u[:-1]
        cur = order[1:][same]
        prv = order[:-1][same]
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return (
            pa.table(
                {
                    "prev_type": et.take(pa.array(prv)),
                    "event_type": et.take(pa.array(cur)),
                }
            )
            .group_by(["prev_type", "event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["prev_type", "event_type", "n"])
        )

    partials = task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["prev_type", "event_type"])
            .aggregate([("n", "sum")])
            .rename_columns(["prev_type", "event_type", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prev_type": t.column("prev_type"),
                "event_type": t.column("event_type"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def action_trigrams(ds, parts: int = 64):
    """Per-user ordered action TRIGRAM counts — the sequence-mining
    sibling of :func:`event_transitions`: counts of
    ``(type[i-2], type[i-1], type[i])`` triples over each user's
    timeline ordered by (ts, event_id).

    Same plan: one user-hash ``task_exchange`` (a user's timeline
    resolves whole in one part), one lexsort + double shifted-compare
    pass per part (a trigram is valid when positions i-2..i share a
    user), then a <= |types|^3-key combiner tree."""
    from rayslog.stages.aggregate import task_exchange, tree_reduce

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_id", "event_type"])
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        epoch = ts.cast(pa.timestamp("us")).cast(pa.int64())
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(epoch.to_numpy(zero_copy_only=False)),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "t0": pa.array([], pa.string()),
            "t1": pa.array([], pa.string()),
            "t2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows < 3:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts, codes))
        u = codes[order]
        same = u[1:] == u[:-1]
        tri = same[1:] & same[:-1]
        cur = order[2:][tri]
        p1 = order[1:-1][tri]
        p2 = order[:-2][tri]
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return (
            pa.table(
                {
                    "t0": et.take(pa.array(p2)),
                    "t1": et.take(pa.array(p1)),
                    "t2": et.take(pa.array(cur)),
                }
            )
            .group_by(["t0", "t1", "t2"])
            .aggregate([([], "count_all")])
            .rename_columns(["t0", "t1", "t2", "n"])
        )

    partials = task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["t0", "t1", "t2"])
            .aggregate([("n", "sum")])
            .rename_columns(["t0", "t1", "t2", "n"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "t0": t.column("t0"),
                "t1": t.column("t1"),
                "t2": t.column("t2"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(_empty)

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def value_mad_by_type(ds, parts: int = 32):
    """Grouped median absolute deviation of event value (exact cents,
    DuckDB ``quantile_disc`` semantics: the element at index
    floor((n-1)/2) of the sorted group).  One type-hash
    ``task_exchange`` co-locates each type (bounded-groups caveat as
    dominant_event_type: one type's rows fit a part — salt by value
    band past ~10^9 rows/type), then ONE vectorized pass per part
    computes both quantiles via sort + run offsets."""
    from rayslog.kernels.texthash import col_hash64
    from rayslog.stages.aggregate import task_exchange

    def prep(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        h = col_hash64(et)
        return pa.table(
            {
                "event_type": et,
                "c": pc.round(
                    pc.multiply(t.column("value"), pa.scalar(100.0))
                ).cast(pa.int64()),
                "tpart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "median_value": pa.array([], pa.float64()),
            "mad_value": pa.array([], pa.float64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        import pandas as pd

        codes, uniques = pd.factorize(t.column("event_type").to_pandas())
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, codes))
        g, cs = codes[order], c[order]
        starts = np.r_[0, np.nonzero(g[1:] != g[:-1])[0] + 1]
        lens = np.diff(np.r_[starts, len(g)])
        med = cs[starts + (lens - 1) // 2]
        gkeys = g[starts]
        # deviations re-sorted within the same group layout
        dev = np.abs(cs - med[np.searchsorted(gkeys, g)])
        order2 = np.lexsort((dev, g))
        d_s = dev[order2]
        mad = d_s[starts + (lens - 1) // 2]
        return pa.table(
            {
                "event_type": pa.array(
                    [uniques[k] for k in gkeys], pa.string()
                ),
                "median_value": pa.array(med.astype(np.float64) / 100.0),
                "mad_value": pa.array(mad.astype(np.float64) / 100.0),
            }
        )

    return task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "tpart",
        parts,
        per_part,
    )


def rolling_dau(ds, window_days: int = 7, parts: int = 64):
    """Trailing-window distinct active users per day (rolling DAU /
    WAU) — ROLLING COUNT DISTINCT, which no plain window frame can
    express at scale.  Trick: a user active on day u is "visible" on
    days [u, u+w-1], so each user's distinct activity days merge into
    coverage intervals (gap > w-1 starts a new one) and every
    interval becomes a +1/-1 diff pair; summed diffs prefix-scan to
    the exact rolling-distinct count with no per-day user sets.

    One user-hash exchange (a user's days resolve whole in one part,
    vectorized reduceat interval merge), then the <= 2x|days|-row
    diff table rides the combiner tree; the final block prefix-scans
    and evaluates at the real activity days.  Partitioning
    assumption: the day-granular diff table fits the final task
    (~90k rows even at 10^12 turns over a century)."""
    from rayslog.stages.aggregate import task_exchange, tree_reduce

    day_us = np.int64(86_400_000_000)
    w = np.int64(window_days)

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        d = (
            ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // day_us
        )
        g = (
            pa.table({"user_id": t.column("user_id"), "day": pa.array(d)})
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        h = _user_hash(g.column("user_id"))
        return g.append_column(
            "upart", pa.array((h % np.uint64(parts)).astype(np.int32))
        )

    _empty = pa.table(
        {
            "day": pa.array([], pa.int64()),
            "delta": pa.array([], pa.int64()),
            "mark": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        g = t.group_by(["user_id", "day"]).aggregate([])
        codes = _user_codes(g.column("user_id"))
        d = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, codes))
        us, ds_ = codes[order], d[order]
        new_int = np.r_[
            True,
            (us[1:] != us[:-1]) | (ds_[1:] - ds_[:-1] > w - 1),
        ]
        starts = np.nonzero(new_int)[0]
        lens = np.diff(np.r_[starts, len(ds_)])
        s_day = ds_[starts]
        e_day = ds_[starts + lens - 1] + w  # exclusive end
        diff = pa.table(
            {
                "day": pa.array(np.r_[s_day, e_day]),
                "delta": pa.array(
                    np.r_[
                        np.ones(len(s_day), dtype=np.int64),
                        -np.ones(len(e_day), dtype=np.int64),
                    ]
                ),
                "mark": pa.array(
                    np.zeros(2 * len(s_day), dtype=np.int64)
                ),
            }
        )
        marks = pa.table(
            {
                "day": pa.array(np.unique(ds_)),
                "delta": pa.array(
                    np.zeros(len(np.unique(ds_)), dtype=np.int64)
                ),
                "mark": pa.array(
                    np.ones(len(np.unique(ds_)), dtype=np.int64)
                ),
            }
        )
        return (
            pa.concat_tables([diff, marks])
            .group_by(["day"])
            .aggregate([("delta", "sum"), ("mark", "sum")])
            .rename_columns(["day", "delta", "mark"])
        )

    partials = task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["day"])
            .aggregate([("delta", "sum"), ("mark", "sum")])
            .rename_columns(["day", "delta", "mark"])
        )

    def final_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        d = t.column("day").to_numpy(zero_copy_only=False)
        cum = np.cumsum(t.column("delta").to_numpy(zero_copy_only=False))
        mark = t.column("mark").to_numpy(zero_copy_only=False)
        real = mark > 0
        return pa.table(
            {
                "day": pa.array(
                    (d[real] * int(day_us)).astype("datetime64[us]")
                ),
                "active_users": pa.array(cum[real]),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.timestamp("us")),
                    "active_users": pa.array([], pa.int64()),
                }
            )
        )

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def followed_within(ds, first_type: str = "error",
                    then_type: str = "purchase",
                    within_sec: int = 3600, parts: int = 64):
    """Sequence-pattern match: occurrences of ``first_type`` followed
    by ``then_type`` from the SAME user within ``within_sec`` —
    the behavioral A-then-B-within-Δt shape (conversion-after-error,
    retry-after-failure).  Counts both matching A events and distinct
    users with >=1 match.

    One user-hash exchange, then per part a vectorized sorted-merge:
    B timestamps searchsorted into each A's (t, t+Δ] window, with
    per-user bounds from run offsets — no joins, no per-row Python."""
    from rayslog.stages.aggregate import task_exchange, tree_reduce

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"),
            value_set=pa.array([first_type, then_type]),
        )
        t = t.filter(keep)
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(
                    ts.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                ),
                "is_a": pc.equal(t.column("event_type"), first_type),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "n_matched_events": pa.array([], pa.int64()),
            "n_matched_users": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        isa = t.column("is_a").to_numpy(zero_copy_only=False)
        w = np.int64(within_sec) * np.int64(1_000_000)
        order = np.lexsort((ts, codes))
        u, tt, aa = codes[order], ts[order], isa[order]
        # band-shifted composite key (the rolling_time trick): shift
        # each user's rebased times by user_index * R so ONE sorted
        # array serves every user's window query.  R covers the part's
        # time range + the window; int64-safe while users/part * R <
        # 2^63 (~1e4 users x a century in us) — size `parts` up past
        # that.
        t0_, t1_ = int(tt.min()), int(tt.max())
        R = np.int64(t1_ - t0_) + w + np.int64(2)
        _check_band_key(int(u.max()) + 1, int(R))
        key = u.astype(np.int64) * R + (tt - np.int64(t0_))
        b_key = key[~aa]
        a_key = key[aa]
        a_u = u[aa]
        lo = np.searchsorted(b_key, a_key, side="right")
        hi = np.searchsorted(b_key, a_key + w, side="right")
        matched = hi > lo
        n_ev = int(np.count_nonzero(matched))
        n_us = int(len(np.unique(a_u[matched])))
        return pa.table(
            {
                "n_matched_events": pa.array([n_ev], pa.int64()),
                "n_matched_users": pa.array([n_us], pa.int64()),
            }
        )

    partials = task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_matched_events": pa.array(
                    [pc.sum(t.column("n_matched_events")).as_py() or 0],
                    pa.int64(),
                ),
                "n_matched_users": pa.array(
                    [pc.sum(t.column("n_matched_users")).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(reduce_fn(_empty))

    return tree_reduce(partials, reduce_fn, empty_fn=empty_fn)


def conversion_delay(ds, first_type: str = "error",
                     then_type: str = "purchase", parts: int = 64):
    """Exact delay stats from each ``first_type`` event to the SAME
    user's NEXT ``then_type`` event (time-to-conversion): count, mean,
    min, max in seconds.  The per-A next-B resolves with one
    band-shifted searchsorted per part (:func:`followed_within`'s
    key trick, uncapped window); the stats are exact integer-µs sums
    through the combiner tree, divided once in float64 exactly as the
    oracle spells."""
    from rayslog.stages.aggregate import task_exchange, tree_reduce

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"),
            value_set=pa.array([first_type, then_type]),
        )
        t = t.filter(keep)
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        h = _user_hash(t.column("user_id"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(
                    ts.cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                ),
                "is_a": pc.equal(t.column("event_type"), first_type),
                "upart": pa.array((h % np.uint64(parts)).astype(np.int32)),
            }
        )

    _empty = pa.table(
        {
            "n": pa.array([], pa.int64()),
            "s_us": pa.array([], pa.int64()),
            "mn_us": pa.array([], pa.int64()),
            "mx_us": pa.array([], pa.int64()),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        codes = _user_codes(t.column("user_id"))
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        isa = t.column("is_a").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, codes))
        u, tt, aa = codes[order], ts[order], isa[order]
        t0_, t1_ = int(tt.min()), int(tt.max())
        R = np.int64(t1_ - t0_) + np.int64(2)
        _check_band_key(int(u.max()) + 1, int(R))
        key = u.astype(np.int64) * R + (tt - np.int64(t0_))
        b_key = key[~aa]
        a_key = key[aa]
        a_u = u[aa]
        if not len(b_key) or not len(a_key):
            return _empty
        pos = np.searchsorted(b_key, a_key, side="right")
        # next-B exists iff pos valid AND still in the same user's band
        ok = pos < len(b_key)
        nxt = np.where(ok, b_key[np.minimum(pos, max(len(b_key) - 1, 0))],
                       np.int64(0))
        same = ok & (nxt // R == a_u)
        delta = (nxt - a_key)[same]
        if not len(delta):
            return _empty
        return pa.table(
            {
                "n": pa.array([len(delta)], pa.int64()),
                "s_us": pa.array([int(delta.sum())], pa.int64()),
                "mn_us": pa.array([int(delta.min())], pa.int64()),
                "mx_us": pa.array([int(delta.max())], pa.int64()),
            }
        )

    partials = task_exchange(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "upart",
        parts,
        per_part,
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        return pa.table(
            {
                "n": pa.array([pc.sum(t.column("n")).as_py() or 0],
                              pa.int64()),
                "s_us": pa.array([pc.sum(t.column("s_us")).as_py() or 0],
                                 pa.int64()),
                "mn_us": pa.array([pc.min(t.column("mn_us")).as_py()],
                                  pa.int64()),
                "mx_us": pa.array([pc.max(t.column("mx_us")).as_py()],
                                  pa.int64()),
            }
        )

    def final_fn(t: pa.Table) -> pa.Table:
        n = int(t.column("n")[0].as_py() or 0) if t.num_rows else 0
        if not n:
            return pa.table(
                {
                    "n_conversions": pa.array([0], pa.int64()),
                    "mean_delay_sec": pa.array([None], pa.float64()),
                    "min_delay_sec": pa.array([None], pa.float64()),
                    "max_delay_sec": pa.array([None], pa.float64()),
                }
            )
        s = float(t.column("s_us")[0].as_py())
        return pa.table(
            {
                "n_conversions": pa.array([n], pa.int64()),
                "mean_delay_sec": pa.array(
                    [s / float(n) / 1_000_000.0], pa.float64()
                ),
                "min_delay_sec": pa.array(
                    [float(t.column("mn_us")[0].as_py()) / 1_000_000.0],
                    pa.float64(),
                ),
                "max_delay_sec": pa.array(
                    [float(t.column("mx_us")[0].as_py()) / 1_000_000.0],
                    pa.float64(),
                ),
            }
        )

    def empty_fn():
        import ray.data as rd

        return rd.from_arrow(final_fn(_empty))

    return tree_reduce(
        partials, reduce_fn, empty_fn=empty_fn, final_fn=final_fn
    )


def segmented_inversions(ucode: np.ndarray, eid: np.ndarray,
                         ts: np.ndarray) -> np.ndarray:
    """Per-user inversion counts — pairs ``(i, j)`` with ``event_id_i
    < event_id_j`` but ``ts_i > ts_j`` within a user (the
    out-of-order/lateness audit of a telemetry stream).

    Fully vectorized bottom-up mergesort counting, O(n log^2 n) with
    NO per-user / per-run Python loop: values compress to user-major
    dense ranks (equal ts share a rank, so ties never count, and
    cross-user pairs can never invert), the array pads to a power of
    two with a +inf sentinel, and each merge level runs ONE
    ``np.sort(axis=1)`` over the (runs, 2w) view plus ONE global
    ``searchsorted`` — per-run lookups fuse via block-banded keys
    (run_id * (n+1) + rank; fits int64 while n^2 < 2^63, i.e. any
    realistic per-part slice).  Per-element greater-than counts
    attribute to the element's user through the rank -> user table,
    so the one global pass yields exact PER-USER totals.  Returns
    int64[n_users] indexed by the dense user code."""
    n = len(ucode)
    if n == 0:
        return np.zeros(0, np.int64)
    n_users = int(ucode.max()) + 1
    order_ut = np.lexsort((ts, ucode))
    u_s, t_s = ucode[order_ut], ts[order_ut]
    new = np.r_[True, (u_s[1:] != u_s[:-1]) | (t_s[1:] != t_s[:-1])]
    dense = np.cumsum(new) - 1
    rank = np.empty(n, np.int64)
    rank[order_ut] = dense
    rank_user = np.empty(n, np.int64)
    rank_user[dense] = u_s

    order_seq = np.lexsort((eid, ucode))
    a = rank[order_seq]

    P = 1 << int(np.ceil(np.log2(max(n, 2))))
    SENT = n  # > every dense rank
    arr = np.full(P, SENT, np.int64)
    arr[:n] = a

    per_user = np.zeros(n_users, np.int64)
    w = 1
    while w < P:
        m = P // (2 * w)
        blocks = arr.reshape(m, 2 * w)
        left = blocks[:, :w]
        right = blocks[:, w:]
        band = (np.arange(m, dtype=np.int64) * (SENT + 1))[:, None]
        left_keys = (left + band).ravel()
        right_keys = (right + band).ravel()
        pos = np.searchsorted(left_keys, right_keys, side="right")
        le = pos - np.repeat(np.arange(m, dtype=np.int64) * w, w)
        cnt = w - le
        rv = right.ravel()
        real = rv < SENT
        if real.any():
            per_user += np.bincount(
                rank_user[rv[real]], weights=cnt[real],
                minlength=n_users,
            ).astype(np.int64)
        arr = np.sort(blocks, axis=1).ravel()
        w *= 2
    return per_user
