"""Vectorized Arrow parse kernels.

Architecture of the hot path (per batch, all C++/numpy — no per-row
Python):

1. anchored RE2 **match-only** masks validate canonical message shapes
   (RE2's DFA matches ~5-10M rows/s; capture-group extraction is 50-100x
   slower, so the kernel never extracts with regex);
2. field extraction happens with **numpy byte arithmetic** over the
   Arrow string column's raw data/offset buffers: fixed offsets for the
   fixed-width regions (priority, timestamps), global space/terminator
   position indices + ``searchsorted`` for the token walks, and one
   ragged-gather per string column;
3. rows the fast path cannot prove byte-equivalent to the reference
   automaton (non-ASCII, beyond the packet clamp, non-canonical
   separators, tag-window overruns) fall back to the row oracle
   (``rayslog.kernels.oracle``), keeping the batch result reference-exact
   for ALL inputs.

The validation patterns are conservative: a match guarantees the
automaton takes exactly the canonical path, so byte extraction at fixed
offsets is safe.  Reference semantics citations live in oracle.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayslog.config import DEFAULT_CONFIG, ParserConfig
from rayslog.errors import (
    ERR_DAY_INVALID,
    ERR_INDEX_OUT_OF_RANGE,
    ERR_MONTH_INVALID,
    ERR_PRIORITY_NON_DIGIT,
    ERR_PRIORITY_NO_START,
    ERR_PRIORITY_TOO_LONG,
    ERR_PRIORITY_TOO_SHORT,
    ERR_TIMESTAMP_UNKNOWN_FORMAT,
    ERR_VERSION_NOT_FOUND,
)
from rayslog.kernels import oracle
from rayslog.schema import PARSE_COLUMN_NAMES, PARSE_FIELDS

US = np.int64(1_000_000)
_HUGE = np.int64(2**62)

# ---- detection masks (DetectRFC quirks, syslogparser.go:30-56) ---------
_D_5424 = r"^[^>]{0,8}>[0-9]"
_D_3164 = r"^[^>]{0,8}>[^0-9]"
_D_UNKNOWN = r"^[^>]{9}>"
_D_QUIRK = r"^[^>]{10}"

# ---- priority error classes (ParsePriority, parsercommon.go:50-94) -----
_P_NO_START = r"^[^<]"
_P_TOO_SHORT = r"^<>"
_P_TOO_LONG = r"^<\d{4}"
_P_NON_DIGIT = r"^<\d{0,3}[^0-9>]"

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTH_CODES = np.array(
    [m.encode()[0] * 65536 + m.encode()[1] * 256 + m.encode()[2] for m in _MONTHS],
    dtype=np.int64,
)

#: RFC3164 canonical-shape validator (match-only; no capture groups):
#: <pri> [one optional space] default-layout 15-byte timestamp, single
#: space, non-empty hostname, single space, tag starting with a
#: non-terminator, optional junk, anything.
V3164 = (
    r"^<\d{1,3}> ?"
    r"(?:" + "|".join(_MONTHS) + r") (?:\d\d| \d) \d\d:\d\d:\d\d "
    r"[^ ]+ "
    r"[^ \[\]:](?s:.*)$"
)

#: RFC5424 canonical-shape validator: PRI VERSION SP TIMESTAMP SP
#: HOSTNAME SP APP-NAME SP PROCID SP MSGID SP SD [SP MSG].
V5424 = (
    r"^<\d{1,3}>\d "
    r"(?:-|\d{4}-\d\d-\d\dT\d\d:\d\d:\d\d(?:\.\d{1,6})?(?:Z|[+-]\d\d:\d\d)) "
    # app/proc/msgid caps are maxLen-1: parseUpToLen (rfc5424.go:638-663)
    # scans `to < cursor+maxLen` and errors when the space sits AT the cap,
    # so a token of exactly maxLen bytes is rejected.
    r"[^ ]+ [^ ]{1,47} [^ ]{1,127} [^ ]{1,31} "
    r"(?:-|\[(?s:.)*?\])(?:\x20(?s:.*))?$"
)

# year-0 is leap in the proleptic calendar => Feb 29 passes Go validation
_DAYS_IN_MONTH_Y0 = np.array(
    [31, 31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], dtype=np.int64
)


def _days_from_civil_np(y, m, d):
    """Vectorized Hinnant days-from-civil (see gotime.days_from_civil)."""
    ya = y - (m <= 2)
    era = np.floor_divide(ya, 400)
    yoe = ya - era * 400
    mp = (m + 9) % 12
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146_097 + doe - 719_468


def _mask(arr: pa.Array, pat: str) -> np.ndarray:
    return (
        pc.fill_null(pc.match_substring_regex(arr, pat), False)
        .to_numpy(zero_copy_only=False)
    )


def _fast_path_config(cfg: ParserConfig) -> bool:
    return (
        cfg.location == "UTC"
        and cfg.timestamp_format is None
        and cfg.priority is None
        and not cfg.hostname
        and not cfg.tag
    )


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data_bytes, starts, ends) views of a String/LargeString array."""
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return data, offs[:-1], offs[1:]


def _gather_strings(
    buf: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    valid: np.ndarray | None = None,
) -> pa.Array:
    """Materialize per-row byte ranges as a new StringArray (ragged
    gather).  ``valid`` (optional bool mask) marks null rows — they
    contribute zero bytes and a cleared validity bit, so no second
    ``take`` pass is needed to null them out."""
    lens = (ends - starts).astype(np.int64)
    if valid is not None:
        lens = np.where(valid, lens, 0)
    n = len(lens)
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    total = int(out_offs[-1])
    vbuf = (
        None
        if valid is None
        else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    )
    if total == 0:
        if valid is None:
            return pa.array([""] * n, pa.string())
        return pa.Array.from_buffers(
            pa.large_string(),
            n,
            [vbuf, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(b"")],
        ).cast(pa.string())
    from rayslog.kernels import cparse

    lib = (
        cparse.get_lib()
        if not os.environ.get("RAYSLOG_NO_CKERNEL")
        else None
    )
    if lib is not None:
        # one C memcpy pass — no flat index arrays (8B of index per
        # payload byte), no fancy-indexing temporaries
        ends_eff = starts + lens
        data = np.empty(total, dtype=np.uint8)
        lib.gather_ranges(
            np.ascontiguousarray(buf),
            np.ascontiguousarray(starts, dtype=np.int64),
            np.ascontiguousarray(ends_eff, dtype=np.int64),
            n,
            np.ascontiguousarray(out_offs[:-1]),
            data,
        )
    else:
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_offs[:-1], lens)
            + np.repeat(starts, lens)
        )
        data = buf[idx]
    return pa.Array.from_buffers(
        pa.large_string(),
        n,
        [vbuf, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(data.tobytes())],
    ).cast(pa.string())


def _next_at_or_after(sorted_pos: np.ndarray, p: np.ndarray) -> np.ndarray:
    """For each p: the smallest element of sorted_pos >= p, else _HUGE."""
    j = np.searchsorted(sorted_pos, p)
    ok = j < len(sorted_pos)
    out = np.full(len(p), _HUGE, dtype=np.int64)
    if len(sorted_pos):
        out[ok] = sorted_pos[np.minimum(j[ok], len(sorted_pos) - 1)]
    return out


def _b(buf: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Clipped byte gather (matched rows are in-bounds by construction)."""
    return buf[np.minimum(idx, len(buf) - 1)].astype(np.int64)


def _d2(buf: np.ndarray, p: np.ndarray) -> np.ndarray:
    return (_b(buf, p) - 48) * 10 + (_b(buf, p + 1) - 48)


def parse_batch(
    batch: pa.Table, cfg: ParserConfig = DEFAULT_CONFIG, text_col: str = "text"
) -> pa.Table:
    """Append the parse columns (schema.PARSE_FIELDS) to an Arrow batch."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    out = batch
    parse_tbl = _parse_text_array(text, cfg)
    for f in PARSE_FIELDS:
        out = out.append_column(f, parse_tbl.column(f.name))
    return out


def _parse_text_array(text: pa.Array, cfg: ParserConfig) -> pa.Table:
    n = len(text)
    if n == 0:
        return pa.Table.from_arrays(
            [pa.nulls(0, f.type) for f in PARSE_FIELDS],
            schema=pa.schema(PARSE_FIELDS),
        )
    # The C automaton covers EVERY config: WithPriority/WithHostname/
    # WithTag are skip-flags + constant columns, WithLocation is a
    # vectorized post-hoc wall->epoch map, and a custom Go layout's
    # timestamps are precomputed per UNIQUE slice (dictionary-encoded)
    # and injected into the automaton.
    if not os.environ.get("RAYSLOG_NO_CKERNEL"):
        from rayslog.kernels import cparse

        if cparse.get_lib() is not None:
            return _parse_via_c(text, cfg)
    if not _fast_path_config(cfg):
        return _oracle_table(text.to_pylist(), cfg)

    buf, starts, ends = _string_buffers(text)
    byte_len = (ends - starts).astype(np.int64)
    char_len = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    null_mask = pc.is_null(text).to_numpy(zero_copy_only=False)
    is_ascii = (byte_len == char_len) & ~null_mask

    # A V3164/V5424 match IMPLIES the detect dialect (the char after the
    # priority '>' is a month letter / space vs a digit), so the fast
    # masks need only the two shape validators — detection patterns run
    # later on the (small) non-fast subset only.
    f3 = (
        is_ascii & _mask(text, V3164)
        & (byte_len <= oracle.MAX_PACKET_LEN_3164)
    )
    f5 = (
        is_ascii & _mask(text, V5424)
        & (byte_len <= oracle.MAX_PACKET_LEN_5424)
    )

    # rare classes (detection quirks, priority errors): classify only the
    # rows the fast paths did not take, on a filtered subset.
    slow = ~(f3 | f5)
    slow_idx = np.nonzero(slow)[0]
    d5424 = np.zeros(n, dtype=bool)
    d3164 = np.zeros(n, dtype=bool)
    dunk = np.zeros(n, dtype=bool)
    dquirk = np.zeros(n, dtype=bool)
    dpanic = np.zeros(n, dtype=bool)
    p_nostart = np.zeros(n, dtype=bool)
    p_tooshort = np.zeros(n, dtype=bool)
    p_toolong = np.zeros(n, dtype=bool)
    p_nondigit = np.zeros(n, dtype=bool)
    d3164[f3] = True
    d5424[f5] = True
    if len(slow_idx):
        sub = pc.take(text, pa.array(slow_idx))
        sub_ascii = is_ascii[slow_idx]
        d5424[slow_idx] = _mask(sub, _D_5424) & sub_ascii
        d3164[slow_idx] = _mask(sub, _D_3164) & sub_ascii
        dunk[slow_idx] = _mask(sub, _D_UNKNOWN) & sub_ascii
        dquirk[slow_idx] = _mask(sub, _D_QUIRK) & sub_ascii
        dpanic[slow_idx] = sub_ascii & ~(
            d5424[slow_idx] | d3164[slow_idx] | dunk[slow_idx] | dquirk[slow_idx]
        )
        pri_scope = d5424[slow_idx] | d3164[slow_idx] | dquirk[slow_idx]
        p_nostart[slow_idx] = pri_scope & _mask(sub, _P_NO_START)
        p_tooshort[slow_idx] = pri_scope & _mask(sub, _P_TOO_SHORT)
        p_toolong[slow_idx] = pri_scope & _mask(sub, _P_TOO_LONG)
        p_nondigit[slow_idx] = pri_scope & _mask(sub, _P_NON_DIGIT)
    pri_err = p_nostart | p_tooshort | p_toolong | p_nondigit

    # global terminator position indices (shared by both dialect walks)
    sp_idx = np.nonzero(buf == 32)[0]
    parts: list[pa.Table] = []
    part_idx: list[np.ndarray] = []
    extra_fb = np.zeros(n, dtype=bool)

    f3_idx = np.nonzero(f3)[0]
    if len(f3_idx):
        t3, fb3_local = _extract_3164(buf, starts, ends, f3_idx, sp_idx, cfg)
        keep = ~fb3_local
        parts.append(t3.take(pa.array(np.nonzero(keep)[0])))
        part_idx.append(f3_idx[keep])
        extra_fb[f3_idx[fb3_local]] = True

    f5_idx = np.nonzero(f5)[0]
    if len(f5_idx):
        t5 = _extract_5424(buf, starts, ends, f5_idx, sp_idx)
        parts.append(t5)
        part_idx.append(f5_idx)

    # vectorized-classified error rows
    verr = (dpanic | dunk | pri_err) & ~(f3 | f5)
    verr_idx = np.nonzero(verr)[0]
    if len(verr_idx):
        rfc = np.zeros(n, dtype=np.int8)
        rfc[d3164] = oracle.RFC_3164
        rfc[d5424 | dquirk] = oracle.RFC_5424
        err = np.full(n, None, dtype=object)
        err[dpanic] = ERR_INDEX_OUT_OF_RANGE
        err[dunk] = ERR_VERSION_NOT_FOUND
        err[p_nondigit] = ERR_PRIORITY_NON_DIGIT
        err[p_toolong] = ERR_PRIORITY_TOO_LONG
        err[p_tooshort] = ERR_PRIORITY_TOO_SHORT
        err[p_nostart] = ERR_PRIORITY_NO_START
        parts.append(_error_table(rfc[verr_idx], err[verr_idx]))
        part_idx.append(verr_idx)

    fb = (~(f3 | f5 | verr)) | extra_fb
    fb_idx = np.nonzero(fb)[0]
    if len(fb_idx):
        fb_texts = pc.take(text, pa.array(fb_idx)).to_pylist()
        parts.append(_oracle_table(fb_texts, cfg))
        part_idx.append(fb_idx)

    if len(parts) == 1:
        return parts[0]
    merged = pa.concat_tables(parts)
    order = np.argsort(np.concatenate(part_idx), kind="stable")
    return merged.take(pa.array(order))


def _extract_3164(
    buf: np.ndarray,
    all_starts: np.ndarray,
    all_ends: np.ndarray,
    idx: np.ndarray,
    sp_idx: np.ndarray,
    cfg: ParserConfig,
) -> tuple[pa.Table, np.ndarray]:
    """Byte-level field extraction for V3164-matched rows.

    Returns (table, local_fallback_mask) — the mask flags rows whose tag
    junk overruns the 32-byte scan window (rfc3164.go:285-308), the one
    canonical-shape case byte extraction does not model.
    """
    s = all_starts[idx]
    e = all_ends[idx]
    m = len(idx)

    # priority: '<' at s, '>' at s+2..s+4 (validated)
    gt = np.where(
        _b(buf, s + 2) == 62,
        s + 2,
        np.where(_b(buf, s + 3) == 62, s + 3, s + 4),
    )
    d1 = _b(buf, s + 1) - 48
    d2_ = _b(buf, s + 2) - 48
    d3_ = _b(buf, s + 3) - 48
    pri = np.where(
        gt == s + 2, d1, np.where(gt == s + 3, d1 * 10 + d2_, d1 * 100 + d2_ * 10 + d3_)
    )

    # optional leading space (parseHeader, rfc3164.go:156-158)
    ts0 = gt + 1 + (_b(buf, gt + 1) == 32)

    mon_code = _b(buf, ts0) * 65536 + _b(buf, ts0 + 1) * 256 + _b(buf, ts0 + 2)
    mon = np.zeros(m, dtype=np.int64)
    for i, code in enumerate(_MONTH_CODES):
        mon = np.where(mon_code == code, i + 1, mon)
    day_sp = _b(buf, ts0 + 4) == 32
    day = np.where(day_sp, _b(buf, ts0 + 5) - 48, _d2(buf, ts0 + 4))
    hh = _d2(buf, ts0 + 7)
    mi = _d2(buf, ts0 + 10)
    ss = _d2(buf, ts0 + 13)

    ts_ok = (
        (mon >= 1)
        & (day >= 1)
        & (day <= _DAYS_IN_MONTH_Y0[np.clip(mon, 0, 12)])
        & (hh <= 23)
        & (mi <= 59)
        & (ss <= 59)
    )
    yr = np.int64(cfg.effective_year())
    ts_us = (
        _days_from_civil_np(np.full(m, yr), np.clip(mon, 1, 12), day) * (86_400 * US)
        + hh * (3_600 * US)
        + mi * (60 * US)
        + ss * US
    )

    host0 = ts0 + 16
    host_end = np.minimum(_next_at_or_after(sp_idx, host0), e)

    # tag walk (rfc3164.go:272-315)
    tag0 = host_end + 1
    stop_idx = np.nonzero(
        (buf == 32) | (buf == 91) | (buf == 93) | (buf == 58)
    )[0]
    first_stop = np.minimum(_next_at_or_after(stop_idx, tag0), e)
    win = tag0 + 32
    tag_end = np.minimum(np.minimum(first_stop, e), win)
    stop_in_win = first_stop < np.minimum(e, win)
    stop_is_space = stop_in_win & (_b(buf, first_stop) == 32)
    stop_is_junk = stop_in_win & ~stop_is_space
    jsp = np.minimum(_next_at_or_after(sp_idx, first_stop), e)
    fb_local = stop_is_junk & (jsp > win)

    content_start = np.where(
        stop_is_space,
        first_stop + 1,
        np.where(stop_is_junk, np.minimum(jsp + 1, e), np.minimum(e, win)),
    )
    content_start = np.minimum(content_start, e)

    hostname = _gather_strings(buf, host0, host_end)
    tag = _gather_strings(buf, tag0, tag_end)
    content = pc.utf8_trim(_gather_strings(buf, content_start, e), " ")

    nulls_s = pa.nulls(m, pa.string())
    ok = pa.array(ts_ok)
    err = pc.if_else(
        ok, pa.nulls(m, pa.string()), pa.scalar(ERR_TIMESTAMP_UNKNOWN_FORMAT)
    )
    tbl = pa.Table.from_arrays(
        [
            pa.array(np.full(m, oracle.RFC_3164, dtype=np.int8)),
            pa.array(pri.astype(np.int32), mask=~ts_ok),
            pa.array((pri // 8).astype(np.int32), mask=~ts_ok),
            pa.array((pri % 8).astype(np.int32), mask=~ts_ok),
            pa.nulls(m, pa.int32()),
            pa.array(ts_us, pa.timestamp("us"), mask=~ts_ok),
            pa.nulls(m, pa.int16()),
            pc.if_else(ok, hostname, nulls_s),
            pc.if_else(ok, tag, nulls_s),
            pc.if_else(ok, content, nulls_s),
            nulls_s,
            nulls_s,
            nulls_s,
            nulls_s,
            nulls_s,
            err,
        ],
        schema=pa.schema(PARSE_FIELDS),
    )
    return tbl, fb_local


def _extract_5424(
    buf: np.ndarray,
    all_starts: np.ndarray,
    all_ends: np.ndarray,
    idx: np.ndarray,
    sp_idx: np.ndarray,
) -> pa.Table:
    """Byte-level field extraction for V5424-matched rows."""
    s = all_starts[idx]
    e = all_ends[idx]
    m = len(idx)

    gt = np.where(
        _b(buf, s + 2) == 62,
        s + 2,
        np.where(_b(buf, s + 3) == 62, s + 3, s + 4),
    )
    d1 = _b(buf, s + 1) - 48
    d2_ = _b(buf, s + 2) - 48
    d3_ = _b(buf, s + 3) - 48
    pri = np.where(
        gt == s + 2, d1, np.where(gt == s + 3, d1 * 10 + d2_, d1 * 100 + d2_ * 10 + d3_)
    )
    ver = _b(buf, gt + 1) - 48

    ts0 = gt + 3
    ts_end = np.minimum(_next_at_or_after(sp_idx, ts0), e)
    ts_nil = _b(buf, ts0) == 45  # '-' (single-char alternative, validated)

    yy = (
        (_b(buf, ts0) - 48) * 1000
        + (_b(buf, ts0 + 1) - 48) * 100
        + (_b(buf, ts0 + 2) - 48) * 10
        + (_b(buf, ts0 + 3) - 48)
    )
    mo = _d2(buf, ts0 + 5)
    dd = _d2(buf, ts0 + 8)
    hh = _d2(buf, ts0 + 11)
    mi = _d2(buf, ts0 + 14)
    ss = _d2(buf, ts0 + 17)

    is_z = _b(buf, ts_end - 1) == 90  # 'Z'
    tz0 = np.where(is_z, ts_end - 1, ts_end - 6)
    tz_sign = np.where(_b(buf, tz0) == 43, 1, -1)  # '+'
    off = np.where(
        is_z, 0, tz_sign * (_d2(buf, tz0 + 1) * 60 + _d2(buf, tz0 + 4))
    )
    tz_hh_bad = ~is_z & (_d2(buf, tz0 + 1) > 23)
    tz_mm_bad = ~is_z & (_d2(buf, tz0 + 4) > 59)

    has_frac = _b(buf, ts0 + 19) == 46  # '.'
    frac0 = ts0 + 20
    frac_len = np.where(has_frac, tz0 - frac0, 0)
    frac_us = np.zeros(m, dtype=np.int64)
    pow10 = np.array([100_000, 10_000, 1_000, 100, 10, 1], dtype=np.int64)
    for k in range(6):
        dig = _b(buf, frac0 + k) - 48
        frac_us += np.where(k < frac_len, dig, 0) * pow10[k]

    # month/day carry their own error strings (rfc5424.go:391-402); the
    # time/offset range errors collapse to ErrTimestampUnknownFormat.
    mo_bad = ~ts_nil & ((mo < 1) | (mo > 12))
    dd_bad = ~ts_nil & ~mo_bad & ((dd < 1) | (dd > 31))
    time_bad = (
        ~ts_nil
        & ~mo_bad
        & ~dd_bad
        & ((hh > 23) | (mi > 59) | (ss > 59) | tz_hh_bad | tz_mm_bad)
    )
    ok_np = ~(mo_bad | dd_bad | time_bad)

    ts_us = (
        _days_from_civil_np(yy, np.clip(mo, 1, 12), dd) * (86_400 * US)
        + hh * (3_600 * US)
        + mi * (60 * US)
        + ss * US
        + frac_us
        - off * (60 * US)
    )

    # token walk: HOSTNAME APP PROC MSGID, single-space separated
    host0 = ts_end + 1
    he = np.minimum(_next_at_or_after(sp_idx, host0), e)
    app0 = he + 1
    ae = np.minimum(_next_at_or_after(sp_idx, app0), e)
    proc0 = ae + 1
    pe = np.minimum(_next_at_or_after(sp_idx, proc0), e)
    mid0 = pe + 1
    me = np.minimum(_next_at_or_after(sp_idx, mid0), e)

    # STRUCTURED-DATA (rfc5424.go:597-636): '-' or up to the first ']'
    # followed by a space or end-of-row.
    sd0 = me + 1
    sd_nil = _b(buf, sd0) == 45
    nb = np.empty_like(buf)
    if len(buf):
        nb[:-1] = buf[1:]
        nb[-1] = 0
    row_last = np.zeros(len(buf) + 1, dtype=bool)
    nz = all_ends > all_starts
    row_last[all_ends[nz] - 1] = True
    rb_cand = np.nonzero(
        (buf == 93) & ((nb == 32) | row_last[: len(buf)])
    )[0]
    sd_close = _next_at_or_after(rb_cand, sd0)
    sd_end = np.where(sd_nil, sd0 + 1, np.minimum(sd_close + 1, e))
    msg0 = np.minimum(sd_end + 1, e)

    hostname = _gather_strings(buf, host0, he)
    app = _gather_strings(buf, app0, ae)
    proc = _gather_strings(buf, proc0, pe)
    msgid = _gather_strings(buf, mid0, me)
    sd = _gather_strings(buf, sd0, sd_end)
    message = pc.utf8_trim(_gather_strings(buf, msg0, e), " ")

    ok = pa.array(ok_np)
    nulls_s = pa.nulls(m, pa.string())
    err = np.full(m, None, dtype=object)
    err[mo_bad] = ERR_MONTH_INVALID
    err[dd_bad] = ERR_DAY_INVALID
    err[time_bad] = ERR_TIMESTAMP_UNKNOWN_FORMAT

    tbl = pa.Table.from_arrays(
        [
            pa.array(np.full(m, oracle.RFC_5424, dtype=np.int8)),
            pa.array(pri.astype(np.int32), mask=~ok_np),
            pa.array((pri // 8).astype(np.int32), mask=~ok_np),
            pa.array((pri % 8).astype(np.int32), mask=~ok_np),
            pa.array(ver.astype(np.int32), mask=~ok_np),
            pa.array(ts_us, pa.timestamp("us"), mask=~(ok_np & ~ts_nil)),
            pa.array(
                off.astype(np.int16), pa.int16(), mask=~(ok_np & ~ts_nil)
            ),
            pc.if_else(ok, hostname, nulls_s),
            nulls_s,
            nulls_s,
            pc.if_else(ok, app, nulls_s),
            pc.if_else(ok, proc, nulls_s),
            pc.if_else(ok, msgid, nulls_s),
            pc.if_else(ok, sd, nulls_s),
            pc.if_else(ok, message, nulls_s),
            pa.array(err, pa.string()),
        ],
        schema=pa.schema(PARSE_FIELDS),
    )
    return tbl


def _precompute_custom_ts(
    buf: np.ndarray, starts: np.ndarray, ends: np.ndarray, cfg: ParserConfig
) -> dict:
    """Per-row epooch precompute for a custom Go layout (WithTimestampFormat).

    Vectorized: (1) replicate the priority scan in byte arithmetic to
    find each row's ts-slice offset; (2) gather the fixed-length slices
    and DICTIONARY-ENCODE them (log timestamps repeat heavily); (3) run
    the oracle's own ``_parse_ts_3164`` once per UNIQUE slice — parity
    by construction, including default-year substitution, zone tokens
    and WithLocation — then scatter epochs back.  Rows whose priority
    shape the scan can't prove canonical get PRE_NONE (per-row oracle);
    the C automaton cross-checks the assumed offset against its own
    cursor and demotes any disagreement to the oracle as well.
    """
    from rayslog.kernels import cparse
    from rayslog.kernels.oracle import (
        MAX_PACKET_LEN_3164,
        _parse_ts_3164,
        ParserError,
    )

    fmt_len = len(cfg.timestamp_format)
    n = len(starts)
    rlen = ends - starts
    l = np.minimum(rlen, MAX_PACKET_LEN_3164)
    state = np.full(n, cparse.PRE_NONE, dtype=np.uint8)
    pre_start = np.zeros(n, dtype=np.int64)
    pre_us = np.zeros(n, dtype=np.int64)

    if cfg.priority is not None:
        pri_end = np.zeros(n, dtype=np.int64)
        canonical = rlen > 0
    else:
        # canonical '<d{1,3}>' shapes only; everything else -> oracle
        b0 = _b(buf, starts)
        d1 = (_b(buf, starts + 1) >= 48) & (_b(buf, starts + 1) <= 57)
        d2 = (_b(buf, starts + 2) >= 48) & (_b(buf, starts + 2) <= 57)
        d3 = (_b(buf, starts + 3) >= 48) & (_b(buf, starts + 3) <= 57)
        g2 = _b(buf, starts + 2) == 62
        g3 = _b(buf, starts + 3) == 62
        g4 = _b(buf, starts + 4) == 62
        canonical = (
            (b0 == 60)
            & d1
            & (g2 | (d2 & (g3 | (d3 & g4))))
            & (rlen >= 4)
        )
        pri_end = np.where(g2, starts + 3, np.where(g3, starts + 4, starts + 5))
        pri_end = pri_end - starts  # row-relative

    # optional leading space (parseHeader); reading at pri_end needs
    # pri_end < rlen (else the oracle raises IndexError -> oracle row)
    in_row = canonical & (pri_end < rlen)
    sp = np.zeros(n, dtype=bool)
    sp[in_row] = _b(buf, (starts + pri_end)[in_row]) == 32
    ts0 = pri_end + sp
    fits = in_row & (ts0 + fmt_len <= l)
    # rows canonical but not fitting: the oracle SKIPS the layout and
    # errors with TS_UNKNOWN -> PRE_FAIL
    state[in_row & ~fits] = cparse.PRE_FAIL
    pre_start[in_row] = ts0[in_row]

    idx = np.nonzero(fits)[0]
    if len(idx):
        s_abs = (starts + ts0)[idx]
        # fixed-width byte matrix of the ts slices (m x fmt_len; small)
        sl = buf[
            np.minimum(
                s_abs[:, None] + np.arange(fmt_len, dtype=np.int64),
                len(buf) - 1,
            )
        ]
        # non-ASCII slices go to the per-row oracle (C flags the whole
        # row anyway; avoids building invalid UTF-8 strings here)
        ascii_ok = (sl < 0x80).all(axis=1)
        state[idx[~ascii_ok]] = cparse.PRE_NONE
        idx, sl = idx[ascii_ok], sl[ascii_ok]
    if len(idx):
        uniq, codes = np.unique(sl, axis=0, return_inverse=True)
        u_us = np.zeros(len(uniq), dtype=np.int64)
        u_ok = np.zeros(len(uniq), dtype=bool)
        for i in range(len(uniq)):
            try:
                ts_us, _ = _parse_ts_3164(
                    uniq[i].tobytes(), 0, fmt_len, cfg
                )
                u_us[i] = ts_us
                u_ok[i] = True
            except ParserError:
                pass
        pre_us[idx] = u_us[codes]
        state[idx] = np.where(u_ok[codes], cparse.PRE_OK, cparse.PRE_FAIL)

    return {
        "ts_fmt_len": fmt_len,
        "ts_pre_us": pre_us,
        "ts_pre_state": state,
        "ts_pre_start": pre_start,
    }


def _parse_via_c(text: pa.Array, cfg: ParserConfig) -> pa.Table:
    """Assemble the parse table from the fused C automaton's output
    (rayslog/kernels/cparse.py): one C pass computes every fixed-width
    field, error class and string byte-range; Python does one ragged
    gather per string column plus O(columns) masked-array constructions.
    Non-ASCII rows carry a fallback flag and run through the row oracle,
    merged back in row order (same pattern as the numpy path)."""
    from rayslog.kernels import cparse

    buf, starts, ends = _string_buffers(text)
    null_mask = pc.is_null(text).to_numpy(zero_copy_only=False)
    if null_mask.any():
        # null rows parse as empty bytes (oracle parse_row(None) parity)
        ends = np.where(null_mask, starts, ends)
    flags, pri_ov = cparse.config_flags(cfg)
    pre_kwargs = {}
    if cfg.timestamp_format is not None:
        flags |= cparse.CFG_CUSTOM_TS
        pre_kwargs = _precompute_custom_ts(buf, starts, ends, cfg)
    raw = cparse.parse_raw(
        buf, starts, ends, cfg.effective_year(), flags, pri_ov,
        **pre_kwargs,
    )
    n = len(text)

    fb = raw["fallback"].astype(bool)
    ok = (raw["err"] == 0) & ~fb
    rfc = raw["rfc"]
    is5424 = rfc == np.int8(oracle.RFC_5424)
    is3164 = rfc == np.int8(oracle.RFC_3164)

    # WithLocation: 3164 wall-clock rows map through the zone's fold-0
    # wall->epoch table (5424 carries explicit offsets; unaffected).
    # Custom-layout epochs arrive FINAL from _precompute_custom_ts
    # (zone/location applied per unique slice) — no second adjustment.
    if cfg.timestamp_format is None and cfg.location not in ("UTC", "", None):
        wz = cparse.wall_zone(cfg.location, cfg.effective_year())
        adj = ok & is3164 & raw["ts_valid"].astype(bool)
        if adj.any():
            raw["ts"][adj] = wz.to_epoch(raw["ts"][adj])

    # error strings via one vectorized dictionary take (code 0 -> null)
    err_arr = pc.take(
        pa.array(cparse.ERROR_STRINGS, pa.string()),
        pa.array(raw["err"].astype(np.int32)),
    )

    pri = raw["pri"].astype(np.int32)
    ranges = raw["ranges"].reshape(n, len(cparse.STR_FIELDS), 2)

    def str_col(i: int) -> pa.Array:
        s = ranges[:, i, 0]
        e = ranges[:, i, 1]
        valid = s >= 0
        if not valid.any():
            return pa.nulls(n, pa.string())
        return _gather_strings(
            buf, np.where(valid, s, 0), np.where(valid, e, 0), valid
        )

    ts_ok = ok & raw["ts_valid"].astype(bool)
    tz_ok = ok & raw["tz_valid"].astype(bool)
    ver_ok = ok & is5424

    # override constants substitute the skipped fields' columns
    if cfg.hostname:
        host_col = pc.if_else(
            pa.array(ok), pa.scalar(cfg.hostname), pa.nulls(n, pa.string())
        )
    else:
        host_col = str_col(0)
    if cfg.tag:
        tag_col = pc.if_else(
            pa.array(ok & is3164), pa.scalar(cfg.tag), pa.nulls(n, pa.string())
        )
    else:
        tag_col = str_col(1)

    tbl = pa.Table.from_arrays(
        [
            pa.array(rfc, pa.int8()),
            pa.array(pri, mask=~ok),
            pa.array((pri // 8).astype(np.int32), mask=~ok),
            pa.array((pri % 8).astype(np.int32), mask=~ok),
            pa.array(raw["ver"], mask=~ver_ok),
            pa.array(raw["ts"], pa.timestamp("us"), mask=~ts_ok),
            pa.array(raw["tz"], pa.int16(), mask=~tz_ok),
            host_col,
            tag_col,
            str_col(2),   # content
            str_col(3),   # app_name
            str_col(4),   # proc_id
            str_col(5),   # msg_id
            str_col(6),   # structured_data
            str_col(7),   # message
            err_arr,
        ],
        schema=pa.schema(PARSE_FIELDS),
    )
    fb_idx = np.nonzero(fb)[0]
    if not len(fb_idx):
        return tbl
    keep_idx = np.nonzero(~fb)[0]
    fb_texts = pc.take(text, pa.array(fb_idx)).to_pylist()
    merged = pa.concat_tables(
        [tbl.take(pa.array(keep_idx)), _oracle_table(fb_texts, cfg)]
    )
    order = np.argsort(np.concatenate([keep_idx, fb_idx]), kind="stable")
    return merged.take(pa.array(order))


def _error_table(rfc: np.ndarray, err: np.ndarray) -> pa.Table:
    m = len(rfc)
    arrays = []
    for f in PARSE_FIELDS:
        if f.name == "rfc":
            arrays.append(pa.array(rfc, pa.int8()))
        elif f.name == "parse_error":
            arrays.append(pa.array(err, pa.string()))
        else:
            arrays.append(pa.nulls(m, f.type))
    return pa.Table.from_arrays(arrays, schema=pa.schema(PARSE_FIELDS))


def _oracle_table(texts: list, cfg: ParserConfig) -> pa.Table:
    """Row-oracle parse of a list of texts -> Arrow table (exact path)."""
    cols = {name: [] for name in PARSE_COLUMN_NAMES}
    for t in texts:
        row = oracle.parse_row(t if t is not None else b"", cfg)
        cols["rfc"].append(row["rfc"])
        cols["priority"].append(row["priority"])
        cols["facility"].append(row["facility"])
        cols["severity"].append(row["severity"])
        cols["version"].append(row["version"])
        cols["ts_parsed"].append(row["timestamp"])
        cols["tz_offset_minutes"].append(row["tz_offset_minutes"])
        cols["hostname"].append(row["hostname"])
        cols["tag"].append(row["tag"])
        cols["content"].append(row["content"])
        cols["app_name"].append(row["app_name"])
        cols["proc_id"].append(row["proc_id"])
        cols["msg_id"].append(row["msg_id"])
        cols["structured_data"].append(row["structured_data"])
        cols["message"].append(row["message"])
        cols["parse_error"].append(row["parse_error"])
    arrays = []
    for f in PARSE_FIELDS:
        arrays.append(pa.array(cols[f.name], f.type))
    return pa.Table.from_arrays(arrays, schema=pa.schema(PARSE_FIELDS))
