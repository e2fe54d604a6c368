"""Fused C byte-automaton parse kernel (the per-core step function).

The numpy fast path (vectorized.py) costs ~10 Arrow kernel calls + 9
ragged gathers per batch; this module replaces all of it with ONE C pass
per batch: a direct transcription of the row oracle's automaton
(detection -> dialect parse -> error classification) over the Arrow
string buffers, compiled on first use with the system gcc and loaded
via ctypes.  Reference semantics are cited in oracle.py; the C code
mirrors oracle.py statement-for-statement, including the Go
panic-parity (index-out-of-range) points and the strconv.Atoi
sign-acceptance quirk.

Scope: DEFAULT config only (UTC location, default RFC3164 layouts, no
WithX overrides) and ASCII rows; rows containing any byte >= 0x80 get a
``fallback`` flag and are parsed by the Python oracle (byte semantics
still need UTF-8-safe string materialization).  Oracle equivalence is
enforced by tests/test_vectorized.py (golden vectors + 30k mutation
sweep + hypothesis fuzz) running against whichever kernel is active.

If no C toolchain is available the module degrades to ``LIB = None``
and vectorized.py keeps its numpy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

from rayslog import errors as E

#: error-code table (index 0 = success). Python maps codes -> canonical
#: strings; C only ever sees the small integers.
ERROR_STRINGS = [
    None,
    E.ERR_EOL,
    E.ERR_NO_SPACE,
    E.ERR_PRIORITY_NO_START,
    E.ERR_PRIORITY_EMPTY,
    E.ERR_PRIORITY_NO_END,
    E.ERR_PRIORITY_TOO_SHORT,
    E.ERR_PRIORITY_TOO_LONG,
    E.ERR_PRIORITY_NON_DIGIT,
    E.ERR_VERSION_NOT_FOUND,
    E.ERR_TIMESTAMP_UNKNOWN_FORMAT,
    E.ERR_YEAR_INVALID,
    E.ERR_MONTH_INVALID,
    E.ERR_DAY_INVALID,
    E.ERR_INVALID_TIME_FORMAT,
    E.ERR_INVALID_APP_NAME,
    E.ERR_INVALID_PROC_ID,
    E.ERR_INVALID_MSG_ID,
    E.ERR_NO_STRUCTURED_DATA,
    E.ERR_INDEX_OUT_OF_RANGE,
]

C_SOURCE = r"""
#include <stdint.h>
#include <string.h>

#define ERR_OK 0
#define ERR_EOL 1
#define ERR_NO_SPACE 2
#define ERR_PRI_NO_START 3
#define ERR_PRI_EMPTY 4
#define ERR_PRI_NO_END 5
#define ERR_PRI_TOO_SHORT 6
#define ERR_PRI_TOO_LONG 7
#define ERR_PRI_NON_DIGIT 8
#define ERR_VERSION_NOT_FOUND 9
#define ERR_TS_UNKNOWN 10
#define ERR_YEAR 11
#define ERR_MONTH 12
#define ERR_DAY 13
#define ERR_TIME_FORMAT 14
#define ERR_APP 15
#define ERR_PROC 16
#define ERR_MSGID 17
#define ERR_NO_SD 18
#define ERR_INDEX 19

#define RFC_UNKNOWN 0
#define RFC_3164 1
#define RFC_5424 2
#define NO_VERSION -1

#define MAXLEN_3164 2048
#define MAXLEN_5424 3048

#define US_SEC  1000000LL
#define US_MIN  60000000LL
#define US_HOUR 3600000000LL
#define US_DAY  86400000000LL

/* string-field slots in the ranges array (2 int64 per slot per row) */
#define F_HOST 0
#define F_TAG 1
#define F_CONTENT 2
#define F_APP 3
#define F_PROC 4
#define F_MSGID 5
#define F_SD 6
#define F_MSG 7
#define NSTR 8

static inline int is_digit(uint8_t c) { return c >= '0' && c <= '9'; }

/* Howard Hinnant days-from-civil (proleptic Gregorian, any year). */
static int64_t days_from_civil(int64_t y, int64_t m, int64_t d) {
    y -= m <= 2;
    int64_t era = (y >= 0 ? y : y - 399) / 400;
    int64_t yoe = y - era * 400;
    int64_t mp = (m + 9) % 12;
    int64_t doy = (153 * mp + 2) / 5 + d - 1;
    int64_t doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
    return era * 146097 + doe - 719468;
}

static inline int is_leap(int64_t y) {
    return (y % 4 == 0) && (y % 100 != 0 || y % 400 == 0);
}

static const int DIM[] = {31,28,31,30,31,30,31,31,30,31,30,31};
static inline int days_in_month(int m, int64_t y) {
    if (m == 2 && is_leap(y)) return 29;
    return DIM[m-1];
}

/* Go strconv.Atoi on a fixed-width ASCII slice: optional sign + digits
   only (parsercommon Parse2Digits passes the raw 2 bytes to Atoi, so
   "+5" parses as 5 — bug-parity with the reference). */
static int go_atoi_n(const uint8_t* p, int n, int64_t* out) {
    int i = 0, neg = 0;
    if (n > 0 && (p[0] == '+' || p[0] == '-')) { neg = (p[0] == '-'); i = 1; }
    if (i >= n) return -1;
    int64_t v = 0;
    for (; i < n; i++) {
        if (!is_digit(p[i])) return -1;
        v = v * 10 + (p[i] - '0');
    }
    *out = neg ? -v : v;
    return 0;
}

/* parse the default RFC3164 layouts over a 15-byte slice.
   which: 0 = "Jan 02 15:04:05", 1 = "Jan  2 15:04:05".
   Implements the go_time_parse token machine for exactly these tokens
   (incl. getnum fixed/non-fixed widths, the implicit value-side
   fraction after seconds, extra-text and day-range checks; year-0 is
   leap so Feb 29 passes).  Returns 0 on success. */
static int parse_3164_ts_slice(const uint8_t* v, int which,
                               int* mo, int* d, int* h, int* mi, int* s,
                               int64_t* us) {
    static const char* MONTHS = "janfebmaraprmayjunjulaugsepoctnovdec";
    int p = 0;
    /* month: short-name case-insensitive 3-byte match */
    uint8_t a = v[0] | 0x20, b = v[1] | 0x20, c = v[2] | 0x20;
    int m = 0;
    for (int i = 0; i < 12; i++) {
        if (a == (uint8_t)MONTHS[i*3] && b == (uint8_t)MONTHS[i*3+1]
            && c == (uint8_t)MONTHS[i*3+2]) { m = i + 1; break; }
    }
    if (!m) return -1;
    *mo = m;
    p = 3;
    if (v[p++] != ' ') return -1;
    if (which == 0) {
        /* "02": fixed 2-digit day */
        if (!is_digit(v[p]) || !is_digit(v[p+1])) return -1;
        *d = (v[p]-'0')*10 + (v[p+1]-'0');
        p += 2;
    } else {
        /* literal space then stdDay "2": 1-2 digits */
        if (v[p++] != ' ') return -1;
        if (!is_digit(v[p])) return -1;
        if (is_digit(v[p+1]) && p + 1 < 15) {
            *d = (v[p]-'0')*10 + (v[p+1]-'0'); p += 2;
        } else { *d = v[p]-'0'; p += 1; }
    }
    if (p >= 15 || v[p++] != ' ') return -1;
    /* hour "15": getnum non-fixed (1-2 digits) */
    if (p >= 15 || !is_digit(v[p])) return -1;
    if (p + 1 < 15 && is_digit(v[p+1])) { *h = (v[p]-'0')*10 + (v[p+1]-'0'); p += 2; }
    else { *h = v[p]-'0'; p += 1; }
    if (*h >= 24) return -1;
    if (p >= 15 || v[p++] != ':') return -1;
    /* minute "04": fixed */
    if (p + 1 >= 15 || !is_digit(v[p]) || !is_digit(v[p+1])) return -1;
    *mi = (v[p]-'0')*10 + (v[p+1]-'0'); p += 2;
    if (*mi > 59) return -1;
    if (p >= 15 || v[p++] != ':') return -1;
    /* second "05": fixed */
    if (p + 1 >= 15 || !is_digit(v[p]) || !is_digit(v[p+1])) return -1;
    *s = (v[p]-'0')*10 + (v[p+1]-'0'); p += 2;
    if (*s > 59) return -1;
    /* implicit fraction: layout has no fraction token, but Go accepts
       '.'/','+digits right after seconds */
    *us = 0;
    if (p + 1 < 15 && (v[p] == '.' || v[p] == ',') && is_digit(v[p+1])) {
        int q = p + 1;
        while (q < 15 && is_digit(v[q])) q++;
        /* parseNanoseconds over at most 9 digits, then ns -> us */
        int nd = q - (p + 1); if (nd > 9) nd = 9;
        int64_t ns = 0;
        for (int i = 0; i < nd; i++) ns = ns * 10 + (v[p+1+i]-'0');
        for (int i = nd; i < 9; i++) ns *= 10;
        *us = ns / 1000;
        p = q;
    }
    if (p != 15) return -1;              /* extra text */
    /* day range check: year 0 (leap) */
    if (*d < 1 || *d > days_in_month(*mo, 0)) return -1;
    return 0;
}

/* ParsePriority (parsercommon.go:50-94). Returns err code; on success
   sets *pri and *cursor. */
static int parse_priority(const uint8_t* buf, int64_t l,
                          int64_t* cursor, int64_t* pri) {
    if (l <= 0) return ERR_PRI_EMPTY;
    if (buf[0] != '<') return ERR_PRI_NO_START;
    int64_t i = 1, p = 0;
    while (i < l) {
        if (i >= 5) return ERR_PRI_TOO_LONG;
        uint8_t c = buf[i];
        if (c == '>') {
            if (i == 1) return ERR_PRI_TOO_SHORT;
            *pri = p; *cursor = i + 1; return ERR_OK;
        }
        if (is_digit(c)) p = p * 10 + (c - '0');
        else return ERR_PRI_NON_DIGIT;
        i++;
    }
    return ERR_PRI_NO_END;
}

/* Parse2Digits with the Atoi sign quirk; lo/hi range check. */
static int parse_2digits(const uint8_t* buf, int64_t l, int64_t* cursor,
                         int lo, int hi, int errcode, int64_t* out) {
    if (*cursor + 2 > l) return ERR_EOL;
    int64_t v;
    int bad = go_atoi_n(buf + *cursor, 2, &v);
    *cursor += 2;
    if (bad) return errcode;
    if (v < lo || v > hi) return errcode;
    *out = v;
    return ERR_OK;
}

static void set_range(int64_t* ranges, int64_t row, int field,
                      int64_t s, int64_t e) {
    ranges[(row * NSTR + field) * 2] = s;
    ranges[(row * NSTR + field) * 2 + 1] = e;
}

/* config-override flags (rfc3164.go:57-75, rfc5424.go:92-106): the
   reference's WithX options SKIP parsing of the field; the override
   VALUES are constants substituted on the Python side. */
#define CFG_PRI  1   /* WithPriority: no <pri> parse, cursor stays 0 */
#define CFG_HOST 2   /* WithHostname: host token NOT consumed */
#define CFG_TAG  4   /* WithTag (3164): tag walk skipped entirely */
#define CFG_CUSTOM_TS 8  /* WithTimestampFormat: 3164 epoch precomputed
                            per row by Python (unique-slice go_time_parse);
                            ts_pre arrays carry the result */

/* ts_pre_state values */
#define PRE_FAIL 0   /* layout did not parse -> ErrTimestampUnknownFormat */
#define PRE_OK 1
#define PRE_NONE 2   /* Python could not pre-scan this row -> oracle */

/* one row; returns nothing — writes outputs.  rlen = real byte length,
   base = offset of the row start in buf. */
static void parse_row(const uint8_t* data, int64_t base, int64_t rlen,
                      int32_t default_year, int32_t cfg_flags,
                      int64_t pri_override, int64_t ts_fmt_len,
                      const int64_t* ts_pre_us, const uint8_t* ts_pre_state,
                      const int64_t* ts_pre_start, int64_t row,
                      int8_t* rfc, int32_t* pri_out, int32_t* ver_out,
                      int64_t* ts_out, uint8_t* ts_valid,
                      int16_t* tz_out, uint8_t* tz_valid,
                      int64_t* ranges, int16_t* err_out,
                      uint8_t* fallback) {
    const uint8_t* buf = data + base;
    rfc[row] = RFC_UNKNOWN;
    err_out[row] = ERR_OK;
    ts_valid[row] = 0;
    tz_valid[row] = 0;

    /* non-ASCII rows -> Python oracle (UTF-8-safe string handling) */
    for (int64_t i = 0; i < rlen; i++) {
        if (buf[i] >= 0x80) { fallback[row] = 1; return; }
    }

    /* ---- detection (syslogparser.go:30-56) ---- */
    int v = 0;
    int found_gt = 0;
    for (int i = 0; i < 10; i++) {
        if (i >= rlen) { err_out[row] = ERR_INDEX; return; }
        if (buf[i] == '>') {
            int64_t x = i + 1;
            if (x >= 10) { err_out[row] = ERR_VERSION_NOT_FOUND; return; }
            if (x >= rlen) { err_out[row] = ERR_INDEX; return; }
            uint8_t c = buf[x];
            v = is_digit(c) ? (c - '0') : NO_VERSION;
            found_gt = 1;
            break;
        }
    }
    (void)found_gt;
    int dialect = (v == NO_VERSION) ? RFC_3164 : RFC_5424;
    rfc[row] = (int8_t)dialect;

    if (dialect == RFC_3164) {
        int64_t l = rlen < MAXLEN_3164 ? rlen : MAXLEN_3164;
        int64_t cursor = 0, pri = 0;
        if (cfg_flags & CFG_PRI) { pri = pri_override; }
        else {
            int e = parse_priority(buf, l, &cursor, &pri);
            if (e) { err_out[row] = (int16_t)e; return; }
        }
        /* parseHeader optional leading-space skip (panic parity) */
        if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
        if (buf[cursor] == ' ') cursor++;
        int64_t ts;
        if (cfg_flags & CFG_CUSTOM_TS) {
            /* custom Go layout: Python precomputed the epoch from the
               ts slice (unique-value go_time_parse).  Cross-check the
               slice position Python assumed against the automaton's
               actual cursor; disagree -> per-row oracle. */
            if (ts_pre_state[row] == PRE_NONE
                || ts_pre_start[row] != cursor) {
                fallback[row] = 1;
                return;
            }
            if (ts_pre_state[row] == PRE_FAIL) {
                err_out[row] = ERR_TS_UNKNOWN;
                return;
            }
            ts = ts_pre_us[row];
            cursor += ts_fmt_len;
            if (cursor < l && buf[cursor] == ' ') cursor++;
        } else {
            /* timestamp: two default layouts */
            int mo=0,d=0,h=0,mi=0,s=0; int64_t us=0;
            int parsed = 0;
            if (cursor + 15 <= l) {
                if (parse_3164_ts_slice(buf + cursor, 0, &mo,&d,&h,&mi,&s,&us) == 0)
                    parsed = 1;
                else if (parse_3164_ts_slice(buf + cursor, 1, &mo,&d,&h,&mi,&s,&us) == 0)
                    parsed = 1;
            }
            if (!parsed) {
                /* bug-compatible absolute cursor reset (rfc3164.go:238-248):
                   cursor := len(last tried format) — result discarded, the
                   row errors regardless */
                err_out[row] = ERR_TS_UNKNOWN;
                return;
            }
            ts = days_from_civil(default_year, mo, d) * US_DAY
               + (int64_t)h * US_HOUR + (int64_t)mi * US_MIN
               + (int64_t)s * US_SEC + us;
            cursor += 15;
            if (cursor < l && buf[cursor] == ' ') cursor++;
        }
        /* hostname: up to next space or end-of-l; with WithHostname the
           token is NOT consumed (rfc3164.go:261-270) */
        int64_t hs = -1, he = -1;
        if (!(cfg_flags & CFG_HOST)) {
            hs = cursor;
            while (cursor < l && buf[cursor] != ' ') cursor++;
            he = cursor;
        }
        /* Parse()'s separator-space skip (panic parity) */
        if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
        if (buf[cursor] == ' ') cursor++;
        /* tag (rfc3164.go:272-315); WithTag returns without consuming */
        int64_t tag_s = -1, tag_e = -1;
        if (!(cfg_flags & CFG_TAG)) {
            int64_t prev = cursor;
            int64_t to = cursor + 32; if (to > l) to = l;
            tag_s = cursor; tag_e = -1;
            int enough = 0;
            while (cursor < to) {
                uint8_t b = buf[cursor];
                if (b == ' ') { cursor++; break; }
                if (b == '[' || b == ']' || b == ':' || enough) {
                    if (!enough) tag_e = cursor;
                    enough = 1;
                    cursor++;
                    continue;
                }
                cursor++;
            }
            if (tag_e < 0) {
                /* stopped by space (range ends before it) or window end */
                tag_e = cursor;
                if (tag_e > tag_s && buf[tag_e - 1] == ' ')
                    tag_e--; /* space consumed by the break path */
                if (tag_e > to) tag_e = to;
            }
            if (tag_e == tag_s) cursor = prev;  /* empty tag resets */
        }
        /* content: strip ASCII spaces both sides of [cursor, l) */
        int64_t cs = cursor, ce = l;
        if (cs > l) { cs = ce = l; }
        while (cs < ce && buf[cs] == ' ') cs++;
        while (ce > cs && buf[ce-1] == ' ') ce--;
        pri_out[row] = (int32_t)pri;
        ver_out[row] = NO_VERSION;
        ts_out[row] = ts;
        ts_valid[row] = 1;
        if (hs >= 0) set_range(ranges, row, F_HOST, base + hs, base + he);
        if (tag_s >= 0) set_range(ranges, row, F_TAG, base + tag_s, base + tag_e);
        set_range(ranges, row, F_CONTENT, base + cs, base + ce);
        return;
    }

    /* ---- RFC5424 ---- */
    {
        int64_t l = rlen < MAXLEN_5424 ? rlen : MAXLEN_5424;
        int64_t cursor = 0, pri = 0;
        int e;
        if (cfg_flags & CFG_PRI) { pri = pri_override; }
        else {
            e = parse_priority(buf, l, &cursor, &pri);
            if (e) { err_out[row] = (int16_t)e; return; }
        }
        /* parse_version */
        if (cursor >= l) { err_out[row] = ERR_VERSION_NOT_FOUND; return; }
        if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
        uint8_t vc = buf[cursor];
        cursor++;
        int version = is_digit(vc) ? (vc - '0') : NO_VERSION;
        cursor++;  /* unconditional separator skip (rfc5424.go:173) */
        /* timestamp */
        int64_t ts = 0; int ts_nil = 0; int64_t off_min = 0;
        if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
        if (buf[cursor] == '-') { ts_nil = 1; cursor += 1; }
        else {
            int64_t year, month, day, hour, minute, sec;
            /* year: 4 bytes via Atoi (sign quirk) */
            if (cursor + 4 > l) { err_out[row] = ERR_EOL; return; }
            if (go_atoi_n(buf + cursor, 4, &year)) { cursor += 4; err_out[row] = ERR_YEAR; return; }
            cursor += 4;
            if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
            if (buf[cursor] != '-') { err_out[row] = ERR_TS_UNKNOWN; return; }
            cursor++;
            e = parse_2digits(buf, l, &cursor, 1, 12, ERR_MONTH, &month);
            if (e) { err_out[row] = (int16_t)e; return; }
            if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
            if (buf[cursor] != '-') { err_out[row] = ERR_TS_UNKNOWN; return; }
            cursor++;
            e = parse_2digits(buf, l, &cursor, 1, 31, ERR_DAY, &day);
            if (e) { err_out[row] = (int16_t)e; return; }
            if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
            if (buf[cursor] != 'T') { err_out[row] = ERR_TIME_FORMAT; return; }
            cursor++;
            /* FULL-TIME: any ParserError -> ERR_TS_UNKNOWN; index errors
               keep ERR_INDEX (outer except IndexError in the oracle) */
            e = parse_2digits(buf, l, &cursor, 0, 23, ERR_TIME_FORMAT, &hour);
            if (e) { err_out[row] = ERR_TS_UNKNOWN; return; }
            if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
            if (buf[cursor] != ':') { err_out[row] = ERR_TS_UNKNOWN; return; }
            cursor++;
            e = parse_2digits(buf, l, &cursor, 0, 59, ERR_TIME_FORMAT, &minute);
            if (e) { err_out[row] = ERR_TS_UNKNOWN; return; }
            if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
            if (buf[cursor] != ':') { err_out[row] = ERR_TS_UNKNOWN; return; }
            cursor++;
            e = parse_2digits(buf, l, &cursor, 0, 59, ERR_TIME_FORMAT, &sec);
            if (e) { err_out[row] = ERR_TS_UNKNOWN; return; }
            int64_t frac_us = 0;
            if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
            if (buf[cursor] == '.') {
                cursor++;
                /* parseSecFrac: 1-6 digits; empty -> silently ignored,
                   cursor stays after the dot (rfc5424.go:464-470,511-514) */
                int64_t fs = cursor, fmax = cursor + 6;
                int64_t to2 = cursor;
                while (to2 < fmax && to2 < l && is_digit(buf[to2])) to2++;
                if (to2 > fs) {
                    int nd = (int)(to2 - fs);
                    int64_t ns = 0;
                    for (int i = 0; i < nd; i++) ns = ns * 10 + (buf[fs+i]-'0');
                    for (int i = nd; i < 9; i++) ns *= 10;
                    frac_us = ns / 1000;
                    cursor = to2;
                }
            }
            /* TIME-OFFSET */
            if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
            if (buf[cursor] == 'Z') { cursor++; off_min = 0; }
            else {
                uint8_t sign = buf[cursor];
                if (sign != '+' && sign != '-') { err_out[row] = ERR_TS_UNKNOWN; return; }
                cursor++;
                int64_t oh, om;
                e = parse_2digits(buf, l, &cursor, 0, 23, ERR_TIME_FORMAT, &oh);
                if (e) { err_out[row] = ERR_TS_UNKNOWN; return; }
                if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
                if (buf[cursor] != ':') { err_out[row] = ERR_TS_UNKNOWN; return; }
                cursor++;
                e = parse_2digits(buf, l, &cursor, 0, 59, ERR_TIME_FORMAT, &om);
                if (e) { err_out[row] = ERR_TS_UNKNOWN; return; }
                off_min = (oh * 60 + om) * (sign == '+' ? 1 : -1);
            }
            ts = days_from_civil(year, month, day) * US_DAY
               + hour * US_HOUR + minute * US_MIN + sec * US_SEC + frac_us
               - off_min * US_MIN;
        }
        cursor++;  /* rfc5424.go:180 */
        /* hostname; with WithHostname neither the token nor its
           separator is consumed (rfc5424.go:286-299 skipped) */
        int64_t hs = -1, he = -1;
        if (!(cfg_flags & CFG_HOST)) {
            hs = cursor;
            int64_t to = cursor;
            while (to < l && buf[to] != ' ') to++;
            he = to;
            cursor = to + 1;  /* consumes the separator */
        }
        /* app / proc / msgid via parseUpToLen */
        int64_t as_=0, ae=0, ps=0, pe=0, ms=0, me=0;
        {
            int64_t mx = cursor + 48, t2 = cursor;
            int found = 0;
            while (t2 < mx && t2 < l) { if (buf[t2] == ' ') { found = 1; break; } t2++; }
            if (!found) { err_out[row] = ERR_APP; return; }
            as_ = cursor; ae = t2; cursor = t2 + 1;
        }
        {
            int64_t mx = cursor + 128, t2 = cursor;
            int found = 0;
            while (t2 < mx && t2 < l) { if (buf[t2] == ' ') { found = 1; break; } t2++; }
            if (!found) { err_out[row] = ERR_PROC; return; }
            ps = cursor; pe = t2; cursor = t2 + 1;
        }
        {
            int64_t mx = cursor + 32, t2 = cursor;
            int found = 0;
            while (t2 < mx && t2 < l) { if (buf[t2] == ' ') { found = 1; break; } t2++; }
            if (!found) { err_out[row] = ERR_MSGID; return; }
            ms = cursor; me = t2; cursor = t2 + 1;
        }
        /* structured data (rfc5424.go:597-636) */
        int64_t sds, sde;
        if (cursor >= rlen) { err_out[row] = ERR_INDEX; return; }
        if (buf[cursor] == '-') { sds = cursor; sde = cursor + 1; cursor += 1; }
        else if (buf[cursor] != '[') { err_out[row] = ERR_NO_SD; return; }
        else {
            int64_t from = cursor, t2 = from;
            int found = 0;
            while (t2 < l) {
                if (found) break;
                uint8_t b = buf[t2];
                if (b == ']') {
                    int64_t t3 = t2 + 1;
                    if (t3 == l || (t3 < l && buf[t3] == ' ')) found = 1;
                }
                t2++;
            }
            if (!found) { err_out[row] = ERR_NO_SD; return; }
            sds = from; sde = t2; cursor = t2;
        }
        cursor++;  /* rfc5424.go:132 */
        /* message: strip spaces both sides of [cursor, l) */
        int64_t mgs = cursor, mge = l;
        if (mgs >= l) { mgs = mge = l; }
        while (mgs < mge && buf[mgs] == ' ') mgs++;
        while (mge > mgs && buf[mge-1] == ' ') mge--;
        pri_out[row] = (int32_t)pri;
        ver_out[row] = (int32_t)version;
        if (!ts_nil) {
            ts_out[row] = ts; ts_valid[row] = 1;
            tz_out[row] = (int16_t)off_min; tz_valid[row] = 1;
        }
        if (hs >= 0) set_range(ranges, row, F_HOST, base + hs, base + he);
        set_range(ranges, row, F_APP, base + as_, base + ae);
        set_range(ranges, row, F_PROC, base + ps, base + pe);
        set_range(ranges, row, F_MSGID, base + ms, base + me);
        set_range(ranges, row, F_SD, base + sds, base + sde);
        set_range(ranges, row, F_MSG, base + mgs, base + mge);
        return;
    }
}

/* 64-bit word-wise xor-multiply string hash (FNV-1a over 8-byte LE
   words, zero-padded tail, length + init mixed, fmix64 finalizer).
   The per-seed INIT enters the chain at step 0, so differently-seeded
   hashes decorrelate through every multiply (unlike a polynomial with
   the seed xored at the end, where the data core is seed-independent
   and one collision would collide for every seed).  Matches
   texthash's numpy fallback bit-for-bit. */
static const uint64_t HW_P = 0x9E3779B97F4A7C15ULL;
static const uint64_t HW_LEN = 0xFF51AFD7ED558CCDULL;

static inline uint64_t hw_fmix(uint64_t h) {
    h ^= h >> 33; h *= 0xFF51AFD7ED558CCDULL;
    h ^= h >> 33; h *= 0xC4CEB9FE1A85EC53ULL;
    h ^= h >> 33;
    return h;
}

static inline uint64_t hw_one(const uint8_t* p, int64_t len, uint64_t init) {
    uint64_t h = init;
    int64_t nfull = len / 8;
    for (int64_t k = 0; k < nfull; k++) {
        uint64_t w;
        memcpy(&w, p + 8 * k, 8);
        h = (h ^ w) * HW_P;
    }
    int64_t tail = len - nfull * 8;
    if (tail) {
        uint64_t w = 0;
        memcpy(&w, p + 8 * nfull, tail);
        h = (h ^ w) * HW_P;
    }
    h ^= (uint64_t)len * HW_LEN;
    return hw_fmix(h);
}

void hash_strings(const uint8_t* data, const int64_t* starts,
                  const int64_t* ends, int64_t n, uint64_t init,
                  uint64_t* out) {
    for (int64_t r = 0; r < n; r++)
        out[r] = hw_one(data + starts[r], ends[r] - starts[r], init);
}

/* ragged gather: copy per-row byte ranges into a packed buffer whose
   row offsets the caller precomputed (one memcpy pass; replaces the
   numpy flat-index machinery, which allocated 8 bytes of index per
   payload byte). */
void gather_ranges(const uint8_t* data, const int64_t* starts,
                   const int64_t* ends, int64_t n,
                   const int64_t* out_offs, uint8_t* out) {
    for (int64_t r = 0; r < n; r++) {
        int64_t len = ends[r] - starts[r];
        if (len > 0) memcpy(out + out_offs[r], data + starts[r], len);
    }
}

/* both seeds in one memory pass (the exact-dedup 128-bit key) */
void hash_strings2(const uint8_t* data, const int64_t* starts,
                   const int64_t* ends, int64_t n,
                   uint64_t init1, uint64_t init2,
                   uint64_t* out1, uint64_t* out2) {
    for (int64_t r = 0; r < n; r++) {
        const uint8_t* p = data + starts[r];
        int64_t len = ends[r] - starts[r];
        uint64_t h1 = init1, h2 = init2;
        int64_t nfull = len / 8;
        for (int64_t k = 0; k < nfull; k++) {
            uint64_t w;
            memcpy(&w, p + 8 * k, 8);
            h1 = (h1 ^ w) * HW_P;
            h2 = (h2 ^ w) * HW_P;
        }
        int64_t tail = len - nfull * 8;
        if (tail) {
            uint64_t w = 0;
            memcpy(&w, p + 8 * nfull, tail);
            h1 = (h1 ^ w) * HW_P;
            h2 = (h2 ^ w) * HW_P;
        }
        uint64_t lm = (uint64_t)len * HW_LEN;
        out1[r] = hw_fmix(h1 ^ lm);
        out2[r] = hw_fmix(h2 ^ lm);
    }
}

void parse_batch(const uint8_t* data, const int64_t* starts,
                 const int64_t* ends, int64_t n, int32_t default_year,
                 int32_t cfg_flags, int64_t pri_override,
                 int64_t ts_fmt_len, const int64_t* ts_pre_us,
                 const uint8_t* ts_pre_state, const int64_t* ts_pre_start,
                 int8_t* rfc, int32_t* pri_out, int32_t* ver_out,
                 int64_t* ts_out, uint8_t* ts_valid,
                 int16_t* tz_out, uint8_t* tz_valid,
                 int64_t* ranges, int16_t* err_out, uint8_t* fallback) {
    for (int64_t r = 0; r < n; r++) {
        parse_row(data, starts[r], ends[r] - starts[r], default_year,
                  cfg_flags, pri_override, ts_fmt_len,
                  ts_pre_us, ts_pre_state, ts_pre_start, r,
                  rfc, pri_out, ver_out, ts_out, ts_valid,
                  tz_out, tz_valid, ranges, err_out, fallback);
    }
}
"""


def _compile() -> str | None:
    """Compile the C source to a cached shared library; returns the .so
    path, or None if no toolchain is available."""
    h = hashlib.sha1(C_SOURCE.encode()).hexdigest()[:16]
    so_path = os.path.join(tempfile.gettempdir(), f"rayslog_cparse_{h}.so")
    if os.path.exists(so_path):
        return so_path
    src = so_path.replace(".so", ".c")
    tmp_so = f"{so_path}.tmp.{os.getpid()}"
    try:
        with open(src, "w") as f:
            f.write(C_SOURCE)
        subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared", "-o", tmp_so, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp_so, so_path)  # atomic under concurrent compiles
        return so_path
    except Exception:
        return None


_LIB = None
_LIB_TRIED = False


def get_lib():
    """ctypes handle to the compiled kernel, or None."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _compile()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.parse_batch.argtypes = [
            u8p,
            i64p, i64p,
            ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int64, i64p, u8p, i64p,
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            i64p,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            i64p,
            np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
        lib.parse_batch.restype = None
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        lib.hash_strings.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            i64p, i64p, ctypes.c_int64, ctypes.c_uint64, u64p,
        ]
        lib.hash_strings.restype = None
        lib.hash_strings2.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            i64p, i64p, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_uint64, u64p, u64p,
        ]
        lib.hash_strings2.restype = None
        lib.gather_ranges.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            i64p, i64p, ctypes.c_int64, i64p,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
        lib.gather_ranges.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


#: string-field slot order (must match the C F_* defines)
STR_FIELDS = [
    "hostname", "tag", "content", "app_name",
    "proc_id", "msg_id", "structured_data", "message",
]


#: cfg_flags bits (must match the C CFG_* defines)
CFG_PRI, CFG_HOST, CFG_TAG, CFG_CUSTOM_TS = 1, 2, 4, 8
#: ts_pre_state values (must match the C PRE_* defines)
PRE_FAIL, PRE_OK, PRE_NONE = 0, 1, 2


def config_flags(cfg) -> tuple[int, int]:
    """(cfg_flags, pri_override) for a ParserConfig."""
    flags = 0
    pri = 0
    if cfg.priority is not None:
        flags |= CFG_PRI
        pri = int(cfg.priority)
    if cfg.hostname:
        flags |= CFG_HOST
    if cfg.tag:
        flags |= CFG_TAG
    return flags, pri


def parse_raw(buf: np.ndarray, starts: np.ndarray, ends: np.ndarray,
              default_year: int, cfg_flags: int = 0,
              pri_override: int = 0, ts_fmt_len: int = 0,
              ts_pre_us: np.ndarray | None = None,
              ts_pre_state: np.ndarray | None = None,
              ts_pre_start: np.ndarray | None = None) -> dict:
    """Run the C automaton; returns the raw output arrays (see keys)."""
    lib = get_lib()
    n = len(starts)
    out = {
        "rfc": np.zeros(n, dtype=np.int8),
        "pri": np.zeros(n, dtype=np.int32),
        "ver": np.zeros(n, dtype=np.int32),
        "ts": np.zeros(n, dtype=np.int64),
        "ts_valid": np.zeros(n, dtype=np.uint8),
        "tz": np.zeros(n, dtype=np.int16),
        "tz_valid": np.zeros(n, dtype=np.uint8),
        "ranges": np.full(n * len(STR_FIELDS) * 2, -1, dtype=np.int64),
        "err": np.zeros(n, dtype=np.int16),
        "fallback": np.zeros(n, dtype=np.uint8),
    }
    if n == 0:
        return out
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)  # valid pointer for ctypes
    if ts_pre_us is None:
        ts_pre_us = np.zeros(n, dtype=np.int64)
    if ts_pre_state is None:
        ts_pre_state = np.zeros(n, dtype=np.uint8)
    if ts_pre_start is None:
        ts_pre_start = np.zeros(n, dtype=np.int64)
    lib.parse_batch(
        np.ascontiguousarray(buf),
        np.ascontiguousarray(starts, dtype=np.int64),
        np.ascontiguousarray(ends, dtype=np.int64),
        n, default_year, cfg_flags, pri_override,
        ts_fmt_len,
        np.ascontiguousarray(ts_pre_us, dtype=np.int64),
        np.ascontiguousarray(ts_pre_state, dtype=np.uint8),
        np.ascontiguousarray(ts_pre_start, dtype=np.int64),
        out["rfc"], out["pri"], out["ver"], out["ts"], out["ts_valid"],
        out["tz"], out["tz_valid"], out["ranges"], out["err"],
        out["fallback"],
    )
    return out


# ------------------------------------------------------------- WithLocation
class WallZone:
    """Vectorized wall-clock -> UTC-epoch conversion for one IANA zone,
    replicating the oracle's Python fold-0 semantics
    (gotime.wall_to_epoch_us): in a DST gap the pre-transition offset
    applies; in an overlap the pre-transition (earlier-occurrence)
    offset applies.  Both reduce to: the wall-time boundary for entering
    interval i is T_i + max(off_{i-1}, off_i).

    Transitions are discovered by probing the zone daily over
    [year_min-1, year_max+1] and bisecting each change to 1-second
    precision — no private zoneinfo APIs."""

    def __init__(self, location: str, year_min: int, year_max: int):
        import datetime as dt
        from zoneinfo import ZoneInfo

        z = ZoneInfo(location)
        y0 = max(min(year_min, 9998), 2) - 1
        y1 = min(max(year_max, 2), 9998) + 1
        t0 = int(dt.datetime(y0, 1, 1, tzinfo=dt.timezone.utc).timestamp())
        t1 = int(dt.datetime(y1, 12, 31, tzinfo=dt.timezone.utc).timestamp())

        def off_at(u: int) -> int:
            return int(
                dt.datetime.fromtimestamp(u, z).utcoffset().total_seconds()
            )

        boundaries = []  # wall-time µs at which the NEXT offset starts
        offs = []
        day = 86_400
        prev_u, prev_off = t0, off_at(t0)
        offs.append(prev_off)
        u = t0 + day
        while u <= t1:
            o = off_at(u)
            if o != prev_off:
                lo, hi = prev_u, u  # bisect the transition instant
                while hi - lo > 1:
                    mid = (lo + hi) // 2
                    if off_at(mid) == prev_off:
                        lo = mid
                    else:
                        hi = mid
                t_trans = hi
                new_off = off_at(hi)
                boundaries.append(
                    (t_trans + max(prev_off, new_off)) * 1_000_000
                )
                offs.append(new_off)
                prev_off = new_off
            prev_u = u
            u += day
        self.boundaries = np.array(boundaries, dtype=np.int64)
        self.offs_us = np.array(offs, dtype=np.int64) * 1_000_000

    def to_epoch(self, wall_us: np.ndarray) -> np.ndarray:
        i = np.searchsorted(self.boundaries, wall_us, side="right")
        return wall_us - self.offs_us[i]


_WALL_ZONES: dict = {}


def wall_zone(location: str, year: int) -> WallZone:
    key = (location, year)
    if key not in _WALL_ZONES:
        _WALL_ZONES[key] = WallZone(location, year, year)
    return _WALL_ZONES[key]
