"""Row-exact reimplementation of the reference parsing automata.

This is the engine's semantic anchor: a per-row Python parser whose
behavior matches ``jeromer/syslogparser`` v1.1.0 byte-for-byte on field
values AND canonical error strings.  The vectorized Arrow kernels
(``rayslog.kernels.vectorized``) are tested for equality against this
module; rows the fast path cannot prove equivalent fall back to it.

Reference citations (for parity auditing, no code copied):
- detection     /root/reference/syslogparser.go:30-56
- shared scalar /root/reference/parsercommon/parsercommon.go:50-186
- RFC3164       /root/reference/rfc3164/rfc3164.go
- RFC5424       /root/reference/rfc5424/rfc5424.go

Inputs on which the Go library would panic with an index-out-of-range
runtime error are reported as ``parse_error = "index out of range"``
instead of crashing (see rayslog.errors.ERR_INDEX_OUT_OF_RANGE).

Timestamps are returned as UTC epoch microseconds (int) — the engine's
``timestamp[us]`` representation — plus the original numeric UTC offset
in minutes for RFC5424 so wall-time rendering stays reconstructible.
The RFC5424 NILVALUE timestamp (Go zero time, rfc5424.go:239-242) maps
to ``None``.
"""

from __future__ import annotations

from typing import Optional

from rayslog.config import ParserConfig
from rayslog.errors import (
    ERR_EOL,
    ERR_INDEX_OUT_OF_RANGE,
    ERR_INVALID_APP_NAME,
    ERR_INVALID_MSG_ID,
    ERR_INVALID_PROC_ID,
    ERR_INVALID_TIME_FORMAT,
    ERR_DAY_INVALID,
    ERR_HOUR_INVALID,
    ERR_MINUTE_INVALID,
    ERR_MONTH_INVALID,
    ERR_NO_SPACE,
    ERR_NO_STRUCTURED_DATA,
    ERR_PRIORITY_EMPTY,
    ERR_PRIORITY_NON_DIGIT,
    ERR_PRIORITY_NO_END,
    ERR_PRIORITY_NO_START,
    ERR_PRIORITY_TOO_LONG,
    ERR_PRIORITY_TOO_SHORT,
    ERR_SECFRAC_INVALID,
    ERR_SECOND_INVALID,
    ERR_TIMESTAMP_UNKNOWN_FORMAT,
    ERR_TIMEZONE_INVALID,
    ERR_VERSION_NOT_FOUND,
    ERR_YEAR_INVALID,
    ParserError,
)
from rayslog.kernels.gotime import (
    GoParseError,
    civil_to_epoch_us,
    go_atoi,
    go_time_parse,
    wall_to_epoch_us,
)

NO_VERSION = -1
RFC_UNKNOWN = 0
RFC_3164 = 1
RFC_5424 = 2

MAX_PACKET_LEN_3164 = 2048  # rfc3164/rfc3164.go:12-17
MAX_PACKET_LEN_5424 = 3048  # rfc5424/rfc5424.go:14-21

_SP = 0x20
_GT = 0x3E
_LT = 0x3C
_DASH = 0x2D
_LBRACKET = 0x5B
_RBRACKET = 0x5D
_COLON = 0x3A
_DOT = 0x2E


def _is_digit(c: int) -> bool:
    return 0x30 <= c <= 0x39


def _decode(b: bytes) -> str:
    # Go strings carry raw bytes; Arrow strings must be valid UTF-8.  The
    # engine decodes strictly and substitutes U+FFFD only when a byte
    # slice boundary splits a multi-byte character (documented divergence;
    # impossible for ASCII payloads).
    return b.decode("utf-8", errors="replace")


# --------------------------------------------------------------------------
# parsercommon equivalents
# --------------------------------------------------------------------------

def parse_priority(buff: bytes, cursor: int, l: int) -> tuple[int, int]:
    """ParsePriority (parsercommon.go:50-94): ``<NNN>`` with '>' at index<=4.

    Returns (priority, new_cursor); raises ParserError with the canonical
    string otherwise.  NB the scan is anchored at absolute index 1 like
    the reference (it assumes cursor==0).
    """
    if l <= 0:
        raise ParserError(ERR_PRIORITY_EMPTY)
    if buff[cursor] != _LT:
        raise ParserError(ERR_PRIORITY_NO_START)
    i = 1
    pri = 0
    while i < l:
        if i >= 5:
            raise ParserError(ERR_PRIORITY_TOO_LONG)
        c = buff[i]
        if c == _GT:
            if i == 1:
                raise ParserError(ERR_PRIORITY_TOO_SHORT)
            return pri, i + 1
        if _is_digit(c):
            pri = pri * 10 + (c - 0x30)
        else:
            raise ParserError(ERR_PRIORITY_NON_DIGIT)
        i += 1
    raise ParserError(ERR_PRIORITY_NO_END)


def parse_version(buff: bytes, cursor: int, l: int) -> tuple[int, int]:
    """ParseVersion (parsercommon.go:97-118): one char after '>'.

    Digit => that digit; non-digit => (NO_VERSION, cursor+1) with no error
    (the RFC3164 path); cursor past l => ErrVersionNotFound.
    """
    if cursor >= l:
        raise ParserError(ERR_VERSION_NOT_FOUND)
    c = buff[cursor]  # may IndexError when the real buffer is shorter than l
    cursor += 1
    if not _is_digit(c):
        return NO_VERSION, cursor
    return c - 0x30, cursor


def find_next_space(buff: bytes, from_: int, l: int) -> int:
    """FindNextSpace (parsercommon.go:135-146): offset just PAST the next
    space; raises ErrNoSpace otherwise."""
    to = from_
    while to < l:
        if buff[to] == _SP:
            return to + 1
        to += 1
    raise ParserError(ERR_NO_SPACE)


def parse_hostname_common(buff: bytes, cursor: int, l: int) -> tuple[str, int]:
    """ParseHostname (parsercommon.go:171-186): bytes up to next space/EOB."""
    from_ = cursor
    to = from_
    while to < l:
        if buff[to] == _SP:
            break
        to += 1
    return _decode(buff[from_:to]), to


def parse_2_digits(
    buff: bytes, cursor: int, l: int, lo: int, hi: int, err: str
) -> tuple[int, int]:
    """Parse2Digits (parsercommon.go:148-169)."""
    if cursor + 2 > l:
        raise ParserError(ERR_EOL)
    sub = buff[cursor : cursor + 2]
    cursor += 2
    try:
        v = go_atoi(sub.decode("ascii", errors="replace"))
    except ValueError:
        raise ParserError(err) from None
    if lo <= v <= hi:
        return v, cursor
    raise ParserError(err)


# --------------------------------------------------------------------------
# Detection (syslogparser.go:30-56)
# --------------------------------------------------------------------------

def detect_rfc(buff: bytes) -> int:
    """DetectRFC incl. its quirks:

    - no '>' in the first 10 bytes of a >=10-byte buffer  => RFC_5424
      (v stays 0 != NO_VERSION, err nil — syslogparser.go:32,51-55);
    - '>' at offset 9 => ParseVersion cursor 10 >= max => error => UNKNOWN;
    - shorter buffers without '>' index past the end (Go panic) =>
      IndexError here, mapped by callers to ERR_INDEX_OUT_OF_RANGE.
    """
    max_ = 10
    v = 0
    for i in range(max_):
        if buff[i] == _GT:  # IndexError == Go panic parity
            x = i + 1
            v, x = parse_version(buff, x, max_)
            break
    if v == NO_VERSION:
        return RFC_3164
    return RFC_5424


# --------------------------------------------------------------------------
# RFC3164 (rfc3164/rfc3164.go)
# --------------------------------------------------------------------------

_DEFAULT_3164_FMTS = ("Jan 02 15:04:05", "Jan  2 15:04:05")  # rfc3164.go:208-211


def _parse_ts_3164(
    buff: bytes, cursor: int, l: int, cfg: ParserConfig
) -> tuple[int, int]:
    """parseTimestamp (rfc3164.go:202-259) + fixTimestampIfNeeded (:331-346).

    Returns (utc_epoch_us, cursor); raises ErrTimestampUnknownFormat with
    the reference's absolute-cursor-reset behavior (:238-248).
    """
    fmts = (
        (cfg.timestamp_format,) if cfg.timestamp_format else _DEFAULT_3164_FMTS
    )
    fmt_len = 0
    parsed = None
    for fmt in fmts:
        fmt_len = len(fmt)
        if cursor + fmt_len > l:
            continue
        sub = buff[cursor : cursor + fmt_len]
        try:
            parsed = go_time_parse(fmt, _decode(sub))
            break
        except GoParseError:
            continue
    if parsed is None:
        # Bug-compatible absolute reset: cursor := len(last tried format).
        cursor = fmt_len
        if cursor < l and buff[cursor] == _SP:
            cursor += 1
        raise _TsUnknown(cursor)
    t = parsed
    y = cfg.effective_year() if t.y == 0 else t.y
    off = t.off_sec
    if off is None and t.zone_name is not None:
        from rayslog.kernels.gotime import resolve_zone_name

        off = resolve_zone_name(t.zone_name, cfg.location, y)
    if off is not None:
        # layout carried zone info: absolute instant = civil - offset
        ts_us = (
            civil_to_epoch_us(y, t.mo, t.d, t.h, t.mi, t.s, t.us)
            - off * 1_000_000
        )
    else:
        ts_us = wall_to_epoch_us(y, t.mo, t.d, t.h, t.mi, t.s, t.us, cfg.location)
    cursor += fmt_len
    if cursor < l and buff[cursor] == _SP:
        cursor += 1
    return ts_us, cursor


class _TsUnknown(ParserError):
    def __init__(self, cursor: int):
        super().__init__(ERR_TIMESTAMP_UNKNOWN_FORMAT)
        self.cursor = cursor


def parse_tag_3164(
    buff: bytes, cursor: int, l: int, cfg: ParserConfig
) -> tuple[str, int]:
    """parseTag (rfc3164.go:272-315): <=32-byte scan window; '[' ']' ':'
    flip the ``enough`` flag (stop accumulating, keep consuming); empty tag
    resets the cursor."""
    if cfg.tag:
        return cfg.tag, cursor
    previous = cursor
    to = min(l, cursor + 32)
    tag = bytearray()
    enough = False
    while cursor < to:
        b = buff[cursor]
        if b == _SP:
            cursor += 1
            break
        if b in (_LBRACKET, _RBRACKET, _COLON) or enough:
            enough = True
            cursor += 1
            continue
        tag.append(b)
        cursor += 1
    if not tag:
        cursor = previous
    return _decode(bytes(tag)), cursor


def parse_content_3164(buff: bytes, cursor: int, l: int) -> tuple[str, int]:
    """parseContent (rfc3164.go:317-329): remainder trimmed of ASCII spaces
    both sides; ErrEOL is the success sentinel (handled by the caller)."""
    if cursor > l:
        return "", cursor
    content = buff[cursor:l].strip(b" ")
    cursor += len(content)
    return _decode(content), cursor


def parse_rfc3164(
    buff: bytes, cfg: ParserConfig = ParserConfig()
) -> tuple[Optional[dict], Optional[str]]:
    """Full RFC3164 Parse+Dump (rfc3164.go:98-139).

    Returns (parts, None) on success — the reference's 7 Dump keys with
    ``timestamp`` as UTC epoch µs — or (None, error_string).
    """
    l = min(len(buff), MAX_PACKET_LEN_3164)
    cursor = 0
    try:
        if cfg.priority is not None:
            pri = cfg.priority
        else:
            pri, cursor = parse_priority(buff, cursor, l)
        # parseHeader optional leading-space skip (rfc3164.go:156-158)
        if buff[cursor] == _SP:  # IndexError == Go panic parity
            cursor += 1
        ts_us, cursor = _parse_ts_3164(buff, cursor, l, cfg)
        if cfg.hostname:
            hostname = cfg.hostname
        else:
            hostname, cursor = parse_hostname_common(buff, cursor, l)
        # Parse()'s single separator-space skip (rfc3164.go:115-117)
        if buff[cursor] == _SP:  # IndexError == Go panic parity
            cursor += 1
        tag, cursor = parse_tag_3164(buff, cursor, l, cfg)
        content, cursor = parse_content_3164(buff, cursor, l)
        return (
            {
                "priority": pri,
                "facility": pri // 8,   # NewPriority (parsercommon.go:124-133)
                "severity": pri % 8,
                "timestamp": ts_us,
                "hostname": hostname,
                "tag": tag,
                "content": content,
            },
            None,
        )
    except ParserError as e:
        return None, e.msg
    except IndexError:
        return None, ERR_INDEX_OUT_OF_RANGE


# --------------------------------------------------------------------------
# RFC5424 (rfc5424/rfc5424.go)
# --------------------------------------------------------------------------

def _parse_year_5424(buff: bytes, cursor: int, l: int) -> tuple[int, int]:
    if cursor + 4 > l:
        raise ParserError(ERR_EOL)
    sub = buff[cursor : cursor + 4]
    cursor += 4
    try:
        return go_atoi(sub.decode("ascii", errors="replace")), cursor
    except ValueError:
        raise ParserError(ERR_YEAR_INVALID) from None


def _parse_sec_frac(buff: bytes, cursor: int, l: int) -> tuple[str, int]:
    """parseSecFrac (rfc5424.go:493-523): 1-6 digits; returns the digit
    string (value semantics preserved via zero-padding, toNSec :582-591)."""
    max_ = cursor + 6
    to = cursor
    while to < max_:
        if to >= l or not _is_digit(buff[to]):
            break
        to += 1
    sub = buff[cursor:to]
    if not sub:
        # cursor NOT advanced on the empty path (rfc5424.go:511-514)
        raise ParserError(ERR_SECFRAC_INVALID)
    return sub.decode("ascii"), to


def _get_hour_minute(
    buff: bytes, cursor: int, l: int
) -> tuple[int, int, int]:
    hour, cursor = parse_2_digits(buff, cursor, l, 0, 23, ERR_HOUR_INVALID)
    if buff[cursor] != _COLON:  # IndexError == Go panic parity
        raise ParserError(ERR_INVALID_TIME_FORMAT)
    cursor += 1
    minute, cursor = parse_2_digits(buff, cursor, l, 0, 59, ERR_MINUTE_INVALID)
    return hour, minute, cursor


def _parse_ts_5424(
    buff: bytes, cursor: int, l: int
) -> tuple[Optional[int], Optional[int], int]:
    """parseTimestamp (rfc5424.go:238-286) + the full-date/full-time grammar.

    Returns (utc_epoch_us | None-for-NILVALUE, tz_offset_minutes | None,
    cursor).  Every full-time sub-error is collapsed to
    ErrTimestampUnknownFormat like the reference (:258-264).
    """
    if buff[cursor] == _DASH:
        return None, None, cursor + 1
    # FULL-DATE (rfc5424.go:329-366)
    year, cursor = _parse_year_5424(buff, cursor, l)
    if buff[cursor] != _DASH:
        raise ParserError(ERR_TIMESTAMP_UNKNOWN_FORMAT)
    cursor += 1
    month, cursor = parse_2_digits(buff, cursor, l, 1, 12, ERR_MONTH_INVALID)
    if buff[cursor] != _DASH:
        raise ParserError(ERR_TIMESTAMP_UNKNOWN_FORMAT)
    cursor += 1
    day, cursor = parse_2_digits(buff, cursor, l, 1, 31, ERR_DAY_INVALID)
    if buff[cursor] != 0x54:  # 'T'
        raise ParserError(ERR_INVALID_TIME_FORMAT)
    cursor += 1
    # FULL-TIME (rfc5424.go:405-580); any error => ErrTimestampUnknownFormat
    try:
        hour, minute, cursor = _get_hour_minute(buff, cursor, l)
        if buff[cursor] != _COLON:
            raise ParserError(ERR_INVALID_TIME_FORMAT)
        cursor += 1
        seconds, cursor = parse_2_digits(
            buff, cursor, l, 0, 59, ERR_SECOND_INVALID
        )
        frac_us = 0
        if buff[cursor] == _DOT:  # IndexError == Go panic parity
            cursor += 1
            try:
                frac_str, cursor = _parse_sec_frac(buff, cursor, l)
                # toNSec zero-pads to ns; /1000 is exact for <=6 digits.
                frac_us = int(frac_str.ljust(9, "0")) // 1000
            except ParserError:
                pass  # frac failure silently ignored (rfc5424.go:464-470)
        # TIME-OFFSET (rfc5424.go:526-560)
        if buff[cursor] == 0x5A:  # 'Z'
            cursor += 1
            offset_min = 0
        else:
            sign = buff[cursor]
            if sign not in (0x2B, _DASH):  # '+' / '-'
                raise ParserError(ERR_TIMEZONE_INVALID)
            cursor += 1
            oh, om, cursor = _get_hour_minute(buff, cursor, l)
            offset_min = (oh * 60 + om) * (1 if sign == 0x2B else -1)
    except ParserError:
        raise ParserError(ERR_TIMESTAMP_UNKNOWN_FORMAT) from None
    ts_us = (
        civil_to_epoch_us(year, month, day, hour, minute, seconds, frac_us)
        - offset_min * 60 * 1_000_000
    )
    return ts_us, offset_min, cursor


def _parse_up_to_len(
    buff: bytes, cursor: int, l: int, max_len: int, err: str
) -> tuple[str, int]:
    """parseUpToLen (rfc5424.go:638-663)."""
    max_ = cursor + max_len
    to = cursor
    found = False
    while to < max_ and to < l:
        if buff[to] == _SP:
            found = True
            break
        to += 1
    if found:
        return _decode(buff[cursor:to]), to
    raise _UpToLenError(err, to)


class _UpToLenError(ParserError):
    def __init__(self, msg: str, cursor: int):
        super().__init__(msg)
        self.cursor = cursor


def parse_structured_data(buff: bytes, cursor: int, l: int) -> tuple[str, int]:
    """parseStructuredData (rfc5424.go:597-636): raw capture up to the
    first ']' followed by a space or end-of-buffer; contiguous '][' kept."""
    if buff[cursor] == _DASH:  # IndexError == Go panic parity
        return "-", cursor + 1
    if buff[cursor] != _LBRACKET:
        raise ParserError(ERR_NO_STRUCTURED_DATA)
    from_ = cursor
    to = from_
    found = False
    while to < l:
        if found:
            break
        b = buff[to]
        if b == _RBRACKET:
            t = to + 1
            if t == l or (t < l and buff[t] == _SP):
                found = True
        to += 1
    if found:
        return _decode(buff[from_:to]), to
    raise ParserError(ERR_NO_STRUCTURED_DATA)


def parse_rfc5424(
    buff: bytes, cfg: ParserConfig = ParserConfig()
) -> tuple[Optional[dict], Optional[str]]:
    """Full RFC5424 Parse+Dump (rfc5424.go:118-159).

    Returns (parts, None) — the 11 Dump keys with ``timestamp`` as UTC
    epoch µs (None for the NILVALUE zero time) plus ``tz_offset_minutes``
    — or (None, error_string).
    """
    l = min(len(buff), MAX_PACKET_LEN_5424)
    cursor = 0
    try:
        if cfg.priority is not None:
            pri = cfg.priority
        else:
            pri, cursor = parse_priority(buff, cursor, l)
        version, cursor = parse_version(buff, cursor, l)
        cursor += 1  # unconditional separator skip (rfc5424.go:173)
        ts_us, offset_min, cursor = _parse_ts_5424(buff, cursor, l)
        cursor += 1  # rfc5424.go:180
        if cfg.hostname:
            hostname = cfg.hostname
        else:
            hostname, cursor = parse_hostname_common(buff, cursor, l)
            cursor += 1  # rfc5424.go:289-299 consumes the separator
        app_name, cursor = _parse_up_to_len(
            buff, cursor, l, 48, ERR_INVALID_APP_NAME
        )
        cursor += 1
        proc_id, cursor = _parse_up_to_len(
            buff, cursor, l, 128, ERR_INVALID_PROC_ID
        )
        cursor += 1
        msg_id, cursor = _parse_up_to_len(
            buff, cursor, l, 32, ERR_INVALID_MSG_ID
        )
        cursor += 1
        sd, cursor = parse_structured_data(buff, cursor, l)
        cursor += 1  # rfc5424.go:132
        message = ""
        if cursor < l:
            message = _decode(buff[cursor:l].strip(b" "))
        return (
            {
                "priority": pri,
                "facility": pri // 8,
                "severity": pri % 8,
                "version": version,
                "timestamp": ts_us,
                "tz_offset_minutes": offset_min,
                "hostname": hostname,
                "app_name": app_name,
                "proc_id": proc_id,
                "msg_id": msg_id,
                "structured_data": sd,
                "message": message,
            },
            None,
        )
    except ParserError as e:
        return None, e.msg
    except IndexError:
        return None, ERR_INDEX_OUT_OF_RANGE


# --------------------------------------------------------------------------
# Pipeline-level single-row entry: detect + parse
# --------------------------------------------------------------------------

_NULL_ROW = {
    "priority": None,
    "facility": None,
    "severity": None,
    "version": None,
    "timestamp": None,
    "tz_offset_minutes": None,
    "hostname": None,
    "tag": None,
    "content": None,
    "app_name": None,
    "proc_id": None,
    "msg_id": None,
    "structured_data": None,
    "message": None,
}


def parse_row(text: str | bytes, cfg: ParserConfig = ParserConfig()) -> dict:
    """Detect the dialect and parse one message — the per-row semantics of
    the daemon loop the reference library is embedded into
    (reference README.md:83-101).

    Returns a flat dict with the union schema: ``rfc`` (0/1/2), the parse
    columns (dialect-inapplicable ones None) and ``parse_error``.
    """
    buff = text.encode("utf-8") if isinstance(text, str) else text
    out = dict(_NULL_ROW)
    out["rfc"] = RFC_UNKNOWN
    out["parse_error"] = None
    try:
        rfc = detect_rfc(buff)
    except ParserError as e:
        out["parse_error"] = e.msg
        return out
    except IndexError:
        out["parse_error"] = ERR_INDEX_OUT_OF_RANGE
        return out
    out["rfc"] = rfc
    if rfc == RFC_3164:
        parts, err = parse_rfc3164(buff, cfg)
    else:
        parts, err = parse_rfc5424(buff, cfg)
    if err is not None:
        out["parse_error"] = err
        return out
    out.update(parts)
    return out
