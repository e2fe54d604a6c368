"""Go ``time`` semantics needed for reference parity.

The reference parses timestamps with Go's ``time.ParseInLocation`` /
``time.Date`` (rfc3164/rfc3164.go:202-259, rfc5424/rfc5424.go:238-286).
This module reimplements the small subset the parsers rely on:

- proleptic-Gregorian civil-date arithmetic valid for ANY year (RFC5424
  accepts any 4-digit year including 0000, rfc5424/rfc5424.go:368-388,
  which Python ``datetime`` cannot represent),
- ``time.Date``-style normalization (out-of-range day rolls into the next
  month, e.g. Feb 31 -> Mar 3),
- a mini Go-layout parser covering the layouts the reference uses:
  ``"Jan 02 15:04:05"``, ``"Jan  2 15:04:05"`` and user formats built from
  the common layout tokens (2006 01 02 _2 2 15 04 05 Jan January),
- Go ``strconv.Atoi`` strictness.

No code is ported from the reference; semantics follow the public Go
``time`` documentation and the published RFC grammars.
"""

from __future__ import annotations

from rayslog.errors import ParserError

US_PER_SEC = 1_000_000
US_PER_DAY = 86_400 * US_PER_SEC

_SHORT_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]
_LONG_MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
MONTH_INDEX = {m: i + 1 for i, m in enumerate(_SHORT_MONTHS)}


def is_leap(year: int) -> bool:
    return year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)


_DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def days_in_month(month: int, year: int) -> int:
    if month == 2 and is_leap(year):
        return 29
    return _DAYS_IN_MONTH[month - 1]


def days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01 for a proleptic-Gregorian civil date.

    Howard Hinnant's public-domain algorithm; valid for all years
    (negative included).  ``d`` may be out of range — extra days simply
    roll forward, which reproduces Go ``time.Date`` normalization.
    """
    y_adj = y - (1 if m <= 2 else 0)
    era = (y_adj if y_adj >= 0 else y_adj - 399) // 400
    yoe = y_adj - era * 400                       # [0, 399]
    mp = (m + 9) % 12                             # Mar=0 .. Feb=11
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146_097 + doe - 719_468


def civil_to_epoch_us(
    y: int, mo: int, d: int, h: int, mi: int, s: int, us: int
) -> int:
    """Epoch microseconds for a (possibly denormalized) civil datetime, UTC."""
    return (
        days_from_civil(y, mo, d) * US_PER_DAY
        + h * 3_600 * US_PER_SEC
        + mi * 60 * US_PER_SEC
        + s * US_PER_SEC
        + us
    )


def wall_to_epoch_us(
    y: int, mo: int, d: int, h: int, mi: int, s: int, us: int, location: str
) -> int:
    """Epoch µs for a wall-clock time in an IANA zone (Go ParseInLocation)."""
    if location in ("UTC", "", None):
        return civil_to_epoch_us(y, mo, d, h, mi, s, us)
    import datetime as dt
    from zoneinfo import ZoneInfo

    # Normalize the date first (day may overflow the month after the
    # reference's year substitution, e.g. Feb 29 year-0 -> default year).
    base = dt.datetime(y, mo, 1, tzinfo=ZoneInfo(location)) + dt.timedelta(
        days=d - 1, hours=h, minutes=mi, seconds=s, microseconds=us
    )
    return int(base.timestamp() * US_PER_SEC)


def go_atoi(s: str) -> int:
    """Go ``strconv.Atoi``: optional sign + digits, nothing else."""
    body = s[1:] if s[:1] in ("+", "-") else s
    if not body or not body.isdigit() or not body.isascii():
        raise ValueError(f"invalid syntax: {s!r}")
    return int(s, 10)


class GoParseError(ValueError):
    pass


def _getnum(value: str, fixed: bool) -> tuple[int, str]:
    """Go's getnum: 2 digits if fixed, else 1-2 digits."""
    d0 = len(value) > 0 and value[0].isdigit() and value[0].isascii()
    d1 = len(value) > 1 and value[1].isdigit() and value[1].isascii()
    if fixed:
        if not (d0 and d1):
            raise GoParseError("bad value")
        return int(value[:2]), value[2:]
    if not d0:
        raise GoParseError("bad value")
    if d1:
        return int(value[:2]), value[2:]
    return int(value[:1]), value[1:]


def _lookup_month(value: str) -> tuple[int, str]:
    """Case-insensitive month-name prefix match (Go lookup())."""
    low = value.lower()
    for names in (_LONG_MONTHS, _SHORT_MONTHS):
        for i, name in enumerate(names):
            if low.startswith(name.lower()):
                return i + 1, value[len(name):]
    raise GoParseError("bad month")


def go_time_parse(layout: str, value: str) -> tuple[int, int, int, int, int, int]:
    """Parse ``value`` against a Go time layout; returns (y,mo,d,h,mi,s).

    Supports the layout tokens the reference's configurable RFC3164
    timestamp formats use (fractional seconds / zones are not part of the
    RFC3164 grammar and are intentionally unsupported).  Unparsed fields
    default to Go's zero value: year 0, month 1, day 1 — the year-0
    default drives fixTimestampIfNeeded parity (rfc3164/rfc3164.go:331-346).
    Raises GoParseError like ``time.Parse`` returns an error.
    """
    y, mo, d, h, mi, s = 0, 1, 1, 0, 0, 0
    li = 0
    while li < len(layout):
        rest = layout[li:]
        if rest.startswith("2006"):
            if len(value) < 4 or not value[:4].isdigit() or not value[:4].isascii():
                raise GoParseError("bad year")
            y, value = int(value[:4]), value[4:]
            li += 4
        elif rest.startswith("January"):
            mo, value = _lookup_month(value)
            li += 7
        elif rest.startswith("Jan"):
            mo, value = _lookup_month(value)
            li += 3
        elif rest.startswith("15"):
            h, value = _getnum(value, False)
            if h >= 24:
                raise GoParseError("hour out of range")
            li += 2
        elif rest.startswith("01"):
            mo, value = _getnum(value, True)
            if mo <= 0 or mo > 12:
                raise GoParseError("month out of range")
            li += 2
        elif rest.startswith("02"):
            d, value = _getnum(value, True)
            li += 2
        elif rest.startswith("_2"):
            if value[:1] == " ":
                value = value[1:]
            d, value = _getnum(value, False)
            li += 2
        elif rest.startswith("04"):
            mi, value = _getnum(value, True)
            if mi > 59:
                raise GoParseError("minute out of range")
            li += 2
        elif rest.startswith("05"):
            s, value = _getnum(value, True)
            if s > 59:
                raise GoParseError("second out of range")
            li += 2
        elif rest.startswith("1"):
            mo, value = _getnum(value, False)
            if mo <= 0 or mo > 12:
                raise GoParseError("month out of range")
            li += 1
        elif rest.startswith("2"):
            d, value = _getnum(value, False)
            li += 1
        else:
            if not value or value[0] != layout[li]:
                raise GoParseError("literal mismatch")
            value = value[1:]
            li += 1
    if value:
        raise GoParseError("extra text")
    if d < 1 or d > days_in_month(mo, y):
        raise GoParseError("day out of range")
    return y, mo, d, h, mi, s
