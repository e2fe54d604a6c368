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


def _lookup_month(value: str, long: bool) -> tuple[int, str]:
    """Case-insensitive month-name prefix match (Go lookup()).

    Go's ``Jan`` token matches SHORT names only and ``January`` LONG
    names only (time/format.go stdMonth vs stdLongMonth) — value
    "January" against layout "Jan" consumes just "Jan"."""
    low = value.lower()
    names = _LONG_MONTHS if long else _SHORT_MONTHS
    for i, name in enumerate(names):
        if low.startswith(name.lower()):
            return i + 1, value[len(name):]
    raise GoParseError("bad month")


_WEEKDAYS_SHORT = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_WEEKDAYS_LONG = [
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sunday",
]


def _lookup_name(value: str, names: list[str], what: str) -> str:
    low = value.lower()
    for name in names:
        if low.startswith(name.lower()):
            return value[len(name):]
    raise GoParseError(f"bad {what}")


def _digits(value: str, lo: int, hi: int) -> tuple[int, str]:
    """lo..hi ASCII digits (Go getnum/getnum3 shapes)."""
    i = 0
    while i < hi and i < len(value) and value[i].isdigit() and value[i].isascii():
        i += 1
    if i < lo:
        raise GoParseError("bad value")
    return int(value[:i]), value[i:]


def _parse_frac(value: str, max_digits: int = 9) -> tuple[int, str]:
    """'.ddd' / ',ddd' -> microseconds (Go keeps ns; µs is this engine's
    timestamp resolution — sub-µs digits truncate, documented SURVEY §8.4)."""
    i = 1
    while i < 1 + max_digits and i < len(value) and value[i].isdigit():
        i += 1
    digits = value[1:i]
    ns = int(digits) * 10 ** (9 - len(digits))
    return ns // 1000, value[i:]


def _num_zone(value: str, colons: int, parts: int) -> tuple[int, str]:
    """Numeric zone body: sign + hh[:]mm[[:]ss] -> seconds east of UTC.

    ``parts`` = number of 2-digit groups (1=hh, 2=hh mm, 3=hh mm ss);
    ``colons`` = whether groups are colon-separated.  Mirrors Go's
    stdNumTZ family slicing; like Go, no range check on the zone hour.
    """
    if not value or value[0] not in "+-":
        raise GoParseError("bad zone sign")
    sign = 1 if value[0] == "+" else -1
    value = value[1:]
    groups = []
    for k in range(parts):
        if colons and k > 0:
            if value[:1] != ":":
                raise GoParseError("bad zone")
            value = value[1:]
        if len(value) < 2 or not value[:2].isdigit() or not value[:2].isascii():
            raise GoParseError("bad zone")
        groups.append(int(value[:2]))
        value = value[2:]
    while len(groups) < 3:
        groups.append(0)
    hh, mm, ss = groups
    return sign * ((hh * 60 + mm) * 60 + ss), value


# layout token table: (token, kind) — longest-first within a leading char
# so the prefix scan resolves ambiguities ("2006" before "2", "002"
# before "02", "Monday" before "Mon", "-07:00:00" before "-07").
_ZONE_TOKENS = [
    ("-07:00:00", (True, 3)), ("-070000", (False, 3)),
    ("-07:00", (True, 2)), ("-0700", (False, 2)), ("-07", (False, 1)),
]
_ISO_ZONE_TOKENS = [
    ("Z07:00:00", (True, 3)), ("Z070000", (False, 3)),
    ("Z07:00", (True, 2)), ("Z0700", (False, 2)), ("Z07", (False, 1)),
]


def go_time_parse(layout: str, value: str) -> "GoTime":
    """Parse ``value`` against a Go time layout (time.Parse semantics).

    Full layout-token coverage: 2006/06 years, January/Jan/01/1 months,
    Monday/Mon weekdays (parsed, unvalidated — as in Go), 02/_2/2 days,
    002/__2 day-of-year, 15/03/3 hours with PM/pm, 04/4 05/5 min/sec,
    .0/.9 (and comma) fractions including Go's implicit value-side
    fraction after seconds, numeric zones (-0700 family, Z-prefixed ISO
    forms) and the MST abbreviation token.  Unset fields default to Go's
    zero value: year 0, month 1, day 1 — the year-0 default drives
    fixTimestampIfNeeded parity (rfc3164/rfc3164.go:331-346).
    Raises GoParseError like ``time.Parse`` returns an error.
    Divergences (documented, SURVEY §8.4): sub-µs fraction digits
    truncate (engine timestamps are µs); named-zone abbreviations resolve
    via the configured location's tzname or UTC/GMT, not Go's full
    zone-table scan.
    """
    t = GoTime()
    pm_set = am_set = False
    li = 0
    n_layout = len(layout)
    while li < n_layout:
        rest = layout[li:]
        c = rest[0]
        if c == "2" and rest.startswith("2006"):
            if len(value) < 4 or not value[:4].isdigit() or not value[:4].isascii():
                raise GoParseError("bad year")
            t.y, value = int(value[:4]), value[4:]
            li += 4
        elif c == "0" and rest.startswith("06") and not rest.startswith("002"):
            # NB: layout "06" only reaches here when not part of "2006"
            if len(value) < 2 or not value[:2].isdigit() or not value[:2].isascii():
                raise GoParseError("bad year")
            yy, value = int(value[:2]), value[2:]
            t.y = yy + (1900 if yy >= 69 else 2000)
            li += 2
        elif c == "J" and rest.startswith("January"):
            t.mo, value = _lookup_month(value, long=True)
            li += 7
        elif c == "J" and rest.startswith("Jan"):
            t.mo, value = _lookup_month(value, long=False)
            li += 3
        elif c == "M" and rest.startswith("Monday"):
            value = _lookup_name(value, _WEEKDAYS_LONG, "weekday")
            li += 6
        elif c == "M" and rest.startswith("Mon") and not rest.startswith("Monday"):
            value = _lookup_name(value, _WEEKDAYS_SHORT, "weekday")
            li += 3
        elif c == "M" and rest.startswith("MST"):
            value = _parse_zone_abbrev(t, value)
            li += 3
        elif c == "0" and rest.startswith("002"):
            t.yday, value = _getnum3(value, True)
            li += 3
        elif c == "_" and rest.startswith("__2"):
            for _ in range(2):
                if value[:1] == " ":
                    value = value[1:]
            t.yday, value = _getnum3(value, False)
            li += 3
        elif c == "1" and rest.startswith("15"):
            t.h, value = _getnum(value, False)
            if t.h >= 24:
                raise GoParseError("hour out of range")
            li += 2
        elif c == "0" and rest.startswith("01"):
            t.mo, value = _getnum(value, True)
            if t.mo <= 0 or t.mo > 12:
                raise GoParseError("month out of range")
            li += 2
        elif c == "0" and rest.startswith("03"):
            t.h, value = _getnum(value, True)
            if t.h > 12:
                raise GoParseError("hour out of range")
            li += 2
        elif c == "0" and rest.startswith("02"):
            t.d, value = _getnum(value, True)
            li += 2
        elif c == "_" and rest.startswith("_2"):
            if value[:1] == " ":
                value = value[1:]
            t.d, value = _getnum(value, False)
            li += 2
        elif c == "0" and rest.startswith("04"):
            t.mi, value = _getnum(value, True)
            if t.mi > 59:
                raise GoParseError("minute out of range")
            li += 2
        elif c == "0" and rest.startswith("05"):
            t.s, value = _getnum(value, True)
            if t.s > 59:
                raise GoParseError("second out of range")
            li += 2
            value = _implicit_frac(t, layout, li, value)
        elif c == "P" and rest.startswith("PM"):
            if value[:2] == "PM":
                pm_set, am_set = True, False
            elif value[:2] == "AM":
                am_set, pm_set = True, False
            else:
                raise GoParseError("bad PM")
            value = value[2:]
            li += 2
        elif c == "p" and rest.startswith("pm"):
            if value[:2] == "pm":
                pm_set, am_set = True, False
            elif value[:2] == "am":
                am_set, pm_set = True, False
            else:
                raise GoParseError("bad pm")
            value = value[2:]
            li += 2
        elif c in ".," and len(rest) >= 2 and rest[1] in "09":
            k = 1
            while k < len(rest) and rest[k] == rest[1]:
                k += 1
            ndig = k - 1
            if rest[1] == "0":
                # fixed fraction: separator + exactly ndig digits required
                if (
                    not value
                    or value[0] not in ".,"
                    or len(value) < 1 + ndig
                    or not value[1 : 1 + ndig].isdigit()
                ):
                    raise GoParseError("bad fraction")
                t.us, _ = _parse_frac(value[: 1 + ndig], ndig)
                value = value[1 + ndig:]
            else:
                # trailing-9s fraction: entirely optional; when present,
                # Go consumes ALL digits but keeps only the first 9 for
                # ns (time.Parse stdFracSecond9 -> parseNanoseconds
                # truncation) — 10+ digit fractions must not error
                if len(value) >= 2 and value[0] in ".," and value[1].isdigit():
                    t.us, value = _parse_frac(value)
                    while value[:1].isdigit() and value[:1].isascii():
                        value = value[1:]
            li += k
        elif c == "-" and any(rest.startswith(tok) for tok, _ in _ZONE_TOKENS):
            tok, (colons, parts) = next(
                (tok, spec) for tok, spec in _ZONE_TOKENS if rest.startswith(tok)
            )
            t.off_sec, value = _num_zone(value, colons, parts)
            li += len(tok)
        elif c == "Z" and any(rest.startswith(tok) for tok, _ in _ISO_ZONE_TOKENS):
            tok, (colons, parts) = next(
                (tok, spec) for tok, spec in _ISO_ZONE_TOKENS if rest.startswith(tok)
            )
            if value[:1] == "Z":
                t.off_sec, value = 0, value[1:]
            else:
                t.off_sec, value = _num_zone(value, colons, parts)
            li += len(tok)
        elif c == "1":
            t.mo, value = _getnum(value, False)
            if t.mo <= 0 or t.mo > 12:
                raise GoParseError("month out of range")
            li += 1
        elif c == "2":
            t.d, value = _getnum(value, False)
            li += 1
        elif c == "3":
            t.h, value = _getnum(value, False)
            if t.h > 12:
                raise GoParseError("hour out of range")
            li += 1
        elif c == "4":
            t.mi, value = _getnum(value, False)
            if t.mi > 59:
                raise GoParseError("minute out of range")
            li += 1
        elif c == "5":
            t.s, value = _getnum(value, False)
            if t.s > 59:
                raise GoParseError("second out of range")
            li += 1
            value = _implicit_frac(t, layout, li, value)
        else:
            if not value or value[0] != c:
                raise GoParseError("literal mismatch")
            value = value[1:]
            li += 1
    if value:
        raise GoParseError("extra text")
    if pm_set and t.h < 12:
        t.h += 12
    elif am_set and t.h == 12:
        t.h = 0
    if t.yday is not None:
        leap = is_leap(t.y)
        if t.yday < 1 or t.yday > 365 + leap:
            raise GoParseError("day-of-year out of range")
        acc = 0
        for m in range(1, 13):
            dim = days_in_month(m, t.y)
            if t.yday <= acc + dim:
                t.mo, t.d = m, t.yday - acc
                break
            acc += dim
    if t.d < 1 or t.d > days_in_month(t.mo, t.y):
        raise GoParseError("day out of range")
    return t


def _getnum3(value: str, fixed: bool) -> tuple[int, str]:
    """Go getnum3: exactly 3 digits if fixed, else 1-3."""
    i = 0
    while i < 3 and i < len(value) and value[i].isdigit() and value[i].isascii():
        i += 1
    if (fixed and i != 3) or i == 0:
        raise GoParseError("bad value")
    return int(value[:i]), value[i:]


def _implicit_frac(t: "GoTime", layout: str, li: int, value: str) -> str:
    """Go's value-side fraction after seconds even when the layout has no
    fraction token (time/format.go stdSecond special case)."""
    rest = layout[li:]
    if rest[:1] in (".", ",") and rest[1:2] in ("0", "9"):
        return value  # layout will consume it
    if len(value) >= 2 and value[0] in ".," and value[1].isdigit():
        n = 2
        while n < len(value) and value[n].isdigit():
            n += 1
        t.us, _ = _parse_frac(value[:n])
        return value[n:]
    return value


def _parse_zone_abbrev(t: "GoTime", value: str) -> str:
    """MST token: consume an uppercase zone abbreviation (2-5 letters,
    or 'GMT'); resolution to an offset happens in the caller via the
    configured location (resolve_zone_name)."""
    if value[:3] in ("UTC", "GMT"):
        t.zone_name, t.off_sec = value[:3], 0
        return value[3:]
    i = 0
    while i < 5 and i < len(value) and value[i].isupper() and value[i].isascii():
        i += 1
    if i < 2:
        raise GoParseError("bad zone name")
    t.zone_name = value[:i]
    return value[i:]


def resolve_zone_name(name: str, location: str, year: int) -> int:
    """Offset seconds for a parsed zone abbreviation: match the
    location's standard/DST tznames for the parsed year (Go looks the
    abbreviation up in the target location), else 0 (Go's FixedZone(name,
    0) fallback for unknown abbreviations)."""
    if location in ("UTC", "", None):
        return 0
    import datetime as dt

    try:
        from zoneinfo import ZoneInfo

        z = ZoneInfo(location)
        yy = year if 1 <= year <= 9998 else 2000
        for probe_month in (1, 7):
            probe = dt.datetime(yy, probe_month, 1, tzinfo=z)
            if probe.tzname() == name:
                return int(probe.utcoffset().total_seconds())
    except Exception:
        pass
    return 0


class GoTime:
    """Mutable parse result (Go zero values; off_sec None = no zone info)."""

    __slots__ = ("y", "mo", "d", "h", "mi", "s", "us", "off_sec", "zone_name", "yday")

    def __init__(self):
        self.y, self.mo, self.d = 0, 1, 1
        self.h = self.mi = self.s = self.us = 0
        self.off_sec = None
        self.zone_name = None
        self.yday = None
