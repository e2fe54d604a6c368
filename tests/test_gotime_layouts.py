"""Full Go-layout WithTimestampFormat coverage (time.Parse semantics).

The reference accepts ANY Go layout via WithTimestampFormat
(rfc3164/rfc3164.go:84-86) and hands it to time.ParseInLocation; these
vectors pin the engine's go_time_parse to Go's documented token
behaviors: 2-digit years, 12-hour clocks + AM/PM, fixed and
trailing-9s fractions (plus Go's implicit value-side fraction), numeric
zone tokens, the MST abbreviation token, weekday tokens and day-of-year.
"""

import pytest

from rayslog.config import ParserConfig
from rayslog.kernels.gotime import (
    GoParseError,
    civil_to_epoch_us,
    go_time_parse,
)
from rayslog.kernels.oracle import parse_rfc3164


def ymd(t):
    return (t.y, t.mo, t.d, t.h, t.mi, t.s, t.us, t.off_sec)


def test_numeric_zone_colon():
    t = go_time_parse("2006-01-02T15:04:05-07:00", "2021-06-15T10:30:00+05:30")
    assert ymd(t) == (2021, 6, 15, 10, 30, 0, 0, 5 * 3600 + 30 * 60)


def test_numeric_zone_compact_negative():
    t = go_time_parse("Jan 02 15:04:05 -0700 2006", "Jun 23 13:17:42 -0430 2021")
    assert ymd(t) == (2021, 6, 23, 13, 17, 42, 0, -(4 * 3600 + 30 * 60))


def test_iso_zone_z_literal_and_offset():
    t = go_time_parse("2006-01-02T15:04:05Z07:00", "2021-01-02T03:04:05Z")
    assert t.off_sec == 0
    t = go_time_parse("2006-01-02T15:04:05Z07:00", "2021-01-02T03:04:05+02:00")
    assert t.off_sec == 7200


def test_short_numeric_zone():
    t = go_time_parse("15:04:05-07", "10:00:00+09")
    assert t.off_sec == 9 * 3600


def test_two_digit_year_sliding_window():
    # Go: 69-99 -> 19xx, 00-68 -> 20xx
    assert go_time_parse("06-01-02", "99-12-31").y == 1999
    assert go_time_parse("06-01-02", "69-01-01").y == 1969
    assert go_time_parse("06-01-02", "68-01-01").y == 2068
    assert go_time_parse("06-01-02", "00-01-01").y == 2000


def test_twelve_hour_pm_am():
    t = go_time_parse("3:04 PM", "1:30 PM")
    assert (t.h, t.mi) == (13, 30)
    t = go_time_parse("03:04 PM", "12:05 AM")
    assert (t.h, t.mi) == (0, 5)
    t = go_time_parse("3:04 pm", "12:00 pm")
    assert t.h == 12
    with pytest.raises(GoParseError):
        go_time_parse("3:04 PM", "1:30 pm")  # case-sensitive in Go


def test_fixed_fraction():
    t = go_time_parse("15:04:05.000", "22:14:15.123")
    assert t.us == 123_000
    with pytest.raises(GoParseError):
        go_time_parse("15:04:05.000", "22:14:15")  # fixed fraction required


def test_trailing_nines_fraction_optional():
    assert go_time_parse("15:04:05.999", "22:14:15.25").us == 250_000
    assert go_time_parse("15:04:05.999", "22:14:15").us == 0
    # RFC3339Nano-style: 9 digits consumed, sub-µs truncates (engine is µs)
    t = go_time_parse(
        "2006-01-02T15:04:05.999999999Z07:00", "2021-03-04T05:06:07.123456789+01:00"
    )
    assert t.us == 123_456
    assert t.off_sec == 3600


def test_trailing_nines_fraction_ten_plus_digits():
    # Go consumes ALL fraction digits and keeps the first 9 for ns
    # (parseNanoseconds truncation) — 10+ digits must not error
    t = go_time_parse("15:04:05.9", "22:14:15.1234567891234")
    assert t.us == 123_456
    t = go_time_parse(
        "2006-01-02T15:04:05.999999999Z07:00",
        "2021-03-04T05:06:07.12345678901+01:00",
    )
    assert t.us == 123_456 and t.off_sec == 3600
    # a non-digit right after the consumed run still parses normally
    t = go_time_parse("15:04:05.9 MST", "22:14:15.9999999999 UTC")
    assert t.us == 999_999


def test_implicit_fraction_after_seconds():
    # Go accepts a value-side fraction even when the layout has none
    t = go_time_parse("15:04:05", "22:14:15.5")
    assert (t.s, t.us) == (15, 500_000)


def test_zone_abbreviation_token():
    t = go_time_parse("Jan 02 15:04:05 MST 2006", "Jan 02 15:04:05 UTC 2006")
    assert t.off_sec == 0
    t = go_time_parse("Jan 02 15:04:05 MST 2006", "Jan 02 15:04:05 PST 2006")
    assert t.zone_name == "PST" and t.off_sec is None  # caller resolves
    with pytest.raises(GoParseError):
        go_time_parse("Jan 02 15:04:05 MST 2006", "Jan 02 15:04:05 xst 2006")


def test_weekday_tokens_parsed_not_validated():
    # Go parses the weekday name but does not check date consistency
    t = go_time_parse("Mon Jan _2 15:04:05 2006", "Fri Jun  3 11:22:33 2022")
    assert (t.y, t.mo, t.d) == (2022, 6, 3)
    t = go_time_parse("Mon Jan _2 15:04:05 2006", "Mon Jun  3 11:22:33 2022")
    assert (t.y, t.mo, t.d) == (2022, 6, 3)
    t2 = go_time_parse("Monday Jan 2 2006", "Wednesday Jun 3 2022")
    assert (t2.mo, t2.d) == (6, 3)


def test_day_of_year_tokens():
    t = go_time_parse("2006-002", "2021-032")
    assert (t.mo, t.d) == (2, 1)
    t = go_time_parse("2006 __2", "2021  32")
    assert (t.mo, t.d) == (2, 1)
    # leap year: day 60 is Feb 29
    t = go_time_parse("2006-002", "2020-060")
    assert (t.mo, t.d) == (2, 29)
    with pytest.raises(GoParseError):
        go_time_parse("2006-002", "2021-366")  # non-leap


def test_end_to_end_3164_custom_layout_with_zone():
    """rfc3164.go:84-86: WithTimestampFormat with a numeric-zone layout;
    the parsed offset shifts the stored UTC epoch."""
    cfg = ParserConfig(
        default_year=2025, timestamp_format="2006-01-02T15:04:05-07:00"
    )
    parts, err = parse_rfc3164(
        b"<30>2021-06-15T10:30:00+05:30 localhost foo: hello zone", cfg
    )
    assert err is None
    assert parts["timestamp"] == civil_to_epoch_us(2021, 6, 15, 5, 0, 0, 0)
    assert parts["hostname"] == "localhost"
    assert parts["tag"] == "foo"
    assert parts["content"] == "hello zone"


def test_end_to_end_3164_custom_layout_fraction():
    cfg = ParserConfig(
        default_year=2025, timestamp_format="2006-01-02 15:04:05.000"
    )
    parts, err = parse_rfc3164(
        b"<30>2021-06-15 10:30:00.250 localhost foo: frac", cfg
    )
    assert err is None
    assert parts["timestamp"] == civil_to_epoch_us(2021, 6, 15, 10, 30, 0, 250_000)


def test_named_zone_resolves_in_location():
    """MST-token abbreviation resolved against the configured location
    (Go ParseInLocation looks the name up in loc's zone table)."""
    cfg = ParserConfig(
        default_year=2025,
        location="America/New_York",
        timestamp_format="Jan _2 15:04:05 MST 2006",
    )
    parts, err = parse_rfc3164(
        b"<30>Jun 23 13:17:42 EDT 2021 localhost foo: named zone", cfg
    )
    assert err is None
    # 13:17:42 EDT (UTC-4) == 17:17:42 UTC
    assert parts["timestamp"] == civil_to_epoch_us(2021, 6, 23, 17, 17, 42, 0)


def test_month_token_name_length_strictness():
    """Go's 'Jan' token matches SHORT names only (value 'January'
    consumes just 'Jan', leaving 'uary' to mismatch); 'January' matches
    LONG names only."""
    t = go_time_parse("Jan-2006", "Jun-2021")
    assert (t.mo, t.y) == (6, 2021)
    with pytest.raises(GoParseError):
        go_time_parse("02 Jan 2006", "02 January 2006")
    with pytest.raises(GoParseError):
        go_time_parse("02 January 2006", "02 Jan 2006")
    t = go_time_parse("January 2 2006", "june 3 2021")  # case-insensitive
    assert (t.mo, t.d) == (6, 3)


def test_bad_layout_value_mismatches_error():
    for layout, value in [
        ("2006-01-02", "21-01-02"),
        ("15:04:05-07:00", "15:04:05~07:00"),
        ("3:04 PM", "13:04 PM"),
        ("Jan 2 2006", "Foo 2 2006"),
    ]:
        with pytest.raises(GoParseError):
            go_time_parse(layout, value)
