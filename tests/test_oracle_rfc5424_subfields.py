"""Remaining RFC5424 sub-field vectors, ported verbatim.

Source: /root/reference/rfc5424/rfc5424_test.go:505-944 (year / month /
day / hour / minute / second grammar cases with exact error sentinels)
plus the offset/partial-time/full-time compositions at :1020-1132.
"""

import pytest

from rayslog.errors import (
    ERR_DAY_INVALID,
    ERR_EOL,
    ERR_HOUR_INVALID,
    ERR_MINUTE_INVALID,
    ERR_MONTH_INVALID,
    ERR_SECOND_INVALID,
    ERR_TIMEZONE_INVALID,
    ERR_YEAR_INVALID,
    ParserError,
)
from rayslog.kernels.oracle import (
    _get_hour_minute,
    _parse_year_5424,
    parse_2_digits,
)


class TestParseYear:
    # rfc5424_test.go:505-556
    def test_invalid(self):
        with pytest.raises(ParserError) as e:
            _parse_year_5424(b"1a2b", 0, 4)
        assert e.value.msg == ERR_YEAR_INVALID

    def test_too_short_is_eol(self):
        with pytest.raises(ParserError) as e:
            _parse_year_5424(b"123", 0, 3)
        assert e.value.msg == ERR_EOL

    def test_valid(self):
        assert _parse_year_5424(b"2013", 0, 4) == (2013, 4)


@pytest.mark.parametrize(
    "buff,lo,hi,err,expect",
    [
        # month (rfc5424_test.go:558-623)
        (b"ab", 1, 12, ERR_MONTH_INVALID, None),
        (b"00", 1, 12, ERR_MONTH_INVALID, None),
        (b"13", 1, 12, ERR_MONTH_INVALID, None),
        (b"1", 1, 12, ERR_EOL, None),
        (b"02", 1, 12, None, 2),
        # day (rfc5424_test.go:625-691)
        (b"ab", 1, 31, ERR_DAY_INVALID, None),
        (b"1", 1, 31, ERR_EOL, None),
        (b"00", 1, 31, ERR_DAY_INVALID, None),
        (b"32", 1, 31, ERR_DAY_INVALID, None),
        (b"02", 1, 31, None, 2),
        # hour (rfc5424_test.go:693-~770): 00-23
        (b"azer", 0, 23, ERR_HOUR_INVALID, None),
        (b"24", 0, 23, ERR_HOUR_INVALID, None),
        (b"23", 0, 23, None, 23),
        (b"00", 0, 23, None, 0),
        # minute / second: 00-59
        (b"60", 0, 59, ERR_MINUTE_INVALID, None),
        (b"59", 0, 59, None, 59),
        (b"60", 0, 59, ERR_SECOND_INVALID, None),
        (b"05", 0, 59, None, 5),
    ],
)
def test_two_digit_fields(buff, lo, hi, err, expect):
    if err is None:
        v, cur = parse_2_digits(buff, 0, len(buff), lo, hi, "unused")
        assert v == expect
        assert cur == 2
    else:
        real_err = err if err != ERR_EOL else "unused"
        with pytest.raises(ParserError) as e:
            parse_2_digits(buff, 0, len(buff), lo, hi, real_err)
        assert e.value.msg == (ERR_EOL if err == ERR_EOL else err)


class TestGetHourMinute:
    # rfc5424_test.go:1053-1069 + offset grammar via _parse_ts_5424
    def test_valid(self):
        h, m, cur = _get_hour_minute(b"12:34", 0, 5)
        assert (h, m, cur) == (12, 34, 5)

    def test_missing_colon(self):
        from rayslog.errors import ERR_INVALID_TIME_FORMAT

        with pytest.raises(ParserError) as e:
            _get_hour_minute(b"12x34", 0, 5)
        assert e.value.msg == ERR_INVALID_TIME_FORMAT


class TestOffsets:
    # rfc5424_test.go:1020-1051 via the timestamp kernel
    def test_z_and_numeric(self):
        from rayslog.kernels.oracle import _parse_ts_5424

        ts, off, cur = _parse_ts_5424(b"2003-10-11T22:14:15Z", 0, 20)
        assert off == 0 and cur == 20
        ts, off, cur = _parse_ts_5424(b"2003-10-11T22:14:15+02:00", 0, 25)
        assert off == 120 and cur == 25

    def test_bad_sign_collapses(self):
        from rayslog.errors import ERR_TIMESTAMP_UNKNOWN_FORMAT
        from rayslog.kernels.oracle import _parse_ts_5424

        with pytest.raises(ParserError) as e:
            _parse_ts_5424(b"2003-10-11T22:14:15*02:00", 0, 25)
        assert e.value.msg == ERR_TIMESTAMP_UNKNOWN_FORMAT
