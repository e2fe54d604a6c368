"""Ported conformance vectors: priority / version / detection.

Sources: /root/reference/parsercommon/parsercommon_test.go:9-151,
/root/reference/syslogparser_test.go:9-29, edge quirks from
syslogparser.go:30-56.
"""

import pytest

from rayslog.errors import (
    ERR_INDEX_OUT_OF_RANGE,
    ERR_PRIORITY_EMPTY,
    ERR_PRIORITY_NON_DIGIT,
    ERR_PRIORITY_NO_END,
    ERR_PRIORITY_NO_START,
    ERR_PRIORITY_TOO_LONG,
    ERR_PRIORITY_TOO_SHORT,
    ERR_VERSION_NOT_FOUND,
    ParserError,
)
from rayslog.kernels import oracle
from rayslog.kernels.oracle import (
    NO_VERSION,
    RFC_3164,
    RFC_5424,
    detect_rfc,
    parse_priority,
    parse_row,
    parse_version,
)


def _pri(buff: bytes):
    return parse_priority(buff, 0, len(buff))


class TestParsePriority:
    # parsercommon_test.go:17-65
    def test_empty(self):
        with pytest.raises(ParserError) as e:
            _pri(b"")
        assert e.value.msg == ERR_PRIORITY_EMPTY

    def test_no_start(self):
        with pytest.raises(ParserError) as e:
            _pri(b"7>")
        assert e.value.msg == ERR_PRIORITY_NO_START

    def test_no_end(self):
        with pytest.raises(ParserError) as e:
            _pri(b"<77")
        assert e.value.msg == ERR_PRIORITY_NO_END

    def test_too_short(self):
        with pytest.raises(ParserError) as e:
            _pri(b"<>")
        assert e.value.msg == ERR_PRIORITY_TOO_SHORT

    def test_too_long(self):
        with pytest.raises(ParserError) as e:
            _pri(b"<1233>")
        assert e.value.msg == ERR_PRIORITY_TOO_LONG

    def test_non_digit(self):
        with pytest.raises(ParserError) as e:
            _pri(b"<7a8>")
        assert e.value.msg == ERR_PRIORITY_NON_DIGIT

    def test_good(self):
        pri, cursor = _pri(b"<190>")
        assert pri == 190
        assert cursor == 5
        # facility/severity law (parsercommon.go:124-133)
        assert pri // 8 == 23
        assert pri % 8 == 6


class TestParseVersion:
    # parsercommon_test.go:101-151
    def test_not_found(self):
        buff = b"<123>"
        with pytest.raises(ParserError) as e:
            parse_version(buff, 5, len(buff))
        assert e.value.msg == ERR_VERSION_NOT_FOUND

    def test_non_digit(self):
        buff = b"<123>a"
        v, cursor = parse_version(buff, 5, len(buff))
        assert v == NO_VERSION
        assert cursor == 6

    def test_digit(self):
        buff = b"<123>1"
        v, cursor = parse_version(buff, 5, len(buff))
        assert v == 1
        assert cursor == 6


class TestParseHostname:
    # parsercommon_test.go:153-193
    def test_stops_at_space(self):
        from rayslog.kernels.oracle import parse_hostname_common

        h, cur = parse_hostname_common(b"foo name", 0, 8)
        assert (h, cur) == ("foo", 3)

    def test_runs_to_end(self):
        from rayslog.kernels.oracle import parse_hostname_common

        buff = b"ubuntu11.somehost.com "
        h, cur = parse_hostname_common(buff, 0, len(buff))
        assert h == "ubuntu11.somehost.com"
        assert cur == len("ubuntu11.somehost.com")


class TestFindNextSpace:
    # parsercommon_test.go:195-229
    def test_no_space(self):
        from rayslog.errors import ERR_NO_SPACE
        from rayslog.kernels.oracle import find_next_space

        with pytest.raises(ParserError) as e:
            find_next_space(b"aaaaaa", 0, 6)
        assert e.value.msg == ERR_NO_SPACE

    def test_space_found(self):
        from rayslog.kernels.oracle import find_next_space

        assert find_next_space(b"foo bar baz", 0, 11) == 4


class TestDetectRFC:
    # syslogparser_test.go:9-29
    def test_3164(self):
        assert (
            detect_rfc(b"<34>Oct 11 22:14:15 mymachine su: 'su root' failed")
            == RFC_3164
        )

    def test_5424(self):
        assert (
            detect_rfc(b"<165>1 2003-10-11T22:14:15.003Z mymachine.example.com")
            == RFC_5424
        )

    def test_no_gt_long_buffer_is_5424_quirk(self):
        # syslogparser.go:32,51-55 — v stays 0 != NO_VERSION, err nil.
        assert detect_rfc(b"plain text message here") == RFC_5424

    def test_gt_at_offset_9_is_unknown(self):
        # '>' at index 9 => ParseVersion cursor 10 >= max => error
        with pytest.raises(ParserError) as e:
            detect_rfc(b"<12345678>1 rest here")
        assert e.value.msg == ERR_VERSION_NOT_FOUND

    def test_short_buffer_without_gt_panics_like_go(self):
        with pytest.raises(IndexError):
            detect_rfc(b"short")

    def test_gt_at_end_of_short_buffer_panics_like_go(self):
        # '>' at index 3, version read at index 4 beyond the real buffer
        # while l=10 (DetectRFC passes max=10 as the length).
        with pytest.raises(IndexError):
            detect_rfc(b"<34>")


class TestParseRowErrors:
    def test_unknown_rfc_row(self):
        row = parse_row("<12345678>1 rest here")
        assert row["rfc"] == oracle.RFC_UNKNOWN
        assert row["parse_error"] == ERR_VERSION_NOT_FOUND

    def test_panic_row(self):
        row = parse_row("short")
        assert row["rfc"] == oracle.RFC_UNKNOWN
        assert row["parse_error"] == ERR_INDEX_OUT_OF_RANGE

    def test_quirk_routes_to_5424_priority_error(self):
        row = parse_row("plain text message here")
        assert row["rfc"] == RFC_5424
        assert row["parse_error"] == ERR_PRIORITY_NO_START
