"""Ported RFC3164 conformance vectors.

Source: /root/reference/rfc3164/rfc3164_test.go (golden full-message
vectors, sub-parser vectors with exact cursor positions, size clamps).
The reference substitutes the CURRENT year into year-less timestamps
(rfc3164/rfc3164.go:331-346); tests pin ``default_year=2025``.
"""

import pytest

from rayslog.config import ParserConfig
from rayslog.errors import ERR_TIMESTAMP_UNKNOWN_FORMAT
from rayslog.kernels.oracle import (
    MAX_PACKET_LEN_3164,
    parse_content_3164,
    parse_rfc3164,
    parse_tag_3164,
    _parse_ts_3164,
)
from tests.conftest import epoch_us

CFG = ParserConfig(default_year=2025)


class TestParserValid:
    # rfc3164_test.go:20-62
    def test_valid(self):
        parts, err = parse_rfc3164(
            b"<34>Oct 11 22:14:15 mymachine very.large.syslog.message.tag: "
            b"'su root' failed for lonvick on /dev/pts/8",
            CFG,
        )
        assert err is None
        assert parts == {
            "priority": 34,
            "facility": 4,
            "severity": 2,
            "timestamp": epoch_us(2025, 10, 11, 22, 14, 15),
            "hostname": "mymachine",
            "tag": "very.large.syslog.message.tag",
            "content": "'su root' failed for lonvick on /dev/pts/8",
        }

    # rfc3164_test.go:64-110
    def test_with_priority(self):
        parts, err = parse_rfc3164(
            b"Oct 11 22:14:15 mymachine very.large.syslog.message.tag: "
            b"'su root' failed for lonvick on /dev/pts/8",
            ParserConfig(default_year=2025, priority=0),
        )
        assert err is None
        assert parts["priority"] == 0
        assert parts["facility"] == 0
        assert parts["severity"] == 0
        assert parts["hostname"] == "mymachine"
        assert parts["tag"] == "very.large.syslog.message.tag"

    # rfc3164_test.go:112-141
    def test_with_hostname(self):
        parts, err = parse_rfc3164(
            b"<30>Jun 23 13:17:42 chronyd[1119]: Selected source 192.168.65.1",
            ParserConfig(default_year=2025, hostname="dummy"),
        )
        assert err is None
        assert parts == {
            "priority": 30,
            "facility": 3,
            "severity": 6,
            "timestamp": epoch_us(2025, 6, 23, 13, 17, 42),
            "hostname": "dummy",
            "tag": "chronyd",
            "content": "Selected source 192.168.65.1",
        }

    # rfc3164_test.go:143-173
    def test_with_tag(self):
        parts, err = parse_rfc3164(
            b"<30>Jun 23 13:17:42 localhost Selected source 192.168.65.1",
            ParserConfig(default_year=2025, tag="chronyd"),
        )
        assert err is None
        assert parts["hostname"] == "localhost"
        assert parts["tag"] == "chronyd"
        assert parts["content"] == "Selected source 192.168.65.1"

    # rfc3164_test.go:175-207 — wall time kept in the location
    def test_with_location(self):
        parts, err = parse_rfc3164(
            b"<30>Jun 23 13:17:42 localhost foo: Selected source 192.168.65.1",
            ParserConfig(default_year=2025, location="America/New_York"),
        )
        assert err is None
        # 13:17:42 EDT (UTC-4) == 17:17:42 UTC
        assert parts["timestamp"] == epoch_us(2025, 6, 23, 17, 17, 42)
        assert parts["tag"] == "foo"

    # rfc3164_test.go:209-239
    def test_with_timestamp_format(self):
        parts, err = parse_rfc3164(
            b"<30>2006-01-02T15:04:05 localhost foo: Selected source 192.168.65.1",
            ParserConfig(default_year=2025, timestamp_format="2006-01-02T15:04:05"),
        )
        assert err is None
        assert parts["timestamp"] == epoch_us(2006, 1, 2, 15, 4, 5)
        assert parts["hostname"] == "localhost"
        assert parts["tag"] == "foo"
        assert parts["content"] == "Selected source 192.168.65.1"

    # rfc3164_test.go:241-293
    def test_with_priority_hostname_tag(self):
        parts, err = parse_rfc3164(
            b"Oct 11 22:14:15 'su root' failed for lonvick on /dev/pts/8",
            ParserConfig(
                default_year=2025, priority=0, hostname="mymachine", tag="foo"
            ),
        )
        assert err is None
        assert parts == {
            "priority": 0,
            "facility": 0,
            "severity": 0,
            "timestamp": epoch_us(2025, 10, 11, 22, 14, 15),
            "hostname": "mymachine",
            "tag": "foo",
            "content": "'su root' failed for lonvick on /dev/pts/8",
        }

    # rfc3164_test.go:563-590 — tag-less message: first token becomes tag
    def test_without_tag(self):
        parts, err = parse_rfc3164(
            b"<30>Jun 23 13:17:42 127.0.0.1 java.lang.NullPointerException", CFG
        )
        assert err is None
        assert parts["hostname"] == "127.0.0.1"
        assert parts["tag"] == "java.lang.NullPointerException"
        assert parts["content"] == ""

    # rfc3164_test.go:529-561 — MAX_PACKET_LEN truncation
    def test_size_clamp(self):
        start = b"<34>Oct 11 22:14:15 mymachine su: "
        parts, err = parse_rfc3164(start + b"a" * MAX_PACKET_LEN_3164, CFG)
        assert err is None
        assert len(parts["content"]) == MAX_PACKET_LEN_3164 - len(start)

        parts, err = parse_rfc3164(start + b"hello", CFG)
        assert err is None
        assert parts["content"] == "hello"

    def test_invalid_timestamp_errors(self):
        parts, err = parse_rfc3164(b"<34>Oct 34 32:72:82 mymachine su: foo", CFG)
        assert parts is None
        assert err == ERR_TIMESTAMP_UNKNOWN_FORMAT


class TestParseTimestamp:
    # rfc3164_test.go:383-451 — values AND cursor positions
    def _ts(self, buff: bytes, cfg=CFG):
        return _parse_ts_3164(buff, 0, len(buff), cfg)

    def test_invalid(self):
        from rayslog.errors import ParserError

        with pytest.raises(ParserError) as e:
            self._ts(b"Oct 34 32:72:82")
        assert e.value.msg == ERR_TIMESTAMP_UNKNOWN_FORMAT
        assert e.value.cursor == 15  # lastTriedTimestampLen

    def test_trailing_space(self):
        ts, cursor = self._ts(b"Oct 11 22:14:15 ")
        assert ts == epoch_us(2025, 10, 11, 22, 14, 15)
        assert cursor == 16

    def test_one_digit_day(self):
        ts, cursor = self._ts(b"Oct  1 22:14:15")
        assert ts == epoch_us(2025, 10, 1, 22, 14, 15)
        assert cursor == 15

    def test_valid(self):
        ts, cursor = self._ts(b"Oct 11 22:14:15")
        assert ts == epoch_us(2025, 10, 11, 22, 14, 15)
        assert cursor == 15

    def test_invalid_with_trailing_space_cursor(self):
        # header vector rfc3164_test.go:330-336: cursor = 15+1
        from rayslog.errors import ParserError

        with pytest.raises(ParserError) as e:
            self._ts(b"Oct 34 32:72:82 mymachine ")
        assert e.value.cursor == 16


class TestParseTag:
    # rfc3164_test.go:453-507
    @pytest.mark.parametrize(
        "buff,tag,cursor",
        [
            (b"apache2[10]:", "apache2", 12),
            (b"apache2:", "apache2", 8),
            (b"apache2: ", "apache2", 9),
            (b"a" * 50, "a" * 32, 32),
        ],
    )
    def test_vectors(self, buff, tag, cursor):
        got, cur = parse_tag_3164(buff, 0, len(buff), CFG)
        assert got == tag
        assert cur == cursor


class TestParseContent:
    # rfc3164_test.go:509-527
    def test_trims_ascii_spaces_both_sides(self):
        buff = b" foo bar baz quux "
        content, cursor = parse_content_3164(buff, 0, len(buff))
        assert content == "foo bar baz quux"
        assert cursor == len(content)
