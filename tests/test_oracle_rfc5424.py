"""Ported RFC5424 conformance vectors.

Source: /root/reference/rfc5424/rfc5424_test.go (golden full-message
vectors incl. SD variants, NILVALUE permutations, timestamp grammar
vectors incl. the nanosecond rejection, field caps, SD bracket-space
rule, size clamps).
"""

import pytest

from rayslog.config import ParserConfig
from rayslog.errors import (
    ERR_INVALID_APP_NAME,
    ERR_INVALID_MSG_ID,
    ERR_INVALID_PROC_ID,
    ERR_NO_STRUCTURED_DATA,
    ERR_TIMESTAMP_UNKNOWN_FORMAT,
    ParserError,
)
from rayslog.kernels.oracle import (
    MAX_PACKET_LEN_5424,
    _parse_sec_frac,
    _parse_ts_5424,
    _parse_up_to_len,
    parse_rfc5424,
    parse_structured_data,
)
from tests.conftest import epoch_us

CFG = ParserConfig(default_year=2025)


class TestParserFull:
    # rfc5424_test.go:14-134
    def test_no_sd_1(self):
        parts, err = parse_rfc5424(
            b"<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - "
            b"'su root' failed for lonvick on /dev/pts/8",
            CFG,
        )
        assert err is None
        assert parts == {
            "priority": 34,
            "facility": 4,
            "severity": 2,
            "version": 1,
            "timestamp": epoch_us(2003, 10, 11, 22, 14, 15, 3000),
            "tz_offset_minutes": 0,
            "hostname": "mymachine.example.com",
            "app_name": "su",
            "proc_id": "-",
            "msg_id": "ID47",
            "structured_data": "-",
            "message": "'su root' failed for lonvick on /dev/pts/8",
        }

    def test_no_sd_2_with_offset(self):
        parts, err = parse_rfc5424(
            b"<165>1 2003-08-24T05:14:15.000003-07:00 192.0.2.1 myproc 8710 - - "
            b"%% It's time to make the do-nuts.",
            CFG,
        )
        assert err is None
        assert parts["priority"] == 165
        assert parts["facility"] == 20
        assert parts["severity"] == 5
        # 05:14:15.000003 at -07:00 == 12:14:15.000003 UTC
        assert parts["timestamp"] == epoch_us(2003, 8, 24, 12, 14, 15, 3)
        assert parts["tz_offset_minutes"] == -420
        assert parts["hostname"] == "192.0.2.1"
        assert parts["proc_id"] == "8710"
        assert parts["msg_id"] == "-"
        assert parts["message"] == "%% It's time to make the do-nuts."

    def test_with_sd(self):
        sd = b'[exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"]'
        parts, err = parse_rfc5424(
            b"<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 "
            + sd
            + b" An application event log entry...",
            CFG,
        )
        assert err is None
        assert parts["app_name"] == "evntslog"
        assert parts["structured_data"] == sd.decode()
        assert parts["message"] == "An application event log entry..."

    def test_sd_only_contiguous_elements(self):
        sd = (
            b'[exampleSDID@32473 iut="3" eventSource= "Application" eventID="1011"]'
            b'[examplePriority@32473 class="high"]'
        )
        parts, err = parse_rfc5424(
            b"<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 "
            + sd,
            CFG,
        )
        assert err is None
        assert parts["structured_data"] == sd.decode()
        assert parts["message"] == ""

    # rfc5424_test.go:136-177
    def test_with_hostname_override(self):
        parts, err = parse_rfc5424(
            b"<34>1 2003-10-11T22:14:15.003Z su - ID47 - "
            b"'su root' failed for lonvick on /dev/pts/8",
            ParserConfig(hostname="mymachine.example.com"),
        )
        assert err is None
        assert parts["hostname"] == "mymachine.example.com"
        assert parts["app_name"] == "su"
        assert parts["proc_id"] == "-"
        assert parts["msg_id"] == "ID47"

    # rfc5424_test.go:179-222
    def test_with_priority_override(self):
        parts, err = parse_rfc5424(
            b"1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - "
            b"'su root' failed for lonvick on /dev/pts/8",
            ParserConfig(priority=34),
        )
        assert err is None
        assert parts["priority"] == 34
        assert parts["version"] == 1
        assert parts["app_name"] == "su"

    # rfc5424_test.go:271-386 — NILVALUE permutations
    def test_nilvalue_permutations(self):
        hdr = "<165>1 %s %s %s %s %s "
        ts, host, app, proc, msgid = (
            "2003-10-11T22:14:15.003Z",
            "mymachine.example.com",
            "su",
            "123",
            "ID47",
        )
        full_ts = epoch_us(2003, 10, 11, 22, 14, 15, 3000)
        cases = [
            ((ts, host, app, proc, msgid), dict(timestamp=full_ts)),
            (("-", host, app, proc, msgid), dict(timestamp=None)),
            ((ts, "-", app, proc, msgid), dict(hostname="-")),
            ((ts, host, "-", proc, msgid), dict(app_name="-")),
            ((ts, host, app, "-", msgid), dict(proc_id="-")),
            ((ts, host, app, proc, "-"), dict(msg_id="-")),
        ]
        for fields, expect in cases:
            buff = (hdr % fields + "- msg").encode()
            parts, err = parse_rfc5424(buff, CFG)
            assert err is None, fields
            for k, v in expect.items():
                assert parts[k] == v, (fields, k)

    # rfc5424_test.go:1320-1347
    def test_size_clamp(self):
        start = (
            b"<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 "
            b'[exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"] '
        )
        parts, err = parse_rfc5424(start + b"a" * MAX_PACKET_LEN_5424, CFG)
        assert err is None
        assert len(parts["message"]) == MAX_PACKET_LEN_5424 - len(start)

        parts, err = parse_rfc5424(start + b" hello ", CFG)
        assert err is None
        assert parts["message"] == "hello"


class TestParseTimestamp5424:
    # rfc5424_test.go:388-503
    def _ts(self, buff: bytes):
        return _parse_ts_5424(buff, 0, len(buff))

    def test_utc(self):
        ts, off, cursor = self._ts(b"1985-04-12T23:20:50.52Z")
        assert ts == epoch_us(1985, 4, 12, 23, 20, 50, 520000)
        assert off == 0
        assert cursor == 23

    def test_numeric_tz(self):
        ts, off, cursor = self._ts(b"1985-04-12T19:20:50.52-04:00")
        assert ts == epoch_us(1985, 4, 12, 23, 20, 50, 520000)
        assert off == -240
        assert cursor == 28

    def test_ms(self):
        ts, off, cursor = self._ts(b"2003-10-11T22:14:15.003Z")
        assert ts == epoch_us(2003, 10, 11, 22, 14, 15, 3000)
        assert cursor == 24

    def test_us(self):
        ts, off, cursor = self._ts(b"2003-08-24T05:14:15.000003-07:00")
        assert ts == epoch_us(2003, 8, 24, 12, 14, 15, 3)
        assert cursor == 32

    def test_ns_rejected(self):
        with pytest.raises(ParserError) as e:
            self._ts(b"2003-08-24T05:14:15.000000003-07:00")
        assert e.value.msg == ERR_TIMESTAMP_UNKNOWN_FORMAT

    def test_nil(self):
        ts, off, cursor = self._ts(b"-")
        assert ts is None
        assert off is None
        assert cursor == 1

    def test_feb_31_accepted(self):
        # rfc5424.go:396-402 relaxed day check; Go time.Date normalizes.
        ts, off, cursor = self._ts(b"2003-02-31T00:00:00Z")
        assert ts == epoch_us(2003, 3, 3)  # Feb 31 -> Mar 3


class TestParseSecFrac:
    # rfc5424_test.go:946-1018
    @pytest.mark.parametrize(
        "buff,frac,cursor",
        [
            (b"123456789", "123456", 6),  # ns input: only 6 digits consumed
            (b"0", "0", 1),
            (b"52", "52", 2),
            (b"003", "003", 3),
            (b"000003", "000003", 6),
        ],
    )
    def test_vectors(self, buff, frac, cursor):
        got, cur = _parse_sec_frac(buff, 0, len(buff))
        assert got == frac
        assert cur == cursor

    def test_invalid(self):
        with pytest.raises(ParserError):
            _parse_sec_frac(b"azerty", 0, 6)


class TestParseUpToLen:
    # rfc5424_test.go:1134-1258
    def test_app_name(self):
        v, cur = _parse_up_to_len(b"su ", 0, 3, 48, ERR_INVALID_APP_NAME)
        assert v == "su"
        assert cur == 2

    def test_app_name_too_long(self):
        buff = b"s" * 49 + b" "
        with pytest.raises(ParserError) as e:
            _parse_up_to_len(buff, 0, len(buff), 48, ERR_INVALID_APP_NAME)
        assert e.value.msg == ERR_INVALID_APP_NAME
        assert e.value.cursor == 48

    def test_proc_id_too_long(self):
        buff = b"a" * 129
        with pytest.raises(ParserError) as e:
            _parse_up_to_len(buff, 0, len(buff), 128, ERR_INVALID_PROC_ID)
        assert e.value.msg == ERR_INVALID_PROC_ID
        assert e.value.cursor == 128

    def test_msg_id_too_long(self):
        buff = b"a" * 33
        with pytest.raises(ParserError) as e:
            _parse_up_to_len(buff, 0, len(buff), 32, ERR_INVALID_MSG_ID)
        assert e.value.msg == ERR_INVALID_MSG_ID
        assert e.value.cursor == 32


class TestParseStructuredData:
    # rfc5424_test.go:1260-1318
    def test_nil(self):
        sd, cur = parse_structured_data(b"-", 0, 1)
        assert sd == "-"
        assert cur == 1

    def test_single(self):
        buff = b'[exampleSDID@32473 iut="3" eventSource="Application"eventID="1011"]'
        sd, cur = parse_structured_data(buff, 0, len(buff))
        assert sd == buff.decode()
        assert cur == 67

    def test_multiple_contiguous(self):
        buff = (
            b'[exampleSDID@32473 iut="3" eventSource="Application"eventID="1011"]'
            b'[examplePriority@32473 class="high"]'
        )
        sd, cur = parse_structured_data(buff, 0, len(buff))
        assert sd == buff.decode()
        assert cur == 103

    def test_multiple_space_separated_stops_at_first(self):
        first = b'[exampleSDID@32473 iut="3" eventSource="Application"eventID="1011"]'
        buff = first + b' [examplePriority@32473 class="high"]'
        sd, cur = parse_structured_data(buff, 0, len(buff))
        assert sd == first.decode()
        assert cur == 67

    def test_no_sd(self):
        with pytest.raises(ParserError) as e:
            parse_structured_data(b"plain", 0, 5)
        assert e.value.msg == ERR_NO_STRUCTURED_DATA
