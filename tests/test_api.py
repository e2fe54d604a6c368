"""Drop-in API surface: reference usage patterns, one message at a time."""

import pytest

from rayslog.api import (
    ParseError,
    RFC_3164,
    RFC_5424,
    Rfc3164Parser,
    Rfc5424Parser,
    detect_rfc,
    parse_message,
)
from tests.conftest import epoch_us


def test_detect():
    assert detect_rfc(b"<34>Oct 11 22:14:15 host su: x") == RFC_3164
    assert detect_rfc(b"<165>1 2003-10-11T22:14:15Z h a p m - x") == RFC_5424
    with pytest.raises(ParseError):
        detect_rfc(b"<12345678>1 rest")


def test_rfc3164_roundtrip():
    parts = Rfc3164Parser(
        b"<34>Oct 11 22:14:15 mymachine su: 'su root' failed",
        default_year=2025,
    ).parse()
    assert parts["tag"] == "su"
    assert parts["timestamp"] == epoch_us(2025, 10, 11, 22, 14, 15)


def test_rfc3164_overrides():
    parts = Rfc3164Parser(
        b"Oct 11 22:14:15 body only", priority=13, hostname="h", tag="t",
        default_year=2025,
    ).parse()
    assert (parts["priority"], parts["facility"], parts["severity"]) == (13, 1, 5)
    assert parts["hostname"] == "h"


def test_rfc5424_roundtrip_and_error():
    parts = Rfc5424Parser(
        b"<165>1 2003-10-11T22:14:15.003Z host app 1 ID1 - msg"
    ).parse()
    assert parts["msg_id"] == "ID1"
    with pytest.raises(ParseError) as e:
        Rfc5424Parser(b"<165>1 2003-13-11T00:00:00Z h a p m - x").parse()
    assert e.value.msg == "Invalid month in timestamp"


def test_parse_message_never_raises():
    row = parse_message("total garbage with no gt")
    assert row["parse_error"] is not None
    row = parse_message(b"<34>Oct 11 22:14:15 h t: ok", default_year=2025)
    assert row["parse_error"] is None
    assert row["rfc"] == RFC_3164
