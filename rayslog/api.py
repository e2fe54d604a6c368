"""Drop-in single-message API mirroring the reference library's shape.

A user of ``jeromer/syslogparser`` drives it as::

    p := rfc3164.NewParser(buff); p.WithLocation(loc); p.Parse(); p.Dump()

The engine equivalent (same semantics, Python idiom)::

    parts = Rfc3164Parser(buff, location="America/New_York").parse()
    rfc = detect_rfc(buff)          # 0 / RFC_3164 / RFC_5424

Single-message paths delegate to the row oracle (reference-exact); batch
work belongs in the Ray pipelines, not here.
"""

from __future__ import annotations

from typing import Optional

from rayslog.config import ParserConfig
from rayslog.errors import ParserError
from rayslog.kernels import oracle
from rayslog.kernels.oracle import RFC_3164, RFC_5424, RFC_UNKNOWN  # noqa: F401


class ParseError(Exception):
    """Raised by parse(); ``msg`` is the reference's canonical string."""

    def __init__(self, msg: str):
        super().__init__(msg)
        self.msg = msg


def detect_rfc(buff: bytes | str) -> int:
    """DetectRFC (syslogparser.go:30-56) incl. quirks; raises ParseError
    for the version-not-found case and IndexError-shaped inputs."""
    b = buff.encode() if isinstance(buff, str) else buff
    try:
        return oracle.detect_rfc(b)
    except ParserError as e:
        raise ParseError(e.msg) from None
    except IndexError:
        raise ParseError("index out of range") from None


class _Parser:
    _fn = None

    def __init__(
        self,
        buff: bytes | str,
        *,
        location: str = "UTC",
        timestamp_format: Optional[str] = None,
        priority: Optional[int] = None,
        hostname: Optional[str] = None,
        tag: Optional[str] = None,
        default_year: Optional[int] = None,
    ):
        self._buff = buff.encode() if isinstance(buff, str) else buff
        self._cfg = ParserConfig(
            location=location,
            timestamp_format=timestamp_format,
            priority=priority,
            hostname=hostname,
            tag=tag,
            default_year=default_year,
        )

    def parse(self) -> dict:
        """Parse + Dump in one step; raises ParseError on failure."""
        parts, err = type(self)._fn(self._buff, self._cfg)
        if err is not None:
            raise ParseError(err)
        return parts


class Rfc3164Parser(_Parser):
    """RFC3164 parser (rfc3164.go) — 7 Dump keys; ``timestamp`` is UTC
    epoch microseconds (None never occurs for 3164)."""

    _fn = staticmethod(oracle.parse_rfc3164)


class Rfc5424Parser(_Parser):
    """RFC5424 parser (rfc5424.go) — 11 Dump keys + tz_offset_minutes;
    NILVALUE timestamp maps to None."""

    _fn = staticmethod(oracle.parse_rfc5424)


def parse_message(buff: bytes | str, **cfg_kwargs) -> dict:
    """detect + parse one message; never raises — errors come back in
    the ``parse_error`` key (the pipeline row semantics)."""
    return oracle.parse_row(
        buff if isinstance(buff, (bytes, bytearray)) else str(buff),
        ParserConfig(**cfg_kwargs),
    )
