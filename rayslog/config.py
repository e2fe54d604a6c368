"""Parser configuration.

The reference's per-parser ``WithX`` overrides (rfc3164/rfc3164.go:57-96,
rfc5424/rfc5424.go:92-116) become one frozen config closed over by the
batch kernels.  ``default_year`` parameterizes the reference's
nondeterministic current-year substitution for RFC3164's year-less
timestamps (rfc3164/rfc3164.go:331-346).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass


@dataclass(frozen=True)
class ParserConfig:
    # IANA timezone applied to RFC3164 wall-clock timestamps
    # (rfc3164/rfc3164.go:62-65).  No-op for RFC5424 (tz is in-band,
    # rfc5424/rfc5424.go:97-98).
    location: str = "UTC"
    # Go-layout custom timestamp format for RFC3164
    # (rfc3164/rfc3164.go:77-86); None = the two default layouts.
    timestamp_format: str | None = None
    # Overrides: skip parsing of the respective field.
    priority: int | None = None   # WithPriority (rfc3164.go:57-60, rfc5424.go:92-95)
    hostname: str | None = None   # WithHostname (rfc3164.go:67-70, rfc5424.go:103-106)
    tag: str | None = None        # WithTag (rfc3164.go:72-75; no-op for 5424)
    # Year substituted for RFC3164's year-less timestamps; None = current
    # year (reference behavior, rfc3164/rfc3164.go:331-346).  Pipelines pin
    # this for determinism.
    default_year: int | None = None

    def effective_year(self) -> int:
        if self.default_year is not None:
            return self.default_year
        return _dt.date.today().year


#: Deterministic config used by the engine's pipelines and tests.
DEFAULT_CONFIG = ParserConfig(default_year=2025)
