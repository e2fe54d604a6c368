"""Canonical parse-error strings.

These populate the engine's ``parse_error`` column and must match the
reference's error sentinels byte-for-byte so the ported golden vectors can
assert on them (reference: parsercommon/parsercommon.go:13-29,
rfc5424/rfc5424.go:23-37).
"""

ERR_EOL = "End of log line"
ERR_NO_SPACE = "No space found"

ERR_PRIORITY_NO_START = "No start char found for priority"
ERR_PRIORITY_EMPTY = "Priority field empty"
ERR_PRIORITY_NO_END = "No end char found for priority"
ERR_PRIORITY_TOO_SHORT = "Priority field too short"
ERR_PRIORITY_TOO_LONG = "Priority field too long"
ERR_PRIORITY_NON_DIGIT = "Non digit found in priority"

ERR_VERSION_NOT_FOUND = "Can not find version"

ERR_TIMESTAMP_UNKNOWN_FORMAT = "Timestamp format unknown"

ERR_HOSTNAME_NOT_FOUND = "Hostname not found"

# rfc5424-specific (rfc5424/rfc5424.go:23-37)
ERR_YEAR_INVALID = "Invalid year in timestamp"
ERR_MONTH_INVALID = "Invalid month in timestamp"
ERR_DAY_INVALID = "Invalid day in timestamp"
ERR_HOUR_INVALID = "Invalid hour in timestamp"
ERR_MINUTE_INVALID = "Invalid minute in timestamp"
ERR_SECOND_INVALID = "Invalid second in timestamp"
ERR_SECFRAC_INVALID = "Invalid fraction of second in timestamp"
ERR_TIMEZONE_INVALID = "Invalid time zone in timestamp"
ERR_INVALID_TIME_FORMAT = "Invalid time format"
ERR_INVALID_APP_NAME = "Invalid app name"
ERR_INVALID_PROC_ID = "Invalid proc ID"
ERR_INVALID_MSG_ID = "Invalid msg ID"
ERR_NO_STRUCTURED_DATA = "No structured data"

# Engine-defined sentinel for inputs on which the reference library would
# panic with a Go runtime index error (e.g. DetectRFC on a buffer shorter
# than 10 bytes with no '>', syslogparser.go:30-45; or RFC3164 Parse on a
# message that ends right after the hostname, rfc3164/rfc3164.go:115).
# The engine never crashes: such rows get this parse_error value.
ERR_INDEX_OUT_OF_RANGE = "index out of range"


class ParserError(Exception):
    """Raised by the row oracle; ``msg`` is the canonical error string."""

    def __init__(self, msg: str):
        super().__init__(msg)
        self.msg = msg
