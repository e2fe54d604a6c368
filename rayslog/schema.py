"""Arrow schemas for the engine.

The reference's dynamic ``LogParts`` map (syslogparser.go:19) has a fixed
implicit schema per dialect (rfc3164.go:129-139 — 7 keys;
rfc5424.go:145-159 — 11 keys).  The engine materializes the union as
typed columns appended to the input batch; dialect-inapplicable columns
are null.  Timestamps are naive UTC ``timestamp[us]`` (Arrow and DuckDB
both hash naive timestamps identically); the original RFC5424 numeric
offset is preserved in ``tz_offset_minutes`` so wall-time rendering stays
reconstructible.
"""

import pyarrow as pa

#: Input transcripts table (BASELINE.json input_hint).
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

#: Columns appended by the parse stage (union of both dialects).
PARSE_FIELDS = [
    pa.field("rfc", pa.int8()),               # 0 unknown, 1 rfc3164, 2 rfc5424
    pa.field("priority", pa.int32()),
    pa.field("facility", pa.int32()),
    pa.field("severity", pa.int32()),
    pa.field("version", pa.int32()),          # rfc5424 only
    pa.field("ts_parsed", pa.timestamp("us")),
    pa.field("tz_offset_minutes", pa.int16()),
    pa.field("hostname", pa.string()),
    pa.field("tag", pa.string()),             # rfc3164 only
    pa.field("content", pa.string()),         # rfc3164 only
    pa.field("app_name", pa.string()),        # rfc5424 only
    pa.field("proc_id", pa.string()),         # rfc5424 only
    pa.field("msg_id", pa.string()),          # rfc5424 only
    pa.field("structured_data", pa.string()), # rfc5424 only
    pa.field("message", pa.string()),         # rfc5424 only
    pa.field("parse_error", pa.string()),     # null on success
]

PARSE_SCHEMA = pa.schema(PARSE_FIELDS)

PARSE_COLUMN_NAMES = [f.name for f in PARSE_FIELDS]
