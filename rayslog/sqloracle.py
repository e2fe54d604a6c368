"""DuckDB oracle SQL for the driver's side-by-side correctness check.

Each SQL string recomputes a pipeline's result independently of the
engine, over the SAME generated transcripts parquet (the generator
guarantees every row is either canonical — parseable by these regexes
with in-range fields — or a catalog edge row the classifier below maps
to its exact reference error string; see sources/testgen.py).

Patterns are the capture-group versions of the engine's fast-path shape
validators (kernels/vectorized.py); DuckDB and Arrow both use RE2, so
the semantics transfer verbatim.
"""

from __future__ import annotations

from rayslog.sources.testgen import EDGE_CATALOG, transcripts_path

_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"

P3 = (
    r"^<(\d{1,3})>( ?)(" + _MONTHS + r") ((?:\d\d)|(?: \d)) "
    r"(\d\d):(\d\d):(\d\d) ([^ ]+) "
    r"([^ \[\]:]{1,32})((?:[\[\]:][^ ]*)?)((?s:.*))$"
)
P3_NAMES = "['pri','lsp','mon','day','hh','mi','ss','host','tag','junk','rest']"

P5 = (
    r"^<(\d{1,3})>(\d) "
    r"(-|(\d{4})-(\d\d)-(\d\d)T(\d\d):(\d\d):(\d\d)(?:\.(\d{1,6}))?(Z|[+-]\d\d:\d\d)) "
    r"([^ ]+) ([^ ]{1,48}) ([^ ]{1,128}) ([^ ]{1,32}) "
    r"(-|\[(?s:.)*?\])(?:\x20((?s:.*)))?$"
)
P5_NAMES = (
    "['pri','ver','ts','yy','mo','dd','hh','mi','ss','frac','tz',"
    "'host','app','proc','msgid','sd','msg']"
)

D3 = r"^[^>]{0,8}>[^0-9]"
D5 = r"^[^>]{0,8}>[0-9]"
DU = r"^[^>]{9}>"
DQ = r"^[^>]{10}"

# cumulative day-of-year offsets for the pinned default_year 2025
# (non-leap) — Feb-29 inputs normalize to Mar 1 exactly like Go
# time.Date (rfc3164.go:331-346 year substitution + normalization).
_CUM_DAYS = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]


def _base_cte(path: str) -> str:
    cum = " ".join(
        f"WHEN {i + 1} THEN {v}" for i, v in enumerate(_CUM_DAYS)
    )
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, tool, text FROM read_parquet('{path}')
),
g3 AS (
  SELECT *, regexp_extract(text, '{P3}', {P3_NAMES}) AS m
  FROM t WHERE regexp_matches(text, '{D3}') AND regexp_matches(text, '{P3}')
),
p3 AS (
  SELECT conv_id, turn_idx, role, tool,
    CAST(m.pri AS INTEGER) AS priority,
    (strpos('JanFebMarAprMayJunJulAugSepOctNovDec', m.mon) + 2) // 3 AS mon_num,
    CAST(trim(m.day) AS INTEGER) AS day_num,
    CAST(m.hh AS INTEGER) AS hh, CAST(m.mi AS INTEGER) AS mi,
    CAST(m.ss AS INTEGER) AS ss,
    m.host AS hostname, m.tag AS tag, trim(m.rest, ' ') AS content,
    length(m.tag) + length(m.junk) AS tagspan
  FROM g3
),
ok3 AS (
  SELECT conv_id, turn_idx, role, tool, priority,
    priority // 8 AS facility, priority % 8 AS severity,
    TIMESTAMP '2025-01-01'
      + to_days(CASE mon_num {cum} END + day_num - 1)
      + to_hours(hh) + to_minutes(mi) + to_seconds(ss) AS ts_parsed,
    hostname, tag, content
  FROM p3
  WHERE day_num >= 1
    AND day_num <= CASE mon_num WHEN 2 THEN 29 WHEN 4 THEN 30 WHEN 6 THEN 30
                                WHEN 9 THEN 30 WHEN 11 THEN 30 ELSE 31 END
    AND hh <= 23 AND mi <= 59 AND ss <= 59 AND tagspan <= 32
),
g5 AS (
  SELECT *, regexp_extract(text, '{P5}', {P5_NAMES}) AS m
  FROM t WHERE regexp_matches(text, '{D5}') AND regexp_matches(text, '{P5}')
),
p5 AS (
  SELECT conv_id, turn_idx, role, tool,
    CAST(m.pri AS INTEGER) AS priority, CAST(m.ver AS INTEGER) AS version,
    m.ts = '-' AS ts_nil,
    TRY_CAST(m.yy AS INTEGER) AS yy, TRY_CAST(m.mo AS INTEGER) AS mo,
    TRY_CAST(m.dd AS INTEGER) AS dd, TRY_CAST(m.hh AS INTEGER) AS hh,
    TRY_CAST(m.mi AS INTEGER) AS mi, TRY_CAST(m.ss AS INTEGER) AS ss,
    CASE WHEN m.frac = '' THEN 0
         ELSE CAST(rpad(m.frac, 6, '0') AS BIGINT) END AS frac_us,
    CASE WHEN m.tz = 'Z' THEN 0
         ELSE (CASE WHEN substr(m.tz, 1, 1) = '+' THEN 1 ELSE -1 END)
              * (TRY_CAST(substr(m.tz, 2, 2) AS INTEGER) * 60
                 + TRY_CAST(substr(m.tz, 5, 2) AS INTEGER)) END AS off_min,
    CASE WHEN m.tz = 'Z' THEN 0 ELSE TRY_CAST(substr(m.tz, 2, 2) AS INTEGER) END AS tzh,
    CASE WHEN m.tz = 'Z' THEN 0 ELSE TRY_CAST(substr(m.tz, 5, 2) AS INTEGER) END AS tzm,
    m.host AS hostname, m.app AS app_name, m.proc AS proc_id,
    m.msgid AS msg_id, m.sd AS structured_data,
    trim(coalesce(m.msg, ''), ' ') AS message
  FROM g5
),
ok5 AS (
  SELECT conv_id, turn_idx, role, tool, priority,
    priority // 8 AS facility, priority % 8 AS severity, version,
    CASE WHEN ts_nil THEN NULL
         ELSE make_timestamp(yy, mo, dd, hh, mi, ss)
              + to_microseconds(frac_us) - to_minutes(off_min) END AS ts_parsed,
    CASE WHEN ts_nil THEN NULL
         ELSE CAST(off_min AS SMALLINT) END AS tz_offset_minutes,
    hostname, app_name, proc_id, msg_id, structured_data, message
  FROM p5
  WHERE ts_nil OR (mo BETWEEN 1 AND 12 AND dd BETWEEN 1 AND 31
                   AND hh <= 23 AND mi <= 59 AND ss <= 59
                   AND tzh <= 23 AND tzm <= 59)
),
allok AS (
  SELECT conv_id, turn_idx, role, tool, priority, facility, severity,
         ts_parsed, CAST(1 AS TINYINT) AS rfc FROM ok3
  UNION ALL
  SELECT conv_id, turn_idx, role, tool, priority, facility, severity,
         ts_parsed, CAST(2 AS TINYINT) AS rfc FROM ok5
)
"""


def _literal_error_arms() -> str:
    """CASE arms for catalog rows the pattern classifier cannot reach
    (structural failures past the priority stage)."""
    covered_errors = {
        "Timestamp format unknown",
        "Invalid month in timestamp",
        "Invalid day in timestamp",
        "No start char found for priority",
        "Priority field too short",
        "Priority field too long",
        "Non digit found in priority",
        "Can not find version",
        "index out of range",
    }
    arms = []
    for text, err in EDGE_CATALOG:
        # needed when the error class has no pattern arm (field caps, SD)
        # or when a 'Timestamp format unknown' row fails the structural
        # regex (ns-frac) so the generic 5424 arm cannot reach it; extra
        # arms for pattern-covered rows are unreachable and harmless.
        if err not in covered_errors or err == "Timestamp format unknown":
            esc = text.replace("'", "''")
            arms.append(f"WHEN text = '{esc}' THEN '{err}'")
    return "\n    ".join(arms)


def oracle_queries(sf_dir: str) -> dict[str, str]:
    path = transcripts_path(sf_dir)
    base = _base_cte(path)
    lits = _literal_error_arms()
    return {
        "parse_3164": base
        + "SELECT conv_id, turn_idx, priority, facility, severity, ts_parsed,"
        " hostname, tag, content FROM ok3",
        "parse_5424": base
        + "SELECT conv_id, turn_idx, priority, facility, severity, version,"
        " ts_parsed, tz_offset_minutes, hostname, app_name, proc_id, msg_id,"
        " structured_data, message FROM ok5",
        "severity_counts": base
        + "SELECT severity, count(*) AS n_turns FROM allok GROUP BY severity",
        "conv_counts": base
        + "SELECT conv_id, count(*) AS n_turns FROM allok GROUP BY conv_id",
        "route_sinks": base
        + "SELECT severity, rfc, count(*) AS n_rows FROM allok"
        " GROUP BY severity, rfc",
        "enrich_route": base
        + """
SELECT o.conv_id, o.turn_idx, o.severity, o.rfc,
       r.role_code, r.role_class, tl.tool_code, tl.tool_family
FROM allok o
JOIN (VALUES ('user', CAST(1 AS TINYINT), 'human'),
             ('assistant', 2, 'model'),
             ('system', 3, 'control'),
             ('tool', 4, 'machine')) r(role, role_code, role_class)
  ON o.role = r.role
JOIN (VALUES ('', CAST(0 AS SMALLINT), 'none'),
             ('bash', 1, 'shell'),
             ('search', 2, 'retrieval'),
             ('editor', 3, 'workspace'),
             ('browser', 4, 'web')) tl(tool, tool_code, tool_family)
  ON o.tool = tl.tool
""",
        "hourly_traffic": base
        + "SELECT facility, CAST(date_part('hour', ts_parsed) AS INTEGER)"
        " AS hour, count(*) AS n_turns FROM allok"
        " WHERE ts_parsed IS NOT NULL GROUP BY 1, 2",
        "parse_errors": base
        + f"""
, okk AS (
  SELECT conv_id, turn_idx FROM ok3
  UNION ALL SELECT conv_id, turn_idx FROM ok5
),
err_rows AS (
  SELECT t.text FROM t LEFT JOIN okk
    ON t.conv_id = okk.conv_id AND t.turn_idx = okk.turn_idx
  WHERE okk.conv_id IS NULL
)
SELECT err AS parse_error, count(*) AS n_turns FROM (
  SELECT CASE
    WHEN regexp_matches(text, '{D3}') AND regexp_matches(text, '{P3}')
      THEN 'Timestamp format unknown'
    WHEN regexp_matches(text, '{D5}') AND regexp_matches(text, '{P5}') THEN
      CASE
        WHEN TRY_CAST(regexp_extract(text, '{P5}', {P5_NAMES}).mo AS INTEGER)
             NOT BETWEEN 1 AND 12 THEN 'Invalid month in timestamp'
        WHEN TRY_CAST(regexp_extract(text, '{P5}', {P5_NAMES}).dd AS INTEGER)
             NOT BETWEEN 1 AND 31 THEN 'Invalid day in timestamp'
        ELSE 'Timestamp format unknown'
      END
    {lits}
    WHEN regexp_matches(text, '{DU}') THEN 'Can not find version'
    WHEN (regexp_matches(text, '{D3}') OR regexp_matches(text, '{D5}')
          OR regexp_matches(text, '{DQ}'))
         AND regexp_matches(text, '^[^<]')
      THEN 'No start char found for priority'
    WHEN regexp_matches(text, '^<>') THEN 'Priority field too short'
    WHEN regexp_matches(text, '^<\\d{{4}}') THEN 'Priority field too long'
    WHEN regexp_matches(text, '^<\\d{{0,3}}[^0-9>]')
      THEN 'Non digit found in priority'
    WHEN NOT (regexp_matches(text, '{D3}') OR regexp_matches(text, '{D5}')
              OR regexp_matches(text, '{DU}') OR regexp_matches(text, '{DQ}'))
      THEN 'index out of range'
  END AS err FROM err_rows
) WHERE err IS NOT NULL GROUP BY 1
""",
    }
