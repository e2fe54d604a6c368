"""End-to-end pipelines: read → parse → enrich → route → aggregate.

Every query below is a lazy Ray Data pipeline over the transcripts
Parquet; consumption (write/aggregate/to_pandas) drives the streaming
executor.  Columns are pruned at the read; filters/selects are
vectorized Arrow predicates inside ``map_batches``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from rayslog.config import DEFAULT_CONFIG, ParserConfig
from rayslog.sources.testgen import transcripts_path
from rayslog.stages.aggregate import counts_by, parsed_only
from rayslog.stages.enrich import enrich_dataset
from rayslog.stages.parse import parse_dataset

PARSE_3164_COLS = [
    "conv_id", "turn_idx", "priority", "facility", "severity",
    "ts_parsed", "hostname", "tag", "content",
]
PARSE_5424_COLS = [
    "conv_id", "turn_idx", "priority", "facility", "severity", "version",
    "ts_parsed", "tz_offset_minutes", "hostname", "app_name", "proc_id",
    "msg_id", "structured_data", "message",
]


def read_transcripts(sf_dir: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(transcripts_path(sf_dir), columns=columns)


def parsed_dataset(
    sf_dir: str,
    columns: tuple[str, ...] = ("conv_id", "turn_idx", "text"),
    cfg: ParserConfig = DEFAULT_CONFIG,
):
    ds = read_transcripts(sf_dir, list(columns))
    return parse_dataset(ds, cfg)


def _filter_select(ds, predicate_fn, columns: list[str]):
    def fn(t: pa.Table) -> pa.Table:
        return t.filter(predicate_fn(t)).select(columns)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_parse_3164(sf_dir: str):
    """All cleanly-parsed RFC3164 turns with the reference's 7 Dump fields."""
    ds = parsed_dataset(sf_dir)
    return _filter_select(
        ds,
        lambda t: pc.and_(
            pc.equal(t.column("rfc"), 1), pc.is_null(t.column("parse_error"))
        ),
        PARSE_3164_COLS,
    )


def q_parse_5424(sf_dir: str):
    """All cleanly-parsed RFC5424 turns with the reference's 11 Dump fields."""
    ds = parsed_dataset(sf_dir)
    return _filter_select(
        ds,
        lambda t: pc.and_(
            pc.equal(t.column("rfc"), 2), pc.is_null(t.column("parse_error"))
        ),
        PARSE_5424_COLS,
    )


def q_severity_counts(sf_dir: str):
    """Per-severity turn counts over cleanly-parsed rows (router parity)."""
    ds = parsed_only(parsed_dataset(sf_dir))
    return counts_by(ds, ["severity"], alias="n_turns")


def q_conv_counts(sf_dir: str):
    """Per-conversation parsed-turn counts (skew-bearing aggregate)."""
    ds = parsed_only(parsed_dataset(sf_dir))
    return counts_by(ds, ["conv_id"], alias="n_turns")


def q_parse_errors(sf_dir: str):
    """Counts per canonical parse_error string."""
    ds = parsed_dataset(sf_dir, columns=("conv_id", "turn_idx", "text"))
    errs = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("parse_error"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return counts_by(errs, ["parse_error"], alias="n_turns")


def q_route_sinks(sf_dir: str):
    """Routed-row parity: per-(severity, rfc) sink row counts."""
    ds = parsed_only(parsed_dataset(sf_dir))
    return counts_by(ds, ["severity", "rfc"], alias="n_rows")


def q_enrich_route(sf_dir: str):
    """Parsed turns enriched with role/tool lookups + routing key."""
    ds = parsed_dataset(
        sf_dir, columns=("conv_id", "turn_idx", "role", "tool", "text")
    )
    ds = enrich_dataset(ds)
    return _filter_select(
        ds,
        lambda t: pc.is_null(t.column("parse_error")),
        [
            "conv_id", "turn_idx", "severity", "rfc",
            "role_code", "role_class", "tool_code", "tool_family",
        ],
    )


def q_hourly_traffic(sf_dir: str):
    """Per-(facility, hour-of-day) parsed-turn counts (window-style agg)."""
    ds = parsed_only(parsed_dataset(sf_dir))

    def add_hour(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts_parsed")))
        return t.append_column(
            "hour", pc.cast(pc.hour(t.column("ts_parsed")), pa.int32())
        )

    ds = ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True)
    return counts_by(ds, ["facility", "hour"], alias="n_turns")


def flagship(sf_dir: str):
    """The headline parse→enrich→aggregate pipeline (driver smoke check)."""
    return q_severity_counts(sf_dir)
