"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse→enrich→aggregate pipeline at
sf0.001; ``queries()`` exposes one callable per implemented pipeline
(each takes ``sf_dir``); ``oracle_sql()`` returns the equivalent DuckDB
SQL.  The syslog pipelines run over the deterministic synthetic
transcripts table (BASELINE.json input_hint) generated under
/tmp/rayslog_data/<sf>/ — both the Ray queries and the oracle SQL read
the same parquet file, so the comparison is apples-to-apples.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from rayslog import pipeline

    return pipeline.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from rayslog import pipeline as p

    return {
        "parse_3164": p.q_parse_3164,
        "parse_5424": p.q_parse_5424,
        "severity_counts": p.q_severity_counts,
        "conv_counts": p.q_conv_counts,
        "parse_errors": p.q_parse_errors,
        "route_sinks": p.q_route_sinks,
        "enrich_route": p.q_enrich_route,
        "hourly_traffic": p.q_hourly_traffic,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents; the correctness run uses sf0.01 (the paths are
    baked into the SQL — generation is triggered here so the parquet
    exists before DuckDB reads it)."""
    from rayslog.sqloracle import oracle_queries

    return oracle_queries("/root/testdata/sf0.01")
