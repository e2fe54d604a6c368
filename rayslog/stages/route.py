"""Route stage: severity-keyed fan-out to partitioned Parquet sinks.

The router is the engine's materialization of the reference's
``DetectRFC``-based dispatch (syslogparser.go:30-56, README.md:83-101)
extended to the daemon's sink fan-out: parsed rows land in
``severity=<k>/`` hive partitions (plus an ``rfc`` sub-partition),
unparseable rows in an ``errors/`` sink.  Partitioned directories plus
per-run manifests (rayslog.state.checkpoint) make reruns resumable:
finished input partitions are skipped by manifest lookup, and sink
writes go through temp-dir + atomic rename.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def split_parsed_errors(ds):
    """(parsed_ds, errors_ds) — one pass each, vectorized predicate."""
    parsed = ds.map_batches(
        lambda t: t.filter(pc.is_null(t.column("parse_error"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    errors = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("parse_error"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return parsed, errors


def route_to_sinks(ds, out_dir: str, partition_cols: list[str] | None = None):
    """Write parsed rows hive-partitioned by severity (and rfc), plus an
    errors sink; routed-row parity is asserted via q_route_sinks /
    the sink parquet footers (see state/checkpoint.py)."""
    partition_cols = partition_cols or ["severity", "rfc"]
    parsed, errors = split_parsed_errors(ds)
    parsed.write_parquet(f"{out_dir}/parsed", partition_cols=partition_cols)
    errors.write_parquet(f"{out_dir}/errors")
