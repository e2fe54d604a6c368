"""Metrics rollup: per-partition manifests → one audit Parquet.

The manifests (state/checkpoint.py) already carry per-partition parse
and route counters; this module flattens them into a ``_metrics``
Parquet sink and a job-level summary, the audit artifact the north rule
asks for.  ``dataset_stats_summary`` additionally surfaces Ray's own
per-stage ``ds.stats()`` for perf inspection.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def write_metrics(out_dir: str) -> str:
    """Flatten manifests under ``out_dir`` into _metrics/metrics.parquet."""
    mdir = Path(out_dir) / "_manifests"
    rows = []
    for mf in sorted(mdir.glob("*.json")):
        m = json.loads(mf.read_text())
        sev = m.get("metrics", {}).get("severity_rows", {})
        rows.append(
            {
                "partition": m["partition"],
                "input": m.get("metrics", {}).get("input"),
                "rows": m["rows"],
                "parsed": m["parsed"],
                "errors": m["errors"],
                "n_outputs": len(m.get("outputs", [])),
                "severity_rows": json.dumps(sev, sort_keys=True),
            }
        )
    tbl = pa.Table.from_pylist(rows)
    dest = Path(out_dir) / "_metrics"
    dest.mkdir(parents=True, exist_ok=True)
    path = dest / "metrics.parquet"
    pq.write_table(tbl, path)
    return str(path)


def job_summary(out_dir: str) -> dict:
    mdir = Path(out_dir) / "_manifests"
    total = parsed = errors = 0
    for mf in mdir.glob("*.json"):
        m = json.loads(mf.read_text())
        total += m["rows"]
        parsed += m["parsed"]
        errors += m["errors"]
    return {
        "partitions": len(list(mdir.glob("*.json"))),
        "rows": total,
        "parsed": parsed,
        "errors": errors,
    }


def dataset_stats_summary(ds) -> str:
    """Ray's per-stage wall/cpu/memory breakdown for a consumed dataset."""
    return ds.stats()
