"""Scale probe for the session-9 range-exchange patterns: grouped_gini
over the 76.8M-row sf12.8 transcripts cache (group = role, value = text
byte length).  Prints one JSON line: rows, wall seconds (best-of-N),
and the result table, so BASELINE.md can cite a measured number for the
value-range exchange at the scaling corpus size.

Owns a Ray session (CLI entry point, CLAUDE invariant #5).
Usage: python scripts/gini_scale_probe.py [sf12.8] [cpus] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyarrow as pa
import pyarrow.compute as pc


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf12.8"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    import ray
    import ray.data

    import rayslog  # noqa: F401  (allocator tuning)

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )

    from rayslog.sources.testgen import rows_for, transcripts_path
    from rayslog.pipeline import read_transcripts
    from rayslog.stages.stats import grouped_gini

    sf_dir = f"/root/testdata/{sf}"  # rows_for/transcripts_path key
    path = transcripts_path(sf_dir)
    n_rows = rows_for(sf_dir)
    ray.data.read_parquet(path).count()  # warm page cache / workers

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "role": t.column("role"),
                "c": pc.cast(
                    pc.binary_length(t.column("text")), pa.int64()
                ),
            }
        )

    best = float("inf")
    out = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        ds = read_transcripts(sf_dir, ["role", "text"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        )
        out = grouped_gini(ds, "role", "c", parts=64).to_pandas()
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "probe": "grouped_gini role x text-bytes",
                "sf": sf,
                "rows": n_rows,
                "num_cpus": cpus,
                "wall_sec_best": round(best, 2),
                "rows_per_sec": round(n_rows / best, 1),
                "result": out.to_dict(orient="records"),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
