#!/usr/bin/env python
"""Saturated-scaling breakdown: where do the 32 CPUs go?

Runs the headline parse->route job at num_cpus=32 on the scaling table
while sampling per-process CPU (psutil) for every Ray process class:
workers, raylet, GCS/dashboard, driver.  Prints one JSON line with
CPU-seconds per class, wall time, and the implied per-worker-core
throughput — the apples-to-apples number to compare against the 8-CPU
leg (where driver/raylet have free cores).

Usage: python scripts/scaling_breakdown.py [sf_dir=sf6.4] [ncpus=32]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import psutil
except ImportError:  # ray bundles psutil under thirdparty_files
    import ray  # noqa: F401  (ensures ray's sys.path entries exist)
    import site

    sys.path.append(
        next(
            p
            for p in __import__("glob").glob(
                site.getsitepackages()[0] + "/ray/thirdparty_files"
            )
        )
    )
    import psutil


def classify(proc: psutil.Process) -> str:
    try:
        name = proc.name()
        cmd = " ".join(proc.cmdline())
    except psutil.Error:
        return "other"
    if "raylet" in name:
        return "raylet"
    if "gcs_server" in name:
        return "gcs"
    if "ray::" in name or "default_worker.py" in cmd:
        return "worker"
    if "log_monitor" in cmd or "dashboard" in cmd or "monitor.py" in cmd:
        return "infra"
    return "other"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf6.4"
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    import rayslog  # noqa: F401
    from rayslog import pipeline as p
    from rayslog.config import DEFAULT_CONFIG
    from rayslog.kernels.vectorized import parse_batch
    from rayslog.sources.testgen import (
        generate_transcripts,
        rows_for,
        transcripts_path,
    )

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    path = transcripts_path(sf)
    n_rows = rows_for(sf)
    ray.data.read_parquet(path).count()

    warm_tbl = generate_transcripts(150_000, seed=7).select(
        ["conv_id", "turn_idx", "text"]
    )

    @ray.remote(num_cpus=1)
    def _warm(tbl):
        for _ in range(2):
            parse_batch(tbl, DEFAULT_CONFIG)
        return 0

    ref = ray.put(warm_tbl)
    ray.get([_warm.remote(ref) for _ in range(ncpu)])
    for _ in range(2):
        p.q_route_sinks(sf).to_pandas()

    me = psutil.Process()
    samples: dict[str, float] = {}

    def baseline_times():
        out = {}
        for pr in psutil.process_iter():
            try:
                t = pr.cpu_times()
                out[pr.pid] = (classify(pr), t.user + t.system)
            except psutil.Error:
                pass
        t = me.cpu_times()
        out[me.pid] = ("driver", t.user + t.system)
        return out

    before = baseline_times()
    t0 = time.perf_counter()
    p.q_route_sinks(sf).to_pandas()
    wall = time.perf_counter() - t0
    after = baseline_times()

    for pid, (cls, t1) in after.items():
        cls0, t_0 = before.get(pid, (cls, 0.0))
        samples[cls] = samples.get(cls, 0.0) + max(0.0, t1 - t_0)

    total_cores_used = sum(samples.values()) / wall
    worker_cores = samples.get("worker", 0.0) / wall
    overhead_cores = total_cores_used - worker_cores
    print(json.dumps({
        "sf": sf,
        "rows": n_rows,
        "num_cpus": ncpu,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_rows / wall, 1),
        "cpu_sec_by_class": {k: round(v, 2) for k, v in samples.items()},
        "avg_cores_busy": round(total_cores_used, 2),
        "avg_worker_cores": round(worker_cores, 2),
        "avg_overhead_cores": round(overhead_cores, 2),
        "turns_per_worker_core_sec": round(
            n_rows / samples.get("worker", 1.0), 1
        ),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
