"""Driver-style sf0.01 preflight: run Ray queries vs their DuckDB
oracles exactly like the round driver (row count, column names, typed
values after sorting columns by name) and print one status line each.

Usage:
    python scripts/preflight.py [query ...]      # default: 50-window
    RAYSLOG_PREFLIGHT_SF=/root/testdata/sf0.001 python scripts/preflight.py q1

Owns a Ray session (CLAUDE.md invariant #5 allows CLI entry points).
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif not (pd.api.types.is_integer_dtype(df[c])
                  or pd.api.types.is_float_dtype(df[c])):
            df[c] = df[c].astype(object).where(df[c].notna(), None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = os.environ.get("RAYSLOG_PREFLIGHT_SF", "/root/testdata/sf0.01")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
            include_dashboard=False,
        )
    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as em
    from rayslog.sqloracle import oracle_queries, training_oracle_queries

    qs = em.queries()
    sqls = {**oracle_queries(sf_dir), **training_oracle_queries(sf_dir)}
    names = sys.argv[1:] or [n for n in list(qs)[:50]]

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{sf_dir}/{t}.parquet')")

    n_bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            if name not in sqls:
                res = qs[name](sf_dir)
                df = res.to_pandas() if hasattr(res, "to_pandas") else res
                print(f"ROWSONLY {name}: {len(df)} rows "
                      f"({time.perf_counter()-t0:.1f}s)")
                continue
            ray_df = qs[name](sf_dir).to_pandas()
            sql_df = con.sql(sqls[name]).df()
            probs = []
            if sorted(ray_df.columns) != sorted(sql_df.columns):
                probs.append(f"cols {sorted(ray_df.columns)} vs "
                             f"{sorted(sql_df.columns)}")
            elif len(ray_df) != len(sql_df):
                probs.append(f"rows {len(ray_df)} vs {len(sql_df)}")
            else:
                for c in ray_df.columns:
                    ka, kb = ray_df[c].dtype.kind, sql_df[c].dtype.kind
                    if ({ka, kb} in ({"i", "f"}, {"u", "f"})
                            and not (ray_df[c] if ka == "f"
                                     else sql_df[c]).isna().any()):
                        probs.append(f"type kind {c}: {ka} vs {kb}")
                a, b = _normalize(ray_df), _normalize(sql_df)
                try:
                    pd.testing.assert_frame_equal(
                        a, b, check_dtype=False, check_exact=True)
                except AssertionError as e:
                    probs.append(str(e).split("\n")[0])
            dt = time.perf_counter() - t0
            if probs:
                n_bad += 1
                print(f"FAIL     {name}: {'; '.join(probs)} ({dt:.1f}s)")
            else:
                print(f"OK       {name}: {len(ray_df)} rows ({dt:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report and keep going
            n_bad += 1
            print(f"ERROR    {name}: {type(e).__name__}: {e} "
                  f"({time.perf_counter()-t0:.1f}s)")
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
