"""CLI: ``python -m rayslog.cli <command>``.

Commands::

    run     --input <dir-or-files> --out <dir>    resumable parse→route job
    curate  --input <dir-or-files> --out <dir>    resumable curation job
    query   --name <q> --sf-dir <dir>             run one pipeline, print head
    search  --query "terms" [--phrase]            BM25 / phrase search
    bench                                          delegate to bench.py
    stats   --sf-dir <dir>                        parse-stage ds.stats()

The CLI owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus: int | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_pack(args) -> int:
    _init_ray(args.num_cpus)
    import pyarrow.parquet as pq

    from rayslog.state.checkpoint import run_resumable_pack

    files = sorted(glob.glob(f"{args.input}/*.parquet")) if os.path.isdir(
        args.input
    ) else [args.input]
    done, final = run_resumable_pack(
        files, args.out, budget=args.budget
    )
    n = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(f"{final}/*.parquet")
    )
    print(json.dumps({"processed": done, "binned_docs": n, "out": final}))
    return 0


def cmd_run(args) -> int:
    _init_ray(args.num_cpus)
    from rayslog.state.checkpoint import run_resumable_route
    from rayslog.state.metrics import job_summary, write_metrics

    files = sorted(glob.glob(f"{args.input}/*.parquet")) if os.path.isdir(
        args.input
    ) else [args.input]
    done = run_resumable_route(files, args.out)
    write_metrics(args.out)
    print(json.dumps({"processed": done, **job_summary(args.out)}))
    return 0


def cmd_curate(args) -> int:
    _init_ray(args.num_cpus)
    import pyarrow.parquet as pq

    from rayslog.pipeline import (
        QUALITY_GATES,
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
        SAMPLE_SEED,
    )
    from rayslog.state.checkpoint import run_resumable_curation

    files = sorted(glob.glob(f"{args.input}/*.parquet")) if os.path.isdir(
        args.input
    ) else [args.input]
    done, final = run_resumable_curation(
        files, args.out,
        budget_gates=QUALITY_GATES,
        sample_rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT_RATE,
        seed=SAMPLE_SEED,
    )
    n = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(f"{final}/*.parquet")
    )
    print(json.dumps({"processed": done, "curated_rows": n, "out": final}))
    return 0


def cmd_query(args) -> int:
    _init_ray(args.num_cpus)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; have: {sorted(qs)}", file=sys.stderr)
        return 2
    res = qs[args.name](args.sf_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    print(df.head(args.limit).to_string())
    print(f"... {len(df)} rows")
    return 0


def cmd_search(args) -> int:
    """Ad-hoc search over the documents table via the persisted
    posting store: BM25 ranking for a bag of terms, or exact adjacent
    phrase matching with ``--phrase``."""
    _init_ray(args.num_cpus)
    from rayslog.pipeline import _doc_index, _table_rows
    from rayslog.stages.invindex import bm25_topk, phrase_search

    index = _doc_index(args.sf_dir)
    tokens = args.query.split()
    if args.phrase:
        res = phrase_search(index, tokens)
    else:
        import json as _json
        from pathlib import Path

        n_docs = _table_rows(args.sf_dir, "documents")
        meta = _json.loads(
            Path(index.index_dir, "_inv_meta.json").read_text()
        )
        if "total_tokens" in meta:
            avgdl = meta["total_tokens"] / n_docs
        else:  # fall back to the streaming pass via the query path
            from rayslog.pipeline import q_bm25_search  # noqa: F401

            q_bm25_search(args.sf_dir)  # caches total_tokens
            meta = _json.loads(
                Path(index.index_dir, "_inv_meta.json").read_text()
            )
            avgdl = meta["total_tokens"] / n_docs
        res = bm25_topk(index, tokens, n_docs=n_docs, avgdl=avgdl, k=args.k)
    df = res.to_pandas()
    print(df.head(args.k).to_string())
    print(f"... {len(df)} rows")
    return 0


def cmd_index(args) -> int:
    """Manage a sharded posting store over parquet document drops:
    ``append`` indexes a parquet file/dir as a new immutable shard,
    ``compact`` merges all shards into one, ``stats`` prints the
    manifest, ``search`` runs BM25 over whatever is committed."""
    from pathlib import Path

    from rayslog.stages.invindex import ShardedInvertedIndex, bm25_topk

    if args.action == "append":
        store = ShardedInvertedIndex.create(args.store, n_buckets=args.buckets)
    elif Path(args.store, ShardedInvertedIndex.MANIFEST).exists():
        store = ShardedInvertedIndex(args.store)
    else:
        print(f"no posting store at {args.store}", file=sys.stderr)
        return 2

    if args.action == "append":
        if not args.input or not args.name:
            print("append needs --input and --name", file=sys.stderr)
            return 2
        _init_ray(args.num_cpus)
        import ray.data as rd

        ds = rd.read_parquet(args.input, columns=[args.id_col, args.col])
        if args.id_col != "doc_id" or args.col != "text":
            entry = store.append_shard(
                ds, args.name, col=args.col, id_col=args.id_col
            )
        else:
            entry = store.append_shard(ds, args.name)
        print(json.dumps({"appended": entry, "shards": store.shard_names()}))
        return 0
    if args.action == "compact":
        _init_ray(args.num_cpus)
        entry = store.compact()
        print(json.dumps({"compacted": entry}))
        return 0
    if args.action == "stats":
        print(
            json.dumps(
                {
                    "shards": store.shards,
                    "n_docs": store.n_docs,
                    "total_tokens": store.total_tokens,
                    "n_buckets": store.n_buckets,
                }
            )
        )
        return 0
    if args.action == "search":
        if not args.query:
            print("search needs --query", file=sys.stderr)
            return 2
        _init_ray(args.num_cpus)
        res = bm25_topk(
            store,
            args.query.split(),
            n_docs=store.n_docs,
            avgdl=store.avgdl,
            k=args.k,
        )
        df = res.to_pandas()
        print(df.to_string())
        return 0
    print(f"unknown action {args.action!r}", file=sys.stderr)
    return 2


def cmd_stats(args) -> int:
    _init_ray(args.num_cpus)
    from rayslog.pipeline import parsed_dataset

    ds = parsed_dataset(args.sf_dir)
    ds.count()
    print(ds.stats())
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rayslog")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="resumable parse→route job")
    p_run.add_argument("--input", required=True)
    p_run.add_argument("--out", required=True)
    p_run.add_argument("--num-cpus", type=int, default=None)
    p_run.set_defaults(fn=cmd_run)

    p_c = sub.add_parser(
        "curate", help="resumable curation job over document shards"
    )
    p_c.add_argument("--input", required=True)
    p_c.add_argument("--out", required=True)
    p_c.add_argument("--num-cpus", type=int, default=None)
    p_c.set_defaults(fn=cmd_curate)

    p_pk = sub.add_parser(
        "pack", help="resumable sequence-packing job over document shards"
    )
    p_pk.add_argument("--input", required=True)
    p_pk.add_argument("--out", required=True)
    p_pk.add_argument("--budget", type=int, default=256)
    p_pk.add_argument("--num-cpus", type=int, default=None)
    p_pk.set_defaults(fn=cmd_pack)

    p_q = sub.add_parser("query", help="run one named pipeline")
    p_q.add_argument("--name", required=True)
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_q.add_argument("--limit", type=int, default=20)
    p_q.add_argument("--num-cpus", type=int, default=None)
    p_q.set_defaults(fn=cmd_query)

    p_f = sub.add_parser(
        "search", help="BM25 / phrase search over the documents index"
    )
    p_f.add_argument("--query", required=True, help="space-separated terms")
    p_f.add_argument("--phrase", action="store_true",
                     help="exact adjacent-phrase match instead of BM25")
    p_f.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_f.add_argument("--k", type=int, default=10)
    p_f.add_argument("--num-cpus", type=int, default=None)
    p_f.set_defaults(fn=cmd_search)

    p_i = sub.add_parser(
        "index",
        help="manage a sharded posting store (append/compact/stats/search)",
    )
    p_i.add_argument("action", choices=["append", "compact", "stats", "search"])
    p_i.add_argument("--store", required=True,
                     help="posting store directory")
    p_i.add_argument("--input", help="parquet file/dir to index (append)")
    p_i.add_argument("--name", help="shard name (append)")
    p_i.add_argument("--col", default="text")
    p_i.add_argument("--id-col", default="doc_id")
    p_i.add_argument("--buckets", type=int, default=64)
    p_i.add_argument("--query", help="space-separated terms (search)")
    p_i.add_argument("--k", type=int, default=10)
    p_i.add_argument("--num-cpus", type=int, default=None)
    p_i.set_defaults(fn=cmd_index)

    p_s = sub.add_parser("stats", help="parse-stage ds.stats()")
    p_s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_s.add_argument("--num-cpus", type=int, default=None)
    p_s.set_defaults(fn=cmd_stats)

    args = ap.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
