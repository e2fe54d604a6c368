"""Per-partition lineage manifests + checkpoint/resume.

Ray Data has no job-level checkpointing, so resumability is explicit
(SURVEY.md §4.2): the input is split into partitions (one per input
file / row-group range), each partition is processed and written to its
own sink directory via temp-dir + atomic rename, and a manifest JSON
(input fragment, output files, row counts, parse metrics) is committed
LAST.  A rerun skips every partition whose manifest exists — making the
whole parse→route job idempotent and kill-safe at any point.  At 100 TB
the partition unit is the input file (or file cluster); manifests are
tiny and live next to the sinks.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
from dataclasses import dataclass
from pathlib import Path


def partition_id(path: str) -> str:
    """Stable partition id derived from the INPUT PATH, not its position
    in the file listing — adding/removing sibling files between runs must
    not remap ids (or resume would skip unprocessed inputs / orphan
    outputs under a reused name)."""
    base = re.sub(r"[^A-Za-z0-9._-]", "_", Path(path).stem)[:64]
    h = hashlib.sha1(str(path).encode()).hexdigest()[:8]
    return f"part-{base}-{h}"


@dataclass
class PartitionResult:
    partition: str
    rows: int
    parsed: int
    errors: int
    outputs: list[str]
    metrics: dict


class ManifestStore:
    def __init__(self, out_dir: str):
        self.out_dir = Path(out_dir)
        self.manifest_dir = self.out_dir / "_manifests"
        self.manifest_dir.mkdir(parents=True, exist_ok=True)

    def done(self, partition: str, input_path: str | None = None) -> bool:
        """A partition is done only if its manifest exists AND (when
        input_path is given) the manifest's recorded input matches —
        a mismatch means the name was reused for a different input, so
        the partition must be reprocessed."""
        p = self.manifest_dir / f"{partition}.json"
        if not p.exists():
            return False
        if input_path is None:
            return True
        try:
            committed = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            return False
        return committed.get("metrics", {}).get("input") == str(input_path)

    def commit(self, result: PartitionResult) -> None:
        path = self.manifest_dir / f"{result.partition}.json"
        tmp = path.with_suffix(f".tmp.{os.getpid()}")
        tmp.write_text(json.dumps(result.__dict__, indent=1, sort_keys=True))
        os.replace(tmp, path)

    def completed(self) -> list[str]:
        return sorted(p.stem for p in self.manifest_dir.glob("*.json"))

    def load(self, partition: str) -> dict:
        return json.loads((self.manifest_dir / f"{partition}.json").read_text())


def run_resumable_route(
    input_files: list[str],
    out_dir: str,
    cfg=None,
    batch_size: int | None = None,
) -> list[str]:
    """Parse→route every input file into per-partition severity sinks,
    skipping partitions already committed.  Returns processed partitions.

    Layout::

        out_dir/
          _manifests/part-00000.json      # commit marker + lineage + metrics
          part-00000/parsed/severity=K/...parquet
          part-00000/errors/...parquet
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayslog.config import DEFAULT_CONFIG
    from rayslog.stages.parse import parse_dataset

    cfg = cfg or DEFAULT_CONFIG
    store = ManifestStore(out_dir)
    processed = []
    for path in sorted(input_files):
        part = partition_id(path)
        if store.done(part, input_path=path):
            continue
        part_dir = Path(out_dir) / part
        tmp_dir = Path(out_dir) / f"_tmp.{part}.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        tmp_dir.mkdir(parents=True)

        ds = parse_dataset(rd.read_parquet(path), cfg, batch_size=batch_size)
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
        parsed.write_parquet(
            str(tmp_dir / "parsed"), partition_cols=["severity"]
        )
        errors.write_parquet(str(tmp_dir / "errors"))

        # per-partition metrics from the freshly-written sinks (cheap
        # metadata reads — row counts come from parquet footers)
        sev_counts: dict[str, int] = {}
        n_parsed = 0
        for f in sorted((tmp_dir / "parsed").rglob("*.parquet")):
            n = pq.read_metadata(f).num_rows
            sev = f.parent.name  # severity=K
            sev_counts[sev] = sev_counts.get(sev, 0) + n
            n_parsed += n
        n_errors = sum(
            pq.read_metadata(f).num_rows
            for f in sorted((tmp_dir / "errors").rglob("*.parquet"))
        )

        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp_dir, part_dir)  # atomic publish
        outputs = sorted(
            str(p.relative_to(part_dir)) for p in part_dir.rglob("*.parquet")
        )
        store.commit(
            PartitionResult(
                partition=part,
                rows=n_parsed + n_errors,
                parsed=n_parsed,
                errors=n_errors,
                outputs=outputs,
                metrics={"input": path, "severity_rows": sev_counts},
            )
        )
        processed.append(part)
    return processed


def run_resumable_curation(
    input_files: list[str],
    out_dir: str,
    budget_gates: dict | None = None,
    sample_rates: dict | None = None,
    default_rate: float = 0.5,
    seed: int = 42,
) -> tuple[list[str], str]:
    """Resumable curation over document parquet shards.

    Two stages, mirroring how real curation jobs shard:

    - **Stage A (per input file, RESUMABLE)** — the expensive pass that
      reads text: quality-gate filter + content hashing; survivors'
      (doc_id, h1, h2, lang, source) land in a per-partition candidates
      parquet (temp-dir + atomic rename, manifest committed last).  A
      rerun skips committed partitions — text is never re-read.
    - **Stage B (global, cheap)** — keep-min-id exact dedup + the
      deterministic stratified sample over the SMALL candidate rows
      (16-byte hashes + ids, no text), rewritten atomically every run
      (it is orders of magnitude cheaper than stage A and depends on
      all partitions, so re-running it is the correct semantics).

    Returns (newly processed partitions, final output parquet path).
    """
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayslog.stages.sample import stratified_sample
    from rayslog.stages.text import add_text_hash, quality_filter

    gates = budget_gates or {}
    store = ManifestStore(out_dir)
    processed = []
    for path in sorted(input_files):
        part = partition_id(path)
        if store.done(part, input_path=path):
            continue
        tmp_dir = Path(out_dir) / f"_tmp.{part}.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        tmp_dir.mkdir(parents=True)
        ds = rd.read_parquet(
            path, columns=["doc_id", "text", "lang", "source"]
        )
        cands = quality_filter(ds, **gates).map_batches(
            lambda t: add_text_hash(t).select(
                ["doc_id", "h1", "h2", "lang", "source"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        cands.write_parquet(str(tmp_dir / "candidates"))
        n_rows = sum(
            pq.read_metadata(f).num_rows
            for f in sorted((tmp_dir / "candidates").rglob("*.parquet"))
        )
        part_dir = Path(out_dir) / part
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp_dir, part_dir)
        outputs = sorted(
            str(p.relative_to(part_dir)) for p in part_dir.rglob("*.parquet")
        )
        store.commit(
            PartitionResult(
                partition=part, rows=n_rows, parsed=n_rows, errors=0,
                outputs=outputs, metrics={"input": path},
            )
        )
        processed.append(part)

    # ---- stage B: global dedup + sample over ALL committed candidates
    cand_files = sorted(
        str(f)
        for f in Path(out_dir).glob("part-*/candidates/*.parquet")
    )
    final_path = str(Path(out_dir) / "curated.parquet")
    all_cands = rd.read_parquet(cand_files)
    # dedup partition count scales with the candidate volume (parquet
    # footer metadata, no data read): ~2M rows (~80 MB) per group
    n_cands = sum(pq.read_metadata(f).num_rows for f in cand_files)
    hparts = max(64, n_cands // 2_000_000)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        first = ~g.duplicated(["h1", "h2"])
        return g[first][["doc_id", "lang", "source"]]

    def add_hpart(t):
        import pyarrow as pa

        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        return t.append_column(
            "hpart",
            pa.array(
                (h1.view(np.uint64) % np.uint64(hparts)).astype(np.int32)
            ),
        )

    surv = (
        all_cands.map_batches(
            add_hpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(keep_min, batch_format="pandas")
    )
    sampled = stratified_sample(
        surv, strata_col="lang", rates=sample_rates or {},
        default_rate=default_rate, seed=seed,
    )
    tmp_final = f"{final_path}.tmp.{os.getpid()}"
    shutil.rmtree(tmp_final, ignore_errors=True)
    sampled.write_parquet(tmp_final)
    shutil.rmtree(final_path, ignore_errors=True)
    os.replace(tmp_final, final_path)
    return processed, final_path


def run_resumable_pack(
    input_files: list[str],
    out_dir: str,
    budget: int = 256,
    chunk: int = 4_096,
) -> tuple[list[str], str]:
    """Resumable sequence packing over document parquet shards.

    - **Stage A (per input file, RESUMABLE)** — the text-reading pass:
      per-doc whitespace token counts land in a per-partition feats
      parquet of (doc_id, n_tokens) ints (temp-dir + atomic rename,
      manifest committed last).  A rerun skips committed partitions —
      text is never re-read.
    - **Stage B (global, cheap)** — the distributed prefix-sum bin
      assignment (``pack.assign_bins``) over the SMALL int rows,
      rewritten atomically every run (it depends on every partition's
      totals, so re-running it is the correct semantics; cost is
      O(docs x 16 B), not O(text)).

    Returns (newly processed partitions, bins parquet dir).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayslog.stages.pack import assign_bins

    store = ManifestStore(out_dir)
    processed = []
    for path in sorted(input_files):
        part = partition_id(path)
        if store.done(part, input_path=path):
            continue
        tmp_dir = Path(out_dir) / f"_tmp.{part}.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        tmp_dir.mkdir(parents=True)
        ds = rd.read_parquet(path, columns=["doc_id", "text"])

        def feats(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_tokens": pc.cast(
                        pc.fill_null(
                            pc.count_substring_regex(
                                t.column("text"), r"\S+"
                            ),
                            0,
                        ),
                        pa.int64(),
                    ),
                }
            )

        ds.map_batches(
            feats, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(str(tmp_dir / "feats"))
        n_rows = sum(
            pq.read_metadata(f).num_rows
            for f in sorted((tmp_dir / "feats").rglob("*.parquet"))
        )
        part_dir = Path(out_dir) / part
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp_dir, part_dir)
        outputs = sorted(
            str(p.relative_to(part_dir))
            for p in part_dir.rglob("*.parquet")
        )
        store.commit(
            PartitionResult(
                partition=part, rows=n_rows, parsed=n_rows, errors=0,
                outputs=outputs, metrics={"input": path},
            )
        )
        processed.append(part)

    # ---- stage B: global prefix-sum bins over ALL committed feats
    feat_files = sorted(
        str(f) for f in Path(out_dir).glob("part-*/feats/*.parquet")
    )
    final_path = str(Path(out_dir) / "bins.parquet")
    bins = assign_bins(
        rd.read_parquet(feat_files), budget=budget, chunk=chunk
    )
    tmp_final = f"{final_path}.tmp.{os.getpid()}"
    shutil.rmtree(tmp_final, ignore_errors=True)
    bins.write_parquet(tmp_final)
    shutil.rmtree(final_path, ignore_errors=True)
    os.replace(tmp_final, final_path)
    return processed, final_path
