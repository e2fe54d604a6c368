"""Raw syslog-line sources.

The reference library is handed one ``[]byte`` per message by a daemon;
the engine equivalent ingests whole log files: every line of a text file
(or every element of a JSON array / JSONL file) becomes one message row,
parsed by the same kernels.  ``read_syslog_text`` keeps per-file lineage
(``source_file``, ``line_no``) so routed rows stay traceable — the
line-level analogue of the per-partition manifests.
"""

from __future__ import annotations

import pyarrow as pa


def read_syslog_text(paths, include_lineage: bool = True):
    """One row per line of the given text file(s): (text[, source_file,
    line_no]).  Uses read_binary_files + a vectorized split so line
    numbering is per-file (ray.data.read_text would lose file
    boundaries across blocks)."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def split(batch: pa.Table) -> pa.Table:
        texts, files, lines = [], [], []
        for path, blob in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            raw = blob.decode("utf-8", errors="replace").split("\n")
            if raw and raw[-1] == "":
                raw.pop()
            texts.extend(raw)
            if include_lineage:
                files.extend([path] * len(raw))
                lines.extend(range(len(raw)))
        cols = {"text": pa.array(texts, pa.string())}
        if include_lineage:
            cols["source_file"] = pa.array(files, pa.string())
            cols["line_no"] = pa.array(np.array(lines, dtype=np.int64))
        return pa.table(cols)

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)


def parse_syslog_files(paths, cfg=None):
    """read -> parse for raw syslog files (the daemon-equivalent entry)."""
    from rayslog.config import DEFAULT_CONFIG
    from rayslog.stages.parse import parse_dataset

    return parse_dataset(read_syslog_text(paths), cfg or DEFAULT_CONFIG)


TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts_jsonl(paths, columns: list[str] | None = None):
    """Transcripts from NDJSON (one JSON object per line, the
    input_hint schema) — the same Dataset shape as the parquet reader,
    so every pipeline runs unchanged over JSONL drops.  ``ts`` accepts
    epoch-micros ints or ISO strings; ``turn_idx`` is cast to int32.
    Column pruning happens right after decode (JSON can't prune at the
    read the way parquet row groups do — noted trade-off)."""
    import pyarrow.compute as pc
    import ray.data as rd

    cols = list(columns or TRANSCRIPT_COLUMNS)
    ds = rd.read_json(paths)

    def fix(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            col = t.column(c)
            if c == "turn_idx":
                col = pc.cast(col, pa.int32())
            elif c == "ts":
                if pa.types.is_integer(col.type):
                    col = col.cast(pa.timestamp("us"))
                elif pa.types.is_string(col.type):
                    col = pc.strptime(col, "%Y-%m-%dT%H:%M:%S", "us")
            out[c] = col
        return pa.table(out)

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def parse_transcripts_jsonl(paths, cfg=None):
    """read JSONL -> parse: the drop-in for pipelines whose upstream
    lands NDJSON instead of parquet."""
    from rayslog.config import DEFAULT_CONFIG
    from rayslog.stages.parse import parse_dataset

    ds = read_transcripts_jsonl(paths, ["conv_id", "turn_idx", "text"])
    return parse_dataset(ds, cfg or DEFAULT_CONFIG)
