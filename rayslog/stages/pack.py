"""Sequence packing for training-data assembly.

Assign each document (in deterministic doc_id order) to a training bin
of ``budget`` tokens using the prefix-sum rule: a doc belongs to the
bin its starting token offset falls in (``bin = exclusive_prefix_sum
// budget`` — "greedy with overflow": a bin may run past the budget by
at most one doc's tail, the standard concat-then-chunk packing used
for LLM pretraining shards).

This is the engine's distributed window-function pattern (a global
ordered cumulative sum), built the scale-correct way:

1. docs are range-partitioned by ``doc_id // chunk`` (dense ids make
   the parts balanced);
2. per-part token totals reduce through the raw-task combiner tree
   (``aggregate._tree_combine`` — no sort-shuffle);
3. the driver turns the SMALL per-part totals into exclusive offsets
   (one row per part, never per doc);
4. one ``groupby(part).map_groups`` pass computes each part's local
   cumulative sums and adds the part offset — bins are globally exact.

Everything is integer arithmetic, so the DuckDB oracle
(``SUM() OVER (ORDER BY doc_id ROWS ... 1 PRECEDING) // budget``)
matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayslog.stages.aggregate import _tree_combine


def pack_sequences(ds, budget: int = 256, chunk: int = 4_096,
                   id_col: str = "doc_id", col: str = "text"):
    """(doc_id, n_tokens, bin_id) for every document.

    ``budget``: tokens per bin; ``chunk``: docs per range partition
    (tune up at scale — parts x 16 B is the driver-side state).
    """
    import pandas as pd
    import ray

    def featurize(t: pa.Table) -> pa.Table:
        txt = t.column(col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n_tok = pc.cast(
            pc.fill_null(pc.count_substring_regex(txt, r"\S+"), 0),
            pa.int64(),
        )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        part = (ids // chunk).astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": n_tok,
                "part": pa.array(part),
            }
        )

    feats = ds.map_batches(
        featurize, batch_format="pyarrow", zero_copy_batch=True
    )

    # per-part token totals via the combiner tree (partial rows are one
    # per part per batch; the tree result is one row per part)
    def partial_sums(t: pa.Table) -> pa.Table:
        g = t.group_by(["part"]).aggregate([("n_tokens", "sum")])
        return g.rename_columns(["part", "n"])

    part_partials = feats.map_batches(
        partial_sums, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = _tree_combine(part_partials, feats, ["part"], "n").to_pandas()
    totals = totals.sort_values("part").reset_index(drop=True)
    offs = dict(
        zip(
            totals["part"],
            np.r_[0, np.cumsum(totals["n"].to_numpy())[:-1]],
        )
    )
    offs_ref = ray.put(offs)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        offs_l = ray.get(offs_ref)
        g = g.sort_values(id_col).reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        start = int(offs_l[int(g["part"].iloc[0])])
        excl = start + np.cumsum(n) - n
        return pd.DataFrame(
            {
                id_col: g[id_col].astype("int64"),
                "n_tokens": n.astype("int64"),
                "bin_id": (excl // budget).astype("int64"),
            }
        )

    return feats.groupby("part").map_groups(assign, batch_format="pandas")
