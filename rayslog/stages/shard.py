"""Deterministic global shuffle into training shards.

Every LLM pretraining pipeline ends by shuffling the curated corpus
and cutting it into fixed-size shards.  ``ds.random_shuffle()`` is
nondeterministic and non-resumable; this operator instead orders docs
by ``splitmix64(doc_id, seed)`` (tie-broken by doc_id — airtight even
under hash collision) and assigns ``shard = rank // shard_size``,
``pos = rank % shard_size``.  Re-runs, retries and the SQL oracle all
produce the identical permutation.

100-TB shape (the pack_sequences distributed-window pattern, keyed by
the hash instead of doc_id):

1. one streaming pass computes each doc's shuffle key and its range
   part from the key's TOP BITS — uniform by construction (splitmix64
   is a finalizer), so parts are balanced with no skew handling;
2. per-part counts reduce through the raw-task combiner tree (one row
   per part, no sort-shuffle);
3. the driver turns the tiny per-part counts into exclusive rank
   offsets (one int per part, never per doc);
4. one ``groupby(part).map_groups`` pass sorts each part locally by
   (key, doc_id) and adds the part offset — global ranks are exact,
   and the only all-to-all moves (doc_id, key, part) rows, never
   payload columns.

The hash is the same splitmix64 expressed bit-identically in DuckDB
SQL (``stages/sample.py:sample_sql_hash_expr``), so shard/pos are
oracle-exact integers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayslog.stages.aggregate import live_block_refs, tree_reduce_refs
from rayslog.stages.sample import sample_sql_hash_expr, splitmix64


def shuffle_shards(
    ds,
    shard_size: int = 100,
    seed: int = 7,
    id_col: str = "doc_id",
    part_bits: int = 6,
):
    """(doc_id, shard, pos) for every doc under the seeded global
    shuffle.  ``part_bits``: 2^bits range parts (tune up at scale —
    parts x 16 B is the driver-side offset state)."""
    import ray

    shift = np.uint64(64 - part_bits)

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError("shuffle_shards requires non-negative ids")
        k = splitmix64(ids.astype(np.uint64), seed)
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "k": pa.array(k.view(np.int64)),
                "part": pa.array((k >> shift).view(np.int64)),
            }
        )

    # Materialize the SMALL (3 int cols) keys dataset ONCE — the counts
    # tree and the exchange pass consume the same blocks (the upstream
    # read lineage used to execute twice), and the counts run as a
    # ref-level combiner tree with no second executor spin-up.
    keys = ds.map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    refs = live_block_refs(keys)

    def part_counts(t: pa.Table) -> pa.Table:
        if "n" in t.column_names:  # later tree rounds: sum the partials
            g = t.group_by(["part"]).aggregate([("n", "sum")])
        else:  # first round sees the raw key blocks: count rows
            g = t.select(["part", "k"]).group_by(["part"]).aggregate(
                [("k", "count")]
            )
        return g.rename_columns(["part", "n"])

    if refs:
        totals = tree_reduce_refs(refs, part_counts).to_pandas()
    else:
        import pandas as pd

        totals = pd.DataFrame({"part": [], "n": []})
    totals = totals.sort_values("part").reset_index(drop=True)
    offs = dict(
        zip(
            totals["part"],
            np.r_[0, np.cumsum(totals["n"].to_numpy())[:-1]],
        )
    )
    offs_ref = ray.put(offs)

    _empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "shard": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )

    def assign(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _empty
        offs_l = ray.get(offs_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        k = t.column("k").to_numpy(zero_copy_only=False).view(np.uint64)
        part0 = int(t.column("part")[0].as_py())
        order = np.lexsort((ids, k))
        start = int(offs_l[part0])
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = start + np.arange(len(ids), dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "shard": pa.array(rank // shard_size),
                "pos": pa.array(rank % shard_size),
            }
        )

    from rayslog.stages.aggregate import task_exchange

    return task_exchange(
        keys, "part", 1 << part_bits, assign, drop_part_col=False
    )


def shuffle_shards_sql(
    table: str, shard_size: int, seed: int, id_col: str = "doc_id"
) -> str:
    """DuckDB oracle: row_number over the identical splitmix64 order."""
    h = sample_sql_hash_expr(id_col, seed)
    return f"""
WITH h AS (SELECT {id_col}, {h} AS k FROM {table}),
r AS (
  SELECT {id_col},
    row_number() OVER (ORDER BY k, {id_col}) - 1 AS rank
  FROM h
)
SELECT {id_col},
  CAST(rank // {shard_size} AS BIGINT) AS shard,
  CAST(rank % {shard_size} AS BIGINT) AS pos
FROM r
"""
