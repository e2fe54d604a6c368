"""Duplicate-cluster resolution: connected components over a near-dup
pair graph.

Pair lists (minhash/simhash/cosine dedup output) answer "are a and b
dups?"; curation needs "which docs form ONE duplicate group?" — i.e.
the connected components of the pair graph, so the pipeline can keep
exactly one representative per group (transitive closure: a~b, b~c
puts a,c in one group even if the a-c pair was never emitted).

Algorithm: iterative min-label propagation, the standard bulk-
synchronous connected-components kernel (Hash-Min). Every node starts
labeled with itself; each round every node takes the min of its own
and its neighbors' labels; converged when no label changes.  Rounds =
component diameter — near-dup clusters are near-cliques, so 2-3 rounds
in practice; ``max_rounds`` raises loudly rather than looping forever.

100-TB shape: each round is ONE partitioned hash join (edges x labels
on the source endpoint — ``relational.hash_join``, each row moves
once) plus ONE groupby-min over (node, candidate-label) rows.  Edge
and label tables are O(pairs) and O(endpoint docs) — never the corpus
— and labels are materialized per round so round N+1 does not re-run
round N's plan.  Convergence is detected with a scalar sum aggregate
(labels only ever decrease, so the sum strictly decreases until the
fixed point).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayslog.stages.relational import hash_join


def _components_numpy(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Driver-side kernel for SMALL edge lists: min-label propagation
    with pointer doubling on remapped node indices — O(E · log D)
    vectorized numpy, no Python per-edge loop."""
    nodes, edges_idx = np.unique(np.concatenate([u, v]), return_inverse=True)
    eu, ev = edges_idx[: len(u)], edges_idx[len(u):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.copy()
        np.minimum.at(label, eu, label[ev])
        np.minimum.at(label, ev, label[eu])
        label = np.minimum(label, label[label])  # pointer jump
        if np.array_equal(label, before):
            break
    return pa.table(
        {
            "doc_id": pa.array(nodes.astype(np.int64)),
            "cluster_id": pa.array(nodes[label].astype(np.int64)),
        }
    )


def connected_components(
    pairs,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 32,
    buckets: int = 32,
    small_edges_threshold: int = 5_000_000,
):
    """(doc_id, cluster_id) for every endpoint of ``pairs``;
    cluster_id is the component's minimum doc_id.

    Hybrid plan: the pair list is the (already-reduced) OUTPUT of the
    LSH stage, orders of magnitude smaller than the corpus, so up to
    ``small_edges_threshold`` edges (~16 B/edge -> ~80 MB driver heap
    at the default) the components are solved on the driver with the
    vectorized numpy kernel — one dataset execution instead of
    2-3 join+groupby rounds of Ray fixed machinery.  Past the
    threshold the BSP min-label propagation below runs fully
    distributed (same contract as counts_by's final="driver"/"shuffle"
    split: the small path is a documented cardinality bound, not an
    assumption)."""
    from ray.data.aggregate import Min

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b])),
                "v": pa.array(np.concatenate([b, a])),
            }
        )

    import ray.data as rd

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        )
    if n_pairs <= small_edges_threshold:
        df = pairs.to_pandas()
        return rd.from_arrow(
            _components_numpy(
                df[a_col].to_numpy(dtype=np.int64),
                df[b_col].to_numpy(dtype=np.int64),
            )
        )

    edges = pairs.map_batches(
        symmetrize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def self_labels(t: pa.Table) -> pa.Table:
        u = t.column("u")
        return pa.table({"v": u, "label": u})

    # Ray's Min aggregate widens int64 → double; cast back after every
    # round so the convergence sum stays exact integer arithmetic
    # (doubles lose ulps past 2^53 — a silently-missed label change).
    def as_int_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "label": t.column("label").cast(pa.int64()),
            }
        )

    labels = (
        edges.map_batches(
            self_labels, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("v")
        .aggregate(Min("label", alias_name="label"))
        .map_batches(as_int_labels, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    total = labels.sum("label")

    for _ in range(max_rounds):
        # neighbor messages: (v, label(u)) for every edge u->v
        msgs = hash_join(
            edges,
            labels.map_batches(
                lambda t: t.rename_columns(["u", "label"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            key="u",
            buckets=buckets,
        ).map_batches(
            lambda t: t.select(["v", "label"]), batch_format="pyarrow"
        )
        labels = (
            labels.union(msgs)
            .groupby("v")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(
                as_int_labels, batch_format="pyarrow", zero_copy_batch=True
            )
            .materialize()
        )
        new_total = labels.sum("label")
        if new_total == total:
            # Ray's Min aggregate widens to double; restore int64 ids.
            def finalize(t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "doc_id": t.column("v").cast(pa.int64()),
                        "cluster_id": t.column("label").cast(pa.int64()),
                    }
                )

            return labels.map_batches(
                finalize, batch_format="pyarrow", zero_copy_batch=True
            )
        total = new_total
    raise ValueError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(component diameter exceeds the bound — raise max_rounds)"
    )


def cluster_survivors(docs, pairs, id_col: str = "doc_id", buckets: int = 32):
    """Transitive-closure dedup: keep ONE representative (the min
    ``id_col``) per connected component of ``pairs``, plus every doc in
    no pair at all.

    The drop set (component members that are not their component's min)
    is O(duplicate docs) — on a template-heavy corpus that is a large
    fraction of the corpus, so it goes through a partitioned hash ANTI
    join (``relational.hash_join(how="anti")``), never a broadcast.
    """
    cc = connected_components(pairs, max_rounds=64, buckets=buckets)

    def drops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(t.column("doc_id"), t.column("cluster_id"))
        return pa.table({id_col: t.filter(keep).column("doc_id")})

    drop_ids = cc.map_batches(
        drops, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_join(docs, drop_ids, key=id_col, buckets=buckets, how="anti")
