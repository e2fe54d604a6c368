"""Enrich stage: role/tool lookup joins as a stateful actor pool.

The small lookup sides are broadcast once per actor (built in
``__init__``) and applied per batch as vectorized dictionary joins
(``index_in`` + ``take``) — the canonical Ray Data broadcast-hash-lookup
shape for dimension tables.  At 100 TB these tables stay tiny, so a
shuffle join would be the wrong plan; the actor pool also models the
general stateful-stage pattern (model load / index build) of the engine.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: role -> (role_code:int8, role_class:string)
ROLE_LOOKUP = {
    "user": (1, "human"),
    "assistant": (2, "model"),
    "system": (3, "control"),
    "tool": (4, "machine"),
}

#: tool -> (tool_code:int16, tool_family:string); "" = no tool
TOOL_LOOKUP = {
    "": (0, "none"),
    "bash": (1, "shell"),
    "search": (2, "retrieval"),
    "editor": (3, "workspace"),
    "browser": (4, "web"),
}


def _lookup_arrays(lookup: dict, code_type: pa.DataType):
    keys = pa.array(list(lookup.keys()), pa.string())
    codes = pa.array([v[0] for v in lookup.values()], code_type)
    classes = pa.array([v[1] for v in lookup.values()], pa.string())
    return keys, codes, classes


def enrich_table(batch: pa.Table) -> pa.Table:
    """Append role_code/role_class/tool_code/tool_family to a batch."""
    rk, rc, rcl = _lookup_arrays(ROLE_LOOKUP, pa.int8())
    tk, tc, tcl = _lookup_arrays(TOOL_LOOKUP, pa.int16())
    ri = pc.index_in(batch.column("role"), value_set=rk)
    ti = pc.index_in(batch.column("tool"), value_set=tk)
    return (
        batch.append_column("role_code", pc.take(rc, ri))
        .append_column("role_class", pc.take(rcl, ri))
        .append_column("tool_code", pc.take(tc, ti))
        .append_column("tool_family", pc.take(tcl, ti))
    )


class Enricher:
    """Actor-pool enrichment stage for ``map_batches(Enricher, ...)``.

    Lookup dictionaries are materialized once per actor in ``__init__``
    (the broadcast); ``__call__`` performs the per-batch vectorized join.
    """

    def __init__(self, role_lookup: dict | None = None, tool_lookup: dict | None = None):
        self._rk, self._rc, self._rcl = _lookup_arrays(
            role_lookup or ROLE_LOOKUP, pa.int8()
        )
        self._tk, self._tc, self._tcl = _lookup_arrays(
            tool_lookup or TOOL_LOOKUP, pa.int16()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ri = pc.index_in(batch.column("role"), value_set=self._rk)
        ti = pc.index_in(batch.column("tool"), value_set=self._tk)
        return (
            batch.append_column("role_code", pc.take(self._rc, ri))
            .append_column("role_class", pc.take(self._rcl, ri))
            .append_column("tool_code", pc.take(self._tc, ti))
            .append_column("tool_family", pc.take(self._tcl, ti))
        )


def enrich_dataset(ds, batch_size: int | None = None):
    """Stateless enrichment: the lookup sides are two constant
    handful-of-entry dicts, so a plain task-based ``map_batches`` keeps
    Ray's fused task chain on the long-lived default workers (measured:
    a dedicated actor pool re-paid cold-start every run and dominated
    short benches — VERDICT r1 #6).  ``Enricher`` above remains the
    actor-pool pattern for stages whose init is genuinely expensive."""
    return ds.map_batches(
        enrich_table,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
