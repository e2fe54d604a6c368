"""Mergeable sketches: HyperLogLog approximate distinct count.

The guide's sketch pattern: emit ONE serialized sketch per batch from
``map_batches`` (vectorized register update), merge the handful of
sketches in a tiny second stage — the shuffle carries kilobytes per
batch regardless of row count, which is what makes cardinality
estimation tractable at 10^12 rows.

Standard HLL (Flajolet et al.): 2^p registers, register j keeps the max
leading-zero rank of hashes routed to it; bias-corrected harmonic-mean
estimate with small/large-range corrections.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash64(arr: pa.Array) -> np.ndarray:
    """Deterministic 64-bit hashes of a string/int column (vectorized
    FNV-1a over the raw bytes via numpy, chunk-free)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.string())
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.zeros(0, np.uint8)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    starts, ends = off[:-1], off[1:]
    n = len(arr)
    h = np.full(n, np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    max_len = int((ends - starts).max()) if n else 0
    for k in range(max_len):
        idx = starts + k
        live = idx < ends
        byte = np.where(live, buf[np.minimum(idx, len(buf) - 1)], 0).astype(np.uint64)
        nh = (h ^ byte) * prime
        h = np.where(live, nh, h)
    # murmur3 fmix64 finalizer: FNV's high bits avalanche poorly for
    # short similar keys, and HLL routes on the TOP p bits
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


class HllSketch:
    __slots__ = ("p", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.registers = (
            registers
            if registers is not None
            else np.zeros(1 << p, dtype=np.uint8)
        )

    def update_hashes(self, h: np.ndarray) -> None:
        if not len(h):
            return
        p = self.p
        j = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)  # remaining bits, left-aligned
        # rank = leading zeros of w + 1 (capped at 64-p+1)
        lz = np.full(len(h), 64 - p, dtype=np.uint8)
        cur = w
        # vectorized leading-zero count via float log2 (exact for our cap)
        nz = cur != 0
        lz[nz] = (63 - np.floor(np.log2(cur[nz].astype(np.float64)))).astype(np.uint8)
        rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
        np.maximum.at(self.registers, j, rank)

    def merge(self, other: "HllSketch") -> "HllSketch":
        return HllSketch(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(len(self.registers))
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HllSketch":
        return cls(b[0], np.frombuffer(b[1:], dtype=np.uint8).copy())


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate distinct count of ``column`` (relative error ~1.04/sqrt(2^p))."""

    def per_batch(t: pa.Table) -> pa.Table:
        sk = HllSketch(p)
        col = t.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sk.update_hashes(_hash64(col.drop_null()))
        return pa.table({"sketch": pa.array([sk.to_bytes()], pa.binary())})

    partial = ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = HllSketch(p)
    for b in partial.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for blob in t.column("sketch").to_pylist():
            merged = merged.merge(HllSketch.from_bytes(blob))
    return merged.estimate()


def approx_heavy_hitters(ds, key_fn, k: int = 20, capacity: int = 2_048):
    """Approximate top-k heavy hitters via mergeable SpaceSaving-style
    counter truncation — the SCALE path beside an exact
    groupby-sum+sort (stages/text.py:top_ngrams): per-batch exact
    counts truncate to the ``capacity`` largest, partials merge by
    summation + re-truncation through the raw-task combiner tree, and
    the final top-k reads off the merged counters.

    ``key_fn(batch: pa.Table) -> pa.Table`` must return exact
    (key:string, n:int64) partial counts for the batch (reuse an exact
    operator's partial stage).  Guarantee: any key whose true count
    exceeds ~(total_mass / capacity) per merge node survives
    truncation; with capacity >> k the returned top-k equals the exact
    top-k on skewed (Zipf-like) distributions — verified against the
    exact operator in tests.  State per node is O(capacity), never
    O(distinct keys): at 10^9 distinct ngrams the exact plan shuffles
    every distinct key once, while this one moves ``capacity`` rows
    per block, full stop.
    """
    import ray
    import ray.data as rd

    def truncate(t: pa.Table) -> pa.Table:
        if t.num_rows <= capacity:
            return t
        idx = pc.select_k_unstable(
            t, k=capacity, sort_keys=[("n", "descending")]
        )
        return t.take(idx)

    def per_batch(t: pa.Table) -> pa.Table:
        return truncate(key_fn(t))

    partial = ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=8_192,
    )
    mat = partial.materialize()
    refs = [
        r
        for b in mat.iter_internal_ref_bundles()
        for r, m in b.blocks
        if m.num_rows
    ]
    if not refs:
        return rd.from_arrow(
            pa.table(
                {"key": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        )

    @ray.remote
    def combine(*blocks):
        merged = (
            pa.concat_tables(list(blocks), promote_options="default")
            .group_by(["key"])
            .aggregate([("n", "sum")])
            .rename_columns(["key", "n"])
        )
        return truncate(merged)

    if len(refs) == 1:
        refs = [combine.remote(refs[0])]
    while len(refs) > 1:
        refs = [
            combine.remote(*refs[i : i + 16])
            for i in range(0, len(refs), 16)
        ]
    final = ray.get(refs[0])
    order = pc.select_k_unstable(
        final, k=min(k, final.num_rows),
        sort_keys=[("n", "descending"), ("key", "ascending")],
    )
    return rd.from_arrow(final.take(order))
