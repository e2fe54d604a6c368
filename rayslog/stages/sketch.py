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


class KllSketch:
    """Mergeable quantile sketch (KLL/MRL-style, DETERMINISTIC
    compaction).

    ``levels[i]`` holds float64 items of weight 2^i; when a level
    exceeds ``k`` items it is sorted and every other item (offset
    alternating per compaction — deterministic, where classic KLL
    flips a coin) is promoted to level i+1.  Rank error per compaction
    is <= 2^i, giving the MRL bound eps = O(log^2(n/k) / k); k=512
    holds ~1-2% rank error through 10^8 items while the sketch stays
    O(k log(n/k)) floats — kilobytes through the merge tree no matter
    the row count (the HLL discipline applied to quantiles).  The
    EXACT path for bounded-precision domains stays
    aggregate.exact_quantiles_cents; this is the unbounded-float
    companion.
    """

    __slots__ = ("k", "levels", "parity", "count")

    def __init__(self, k: int = 512):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.parity: list[int] = [0]
        self.count = 0

    def _compact_overflows(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if len(buf) <= self.k:
                i += 1
                continue
            buf = np.sort(buf)
            off = self.parity[i] & 1
            self.parity[i] += 1
            promoted = buf[off::2]
            self.levels[i] = np.empty(0, np.float64)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self.parity.append(0)
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], promoted]
            )
            i += 1

    def add_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.count += len(v)
        # feed in k-sized slices so level 0 never balloons past 2k
        for s in range(0, len(v), self.k):
            self.levels[0] = np.concatenate(
                [self.levels[0], v[s : s + self.k]]
            )
            self._compact_overflows()

    def merge(self, other: "KllSketch") -> "KllSketch":
        out = KllSketch(self.k)
        out.count = self.count + other.count
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        out.parity = []
        for i in range(depth):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            out.levels.append(
                np.concatenate([a, b]).astype(np.float64)
            )
            pa_ = self.parity[i] if i < len(self.parity) else 0
            pb = other.parity[i] if i < len(other.parity) else 0
            out.parity.append(pa_ + pb)
        out._compact_overflows()
        return out

    def quantile(self, q: float) -> float:
        vals = np.concatenate(self.levels)
        if not len(vals):
            return float("nan")
        w = np.concatenate(
            [
                np.full(len(buf), 1 << i, dtype=np.int64)
                for i, buf in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals)
        cum = np.cumsum(w[order])
        target = max(1, int(np.ceil(q * cum[-1])))
        idx = int(np.searchsorted(cum, target))
        return float(vals[order][min(idx, len(vals) - 1)])

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            (self.k, self.count, self.parity,
             [lv.tobytes() for lv in self.levels])
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "KllSketch":
        import pickle

        k, count, parity, bufs = pickle.loads(b)
        sk = cls(k)
        sk.count = count
        sk.parity = list(parity)
        sk.levels = [np.frombuffer(x, dtype=np.float64).copy() for x in bufs]
        return sk


def approx_quantiles(ds, column: str, quantiles=(0.5, 0.95, 0.99),
                     k: int = 512):
    """Approximate quantiles of a float column via the mergeable
    KllSketch: one serialized sketch per batch (vectorized add), a
    raw-task combiner tree over the kilobyte partials, quantiles read
    off the final sketch.  Returns (q, value) rows.  Rows-only in the
    driver contract (approximate by construction); accuracy is pinned
    by a rank-error pytest against the exact operator."""
    import ray.data as rd

    from rayslog.stages.aggregate import tree_reduce

    def per_batch(t: pa.Table) -> pa.Table:
        sk = KllSketch(k)
        col = t.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sk.add_many(col.drop_null().to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([sk.to_bytes()], pa.binary())})

    partial = ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_tables(t: pa.Table) -> pa.Table:
        merged = None
        for blob in t.column("sketch").to_pylist():
            sk = KllSketch.from_bytes(blob)
            merged = sk if merged is None else merged.merge(sk)
        return pa.table(
            {"sketch": pa.array([merged.to_bytes()], pa.binary())}
        )

    def finish(t: pa.Table) -> pa.Table:
        sk = KllSketch.from_bytes(t.column("sketch")[0].as_py())
        return pa.table(
            {
                "q": pa.array([f"p{int(q * 100)}" for q in quantiles]),
                "value": pa.array(
                    [sk.quantile(q) for q in quantiles], pa.float64()
                ),
            }
        )

    def empty_fn():
        return rd.from_arrow(
            pa.table(
                {
                    "q": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        partial, merge_tables, empty_fn=empty_fn, final_fn=finish
    )


def grouped_approx_quantiles(ds, group_col: str, value_col: str,
                             quantiles=(0.5, 0.95), k: int = 512):
    """Per-group approximate quantiles via one KllSketch per group:
    (group, q, value) rows.

    Per-batch combiner: values split by group (one vectorized
    dictionary-encode + sort, no per-row Python) into one sketch per
    group PRESENT IN THE BATCH; the combiner tree then merges sketches
    groupwise.  State through the merge is O(groups x k log(n/k))
    floats — right for bounded strata (language, source, severity),
    the same cardinality rule as grouped_quantiles_int.  For
    corpus-growing group domains, hash-partition groups into bounded
    parts first and run this per part (the dedup.py pattern) — the
    sketch itself merges associatively either way.
    """
    import ray.data as rd

    from rayslog.stages.aggregate import tree_reduce

    def per_batch(t: pa.Table) -> pa.Table:
        g = t.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = t.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        keep = pc.is_valid(v)
        g = g.filter(keep)
        vals = v.filter(keep).to_numpy(zero_copy_only=False)
        if not len(vals):
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "sketch": pa.array([], pa.binary()),
                }
            )
        codes = np.asarray(g.dictionary_encode().indices)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.r_[0, np.nonzero(sc[1:] != sc[:-1])[0] + 1]
        bounds = np.r_[starts, len(sc)]
        uniq = g.take(pa.array(order[starts]))
        names, blobs = [], []
        for i in range(len(starts)):
            sk = KllSketch(k)
            sk.add_many(vals[order[bounds[i] : bounds[i + 1]]])
            names.append(uniq[i].as_py())
            blobs.append(sk.to_bytes())
        return pa.table(
            {
                group_col: pa.array(names, pa.string()),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    partial = ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_groupwise(t: pa.Table) -> pa.Table:
        merged: dict[str, KllSketch] = {}
        for name, blob in zip(
            t.column(group_col).to_pylist(), t.column("sketch").to_pylist()
        ):
            sk = KllSketch.from_bytes(blob)
            merged[name] = merged[name].merge(sk) if name in merged else sk
        names = sorted(merged)
        return pa.table(
            {
                group_col: pa.array(names, pa.string()),
                "sketch": pa.array(
                    [merged[n].to_bytes() for n in names], pa.binary()
                ),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        t = merge_groupwise(t)
        gs, qs, vs = [], [], []
        for name, blob in zip(
            t.column(group_col).to_pylist(), t.column("sketch").to_pylist()
        ):
            sk = KllSketch.from_bytes(blob)
            for q in quantiles:
                gs.append(name)
                qs.append(f"p{int(q * 100)}")
                vs.append(sk.quantile(q))
        return pa.table(
            {
                group_col: pa.array(gs, pa.string()),
                "q": pa.array(qs, pa.string()),
                "value": pa.array(vs, pa.float64()),
            }
        )

    def empty_fn():
        return rd.from_arrow(
            pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "q": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                }
            )
        )

    return tree_reduce(
        partial, merge_groupwise, empty_fn=empty_fn, final_fn=finish
    )
